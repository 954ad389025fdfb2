"""CLI surface test: python -m cassandra_syncer_spark, driven as a user
would (subprocess), covering backup → incremental → watch → restore →
prune."""

from __future__ import annotations

import json
import subprocess
import sys

REPO = "/root/repo"


def run_cli(*args) -> dict:
    out = subprocess.run(
        [sys.executable, "-m", "cassandra_syncer_spark", *args],
        cwd=REPO, capture_output=True, text=True, timeout=240,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_cli_lifecycle(tmp_path):
    src, store, dst = tmp_path / "src", tmp_path / "store", tmp_path / "dst"
    (src / "ks1").mkdir(parents=True)
    (src / "ks1/a-Data.db").write_bytes(b"alpha")
    (src / "ks1/t-tmp-Data.db").write_bytes(b"junk")

    r = run_cli("backup", str(src), str(store))
    assert r["full"] is True and r["uploaded"] == 1

    (src / "ks1/b-Data.db").write_bytes(b"beta")
    r = run_cli("backup", str(src), str(store))
    assert r["full"] is False and r["uploaded"] == 1  # only the new file

    (src / "ks1/c-Data.db").write_bytes(b"gamma")
    r = run_cli("watch", str(src), str(store))
    assert r["uploaded"] >= 1
    assert (store / "ks1/c-Data.db").read_bytes() == b"gamma"
    assert not (store / "ks1/t-tmp-Data.db").exists()

    r = run_cli("restore", str(store), str(dst))
    assert r["restored"] == 3 and r["missing"] == 0
    assert (dst / "ks1/a-Data.db").read_bytes() == b"alpha"

    r = run_cli("prune", str(store), "--older-than-days", "0", "--dry-run")
    # everything is referenced by the latest manifest -> nothing prunable
    assert r["pruned"] == 0


def test_cli_objstore_scheme_lifecycle(tmp_path):
    """Reference target-url parity (README.md:9-17): objstore://PATH runs
    the full lifecycle against the cloudfiles-analog store — md5-etag
    content identity, so an in-place content change re-uploads and an
    unchanged tree plans nothing."""
    src, store, dst = tmp_path / "src", tmp_path / "store", tmp_path / "dst"
    (src / "ks1").mkdir(parents=True)
    (src / "ks1/a-Data.db").write_bytes(b"alpha")
    url = f"objstore://{store}"

    r = run_cli("backup", str(src), url)
    assert r["uploaded"] == 1 and r["target"] == "objstore"
    # data lives inside the container, metadata beside it
    # default container = the machine hostname (reference parity,
    # bin/cassandra-syncer-restore:37)
    import socket

    host = socket.gethostname()
    assert (store / host / "ks1/a-Data.db").read_bytes() == b"alpha"

    # unchanged tree: etag identity plans nothing
    r = run_cli("backup", str(src), url)
    assert r["uploaded"] == 0

    # changed content under the SAME name: re-uploads (name-identity
    # directory targets cannot see this)
    (src / "ks1/a-Data.db").write_bytes(b"alpha-v2")
    r = run_cli("backup", str(src), url)
    assert r["uploaded"] == 1

    r = run_cli("restore", url, str(dst))
    assert r["restored"] == 1 and r["missing"] == 0
    assert (dst / "ks1/a-Data.db").read_bytes() == b"alpha-v2"

    r = run_cli("prune", url, "--older-than-days", "0", "--dry-run")
    assert r["pruned"] == 0  # everything referenced by the latest manifest


def test_cli_config_file_drives_lifecycle(tmp_path):
    """Reference --config parity (bin/cassandra-syncer:246-251,
    contrib/config.json.example): backup and restore driven purely from a
    JSON config — no positional args; Rackspace auth keys accepted and
    ignored; explicit positionals still override."""
    src, store, dst = tmp_path / "src", tmp_path / "store", tmp_path / "dst"
    (src / "ks1").mkdir(parents=True)
    (src / "ks1/a-Data.db").write_bytes(b"alpha")
    cfg = tmp_path / "sync.json"
    cfg.write_text(json.dumps({
        "store": f"objstore://{store}",
        "paths": [str(src)],
        "container": "cass",
        "restore_path": str(dst),
        "RACKSPACE_USERNAME": "ignored",
        "RACKSPACE_TOKEN": "ignored",
        "USE_SERVICENET": False,
        "CACHE_PATH": "/var/cache/cassandra-syncer",
    }))

    r = run_cli("backup", "--config", str(cfg))
    assert r["uploaded"] == 1 and r["target"] == "objstore"
    assert (store / "cass/ks1/a-Data.db").read_bytes() == b"alpha"

    r = run_cli("restore", "--config", str(cfg))
    assert r["restored"] == 1 and r["missing"] == 0
    assert (dst / "ks1/a-Data.db").read_bytes() == b"alpha"

    # explicit positional destination overrides the config restore_path
    dst2 = tmp_path / "dst2"
    r = run_cli("restore", str(dst2), "--config", str(cfg))
    assert r["restored"] == 1
    assert (dst2 / "ks1/a-Data.db").read_bytes() == b"alpha"

    r = run_cli("prune", "--config", str(cfg), "--dry-run")
    assert r["pruned"] == 0

    # `restore STORE --config` with a config that has restore_path but NO
    # store: the positional is the store, the destination comes from config
    cfg2 = tmp_path / "dst_only.json"
    dst3 = tmp_path / "dst3"
    cfg2.write_text(json.dumps({"restore_path": str(dst3), "container": "cass"}))
    r = run_cli("restore", f"objstore://{store}", "--config", str(cfg2))
    assert r["restored"] == 1
    assert (dst3 / "ks1/a-Data.db").read_bytes() == b"alpha"


def test_watch_does_no_source_tree_rescan(tmp_path, monkeypatch, spark):
    """Watch's per-batch cost must scale with the batch, not the corpus:
    the sync loop performs ZERO full source-tree scans (the stream's own
    metadata-only discovery is the only listing), and manifests still
    accumulate the full live set across separate runs."""
    import cassandra_syncer_spark.__main__ as cli
    from cassandra_syncer_spark.sync.pipeline import SyncPipeline

    calls: list[tuple] = []
    real_scan = cli._scan
    monkeypatch.setattr(
        cli, "_scan", lambda *a, **k: (calls.append(a), real_scan(*a, **k))[1]
    )

    src, store = tmp_path / "src", tmp_path / "store"
    (src / "ks1").mkdir(parents=True)
    (src / "ks1/a-Data.db").write_bytes(b"alpha")
    assert cli.main(["watch", str(src), str(store)]) == 0
    assert calls == []  # zero tree walks — upload plan comes from the batch
    assert (store / "ks1/a-Data.db").read_bytes() == b"alpha"

    # second run, same checkpoint: only the new file streams through, but
    # the manifest is still a full snapshot (cumulative live set)
    (src / "ks1/b-Data.db").write_bytes(b"beta")
    assert cli.main(["watch", str(src), str(store)]) == 0
    assert calls == []
    latest = (
        SyncPipeline()
        .latest_manifests(spark.read.parquet(str(store / "__manifests__")))
        .collect()[0]
    )
    assert sorted(latest.paths) == ["ks1/a-Data.db", "ks1/b-Data.db"]

    # rebaseline: a file deleted from the source (compacted-away SSTable)
    # must drop out of the snapshot on a rebaseline batch instead of
    # resurrecting on every restore forever
    (src / "ks1/a-Data.db").unlink()
    (src / "ks1/c-Data.db").write_bytes(b"gamma")
    assert cli.main(["watch", str(src), str(store), "--rebaseline-every", "1"]) == 0
    latest = (
        SyncPipeline()
        .latest_manifests(spark.read.parquet(str(store / "__manifests__")))
        .collect()[0]
    )
    assert sorted(latest.paths) == ["ks1/b-Data.db", "ks1/c-Data.db"]
    # and the rebaseline batch compacted the log (latest + 24h window
    # retained here; the point is the swap left a readable log behind)
    assert spark.read.parquet(str(store / "__manifests__")).count() >= 1


def test_cli_multi_path_backup(tmp_path):
    """Reference parity: multiple watch paths in one run
    (bin/cassandra-syncer:267) — one store, one manifest per container."""
    src1, src2, store, dst = (
        tmp_path / "data1", tmp_path / "data2", tmp_path / "store", tmp_path / "dst"
    )
    (src1 / "ks1").mkdir(parents=True)
    (src2 / "ks2").mkdir(parents=True)
    (src1 / "ks1/a-Data.db").write_bytes(b"alpha")
    (src2 / "ks2/b-Data.db").write_bytes(b"beta")

    r = run_cli("backup", str(src1), str(src2), str(store))
    assert r["uploaded"] == 2 and r["sources"] == 2
    assert (store / "ks1/a-Data.db").read_bytes() == b"alpha"
    assert (store / "ks2/b-Data.db").read_bytes() == b"beta"

    # union dataflow produced ONE manifest row naming both roots' files
    import duckdb

    rows = duckdb.sql(
        f"SELECT container, len(paths) AS n FROM read_parquet('{store}/__manifests__/*.parquet')"
    ).fetchall()
    import socket

    assert rows == [(socket.gethostname(), 2)]

    r = run_cli("restore", str(store), str(dst))
    assert r["restored"] == 2
    assert (dst / "ks2/b-Data.db").read_bytes() == b"beta"


def test_cli_multi_path_name_collision_deterministic(tmp_path):
    """Two roots holding the SAME relative name: the newer file wins
    deterministically (max last_modified) — never a nondeterministic
    last-writer race — and the manifest names it once."""
    import os
    import time as _t

    src1, src2, store = tmp_path / "data1", tmp_path / "data2", tmp_path / "store"
    (src1 / "ks1").mkdir(parents=True)
    (src2 / "ks1").mkdir(parents=True)
    (src1 / "ks1/a-Data.db").write_bytes(b"older")
    (src2 / "ks1/a-Data.db").write_bytes(b"newer")
    now = _t.time()
    os.utime(src1 / "ks1/a-Data.db", (now - 100, now - 100))
    os.utime(src2 / "ks1/a-Data.db", (now, now))

    r = run_cli("backup", str(src1), str(src2), str(store))
    assert r["uploaded"] == 1
    assert (store / "ks1/a-Data.db").read_bytes() == b"newer"

    import duckdb

    rows = duckdb.sql(
        f"SELECT len(paths) FROM read_parquet('{store}/__manifests__/*.parquet')"
    ).fetchall()
    assert rows == [(1,)]


def test_cli_query_surface(tmp_path):
    """`query` exposes the full registered analytics surface: --list
    enumerates, a run returns rows with the declared columns, --explain
    prints a plan without executing, and an unknown id exits 2."""
    listing = run_cli("query", "--list")
    assert "agg_group_sum" in listing["queries"]
    assert len(listing["queries"]) >= 150

    res = run_cli(
        "query", "agg_group_sum", "--sf-dir", "/root/testdata/sf0.001", "--limit", "3"
    )
    assert res["name"] == "agg_group_sum" and res["rows_shown"] >= 1
    assert set(res["rows"][0]) == set(res["columns"])

    out = subprocess.run(
        [sys.executable, "-m", "cassandra_syncer_spark", "query",
         "agg_group_sum", "--sf-dir", "/root/testdata/sf0.001", "--explain"],
        cwd=REPO, capture_output=True, text=True, timeout=240,
    )
    assert out.returncode == 0 and "Scan parquet" in out.stdout

    bad = subprocess.run(
        [sys.executable, "-m", "cassandra_syncer_spark", "query", "nope"],
        cwd=REPO, capture_output=True, text=True, timeout=240,
    )
    assert bad.returncode == 2


def test_bench_contract_smoke(tmp_path):
    """bench.py is a per-round driver artifact (BENCH_r{N}.json) — a crash
    burns the round's perf evidence (BENCH_r03 was exactly that).  Run it
    end-to-end at the smallest fixture and assert the output contract:
    rc 0, last stdout line is one JSON object with the required keys, all
    timings positive, and every baseline ratio present is finite.  The
    detail artifact goes to a temp path: the committed driver-scale
    BENCH_DETAIL.json must NOT be clobbered by an sf0.001 suite run
    (which is exactly what happened in round 11 — the artifact silently
    became the smoke run's numbers)."""
    import json
    import os

    detail_out = str(tmp_path / "BENCH_DETAIL_SMOKE.json")
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_BENCH_DETAIL_OUT=detail_out,
    )
    out = subprocess.run(
        [sys.executable, "bench.py"],
        capture_output=True,
        text=True,
        timeout=900,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = out.stdout.strip().splitlines()[-1]
    # the driver records only the TAIL of stdout — the whole line must fit
    # or the artifact parses to null (BENCH_r05/r06 regression)
    assert len(line) <= 1900, len(line)
    d = json.loads(line)
    for key in ("metric", "value", "unit", "queries", "sf"):
        assert key in d, key
    assert d["unit"] == "sec" and d["value"] > 0
    assert d["queries"] and all(v > 0 for v in d["queries"].values())
    # full artifact (incl. absolute vanilla timings + forcing notes) lands
    # in the side file
    with open(detail_out) as fh:
        detail = json.load(fh)
    assert "baseline_same_session" in detail and "forcing" in detail
    # EVERY timed headline row's timing is on the line — round-11's
    # ratio-ordered shedding erased improved rows from the driver's
    # round-over-round comparison; the line must stay row-complete
    assert set(d["queries"]) == set(detail["queries"])
    # the gate ratios ride the line when they fit; when shed for budget the
    # line carries summary stats and the detail file keeps the full map
    if "ratio_vs_baseline_same_session" in d:
        assert all(
            r > 0 for r in d["ratio_vs_baseline_same_session"].values()
        )
    else:
        assert d["gate_ratios_in_detail"] == len(
            detail["ratio_vs_baseline_same_session"]
        )
        assert d["gate_ratio_max"] == max(
            detail["ratio_vs_baseline_same_session"].values()
        )


def test_bench_sweep_knobs(tmp_path):
    """The replica-sweep knobs (SPARK_GRAFT_BENCH_ONLY / _ENGINE_ONLY /
    _DETAIL_OUT) guard committed scale artifacts: ONLY subsets the row
    list (at large replica factors some vanillas are intractable by
    design), ENGINE_ONLY suppresses a row's vanilla pairing, and
    DETAIL_OUT keeps a sweep from clobbering the driver-scale
    BENCH_DETAIL.json.  All default empty — the driver path is the
    test above; this asserts the sweep path."""
    import json
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_BENCH_ONLY="agg_group_sum,join_3table_topk",
        SPARK_GRAFT_BENCH_ENGINE_ONLY="join_3table_topk",
        SPARK_GRAFT_BENCH_DETAIL_OUT="BENCH_DETAIL_TEST.json",
    )
    before = open(os.path.join(repo, "BENCH_DETAIL.json")).read()
    out = subprocess.run(
        [sys.executable, "bench.py"],
        capture_output=True, text=True, timeout=900, env=env, cwd=repo,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    d = json.loads(out.stdout.strip().splitlines()[-1])
    assert set(d["queries"]) == {"agg_group_sum", "join_3table_topk"}
    # the ENGINE_ONLY row is timed but carries no gate ratio
    assert set(d["ratio_vs_baseline_same_session"]) == {"agg_group_sum"}
    side = os.path.join(repo, "BENCH_DETAIL_TEST.json")
    assert os.path.exists(side)
    os.remove(side)
    # the driver-scale detail artifact is untouched by the sweep
    assert open(os.path.join(repo, "BENCH_DETAIL.json")).read() == before


def test_cli_restore_manifest_cache(tmp_path):
    """Reference restoremanifest.json parity (bin/cassandra-syncer-
    restore:28,91-94): a completed restore records the materialized
    snapshot at the destination; a re-run against the SAME snapshot
    short-circuits (cached:true, nothing listed or transferred), a new
    backup invalidates it, and deleting the file forces a full pass."""
    src, store, dst = tmp_path / "src", tmp_path / "store", tmp_path / "dst"
    (src / "ks1").mkdir(parents=True)
    (src / "ks1/a-Data.db").write_bytes(b"alpha")

    run_cli("backup", str(src), str(store))
    r = run_cli("restore", str(store), str(dst))
    assert r["restored"] == 1 and "cached" not in r
    cache = dst / "restoremanifest.json"
    assert cache.is_file()

    # same snapshot → cached short-circuit
    r = run_cli("restore", str(store), str(dst))
    assert r.get("cached") is True and r["restored"] == 0

    # a NEW backup advances the snapshot → cache no longer matches
    (src / "ks1/b-Data.db").write_bytes(b"beta")
    run_cli("backup", str(src), str(store))
    r = run_cli("restore", str(store), str(dst))
    assert "cached" not in r and r["restored"] >= 1
    assert (dst / "ks1/b-Data.db").read_bytes() == b"beta"

    # deleting the cache forces a full (but etag-no-op) pass
    cache.unlink()
    r = run_cli("restore", str(store), str(dst))
    assert "cached" not in r

    # deleting a restored FILE (cache intact) must invalidate the skip —
    # the cache alone is not evidence the tree is materialized (ADVICE r6)
    r = run_cli("restore", str(store), str(dst))
    assert r.get("cached") is True
    (dst / "ks1/a-Data.db").unlink()
    r = run_cli("restore", str(store), str(dst))
    assert "cached" not in r
    assert (dst / "ks1/a-Data.db").read_bytes() == b"alpha"

    # a DIFFERENT store with the same container + manifest_ts must not be
    # skipped: the cache is keyed on store identity
    import json as _json

    store2 = tmp_path / "store2"
    run_cli("backup", str(src), str(store2))
    r = run_cli("restore", str(store2), str(dst))   # writes store2 cache
    r = run_cli("restore", str(store2), str(dst))
    assert r.get("cached") is True                  # sanity: skip works
    cached = _json.loads(cache.read_text())
    cached["store"] = str(store)                    # forge: other store
    cache.write_text(_json.dumps(cached))
    r = run_cli("restore", str(store2), str(dst))
    assert "cached" not in r


def test_cli_container_default_fallback(tmp_path):
    """Hostname-default migration shim: a store backed up under the
    legacy literal 'default' container still restores/prunes with no
    --container flag — the CLI falls back when the implicit hostname
    container has no manifests (and never overrides an explicit one)."""
    src, store, dst = tmp_path / "src", tmp_path / "store", tmp_path / "dst"
    (src / "ks1").mkdir(parents=True)
    (src / "ks1/a-Data.db").write_bytes(b"alpha")
    run_cli("backup", str(src), str(store), "--container", "default")

    r = run_cli("restore", str(store), str(dst))  # implicit hostname
    assert r["restored"] == 1 and r["missing"] == 0
    assert (dst / "ks1/a-Data.db").read_bytes() == b"alpha"

    r = run_cli("prune", str(store), "--older-than-days", "0", "--dry-run")
    assert r["pruned"] == 0

    # explicit --container naming a container with no manifests is
    # honored verbatim: nothing restored, no silent fallback
    dst2 = tmp_path / "dst2"
    r = run_cli("restore", str(store), str(dst2), "--container", "nosuch")
    assert r["restored"] == 0
