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
