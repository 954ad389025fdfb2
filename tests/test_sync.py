"""Semantics tests for the sync/restore/prune library — FIXTURES.md §B
fixtures, covering the reference behaviors SQL can't express (SURVEY.md §5.3):
latest-manifest selection, minimum restore set, prune, idempotence, and the
physical directory sync."""

from __future__ import annotations

import datetime as dt
import os

import pytest

from cassandra_syncer_spark.sync import FILE_SCHEMA, MANIFEST_SCHEMA, SyncPipeline
from cassandra_syncer_spark.sync.targets import DirectoryTarget, scan_directory

TS = lambda s: dt.datetime.fromisoformat(s)  # noqa: E731


@pytest.fixture()
def files(spark):
    rows = [
        # (name, container, bytes, etag, last_modified, content_type, is_temp)
        ("ks1/cf1/ks1-cf1-1-Data.db", "c1", 100, "aa", TS("2024-01-01T00:00"), "db", False),
        ("ks1/cf1/ks1-cf1-2-Data.db", "c1", 200, "bb", TS("2024-01-10T00:00"), "db", False),
        ("ks1/cf1/ks1-cf1-2-tmp-Data.db", "c1", 200, "bb", TS("2024-01-10T00:00"), "db", True),
        ("ks1/cf1/ks1-cf1-3-Data.db", "c1", 300, "bb", TS("2024-01-20T00:00"), "db", False),  # dup etag
        ("ks2/cf1/ks2-cf1-1-Data.db", "c2", 50, "cc", TS("2024-01-05T00:00"), "db", False),
    ]
    return spark.createDataFrame(rows, FILE_SCHEMA)


@pytest.fixture()
def manifests(spark):
    rows = [
        (1000, "c1", ["ks1/cf1/ks1-cf1-1-Data.db"]),
        (2000, "c1", ["ks1/cf1/ks1-cf1-1-Data.db", "ks1/cf1/ks1-cf1-2-Data.db"]),
        (3000, "c1", ["ks1/cf1/ks1-cf1-2-Data.db", "ks1/cf1/missing-Data.db"]),
        (1500, "c2", ["ks2/cf1/ks2-cf1-1-Data.db"]),
    ]
    return spark.createDataFrame(rows, MANIFEST_SCHEMA)


def test_full_backup_needed(spark, files):
    p = SyncPipeline()
    containers = spark.createDataFrame([("c1",)], "name string")
    assert not p.full_backup_needed(containers, "c1")
    assert p.full_backup_needed(containers, "brand-new")


def test_plan_upload_incremental_and_temp_filter(spark, files):
    p = SyncPipeline()
    remote = files.filter("name = 'ks1/cf1/ks1-cf1-1-Data.db'")
    plan = p.plan_upload(files, remote)
    names = {r.name for r in plan.collect()}
    assert "ks1/cf1/ks1-cf1-1-Data.db" not in names  # already stored
    assert "ks1/cf1/ks1-cf1-2-tmp-Data.db" not in names  # temp excluded
    assert "ks1/cf1/ks1-cf1-2-Data.db" in names

    # ENOENT tombstone skip
    tomb = spark.createDataFrame([("ks1/cf1/ks1-cf1-2-Data.db",)], "name string")
    names2 = {r.name for r in p.plan_upload(files, remote, tombstones=tomb).collect()}
    assert "ks1/cf1/ks1-cf1-2-Data.db" not in names2


def test_build_manifest_deterministic(spark, files):
    p = SyncPipeline()
    m1 = p.build_manifest(files, 42).collect()
    m2 = p.build_manifest(files, 42).collect()
    assert sorted(map(str, m1)) == sorted(map(str, m2))
    c1 = next(r for r in m1 if r.container == "c1")
    assert c1.paths == sorted(c1.paths) and "ks1/cf1/ks1-cf1-2-tmp-Data.db" not in c1.paths


def test_latest_manifest_and_restore_plan(spark, files, manifests):
    p = SyncPipeline()
    latest = {r.container: r.manifest_ts for r in p.latest_manifests(manifests).collect()}
    assert latest == {"c1": 3000, "c2": 1500}

    plan = p.restore_plan(manifests, files).collect()
    by_name = {r.name: r for r in plan}
    # minimum set: only files named by the LATEST manifest per container
    assert set(by_name) == {
        "ks1/cf1/ks1-cf1-2-Data.db",
        "ks1/cf1/missing-Data.db",
        "ks2/cf1/ks2-cf1-1-Data.db",
    }
    # named-but-absent surfaces as missing, not invented (FIXTURES.md §B)
    assert by_name["ks1/cf1/missing-Data.db"].is_missing
    assert not by_name["ks1/cf1/ks1-cf1-2-Data.db"].is_missing


def test_prune_plan_retention(spark, files, manifests):
    p = SyncPipeline()
    now_ms = int(TS("2024-02-01T00:00").timestamp() * 1000)
    # retention 5 days: manifests 1000..3000 (epoch-ms scale here is toy) are
    # all "old", but the latest per container is always retained
    prunable = p.prune_plan(manifests, files, now_ms=now_ms, older_than_ms=5 * 24 * 3600 * 1000)
    names = {r.name for r in prunable.collect()}
    # file 1 is referenced only by non-latest manifests -> prunable
    assert "ks1/cf1/ks1-cf1-1-Data.db" in names
    # file 2 is in the latest manifest -> kept
    assert "ks1/cf1/ks1-cf1-2-Data.db" not in names
    # c2's only file is in c2's latest manifest -> kept
    assert "ks2/cf1/ks2-cf1-1-Data.db" not in names


def test_dedup_by_content_idempotent(spark, files):
    p = SyncPipeline()
    once = p.dedup_by_content(files)
    twice = p.dedup_by_content(once)
    assert once.count() == twice.count()
    etags = [(r.container, r.etag) for r in once.collect()]
    assert len(etags) == len(set(etags))


def test_directory_sync_end_to_end(spark, tmp_path):
    """EP1/EP3 physically: scan src dir → plan → copy → manifest → restore."""
    src, dst = tmp_path / "src", tmp_path / "dst"
    for rel, content in [
        ("ks1/a-Data.db", b"alpha"),
        ("ks1/b-Data.db", b"beta"),
        ("ks1/c-tmp-Data.db", b"inflight"),
    ]:
        f = src / rel
        f.parent.mkdir(parents=True, exist_ok=True)
        f.write_bytes(content)

    local = scan_directory(spark, str(src), "c1")
    p = SyncPipeline()
    target = DirectoryTarget(str(dst), "c1")
    plan = p.plan_upload(local, target.list_files(spark))
    n = target.upload(plan, str(src))
    assert n == 2
    assert (dst / "ks1/a-Data.db").read_bytes() == b"alpha"
    assert not (dst / "ks1/c-tmp-Data.db").exists()

    # idempotence: second sync plans nothing new (etag-less -> name match)
    plan2 = p.plan_upload(local, target.list_files(spark))
    assert plan2.join(target.list_files(spark).select("name"), "name", "left_anti").count() == 0

    # re-upload is an idempotent overwrite (reference re-PUT semantics)
    target.upload(plan, str(src))
    assert (dst / "ks1/a-Data.db").read_bytes() == b"alpha"


def test_manifests_asof_time_travel(spark, manifests):
    from cassandra_syncer_spark.sync import SyncPipeline

    p = SyncPipeline()
    # as of t=2500: c1 sees manifest 2000, c2 sees 1500
    asof = {r.container: r.manifest_ts for r in p.manifests_asof(manifests, 2500).collect()}
    assert asof == {"c1": 2000, "c2": 1500}
    # as of t=500: nothing existed
    assert p.manifests_asof(manifests, 500).count() == 0


def test_compact_manifests_keeps_latest_and_recent(spark, manifests):
    from cassandra_syncer_spark.sync import SyncPipeline

    p = SyncPipeline()
    kept = {(r.container, r.manifest_ts) for r in p.compact_manifests(manifests, keep_since_ms=2500).collect()}
    # latest per container always retained; plus anything >= 2500
    assert ("c1", 3000) in kept and ("c2", 1500) in kept
    assert ("c1", 1000) not in kept and ("c1", 2000) not in kept
    # compaction preserves restore semantics
    full = p.restore_plan(manifests, spark.createDataFrame([], "name string, container string, bytes long, etag string, last_modified timestamp, content_type string, is_temp boolean")).collect()
    compacted = p.restore_plan(p.compact_manifests(manifests, 2500), spark.createDataFrame([], "name string, container string, bytes long, etag string, last_modified timestamp, content_type string, is_temp boolean")).collect()
    assert sorted(map(str, full)) == sorted(map(str, compacted))
