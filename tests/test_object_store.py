"""ObjectStore semantics + ObjectStoreTarget lifecycle.

Mirrors the cloudfiles dataflow the reference deploys against
(core.js:238-310 listing, :336-368 get, :377-418 idempotent put) and the
directory-target lifecycle tests (test_sync.py / test_sync_lifecycle.py),
but against store semantics: md5 etags, conditional put, list pagination.
"""

from __future__ import annotations

import hashlib
import time

import pytest

from cassandra_syncer_spark.sync import (
    ObjectStore,
    ObjectStoreTarget,
    SyncPipeline,
    scan_directory_with_etags,
)


# -- store primitives -----------------------------------------------------


def test_put_get_stat_delete_roundtrip(tmp_path):
    s = ObjectStore(str(tmp_path / "store"))
    etag, stored = s.put_object("c1", "ks1/a-Data.db", b"alpha")
    assert stored and etag == hashlib.md5(b"alpha").hexdigest()
    assert s.get_object("c1", "ks1/a-Data.db") == b"alpha"
    meta = s.stat_object("c1", "ks1/a-Data.db")
    assert meta["bytes"] == 5 and meta["etag"] == etag
    assert s.container_exists("c1") and s.list_containers() == ["c1"]
    assert s.delete_object("c1", "ks1/a-Data.db")
    assert s.stat_object("c1", "ks1/a-Data.db") is None
    assert not s.delete_object("c1", "ks1/a-Data.db")  # idempotent


def test_conditional_put_skips_unchanged(tmp_path):
    s = ObjectStore(str(tmp_path / "store"))
    etag1, stored1 = s.put_object("c1", "a", b"same")
    etag2, stored2 = s.put_object("c1", "a", b"same", if_none_match=etag1)
    assert stored1 and not stored2 and etag1 == etag2
    # changed content under the same name does store (overwrite PUT)
    etag3, stored3 = s.put_object("c1", "a", b"changed", if_none_match=etag1)
    assert stored3 and etag3 != etag1
    assert s.get_object("c1", "a") == b"changed"


def test_list_pagination_marker_and_limit(tmp_path):
    s = ObjectStore(str(tmp_path / "store"))
    names = [f"ks1/sstable-{i:03d}-Data.db" for i in range(10)]
    for n in names:
        s.put_object("c1", n, n.encode())
    page1 = [m["name"] for m in s.list_objects("c1", limit=4)]
    assert page1 == names[:4]
    page2 = [m["name"] for m in s.list_objects("c1", marker=page1[-1], limit=4)]
    assert page2 == names[4:8]
    page3 = [m["name"] for m in s.list_objects("c1", marker=page2[-1], limit=4)]
    assert page3 == names[8:]


def test_chunked_put_get_roundtrip(tmp_path):
    """Streamed transfer (common.js:166-198 analog): content far larger
    than the chunk buffer round-trips intact, etag computed en route;
    skip_unchanged discards the transfer on identical content."""
    s = ObjectStore(str(tmp_path / "store"))
    payload = bytes(range(256)) * 513  # 131,328 bytes, not chunk-aligned
    src = tmp_path / "big.db"
    src.write_bytes(payload)

    etag, stored = s.put_file("c1", "big.db", str(src), chunk_size=1000)
    assert stored and etag == hashlib.md5(payload).hexdigest()
    assert s.stat_object("c1", "big.db")["bytes"] == len(payload)

    # unchanged content: transfer discarded
    etag2, stored2 = s.put_file("c1", "big.db", str(src), skip_unchanged=True, chunk_size=1000)
    assert etag2 == etag and not stored2

    dst = tmp_path / "restored.db"
    n, transferred = s.get_file("c1", "big.db", str(dst), chunk_size=1000)
    assert transferred and n == len(payload) and dst.read_bytes() == payload
    # restore-side etag cache (core.js:336-342 analog): destination already
    # holds the stored content → zero bytes transferred
    n2, transferred2 = s.get_file("c1", "big.db", str(dst), chunk_size=1000, skip_etag=etag)
    assert n2 == 0 and not transferred2
    # stale destination content → re-downloaded despite skip_etag
    dst.write_bytes(b"corrupted")
    n3, transferred3 = s.get_file("c1", "big.db", str(dst), chunk_size=1000, skip_etag=etag)
    assert transferred3 and n3 == len(payload) and dst.read_bytes() == payload
    # no staging residue (pathlib * matches dot-prefixed temps)
    assert not list((tmp_path / "store").rglob("*.inflight"))


def test_list_prefix_filter(tmp_path):
    s = ObjectStore(str(tmp_path / "store"))
    for n in ["ks1/a", "ks1/b", "ks2/a"]:
        s.put_object("c1", n, b"x")
    assert [m["name"] for m in s.list_objects("c1", prefix="ks2/")] == ["ks2/a"]


# -- target lifecycle -----------------------------------------------------


def _write(src, rel, content: bytes):
    f = src / rel
    f.parent.mkdir(parents=True, exist_ok=True)
    f.write_bytes(content)


def test_object_store_lifecycle(spark, tmp_path):
    """EP1 backup → etag-identity incremental → EP3 restore → prune, all
    against store semantics (the cloudfiles deployment shape).  Manifests
    go through the parquet log between snapshots, as in production — see
    SyncPipeline.build_manifest on why lazy manifest unions are unsafe."""
    src, store_root, restored = tmp_path / "src", tmp_path / "store", tmp_path / "restored"
    mlog = str(tmp_path / "manifests")
    p = SyncPipeline()
    target = ObjectStoreTarget(str(store_root), "c1")

    _write(src, "ks1/a-Data.db", b"alpha")
    _write(src, "ks1/b-Data.db", b"beta")
    _write(src, "ks1/x-tmp-Data.db", b"inflight")  # excluded (temp marker)

    # EP1: full backup — container absent → everything live uploads
    local = scan_directory_with_etags(spark, str(src), "c1")
    plan = p.plan_upload(local, target.list_files(spark))
    assert target.upload(plan, str(src)) == 2
    assert target.store().get_object("c1", "ks1/a-Data.db") == b"alpha"
    assert target.store().stat_object("c1", "ks1/x-tmp-Data.db") is None

    # listing scan is a distributed read with real md5 etags
    listed = {r.name: r for r in target.list_files(spark).collect()}
    assert listed["ks1/a-Data.db"].etag == hashlib.md5(b"alpha").hexdigest()

    p.build_manifest(local, manifest_ts=1000).write.mode("append").parquet(mlog)

    # re-put idempotence: identical content plans nothing (etag identity)
    plan2 = p.plan_upload(
        scan_directory_with_etags(spark, str(src), "c1"), target.list_files(spark)
    )
    assert plan2.count() == 0

    # etag identity detects changed content under the SAME name
    _write(src, "ks1/a-Data.db", b"alpha-v2")
    _write(src, "ks1/c-Data.db", b"gamma")
    local2 = scan_directory_with_etags(spark, str(src), "c1")
    plan3 = p.plan_upload(local2, target.list_files(spark))
    assert {r.name for r in plan3.collect()} == {"ks1/a-Data.db", "ks1/c-Data.db"}
    assert target.upload(plan3, str(src)) == 2
    assert target.store().get_object("c1", "ks1/a-Data.db") == b"alpha-v2"
    p.build_manifest(local2, manifest_ts=2000).write.mode("append").parquet(mlog)
    manifests = spark.read.parquet(mlog)

    # EP3: restore the minimum set named by the latest manifest
    rplan = p.restore_plan(manifests, target.list_files(spark))
    assert not any(r.is_missing for r in rplan.collect())
    assert target.download(rplan.filter("NOT is_missing"), str(restored)) == 3
    assert (restored / "ks1/a-Data.db").read_bytes() == b"alpha-v2"
    assert (restored / "ks1/c-Data.db").read_bytes() == b"gamma"

    # second restore over the intact tree: etag cache skips every file
    assert target.download(rplan.filter("NOT is_missing"), str(restored)) == 0

    # prune: drop b-Data.db from the live set; an old manifest still names
    # it, but retention has expired → distributed delete
    (src / "ks1/b-Data.db").unlink()
    local3 = scan_directory_with_etags(spark, str(src), "c1")
    p.build_manifest(local3, manifest_ts=3000).write.mode("append").parquet(mlog)
    manifests = spark.read.parquet(mlog)
    day = 24 * 3600 * 1000
    now_ms = int(time.time() * 1000)  # stored last_modified is wall-clock
    prunable = p.prune_plan(
        manifests, target.list_files(spark), now_ms=now_ms + 40 * day, older_than_ms=21 * day
    )
    assert {r.name for r in prunable.collect()} == {"ks1/b-Data.db"}
    assert target.delete(prunable) == 1
    assert target.store().stat_object("c1", "ks1/b-Data.db") is None
    assert target.store().get_object("c1", "ks1/a-Data.db") == b"alpha-v2"


def test_upload_skips_vanished_source(spark, tmp_path):
    src, store_root = tmp_path / "src", tmp_path / "store"
    _write(src, "a", b"aa")
    _write(src, "b", b"bb")
    target = ObjectStoreTarget(str(store_root), "c1")
    plan = scan_directory_with_etags(spark, str(src), "c1")
    plan.count()  # force listing before the unlink
    (src / "b").unlink()
    assert target.upload(plan, str(src)) == 1  # ENOENT skip, not an error
    assert target.store().stat_object("c1", "b") is None


def test_etag_integrity_check_detects_corruption(tmp_path, monkeypatch):
    """A PUT whose committed bytes don't hash to the computed etag must
    raise, not silently store (core.js:414-417 semantics).  Fault is
    injected by corrupting the temp file between write and verify."""
    import builtins

    from cassandra_syncer_spark.sync.object_store import EtagMismatch

    s = ObjectStore(str(tmp_path / "store"))
    real_open = builtins.open

    def corrupting_open(path, mode="r", *a, **kw):
        fh = real_open(path, mode, *a, **kw)
        if str(path).endswith(".inflight") and "w" in mode and "b" in mode:
            fh.write(b"!corrupt-prefix!")  # bytes the etag never saw
        return fh

    monkeypatch.setattr(builtins, "open", corrupting_open)
    with pytest.raises(EtagMismatch):
        s.put_object("c1", "a", b"data")
    monkeypatch.undo()
    assert s.stat_object("c1", "a") is None  # nothing committed


# -- restore-side write-through download cache ----------------------------


def test_download_cache_write_through(spark, tmp_path):
    """Write-through restore cache (core.js:336-368 parity): the first
    restore populates the cache, and a later restore to a NEW destination
    is served entirely from it — proven by destroying the store between
    the two.  Stale cache entries (content no longer hashing to the etag)
    are not trusted."""
    import shutil

    src, store_root = tmp_path / "src", tmp_path / "store"
    cache, dst1, dst2, dst3 = (tmp_path / d for d in ("cache", "dst1", "dst2", "dst3"))
    p = SyncPipeline()
    target = ObjectStoreTarget(str(store_root), "c1")
    _write(src, "ks1/a-Data.db", b"alpha")
    _write(src, "ks1/b-Data.db", b"beta")
    local = scan_directory_with_etags(spark, str(src), "c1")
    assert target.upload(p.plan_upload(local, target.list_files(spark)), str(src)) == 2

    # first restore: fetches from the store AND fills the cache (write-through)
    plan_rows = target.list_files(spark).collect()
    plan = spark.createDataFrame(plan_rows)
    assert target.download(plan, str(dst1), cache_root=str(cache)) == 2
    assert (cache / "c1/ks1/a-Data.db").read_bytes() == b"alpha"

    # re-restore over an intact tree: zero transfers (dest etag short-circuit)
    assert target.download(plan, str(dst1), cache_root=str(cache)) == 0

    # destroy the store: a NEW destination restores purely from the cache
    shutil.rmtree(store_root)
    assert target.download(plan, str(dst2), cache_root=str(cache)) == 0
    assert (dst2 / "ks1/a-Data.db").read_bytes() == b"alpha"
    assert (dst2 / "ks1/b-Data.db").read_bytes() == b"beta"

    # stale entry: content != etag → treated as a miss, never copied out
    (cache / "c1/ks1/a-Data.db").write_bytes(b"corrupted")
    assert target.download(plan, str(dst3), cache_root=str(cache)) == 0
    assert not (dst3 / "ks1/a-Data.db").exists()  # store gone + cache invalid
    assert (dst3 / "ks1/b-Data.db").read_bytes() == b"beta"
