"""HTTP object-store target: Swift/Cloud Files REST semantics against a
loopback server (the reference's cloudfiles:// deployment shape,
core.js:83-116/238-310/336-368/377-418), plus the full sync lifecycle
driven through HttpObjectStoreTarget."""

from __future__ import annotations

import hashlib
import http.client
import time
from urllib.parse import urlsplit

import pytest

from cassandra_syncer_spark.sync import (
    EtagMismatch,
    HttpObjectStoreTarget,
    SwiftClient,
    SwiftServer,
    SyncPipeline,
    scan_directory_with_etags,
)


@pytest.fixture()
def server(tmp_path):
    srv = SwiftServer(str(tmp_path / "swift_root")).start()
    yield srv
    srv.stop()


@pytest.fixture()
def client(server):
    return SwiftClient(server.auth_url, user=server.user, key=server.key)


def _write(src, rel, content: bytes):
    f = src / rel
    f.parent.mkdir(parents=True, exist_ok=True)
    f.write_bytes(content)


# -- client / REST semantics ----------------------------------------------


def test_auth_flow_and_token_required(server, client, tmp_path):
    """Storage requests without the issued token are 401; the client's
    lazy auth obtains token + storage url from the v1.0 endpoint."""
    client.create_container("c1")
    # raw request with a bogus token → 401
    parts = urlsplit(server.auth_url)
    conn = http.client.HTTPConnection(parts.hostname, parts.port)
    conn.request("GET", "/v1/AUTH_test/c1?format=json", headers={"X-Auth-Token": "nope"})
    assert conn.getresponse().status == 401
    conn.close()
    # wrong credentials fail auth
    bad = SwiftClient(server.auth_url, user=server.user, key="wrong")
    with pytest.raises(PermissionError):
        bad.create_container("c2")


def test_put_get_stat_delete_roundtrip(client, tmp_path):
    _write(tmp_path, "f1", b"hello world")
    etag, stored = client.put_file("c1", "ks1/f1", str(tmp_path / "f1"))
    assert stored and etag == hashlib.md5(b"hello world").hexdigest()
    meta = client.stat_object("c1", "ks1/f1")
    assert meta["bytes"] == 11 and meta["etag"] == etag
    n, transferred = client.get_file("c1", "ks1/f1", str(tmp_path / "back"))
    assert transferred and (tmp_path / "back").read_bytes() == b"hello world"
    assert client.delete_object("c1", "ks1/f1")
    assert not client.delete_object("c1", "ks1/f1")  # idempotent re-delete
    assert client.stat_object("c1", "ks1/f1") is None
    with pytest.raises(FileNotFoundError):
        client.get_file("c1", "ks1/f1", str(tmp_path / "back2"))


def test_conditional_put_skips_unchanged(client, tmp_path):
    _write(tmp_path, "f1", b"same-bytes")
    assert client.put_file("c1", "o", str(tmp_path / "f1"))[1] is True
    # identical content → no transfer
    assert client.put_file("c1", "o", str(tmp_path / "f1"), skip_unchanged=True)[1] is False
    # changed content under the same name → re-put
    _write(tmp_path, "f1", b"new-bytes!")
    etag, stored = client.put_file("c1", "o", str(tmp_path / "f1"), skip_unchanged=True)
    assert stored and etag == hashlib.md5(b"new-bytes!").hexdigest()


def test_server_rejects_bad_request_etag(server, client, tmp_path):
    """Swift's documented 422 on a request ETag that doesn't match the
    body — and the object is not stored."""
    client.create_container("c1")
    parts = urlsplit(server.auth_url)
    client._auth()
    conn = http.client.HTTPConnection(parts.hostname, parts.port)
    conn.request(
        "PUT",
        "/v1/AUTH_test/c1/bad",
        body=b"payload",
        headers={
            "X-Auth-Token": client._token,
            "ETag": "0" * 32,
            "Content-Length": "7",
        },
    )
    assert conn.getresponse().status == 422
    conn.close()
    assert client.stat_object("c1", "bad") is None


def test_download_etag_verification(server, client, tmp_path, monkeypatch):
    """A download whose bytes don't hash to the response ETag raises
    (storage-object.js:123-124 parity) and leaves no destination file."""
    _write(tmp_path, "f1", b"clean-bytes")
    client.put_file("c1", "o", str(tmp_path / "f1"))
    # corrupt the stored bytes behind the metadata's back
    data_path = tmp_path / "swift_root" / "c1" / "o"
    data_path.write_bytes(b"evil!-bytes")
    with pytest.raises(EtagMismatch):
        client.get_file("c1", "o", str(tmp_path / "out"))
    assert not (tmp_path / "out").exists()


def test_listing_pagination_and_prefix(client, tmp_path):
    _write(tmp_path, "f", b"x")
    for i in range(7):
        client.put_file("c1", f"ks1/{i:02d}", str(tmp_path / "f"))
    client.put_file("c1", "ks2/other", str(tmp_path / "f"))
    names = [m["name"] for m in client.list_objects("c1", page_size=3)]
    assert names == sorted(names) and len(names) == 8
    assert [m["name"] for m in client.list_objects("c1", prefix="ks2/")] == ["ks2/other"]
    # swift listing carries etag under "hash"
    assert all(m["hash"] == hashlib.md5(b"x").hexdigest() for m in client.list_objects("c1"))


# -- full sync lifecycle over HTTP ----------------------------------------


def test_http_target_full_lifecycle(spark, tmp_path, server, client):
    """test_object_store_lifecycle with the HTTP target substituted: EP1
    backup → etag-identity incremental → EP3 restore (+cache) → prune,
    every transfer over loopback Swift REST from executor workers."""
    src, restored = tmp_path / "src", tmp_path / "restored"
    mlog = str(tmp_path / "manifests")
    p = SyncPipeline()
    target = HttpObjectStoreTarget(client, "c1")

    _write(src, "ks1/a-Data.db", b"alpha")
    _write(src, "ks1/b-Data.db", b"beta")
    _write(src, "ks1/x-tmp-Data.db", b"inflight")  # excluded (temp marker)

    # EP1: full backup — container empty → everything live uploads
    local = scan_directory_with_etags(spark, str(src), "c1")
    plan = p.plan_upload(local, target.list_files(spark))
    assert target.upload(plan, str(src)) == 2
    assert client.stat_object("c1", "ks1/x-tmp-Data.db") is None
    listed = {r.name: r for r in target.list_files(spark).collect()}
    assert listed["ks1/a-Data.db"].etag == hashlib.md5(b"alpha").hexdigest()
    p.build_manifest(local, manifest_ts=1000).write.mode("append").parquet(mlog)

    # re-put idempotence: identical content plans nothing (etag identity)
    assert (
        p.plan_upload(
            scan_directory_with_etags(spark, str(src), "c1"), target.list_files(spark)
        ).count()
        == 0
    )

    # etag identity detects changed content under the SAME name
    _write(src, "ks1/a-Data.db", b"alpha-v2")
    _write(src, "ks1/c-Data.db", b"gamma")
    local2 = scan_directory_with_etags(spark, str(src), "c1")
    plan3 = p.plan_upload(local2, target.list_files(spark))
    assert {r.name for r in plan3.collect()} == {"ks1/a-Data.db", "ks1/c-Data.db"}
    assert target.upload(plan3, str(src)) == 2
    p.build_manifest(local2, manifest_ts=2000).write.mode("append").parquet(mlog)
    manifests = spark.read.parquet(mlog)

    # EP3: restore the minimum set named by the latest manifest
    rplan = p.restore_plan(manifests, target.list_files(spark))
    assert not any(r.is_missing for r in rplan.collect())
    assert target.download(rplan.filter("NOT is_missing"), str(restored)) == 3
    assert (restored / "ks1/a-Data.db").read_bytes() == b"alpha-v2"
    assert (restored / "ks1/c-Data.db").read_bytes() == b"gamma"
    # second restore over the intact tree: etag cache transfers nothing
    assert target.download(rplan.filter("NOT is_missing"), str(restored)) == 0

    # prune: b-Data.db leaves the live set; retention expires → delete
    (src / "ks1/b-Data.db").unlink()
    local3 = scan_directory_with_etags(spark, str(src), "c1")
    p.build_manifest(local3, manifest_ts=3000).write.mode("append").parquet(mlog)
    manifests = spark.read.parquet(mlog)
    day = 24 * 3600 * 1000
    now_ms = int(time.time() * 1000)
    prunable = p.prune_plan(
        manifests, target.list_files(spark), now_ms=now_ms + 40 * day, older_than_ms=21 * day
    )
    assert {r.name for r in prunable.collect()} == {"ks1/b-Data.db"}
    assert target.delete(prunable) == 1
    assert client.stat_object("c1", "ks1/b-Data.db") is None
    assert client.stat_object("c1", "ks1/a-Data.db") is not None


def test_http_upload_skips_vanished_source(spark, tmp_path, client):
    src = tmp_path / "src"
    _write(src, "a", b"aa")
    _write(src, "b", b"bb")
    target = HttpObjectStoreTarget(client, "c1")
    plan = scan_directory_with_etags(spark, str(src), "c1")
    plan.count()  # force listing before the unlink
    (src / "b").unlink()
    assert target.upload(plan, str(src)) == 1  # ENOENT skip, not an error
    assert client.stat_object("c1", "b") is None


def test_list_files_sharded_matches_driver_listing(spark, tmp_path, client):
    """The prefix-sharded distributed listing must return exactly the
    driver-paginated listing's rows when the prefixes partition the
    namespace."""
    src = tmp_path / "src"
    for i in range(5):
        _write(src, f"f{i}", bytes([i]) * (i + 1))
        client.put_file("c1", f"ks{i % 2}/obj-{i}", str(src / f"f{i}"))
    target = HttpObjectStoreTarget(client, "c1")
    driver_rows = {tuple(r) for r in target.list_files(spark).collect()}
    sharded_rows = {
        tuple(r) for r in target.list_files_sharded(spark, ["ks0/", "ks1/"]).collect()
    }
    assert sharded_rows == driver_rows and len(sharded_rows) == 5


def test_http_download_cache_avoids_network(spark, tmp_path, server, client):
    """The cache's reason to exist on the HTTP target: once primed, a
    restore to a new destination makes ZERO HTTP GETs — proven by
    stopping the server before the second restore."""
    src = tmp_path / "src"
    cache, dst1, dst2 = (tmp_path / d for d in ("cache", "dst1", "dst2"))
    p = SyncPipeline()
    target = HttpObjectStoreTarget(client, "c1")
    _write(src, "ks1/a-Data.db", b"alpha")
    _write(src, "ks1/b-Data.db", b"beta")
    local = scan_directory_with_etags(spark, str(src), "c1")
    assert target.upload(p.plan_upload(local, target.list_files(spark)), str(src)) == 2

    plan = spark.createDataFrame(target.list_files(spark).collect())
    assert target.download(plan, str(dst1), cache_root=str(cache)) == 2
    assert (cache / "c1/ks1/b-Data.db").read_bytes() == b"beta"

    server.stop()  # no server — any GET would now fail loudly
    assert target.download(plan, str(dst2), cache_root=str(cache)) == 0
    assert (dst2 / "ks1/a-Data.db").read_bytes() == b"alpha"
    assert (dst2 / "ks1/b-Data.db").read_bytes() == b"beta"
