"""CLI — user-facing parity with the reference's two executables.

Reference commands → engine commands:

| reference                                  | here |
|--------------------------------------------|------|
| ``cassandra-syncer --url dir://STORE PATH`` (bin/cassandra-syncer:243-280) | ``backup SRC STORE`` |
| continuous watch loop (``:276``)           | ``watch SRC STORE`` (drains pending files via Structured Streaming, availableNow) |
| ``cassandra-syncer-restore --url dir://STORE PATH`` (bin/cassandra-syncer-restore:116-146) | ``restore STORE DST`` |
| fsck prune (README.md:26-28, spec only)    | ``prune STORE --older-than-days N`` — implemented here |

The manifest log is a parquet table under ``STORE/__manifests__`` (the
reference used ``<epoch-ms>.json`` objects; a log table is the same
append-only snapshot model, queryable).

Usage::

    python -m cassandra_syncer_spark backup  /var/lib/cassandra/data /backup
    python -m cassandra_syncer_spark watch   /var/lib/cassandra/data /backup
    python -m cassandra_syncer_spark restore /backup /var/lib/cassandra/data
    python -m cassandra_syncer_spark prune   /backup --older-than-days 21 --dry-run
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

from pyspark.sql import functions as F


def _manifest_dir(store: str) -> str:
    return os.path.join(store, "__manifests__")


def _spark():
    from cassandra_syncer_spark.session import get_spark

    spark = get_spark(app_name="cassandra-syncer-spark-cli")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _emit(payload: dict) -> None:
    print(json.dumps(payload))


def cmd_backup(args) -> int:
    from cassandra_syncer_spark.sync import SyncPipeline
    from cassandra_syncer_spark.sync.targets import DirectoryTarget, scan_directory

    spark = _spark()
    p = SyncPipeline()
    target = DirectoryTarget(args.store, args.container)
    local = scan_directory(spark, args.src, args.container)
    remote = target.list_files(spark)
    # directory stores have no container listing: "container exists" ≡ the
    # store already holds any object (reference probe: bin/cassandra-syncer:162-177)
    full = remote.limit(1).count() == 0
    plan = p.plan_upload(local, remote)
    n = target.upload(plan, args.src)
    ts = int(time.time() * 1000)
    p.build_manifest(local, manifest_ts=ts).write.mode("append").parquet(_manifest_dir(args.store))
    _emit({"cmd": "backup", "full": bool(full), "uploaded": n, "manifest_ts": ts})
    return 0


def cmd_watch(args) -> int:
    """Streamed incremental sync: drain new files via the file source
    (availableNow — the CLI form of the reference's inotify loop; a
    long-running deployment would switch the trigger to processingTime)."""
    from cassandra_syncer_spark.streaming.watch import run_incremental_sync, watch_files
    from cassandra_syncer_spark.sync import SyncPipeline
    from cassandra_syncer_spark.sync.targets import DirectoryTarget, scan_directory

    spark = _spark()
    p = SyncPipeline()
    target = DirectoryTarget(args.store, args.container)
    stream = (
        spark.readStream.format("binaryFile")
        .schema("path string, modificationTime timestamp, length long, content binary")
        .option("recursiveFileLookup", "true")
        .load(args.src)
        .select(
            F.regexp_replace("path", f"^file:{args.src}/?", "").alias("name"),
            F.col("length").alias("bytes"),
        )
    )
    uploaded = []

    def on_batch(batch_df, batch_id):
        names = batch_df.select("name").filter(~F.col("name").contains(p.TEMP_MARKER))
        plan = scan_directory(spark, args.src, args.container).join(names, "name", "left_semi")
        uploaded.append(target.upload(plan, args.src))
        p.build_manifest(
            scan_directory(spark, args.src, args.container),
            manifest_ts=int(time.time() * 1000) + batch_id,
        ).write.mode("append").parquet(_manifest_dir(args.store))

    run_incremental_sync(stream, os.path.join(args.store, "__checkpoint__"), on_batch)
    _emit({"cmd": "watch", "batches": len(uploaded), "uploaded": sum(uploaded)})
    return 0


def cmd_restore(args) -> int:
    from cassandra_syncer_spark.sync import SyncPipeline
    from cassandra_syncer_spark.sync.targets import DirectoryTarget

    spark = _spark()
    p = SyncPipeline()
    mdir = _manifest_dir(args.store)
    if not os.path.isdir(mdir):
        print("error: no manifest log under store", file=sys.stderr)
        return 2
    manifests = spark.read.parquet(mdir)
    if args.as_of_ms is not None:
        # time travel: restore the snapshot as of a past instant
        manifests = manifests.filter(F.col("manifest_ts") <= args.as_of_ms)
        if manifests.limit(1).count() == 0:
            print("error: no manifest at or before --as-of-ms", file=sys.stderr)
            return 2
    store_target = DirectoryTarget(args.store, args.container)
    stored = store_target.list_files(spark).filter(~F.col("name").startswith("__"))
    plan = p.restore_plan(manifests, stored)
    missing = plan.filter("is_missing").count()
    n = DirectoryTarget(args.dst, args.container).upload(plan.filter("NOT is_missing"), args.store)
    _emit({"cmd": "restore", "restored": n, "missing": missing})
    return 0 if missing == 0 else 3


def cmd_prune(args) -> int:
    from cassandra_syncer_spark.sync import SyncPipeline
    from cassandra_syncer_spark.sync.targets import DirectoryTarget

    spark = _spark()
    p = SyncPipeline()
    mdir = _manifest_dir(args.store)
    if not os.path.isdir(mdir):
        print("error: no manifest log under store", file=sys.stderr)
        return 2
    manifests = spark.read.parquet(mdir)
    stored = (
        DirectoryTarget(args.store, args.container)
        .list_files(spark)
        .filter(~F.col("name").startswith("__"))
    )
    prunable = p.prune_plan(
        manifests,
        stored,
        now_ms=int(time.time() * 1000),
        older_than_ms=args.older_than_days * 24 * 3600 * 1000,
    )
    names = [r.name for r in prunable.select("name").collect()]
    if not args.dry_run:
        for name in names:
            path = os.path.join(args.store, name)
            if os.path.exists(path):
                os.remove(path)
    _emit({"cmd": "prune", "pruned": len(names), "dry_run": args.dry_run, "names": sorted(names)})
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="cassandra_syncer_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("backup", help="full/incremental backup + manifest snapshot")
    b.add_argument("src"), b.add_argument("store")
    b.add_argument("--container", default="default")
    b.set_defaults(fn=cmd_backup)

    w = sub.add_parser("watch", help="streamed incremental sync (drains pending)")
    w.add_argument("src"), w.add_argument("store")
    w.add_argument("--container", default="default")
    w.set_defaults(fn=cmd_watch)

    r = sub.add_parser("restore", help="restore minimum set from latest manifest")
    r.add_argument("store"), r.add_argument("dst")
    r.add_argument("--container", default="default")
    r.add_argument("--as-of-ms", type=int, default=None,
                   help="time travel: restore the snapshot as of this epoch-ms")
    r.set_defaults(fn=cmd_restore)

    pr = sub.add_parser("prune", help="delete stored files no retained manifest references")
    pr.add_argument("store")
    pr.add_argument("--older-than-days", type=int, default=21)
    pr.add_argument("--dry-run", action="store_true")
    pr.add_argument("--container", default="default")
    pr.set_defaults(fn=cmd_prune)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
