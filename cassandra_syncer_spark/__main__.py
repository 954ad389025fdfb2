"""CLI — user-facing parity with the reference's two executables.

Reference commands → engine commands:

| reference                                  | here |
|--------------------------------------------|------|
| ``cassandra-syncer --url dir://STORE PATH`` (bin/cassandra-syncer:243-280) | ``backup SRC STORE`` |
| continuous watch loop (``:276``)           | ``watch SRC STORE`` (drains pending files via Structured Streaming, availableNow) |
| ``cassandra-syncer-restore --url dir://STORE PATH`` (bin/cassandra-syncer-restore:116-146) | ``restore STORE DST`` |
| fsck prune (README.md:26-28, spec only)    | ``prune STORE --older-than-days N`` — implemented here |

The STORE argument takes the reference's pluggable-target url form
(``README.md:9-17``): ``dir://PATH`` (or a bare path) syncs to a directory
target with name-identity plans; ``objstore://PATH`` syncs to the
cloudfiles-analog object store (md5-etag content identity, conditional
put, chunked transfer).  The manifest log is a parquet table under
``STORE/__manifests__`` (the reference used ``<epoch-ms>.json`` objects; a
log table is the same append-only snapshot model, queryable).

Usage::

    python -m cassandra_syncer_spark backup  /var/lib/cassandra/data /backup
    python -m cassandra_syncer_spark backup  /data1 /data2 objstore:///backup
    python -m cassandra_syncer_spark watch   /var/lib/cassandra/data /backup --follow
    python -m cassandra_syncer_spark restore /backup /var/lib/cassandra/data
    python -m cassandra_syncer_spark prune   /backup --older-than-days 21 --dry-run
    python -m cassandra_syncer_spark backup  --config sync.json   # store/paths from JSON
    python -m cassandra_syncer_spark restore --config sync.json   # + restore_path
    python -m cassandra_syncer_spark query --list                 # analytics surface
    python -m cassandra_syncer_spark query q5_local_volume --sf-dir /data --explain

The JSON config mirrors the reference's ``--config``
(``bin/cassandra-syncer:246-251``, ``contrib/config.json.example``): keys
``store``, ``paths``, ``container``, ``interval``, ``older_than_days``,
``restore_path``; the reference's Rackspace auth keys are accepted and
ignored (see :func:`_resolve_config`).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

from pyspark.sql import functions as F


def _resolve_config(args) -> None:
    """Apply ``--config file.json`` defaults (reference:
    ``bin/cassandra-syncer:246-251`` reads a JSON config; example at
    ``contrib/config.json.example``).  Recognized keys:

    - ``store``: target url (``dir://``/``objstore://``/bare path)
    - ``paths``: list of source roots (backup/watch)
    - ``container``, ``interval``, ``older_than_days``, ``restore_path``
    - ``RACKSPACE_USERNAME``/``RACKSPACE_TOKEN``/``HOST``/``USE_SERVICENET``/
      ``CACHE_PATH``: accepted and ignored — Rackspace auth plumbing with no
      analog here (restore-side caching is the store's etag skip).

    Explicit CLI values win.  When the config supplies ``store``, every
    positional is a source; otherwise the last positional is the store
    (the flagless grammar unchanged)."""
    cfg: dict = {}
    if getattr(args, "config", None):
        with open(args.config) as fh:
            cfg = json.load(fh)
    cmd = args.cmd
    if cmd in ("backup", "watch"):
        srcs = args.src if cmd == "backup" else ([args.src] if args.src else [])
        if args.store is None and srcs and "store" not in cfg:
            args.store = srcs.pop()  # flagless grammar: last positional
        if args.store is None:
            args.store = cfg.get("store")
        if not srcs:
            srcs = [str(p) for p in cfg.get("paths", [])]
        if cmd == "backup":
            args.src = srcs
        else:
            if len(srcs) > 1:
                # never silently watch only paths[0] of a multi-path config
                raise SystemExit(
                    "error: watch takes ONE source path; config supplies "
                    f"{len(srcs)} — run one watch per path (backup accepts all)"
                )
            args.src = srcs[0] if srcs else None
        if not args.src or args.store is None:
            raise SystemExit(f"error: {cmd} needs source path(s) and a store "
                             "(positionals or --config with paths/store)")
    elif cmd in ("restore", "prune"):
        if cmd == "restore":
            if args.dst is None and args.store is not None:
                # one positional: it is the DST when the config supplies the
                # store, else it is the STORE (dst then comes from config)
                if "store" in cfg:
                    args.dst = args.store
                    args.store = None
                else:
                    args.dst = cfg.get("restore_path")
            elif args.dst is None:
                args.dst = cfg.get("restore_path")
            if args.dst is None:
                raise SystemExit("error: restore needs a destination "
                                 "(positional or config restore_path)")
        if args.store is None:
            args.store = cfg.get("store")
        if args.store is None:
            raise SystemExit(f"error: {cmd} needs a store (positional or config)")
    if getattr(args, "container", None) is None:
        # reference default: the machine's hostname names the container
        # (bin/cassandra-syncer-restore:37, os.hostname()).  Implicit
        # hostname defaults may fall back to the pre-round-6 literal
        # "default" container on restore/prune (_fallback_container).
        import socket

        args.container_explicit = "container" in cfg
        args.container = cfg.get("container") or socket.gethostname()
    else:
        args.container_explicit = True
    if getattr(args, "interval", None) is None and hasattr(args, "interval"):
        args.interval = cfg.get("interval", "1 second")
    if getattr(args, "older_than_days", None) is None and hasattr(args, "older_than_days"):
        args.older_than_days = int(cfg.get("older_than_days", 21))


def _parse_store(url: str) -> tuple[str, str]:
    """Reference target-url scheme (``dir://``, ``cloudfiles://`` →
    ``objstore://`` here, README.md:9-17).  Bare paths mean dir://."""
    for scheme in ("objstore", "dir"):
        if url.startswith(scheme + "://"):
            return scheme, url[len(scheme) + 3 :]
    return "dir", url


def _target(url: str, container: str):
    """(target, store_path, scheme) for a store url."""
    kind, path = _parse_store(url)
    if kind == "objstore":
        from cassandra_syncer_spark.sync.object_store import ObjectStoreTarget

        return ObjectStoreTarget(path, container), path, kind
    from cassandra_syncer_spark.sync.targets import DirectoryTarget

    return DirectoryTarget(path, container), path, kind


def _scan(spark, src: str, container: str, scheme: str):
    """Local scan matched to the target's identity model: object stores
    reconcile by content etag (storage-object.js:123-124), directory
    targets by name."""
    if scheme == "objstore":
        from cassandra_syncer_spark.sync.object_store import scan_directory_with_etags

        return scan_directory_with_etags(spark, src, container)
    from cassandra_syncer_spark.sync.targets import scan_directory

    return scan_directory(spark, src, container)


def _manifest_dir(store: str) -> str:
    return os.path.join(store, "__manifests__")


def _fallback_container(manifests, args, cfg_explicit: bool) -> None:
    """Hostname-default migration shim: containers created before the
    default changed from the literal ``"default"`` to the machine
    hostname (reference parity, bin/cassandra-syncer-restore:37) would
    otherwise stop restoring/pruning without an explicit ``--container``.
    When the implicit hostname container has NO manifests in this store
    but the legacy ``"default"`` container does, fall back to it (and say
    so).  Never overrides an explicit --container/config value."""
    if cfg_explicit:
        return
    present = {
        r["container"]
        for r in manifests.select("container").distinct().collect()
    }
    if args.container not in present and "default" in present:
        print(
            f"note: no manifests for container {args.container!r}; "
            "falling back to legacy container 'default'",
            file=sys.stderr,
        )
        args.container = "default"


def _compact_manifest_log(
    spark, pipeline, mdir: str, keep_window_ms: int = 24 * 3600 * 1000
) -> None:
    """Rewrite the manifest log to latest-per-container + a recent window
    (``SyncPipeline.compact_manifests``), bounding per-batch log reads
    under snapshot-per-commit.  Atomic swap via directory renames —
    correct under the watch loop's single-writer regime (concurrent
    restore readers should not race a live compaction; run restores
    against a quiesced store, as with the reference)."""
    import shutil

    compacted = pipeline.compact_manifests(
        spark.read.parquet(mdir),
        keep_since_ms=int(time.time() * 1000) - keep_window_ms,
    )
    tmp, old = mdir + ".compact-tmp", mdir + ".compact-old"
    shutil.rmtree(tmp, ignore_errors=True)
    compacted.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(old, ignore_errors=True)
    os.replace(mdir, old)   # current log aside…
    os.replace(tmp, mdir)   # …compacted log in — two cheap renames
    shutil.rmtree(old, ignore_errors=True)


def _spark():
    from cassandra_syncer_spark.session import get_spark

    spark = get_spark(app_name="cassandra-syncer-spark-cli")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _emit(payload: dict) -> None:
    print(json.dumps(payload))


def cmd_backup(args) -> int:
    """Full/incremental backup of one or more source roots (the reference
    watches multiple paths in one run: ``[].concat(argv.path)``,
    bin/cassandra-syncer:267) — scans union (§2.7 set_union_all dataflow),
    each row tagged with its root so the distributed copy resolves
    per-row sources."""
    from functools import reduce

    from cassandra_syncer_spark.sync import SyncPipeline

    spark = _spark()
    p = SyncPipeline()
    target, store_path, scheme = _target(args.store, args.container)
    scans = [
        _scan(spark, s, args.container, scheme).withColumn(
            "src_root", F.lit(os.path.abspath(s))
        )
        for s in args.src
    ]
    local = reduce(lambda a, b: a.unionByName(b), scans)
    if len(args.src) > 1:
        # cross-root name collisions: two roots holding the same relative
        # name would otherwise race the distributed copy (last writer wins
        # nondeterministically) and the manifest would record one name for
        # two contents.  Keep a deterministic winner: newest last_modified,
        # ties broken by src_root.
        from pyspark.sql.window import Window

        w = Window.partitionBy("name").orderBy(
            F.desc("last_modified"), F.desc("src_root")
        )
        local = (
            local.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    remote = target.list_files(spark)
    # directory stores have no container listing: "container exists" ≡ the
    # store already holds any object (reference probe: bin/cassandra-syncer:162-177)
    full = remote.limit(1).count() == 0
    plan = p.plan_upload(local, remote)
    n = target.upload(plan)
    ts = int(time.time() * 1000)
    p.build_manifest(local, manifest_ts=ts).write.mode("append").parquet(_manifest_dir(store_path))
    _emit({
        "cmd": "backup",
        "full": bool(full),
        "uploaded": n,
        "manifest_ts": ts,
        "sources": len(args.src),
        "target": scheme,
    })
    return 0


def cmd_watch(args) -> int:
    """Streamed incremental sync over the file source — the reference's
    inotify loop (bin/cassandra-syncer:276).  Default drains pending files
    and exits (availableNow); ``--follow`` keeps watching across live
    microbatches (processingTime trigger), stopping only on
    ``--max-batches``/``--timeout-sec`` if given.

    Per-batch cost scales with the BATCH, not the source tree: the upload
    plan is the batch's names (the conditional put hashes bytes en route —
    no separate full-tree etag scan), and the manifest is the cumulative
    live set (previous snapshot ⊎ batch delta) — between rebaselines, no
    rescans of the source at all beyond the stream's own metadata-only
    file discovery.

    Every ``--rebaseline-every``-th data batch (default 16) does two
    bounded maintenance passes: (a) the manifest is rebuilt from a
    METADATA-ONLY tree listing (names, no content reads) so files deleted
    from the source — e.g. compacted-away SSTables — drop out of the
    snapshot within bounded staleness instead of resurrecting on every
    restore forever; (b) the manifest log is compacted (latest per
    container + recent window) so per-batch log reads don't grow without
    bound under snapshot-per-commit.  The watch loop is the log's single
    writer, making the compaction swap safe."""
    from cassandra_syncer_spark.streaming.watch import (
        cumulative_live_set,
        run_continuous_sync,
        run_incremental_sync,
    )
    from cassandra_syncer_spark.sync import SyncPipeline
    from cassandra_syncer_spark.sync.targets import strip_root

    spark = _spark()
    p = SyncPipeline()
    target, store_path, scheme = _target(args.store, args.container)
    stream = (
        spark.readStream.format("binaryFile")
        .schema("path string, modificationTime timestamp, length long, content binary")
        .option("recursiveFileLookup", "true")
        .load(args.src)
        .select(
            strip_root(args.src).alias("name"),
            F.col("length").alias("bytes"),
        )
    )
    uploaded = []
    last_ts = [0]

    def next_manifest_ts() -> int:
        # strictly monotonic even when two batches land in one millisecond —
        # latest_manifests must never have to break a manifest_ts tie
        last_ts[0] = max(last_ts[0] + 1, int(time.time() * 1000))
        return last_ts[0]

    mdir = _manifest_dir(store_path)

    def on_batch(batch_df, batch_id):
        from cassandra_syncer_spark.sync.targets import scan_directory

        names = batch_df.select("name").filter(~F.col("name").contains(p.TEMP_MARKER))
        uploaded.append(target.upload(names, args.src))
        rebaseline = len(uploaded) % args.rebaseline_every == 0
        if rebaseline:
            # metadata-only tree listing: deletions drop out of the
            # snapshot; no file content is read
            live = p.live_files(
                scan_directory(spark, args.src, args.container)
            ).select("name", "container")
        else:
            live = cumulative_live_set(spark, mdir, args.container, names)
        p.build_manifest(live, manifest_ts=next_manifest_ts()).write.mode(
            "append"
        ).parquet(mdir)
        if rebaseline:
            _compact_manifest_log(spark, p, mdir)

    ckpt = os.path.join(store_path, "__checkpoint__")
    if args.follow:
        run_continuous_sync(
            stream,
            ckpt,
            on_batch,
            max_batches=args.max_batches,
            timeout_sec=args.timeout_sec,
            processing_interval=args.interval,
        )
    else:
        run_incremental_sync(stream, ckpt, on_batch)
    _emit({"cmd": "watch", "batches": len(uploaded), "uploaded": sum(uploaded)})
    return 0


#: name of the local restore-manifest cache the reference keeps at the
#: restore destination (bin/cassandra-syncer-restore:28,91-94)
RESTORE_MANIFEST = "restoremanifest.json"


def cmd_restore(args) -> int:
    from cassandra_syncer_spark.sync import SyncPipeline
    from cassandra_syncer_spark.sync.targets import DirectoryTarget

    spark = _spark()
    p = SyncPipeline()
    store_target, store_path, scheme = _target(args.store, args.container)
    mdir = _manifest_dir(store_path)
    if not os.path.isdir(mdir):
        print("error: no manifest log under store", file=sys.stderr)
        return 2
    manifests = spark.read.parquet(mdir)
    _fallback_container(manifests, args, getattr(args, "container_explicit", True))
    store_target, store_path, scheme = _target(args.store, args.container)
    # restore is per-container: another machine's snapshots in the same
    # store must not leak into this restore's target_ts / skip cache
    manifests = manifests.filter(F.col("container") == args.container)
    if args.as_of_ms is not None:
        # time travel: restore the snapshot as of a past instant
        manifests = manifests.filter(F.col("manifest_ts") <= args.as_of_ms)
        if manifests.limit(1).count() == 0:
            print("error: no manifest at or before --as-of-ms", file=sys.stderr)
            return 2
    # Local restoremanifest.json skip cache — an EXTENSION, not reference
    # parity: the reference's restoremanifest.json (bin/cassandra-syncer-
    # restore:28,91-94) is just the downloaded latest manifest, and the
    # reference ALWAYS re-lists and re-downloads.  Here a completed restore
    # records (store, container, manifest_ts); a re-run targeting the same
    # snapshot from the same store skips the store listing + downloads —
    # but only after cheaply verifying every manifest-named file still
    # exists in dst (deleting restored files invalidates the skip; the
    # store key stops a same-container/same-ts restore from a DIFFERENT
    # store being wrongly skipped).  Delete the file to force a full pass.
    latest = p.latest_manifests(manifests)
    target_ts = latest.agg(F.max("manifest_ts").alias("ts")).collect()[0]["ts"]
    cache_path = os.path.join(args.dst, RESTORE_MANIFEST)
    if os.path.isfile(cache_path):
        try:
            with open(cache_path) as fh:
                cached = json.load(fh)
        except (OSError, ValueError):
            cached = {}
        if (
            cached.get("manifest_ts") == target_ts
            and cached.get("container") == args.container
            and cached.get("store") == args.store
        ):
            # dst verification: existence of every manifest path (names
            # only — dst is a local directory, so this is inherently a
            # driver-local stat pass, bounded by manifest size)
            names = [
                r["name"]
                for r in latest.select(
                    F.explode("paths").alias("name")
                ).collect()
            ]
            if names and all(
                os.path.exists(os.path.join(args.dst, n)) for n in names
            ):
                _emit(
                    {
                        "cmd": "restore",
                        "restored": 0,
                        "missing": 0,
                        "cached": True,
                        "manifest_ts": target_ts,
                    }
                )
                return 0
    stored = store_target.list_files(spark).filter(~F.col("name").startswith("__"))
    plan = p.restore_plan(manifests, stored)
    missing = plan.filter("is_missing").count()
    wanted = plan.filter("NOT is_missing")
    if scheme == "objstore":
        n = store_target.download(wanted, args.dst, cache_root=args.cache_dir)
    else:
        n = DirectoryTarget(args.dst, args.container).upload(wanted, store_path)
    if missing == 0:
        # record the materialized snapshot only when it restored completely
        # — a partial restore must re-list next run so late-arriving store
        # objects are picked up
        os.makedirs(args.dst, exist_ok=True)
        with open(cache_path, "w") as fh:
            json.dump(
                {
                    "store": args.store,
                    "container": args.container,
                    "manifest_ts": target_ts,
                    "restored": n,
                },
                fh,
            )
    _emit({"cmd": "restore", "restored": n, "missing": missing})
    return 0 if missing == 0 else 3


def cmd_prune(args) -> int:
    from cassandra_syncer_spark.sync import SyncPipeline

    spark = _spark()
    p = SyncPipeline()
    target, store_path, scheme = _target(args.store, args.container)
    mdir = _manifest_dir(store_path)
    if not os.path.isdir(mdir):
        print("error: no manifest log under store", file=sys.stderr)
        return 2
    manifests = spark.read.parquet(mdir)
    _fallback_container(manifests, args, getattr(args, "container_explicit", True))
    target, store_path, scheme = _target(args.store, args.container)
    stored = target.list_files(spark).filter(~F.col("name").startswith("__"))
    prunable = p.prune_plan(
        manifests,
        stored,
        now_ms=int(time.time() * 1000),
        older_than_ms=args.older_than_days * 24 * 3600 * 1000,
    ).cache()
    # a prune set can be millions of files — deletion runs distributed
    # (foreachPartition), never a collected driver loop; the report shows
    # a bounded sample of names, not the full set
    # TakeOrderedAndProject: bounded, deterministic sample for the report
    sample = [r.name for r in prunable.select("name").sort("name").take(100)]
    if args.dry_run:
        n = prunable.count()
    else:
        n = target.delete(prunable)
    prunable.unpersist()
    _emit({"cmd": "prune", "pruned": n, "dry_run": args.dry_run, "names_sample": sample})
    return 0


def cmd_query(args) -> int:
    """Run any registered analytics operator from the CLI — the same
    surface the driver contract exposes (``__spark_entry__.queries()``),
    so an engine user can run every SURVEY.md §2 query without writing
    Python.  ``--list`` enumerates; ``--explain`` prints the physical
    plan instead of executing (the 100 TB pre-flight check)."""
    from cassandra_syncer_spark.registry import REGISTRY, all_queries

    all_queries()
    if args.list:
        _emit({"cmd": "query", "queries": sorted(REGISTRY)})
        return 0
    if not args.name or args.name not in REGISTRY:
        _emit({
            "cmd": "query",
            "error": f"unknown query {args.name!r} — use --list",
        })
        return 2
    spark = _spark()
    df = REGISTRY[args.name].fn(spark, args.sf_dir)
    if args.explain:
        print(df._jdf.queryExecution().executedPlan().toString())
        return 0
    shown = [r.asDict(recursive=True) for r in df.limit(args.limit).collect()]
    _emit({
        "cmd": "query",
        "name": args.name,
        "columns": df.columns,
        "rows_shown": len(shown),
        "limit": args.limit,
        "rows": shown,
    })
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="cassandra_syncer_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("backup", help="full/incremental backup + manifest snapshot (multi-path: SRC1 SRC2 ... STORE)")
    b.add_argument("src", nargs="*"), b.add_argument("store", nargs="?")
    b.add_argument("--container", default=None)
    b.add_argument("--config", default=None, help="JSON config supplying store/paths/container defaults")
    b.set_defaults(fn=cmd_backup)

    w = sub.add_parser("watch", help="streamed incremental sync (drains pending; --follow keeps watching)")
    w.add_argument("src", nargs="?"), w.add_argument("store", nargs="?")
    w.add_argument("--container", default=None)
    w.add_argument("--config", default=None, help="JSON config supplying store/paths/interval defaults")
    w.add_argument("--follow", action="store_true",
                   help="keep watching (processingTime trigger) instead of drain-and-exit")
    w.add_argument("--interval", default=None, help="--follow trigger interval (default: 1 second)")
    w.add_argument("--max-batches", type=int, default=None,
                   help="--follow: stop after N data-carrying microbatches")
    w.add_argument("--timeout-sec", type=float, default=None,
                   help="--follow: stop after this many seconds")
    w.add_argument("--rebaseline-every", type=int, default=16,
                   help="every Nth data batch: manifest from a metadata-only "
                        "tree listing (drops deleted files) + manifest-log "
                        "compaction (default 16)")
    w.set_defaults(fn=cmd_watch)

    r = sub.add_parser("restore", help="restore minimum set from latest manifest")
    r.add_argument("store", nargs="?"), r.add_argument("dst", nargs="?")
    r.add_argument("--container", default=None)
    r.add_argument("--config", default=None, help="JSON config supplying store/restore_path defaults")
    r.add_argument("--as-of-ms", type=int, default=None,
                   help="time travel: restore the snapshot as of this epoch-ms")
    r.add_argument("--cache-dir", default=None,
                   help="write-through download cache dir (reference core.js:336-368); "
                        "re-restores reuse etag-valid cached objects")
    r.set_defaults(fn=cmd_restore)

    pr = sub.add_parser("prune", help="delete stored files no retained manifest references")
    pr.add_argument("store", nargs="?")
    pr.add_argument("--older-than-days", type=int, default=None)
    pr.add_argument("--dry-run", action="store_true")
    pr.add_argument("--container", default=None)
    pr.add_argument("--config", default=None, help="JSON config supplying store/older_than_days defaults")
    pr.set_defaults(fn=cmd_prune)

    q = sub.add_parser("query", help="run a registered analytics query (SURVEY.md §2 surface)")
    q.add_argument("name", nargs="?", help="query id (see --list)")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.01",
                   help="fixture/table directory (default sf0.01)")
    q.add_argument("--limit", type=int, default=20, help="max rows to print (default 20)")
    q.add_argument("--list", action="store_true", help="list registered query ids")
    q.add_argument("--explain", action="store_true",
                   help="print the physical plan instead of executing")
    q.set_defaults(fn=cmd_query)

    args = ap.parse_args(argv)
    _resolve_config(args)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
