"""Continuous sync (EP2) — Structured Streaming file source standing in for
the reference's inotify watch.

Reference: inotify ``IN_MOVED_TO`` per watched path
(``bin/cassandra-syncer:195-206``) — the atomic-rename commit signal for
SSTables.  Spark's file source has the same trigger model: a new immutable
file appearing in a directory is discovered on the next microbatch, and the
checkpoint's seen-files log supplies the only-new-files invariant
(``bin/cassandra-syncer:268-277``) without bookkeeping.

Each microbatch mirrors the reference's event handler
(``bin/cassandra-syncer:141-143``): process the new files, then write a
fresh manifest (snapshot-per-commit).  Delivery is at-least-once
(checkpoint + idempotent sink), the same contract as the reference's
re-enqueue loop (``:71-80``).
"""

from __future__ import annotations

import threading
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def watch_files(
    spark: SparkSession, path: str, schema: str, fmt: str = "json"
) -> DataFrame:
    """Streaming source over a watched directory (new-file trigger).

    ``maxFilesPerTrigger`` bounds per-batch work the way the reference's
    queue concurrency (async.queue(…, 2)) bounded in-flight uploads.
    """
    return (
        spark.readStream.format(fmt)
        .schema(schema)
        .option("maxFilesPerTrigger", 64)
        .load(path)
    )


def cumulative_live_set(
    spark: SparkSession, manifest_log: str, container: str, batch_names: DataFrame
) -> DataFrame:
    """Previous snapshot ⊎ batch delta → the full live set, as (name,
    container) rows ready for ``build_manifest``.

    The watch stream only ever ADDS files (the reference's inotify
    ``IN_MOVED_TO`` — SSTables are immutable once committed; removals are
    prune's job), so the live set is the latest manifest's paths plus this
    batch's names.  Reading the manifest log replaces the per-batch
    O(source tree) rescan the round-2 implementation did: per-batch cost
    now scales with the snapshot row (one manifest per container), not
    with the corpus file count — at 10⁷-file sources the double tree-walk
    per microbatch was the dominant cost.  The log read is an eager file
    listing, so appending the new manifest to the same directory in the
    same batch is safe."""
    from pyspark.errors import AnalysisException

    from cassandra_syncer_spark.sync.pipeline import SyncPipeline

    names = batch_names.select("name")
    try:
        prev = (
            SyncPipeline()
            .latest_manifests(spark.read.parquet(manifest_log))
            .filter(F.col("container") == container)
            .select(F.explode("paths").alias("name"))
        )
        names = names.unionByName(prev)
    except AnalysisException as e:
        # ONLY a missing log means "first batch is the live set".  Any
        # other read failure (corrupt file, schema inference error) must
        # surface — swallowing it would silently degrade this manifest to
        # a batch-delta snapshot and a later restore would drop every
        # earlier batch's files.
        if "PATH_NOT_FOUND" not in str(e):
            raise
    return names.distinct().select("name", F.lit(container).alias("container"))


def run_incremental_sync(
    stream: DataFrame,
    checkpoint_dir: str,
    on_batch: Callable[[DataFrame, int], None],
    manifest_log: str | None = None,
    container: str = "default",
):
    """Drive the EP2 loop: per microbatch, hand new-file rows to the
    uploader callback, then snapshot a manifest row (snapshot-per-commit,
    bin/cassandra-syncer:141-143).  ``availableNow`` drains everything
    pending and stops — deterministic for tests; long-running deployments
    use :func:`run_continuous_sync`.

    When ``manifest_log`` is given, each batch appends a FULL-snapshot
    manifest: the cumulative live set (previous snapshot ⊎ batch delta,
    :func:`cumulative_live_set`) through the ``SyncPipeline.build_manifest``
    dataflow — an aggregation executed by Spark straight into the parquet
    log, never a driver-side collect of file names (a 100 TB batch's name
    set must not transit the driver).  Restore reads only the latest
    manifest per container, so every appended manifest must name the whole
    live set — a batch-delta-only manifest would silently drop earlier
    batches' files from restores.  manifest_ts is strictly monotonic
    across batches, so latest-manifest selection never faces a tie.

    ADDITIVE-ONLY caveat: the file stream never reports deletions, so a
    file removed from the source stays in every later manifest until a
    caller-side rebaseline (cmd_watch re-lists the tree every
    ``--rebaseline-every`` batches) or prune removes it.  Library callers
    that need deletions reflected must rebaseline the same way."""
    from cassandra_syncer_spark.sync.pipeline import SyncPipeline

    p = SyncPipeline()
    last_ts = [0]

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        on_batch(batch_df, batch_id)
        if manifest_log is not None:
            last_ts[0] = max(last_ts[0] + 1, int(time.time() * 1000))
            p.build_manifest(
                cumulative_live_set(
                    batch_df.sparkSession, manifest_log, container, batch_df
                ),
                manifest_ts=last_ts[0],
            ).write.mode("append").parquet(manifest_log)

    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def run_continuous_sync(
    stream: DataFrame,
    checkpoint_dir: str,
    on_batch: Callable[[DataFrame, int], None],
    manifest_log: str | None = None,
    container: str = "default",
    processing_interval: str = "1 second",
    max_batches: int | None = None,
    timeout_sec: float | None = None,
):
    """Long-running EP2: the reference's indefinite inotify loop
    (``bin/cassandra-syncer:276`` — backup then ``watch()`` forever),
    expressed as a ``processingTime``-triggered streaming query that keeps
    discovering and syncing new files across live microbatches.

    Production passes neither stop condition and runs until externally
    stopped; tests (and bounded deployments) pass ``max_batches`` — stop
    after that many *data-carrying* microbatches (empty polls don't
    count) — and/or ``timeout_sec`` as a wall-clock bound.  Manifests are
    FULL snapshots per commit (cumulative live set, see
    :func:`run_incremental_sync`), with strictly monotonic manifest_ts.
    """
    from cassandra_syncer_spark.sync.pipeline import SyncPipeline

    p = SyncPipeline()
    last_ts = [0]
    data_batches = [0]
    stop_now = threading.Event()

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        on_batch(batch_df, batch_id)
        if manifest_log is not None:
            last_ts[0] = max(last_ts[0] + 1, int(time.time() * 1000))
            p.build_manifest(
                cumulative_live_set(
                    batch_df.sparkSession, manifest_log, container, batch_df
                ),
                manifest_ts=last_ts[0],
            ).write.mode("append").parquet(manifest_log)
        data_batches[0] += 1
        if max_batches is not None and data_batches[0] >= max_batches:
            stop_now.set()

    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=processing_interval)
        .start()
    )
    deadline = None if timeout_sec is None else time.monotonic() + timeout_sec
    while q.isActive:
        if stop_now.is_set() or (deadline is not None and time.monotonic() > deadline):
            q.stop()
            break
        time.sleep(0.2)
    q.awaitTermination()
    return q


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    within: str = "15 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Stream-stream equi join bounded by an event-time interval: right
    rows with ``right_ts`` in ``[left_ts, left_ts + within]`` for the
    matching key.

    Both sides carry a watermark and the join condition carries the time
    range — the two things Structured Streaming needs to know WHEN a
    buffered row can never match again, so join state is evicted as the
    watermark advances instead of growing forever (the unbounded-state
    failure mode of a naive stream join at 100 TB of stream history).
    Column names must be disjoint across the two sides (rename before
    calling) — Spark's stream-stream join output cannot qualify
    duplicate names."""
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(f"stream_interval_join: overlapping columns {sorted(overlap)}")
    lhs = left.withWatermark(left_ts, watermark)
    rhs = right.withWatermark(right_ts, watermark)
    cond = (
        (F.col(left_key) == F.col(right_key))
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) <= F.expr(f"{left_ts} + INTERVAL {within}"))
    )
    return lhs.join(rhs, cond)


def streaming_dedup(stream: DataFrame, watermark_col: str = "ts") -> DataFrame:
    """Stateful streaming dedup on content identity (etag) — the
    only-new-files invariant enforced inside the stream.  The watermark
    bounds state: etags older than the horizon are evicted (at 100 TB of
    stream history, unbounded dedup state is the first thing to OOM)."""
    return stream.withWatermark(watermark_col, "10 minutes").dropDuplicatesWithinWatermark(
        ["etag"]
    )


def tumbling_counts(stream: DataFrame) -> DataFrame:
    """1-hour tumbling window aggregation with late-data drop (10-min
    watermark) — streaming twin of queries/windows.py::win_tumbling."""
    return (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
    )


def session_windows(stream: DataFrame) -> DataFrame:
    """Native session windows (30-min gap) — streaming twin of
    queries/windows.py::win_session."""
    return (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", "30 minutes"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
