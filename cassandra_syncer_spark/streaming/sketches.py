"""Streaming sketch maintenance: count-min partials over a file stream.

The pattern completing the mergeable-partials story (``agg_hll_union``
persists HLL shard partials; ``agg_partial_merge`` plain-agg partials):
each microbatch folds into a fixed d×w count-min cells frame
(operators/cms.py — ≤32k rows regardless of batch size) and APPENDS it to
a parquet partials log.  Merge happens on read by cell-wise sum, which is
associative + commutative — so batch boundaries, replay order, and
at-least-once re-appends of a FAILED batch never change the merged sketch
(a re-appended *successful* batch would double-count; the checkpoint
prevents replay of committed batches, the same at-least-once contract as
``run_incremental_sync``).

Append-only beats read-merge-overwrite here: no self-overwrite race with
concurrent readers, no lost-update between two writers, and the log stays
tiny (d×w rows per batch; ``compact_cells`` folds it back to one sketch
when the batch count grows).

Frequency queries then answer from the merged sketch without touching the
raw stream history — the 100 TB shape for "how often did key X appear,
ever" over an unbounded ingest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cassandra_syncer_spark.operators import cms


def run_streaming_cms(
    stream: DataFrame,
    key_col: str,
    checkpoint_dir: str,
    cells_log: str,
) -> None:
    """Drain a stream (availableNow — deterministic for tests; drop the
    trigger for continuous deployments) appending one cells partial per
    microbatch."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        cms.cells(batch_df, key_col).write.mode("append").parquet(cells_log)

    (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def read_cms(spark: SparkSession, cells_log: str) -> DataFrame:
    """The merged sketch: cell-wise sum over every appended partial."""
    return cms.merge_cells(spark.read.parquet(cells_log))


def compact_cells(spark: SparkSession, cells_log: str, out_path: str) -> None:
    """Fold the partials log back to a single ≤ d×w-row sketch (run
    periodically; the merged result is byte-equivalent by associativity)."""
    read_cms(spark, cells_log).write.mode("overwrite").parquet(out_path)


def hist_cells(df: DataFrame, value_col: str, lo: int, hi: int, n_bins: int = 1024) -> DataFrame:
    """Fold integer values into fixed-bound histogram counters (bin, c) —
    the streaming/production mode of ``agg_percentile_hist``: bounds are
    known A PRIORI (fixed domain), so the fold is one pass and partials
    from any shard or microbatch merge by cell-wise sum.  Out-of-domain
    values clamp to the edge bins (they'd otherwise be silently lost —
    the clamp keeps total mass equal to row count, and a fat edge bin is
    the visible symptom of a mis-declared domain)."""
    from pyspark.sql import functions as F

    span = hi - lo + 1
    bin_col = F.expr(
        f"least(greatest((({value_col} - {lo}) * {n_bins}) div {span}, 0), {n_bins - 1})"
    )
    return (
        df.select(bin_col.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )


def run_streaming_hist(
    stream: DataFrame,
    value_col: str,
    lo: int,
    hi: int,
    checkpoint_dir: str,
    cells_log: str,
    n_bins: int = 1024,
) -> None:
    """Maintain histogram partials over a stream (same append-only
    contract as :func:`run_streaming_cms`)."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        hist_cells(batch_df, value_col, lo, hi, n_bins).write.mode("append").parquet(
            cells_log
        )

    (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def read_hist(spark: SparkSession, cells_log: str) -> DataFrame:
    """The merged histogram: cell-wise sum over every appended partial."""
    from pyspark.sql import functions as F

    return (
        spark.read.parquet(cells_log)
        .groupBy("bin")
        .agg(F.sum("c").cast("long").alias("c"))
    )


def hist_quantile(hist: DataFrame, lo: int, hi: int, pct: int, n_bins: int = 1024) -> DataFrame:
    """Quantile read-out from a merged histogram: 1-row DataFrame with the
    estimate (bin lower bound) — windows over ≤ n_bins counters, never
    rows; same integer math as ``agg_percentile_hist``."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    span = hi - lo + 1
    cum = hist.withColumn(
        "cum",
        F.sum("c").over(
            Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    total = hist.agg(F.sum("c").alias("n"))
    return (
        cum.crossJoin(F.broadcast(total))
        .groupBy()
        .agg(
            F.min(
                F.when(
                    F.col("cum") >= F.expr(f"({pct} * n + 99) div 100"), F.col("bin")
                )
            ).alias("bin_est")
        )
        .select(
            F.expr(f"{lo} + (bin_est * {span}) div {n_bins}")
            .cast("long")
            .alias("est")
        )
    )


def bitmap_cells(df: DataFrame, key_col: str, id_col: str) -> DataFrame:
    """Fold rows into exact-distinct bitmap partials (key, bucket, bm) —
    the streaming/production mode of ``agg_distinct_bitmap``
    (queries/analytics_r5c.py): bucket = id div 64, one bit per id within
    the bucket, map-side bit_or combine.  Assumes a non-negative integer
    id space (same contract as the batch query): integer ``div`` keeps
    the bucket exact for ids above 2^53, where float division would
    round, and negative ids (which would floor-divide into a bucket
    whose shiftleft is undefined) violate the contract."""
    from pyspark.sql import functions as F

    return (
        df.select(
            F.col(key_col).alias("key"),
            F.expr(f"{id_col} div 64").cast("long").alias("bucket"),
            F.expr(f"shiftleft(1L, int({id_col} % 64))").alias("bit"),
        )
        .groupBy("key", "bucket")
        .agg(F.expr("bit_or(bit)").alias("bm"))
    )


def run_streaming_bitmap(
    stream: DataFrame,
    key_col: str,
    id_col: str,
    checkpoint_dir: str,
    cells_log: str,
) -> None:
    """Maintain exact-distinct bitmap partials over a stream (same
    append-only log layout as :func:`run_streaming_cms`) — with one
    STRONGER property than the summing sketches: bit_or is IDEMPOTENT,
    so even a re-appended *successful* batch cannot change the merged
    count (re-OR-ing the same bits is a no-op).  The count-min/histogram
    logs rely on the checkpoint to prevent double-counting; the bitmap
    log tolerates full at-least-once replay — the right sketch to pair
    with a sink that may duplicate appends."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        bitmap_cells(batch_df, key_col, id_col).write.mode("append").parquet(cells_log)

    (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def read_distinct(spark: SparkSession, cells_log: str) -> DataFrame:
    """Exact per-key distinct counts from the merged bitmap log: second
    bit_or per (key, bucket), then popcount sum — never re-reads the raw
    stream history."""
    from pyspark.sql import functions as F

    return (
        spark.read.parquet(cells_log)
        .groupBy("key", "bucket")
        .agg(F.expr("bit_or(bm)").alias("bm"))
        .groupBy("key")
        .agg(F.sum(F.bit_count("bm")).cast("long").alias("n_distinct"))
    )
