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
