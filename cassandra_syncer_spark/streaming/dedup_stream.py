"""Streaming near-dup dedup — the steady-state 100 TB corpus pipeline
composed end-to-end: a document stream probes the persisted MinHash band
index (operators/band_index.py) for collisions with everything ingested
before it, emits the candidate pairs, and appends its own band rows so
later batches see it.

Per microbatch (foreachBatch, checkpointed — at-least-once with replay
of only UNcommitted batches):

1. ``build_bands(batch)``   — signature + banding, the same portable
   expressions as the batch queries;
2. ``probe_index``          — cross pairs vs the existing corpus:
   shuffle O(batch + matched buckets), never O(corpus);
3. batch-local self-join    — within-batch pairs (the probe can't see
   docs appended in the same batch);
4. append matches to the pairs log, append bands to the index
   (partitioned by band_id — probe-side directory pruning).

Replay safety: foreachBatch is at-least-once, and the two appends are
not atomic — a crash between them replays the whole batch.  Every row
written therefore carries ``batch_id``, and both readers are
replay-idempotent: ``read_pairs`` collapses exact duplicate
(pair, batch_id) rows before summing across batches, and
``probe_index`` counts DISTINCT band ids so duplicated index rows
cannot inflate ``n_shared_bands``.

Invariant (unit-tested): the union of emitted pairs over all batches
equals the one-shot batch dedup's candidate pairs over the full corpus —
streaming ingestion order changes WHICH batch emits a pair, never the
pair set, and batch replays never change it either.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from cassandra_syncer_spark.operators.band_index import (
    append_index,
    build_bands,
    probe_index,
)


def _within_batch_pairs(bands: DataFrame) -> DataFrame:
    """Bucket-local self-join inside one batch — identical shape to the
    batch queries' pair expansion (never collect_list)."""
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_bands"))
    )


def run_streaming_dedup(
    stream_docs: DataFrame,
    checkpoint_dir: str,
    index_path: str,
    pairs_log: str,
) -> None:
    """Drain a (doc_id, text) stream (availableNow — deterministic for
    tests; drop the trigger for continuous deployments), maintaining the
    band index and the candidate-pairs log."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        bands = build_bands(batch_df.select("doc_id", "text"))
        # bands feed three consumers (probe, self-join both sides,
        # append) — materialize once instead of re-signaturing
        bands = bands.localCheckpoint()
        pairs = _within_batch_pairs(bands)
        # Existence probe must work for any FS URI (hdfs://, s3://) —
        # never a driver-local os.path check.
        try:
            idx_exists = bool(spark.read.parquet(index_path).schema.fields)
        except AnalysisException:
            idx_exists = False
        if idx_exists:
            cross = probe_index(spark, index_path, bands).select(
                F.col("new_doc").alias("doc_a"),
                F.col("existing_doc").alias("doc_b"),
                "n_shared_bands",
            )
            pairs = pairs.unionByName(cross)
        pairs.withColumn("batch_id", F.lit(batch_id).cast("long")).write.mode(
            "append"
        ).parquet(pairs_log)
        append_index(
            bands.withColumn("batch_id", F.lit(batch_id).cast("long")), index_path
        )

    (
        stream_docs.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def read_pairs(spark: SparkSession, pairs_log: str) -> DataFrame:
    """The accumulated candidate-pair set, direction-normalized (the
    probe emits (new, existing) which may order either way).

    Replay-idempotent: a replayed batch rewrites byte-identical
    (pair, batch_id, n_shared_bands) rows, so the inner max over
    (pair, batch_id) collapses them before the cross-batch sum.  Logs
    written before the batch_id column existed read as batch_id=null,
    which the same grouping handles (one group per pair).  mergeSchema
    is forced: a MIXED log (pre-upgrade files without batch_id plus new
    files) must not let Spark infer the old schema from one footer and
    project batch_id away for every row — that would collapse all
    batches into one null group and degrade the cross-batch sum to a
    max (undercount)."""
    raw = spark.read.option("mergeSchema", "true").parquet(pairs_log)
    if "batch_id" not in raw.columns:
        raw = raw.withColumn("batch_id", F.lit(None).cast("long"))
    return (
        raw.select(
            F.least("doc_a", "doc_b").alias("doc_a"),
            F.greatest("doc_a", "doc_b").alias("doc_b"),
            "batch_id",
            "n_shared_bands",
        )
        .groupBy("doc_a", "doc_b", "batch_id")
        .agg(F.max("n_shared_bands").alias("n_shared_bands"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum("n_shared_bands").cast("long").alias("n_shared_bands"))
    )
