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

Invariant (unit-tested): the union of emitted pairs over all batches
equals the one-shot batch dedup's candidate pairs over the full corpus —
streaming ingestion order changes WHICH batch emits a pair, never the
pair set.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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
        if os.path.exists(index_path):
            cross = probe_index(spark, index_path, bands).select(
                F.col("new_doc").alias("doc_a"),
                F.col("existing_doc").alias("doc_b"),
                "n_shared_bands",
            )
            pairs = pairs.unionByName(cross)
        pairs.write.mode("append").parquet(pairs_log)
        append_index(bands, index_path)

    (
        stream_docs.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def read_pairs(spark: SparkSession, pairs_log: str) -> DataFrame:
    """The accumulated candidate-pair set, direction-normalized (the
    probe emits (new, existing) which may order either way)."""
    raw = spark.read.parquet(pairs_log)
    return (
        raw.select(
            F.least("doc_a", "doc_b").alias("doc_a"),
            F.greatest("doc_a", "doc_b").alias("doc_b"),
            "n_shared_bands",
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.sum("n_shared_bands").cast("long").alias("n_shared_bands"))
    )
