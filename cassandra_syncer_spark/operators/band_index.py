"""Persisted MinHash band index — the steady-state corpus-dedup lifecycle.

``dedup_incremental_minhash`` (queries/llm_dedup.py) demonstrates the
query shape; this module makes the production lifecycle concrete:

1. ``build_bands(docs)``   — signature + banding for a document frame
   (the same portable expressions as the batch queries, so index rows
   built today join index rows built last month).
2. ``append_index(bands, path)`` — append the batch's band rows to the
   parquet index, PARTITIONED BY band_id: each of the 4 band families
   lives in its own directory, so a probe that computes a band key only
   scans that band's partition (directory-level pruning, the same
   mechanism as ``sink_partitioned_prune``).
3. ``probe_index(spark, path, bands)`` — equi-join a new batch's band
   rows against the stored index: matches = (new doc, existing doc)
   pairs sharing ≥1 band.  Shuffle volume is O(batch + matched
   buckets), never O(corpus) — the corpus-side work happened once, at
   append time.

At 100 TB the index is the only thing the dedup steady state ever
rescans; compaction is optional (parquet append per batch; a periodic
rewrite re-sorts each band partition by band_key for better row-group
skipping).

Invariant (unit-tested): probing batch B against index(A) yields exactly
the A×B cross pairs of a full-corpus dedup over A ∪ B — incremental and
batch answers agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_syncer_spark.operators import fingerprint as fp


def build_bands(docs: DataFrame) -> DataFrame:
    """(doc_id, band_id, band_key) for a document frame with (doc_id, text)."""
    words = fp.words_expr("text", duck=False)
    sh = fp.shingles_expr("words", duck=False)
    sig = (
        docs.selectExpr("doc_id", f"{words} AS words")
        .selectExpr("doc_id", f"{sh} AS sh")
        .selectExpr("doc_id", f"{fp.shingle_hash_array('sh', duck=False)} AS hb")
        .selectExpr(
            "doc_id",
            *[
                f"{fp.minhash_expr('hb', p, duck=False)} AS mh{p}"
                for p in range(fp.NUM_PERMS)
            ],
        )
    )
    band_keys = [
        fp.band_key_expr([f"mh{p}" for p in range(fp.NUM_PERMS)], b, duck=False)
        for b in range(fp.BANDS)
    ]
    return sig.selectExpr(
        "doc_id", f"posexplode(array({', '.join(band_keys)})) AS (band_id, band_key)"
    )


def append_index(bands: DataFrame, path: str) -> None:
    """Append band rows to the persisted index, partitioned by band_id."""
    bands.write.mode("append").partitionBy("band_id").parquet(path)


def probe_index(spark: SparkSession, path: str, bands: DataFrame) -> DataFrame:
    """Match a new batch's band rows against the stored index.

    Returns (new_doc, existing_doc, n_shared_bands); the probe side is
    batch-sized, so Catalyst broadcasts it against the index scan and
    band_id partition pruning limits the scan to probed bands.

    Counts DISTINCT band ids, not rows: an at-least-once writer may
    append the same (doc_id, band_id, band_key) row twice on batch
    replay, and a row count would inflate ``n_shared_bands``.  A doc
    has exactly one key per band, so distinct-band counting is exact
    and replay-idempotent without an O(corpus) pre-dedup pass."""
    idx = spark.read.parquet(path)
    return (
        idx.join(
            F.broadcast(bands.select(
                F.col("doc_id").alias("new_doc"), "band_id", "band_key"
            )),
            ["band_id", "band_key"],
        )
        .filter(F.col("doc_id") != F.col("new_doc"))
        .groupBy("new_doc", F.col("doc_id").alias("existing_doc"))
        .agg(F.count_distinct("band_id").cast("long").alias("n_shared_bands"))
    )
