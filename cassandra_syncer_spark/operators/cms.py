"""Count-min sketch expression builders + dataflow helpers.

Shared by the batch query (``queries/analytics_r5b.py::agg_countmin_freq``)
and the streaming maintenance loop (``streaming/sketches.py``) so both
build the IDENTICAL sketch: one portable md5-derived ``hash32`` per key
(fingerprint.py — the only integer hash both Spark and DuckDB reproduce),
expanded to the ``CMS_D`` depth rows by the same universal-hash family
MinHash uses (exact 64-bit integer math, one md5 per row, not one per
depth).

The sketch is a fixed d×w counter table — the mergeable partial for
frequency queries at 100 TB: shard or microbatch sketches merge by
cell-wise SUM (associative + commutative, so merge order never matters),
and any key's frequency estimate is ``min_j cells[j][h_j(key)]`` — four
counter lookups, no rescan.  CMS guarantee: est ≥ exact always; overcount
is collision mass ≈ e/w of the total count per depth row, min over d rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cassandra_syncer_spark.operators import fingerprint as fp

#: sketch geometry: depth 4 (independent hash rows) × width 8192 buckets —
#: 32k counters total
CMS_D = 4
CMS_W = 8192


def bucket_expr(*, duck: bool) -> str:
    """Bucket for depth ``j`` from a base-hash column ``h``."""
    a = ", ".join(str(x) for x in fp.PERM_A[:CMS_D])
    b = ", ".join(str(x) for x in fp.PERM_B[:CMS_D])
    if duck:
        return f"([{a}][j + 1] * h + [{b}][j + 1]) % {fp.PERM_P} % {CMS_W}"
    return (
        f"(element_at(array({a}), j + 1) * h + element_at(array({b}), j + 1)) "
        f"% {fp.PERM_P} % {CMS_W}"
    )


def keyed(df: DataFrame, key_col: str) -> DataFrame:
    """Project (k, h): the stringified key and its base hash32."""
    return df.select(F.col(key_col).cast("string").alias("k")).withColumn(
        "h", F.expr(fp.hash32("k", duck=False))
    )


def cells(df: DataFrame, key_col: str) -> DataFrame:
    """Fold a DataFrame into sketch cells (j, b, c) — one scan, map-side
    combine, ≤ d×w output rows regardless of input size."""
    return (
        keyed(df, key_col)
        .select("h", F.explode(F.expr(f"sequence(0, {CMS_D - 1})")).alias("j"))
        .select("j", F.expr(bucket_expr(duck=False)).alias("b"))
        .groupBy("j", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )


def cells_from_counts(counts: DataFrame) -> DataFrame:
    """Fold a PRE-AGGREGATED (h, cnt) key-count table into sketch cells.

    Identical cells to :func:`cells` over the underlying rows: the bucket
    is a pure function of the key's base hash, so a cell's row count is
    the sum of its keys' counts.  Lets batch queries that already compute
    per-key exact counts pay ONE md5 per distinct key instead of one per
    corpus row (round 11; the streaming microbatch fold keeps the
    row-level :func:`cells`).
    """
    return (
        counts.select("h", "cnt", F.explode(F.expr(f"sequence(0, {CMS_D - 1})")).alias("j"))
        .select("j", F.expr(bucket_expr(duck=False)).alias("b"), "cnt")
        .groupBy("j", "b")
        .agg(F.sum("cnt").cast("long").alias("c"))
    )


def merge_cells(parts: DataFrame) -> DataFrame:
    """Merge partial sketches (any union of cells frames) by cell-wise sum."""
    return parts.groupBy("j", "b").agg(F.sum("c").cast("long").alias("c"))


def estimate(cells_df: DataFrame, keys: DataFrame, key_col: str) -> DataFrame:
    """Frequency estimate per key: min over the d depth rows of the key's
    bucket counters.  ``keys`` is probe-sized → broadcast; missing buckets
    count as 0 (a key the sketch never saw estimates 0)."""
    probe = (
        keyed(keys, key_col)
        .select("k", "h", F.explode(F.expr(f"sequence(0, {CMS_D - 1})")).alias("j"))
        .select("k", "j", F.expr(bucket_expr(duck=False)).alias("b"))
    )
    return (
        cells_df.join(F.broadcast(probe), ["j", "b"], "right")
        .groupBy("k")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).cast("long").alias("est_n"))
        .select(F.col("k").alias(key_col), "est_n")
    )
