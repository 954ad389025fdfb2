"""Round-6 additions: the chained near-dup verify pipeline and the
sketch-path segment-position query — the two registered forms the round-5
audit called for (VERDICT.md items 4 and 5).

Reference parity note: the reference's dedup layer is exact etag equality
(core.js:403-417, manifest diff); the staged verify pipeline and the
histogram position sketch are part of the 100 TB extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cassandra_syncer_spark.queries.relational import T
from cassandra_syncer_spark.registry import register

# ---------------------------------------------------------------------------
# dedup_verify_pipeline — banded candidates → Jaccard screen → edit verify
# ---------------------------------------------------------------------------

_EDIT_PREFIX = 400
_EDIT_MAX = 100
_JACC_MIN = 0.5


def _pipeline_sql() -> str:
    from cassandra_syncer_spark.queries.llm_dedup import _band_union, _minhash_cte

    jacc = (
        "round(CAST(len(list_intersect(da.uw, db.uw)) AS DOUBLE)"
        " / len(list_distinct(list_concat(da.uw, db.uw))), 4)"
    )
    return f"""
    {_minhash_cte(True)},
    bands AS ({_band_union(True)}),
    cand AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_id = b.band_id AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    d AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS uw FROM documents),
    jac AS (
      SELECT c.doc_a, c.doc_b, {jacc} AS jaccard
      FROM cand c
      JOIN d da ON c.doc_a = da.doc_id
      JOIN d db ON c.doc_b = db.doc_id
      WHERE {jacc} >= {_JACC_MIN}
    ),
    p AS (SELECT doc_id, substr(text, 1, {_EDIT_PREFIX}) AS pre FROM documents)
    SELECT j.doc_a, j.doc_b, j.jaccard,
           CAST(levenshtein(pa.pre, pb.pre) AS BIGINT) AS edit_dist,
           (1000000 * (greatest(len(pa.pre), len(pb.pre))
                       - levenshtein(pa.pre, pb.pre)))
             // greatest(len(pa.pre), len(pb.pre)) AS edit_sim_micro
    FROM jac j
    JOIN p pa ON j.doc_a = pa.doc_id
    JOIN p pb ON j.doc_b = pb.doc_id
    WHERE levenshtein(pa.pre, pb.pre) <= {_EDIT_MAX}
    ORDER BY doc_a, doc_b
    """


@register("dedup_verify_pipeline", oracle=_pipeline_sql())
def dedup_verify_pipeline(
    spark: SparkSession, sf_dir: str, jacc_min: float = _JACC_MIN
) -> DataFrame:
    """The PRODUCTION near-dup verify chain, registered end to end:
    MinHash band candidates → exact word-set Jaccard screen (≥ 0.5) →
    edit-distance verify on the JACCARD SURVIVORS ONLY.  Round 5 asserted
    in prose that edit-verify must run last so its O(n·k) DP cost is
    bounded by the survivor count, not the candidate count
    (``dedup_verify_edit`` alone measured 17.9× at the 10× dup-heavy
    replica because every band candidate hit the DP); this query makes
    that ordering a driver-checked artifact.

    Scale shape: candidates are bucket-local (banding math bounds the
    volume, never corpus²); the Jaccard screen is two doc_id hash joins
    + an array intersect per candidate (cheap set algebra, no DP); only
    pairs passing the 0.5 cut reach the edit stage, which keeps the
    double screen from ``dedup_verify_edit`` (exact-equality
    short-circuit, then banded ``levenshtein(a, b, k)``).

    Survivor-boundedness is MEASURED, not asserted (SCALING.md round-6
    threshold sweep on the controlled 10× replica, 20,116 candidates
    fixed): total time 1.8 s when the screen passes nothing → 12.4 s
    when it passes 17,786 — the DP term tracks the survivor count
    linearly while the candidate front end stays constant.  Corollary,
    stated honestly: on a corpus whose band candidates are almost all
    GENUINE near-dups (the controlled replica passes 88% — by
    construction), no screen ordering can dodge the inherent per-pair DP;
    the chain's win is on real crawls where banding false positives and
    sub-threshold pairs dominate, and those die in set algebra before
    touching the DP.
    """
    from cassandra_syncer_spark.queries.llm_dedup import _minhash_pairs

    cand = _minhash_pairs(spark, sf_dir).select("doc_a", "doc_b")
    docs = T(spark, sf_dir, "documents").select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("uw")
    )
    da, db = docs.alias("da"), docs.alias("db")
    inter = F.size(F.array_intersect(F.col("da.uw"), F.col("db.uw")))
    union = F.size(F.array_union(F.col("da.uw"), F.col("db.uw")))
    survivors = (
        cand.join(da, cand.doc_a == F.col("da.doc_id"))
        .join(db, cand.doc_b == F.col("db.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            F.round(inter.cast("double") / union, 4).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= jacc_min)
    )
    pre = T(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, _EDIT_PREFIX).alias("pre")
    )
    pa, pb = pre.alias("pa"), pre.alias("pb")
    return (
        survivors.join(pa, survivors.doc_a == F.col("pa.doc_id"))
        .join(pb, survivors.doc_b == F.col("pb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            "jaccard",
            F.expr(
                f"IF(pa.pre = pb.pre, 0L,"
                f" CAST(levenshtein(pa.pre, pb.pre, {_EDIT_MAX}) AS BIGINT))"
            ).alias("edit_dist"),
            F.greatest(F.length("pa.pre"), F.length("pb.pre")).alias("mx"),
        )
        .filter((F.col("edit_dist") >= 0) & (F.col("edit_dist") <= _EDIT_MAX))
        .select(
            "doc_a",
            "doc_b",
            "jaccard",
            "edit_dist",
            F.expr("(1000000 * (mx - edit_dist)) div mx").alias("edit_sim_micro"),
        )
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# win_cume_dist_approx — histogram-sketch segment position (no segment sort)
# ---------------------------------------------------------------------------

_CD_BINS = 1024


@register(
    "win_cume_dist_approx",
    oracle=f"""
    WITH v AS (
      SELECT c_custkey, c_mktsegment,
             CAST(round(c_acctbal * 100.0) AS BIGINT) AS acct_centi
      FROM customer
    ),
    s AS (
      SELECT c_mktsegment, min(acct_centi) AS lo, max(acct_centi) AS hi,
             CAST(count(*) AS BIGINT) AS n
      FROM v GROUP BY c_mktsegment
    ),
    b AS (
      SELECT v.c_custkey, v.c_mktsegment, v.acct_centi,
             ((v.acct_centi - s.lo) * {_CD_BINS}) // (s.hi - s.lo + 1) AS bkt
      FROM v JOIN s ON v.c_mktsegment = s.c_mktsegment
    ),
    h AS (SELECT c_mktsegment, bkt, CAST(count(*) AS BIGINT) AS c
          FROM b GROUP BY 1, 2),
    cum AS (
      SELECT c_mktsegment, bkt,
             sum(c) OVER (PARTITION BY c_mktsegment ORDER BY bkt) AS cum
      FROM h
    )
    SELECT b.c_custkey, b.c_mktsegment, b.acct_centi,
           CAST((1000000 * cum.cum) // s.n AS BIGINT) AS cd_est_micro
    FROM b
    JOIN cum ON b.c_mktsegment = cum.c_mktsegment AND b.bkt = cum.bkt
    JOIN s ON b.c_mktsegment = s.c_mktsegment
    ORDER BY c_custkey
    """,
)
def win_cume_dist_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB form of ``win_cume_dist``: each customer's position
    fraction within its market segment from a 1024-bin equal-width
    HISTOGRAM of centi-integerized balances instead of an exact
    per-segment sort.  ``win_cume_dist``'s exact window serializes every
    segment onto one task (parallelism capped at |segments|, measured
    2.5× at the 10× replica); here no row-level sort exists anywhere —
    the only window runs over the ≤1024-counter histogram frame.

    cd_est = (rows in bins ≤ own bin) / n, in exact integer micro-units —
    a pure function of the data (same device as ``agg_percentile_hist``),
    so both engines produce the identical estimate and the sketch
    hash-checks.  Error ≤ one bin's occupancy; the exact form remains
    registered for validation scale.

    Scale shape: pass 1 per-segment (lo, hi, n); pass 2 folds rows into
    ≤1024 counters per segment (map-side combine); the cumulative window
    runs over counters, never rows; rows join their bin's cumulative
    count back via broadcast.  Plan-asserted: the Window's input is the
    aggregated histogram, not the row stream
    (tests/test_plans.py::test_cume_dist_approx_windows_bins_not_rows).
    """
    cust = T(spark, sf_dir, "customer")
    v = cust.select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.col("c_acctbal") * 100.0).cast("long").alias("acct_centi"),
    )
    s = v.groupBy("c_mktsegment").agg(
        F.min("acct_centi").alias("lo"),
        F.max("acct_centi").alias("hi"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    b = v.join(F.broadcast(s), "c_mktsegment").select(
        "c_custkey",
        "c_mktsegment",
        "acct_centi",
        F.expr(f"((acct_centi - lo) * {_CD_BINS}) div (hi - lo + 1)").alias("bkt"),
    )
    h = b.groupBy("c_mktsegment", "bkt").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    cum = h.withColumn(
        "cum",
        F.sum("c").over(
            Window.partitionBy("c_mktsegment")
            .orderBy("bkt")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    ).select("c_mktsegment", "bkt", "cum")
    return (
        b.join(F.broadcast(cum), ["c_mktsegment", "bkt"])
        .join(F.broadcast(s.select("c_mktsegment", "n")), "c_mktsegment")
        .select(
            "c_custkey",
            "c_mktsegment",
            "acct_centi",
            F.expr("(1000000 * cum) div n").cast("long").alias("cd_est_micro"),
        )
        .orderBy("c_custkey")
    )
