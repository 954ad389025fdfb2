"""Round-5 batch 10: portable higher moments and time-constrained
funnels.

`agg_moments_skew_kurt` extends the exact-integer-moments discipline
(`agg_stats_corr`, `feat_standardize`) to the 3rd and 4th moments:
skewness/kurtosis built-ins differ across engines (sample vs population
corrections), so both sides compute the SAME formula from identical
exact-bigint power sums — portable by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_syncer_spark.queries.relational import T
from cassandra_syncer_spark.registry import register

# ---------------------------------------------------------------------------
# agg_moments_skew_kurt — exact-integer power sums -> portable g1/g2
# ---------------------------------------------------------------------------

# deci-unit staging bounds the 4th power sum: |x| <= ~1e3 (value in
# [0,100] -> deci <= 1000), x^4 <= 1e12, so ~1e6 rows/group stay well
# inside bigint.  For wider domains at scale, stage per-group partial
# sums in DECIMAL(38) or split the sum into hi/lo longs.


@register(
    "agg_moments_skew_kurt",
    oracle="""
    WITH s AS (
      SELECT event_type, CAST(round(value * 10.0) AS BIGINT) AS x FROM events
    ),
    m AS (
      SELECT event_type, count(*) AS n,
             CAST(sum(x) AS BIGINT) AS s1,
             CAST(sum(x * x) AS BIGINT) AS s2,
             CAST(sum(x * x * x) AS BIGINT) AS s3,
             CAST(sum(x * x * x * x) AS BIGINT) AS s4
      FROM s GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n,
           round((CAST(s2 AS DOUBLE) / n) - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n), 6) AS var_pop,
           round(((CAST(s3 AS DOUBLE) / n)
                  - 3 * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n)
                  + 2 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
                 / nullif(pow((CAST(s2 AS DOUBLE) / n) - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n), 1.5), 0.0), 6)
             AS skew_g1,
           round(((CAST(s4 AS DOUBLE) / n)
                  - 4 * (CAST(s1 AS DOUBLE) / n) * (CAST(s3 AS DOUBLE) / n)
                  + 6 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n)
                  - 3 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
                 / nullif(pow((CAST(s2 AS DOUBLE) / n) - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n), 2), 0.0) - 3, 6)
             AS kurt_excess
    FROM m ORDER BY event_type
    """,
)
def agg_moments_skew_kurt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population skewness (g1) and excess kurtosis (g2) per event type —
    the distribution-shape profile behind drift monitoring and outlier
    policy.  Built-in `skewness`/`kurtosis` differ cross-engine (sample
    corrections, accumulation order), so BOTH engines derive the moments
    from exact bigint power sums over deci-unit integers (order-free),
    then evaluate the identical double formula — the rounded outputs
    hash-match with no float-summation waiver.

    Scale shape: one hash agg with map-side combine carrying four power
    sums (the mergeable-moments pattern of `agg_partial_merge`), then
    per-group scalar arithmetic.  Domain bound documented above; wider
    domains stage partials in DECIMAL(38) or hi/lo long pairs.
    """
    s = T(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 10.0).cast("long").alias("x")
    )
    m = s.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s1"),
        F.sum(F.expr("x * x")).alias("s2"),
        F.sum(F.expr("x * x * x")).alias("s3"),
        F.sum(F.expr("x * x * x * x")).alias("s4"),
    )
    m1 = "(CAST(s1 AS DOUBLE) / n)"
    m2 = "(CAST(s2 AS DOUBLE) / n)"
    m3 = "(CAST(s3 AS DOUBLE) / n)"
    m4 = "(CAST(s4 AS DOUBLE) / n)"
    var = f"({m2} - {m1} * {m1})"
    return m.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.expr(f"round({var}, 6)").alias("var_pop"),
        F.expr(
            f"round(({m3} - 3 * {m1} * {m2} + 2 * {m1} * {m1} * {m1})"
            f" / nullif(pow({var}, 1.5), 0.0), 6)"
        ).alias("skew_g1"),
        F.expr(
            f"round(({m4} - 4 * {m1} * {m3} + 6 * {m1} * {m1} * {m2}"
            f" - 3 * {m1} * {m1} * {m1} * {m1})"
            f" / nullif(pow({var}, 2), 0.0) - 3, 6)"
        ).alias("kurt_excess"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# events_funnel_windowed — time-constrained multi-step funnel
# ---------------------------------------------------------------------------

_STEP_GAP_SEC = 86_400  # each next step within 24h of the previous


@register(
    "events_funnel_windowed",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_type, epoch_ns(ts) // 1000000000 AS sec FROM events
    ),
    v AS (SELECT user_id, min(sec) AS t1 FROM e WHERE event_type = 'view'
          GROUP BY user_id),
    c AS (
      SELECT v.user_id, v.t1, min(e.sec) AS t2
      FROM v JOIN e ON e.user_id = v.user_id AND e.event_type = 'click'
       AND e.sec > v.t1 AND e.sec <= v.t1 + {_STEP_GAP_SEC}
      GROUP BY v.user_id, v.t1
    ),
    p AS (
      SELECT c.user_id, c.t2, min(e.sec) AS t3
      FROM c JOIN e ON e.user_id = c.user_id AND e.event_type = 'purchase'
       AND e.sec > c.t2 AND e.sec <= c.t2 + {_STEP_GAP_SEC}
      GROUP BY c.user_id, c.t2
    )
    SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS n_step1,
           CAST((SELECT count(*) FROM c) AS BIGINT) AS n_step2,
           CAST((SELECT count(*) FROM p) AS BIGINT) AS n_step3,
           CASE WHEN (SELECT count(*) FROM v) = 0 THEN 0
                ELSE (1000000 * (SELECT count(*) FROM p))
                     // (SELECT count(*) FROM v) END AS conv_micro
    """,
)
def events_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-constrained funnel: first view → earliest click within 24h →
    earliest purchase within 24h of that click, per user — the funnel
    variant product analytics actually runs (`events_funnel` counts
    ordered steps with NO time bound, which overstates conversion on
    long-lived users).

    Scale shape: each step is a per-user MIN aggregation over a
    time-bounded candidate join — all three joins are equi on user_id
    (the range condition rides inside the join), so the whole funnel is
    user_id-partitioned work with no theta explosion; step frames only
    shrink.  Conversion is exact integer micro-units.
    """
    from cassandra_syncer_spark.queries.windows import events_with_sec

    e = events_with_sec(spark, sf_dir).select("user_id", "event_type", "ts_sec")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts_sec").alias("t1"))
    )
    c = (
        v.join(
            e.filter(F.col("event_type") == "click").select("user_id", "ts_sec"),
            "user_id",
        )
        .filter(
            (F.col("ts_sec") > F.col("t1"))
            & (F.col("ts_sec") <= F.col("t1") + _STEP_GAP_SEC)
        )
        .groupBy("user_id", "t1")
        .agg(F.min("ts_sec").alias("t2"))
    )
    p = (
        c.join(
            e.filter(F.col("event_type") == "purchase").select("user_id", "ts_sec"),
            "user_id",
        )
        .filter(
            (F.col("ts_sec") > F.col("t2"))
            & (F.col("ts_sec") <= F.col("t2") + _STEP_GAP_SEC)
        )
        .groupBy("user_id", "t2")
        .agg(F.min("ts_sec").alias("t3"))
    )
    n1 = v.agg(F.count(F.lit(1)).cast("long").alias("n_step1"))
    n2 = c.agg(F.count(F.lit(1)).cast("long").alias("n_step2"))
    n3 = p.agg(F.count(F.lit(1)).cast("long").alias("n_step3"))
    return (
        n1.crossJoin(n2)
        .crossJoin(n3)
        .select(
            "n_step1",
            "n_step2",
            "n_step3",
            F.expr(
                "IF(n_step1 = 0, 0L, (1000000 * n_step3) div n_step1)"
            ).alias("conv_micro"),
        )
    )
