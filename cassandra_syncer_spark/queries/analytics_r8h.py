"""Round-8 batch 8 — seasonally-adjusted anomaly detection and KL
divergence to a target mixture.

Reference parity note: analytics extensions beyond the reference's sync
surface (rax-maas/cassandra-syncer holds only backup/restore plumbing,
bin/cassandra-syncer:1-); integer/micro-unit exact formulas on both
engines per the registry contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cassandra_syncer_spark.queries.relational import T
from cassandra_syncer_spark.registry import register

# ---------------------------------------------------------------------------
# events_anomaly_seasonal_adjusted — MAD anomalies on the decomposed residual
# ---------------------------------------------------------------------------


@register(
    "events_anomaly_seasonal_adjusted",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(sum(CAST(round(100 * value) AS BIGINT)) AS BIGINT) AS y
      FROM events WHERE value IS NOT NULL GROUP BY 1
    ),
    tr AS (
      SELECT d, y,
             date_diff('day', DATE '1970-01-01', d) % 7 AS dow,
             CASE WHEN count(*) OVER w = 7
                  THEN sum(y) OVER w // 7 END AS trend
      FROM daily
      WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    det AS (SELECT d, dow, y - trend AS detr FROM tr WHERE trend IS NOT NULL),
    seas AS (
      SELECT dow, CAST(sum(detr) // count(*) AS BIGINT) AS s
      FROM det GROUP BY dow
    ),
    resid AS (
      SELECT det.d, det.detr - seas.s AS r
      FROM det JOIN seas ON det.dow = seas.dow
    ),
    m AS (
      SELECT CAST(round(2 * quantile_cont(abs(r), 0.5)) AS BIGINT) AS mad_x2
      FROM resid
    )
    SELECT CAST(count(*) AS BIGINT) AS n_days_scored,
           CAST(max(m.mad_x2) AS BIGINT) AS mad_x2_centi,
           CAST(sum(CASE WHEN 2 * abs(r) > 3 * m.mad_x2 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_anomalies,
           CAST(max(abs(r)) AS BIGINT) AS max_abs_resid_centi
    FROM resid, m
    """,
)
def events_anomaly_seasonal_adjusted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEASONALLY-ADJUSTED anomaly detection — the composition the
    decomposition exists for: `events_anomaly_mad` on the RAW series
    flags every Monday as an anomaly when weekends dip; running the
    3-MAD rule on `events_seasonal_decompose`'s residual (y − trend −
    weekday factor) scores only genuine departures from the weekly
    rhythm.  The standard production anomaly pipeline (STL-residual
    thresholding), end to end as one query.

    Determinism: the decomposition reuses the exact integer/truncating
    spellings of `events_seasonal_decompose`; the MAD is a DOUBLED
    median (type-7 interpolation on integers stays on the half grid, so
    2·MAD is integer) and the threshold comparison `2|r| > 3·MAD₂`
    stays in pure integers.

    Scale shape: corpus → day domain in one agg; trend window, weekday
    join (7-row broadcast), residual MAD and the flag count all run on
    |days| rows.  One-row output.
    """
    daily = (
        T(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy(F.col("ts").cast("date").alias("d"))
        .agg(
            F.sum(F.round(F.lit(100) * F.col("value")).cast("long")).alias("y")
        )
    )
    w = Window.orderBy("d").rowsBetween(-3, 3)
    tr = daily.select(
        "d",
        "y",
        F.expr("CAST(datediff(d, DATE '1970-01-01') % 7 AS BIGINT)").alias("dow"),
        F.when(F.count(F.lit(1)).over(w) == 7, F.sum("y").over(w)).alias("sum7"),
    ).withColumn("trend", F.expr("sum7 div 7"))
    det = tr.filter(F.col("trend").isNotNull()).select(
        "d", "dow", (F.col("y") - F.col("trend")).alias("detr")
    )
    seas = det.groupBy("dow").agg(
        F.expr("CAST(sum(detr) div count(*) AS BIGINT)").alias("s")
    )
    resid = det.join(F.broadcast(seas), "dow").select(
        "d", (F.col("detr") - F.col("s")).alias("r")
    )
    m = resid.agg(
        F.expr("CAST(round(2 * percentile(abs(r), 0.5)) AS BIGINT)").alias(
            "mad_x2"
        )
    )
    return (
        resid.crossJoin(F.broadcast(m))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days_scored"),
            F.max("mad_x2").cast("long").alias("mad_x2_centi"),
            F.sum(
                F.when(2 * F.abs(F.col("r")) > 3 * F.col("mad_x2"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_anomalies"),
            F.max(F.abs(F.col("r"))).cast("long").alias("max_abs_resid_centi"),
        )
    )


# ---------------------------------------------------------------------------
# mix_kl_divergence_target — distance of the corpus mix from a target mix
# ---------------------------------------------------------------------------

#: target source-share in MICRO units (a uniform 20-source target for the
#: fixture's source space; production passes its trained-mix literals).
#: Literals are data — both engines read the same broadcast table.
_KL_TARGET_MICRO = 50000  # 1/20 of 1e6

_KL_TERM = (
    "CAST(round(1000000 * (CAST(p_micro AS DOUBLE) / 1000000.0)"
    " * ln((CAST(p_micro AS DOUBLE) / 1000000.0)"
    f"      / ({_KL_TARGET_MICRO} / 1000000.0))) AS BIGINT)"
)


@register(
    "mix_kl_divergence_target",
    oracle=f"""
    WITH c AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n FROM documents
      GROUP BY source
    ),
    p AS (
      SELECT source, n,
             (1000000 * n) // sum(n) OVER () AS p_micro
      FROM c
    ),
    t AS (
      SELECT source, n, p_micro, {_KL_TERM} AS kl_term_micro
      FROM p WHERE p_micro > 0
    )
    SELECT CAST(count(*) AS BIGINT) AS n_sources,
           CAST(sum(n) AS BIGINT) AS n_docs,
           CAST(sum(kl_term_micro) AS BIGINT) AS kl_micro,
           CAST(max(abs(p_micro - {_KL_TARGET_MICRO})) AS BIGINT)
             AS max_share_gap_micro
    FROM t
    HAVING count(*) > 0
    """,
)
def mix_kl_divergence_target(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KL DIVERGENCE of the corpus source mix from a TARGET mix — the
    one-number drift monitor for mixture tuning (`mix_sample_weighted` /
    `mix_budget_waterfill` set the mix; this watches it): KL(P‖T) =
    Σ p·ln(p/t) in micro-nats against a uniform 20-source target
    (production swaps the literal for its trained-mix table), plus the
    worst single-source share gap.  KL → 0 means on-target; a spike
    names its cause via max_share_gap.

    Determinism: shares quantize to exact integer micro FIRST, each KL
    term is one ln over the quantized ratio micro-rounded PER SOURCE
    ROW (the `events_entropy_profile` discipline), so the sum is an
    order-free integer add.  Zero-share sources drop on both engines
    (identical p_micro > 0 cut).

    Scale shape: one corpus scan → |sources| count agg (map-side
    combined) → dimension-sized window + one-row finale.  No joins.
    """
    c = T(spark, sf_dir, "documents").groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    wall = Window.partitionBy()
    p = c.withColumn("tot", F.sum("n").over(wall)).select(
        "source", "n", F.expr("(1000000 * n) div tot").alias("p_micro")
    )
    t = p.filter(F.col("p_micro") > 0).select(
        "source", "n", "p_micro", F.expr(_KL_TERM).alias("kl_term_micro")
    )
    return (
        t.agg(
            F.count(F.lit(1)).cast("long").alias("n_sources"),
            F.sum("n").cast("long").alias("n_docs"),
            F.sum("kl_term_micro").cast("long").alias("kl_micro"),
            F.max(F.abs(F.col("p_micro") - _KL_TARGET_MICRO))
            .cast("long")
            .alias("max_share_gap_micro"),
        )
        .filter(F.col("n_sources") > 0)
    )
