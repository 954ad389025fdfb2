"""Round-7 batch 16 — grouped jackknife influence, embedding drift
between deterministic halves, and minute-domain peak concurrency.

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
# agg_jackknife_groups — delete-one-group influence on the corpus mean
# ---------------------------------------------------------------------------


@register(
    "agg_jackknife_groups",
    oracle="""
    WITH g AS (
      SELECT source, CAST(count(*) AS BIGINT) AS ng,
             CAST(sum(n_chars) AS BIGINT) AS sg
      FROM documents WHERE n_chars IS NOT NULL GROUP BY source
    ),
    t AS (
      SELECT source, ng, sg,
             sum(ng) OVER () AS n, sum(sg) OVER () AS s
      FROM g
    )
    SELECT source, ng AS n_docs,
           CAST((1000 * sg) // ng AS BIGINT) AS mean_milli,
           CAST((1000 * (s - sg)) // (n - ng) AS BIGINT) AS loo_mean_milli,
           CAST((1000 * s) // n - (1000 * (s - sg)) // (n - ng) AS BIGINT)
             AS influence_milli
    FROM t WHERE n > ng ORDER BY source
    """,
)
def agg_jackknife_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-one-GROUP jackknife on the corpus mean document length:
    for each source, the mean the corpus would have WITHOUT it, and the
    source's influence (how much it drags the global mean) — the
    standard "which crawl source is distorting my statistics?" audit,
    and the grouped-jackknife building block for variance estimates of
    any linear statistic.

    The distributed trick worth registering: all G leave-one-out
    estimates come from ONE pass — group sums plus window totals give
    every (S−s_g)/(N−n_g) simultaneously; no G re-aggregations of the
    corpus (the naive formulation at 100 TB is G full scans).  Fully
    integer milli division; a source equal to the whole corpus emits no
    row (n > ng guard, both engines).
    """
    g = (
        T(spark, sf_dir, "documents")
        .filter(F.col("n_chars").isNotNull())
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("ng"),
            F.sum("n_chars").cast("long").alias("sg"),
        )
    )
    t = g.withColumn("n", F.sum("ng").over(Window.partitionBy())).withColumn(
        "s", F.sum("sg").over(Window.partitionBy())
    )
    return (
        t.filter(F.col("n") > F.col("ng"))
        .select(
            "source",
            F.col("ng").alias("n_docs"),
            F.expr("(1000 * sg) div ng").cast("long").alias("mean_milli"),
            F.expr("(1000 * (s - sg)) div (n - ng)")
            .cast("long")
            .alias("loo_mean_milli"),
            F.expr("(1000 * s) div n - (1000 * (s - sg)) div (n - ng)")
            .cast("long")
            .alias("influence_milli"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# embed_drift_centroids — centroid shift between deterministic halves
# ---------------------------------------------------------------------------

#: shared cosine finale over exact DECIMAL/HUGEINT per-dim sums
_DRIFT_COS_EXPR = (
    "round(CAST(sab AS DOUBLE)"
    " / nullif(sqrt(CAST(saa AS DOUBLE)) * sqrt(CAST(sbb AS DOUBLE)), 0.0), 6)"
)


@register(
    "embed_drift_centroids",
    oracle=f"""
    WITH q AS (
      SELECT vec_id % 2 AS half, u.dim AS dim,
             CAST(round(1000000 * u.x) AS BIGINT) AS xm
      FROM embeddings,
        LATERAL (SELECT unnest(CAST(embedding AS DOUBLE[])) AS x,
                        generate_subscripts(embedding, 1) AS dim) u
      WHERE embedding IS NOT NULL
    ),
    d AS (
      SELECT dim,
             CAST(sum(CASE WHEN half = 0 THEN xm ELSE 0 END) AS BIGINT) AS sa,
             CAST(sum(CASE WHEN half = 1 THEN xm ELSE 0 END) AS BIGINT) AS sb,
             CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
             CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb
      FROM q GROUP BY dim
    ),
    f AS (
      SELECT CAST(max(na) AS BIGINT) AS na, CAST(max(nb) AS BIGINT) AS nb,
             CAST(sum(((sa * nb - sb * na) // (na * nb))
                      * ((sa * nb - sb * na) // (na * nb))) AS BIGINT)
               AS l2sq_micro2,
             CAST(sum(CAST(sa AS HUGEINT) * sb) AS HUGEINT) AS sab,
             CAST(sum(CAST(sa AS HUGEINT) * sa) AS HUGEINT) AS saa,
             CAST(sum(CAST(sb AS HUGEINT) * sb) AS HUGEINT) AS sbb
      FROM d WHERE na > 0 AND nb > 0
    )
    SELECT na AS n_a, nb AS n_b, l2sq_micro2,
           {_DRIFT_COS_EXPR} AS centroid_cos_r6
    FROM f WHERE na > 0 AND nb > 0
    """,
)
def embed_drift_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space DRIFT check between two deterministic corpus
    halves (vec_id parity — in production, two time windows or model
    versions): squared L2 distance between the halves' centroids plus
    the cosine between them — the cheap is-my-embedding-space-moving
    monitor run before re-tuning ANN thresholds or re-clustering.

    Determinism: embedding values micro-quantize per ELEMENT before any
    sum (a float Σx is partial-order-dependent; integer sums are not —
    the ``embed_quantize_int8`` rule), per-dim centroid gaps are one
    integral division each, and the squared-gap/cross-product sums are
    exact BIGINT/DECIMAL/HUGEINT.  The cosine finale is one shared text
    over three exact sums.

    Scale shape: the dim explode is scan-side; ONE hash agg keyed on
    dim (64 keys — map-side combine collapses every partition to ≤64
    rows) and a single-row finale.  No joins, no corpus-sized windows.
    """
    q = (
        T(spark, sf_dir, "embeddings")
        .filter(F.col("embedding").isNotNull())
        .select(
            (F.col("vec_id") % 2).alias("half"),
            F.posexplode(F.col("embedding")).alias("dim0", "x"),
        )
        .select(
            "half",
            (F.col("dim0") + 1).alias("dim"),  # DuckDB subscripts are 1-based
            F.round(F.lit(1000000) * F.col("x").cast("double"))
            .cast("long")
            .alias("xm"),
        )
    )
    d = q.groupBy("dim").agg(
        F.sum(F.when(F.col("half") == 0, F.col("xm")).otherwise(0))
        .cast("long")
        .alias("sa"),
        F.sum(F.when(F.col("half") == 1, F.col("xm")).otherwise(0))
        .cast("long")
        .alias("sb"),
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).cast("long").alias("na"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).cast("long").alias("nb"),
    )
    sad = F.col("sa").cast("decimal(38,0)")
    sbd = F.col("sb").cast("decimal(38,0)")
    gap = F.expr("(sa * nb - sb * na) div (na * nb)")
    f = (
        d.filter((F.col("na") > 0) & (F.col("nb") > 0))
        .agg(
            F.max("na").cast("long").alias("na"),
            F.max("nb").cast("long").alias("nb"),
            F.sum(gap * gap).cast("long").alias("l2sq_micro2"),
            F.sum(sad * sbd).alias("sab"),
            F.sum(sad * sad).alias("saa"),
            F.sum(sbd * sbd).alias("sbb"),
        )
    )
    return f.filter((F.col("na") > 0) & (F.col("nb") > 0)).select(
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        "l2sq_micro2",
        F.expr(_DRIFT_COS_EXPR).alias("centroid_cos_r6"),
    )


# ---------------------------------------------------------------------------
# events_peak_concurrency — sweep-line maximum over a minute domain
# ---------------------------------------------------------------------------

_SESSION_MIN = 5  # each event opens a 5-minute presence interval


@register(
    "events_peak_concurrency",
    oracle=f"""
    WITH e AS (
      SELECT event_type, epoch_ns(ts) // 60000000000 AS m FROM events
    ),
    deltas AS (
      SELECT event_type, m, CAST(sum(d) AS BIGINT) AS delta
      FROM (
        SELECT event_type, m, 1 AS d FROM e
        UNION ALL
        SELECT event_type, m + {_SESSION_MIN}, -1 FROM e
      ) GROUP BY event_type, m
    ),
    run AS (
      SELECT event_type, m,
             sum(delta) OVER (PARTITION BY event_type ORDER BY m
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
      FROM deltas
    ),
    pk AS (
      SELECT event_type, max(conc) AS peak FROM run GROUP BY event_type
    )
    SELECT r.event_type,
           CAST(p.peak AS BIGINT) AS peak_concurrency,
           CAST(min(r.m) AS BIGINT) AS first_peak_minute
    FROM run r JOIN pk p
      ON r.event_type IS NOT DISTINCT FROM p.event_type AND r.conc = p.peak
    GROUP BY r.event_type, p.peak ORDER BY r.event_type
    """,
)
def events_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency per event type via a sweep line: every event
    opens a {mins}-minute presence interval; +1/−1 deltas at interval
    boundaries, a running sum over the MINUTE DOMAIN, and the maximum is
    the peak simultaneous presence (with the first minute it occurs) —
    the capacity-planning twin of ``events_hourly_profile`` (profile
    shows the average shape, this the worst case).

    The scale trick is the delta DOMAIN: boundaries collapse to minute
    keys first (map-side combine), so the prefix-sum window runs over
    |distinct minutes| rows per type — the time-domain analogue of
    ``agg_ks_test``'s value-domain contract — never a corpus-sized
    single-partition sort.  Pure integer counts.

    Scale shape: one scan → boundary union (scan-side) → minute-keyed
    agg → domain window → per-type max + argmin join on the domain
    table.  At 100 TB the only corpus-sized stage is the first agg.
    """
    e = T(spark, sf_dir, "events").select(
        "event_type", F.expr("ts_ns div 60000000000").alias("m")
    )
    deltas = (
        e.select("event_type", "m", F.lit(1).alias("d"))
        .unionAll(
            e.select(
                "event_type", (F.col("m") + _SESSION_MIN).alias("m"),
                F.lit(-1).alias("d"),
            )
        )
        .groupBy("event_type", "m")
        .agg(F.sum("d").cast("long").alias("delta"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("m")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    run = deltas.select(
        "event_type", "m", F.sum("delta").over(w).alias("conc")
    )
    pk = run.groupBy("event_type").agg(F.max("conc").alias("peak"))
    r, p = run.alias("r"), pk.alias("p")
    return (
        r.join(
            p,
            F.col("r.event_type").eqNullSafe(F.col("p.event_type"))
            & (F.col("r.conc") == F.col("p.peak")),
        )
        .groupBy(F.col("r.event_type").alias("event_type"), F.col("p.peak"))
        .agg(F.min("r.m").cast("long").alias("first_peak_minute"))
        .select(
            "event_type",
            F.col("peak").cast("long").alias("peak_concurrency"),
            "first_peak_minute",
        )
        .orderBy("event_type")
    )


events_peak_concurrency.__doc__ = events_peak_concurrency.__doc__.format(
    mins=_SESSION_MIN
)
