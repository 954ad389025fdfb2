"""Round-7 batch 14 — stream-static enrichment join, Welch's t-test,
bounded-file-size sink, and degree assortativity.

Reference parity note: analytics extensions beyond the reference's sync
surface (rax-maas/cassandra-syncer holds only backup/restore plumbing,
bin/cassandra-syncer:1-); integer/micro-unit exact formulas on both
engines per the registry contract.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_syncer_spark.queries.analytics_r3 import _scratch
from cassandra_syncer_spark.queries.relational import T
from cassandra_syncer_spark.registry import register

# ---------------------------------------------------------------------------
# stream_static_enrich — stateless stream-static broadcast enrichment
# ---------------------------------------------------------------------------


@register(
    "stream_static_enrich",
    oracle="""
    SELECT c.c_nationkey AS nationkey,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(round(1000000 * e.value) AS BIGINT)) AS BIGINT)
             AS value_micro
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    WHERE e.value IS NOT NULL
    GROUP BY 1 ORDER BY 1
    """,
)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STATIC ENRICHMENT driven end to end: the event stream
    (file source) joins the static customer dimension inside the
    streaming query — the standard "attach account metadata to a live
    clickstream" pattern.  The join is STATELESS (no watermark, no state
    store: the static side is just re-broadcast per micro-batch, and the
    dim can even be swapped between batches), which is exactly what
    separates it from the stateful stream-stream join — together they
    close both §2.9 join rows as CHECKED queries.

    The drained append output aggregates per nation and value-checks
    against the batch join oracle — equality certifies no event was
    dropped or duplicated through the stream path and the enrichment
    matched the batch semantics row for row.

    Scale shape: per micro-batch cost = batch-side broadcast hash join
    (dim ≪ stream); no state accumulates across batches.  At 100 TB of
    stream history this stays O(batch), the whole point of stateless
    enrichment.
    """
    stage = os.path.join(tempfile.gettempdir(), f"css_enrich_stage_{os.getpid()}")
    ckpt = os.path.join(tempfile.gettempdir(), f"css_enrich_ckpt_{os.getpid()}")
    for d in (stage, ckpt):
        shutil.rmtree(d, ignore_errors=True)

    (
        T(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_id",
            "user_id",
            F.round(F.lit(1000000) * F.col("value")).cast("long").alias("value_micro"),
        )
        .repartition(2)
        .write.mode("overwrite")
        .json(stage)
    )
    dim = T(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_nationkey"
    )
    stream = (
        spark.readStream.format("json")
        .schema("event_id long, user_id long, value_micro long")
        .load(stage)
    )
    enriched = stream.join(F.broadcast(dim), "user_id")  # inner: dim-less users drop
    name = f"css_stream_enrich_{os.getpid()}"
    q = (
        enriched.select("event_id", "c_nationkey", "value_micro")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table(name)
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("value_micro").cast("long").alias("value_micro"),
        )
        .orderBy("nationkey")
    )


# ---------------------------------------------------------------------------
# events_welch_ttest — unequal-variance two-sample t statistic
# ---------------------------------------------------------------------------

#: ONE shared formula text evaluated on the single summary row by both
#: engines (events_ctr_wilson rule): identical IEEE op sequence over
#: exact integer sums → identical rounded doubles.
_WELCH_EXPR = (
    "round((CAST(syb AS DOUBLE) / CAST(nb AS DOUBLE)"
    " - CAST(sya AS DOUBLE) / CAST(na AS DOUBLE))"
    " / sqrt("
    "   (CAST(qa AS DOUBLE) - CAST(sya AS DOUBLE) * CAST(sya AS DOUBLE)"
    "      / CAST(na AS DOUBLE)) / (CAST(na AS DOUBLE) - 1.0) / CAST(na AS DOUBLE)"
    " + (CAST(qb AS DOUBLE) - CAST(syb AS DOUBLE) * CAST(syb AS DOUBLE)"
    "      / CAST(nb AS DOUBLE)) / (CAST(nb AS DOUBLE) - 1.0) / CAST(nb AS DOUBLE)"
    " ), 6)"
)
# NOTE: t is dimensionless — the centi quantization cancels between the
# mean difference and the standard error, so no /100 rescale here (only
# the displayed means rescale).


@register(
    "events_welch_ttest",
    oracle=f"""
    WITH u AS (
      SELECT user_id,
             CAST((CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)
                        AS BIGINT)) % 2 AS BIGINT) AS arm,
             CAST(sum(CAST(round(100 * value) AS BIGINT)) AS BIGINT) AS y
      FROM events WHERE value IS NOT NULL GROUP BY user_id
    ),
    s AS (
      SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
             CAST(sum(CASE WHEN arm = 0 THEN y ELSE 0 END) AS BIGINT) AS sya,
             CAST(sum(CASE WHEN arm = 0 THEN CAST(y AS HUGEINT) * y ELSE 0 END)
                  AS HUGEINT) AS qa,
             CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb,
             CAST(sum(CASE WHEN arm = 1 THEN y ELSE 0 END) AS BIGINT) AS syb,
             CAST(sum(CASE WHEN arm = 1 THEN CAST(y AS HUGEINT) * y ELSE 0 END)
                  AS HUGEINT) AS qb
      FROM u
    )
    SELECT na AS n_a, nb AS n_b,
           round(CAST(sya AS DOUBLE) / CAST(na AS DOUBLE) / 100.0, 6) AS mean_a_r6,
           round(CAST(syb AS DOUBLE) / CAST(nb AS DOUBLE) / 100.0, 6) AS mean_b_r6,
           {_WELCH_EXPR} AS t_welch_r6
    FROM s WHERE na >= 2 AND nb >= 2
    """,
)
def events_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance two-sample t statistic on per-user value
    totals between the md5-assigned A/B arms (the same replayable
    assignment as ``sample_ab_srm``/``events_uplift_cuped``) — the
    mean-difference test completing the experimentation kit: SRM guards
    assignment, KS tests the whole distribution, CUPED reduces variance,
    Welch reads the headline lift significance without assuming equal
    arm variances.

    Numeric discipline: per-user totals centi-quantize exactly; Σy and
    Σy² accumulate in BIGINT/DECIMAL(38)/HUGEINT; the t formula is ONE
    shared SQL text over the single summary row (identical IEEE
    sequence both engines, round 6).  Arms with <2 users emit zero rows
    on both sides (the degenerate-sweep contract).

    Scale shape: user agg collapses the fact (map-side combined) →
    single-row global agg → scalar math.  No joins.
    """
    u = (
        T(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy("user_id")
        .agg(F.sum(F.round(F.lit(100) * F.col("value")).cast("long")).alias("y"))
        .withColumn(
            "arm",
            (
                F.conv(
                    F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
                ).cast("long")
                % 2
            ),
        )
    )
    yd = F.col("y").cast("decimal(38,0)")
    s = u.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).cast("long").alias("na"),
        F.sum(F.when(F.col("arm") == 0, F.col("y")).otherwise(0))
        .cast("long")
        .alias("sya"),
        F.sum(F.when(F.col("arm") == 0, yd * yd).otherwise(0)).alias("qa"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("long").alias("nb"),
        F.sum(F.when(F.col("arm") == 1, F.col("y")).otherwise(0))
        .cast("long")
        .alias("syb"),
        F.sum(F.when(F.col("arm") == 1, yd * yd).otherwise(0)).alias("qb"),
    )
    return s.filter((F.col("na") >= 2) & (F.col("nb") >= 2)).select(
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        F.expr(
            "round(CAST(sya AS DOUBLE) / CAST(na AS DOUBLE) / 100.0, 6)"
        ).alias("mean_a_r6"),
        F.expr(
            "round(CAST(syb AS DOUBLE) / CAST(nb AS DOUBLE) / 100.0, 6)"
        ).alias("mean_b_r6"),
        F.expr(_WELCH_EXPR).alias("t_welch_r6"),
    )


# ---------------------------------------------------------------------------
# sink_max_records_per_file — bounded-file-size export
# ---------------------------------------------------------------------------

_MAX_PER_FILE = 1000
_EXPORT_SHARDS = 4


@register(
    "sink_max_records_per_file",
    oracle=f"""
    WITH s AS (
      SELECT o_orderkey % {_EXPORT_SHARDS} AS shard, count(*) AS n
      FROM orders GROUP BY 1
    )
    SELECT CAST(sum(n) AS BIGINT) AS n_rows,
           CAST(sum((n + {_MAX_PER_FILE - 1}) // {_MAX_PER_FILE}) AS BIGINT)
             AS n_files,
           CAST(sum(n) AS BIGINT) AS n_keys
    FROM s
    """,
)
def sink_max_records_per_file(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-file-size sharded export: rows hash into {shards} derived
    shards (directory-partitioned) and ``maxRecordsPerFile`` caps every
    file at {cap} rows — the shard-size control every training-data
    export needs (downstream loaders want many same-sized shards, not
    one 10 GB file or 10⁶ ten-row files).  The read-back counts the
    files ACTUALLY produced via ``input_file_name()``.

    Determinism without a single-task write: ``repartition(shard)`` puts
    each shard's rows in exactly one task, and ``partitionBy(shard)``
    splits files per DIRECTORY — so even when hash collisions co-locate
    two shards in one task, each directory still holds exactly
    ⌈n_shard/{cap}⌉ files, which is what the oracle computes from the
    raw table (a first draft used ``coalesce(1)``: deterministic too,
    but the one-task write serialized the whole export — 5.9× at the
    10× replica, measured; the sharded form writes in parallel).

    Scale shape: one shuffle on the derived shard key, {shards}-way
    parallel write ({shards} scales with data in production — date or
    hash shards); read-back is partition-parallel with the file-count
    agg over ≤Σ⌈n_s/{cap}⌉ names.
    """
    out = _scratch(sf_dir, "maxrec")
    (
        T(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            "o_totalprice",
            (F.col("o_orderkey") % _EXPORT_SHARDS).alias("shard"),
        )
        .repartition(_EXPORT_SHARDS, F.col("shard"))
        .write.partitionBy("shard")
        .option("maxRecordsPerFile", _MAX_PER_FILE)
        .mode("overwrite")
        .parquet(out)
    )
    back = (
        spark.read.schema("o_orderkey long, o_totalprice double, shard long")
        .parquet(out)
        # non-deterministic exprs are banned inside aggregates — project
        # the file name per row first, then aggregate the projection
        .select("o_orderkey", F.input_file_name().alias("fname"))
    )
    return back.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.countDistinct("fname").cast("long").alias("n_files"),
        F.countDistinct("o_orderkey").cast("long").alias("n_keys"),
    )


sink_max_records_per_file.__doc__ = sink_max_records_per_file.__doc__.format(
    cap=_MAX_PER_FILE, shards=_EXPORT_SHARDS
)


# ---------------------------------------------------------------------------
# graph_degree_assortativity — degree-degree correlation across edges
# ---------------------------------------------------------------------------

#: shared Pearson text over the single summary row (exact integer sums)
_ASSORT_EXPR = (
    "round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    " / nullif(sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    " * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)"
    " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 0.0), 6)"
)


@register(
    "graph_degree_assortativity",
    oracle=f"""
    WITH e AS (SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem),
    ds AS (SELECT s, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY s),
    dp AS (SELECT p, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY p),
    x AS (
      SELECT ds.d AS x, dp.d AS y
      FROM e JOIN ds ON e.s = ds.s JOIN dp ON e.p = dp.p
    ),
    t AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(CAST(x AS HUGEINT) * y) AS BIGINT) AS sxy,
             CAST(sum(CAST(x AS HUGEINT) * x) AS BIGINT) AS sxx,
             CAST(sum(CAST(y AS HUGEINT) * y) AS BIGINT) AS syy
      FROM x
    )
    SELECT n AS n_edges, {_ASSORT_EXPR} AS assortativity_r6
    FROM t WHERE n >= 2
    """,
)
def graph_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the supplier–part graph: Pearson
    correlation between the two endpoint degrees across all edges — the
    one-number topology fingerprint (positive = hubs link to hubs,
    social-network-like; negative = hubs link to leaves, web/spam-farm-
    like) that tells you whether hot-key mitigation will face clustered
    or scattered skew before you run the expensive graph ops.

    Numeric discipline: degrees are exact integer counts; the five
    cross sums accumulate in BIGINT/DECIMAL (HUGEINT on DuckDB); the
    Pearson step is one shared SQL text on the single summary row,
    nullif-guarded for degree-regular graphs (zero variance → zero
    rows... NULL correlation), round 6.

    Scale shape: two node-keyed degree aggs (combiner-friendly) + two
    equi joins of the edge list against node-bounded degree tables
    (broadcast when small, co-partitioned hash otherwise) → single-row
    agg.  Edges never expand.
    """
    e = (
        T(spark, sf_dir, "lineitem")
        .select(F.col("l_suppkey").alias("s"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    ds = e.groupBy("s").agg(F.count(F.lit(1)).cast("long").alias("x"))
    dp = e.groupBy("p").agg(F.count(F.lit(1)).cast("long").alias("y"))
    x = e.join(ds, "s").join(dp, "p").select("x", "y")
    xd, ydd = F.col("x").cast("decimal(38,0)"), F.col("y").cast("decimal(38,0)")
    t = x.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(xd * ydd).cast("long").alias("sxy"),
        F.sum(xd * xd).cast("long").alias("sxx"),
        F.sum(ydd * ydd).cast("long").alias("syy"),
    )
    return t.filter(F.col("n") >= 2).select(
        F.col("n").alias("n_edges"),
        F.expr(_ASSORT_EXPR).alias("assortativity_r6"),
    )
