"""Incremental-maintenance operators: pivot, percentiles, and last-writer-
wins merge — the reference's PUT-overwrite upsert
(``core.js:403-417``: re-PUT replaces the stored object) expressed as a
relational operator over snapshots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cassandra_syncer_spark.queries.relational import T
from cassandra_syncer_spark.registry import register

SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]


@register(
    "agg_pivot",
    oracle=f"""
    SELECT n.n_name AS nation,
           {", ".join(
               f"round(coalesce(sum(CASE WHEN c.c_mktsegment = '{s}' "
               f"THEN c.c_acctbal END), 0.0), 2) AS {s.lower()}"
               for s in SEGMENTS
           )}
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: nation × market-segment balance matrix.

    Explicit value list (never pivot-with-discovery: at scale the distinct
    scan to find pivot values is a full extra pass).
    """
    cust = T(spark, sf_dir, "customer")
    nation = T(spark, sf_dir, "nation")
    out = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .pivot("c_mktsegment", SEGMENTS)
        .agg(F.sum("c_acctbal"))
    )
    return out.select(
        "nation",
        *[F.round(F.coalesce(F.col(s), F.lit(0.0)), 2).alias(s.lower()) for s in SEGMENTS],
    )


@register(
    "agg_percentile",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 8) AS p50,
           round(quantile_cont(l_extendedprice, 0.95), 8) AS p95,
           round(min(l_extendedprice), 2) AS lo,
           round(max(l_extendedprice), 2) AS hi
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (both engines use linear
    interpolation: Spark ``percentile``, DuckDB ``quantile_cont``).  At
    100 TB swap for approx_percentile (t-digest) — exact percentile sorts
    every group."""
    li = T(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 8).alias("p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.95)"), 8).alias("p95"),
        F.round(F.min("l_extendedprice"), 2).alias("lo"),
        F.round(F.max("l_extendedprice"), 2).alias("hi"),
    )


def agg_percentile_approx_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB percentile path: ``approx_percentile`` (Greenwald-Khanna
    sketch) — one pass, fixed memory per group, mergeable partials —
    replacing the exact form that must sort every group (the bottleneck
    SCALING.md flags for ``agg_percentile``).  UNREGISTERED since round
    6: Spark's GK and DuckDB's t-digest produce different estimates, so
    the driver-checked registration of ``agg_percentile_approx``
    (queries/approx_bounds.py) is the rank-error-envelope form; the
    estimate-vs-exact error is also unit-gated
    (tests/test_operators.py::test_approx_percentile_tracks_exact)."""
    li = T(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("approx_percentile(l_extendedprice, 0.5, 1000)"), 8).alias("p50"),
        F.round(F.expr("approx_percentile(l_extendedprice, 0.95, 1000)"), 8).alias("p95"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "merge_upsert",
    oracle="""
    WITH current AS (
      SELECT o_orderkey, o_orderstatus, CAST(floor(o_totalprice) AS BIGINT) AS price, 0 AS version
      FROM orders
    ), updates AS (
      SELECT o_orderkey, 'X' AS o_orderstatus,
             CAST(floor(o_totalprice * 1.5) AS BIGINT) AS price, 1 AS version
      FROM orders WHERE o_orderkey % 10 = 0
    ), unioned AS (
      SELECT * FROM current UNION ALL SELECT * FROM updates
    )
    SELECT o_orderkey, o_orderstatus, price FROM (
      SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY version DESC) AS rn
      FROM unioned
    ) WHERE rn = 1
    """,
)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-writer-wins merge (upsert): current snapshot + update batch →
    next snapshot.

    The reference's idempotent re-PUT (core.js:403-417) and snapshot-
    manifest model make every sync cycle exactly this operator.  Shape:
    unionByName + one window per key ordered by version — a single shuffle;
    on a real lakehouse sink this maps 1:1 onto MERGE INTO.
    """
    orders = T(spark, sf_dir, "orders")
    current = orders.select(
        "o_orderkey", "o_orderstatus",
        F.floor("o_totalprice").cast("long").alias("price"),
        F.lit(0).alias("version"),
    )
    updates = (
        orders.filter(F.col("o_orderkey") % 10 == 0)
        .select(
            "o_orderkey",
            F.lit("X").alias("o_orderstatus"),
            F.floor(F.col("o_totalprice") * 1.5).cast("long").alias("price"),
            F.lit(1).alias("version"),
        )
    )
    w = Window.partitionBy("o_orderkey").orderBy(F.desc("version"))
    return (
        current.unionByName(updates)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_orderkey", "o_orderstatus", "price")
    )
