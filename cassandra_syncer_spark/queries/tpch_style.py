"""Composite analytics queries (TPC-H-shaped) — realistic multi-operator
plans over the star schema, each an end-to-end pattern a user of the engine
would actually run.  All [MANDATE]-side breadth on top of SURVEY §2's
per-operator rows; ids follow the TPC-H query they mirror.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_syncer_spark.queries.relational import T
from cassandra_syncer_spark.registry import register


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           sum(CAST(round((l.l_extendedprice * (1 - l.l_discount)) * 10000.0) AS BIGINT)) / 10000.0 AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment filter → 3-way join → agg → top-10.

    Both date predicates push to their scans before the join; customer
    broadcasts; top-10 via TakeOrderedAndProject.
    """
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    c = T(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg((F.sum(F.round((F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 10000.0).cast("long")) / 10000.0).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT sum(CAST(round((l_extendedprice * l_discount) * 10000.0) AS BIGINT)) / 10000.0 AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-agg — every predicate must reach
    the parquet reader (the canonical pushdown benchmark)."""
    li = T(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            (F.sum(F.round((F.col("l_extendedprice") * F.col("l_discount")) * 10000.0).cast("long")) / 10000.0).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q12_shipmode_priority",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(sum(CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)
             AS finished_count,
           CAST(sum(CASE WHEN o.o_orderstatus <> 'F' THEN 1 ELSE 0 END) AS BIGINT)
             AS open_count
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 40)
    GROUP BY o.o_orderpriority
    """,
)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: semi-join restriction + conditional counting."""
    o = T(spark, sf_dir, "orders")
    big = T(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 40)
    return (
        o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).cast("long").alias("finished_count"),
            F.sum(F.when(F.col("o_orderstatus") != "F", 1).otherwise(0)).cast("long").alias("open_count"),
        )
    )


@register(
    "q14_promo_share",
    oracle="""
    SELECT round(
             100.0 * sum(CASE WHEN p.p_type LIKE 'PROMO%'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0.0 END)
             / sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_share_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
    """,
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: broadcast dimension join + conditional-ratio agg."""
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01 00:00:00").cast("timestamp"))
    )
    p = T(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type").like("PROMO%"), rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_share_pct")
        )
    )


@register(
    "win_percent_rank",
    oracle="""
    SELECT s_suppkey,
           round(percent_rank() OVER (ORDER BY s_acctbal, s_suppkey), 6) AS pct_rank,
           round(cume_dist()    OVER (ORDER BY s_acctbal, s_suppkey), 6) AS cume
    FROM supplier
    """,
)
def win_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist — completes the ranking-window family."""
    from pyspark.sql.window import Window

    w = Window.orderBy("s_acctbal", "s_suppkey")
    return T(spark, sf_dir, "supplier").select(
        "s_suppkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )
