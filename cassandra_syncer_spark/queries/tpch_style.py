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


@register(
    "q5_local_volume",
    oracle="""
    SELECT n.n_name,
           sum(CAST(round((l.l_extendedprice * (1 - l.l_discount)) * 10000.0) AS BIGINT)) / 10000.0 AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q5_local_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way star join (region → nation → supplier ⋈
    lineitem ⋈ orders ⋈ customer) with the local-supplier correlation
    (c_nationkey = s_nationkey) and a per-nation revenue roll-up.

    Scale shape: region/nation/supplier are genuinely dimension-sized and
    broadcast; lineitem ⋈ orders is the one big shuffle (both sides
    pre-filtered by pushed-down predicates).  The customer join carries no
    broadcast hint — Catalyst/AQE picks broadcast at bench scale and
    shuffle join when customer outgrows the threshold at 100 TB.
    """
    cutoff_lo = F.lit("1997-01-01 00:00:00").cast("timestamp")
    cutoff_hi = F.lit("1998-01-01 00:00:00").cast("timestamp")
    r = T(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = T(spark, sf_dir, "nation")
    s = T(spark, sf_dir, "supplier")
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= cutoff_lo) & (F.col("o_orderdate") < cutoff_hi)
    )
    li = T(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(c, (o.o_custkey == c.c_custkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            (
                F.sum(
                    F.round(
                        (F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 10000.0
                    ).cast("long")
                )
                / 10000.0
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


@register(
    "q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           sum(CAST(round((l.l_extendedprice * (1 - l.l_discount)) * 10000.0) AS BIGINT)) / 10000.0 AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-10-01 00:00:00'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer over one
    quarter, top-20 — join-heavy agg with a selective fact filter.

    The l_returnflag and date predicates push to the scans; nation
    broadcasts; the final top-20 is TakeOrderedAndProject (no global
    sort materialization).
    """
    lo = F.lit("1997-07-01 00:00:00").cast("timestamp")
    hi = F.lit("1997-10-01 00:00:00").cast("timestamp")
    c = T(spark, sf_dir, "customer")
    n = T(spark, sf_dir, "nation")
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            (
                F.sum(
                    F.round(
                        (F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 10000.0
                    ).cast("long")
                )
                / 10000.0
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q18_large_orders",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           o.o_totalprice,
           CAST(round(sum(l.l_quantity) * 100.0) AS BIGINT) / 100.0 AS total_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 250
    )
    GROUP BY c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: large-volume orders — an aggregated HAVING
    subquery restricts the fact table via a semi join, then the survivors
    re-aggregate with their customer.

    Scale shape: the subquery is a partial-aggregated groupBy on the fact
    key (map-side combine shrinks it before the shuffle); its output is
    order-key-sized and joins back left_semi on the same key, so AQE can
    reuse the exchange.  Top-100 via TakeOrderedAndProject.
    """
    li = T(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 250)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    o_base = T(spark, sf_dir, "orders")
    o = o_base.join(big, o_base.o_orderkey == big.big_orderkey, "left_semi")
    c = T(spark, sf_dir, "customer")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(
            F.round(F.sum("l_quantity") * 100.0).cast("long").alias("q100"),
        )
        .select(
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_totalprice",
            (F.col("q100") / 100.0).alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@register(
    "q19_disjunctive_pushdown",
    oracle="""
    SELECT sum(CAST(round((l.l_extendedprice * (1 - l.l_discount)) * 10000.0) AS BIGINT)) / 10000.0 AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3'  AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs across both join sides — the
    disjunctive-predicate benchmark.

    Catalyst extracts the common single-side conjuncts from the
    disjunction: l_quantity <= 30 pushes to the lineitem scan and
    p_brand IN (...) to the part scan before the join, so the broadcast
    hash join sees pre-pruned inputs and only the mixed residual runs
    post-join.
    """
    li = T(spark, sf_dir, "lineitem")
    p = T(spark, sf_dir, "part")
    qty, brand, size = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    cond = (
        ((brand == "Brand#12") & size.between(1, 15) & qty.between(1, 11))
        | ((brand == "Brand#23") & size.between(10, 30) & qty.between(10, 20))
        | ((brand == "Brand#3") & size.between(20, 50) & qty.between(20, 30))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            (
                F.sum(
                    F.round(
                        (F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 10000.0
                    ).cast("long")
                )
                / 10000.0
            ).alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n_items"),
        )
    )


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                        AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: order-count histogram INCLUDING zero-order
    customers — the left-outer + double-aggregation pattern (count of
    counts).  The join predicate on the outer side's non-key column
    filters matches without dropping unmatched customers.

    Scale shape: one shuffle on custkey for join+first agg (AQE reuses
    the exchange), then the second agg's key space is tiny (distinct
    order counts) — partials collapse map-side.
    """
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("long").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    WITH lq AS (
      SELECT l_partkey, l_extendedprice,
             CAST(round(l_quantity) AS BIGINT) AS qty_units
      FROM lineitem
    ),
    per_part AS (
      SELECT l_partkey, sum(qty_units) AS qty_sum,
             count(*) AS qty_cnt
      FROM lq GROUP BY l_partkey
    )
    SELECT round(CAST(sum(CAST(round(l.l_extendedprice * 10000.0) AS BIGINT))
                 AS BIGINT) / 10000.0 / 7.0, 4) AS avg_yearly
    FROM lq l
    JOIN per_part a ON l.l_partkey = a.l_partkey
    JOIN part p     ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23'
      AND l.qty_units * 5 * a.qty_cnt < a.qty_sum
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: the correlated-average subquery (lineitems below
    20% of their part's mean quantity), decorrelated into a per-part
    aggregate joined back — Spark's standard rewrite of a correlated
    scalar subquery.

    The threshold test is EXACT integer math: qty·5·count < sum avoids
    the float division `0.2 · avg` whose last-ulp could flip a boundary
    row differently per engine.  Scale shape: both the per-part agg and
    the join share the l_partkey shuffle key; the part filter broadcasts.
    """
    lq = T(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_extendedprice",
        F.round("l_quantity").cast("long").alias("qty_units"),
    )
    per_part = lq.groupBy("l_partkey").agg(
        F.sum("qty_units").alias("qty_sum"), F.count(F.lit(1)).alias("qty_cnt")
    ).withColumnRenamed("l_partkey", "a_partkey")
    p = T(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    return (
        lq.join(per_part, lq.l_partkey == per_part.a_partkey)
        .join(F.broadcast(p), lq.l_partkey == p.p_partkey)
        .filter(F.col("qty_units") * 5 * F.col("qty_cnt") < F.col("qty_sum"))
        .agg(
            F.round(
                F.sum(F.round(F.col("l_extendedprice") * 10000.0).cast("long"))
                .cast("long")
                / 10000.0
                / 7.0,
                4,
            ).alias("avg_yearly")
        )
    )


@register(
    "q22_dormant_customers",
    oracle="""
    WITH c AS (
      SELECT c_custkey, c_mktsegment,
             CAST(round(c_acctbal * 100.0) AS BIGINT) AS bal_centi
      FROM customer
    ),
    pos AS (
      SELECT sum(bal_centi) AS s, count(*) AS n FROM c WHERE bal_centi > 0
    )
    SELECT c.c_mktsegment,
           CAST(count(*) AS BIGINT) AS numcust,
           CAST(sum(c.bal_centi) AS BIGINT) / 100.0 AS totacctbal
    FROM c, pos
    WHERE c.bal_centi * pos.n > pos.s
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '1999-06-01 00:00:00')
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: global-scalar-subquery threshold (balance above
    the mean positive balance) + anti join (customers with no RECENT
    order — the fixture has no never-ordered customers, so dormancy is
    defined against the last two years to keep the anti join non-trivial),
    rolled up per segment.

    The mean test is exact integer math (bal·n > sum — no float mean),
    the one-row aggregate crosses as a broadcast nested-loop join of a
    single row (the Spark form of a scalar subquery), and the anti join
    shuffles on custkey only.
    """
    c = T(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.col("c_acctbal") * 100.0).cast("long").alias("bal_centi"),
    )
    pos = c.filter(F.col("bal_centi") > 0).agg(
        F.sum("bal_centi").alias("s"), F.count(F.lit(1)).alias("n")
    )
    o = (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1999-06-01 00:00:00").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        c.join(F.broadcast(pos))
        .filter(F.col("bal_centi") * F.col("n") > F.col("s"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("numcust"),
            (F.sum("bal_centi").cast("long") / 100.0).alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             sum(CAST(round((l_extendedprice * (1 - l_discount)) * 10000.0)
                 AS BIGINT)) AS rev_units
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, rev.rev_units / 10000.0 AS total_revenue
    FROM supplier s JOIN rev ON s.s_suppkey = rev.l_suppkey
    WHERE rev.rev_units = (SELECT max(rev_units) FROM rev)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: revenue view + argmax-by-equality against the
    view's own global max (the scalar-subquery-over-aggregate pattern).

    Equality against a float max is engine-fragile; revenue stays in
    exact integer units until after the max test, so the argmax is
    deterministic in both engines.  Scale shape: the view aggregates on
    l_suppkey (map-side partials), the 1-row max broadcasts back, and
    supplier joins broadcast — no second shuffle of the view.
    """
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            F.round(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 10000.0
            ).cast("long")
        ).alias("rev_units")
    )
    mx = rev.agg(F.max("rev_units").alias("max_units"))
    s = T(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("rev_units") == F.col("max_units"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select(
            "s_suppkey", "s_name", (F.col("rev_units") / 10000.0).alias("total_revenue")
        )
        .orderBy("s_suppkey")
    )


@register(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND l.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    LIMIT 50
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-pair reconstruction (the fixture has no
    partsupp, so supplier×part comes from lineitem), a NOT-IN exclusion
    (anti join — negative-balance suppliers stand in for the complaints
    filter), and a multi-key count-distinct with top-50.

    Scale shape: the DISTINCT pair projection collapses the fact table
    once on (partkey, suppkey); the exclusion list is dimension-sized and
    broadcast-anti; count_distinct re-shuffles only the collapsed pairs.
    """
    pairs = (
        T(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    )
    bad = T(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    p = T(spark, sf_dir, "part").filter(F.col("p_brand") != "Brand#1")
    return (
        pairs.join(F.broadcast(bad), pairs.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
        .orderBy(
            F.desc("supplier_cnt"), F.asc("p_brand"), F.asc("p_type"), F.asc("p_size")
        )
        .limit(50)
    )
