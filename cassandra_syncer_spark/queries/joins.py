"""Joins — SURVEY.md §2.3.

The reference's join-like logic is set reconciliation over file-name keys:
minimum-restore-set (semi, ``bin/cassandra-syncer-restore:96-105``) and
prune-unreferenced (anti, ``README.md:23-28``).  The remaining shapes are
mandated star-schema joins.  Scale notes per query: dimension sides are
broadcast explicitly; the as-of join is the union+window formulation (one
shuffle, no range blowup) from ``operators/asof.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_syncer_spark.operators.asof import asof_join
from cassandra_syncer_spark.operators.banded import banded_proximity_join, banded_range_join
from cassandra_syncer_spark.queries.relational import T
from cassandra_syncer_spark.registry import register


@register(
    "join_semi_manifest",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, l.l_quantity
    FROM lineitem l
    WHERE l.l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'O')
    """,
)
def join_semi_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: the minimum-restore-set selection.

    Reference: restore only files named by the latest manifest
    (bin/cassandra-syncer-restore:96-105, README.md:19-21).  Modeled as
    lineitem ⋉ open-orders: rows of the fact table whose key the "manifest"
    (filtered orders) references.  Semi-join never duplicates or widens the
    left side — at scale it is the cheapest reconciliation shape.
    """
    li = T(spark, sf_dir, "lineitem")
    manifest = T(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return li.join(manifest, li.l_orderkey == manifest.o_orderkey, "left_semi").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


@register(
    "join_anti_prune",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber
    FROM lineitem l
    WHERE l.l_orderkey NOT IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'O')
    """,
)
def join_anti_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: the prune-unreferenced-backups set.

    Reference: fsck prune spec (README.md:23-28) — stored files no retained
    manifest references.  Anti-join on the same keys as the semi above.
    """
    li = T(spark, sf_dir, "lineitem")
    manifest = T(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return li.join(manifest, li.l_orderkey == manifest.o_orderkey, "left_anti").select(
        "l_orderkey", "l_linenumber"
    )


@register(
    "join_inner_hash",
    oracle="""
    SELECT o.o_orderkey, c.c_name, n.n_name AS nation, round(o.o_totalprice, 2) AS price
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE c.c_mktsegment = 'BUILDING'
    """,
)
def join_inner_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join with explicit broadcast of the dimension sides.

    customer (1.5k–150k rows) and nation (25) are broadcast: the fact side
    never shuffles.  At 100 TB this is the difference between a map-side
    join and a full sort-merge shuffle of the biggest table.
    """
    orders = T(spark, sf_dir, "orders")
    cust = T(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    nation = T(spark, sf_dir, "nation")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select(
            "o_orderkey",
            "c_name",
            F.col("n_name").alias("nation"),
            F.round("o_totalprice", 2).alias("price"),
        )
    )


@register(
    "join_3table_topk",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           sum(CAST(round((l.l_extendedprice * (1 - l.l_discount)) * 10000.0) AS BIGINT)) / 10000.0 AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY c.c_custkey, c.c_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 10
    """,
)
def join_3table_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-table join + group + top-10 (BASELINE.md row 2).

    lineitem⋈orders shuffles on orderkey (both large); customer broadcasts.
    Top-10 via TakeOrderedAndProject — no global sort.
    """
    cust = T(spark, sf_dir, "customer")
    orders = T(spark, sf_dir, "orders")
    li = T(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg((F.sum(F.round((F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 10000.0).cast("long")) / 10000.0).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(10)
    )


@register(
    "join_multiway",
    oracle="""
    SELECT r.r_name AS region, n.n_name AS nation,
           sum(CAST(round((l.l_extendedprice * (1 - l.l_discount)) * 10000.0) AS BIGINT)) / 10000.0 AS revenue,
           count(*) AS n_items
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-table star join (BASELINE.md row 3).

    One true shuffle (lineitem⋈orders on orderkey); customer/nation/region
    all broadcast, so the star collapses into map-side lookups after the
    single fact-fact join.
    """
    li = T(spark, sf_dir, "lineitem")
    orders = T(spark, sf_dir, "orders")
    cust = T(spark, sf_dir, "customer")
    nation = T(spark, sf_dir, "nation")
    region = T(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            (F.sum(F.round((F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 10000.0).cast("long")) / 10000.0).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "join_left_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           count(o.o_orderkey) AS n_orders,
           round(coalesce(sum(o.o_totalprice), 0.0), 2) AS total_spent
    FROM customer c
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with zero orders."""
    cust = T(spark, sf_dir, "customer")
    orders = T(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spent"),
        )
    )


@register(
    "join_theta_range",
    oracle="""
    SELECT s.s_suppkey, s.s_name,
           count(*) AS n_peers,
           sum(CAST(round(c.c_acctbal * 100.0) AS BIGINT)) / (count(*) * 100.0) AS avg_peer_bal
    FROM supplier s
    JOIN customer c
      ON c.c_acctbal >= s.s_acctbal - 100.0 AND c.c_acctbal < s.s_acctbal + 100.0
    GROUP BY s.s_suppkey, s.s_name
    """,
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (theta/range) join: customers within ±100 of a supplier's
    balance.

    Executes as BroadcastNestedLoopJoin with supplier broadcast — acceptable
    because one side is dimension-sized.  At 100 TB with two large sides
    this shape must be rewritten by bucketing the range into bands and
    equi-joining on band id (see operators/asof.py for the same idea applied
    to time).
    """
    supp = T(spark, sf_dir, "supplier")
    cust = T(spark, sf_dir, "customer")
    cond = (cust.c_acctbal >= supp.s_acctbal - 100.0) & (cust.c_acctbal < supp.s_acctbal + 100.0)
    return (
        cust.join(F.broadcast(supp), cond)
        .groupBy("s_suppkey", "s_name")
        .agg(
            F.count(F.lit(1)).alias("n_peers"),
            (F.sum(F.round(F.col("c_acctbal") * 100.0).cast("long")) / (F.count(F.lit(1)) * 100.0)).alias("avg_peer_bal"),
        )
    )


@register(
    "join_salted_skew",
    oracle="""
    SELECT o.o_orderstatus,
           count(*) AS n_lines,
           CAST(sum(CAST(round(l.l_quantity) AS BIGINT)) AS BIGINT) AS total_qty
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderstatus
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hot-key survival shape: lineitem⋈orders executed through
    ``operators/skew.py::salted_join`` — the big side scatters each key
    across 8 salt partitions (deterministic content-hash salt, no rand()),
    the small side replicates 8×, shuffle key becomes (key, salt).

    Semantically identical to the plain equi join (the oracle IS the plain
    join), which is the property that lets a planner switch to the salted
    form when a key histogram shows skew AQE can't split.  Multiplicity
    preservation is separately property-tested
    (tests/test_sync_lifecycle.py::test_salted_join_preserves_semantics).
    """
    from cassandra_syncer_spark.operators.skew import salted_join

    li = T(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k"), "l_quantity"
    )
    orders = T(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"), "o_orderstatus"
    )
    return (
        salted_join(li, orders, on="k", salt=8)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.round("l_quantity").cast("long")).cast("long").alias("total_qty"),
        )
    )


@register(
    "reshape_unpivot",
    oracle="""
    WITH u AS (
      SELECT l_returnflag, 'quantity' AS measure, l_quantity AS v FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'discount', l_discount FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'tax', l_tax FROM lineitem
    )
    SELECT l_returnflag, measure,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(v * 100.0) AS BIGINT)) AS BIGINT) AS total_centi
    FROM u GROUP BY l_returnflag, measure
    """,
)
def reshape_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape (unpivot/melt): measure columns become
    (measure, value) rows via ``stack`` — the inverse of ``agg_pivot`` and
    a training-pipeline staple (per-feature statistics over wide feature
    tables).  Stack is a generator projection — no shuffle until the
    aggregation, which then groups on the (dimension, measure) key.
    Exact integer-unit sums keep the value hash engine-stable.
    """
    li = T(spark, sf_dir, "lineitem")
    long = li.select(
        "l_returnflag",
        F.expr(
            "stack(3, 'quantity', l_quantity, 'discount', l_discount, 'tax', l_tax)"
            " AS (measure, v)"
        ),
    )
    return long.groupBy("l_returnflag", "measure").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("v") * 100.0).cast("long")).cast("long").alias("total_centi"),
    )


@register(
    "join_range_banded",
    oracle="""
    SELECT s.s_suppkey, s.s_name,
           count(*) AS n_peers,
           sum(CAST(round(c.c_acctbal * 100.0) AS BIGINT)) / (count(*) * 100.0) AS avg_peer_bal
    FROM supplier s
    JOIN customer c
      ON c.c_acctbal >= s.s_acctbal - 100.0 AND c.c_acctbal < s.s_acctbal + 100.0
    GROUP BY s.s_suppkey, s.s_name
    """,
)
def join_range_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same range semantics as ``join_theta_range`` under the
    large×large physical strategy: band the value axis and equi-join on
    band id (operators/banded.py) instead of BroadcastNestedLoopJoin.

    Identical oracle on purpose — the driver verifies the banded rewrite
    is *semantically equal* to the nested-loop formulation, which is the
    property that lets a planner swap one for the other when both sides
    are big.  Plan-shape test (no BNLJ even with broadcast disabled):
    tests/test_plans.py.
    """
    supp = T(spark, sf_dir, "supplier")
    cust = T(spark, sf_dir, "customer")
    pairs = banded_proximity_join(
        cust.select("c_custkey", "c_acctbal"),
        supp.select("s_suppkey", "s_name", "s_acctbal"),
        left_val="c_acctbal",
        right_val="s_acctbal",
        radius=100.0,
    )
    return pairs.groupBy("s_suppkey", "s_name").agg(
        F.count(F.lit(1)).alias("n_peers"),
        (F.sum(F.round(F.col("c_acctbal") * 100.0).cast("long")) / (F.count(F.lit(1)) * 100.0)).alias("avg_peer_bal"),
    )


@register(
    "join_range_banded_anti",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM supplier s
      WHERE c.c_acctbal >= s.s_acctbal - 100.0
        AND c.c_acctbal <  s.s_acctbal + 100.0)
    """,
)
def join_range_banded_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded range ANTI join — the prune-style flow at large×large scale:
    customers whose balance falls inside NO supplier's ±100 interval
    (outlier extraction against a large interval table).

    A naive NOT EXISTS over a range predicate plans as
    BroadcastNestedLoopJoin(LeftAnti); ``banded_range_join(how='left_anti')``
    keeps the band-equi shape (the exact range predicate rides inside the
    join condition, so anti semantics apply to the true predicate, not the
    band superset).  Plan-shape test: tests/test_plans.py.
    """
    supp = T(spark, sf_dir, "supplier").select(
        (F.col("s_acctbal") - 100.0).alias("lo"),
        (F.col("s_acctbal") + 100.0).alias("hi"),
    )
    cust = T(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment", "c_acctbal")
    return banded_range_join(
        cust,
        supp,
        left_point="c_acctbal",
        right_lo="lo",
        right_hi="hi",
        band_width=200.0,
        how="left_anti",
    ).select("c_custkey", "c_mktsegment")


@register(
    "join_asof",
    oracle="""
    WITH lft AS (
      SELECT event_id, user_id, epoch_ns(ts) // 1000000000 AS ts_sec
      FROM events WHERE event_type = 'click'
    ), rgt AS (
      SELECT user_id, epoch_ns(ts) // 1000000000 AS ts_sec,
             max(event_id) AS r_event_id
      FROM events WHERE event_type = 'purchase'
      GROUP BY 1, 2
    )
    SELECT l.event_id, l.user_id, l.ts_sec,
           max_by(r.r_event_id, r.ts_sec) AS matched_event_id,
           max(r.ts_sec) AS matched_ts_sec
    FROM lft l
    LEFT JOIN rgt r ON l.user_id = r.user_id AND r.ts_sec <= l.ts_sec
    GROUP BY l.event_id, l.user_id, l.ts_sec
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each click, the latest purchase at-or-before it.

    Reference-analog: latest-manifest-≤-now selection
    (bin/cassandra-syncer-restore:82-89) generalized per key.  Uses the
    union+window formulation (operators/asof.py): one shuffle on user_id,
    no range-join blowup.  The oracle uses the O(n·m)-per-key join+argmax
    formulation — fine at sf0.01, which is exactly why we don't use it here.
    """
    ev = T(spark, sf_dir, "events").withColumn("ts_sec", F.expr("ts_ns div 1000000000"))
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts_sec")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts_sec", "event_id"
    )
    out = asof_join(
        clicks,
        purchases,
        on="user_id",
        left_ts="ts_sec",
        right_ts="ts_sec",
        value_cols=["event_id"],
    )
    return out.select(
        "event_id",
        "user_id",
        "ts_sec",
        F.col("matched_event_id"),
        F.col("matched_ts").alias("matched_ts_sec"),
    )


@register(
    "join_self_dedup",
    oracle="""
    SELECT a.lang, count(*) AS n_pairs
    FROM documents a
    JOIN documents b
      ON md5(concat(a.lang, '_', CAST(a.n_chars AS VARCHAR)))
       = md5(concat(b.lang, '_', CAST(b.n_chars AS VARCHAR)))
     AND a.doc_id < b.doc_id
    GROUP BY a.lang
    """,
)
def join_self_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-join on a content signature hash: candidate duplicate pairs.

    Reference: etag/MD5 content identity (storage-object.js:123-124).  The
    signature here is hash(lang, n_chars) — a blocking key; real near-dup
    pipelines (see llm_dedup.py) use MinHash bands the same way.  The
    a.doc_id < b.doc_id predicate halves the pair space.
    """
    docs = T(spark, sf_dir, "documents").withColumn(
        "sig", F.md5(F.concat("lang", F.lit("_"), F.col("n_chars").cast("string")))
    )
    a = docs.alias("a")
    b = docs.alias("b")
    return (
        a.join(b, (F.col("a.sig") == F.col("b.sig")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.lang").alias("lang"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
