"""Relational core: scans, projections, predicates, aggregates, sorts, sets.

Covers SURVEY.md §2.1 (scans/sources), §2.2 (projections/filters), §2.4
(aggregations), §2.6 (sorts/top-k), §2.7 (set ops).  Reference provenance is
cited per-query; the reference implements these semantics imperatively over
file records (e.g. temp-file filtering at ``bin/cassandra-syncer:208-210``),
we express the same shapes declaratively over the driver's star schema so
Catalyst gets pushdown/pruning for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_syncer_spark.registry import register
from cassandra_syncer_spark.session import load_table


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# §2.1 scans
# ---------------------------------------------------------------------------


@register(
    "scan_parquet",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    """,
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch table scan with column pruning.

    Reference: recursive directory walk emitting file records
    (bin/cassandra-syncer:215-232).  Spark: parquet scan; the 3-column
    select must reach the reader (ReadSchema pruning).
    """
    return T(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity")


@register(
    "scan_listing",
    oracle="""
    SELECT o_orderkey AS name,
           CAST(floor(o_totalprice) AS BIGINT) AS bytes,
           md5(CAST(o_orderkey AS VARCHAR)) AS etag,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS last_modified
    FROM orders
    """,
)
def scan_listing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Object-store listing scan: (name, bytes, etag, last_modified) records.

    Reference: container listing record shape {name, bytes, etag,
    last_modified} (node_modules/cloudfiles/lib/cloudfiles/core.js:355-367).
    Modeled over orders: derive the listing-record columns declaratively.
    """
    return T(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("name"),
        F.floor("o_totalprice").cast("bigint").alias("bytes"),
        F.md5(F.col("o_orderkey").cast("string")).alias("etag"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("last_modified"),
    )


@register(
    "scan_glob_filter",
    oracle="""
    SELECT p_partkey, p_name, p_type
    FROM part
    WHERE p_type LIKE 'PROMO%' AND p_name NOT LIKE '%tmp%'
    """,
)
def scan_glob_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan with pattern pruning (include-glob + exclude-temp).

    Reference: regexp-filtered download (core.js:269-283) and '-tmp'
    exclusion (bin/cassandra-syncer:208-210,221).  The LIKE predicates are
    pushed to the parquet scan (PushedFilters).
    """
    part = T(spark, sf_dir, "part")
    return part.select("p_partkey", "p_name", "p_type").filter(
        F.col("p_type").like("PROMO%") & ~F.col("p_name").like("%tmp%")
    )


@register(
    "scan_json_manifest",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INTEGER) AS prop_k
    FROM events
    WHERE CAST(json_extract(props, '$.k') AS INTEGER) > 50
    """,
)
def scan_json_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON document decode + predicate on the decoded field.

    Reference: manifest JSON.parse (bin/cassandra-syncer-restore:93-96).
    Spark: from_json with an explicit schema (never schema inference on the
    hot path — at 100 TB, inference is a full extra scan).
    """
    ev = T(spark, sf_dir, "events")
    parsed = ev.select(
        "event_id",
        F.from_json("props", "struct<k:int>").getField("k").alias("prop_k"),
    )
    return parsed.filter(F.col("prop_k") > 50)


# ---------------------------------------------------------------------------
# §2.2 projections / predicates
# ---------------------------------------------------------------------------


@register(
    "project_transform",
    oracle="""
    SELECT c_custkey,
           concat('segment/', c_mktsegment, '/', CAST(c_custkey AS VARCHAR)) AS path,
           c_acctbal + 100.0 AS adj_bal
    FROM customer
    """,
)
def project_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection with computed columns (path join / arithmetic).

    Reference: absolute-path resolution map (bin/cassandra-syncer:92-97,
    188-191,222).  The arithmetic is addition (IEEE bit-exact in both
    engines) — round(x*1.1, 2) diverged between engines on a half-cent
    boundary at sf0.01.
    """
    return T(spark, sf_dir, "customer").select(
        "c_custkey",
        F.concat(
            F.lit("segment/"), F.col("c_mktsegment"), F.lit("/"), F.col("c_custkey").cast("string")
        ).alias("path"),
        (F.col("c_acctbal") + 100.0).alias("adj_bal"),
    )


@register(
    "filter_predicate",
    oracle="""
    SELECT p_partkey, p_name
    FROM part
    WHERE p_name NOT LIKE '%-tmp%' AND p_size >= 10
    """,
)
def filter_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter by contains-predicate (the reference's isTempFile filter).

    Reference: name contains '-tmp' → skip (bin/cassandra-syncer:208-210).
    """
    return (
        T(spark, sf_dir, "part")
        .filter(~F.col("p_name").contains("-tmp") & (F.col("p_size") >= 10))
        .select("p_partkey", "p_name")
    )


@register(
    "filter_regex",
    oracle="""
    SELECT o_orderkey, o_orderpriority
    FROM orders
    WHERE regexp_matches(o_orderpriority, '^[12]-')
    """,
)
def filter_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex predicate (the reference's /json/ manifest-name match).

    Reference: name.search(/json/) (bin/cassandra-syncer-restore:83-85).
    """
    return (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").rlike("^[12]-"))
        .select("o_orderkey", "o_orderpriority")
    )


@register(
    "filter_exists",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
    """,
)
def filter_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Existence predicate as a semi-join (the ENOENT skip-if-missing).

    Reference: fs.stat ENOENT → skip upload (bin/cassandra-syncer:120-132) —
    'keep rows whose counterpart exists'.  Spark: left_semi join, which at
    scale avoids materializing the probe side.
    """
    orders = T(spark, sf_dir, "orders")
    big_items = T(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return orders.join(
        big_items, orders.o_orderkey == big_items.l_orderkey, "left_semi"
    ).select("o_orderkey", "o_totalprice")


@register(
    "filter_in_set",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
    """,
)
def filter_in_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Membership predicate (container-name equality scan).

    Reference: array-membership download filter (core.js:285-301), container
    scan (bin/cassandra-syncer:167-172).  IN over a literal set is pushed to
    the scan; IN over a big table would become a semi-join instead.
    """
    return (
        T(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
        .select("c_custkey", "c_name", "c_mktsegment")
    )


# ---------------------------------------------------------------------------
# §2.4 aggregations
# ---------------------------------------------------------------------------


@register(
    "agg_group_sum",
    oracle="""
    SELECT l_returnflag,
           l_linestatus,
           sum(CAST(round(l_quantity * 100.0) AS BIGINT)) / 100.0 AS sum_qty,
           sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)) / 100.0 AS sum_base_price,
           sum(CAST(round((l_extendedprice * (1 - l_discount)) * 10000.0) AS BIGINT)) / 10000.0
             AS sum_disc_price,
           sum(CAST(round((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 1000000.0) AS BIGINT)) / 1000000.0
             AS sum_charge,
           sum(CAST(round(l_quantity * 100.0) AS BIGINT)) / (count(*) * 100.0) AS avg_qty,
           sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)) / (count(*) * 100.0) AS avg_price,
           sum(CAST(round(l_discount * 100.0) AS BIGINT)) / (count(*) * 100.0) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def agg_group_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H-Q1-style pricing summary (filter → hash agg → sort).

    Reference-analog: per-container stats (count, bytes)
    (core.js:144-148) generalized to the mandated multi-agg form.
    Catalyst plans partial (map-side) + final aggregation automatically; the
    shipdate predicate is pushed to the parquet scan.  Sums are rounded on
    both sides because double addition order differs between engines.
    """
    li = T(spark, sf_dir, "lineitem")
    # exact-integer-unit aggregation: each money term is rounded to integer
    # micro-units per row (single-expression IEEE math -> bit-identical in
    # any engine), summed as longs (order-independent, exact), and scaled
    # back.  This is the only sum formulation whose hash survives both
    # rounding-boundary cases AND accumulation-order noise at any scale.
    #
    # The per-row rounded longs are STAGED in a projection before the
    # groupBy so each is evaluated exactly once per row — sum_qty/avg_qty
    # (and base_price/avg_price) share one rounded column instead of
    # Catalyst evaluating the round() twice inside separate aggregates.
    # 5 long sums + 1 count instead of 7 sums.
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    staged = (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .select(
            "l_returnflag",
            "l_linestatus",
            F.round(F.col("l_quantity") * 100.0).cast("long").alias("qty_c"),
            F.round(F.col("l_extendedprice") * 100.0).cast("long").alias("price_c"),
            F.round(disc_price * 10000.0).cast("long").alias("disc_price_u"),
            F.round(charge * 1000000.0).cast("long").alias("charge_u"),
            F.round(F.col("l_discount") * 100.0).cast("long").alias("disc_c"),
        )
    )
    agg = staged.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("qty_c").alias("s_qty"),
        F.sum("price_c").alias("s_price"),
        F.sum("disc_price_u").alias("s_disc_price"),
        F.sum("charge_u").alias("s_charge"),
        F.sum("disc_c").alias("s_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )
    n = F.col("count_order")
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        (F.col("s_qty") / 100.0).alias("sum_qty"),
        (F.col("s_price") / 100.0).alias("sum_base_price"),
        (F.col("s_disc_price") / 10000.0).alias("sum_disc_price"),
        (F.col("s_charge") / 1000000.0).alias("sum_charge"),
        (F.col("s_qty") / (n * 100.0)).alias("avg_qty"),
        (F.col("s_price") / (n * 100.0)).alias("avg_price"),
        (F.col("s_disc") / (n * 100.0)).alias("avg_disc"),
        "count_order",
    ).orderBy("l_returnflag", "l_linestatus")


@register(
    "agg_count_distinct",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS n_users,
           count(*) AS n_events
    FROM events
    GROUP BY event_type
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact count-distinct per group (two-phase expand under the hood)."""
    return (
        T(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def agg_approx_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate count-distinct (HyperLogLog++) — the pure production
    form: one pass, fixed memory, no expand.  UNREGISTERED since round 6:
    an engine-specific estimate can never hash-match a DuckDB oracle, so
    the driver-checked registration of ``agg_approx_distinct``
    (queries/approx_bounds.py) is the envelope form — exact distinct +
    a boolean certifying this estimator sits inside its documented
    accuracy bound.  Accuracy is also unit-gated
    (tests/test_operators.py::test_approx_distinct_tracks_exact).
    """
    return (
        T(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", 0.02).alias("approx_users"))
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT coalesce(n.n_name, 'ALL') AS nation,
           coalesce(c.c_mktsegment, 'ALL') AS segment,
           round(sum(c.c_acctbal), 2) AS total_bal,
           count(*) AS n_cust
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY ROLLUP (n.n_name, c.c_mktsegment)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup (hierarchical grouping sets) with NULL-marker normalization."""
    cust = T(spark, sf_dir, "customer")
    nation = T(spark, sf_dir, "nation")
    joined = cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    return (
        joined.rollup("n_name", "c_mktsegment")
        .agg(
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
            F.count(F.lit(1)).alias("n_cust"),
        )
        .select(
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            F.coalesce("c_mktsegment", F.lit("ALL")).alias("segment"),
            "total_bal",
            "n_cust",
        )
    )


@register(
    "agg_having",
    oracle="""
    SELECT l_partkey, count(*) AS n_items, round(sum(l_quantity), 2) AS total_qty
    FROM lineitem
    GROUP BY l_partkey
    HAVING count(*) >= 40
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (HAVING)."""
    return (
        T(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        )
        .filter(F.col("n_items") >= 40)
    )


@register(
    "agg_collect_snapshot",
    oracle="""
    SELECT event_type AS container,
           array_to_string(list_sort(list(DISTINCT CAST(user_id AS VARCHAR))), ',') AS members,
           count(*) AS n
    FROM events
    WHERE value > 99.0
    GROUP BY event_type
    """,
)
def agg_collect_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collect rows into a sorted array (the manifest-snapshot build).

    Reference: walk → array → JSON manifest (bin/cassandra-syncer:92-103).
    The set is sorted and serialized so the result is deterministic (Spark's
    collect order is partition-dependent).  At scale, this per-group array is
    bounded by the group's cardinality — acceptable for manifest-sized
    groups, replaced by a join for unbounded ones.
    """
    ev = T(spark, sf_dir, "events").filter(F.col("value") > 99.0)
    return ev.groupBy(F.col("event_type").alias("container")).agg(
        F.array_join(
            F.sort_array(F.collect_set(F.col("user_id").cast("string"))), ","
        ).alias("members"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "dedup_exact",
    oracle="""
    SELECT etag, name, bytes FROM (
      SELECT md5(p_name) AS etag, p_name AS name, CAST(floor(p_retailprice) AS BIGINT) AS bytes,
             row_number() OVER (PARTITION BY md5(p_name) ORDER BY p_partkey) AS rn
      FROM part
    ) WHERE rn = 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate elimination by content hash (incremental-sync identity).

    Reference: etag/MD5 content identity (storage-object.js:123-124) +
    only-new-files semantics (bin/cassandra-syncer:268-277).  Implemented as
    deterministic keep-first (window row_number, not dropDuplicates, whose
    survivor choice is nondeterministic → not oracle-comparable).
    """
    from pyspark.sql.window import Window

    part = T(spark, sf_dir, "part").select(
        F.md5("p_name").alias("etag"),
        F.col("p_name").alias("name"),
        F.floor("p_retailprice").cast("bigint").alias("bytes"),
        "p_partkey",
    )
    w = Window.partitionBy("etag").orderBy("p_partkey")
    return (
        part.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("etag", "name", "bytes")
    )


# ---------------------------------------------------------------------------
# §2.6 sorts / limits / top-k
# ---------------------------------------------------------------------------


@register(
    "sort_order_by",
    oracle="""
    SELECT s_suppkey, s_name, round(s_acctbal, 2) AS bal
    FROM supplier
    ORDER BY s_name
    """,
)
def sort_order_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total sort by name — the reference's *intended* manifest ordering.

    Reference: manifest name sort (bin/cassandra-syncer-restore:69-71,86).
    NB the JS comparator returns a boolean (a latent bug, SURVEY.md §3); we
    implement the intended ascending-by-name semantics.
    """
    return (
        T(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_name", F.round("s_acctbal", 2).alias("bal"))
        .orderBy("s_name")
    )


@register(
    "topk_limit",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 2) AS price
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def topk_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k: sort + limit → TakeOrderedAndProject (no full sort at scale).

    Reference: take-last-after-sort (bin/cassandra-syncer-restore:87).
    Tie-break on o_orderkey so the k-th row is deterministic.
    """
    return (
        T(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("price"))
    )


@register(
    "max_by_key",
    oracle="""
    SELECT event_type, event_id AS latest_event_id, ts_sec AS latest_ts_sec
    FROM (
      SELECT event_type, event_id, epoch_ns(ts) // 1000000000 AS ts_sec,
             row_number() OVER (
               PARTITION BY event_type
               ORDER BY epoch_ns(ts) // 1000000000 DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def max_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax without a full sort (latest-manifest pick, done right).

    Reference: sort-then-take-last (bin/cassandra-syncer-restore:82-89);
    max_by is a single aggregation pass — at 100 TB the sort would shuffle
    everything, max_by shuffles one row per group.  Ordering key is
    (second-truncated ts, event_id) so ties are deterministic and the
    ns-vs-µs physical difference vs the oracle cannot flip the winner.
    """
    ev = T(spark, sf_dir, "events").withColumn("ts_sec", F.expr("ts_ns div 1000000000"))
    return ev.groupBy("event_type").agg(
        F.max_by("event_id", F.struct("ts_sec", "event_id")).alias("latest_event_id"),
        F.max("ts_sec").alias("latest_ts_sec"),
    )


# ---------------------------------------------------------------------------
# §2.7 set operations
# ---------------------------------------------------------------------------


@register(
    "set_union_all",
    oracle="""
    SELECT c_custkey AS key, c_name AS name, 'customer' AS src FROM customer
    UNION ALL
    SELECT s_suppkey AS key, s_name AS name, 'supplier' AS src FROM supplier
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union of multiple sources (the multi-watch-path concat).

    Reference: [].concat(argv.path) multi-path watch
    (bin/cassandra-syncer:267) with per-path scans (:215-235).
    unionByName so column order can never silently swap.
    """
    cust = T(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("key"), F.col("c_name").alias("name"), F.lit("customer").alias("src")
    )
    supp = T(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("key"), F.col("s_name").alias("name"), F.lit("supplier").alias("src")
    )
    return cust.unionByName(supp)


@register(
    "set_except",
    oracle="""
    SELECT o_custkey AS c FROM orders
    EXCEPT
    SELECT c_custkey AS c FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference (stored − live = prunable set).

    Reference: prune semantics (README.md:23-24, fsck spec).
    """
    ordered = T(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c"))
    building = (
        T(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("c"))
    )
    return ordered.subtract(building)


@register(
    "set_intersect",
    oracle="""
    SELECT l_partkey AS k FROM lineitem WHERE l_quantity > 49
    INTERSECT
    SELECT p_partkey AS k FROM part WHERE p_size > 25
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set intersection (stored ∩ live = keep set).

    Reference: minimum-restore-set semantics (README.md:19-21).
    """
    a = T(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 49).select(F.col("l_partkey").alias("k"))
    b = T(spark, sf_dir, "part").filter(F.col("p_size") > 25).select(F.col("p_partkey").alias("k"))
    return a.intersect(b)


@register(
    "sink_parquet",
    oracle="""
    SELECT r_regionkey, r_name, md5(r_name) AS etag FROM region
    """,
)
def sink_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sink round-trip: write partitioned parquet (idempotent
    overwrite = the reference's re-PUT semantics, core.js:377-418), read it
    back.  ``partitionBy`` keys the layout so downstream restore/prune jobs
    prune partitions instead of scanning everything."""
    import tempfile

    import os
    out = f"{tempfile.gettempdir()}/css_sink_parquet_{os.getpid()}"
    df = T(spark, sf_dir, "region").select(
        "r_regionkey", "r_name", F.md5("r_name").alias("etag")
    )
    df.write.mode("overwrite").partitionBy("r_regionkey").parquet(out)
    # explicit schema: a partitioned write of an EMPTY frame leaves no data
    # files, and schema inference would fail where a declared schema reads
    # an empty frame cleanly (the engine's no-inference rule regardless)
    back = spark.read.schema("r_name string, etag string, r_regionkey int").parquet(out)
    # partition column comes back typed per partition-inference; restore it
    return back.select(
        F.col("r_regionkey").cast("int").alias("r_regionkey"), "r_name", "etag"
    )


@register(
    "agg_cube",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           count(*) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cube (all grouping-set combinations) with NULL-marker normalization —
    completes the rollup/cube/grouping-sets family next to agg_rollup."""
    orders = T(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
            "total",
        )
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT)
             AS grp_id,
           count(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with grouping_id — the general form under
    rollup/cube, plus the bitmask that distinguishes 'NULL value' from
    'aggregated-out dimension'."""
    T(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT)
                 AS grp_id,
               count(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )
