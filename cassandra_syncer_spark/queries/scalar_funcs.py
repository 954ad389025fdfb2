"""Scalar function surface — SURVEY.md §2.8.

Reference provenance: path join/basename string ops
(``bin/cassandra-syncer:93-95,188-190``), Date.now() epoch keys + 21-day
prune interval (``bin/cassandra-syncer:104``, ``README.md:26-28``),
getRandomInt (``bin/cassandra-syncer:27-29``), etag content hashes
(``storage-object.js:123-124``), manifest array iteration
(``bin/cassandra-syncer-restore:96``), JSON encode/decode
(``bin/cassandra-syncer:103``).

Engine-parity notes (learned the hard way, see git history):
- double→int casts: Spark truncates, DuckDB rounds → always explicit floor;
- integer sums in DuckDB come back HUGEINT → cast to BIGINT in oracles;
- rand() is banned in checked queries (nondeterministic across engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_syncer_spark.queries.relational import T
from cassandra_syncer_spark.registry import register


@register(
    "str_funcs",
    oracle="""
    SELECT p_partkey,
           lower(p_name) AS lname,
           length(p_name) AS name_len,
           substring(p_type, 1, 5) AS type_prefix,
           concat(p_brand, '/', p_type) AS brand_path,
           string_split(p_name, ' ')[1] AS first_word,
           CAST(len(string_split(p_name, ' ')) AS BIGINT)  AS n_words,
           regexp_extract(p_type, '([A-Z]+)', 1) AS type_word,
           CASE WHEN contains(p_name, 'green') THEN 1 ELSE 0 END AS has_green
    FROM part
    """,
)
def str_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String functions: case, length, substring, concat, split, regex,
    contains — the reference's path-manipulation surface, vectorized."""
    part = T(spark, sf_dir, "part")
    words = F.split("p_name", " ")
    return part.select(
        "p_partkey",
        F.lower("p_name").alias("lname"),
        F.length("p_name").cast("long").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.concat("p_brand", F.lit("/"), "p_type").alias("brand_path"),
        words.getItem(0).alias("first_word"),
        F.size(words).cast("long").alias("n_words"),
        F.regexp_extract("p_type", "([A-Z]+)", 1).alias("type_word"),
        F.when(F.col("p_name").contains("green"), 1).otherwise(0).alias("has_green"),
    )


@register(
    "date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT) AS order_year,
           CAST(month(o_orderdate) AS BIGINT) AS order_month,
           CAST(dayofweek(o_orderdate) AS BIGINT) AS order_dow,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           CAST(datediff('day', o_orderdate, TIMESTAMP '2001-08-01 00:00:00') AS BIGINT)
             AS age_days,
           CASE WHEN o_orderdate < TIMESTAMP '2001-08-01 00:00:00' - INTERVAL 21 DAY
                THEN 1 ELSE 0 END AS prunable
    FROM orders
    """,
)
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time functions incl. the reference's ``--older-than N days``
    prune predicate (README.md:26-28: 21-day retention).

    DuckDB dayofweek is 0=Sunday; Spark's is 1=Sunday → normalize with -1.
    """
    orders = T(spark, sf_dir, "orders")
    cutoff = F.lit("2001-08-01 00:00:00").cast("timestamp")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        (F.dayofweek("o_orderdate") - 1).cast("long").alias("order_dow"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        F.datediff(cutoff, F.col("o_orderdate")).cast("long").alias("age_days"),
        F.when(F.col("o_orderdate") < cutoff - F.expr("INTERVAL 21 DAYS"), 1)
        .otherwise(0)
        .alias("prunable"),
    )


@register(
    "math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
           round(abs(l_extendedprice - l_quantity * 1000.0), 2) AS abs_diff,
           CAST(l_orderkey % 7 AS BIGINT) AS key_mod,
           round(sqrt(l_quantity), 4) AS qty_sqrt,
           round(ln(l_extendedprice), 4) AS price_ln,
           round(power(l_discount, 2), 6) AS disc_sq
    FROM lineitem
    """,
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math functions (floor/ceil/abs/mod/sqrt/ln/power).

    The reference's getRandomInt (bin/cassandra-syncer:27-29) is represented
    by deterministic arithmetic — rand() is banned in checked queries.
    """
    li = T(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.floor("l_extendedprice").cast("long").alias("price_floor"),
        F.ceil("l_extendedprice").cast("long").alias("price_ceil"),
        F.round(F.abs(F.col("l_extendedprice") - F.col("l_quantity") * 1000.0), 2).alias("abs_diff"),
        (F.col("l_orderkey") % 7).cast("long").alias("key_mod"),
        F.round(F.sqrt("l_quantity"), 4).alias("qty_sqrt"),
        F.round(F.log("l_extendedprice"), 4).alias("price_ln"),
        F.round(F.pow("l_discount", 2), 6).alias("disc_sq"),
    )


@register(
    "hash_funcs",
    oracle="""
    SELECT c_custkey,
           md5(c_name) AS name_md5,
           sha256(c_name) AS name_sha256,
           md5(concat(c_name, '|', CAST(c_custkey AS VARCHAR))) AS row_etag
    FROM customer
    """,
)
def hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content hashes — the reference's etag identity (storage-object.js:
    123-124).  md5 + sha256 match across engines; xxhash64 (Spark-only,
    used internally for shuffle-cheap keys) is exercised in unit tests."""
    cust = T(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.md5("c_name").alias("name_md5"),
        F.sha2("c_name", 256).alias("name_sha256"),
        F.md5(F.concat("c_name", F.lit("|"), F.col("c_custkey").cast("string"))).alias("row_etag"),
    )


@register(
    "array_funcs",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS words FROM documents
    )
    SELECT doc_id,
           CAST(len(words) AS BIGINT) AS n_words,
           words[1] AS first_word,
           words[-1] AS last_word,
           array_to_string(words[1:3], '-') AS first3,
           CASE WHEN list_contains(words, 'spark') THEN 1 ELSE 0 END AS has_spark
    FROM t
    """,
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array functions: size / index / slice / contains / join — the
    reference iterates manifest path arrays the same way
    (bin/cassandra-syncer-restore:96)."""
    docs = T(spark, sf_dir, "documents")
    words = F.split("text", " ")
    return docs.select(
        "doc_id",
        F.size(words).cast("long").alias("n_words"),
        words.getItem(0).alias("first_word"),
        F.element_at(words, -1).alias("last_word"),
        F.array_join(F.slice(words, 1, 3), "-").alias("first3"),
        F.when(F.array_contains(words, "spark"), 1).otherwise(0).alias("has_spark"),
    )


@register(
    "json_funcs",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
           CAST(max(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON decode + aggregate over the decoded field.

    Reference: JSON.parse/stringify of manifests (bin/cassandra-syncer:103,
    restore:95).  from_json with explicit schema — the JSON never leaves
    the JVM."""
    ev = T(spark, sf_dir, "events")
    k = F.from_json("props", "struct<k:int>").getField("k")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").cast("long").alias("sum_k"),
            F.max("k").cast("long").alias("max_k"),
        )
    )


@register(
    "map_funcs",
    oracle="""
    SELECT event_id, event_type,
           CASE event_type
             WHEN 'click' THEN 1 WHEN 'view' THEN 2 WHEN 'purchase' THEN 10
             WHEN 'signup' THEN 5 ELSE 0 END AS weight,
           round(value * CASE event_type
             WHEN 'click' THEN 1 WHEN 'view' THEN 2 WHEN 'purchase' THEN 10
             WHEN 'signup' THEN 5 ELSE 0 END, 2) AS weighted_value
    FROM events
    """,
)
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map create/lookup: a broadcast-literal weight map applied per row.

    Reference-analog: header-map lookups (core.js:403-413).  The map literal
    stays JVM-side (create_map of literals); the oracle expresses the same
    lookup as CASE because DuckDB map indexing semantics differ."""
    ev = T(spark, sf_dir, "events")
    weights = F.create_map(
        F.lit("click"), F.lit(1),
        F.lit("view"), F.lit(2),
        F.lit("purchase"), F.lit(10),
        F.lit("signup"), F.lit(5),
    )
    weight = F.coalesce(F.element_at(weights, F.col("event_type")), F.lit(0))
    return ev.select(
        "event_id",
        "event_type",
        weight.alias("weight"),
        F.round(F.col("value") * weight, 2).alias("weighted_value"),
    )


@register(
    "cond_funcs",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 200000 THEN 'high'
                WHEN o_totalprice >= 100000 THEN 'mid'
                ELSE 'low' END AS price_band,
           coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_norm,
           CASE WHEN o_orderstatus = 'F' THEN round(o_totalprice, 2) END AS finished_price,
           CAST(o_orderstatus = 'F' AS INTEGER) AS is_finished
    FROM orders
    """,
)
def cond_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditionals: case/when bands, coalesce/nullif, null-preserving
    projection — the reference's skip/full-backup flag logic
    (bin/cassandra-syncer:113-139,154-176) declaratively."""
    orders = T(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 200000, "high")
        .when(F.col("o_totalprice") >= 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("OPEN")).alias("status_norm"),
        F.when(F.col("o_orderstatus") == "F", F.round("o_totalprice", 2)).alias("finished_price"),
        (F.col("o_orderstatus") == "F").cast("int").alias("is_finished"),
    )
