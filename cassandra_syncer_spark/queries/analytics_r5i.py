"""Round-5 batch 9: SQL-surface gaps — full-outer reconciliation,
ordered string aggregation, null-safe comparison semantics, and the
binaryFile source as a registered query.

`join_full_outer_reconcile` is the sync-domain reconciliation report
(stored vs live, README.md:19-28 of the reference: restore = intersect,
prune = stored-only, backup backlog = live-only) expressed as ONE full
outer join instead of three passes.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_syncer_spark.queries.relational import T
from cassandra_syncer_spark.registry import register

# ---------------------------------------------------------------------------
# join_full_outer_reconcile — stored vs live in one pass
# ---------------------------------------------------------------------------


@register(
    "join_full_outer_reconcile",
    oracle="""
    WITH stored AS (SELECT o_orderkey, o_totalprice FROM orders
                    WHERE o_orderkey % 5 <> 0),
    live AS (SELECT o_orderkey, o_totalprice FROM orders
             WHERE o_orderkey % 7 <> 0)
    SELECT CASE WHEN s.o_orderkey IS NULL THEN 'only_live'
                WHEN l.o_orderkey IS NULL THEN 'only_stored'
                ELSE 'both' END AS status,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(coalesce(s.o_totalprice, l.o_totalprice)), 2) AS total_price
    FROM stored s FULL OUTER JOIN live l ON s.o_orderkey = l.o_orderkey
    GROUP BY 1 ORDER BY status
    """,
)
def join_full_outer_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set reconciliation in ONE pass: stored ⟗ live on the key, rows
    classified both / only_stored (= prunable, the reference's fsck set)
    / only_live (= backup backlog) — the full-outer join completing
    §2.3's outer family (left outer: `join_left_outer`), replacing the
    three separate semi/anti/intersect passes a naive reconciler runs.

    Scale shape: one key-partitioned join (both sides shuffle once on
    the key; sort-merge at scale), classification is a projection over
    the join's null pattern, and the report agg is 3 keys.
    """
    orders = T(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    stored = orders.filter(F.col("o_orderkey") % 5 != 0).alias("s")
    live = orders.filter(F.col("o_orderkey") % 7 != 0).alias("l")
    joined = stored.join(
        live, F.col("s.o_orderkey") == F.col("l.o_orderkey"), "full_outer"
    )
    status = (
        F.when(F.col("s.o_orderkey").isNull(), "only_live")
        .when(F.col("l.o_orderkey").isNull(), "only_stored")
        .otherwise("both")
    )
    return (
        joined.select(
            status.alias("status"),
            F.coalesce(F.col("s.o_totalprice"), F.col("l.o_totalprice")).alias("p"),
        )
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.sum("p"), 2).alias("total_price"),
        )
        .orderBy("status")
    )


# ---------------------------------------------------------------------------
# agg_string_agg — ordered string aggregation
# ---------------------------------------------------------------------------


@register(
    "agg_string_agg",
    oracle="""
    SELECT r.r_name AS region,
           CAST(count(*) AS BIGINT) AS n_nations,
           string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name ORDER BY region
    """,
)
def agg_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG/string_agg): nations per
    region as one comma-joined, lexically-ordered string — the report
    column every BI layer asks for.  Determinism matters: collect_list
    order is partition-dependent, so the engine sorts the collected
    array BEFORE joining (`array_join(array_sort(...))`), which is what
    makes the output hash-stable and equal to the oracle's
    `ORDER BY`-qualified string_agg.

    Scale shape: one hash agg; the collected groups are dimension-sized
    here — for unbounded groups at 100 TB, cap with `slice(array_sort(
    collect_list(x)), 1, K)` (top-K listing) or pre-aggregate, since an
    unbounded collect is the same single-row blowup hazard as any
    collect_list (see the minhash pair-expansion lesson).
    """
    nation = T(spark, sf_dir, "nation")
    region = T(spark, sf_dir, "region")
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nations"),
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"),
        )
        .orderBy("region")
    )


# ---------------------------------------------------------------------------
# cond_null_safe — null-safe comparison semantics
# ---------------------------------------------------------------------------


@register(
    "cond_null_safe",
    oracle="""
    WITH s AS (
      SELECT event_type,
             CASE WHEN event_id % 3 = 0 THEN NULL
                  ELSE CAST(round(value * 100.0) AS BIGINT) % 10 END AS x,
             CASE WHEN event_id % 5 = 0 THEN NULL
                  ELSE CAST(round(value * 100.0) AS BIGINT) % 10 END AS y
      FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(CASE WHEN x IS NOT DISTINCT FROM y THEN 1 END) AS BIGINT)
             AS n_nullsafe_eq,
           CAST(count(CASE WHEN x IS DISTINCT FROM y THEN 1 END) AS BIGINT)
             AS n_distinct,
           CAST(count(CASE WHEN x IS NULL AND y IS NULL THEN 1 END) AS BIGINT)
             AS n_both_null,
           CAST(sum(coalesce(x, y, -1)) AS BIGINT) AS sum_coalesced
    FROM s GROUP BY event_type ORDER BY event_type
    """,
)
def cond_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe comparison semantics — the SQL corner every CDC/merge
    pipeline trips over: `<=>` (IS NOT DISTINCT FROM) treats NULL=NULL
    as TRUE where `=` yields NULL, and change detection built on plain
    equality silently drops NULL↔NULL and NULL↔value transitions.  The
    query tabulates null-safe equality, IS DISTINCT FROM, both-null, and
    coalesce-fallback sums per event type over a deterministically
    NULL-injected pair of columns.

    Scale shape: pure scan + one tiny-key agg — the point is semantics
    parity (Spark `<=>` ≡ DuckDB `IS NOT DISTINCT FROM`), proven by the
    hash match.
    """
    vc = F.round(F.col("value") * 100.0).cast("long") % 10
    s = T(spark, sf_dir, "events").select(
        "event_type",
        F.when(F.col("event_id") % 3 == 0, None).otherwise(vc).alias("x"),
        F.when(F.col("event_id") % 5 == 0, None).otherwise(vc).alias("y"),
    )
    return (
        s.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.count(F.when(F.expr("x <=> y"), 1)).cast("long").alias("n_nullsafe_eq"),
            F.count(F.when(~F.expr("x <=> y"), 1)).cast("long").alias("n_distinct"),
            F.count(F.when(F.col("x").isNull() & F.col("y").isNull(), 1))
            .cast("long")
            .alias("n_both_null"),
            F.sum(F.coalesce("x", "y", F.lit(-1))).cast("long").alias("sum_coalesced"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# scan_binaryfile — opaque binary source with content identity
# ---------------------------------------------------------------------------


@register(
    "scan_binaryfile",
    oracle="""
    SELECT doc_id,
           -- byte length of the UTF-8 encoding, not the char count: the
           -- Spark side reports binaryFile's on-disk length, so the
           -- parity must not assume an ASCII-only fixture
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS etag
    FROM documents WHERE doc_id % 25 = 0 AND text IS NOT NULL
    ORDER BY doc_id
    """,
)
def scan_binaryfile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal ingestion front door: opaque files read via
    Spark's `binaryFile` source — (path, length, content) per file, no
    parsing — with md5 content identity computed distributed, exactly
    the reference's etag convention (storage-object.js:123-124).  A
    sample of documents is staged as real files; the query proves the
    binary round-trip is byte-faithful (length and md5 match the
    source rows the oracle computes directly).

    Scale shape: binaryFile is a distributed listing + per-file read —
    each file is one row in one task, so 100 TB of media ingests as an
    embarrassingly parallel scan (`pathGlobFilter` prunes by extension,
    `recursiveFileLookup` walks nested stores); md5 runs JVM-side on
    the binary column.  Payloads then flow into the mapInPandas decode
    plumbing (operators/multimodal.py) without touching the driver.
    """
    out = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_sinks",
        f"binfiles-{os.path.basename(os.path.normpath(sf_dir))}"
        f"-{spark.sparkContext.applicationId}",
    )
    os.makedirs(out, exist_ok=True)
    sample = (
        T(spark, sf_dir, "documents")
        # NULL text = no content object to stage (both sides skip it)
        .filter((F.col("doc_id") % 25 == 0) & F.col("text").isNotNull())
        .select("doc_id", "text")
        .collect()
    )
    for r in sample:  # stage once per app: tiny doc sample as real files
        fp = os.path.join(out, f"doc_{r.doc_id}.txt")
        if not os.path.exists(fp):
            with open(fp, "w", encoding="utf-8") as fh:
                fh.write(r.text)
    back = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.txt")
        .load(out)
    )
    return (
        back.select(
            F.regexp_extract(F.col("path"), r"doc_(\d+)\.txt$", 1)
            .cast("long")
            .alias("doc_id"),
            F.col("length").cast("long").alias("n_bytes"),
            F.md5("content").alias("etag"),
        )
        .orderBy("doc_id")
    )
