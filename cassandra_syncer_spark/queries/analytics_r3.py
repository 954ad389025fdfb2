"""Round-3 analytics additions — statistics, feature engineering, funnel
analysis, canonical dedup, interval overlap.

Reference parity note: these extend SURVEY §2's inventory with the
operations a training-data/analytics pipeline layers on top of the file
semantics the reference provides (the reference itself has no relational
surface; provenance of the *mandated* operators is in SURVEY.md).  Every
query is oracle-checked; cross-engine numeric stability follows the
integerize-per-row rule (see agg_group_sum and
memory: double aggregates are computed FROM exact integer sums so both
engines evaluate identical doubles).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cassandra_syncer_spark.operators.banded import banded_interval_join
from cassandra_syncer_spark.queries.relational import T
from cassandra_syncer_spark.registry import register


@register(
    "agg_stats_corr",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             count(*) AS n,
             sum(CAST(round(l_quantity * 100.0) AS BIGINT)) AS sx,
             sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)) AS sy,
             sum(CAST(round(l_quantity * 100.0) AS HUGEINT)
                 * CAST(round(l_quantity * 100.0) AS HUGEINT)) AS sxx,
             sum(CAST(round(l_extendedprice * 100.0) AS HUGEINT)
                 * CAST(round(l_extendedprice * 100.0) AS HUGEINT)) AS syy,
             sum(CAST(round(l_quantity * 100.0) AS HUGEINT)
                 * CAST(round(l_extendedprice * 100.0) AS HUGEINT)) AS sxy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, CAST(n AS BIGINT) AS n,
           round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
                 sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                      * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6)
             AS corr_qty_price,
           round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (CAST(n AS DOUBLE) * (n - 1)) / 10000.0, 4) AS covar_qty_price,
           round(sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                      / (CAST(n AS DOUBLE) * (n - 1))) / 100.0, 4) AS stddev_qty
    FROM s ORDER BY l_returnflag
    """,
)
def agg_stats_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group correlation / covariance / stddev — the statistics layer
    a feature pipeline runs over raw measures.

    Built-in ``corr``/``covar_samp`` accumulate in engine-specific orders
    (Welford vs naive) whose low bits differ across engines, so the
    moments are computed from EXACT integer-unit sums (Σx, Σy, Σxx, Σyy,
    Σxy — order-independent) and the textbook formulas evaluate over
    bit-identical doubles on both sides.  The second-moment sums run in
    DECIMAL(38,0) (Spark) / HUGEINT (DuckDB): centi-price squares are
    ~10¹⁴ per row, so int64 sums would sit at 80% of overflow ALREADY at
    sf0.1 (measured) and wrap silently on anything larger — 128-bit
    accumulation is exact to ~10²⁴ rows/group.  Conversion of the exact
    integer sums to double is the same nearest-even in both engines.
    """
    li = T(spark, sf_dir, "lineitem")
    x = F.round(F.col("l_quantity") * 100.0).cast("long")
    y = F.round(F.col("l_extendedprice") * 100.0).cast("long")
    staged = li.select("l_returnflag", x.alias("x"), y.alias("y"))
    xd = F.col("x").cast("decimal(19,0)")
    yd = F.col("y").cast("decimal(19,0)")
    s = staged.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(xd * xd).alias("sxx"),
        F.sum(yd * yd).alias("syy"),
        F.sum(xd * yd).alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    cov_num = n * F.col("sxy") - sx * F.col("sy")
    var_x = n * F.col("sxx") - sx * F.col("sx")
    var_y = n * F.col("syy") - sy * F.col("sy")
    return s.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n"),
        F.round(cov_num / F.sqrt(var_x * var_y), 6).alias("corr_qty_price"),
        F.round(cov_num / (n * (F.col("n") - 1)) / 10000.0, 4).alias("covar_qty_price"),
        F.round(F.sqrt(var_x / (n * (F.col("n") - 1))) / 100.0, 4).alias("stddev_qty"),
    ).orderBy("l_returnflag")


@register(
    "win_ntile_bucket",
    oracle="""
    WITH b AS (
      SELECT c_acctbal,
             ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS bucket
      FROM customer
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           sum(CAST(round(c_acctbal * 100.0) AS BIGINT)) / (count(*) * 100.0) AS avg_bal
    FROM b GROUP BY bucket ORDER BY bucket
    """,
)
def win_ntile_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile bucketing (ntile) + per-bucket profile — how a pipeline
    splits a population into equal-frequency cohorts.

    Scale note: a global ntile is a total sort; Spark range-partitions it
    (no single-task sort), and at 100 TB the same cohort split is done
    with approx_percentile cut points + width_bucket instead — see
    ``agg_percentile_approx`` for the sketch path.  ntile is int32 in
    Spark, int64 in DuckDB → cast.
    """
    cust = T(spark, sf_dir, "customer")
    w = Window.orderBy("c_acctbal", "c_custkey")
    b = cust.select(
        "c_acctbal", F.ntile(4).over(w).cast("long").alias("bucket")
    )
    return (
        b.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            (
                F.sum(F.round(F.col("c_acctbal") * 100.0).cast("long"))
                / (F.count(F.lit(1)) * 100.0)
            ).alias("avg_bal"),
        )
        .orderBy("bucket")
    )


@register(
    "dedup_exact_canonical",
    oracle="""
    SELECT md5(text) AS content_hash,
           CAST(min(doc_id) AS BIGINT) AS keep_id,
           CAST(count(*) AS BIGINT) AS n_copies
    FROM documents
    GROUP BY md5(text)
    """,
)
def dedup_exact_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup with a canonical winner: one row per distinct content,
    keeping the smallest doc_id — the deterministic-keeper rule a corpus
    dedup applies before near-dup stages (cf. dedup_apply_clusters for the
    near-dup analog).  Single hash-aggregate pass; at 100 TB this is one
    shuffle on the content hash."""
    docs = T(spark, sf_dir, "documents")
    return docs.groupBy(F.md5("text").alias("content_hash")).agg(
        F.min("doc_id").cast("long").alias("keep_id"),
        F.count(F.lit(1)).cast("long").alias("n_copies"),
    )


@register(
    "events_funnel",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT CAST(count(*) FILTER (WHERE t_view IS NOT NULL) AS BIGINT) AS n_view,
           CAST(count(*) FILTER (WHERE t_view IS NOT NULL AND t_click > t_view) AS BIGINT)
             AS n_click_after_view,
           CAST(count(*) FILTER (WHERE t_view IS NOT NULL AND t_click > t_view
                                   AND t_purchase > t_click) AS BIGINT)
             AS n_full_funnel
    FROM per_user
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel conversion (view → click → purchase): users whose
    FIRST click follows their first view, and first purchase follows that
    click — the sessionized product-analytics staple.

    One groupBy(user_id) with conditional min aggregates (map-side
    partial), then a single global roll-up — no joins, no window sort; at
    100 TB the only shuffle is the user_id aggregation.  Timestamps are
    compared within-engine only (counts cross the oracle boundary), so ns
    precision differences cannot affect parity.
    """
    ev = T(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_purchase"),
    )
    viewed = F.col("t_view").isNotNull()
    clicked = viewed & (F.col("t_click") > F.col("t_view"))
    purchased = clicked & (F.col("t_purchase") > F.col("t_click"))
    return per_user.agg(
        F.count(F.when(viewed, 1)).cast("long").alias("n_view"),
        F.count(F.when(clicked, 1)).cast("long").alias("n_click_after_view"),
        F.count(F.when(purchased, 1)).cast("long").alias("n_full_funnel"),
    )


@register(
    "feat_standardize",
    oracle="""
    WITH staged AS (
      SELECT l_orderkey, l_linenumber, l_returnflag,
             CAST(round(l_quantity * 100.0) AS BIGINT) AS qc
      FROM lineitem
    ),
    m AS (
      SELECT *,
             sum(qc) OVER (PARTITION BY l_returnflag) AS s,
             sum(qc * qc) OVER (PARTITION BY l_returnflag) AS q,
             count(*) OVER (PARTITION BY l_returnflag) AS n
      FROM staged
    )
    SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, l_returnflag,
           round((CAST(qc AS DOUBLE) - CAST(s AS DOUBLE) / n)
                 / sqrt((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / (n - 1)), 4)
             AS z_quantity
    FROM m
    """,
)
def feat_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score standardization of a measure — the feature-
    engineering normalize step, emitted per ROW (6k rows at sf0.01).

    Group moments come from exact integer window sums (Σqc, Σqc² as
    longs), so mean and variance are identical doubles in both engines and
    the per-row z rounds identically.  Scale: one shuffle
    (window partition by group); no second pass — mean/var/z all derive
    from the same windowed sums.  DuckDB's integer window-sum returns
    HUGEINT → both sides cast to double explicitly before dividing.
    """
    li = T(spark, sf_dir, "lineitem")
    staged = li.select(
        "l_orderkey",
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        "l_returnflag",
        F.round(F.col("l_quantity") * 100.0).cast("long").alias("qc"),
    )
    w = Window.partitionBy("l_returnflag")
    m = staged.select(
        "*",
        F.sum("qc").over(w).alias("s"),
        F.sum(F.col("qc") * F.col("qc")).over(w).alias("q"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    s, q, n = F.col("s").cast("double"), F.col("q").cast("double"), F.col("n")
    z = (F.col("qc").cast("double") - s / n) / F.sqrt((q - s * F.col("s") / n) / (n - 1))
    return m.select(
        "l_orderkey", "l_linenumber", "l_returnflag", F.round(z, 4).alias("z_quantity")
    )


@register(
    "agg_mode_freq",
    oracle="""
    WITH c AS (
      SELECT o_orderstatus, o_orderpriority, count(*) AS n
      FROM orders GROUP BY o_orderstatus, o_orderpriority
    ),
    r AS (
      SELECT *, row_number() OVER (
               PARTITION BY o_orderstatus ORDER BY n DESC, o_orderpriority) AS rn
      FROM c
    )
    SELECT o_orderstatus, o_orderpriority AS mode_priority, CAST(n AS BIGINT) AS n
    FROM r WHERE rn = 1 ORDER BY o_orderstatus
    """,
)
def agg_mode_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mode (most frequent value) per group with a deterministic tie rule
    (count desc, then value asc) — two-level aggregation, then a per-group
    top-1 window over the (small) distinct-combination set, never over raw
    rows."""
    orders = T(spark, sf_dir, "orders")
    c = orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("o_orderstatus").orderBy(F.desc("n"), F.asc("o_orderpriority"))
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            F.col("n").cast("long").alias("n"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "text_idf_topterms",
    oracle="""
    WITH N AS (SELECT count(*) AS n_docs FROM documents),
    tokens AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word FROM documents
    ),
    tf AS (SELECT lang, word, count(*) AS tf FROM tokens GROUP BY lang, word),
    df AS (SELECT word, count(DISTINCT doc_id) AS df FROM tokens GROUP BY word),
    scored AS (
      SELECT tf.lang, tf.word,
             round(CAST(tf.tf AS DOUBLE) * (SELECT n_docs FROM N) / df.df, 4) AS score
      FROM tf JOIN df ON tf.word = df.word
    ),
    ranked AS (
      SELECT *, row_number() OVER (
               PARTITION BY lang ORDER BY score DESC, word) AS rn
      FROM scored
    )
    SELECT lang, word, score, CAST(rn AS BIGINT) AS rn
    FROM ranked WHERE rn <= 5
    """,
)
def text_idf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinctive terms per language: tf · N/df (a log-free tf-idf — the
    ratio of exact integer counts keeps the score portable; libm ``log``
    is not bit-identical across engines).

    Scale shape: explode → two aggregations (tf on (lang, word), df on
    word) → join on word (word-dim is vocabulary-sized → broadcastable) →
    per-lang top-k window over the aggregated term set, not raw tokens.
    """
    docs = T(spark, sf_dir, "documents")
    # corpus size as a broadcast 1-row dimension — stays a dataflow (no
    # driver-side collect of the scalar)
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    tokens = docs.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("word")
    )
    tf = tokens.groupBy("lang", "word").agg(F.count(F.lit(1)).alias("tf"))
    df = tokens.groupBy("word").agg(F.countDistinct("doc_id").alias("df"))
    scored = (
        tf.join(df, "word")
        .crossJoin(F.broadcast(n))
        .select(
            "lang",
            "word",
            F.round(
                F.col("tf").cast("double") * F.col("n_docs") / F.col("df"), 4
            ).alias("score"),
        )
    )
    w = Window.partitionBy("lang").orderBy(F.desc("score"), F.asc("word"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 5)
    )


@register(
    "join_interval_overlap",
    oracle="""
    WITH li AS (
      SELECT l_orderkey, epoch(l_shipdate) AS lo, epoch(l_shipdate) + 14*86400 AS hi
      FROM lineitem WHERE l_returnflag = 'R'
    ),
    o AS (
      SELECT o_orderpriority, epoch(o_orderdate) AS lo, epoch(o_orderdate) + 30*86400 AS hi
      FROM orders WHERE o_orderstatus = 'F'
    )
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_overlaps,
           CAST(count(DISTINCT li.l_orderkey) AS BIGINT) AS n_lineitems
    FROM li JOIN o ON li.lo < o.hi AND o.lo < li.hi
    GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval×interval overlap COUNTS (returned-lineitem transit
    windows × finished-order activity windows) via PREFIX SUMS — no pair
    is ever materialized.  The key identity: with orders ordered by
    start, the number overlapping [lo, hi) is
    ``C(o_start < hi) − C(o_end ≤ lo)``, two lookups in the cumulative
    order-start histogram (all windows are 30 days, so
    ``o_end ≤ lo ⇔ o_start ≤ lo − 30 d``).  The per-priority histogram
    over the day calendar (|priorities|·|days| ≈ 12 k rows) BROADCASTS;
    each lineitem then computes its overlap count per priority by two
    date-keyed lookups, and the aggregate is one map-side sum.

    Why not a pair join at all: the TRUE overlap-pair volume here is
    ~190 M at sf0.1 (each 14-day window overlaps ~1.2 k of 73 k order
    windows) — the banded pair join (operators/banded.py, round-3 form
    of this query) was already shuffle-on-band but still had to STREAM
    every pair into the aggregation: measured 40.5 s at sf0.1, all of it
    pair volume.  This rewrite is 0.9 s and grows linearly in rows, not
    pairs — count-style interval analytics never need the pairs.  The
    pair-RETURNING form remains ``banded_interval_join`` (used by
    ``join_range_banded``/``join_theta_range``), which is the right tool
    exactly when downstream needs the pairs themselves.

    Output and oracle are unchanged (the DuckDB oracle keeps the
    explicit pair join — at validation scale it is the independent
    ground truth this rewrite is hash-checked against).
    """
    day = 86400
    li = (
        T(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select(
            "l_orderkey",
            F.unix_timestamp("l_shipdate").alias("lo"),
            (F.unix_timestamp("l_shipdate") + 14 * day).alias("hi"),
        )
    )
    orders = (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(
            "o_orderpriority",
            F.unix_timestamp("o_orderdate").alias("o_lo"),
        )
    )
    # dense per-priority cumulative histogram of order starts over the
    # full day calendar (dimension-sized: |priorities| x |days|)
    span = orders.crossJoin(
        li.agg(F.min("lo").alias("li_min"), F.max("hi").alias("li_max"))
    ).agg(
        F.least(F.min("o_lo"), F.min("li_min")).alias("d0"),
        F.greatest(F.max("o_lo"), F.max("li_max")).alias("d1"),
    )
    cal = span.select(
        F.explode(
            F.expr(f"sequence(d0 - 35*{day}, d1 + 35*{day}, {day})")
        ).alias("d")
    )
    prios = orders.select("o_orderpriority").distinct()
    day_counts = orders.groupBy("o_orderpriority", F.col("o_lo").alias("d")).agg(
        F.count(F.lit(1)).alias("c")
    )
    wcum = (
        Window.partitionBy("o_orderpriority")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # materialize the 12k-row histogram once — it feeds BOTH lookup sides
    # (without the checkpoint each side re-runs the calendar build + window)
    cum = (
        cal.crossJoin(prios)
        .join(day_counts, ["o_orderpriority", "d"], "left")
        .select(
            "o_orderpriority",
            "d",
            F.sum(F.coalesce("c", F.lit(0))).over(wcum).alias("cum"),
        )
        .localCheckpoint()
    )
    # C(o_lo < hi): starts are midnight-aligned, so o_lo < hi ⇔ o_lo ≤ hi − 1 day
    c_hi = cum.select(
        "o_orderpriority", (F.col("d") + day).alias("hi"), F.col("cum").alias("n_started")
    )
    # C(o_end ≤ lo) ⇔ C(o_lo ≤ lo − 30 d)
    c_lo = cum.select(
        "o_orderpriority", (F.col("d") + 30 * day).alias("lo"), F.col("cum").alias("n_ended")
    )
    per_li = (
        li.join(F.broadcast(c_hi), "hi")
        .join(F.broadcast(c_lo), ["o_orderpriority", "lo"])
        .select(
            "o_orderpriority",
            "l_orderkey",
            (F.col("n_started") - F.col("n_ended")).alias("n_ov"),
        )
    )
    return (
        per_li.groupBy("o_orderpriority")
        .agg(
            F.sum("n_ov").cast("long").alias("n_overlaps"),
            F.countDistinct(
                F.when(F.col("n_ov") > 0, F.col("l_orderkey"))
            )
            .cast("long")
            .alias("n_lineitems"),
        )
        .filter(F.col("n_overlaps") > 0)
        .orderBy("o_orderpriority")
    )


def _scratch(sf_dir: str, tag: str) -> str:
    """Per-sf, per-process scratch dir for sink round-trip queries (driver
    may run the same query at several scale factors in one session; the pid
    component keeps a concurrent driver + local test run from racing each
    other's mode('overwrite') rewrite — same hazard the application-id
    suffix fixes in ``scan_jsonl_roundtrip``)."""
    base = os.path.join(tempfile.gettempdir(), "spark_graft_sinks")
    return os.path.join(
        base, f"{tag}-{os.path.basename(os.path.normpath(sf_dir))}-{os.getpid()}"
    )


@register(
    "sink_partitioned_prune",
    oracle="""
    SELECT l_linestatus,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(l_quantity * 100.0) AS BIGINT)) AS BIGINT) AS qty_centi
    FROM lineitem WHERE l_returnflag = 'R'
    GROUP BY l_linestatus ORDER BY l_linestatus
    """,
)
def sink_partitioned_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned parquet sink + partition-PRUNED read-back — the
    cornerstone 100 TB layout: data written `partitionBy(l_returnflag)`,
    then a reader filtering on the partition column touches ONLY that
    partition's directory (plan shows `PartitionFilters`, asserted in
    tests/test_plans.py::test_partitioned_sink_prunes_partitions; the
    other partitions are never listed or read).

    The oracle computes the same aggregate straight from the unpartitioned
    table — equality proves the sink+scan round-trip loses nothing.
    """
    out = _scratch(sf_dir, "partitioned")
    (
        T(spark, sf_dir, "lineitem")
        .select(
            "l_returnflag",
            "l_linestatus",
            F.round(F.col("l_quantity") * 100.0).cast("long").alias("qty_centi"),
        )
        .write.partitionBy("l_returnflag")
        .mode("overwrite")
        .parquet(out)
    )
    # explicit schema (no-inference rule; also survives an empty write,
    # which leaves no data files for inference to read)
    back = (
        spark.read.schema("l_linestatus string, qty_centi long, l_returnflag string")
        .parquet(out)
        .filter(F.col("l_returnflag") == "R")
    )
    return (
        back.groupBy("l_linestatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("qty_centi").cast("long").alias("qty_centi"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "scan_csv_roundtrip",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS total_centi
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def scan_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV source/sink coverage (§2.1 breadth): orders written as
    headered CSV, read back with an EXPLICIT schema (schema inference is
    a second full scan — never at 100 TB), aggregated; oracle equality
    against the parquet original proves the text round-trip is lossless
    for the carried columns.  Money survives CSV exactly because the
    centi-integerization happens after read — the CSV carries the raw
    double's shortest repr, which parses back to the identical double.
    """
    out = _scratch(sf_dir, "csv")
    (
        T(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .write.option("header", True)
        .mode("overwrite")
        .csv(out)
    )
    back = (
        spark.read.schema("o_orderkey long, o_orderstatus string, o_totalprice double")
        .option("header", True)
        .csv(out)
    )
    return (
        back.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100.0).cast("long"))
            .cast("long")
            .alias("total_centi"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "agg_bool_any_all",
    oracle="""
    SELECT event_type,
           bool_or(value > 90.0) AS any_high,
           bool_and(value >= 0.0) AS all_nonneg,
           CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def agg_bool_any_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean any/all aggregates per group (data-quality assertions as a
    dataflow: 'does any row exceed the threshold', 'are all values
    valid').  Plain hash aggregation with map-side partials."""
    ev = T(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.bool_or(F.col("value") > 90.0).alias("any_high"),
            F.bool_and(F.col("value") >= 0.0).alias("all_nonneg"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .orderBy("event_type")
    )


@register(
    "join_bucketed_colocated",
    oracle="""
    SELECT o.o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CAST(round(l.l_quantity * 100.0) AS BIGINT)) AS BIGINT) AS qty_centi
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderstatus ORDER BY o.o_orderstatus
    """,
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located join — THE shuffle-elimination layout for
    repeated large×large equi joins: both tables written `bucketBy(8,
    orderkey)` + sorted, so the join consumes the bucket layout directly
    and plans with ZERO exchange under the join (asserted in
    tests/test_plans.py::test_bucketed_join_has_no_join_exchange; an
    unbucketed SMJ shuffles both sides every query).  At 100 TB this is
    the difference between paying the fact-fact shuffle once at write
    time vs on every join.

    Tables are external (data under the scratch dir) and rebuilt per
    call; oracle equality against the unbucketed originals proves the
    bucketed layout is lossless.
    """
    scratch = _scratch(sf_dir, "bucketed")
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = T(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    for name, df, key in [("b_lineitem", li, "l_orderkey"), ("b_orders", orders, "o_orderkey")]:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.bucketBy(8, key)
            .sortBy(key)
            .option("path", os.path.join(scratch, name))
            .mode("overwrite")
            .saveAsTable(name)
        )
    bl, bo = spark.table("b_lineitem"), spark.table("b_orders")
    return (
        bl.join(bo, bl.l_orderkey == bo.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(F.round(F.col("l_quantity") * 100.0).cast("long"))
            .cast("long")
            .alias("qty_centi"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "pipeline_clean_corpus",
    oracle="""
    WITH kept AS (
      SELECT lang, doc_id, n_chars,
             row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS copy_rn
      FROM documents
      WHERE n_chars BETWEEN 50 AND 100000
        AND len(string_split(text, ' ')) >= 10
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CAST(n_chars AS BIGINT)) AS BIGINT) AS total_chars
    FROM kept WHERE copy_rn = 1
    GROUP BY lang ORDER BY lang
    """,
)
def pipeline_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus cleaning as ONE dataflow — the composition a
    training-data pipeline actually runs: length/quality gates → exact
    dedup with deterministic keeper → per-language corpus stats.  Filters
    evaluate in the scan stage (pushdown), the dedup is one window over
    the content hash, and nothing materializes between stages — Catalyst
    fuses the whole pipeline.  (Near-dup stages chain the same way via
    dedup_apply_clusters.)"""
    docs = T(spark, sf_dir, "documents")
    kept = (
        docs.filter(
            (F.col("n_chars").between(50, 100000))
            & (F.size(F.split("text", " ")) >= 10)
        )
        .withColumn(
            "copy_rn",
            F.row_number().over(
                Window.partitionBy(F.md5("text")).orderBy("doc_id")
            ),
        )
        .filter(F.col("copy_rn") == 1)
    )
    return (
        kept.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.col("n_chars").cast("long")).cast("long").alias("total_chars"),
        )
        .orderBy("lang")
    )


@register(
    "shard_pack_tokens",
    oracle="""
    WITH toks AS (
      SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    packed AS (
      SELECT doc_id, n_tokens,
             CAST((sum(n_tokens) OVER (ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - n_tokens) // 20000 AS BIGINT) AS shard_id
      FROM toks
    )
    SELECT shard_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens
    FROM packed GROUP BY shard_id ORDER BY shard_id
    """,
)
def shard_pack_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy token-budget shard packing — the write-side layout step of a
    training pipeline: documents fill shards of ~20k tokens in doc_id
    order (shard = floor(preceding-token-sum / budget); a doc never
    splits).  Deterministic integer math end-to-end.

    Scale note: the running sum here is a single total-order window
    (range-partitioned sort).  At 100 TB, pack per partition instead:
    distribute docs by hash, run the same greedy fill within each
    partition, and namespace shard ids by partition — embarrassingly
    parallel, same output contract; the global-order variant is the
    oracle-tractable form.
    """
    docs = T(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    packed = (
        toks.withColumn("running", F.sum("n_tokens").over(w))
        # integer div on longs, exact at any corpus size (double division
        # would round above 2^53 total tokens)
        .withColumn("shard_id", F.expr("(running - n_tokens) div 20000"))
        .drop("running")
    )
    return (
        packed.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
        .orderBy("shard_id")
    )


@register(
    "scd2_history",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, event_type,
             epoch_ns(ts) // 1000000000 AS ts_sec
      FROM events
    )
    SELECT user_id, event_id, event_type,
           ts_sec AS valid_from,
           lead(ts_sec) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id)
             AS valid_to,
           CAST(lead(ts_sec) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id)
                IS NULL AS BOOLEAN) AS is_current
    FROM e
    """,
)
def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 build: each event becomes a
    validity interval ``[valid_from, valid_to)`` closed by the next event
    for the same key, the latest row flagged current — the standard
    warehouse history-table construction, as one window pass (shuffle on
    user_id only).  Timestamps compared as epoch seconds (ns-precision
    trap, FIXTURES.md)."""
    from cassandra_syncer_spark.queries.windows import events_with_sec

    ev = events_with_sec(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_sec", "event_id")
    nxt = F.lead("ts_sec").over(w)
    return ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.col("ts_sec").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


@register(
    "win_streak_islands",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY epoch_ns(ts) // 1000000000, event_id) AS rn_all,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY epoch_ns(ts) // 1000000000, event_id) AS rn_type
      FROM events
    ),
    streaks AS (
      SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS streak_len
      FROM e GROUP BY user_id, event_type, rn_all - rn_type
    )
    SELECT event_type, streak_len, CAST(count(*) AS BIGINT) AS n_streaks
    FROM streaks GROUP BY event_type, streak_len
    ORDER BY event_type, streak_len
    """,
)
def win_streak_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: consecutive same-type event runs per user via the
    row_number-difference trick (rn_overall − rn_within_type is constant
    across a run), rolled up to a streak-length histogram per type.  Two
    windows over one shuffle key + two aggregations — no self-joins."""
    from cassandra_syncer_spark.queries.windows import events_with_sec

    ev = events_with_sec(spark, sf_dir)
    w_all = Window.partitionBy("user_id").orderBy("ts_sec", "event_id")
    w_type = Window.partitionBy("user_id", "event_type").orderBy("ts_sec", "event_id")
    e = ev.select(
        "user_id",
        "event_type",
        (F.row_number().over(w_all) - F.row_number().over(w_type)).alias("island"),
    )
    streaks = e.groupBy("user_id", "event_type", "island").agg(
        F.count(F.lit(1)).cast("long").alias("streak_len")
    )
    return (
        streaks.groupBy("event_type", "streak_len")
        .agg(F.count(F.lit(1)).cast("long").alias("n_streaks"))
        .orderBy("event_type", "streak_len")
    )


@register(
    "sample_stratified_exact",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents
    )
    SELECT lang, doc_id, CAST(rn AS BIGINT) AS rn
    FROM ranked WHERE rn <= 20
    """,
)
def sample_stratified_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling with an EXACT per-group quota: 20 docs per
    language, selected by content-independent hash order — deterministic
    (re-runs pick the same sample; no rand()), unbiased within each
    stratum, and bounded output per group regardless of stratum size.
    The per-group top-k is a window over the group key — at 100 TB this
    is the standard quota-sampling shape for building eval slices.

    Parallelism note: the rank window serializes each stratum onto one
    task (measured 20.6× penalty on a 95%-skewed key in the round-7
    class-balance skew stress); when strata are few and huge, the
    ``sample_balanced_threshold`` device applies verbatim — hash-bucket
    histogram + boundary-bucket-only rank selects the identical rows
    with per-task work corpus/4096."""
    docs = T(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.select("lang", "doc_id", F.row_number().over(w).cast("long").alias("rn"))
        .filter(F.col("rn") <= 20)
    )
