"""Deterministic bounds-oracles for the sketch-based operators.

The sketch estimators (HLL++ count-distinct, Greenwald-Khanna
percentiles, HLL sketch union) can never hash-match a DuckDB oracle —
each engine's sketch yields different estimates.  Since round 6 these
envelope queries ARE the registered forms of ``agg_approx_distinct``,
``agg_percentile_approx``, and ``agg_hll_union`` (the former rows-only
registrations survive as unregistered ``*_sketch`` production functions
in relational.py / incremental.py / analytics_r3b.py, unit-gated for
accuracy) — every registered sketch id is hash-checked.  The trick:
emit only values both engines can reproduce exactly:

- the group key and the EXACT statistic (computable in both engines), and
- a boolean asserting the Spark sketch satisfies its documented accuracy
  guarantee against that exact value.

The boolean is computed genuinely on the Spark side (estimate vs exact);
the oracle emits the literal ``true`` the guarantee demands.  Sketches
with fixed parameters on fixed data are deterministic, so the check is
stable — if a Spark upgrade or a query edit ever breaks an estimator's
envelope, the driver row flips red.

Reference parity: the reference ships no sketches (its manifest dedup is
exact, ``bin/cassandra-syncer:83-110``); these operators are part of the
100 TB extension surface where exact distincts/percentiles stop scaling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_syncer_spark.registry import register
from cassandra_syncer_spark.session import load_table as T


@register(
    "agg_approx_distinct",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS n_users_exact,
           true AS approx_within_5pct
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def agg_approx_distinct_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ count-distinct checked against its accuracy envelope.

    ``approx_count_distinct(rsd=0.02)`` is a ~2%-relative-stddev
    estimator; 5% is 2.5σ, comfortably inside the envelope at this
    cardinality.  One pass over events either way — the exact distinct is
    affordable at fixture scale and IS the point: prove the estimator,
    then at 100 TB run only the estimator (``agg_approx_distinct``).
    """
    ev = T(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users_exact"),
        F.approx_count_distinct("user_id", 0.02).alias("appx"),
    )
    err = F.abs(F.col("appx") - F.col("n_users_exact"))
    return agg.select(
        "event_type",
        "n_users_exact",
        (err <= 0.05 * F.col("n_users_exact")).alias("approx_within_5pct"),
    ).orderBy("event_type")


@register(
    "agg_percentile_approx",
    oracle="""
    SELECT l_returnflag,
           count(*) AS n_rows,
           true AS p50_in_rank_window,
           true AS p95_in_rank_window
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_percentile_approx_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greenwald-Khanna approx percentile checked against its RANK-error
    guarantee: ``approx_percentile(x, p, acc)`` returns a value whose rank
    is within 1/acc of p.  With acc=1000 (ε=0.001) we assert the estimate
    lies between the exact percentiles at p±0.01 — a 10× margin, so the
    check is robust to interpolation differences while still catching any
    real envelope violation.
    """
    li = T(spark, sf_dir, "lineitem")
    # array forms: ONE exact sort and ONE sketch per group for all cut
    # points (separate percentile aggs each re-sort the group — measured
    # 4.9 s → 2.0 s at sf0.1, 13.9 s → 4.0 s at the 10× replica)
    agg = li.groupBy("l_returnflag").agg(
        F.expr("approx_percentile(l_extendedprice, array(0.5D, 0.95D), 1000)").alias("a"),
        F.expr("percentile(l_extendedprice, array(0.49D, 0.51D, 0.94D, 0.96D))").alias("x"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    a50, a95 = F.col("a")[0], F.col("a")[1]
    lo50, hi50, lo95, hi95 = (F.col("x")[i] for i in range(4))
    return agg.select(
        "l_returnflag",
        "n_rows",
        ((a50 >= lo50) & (a50 <= hi50)).alias("p50_in_rank_window"),
        ((a95 >= lo95) & (a95 <= hi95)).alias("p95_in_rank_window"),
    ).orderBy("l_returnflag")


@register(
    "agg_hll_union",
    oracle="""
    WITH w AS (
      SELECT lang, source, unnest(string_split(text, ' ')) AS word
      FROM documents
    )
    SELECT lang,
           CAST(count(DISTINCT source) AS BIGINT) AS n_partials,
           CAST(count(DISTINCT word) AS BIGINT) AS n_words_exact,
           true AS union_within_5pct
    FROM w GROUP BY lang ORDER BY lang
    """,
)
def agg_hll_union_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch union checked against the exact distinct count.

    Mirrors ``agg_hll_union`` (per-(lang, source) HLL partials unioned
    per lang) but emits only the cross-engine-reproducible pieces: the
    partial count, the exact distinct word count, and whether the unioned
    estimate lands within 5% of exact (HLL++'s documented envelope at
    this cardinality).  The union-of-partials path — the 100 TB shape —
    is what the boolean certifies.
    """
    docs = T(spark, sf_dir, "documents")
    words = docs.select("lang", "source", F.explode(F.split("text", " ")).alias("word"))
    partials = words.groupBy("lang", "source").agg(F.hll_sketch_agg("word").alias("sk"))
    merged = partials.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_partials"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("long").alias("est"),
    )
    exact = words.groupBy("lang").agg(F.countDistinct("word").alias("n_words_exact"))
    err = F.abs(F.col("est") - F.col("n_words_exact"))
    return (
        merged.join(exact, "lang")
        .select(
            "lang",
            "n_partials",
            "n_words_exact",
            (err <= 0.05 * F.col("n_words_exact")).alias("union_within_5pct"),
        )
        .orderBy("lang")
    )


_HIST_B = 1024  # fixed bucket count — the sketch's whole memory footprint


@register(
    "agg_percentile_hist",
    oracle=f"""
    WITH v AS (
      SELECT l_returnflag AS g,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS vc
      FROM lineitem
    ),
    s AS (
      SELECT g, min(vc) AS lo, max(vc) AS hi, CAST(count(*) AS BIGINT) AS n
      FROM v GROUP BY g
    ),
    b AS (
      SELECT v.g, ((vc - lo) * {_HIST_B}) // (hi - lo + 1) AS bkt
      FROM v JOIN s ON v.g = s.g
    ),
    h AS (SELECT g, bkt, count(*) AS c FROM b GROUP BY 1, 2),
    cum AS (
      SELECT g, bkt, sum(c) OVER (PARTITION BY g ORDER BY bkt) AS cum FROM h
    ),
    p AS (
      SELECT cum.g,
             min(CASE WHEN cum >= (50 * n + 99) // 100 THEN bkt END) AS b50,
             min(CASE WHEN cum >= (95 * n + 99) // 100 THEN bkt END) AS b95
      FROM cum JOIN s ON cum.g = s.g GROUP BY cum.g
    )
    SELECT p.g AS l_returnflag, s.n,
           s.lo AS lo_centi, s.hi AS hi_centi,
           CAST((s.hi - s.lo + {_HIST_B}) // {_HIST_B} AS BIGINT) AS bin_centi,
           CAST(s.lo + (p.b50 * (s.hi - s.lo + 1)) // {_HIST_B} AS BIGINT)
             AS p50_est_centi,
           CAST(s.lo + (p.b95 * (s.hi - s.lo + 1)) // {_HIST_B} AS BIGINT)
             AS p95_est_centi
    FROM p JOIN s ON p.g = s.g ORDER BY l_returnflag
    """,
)
def agg_percentile_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-bin histogram percentile — the PORTABLE approximate
    percentile: unlike GK/t-digest (engine-specific internals →
    ``agg_percentile_approx`` is rows-only by contract), a 1024-bin
    equal-width histogram over exact integer centi-values is a pure
    function of the data, so both engines produce the identical estimate
    and this sketch query hash-checks directly.  Error is bounded by one
    bin width (``bin_centi``, emitted so the bound is visible in the
    output); tests/test_operators.py::test_hist_percentile_within_bin
    gates the estimate against the exact percentile.

    Scale shape: pass 1 computes per-group (lo, hi, n) — at 100 TB these
    bounds are usually known a priori (fixed price domains), collapsing
    to ONE pass; pass 2 folds rows into ≤1024 counters per group with
    map-side combine.  The histogram is mergeable by cell-wise sum
    (same shard/stream story as ``agg_countmin_freq``'s cells), and the
    quantile read-out is a tiny per-group cumulative window over the
    counters, never over rows.
    """
    li = T(spark, sf_dir, "lineitem")
    v = li.select(
        F.col("l_returnflag").alias("g"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("vc"),
    )
    s = v.groupBy("g").agg(
        F.min("vc").alias("lo"),
        F.max("vc").alias("hi"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    b = v.join(F.broadcast(s), "g").select(
        "g", F.expr(f"((vc - lo) * {_HIST_B}) div (hi - lo + 1)").alias("bkt")
    )
    h = b.groupBy("g", "bkt").agg(F.count(F.lit(1)).alias("c"))
    from pyspark.sql.window import Window

    cum = h.withColumn(
        "cum",
        F.sum("c").over(
            Window.partitionBy("g").orderBy("bkt").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ),
    )
    p = (
        cum.join(F.broadcast(s), "g")
        .groupBy("g")
        .agg(
            F.min(
                F.when(F.col("cum") >= F.expr("(50 * n + 99) div 100"), F.col("bkt"))
            ).alias("b50"),
            F.min(
                F.when(F.col("cum") >= F.expr("(95 * n + 99) div 100"), F.col("bkt"))
            ).alias("b95"),
        )
    )
    return (
        p.join(F.broadcast(s), "g")
        .select(
            F.col("g").alias("l_returnflag"),
            "n",
            F.col("lo").alias("lo_centi"),
            F.col("hi").alias("hi_centi"),
            F.expr(f"(hi - lo + {_HIST_B}) div {_HIST_B}").cast("long").alias("bin_centi"),
            F.expr(f"lo + (b50 * (hi - lo + 1)) div {_HIST_B}")
            .cast("long")
            .alias("p50_est_centi"),
            F.expr(f"lo + (b95 * (hi - lo + 1)) div {_HIST_B}")
            .cast("long")
            .alias("p95_est_centi"),
        )
        .orderBy("l_returnflag")
    )
