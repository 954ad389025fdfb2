"""Round-8 batch 3 — trimmed-mean selection, seasonal decomposition,
Flesch readability, term burstiness, and partition-parallel shard packing.

Reference parity note: analytics extensions beyond the reference's sync
surface (rax-maas/cassandra-syncer holds only backup/restore plumbing,
bin/cassandra-syncer:1-); integer/micro-unit exact formulas on both
engines per the registry contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cassandra_syncer_spark.operators.constants import SEL_BUCKET as _SEL_BUCKET
from cassandra_syncer_spark.queries.relational import T
from cassandra_syncer_spark.registry import register

# ---------------------------------------------------------------------------
# agg_trimmed_mean_selection — 5%-trimmed mean WITHOUT sorting corpus rows
# ---------------------------------------------------------------------------

_TRIM_MEAN = (
    "round((CAST(total AS DOUBLE) - CAST(sum_low AS DOUBLE)"
    " - CAST(sum_high AS DOUBLE))"
    " / nullif(CAST(n - 2 * k AS DOUBLE), 0.0) / 100.0, 6)"
)


@register(
    "agg_trimmed_mean_selection",
    oracle=f"""
    WITH v AS (
      SELECT l_returnflag AS grp,
             CAST(round(100 * l_extendedprice) AS BIGINT) AS vc,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY round(100 * l_extendedprice)) AS rn,
             count(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem
    ),
    s AS (
      SELECT grp,
             CAST(max(n) AS BIGINT) AS n,
             CAST(max(n) // 20 AS BIGINT) AS k,
             CAST(sum(vc) AS BIGINT) AS total,
             CAST(sum(CASE WHEN rn <= n // 20 THEN vc ELSE 0 END) AS BIGINT)
               AS sum_low,
             CAST(sum(CASE WHEN rn > n - n // 20 THEN vc ELSE 0 END) AS BIGINT)
               AS sum_high
      FROM v GROUP BY grp
    )
    SELECT grp AS l_returnflag, n AS n_rows, k AS n_trimmed_each,
           {_TRIM_MEAN} AS trimmed_mean_r6
    FROM s ORDER BY l_returnflag
    """,
)
def agg_trimmed_mean_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5%-TRIMMED MEAN by COUNTING SELECTION — `agg_median_selection`'s
    machinery generalized to trimmed statistics (the robust mean
    `feat_winsorize` clamps toward, here computed exactly): drop the k
    = n/20 smallest and largest rows per group and average the middle.
    The tail sums come from cumulative counts and VALUE-SUMS with the
    partial tie slice (k − count_below)·v_cut — no corpus row is ever
    sorted; the oracle is the row_number() formulation (a per-group
    sort of all rows), fully independent.

    Round-11 optimization (guide §2.3, same rewrite as
    ``agg_median_selection``): the round-8 form built the FULL
    (group, value) grid, which on the nearly-all-distinct centi-price
    data reduced nothing (594 k grid rows from 600 k inputs at sf0.1)
    and funneled the grid into 3-partition windows.  Phase 1 now
    aggregates into coarse ``vc div 4096`` buckets (map-side combined,
    tiny shuffle), locates each tail's cut BUCKET via a domain-sized
    prefix window, and phase 2 re-applies the round-8 row-level tail
    formulas over ONLY the ≤2 cut buckets per group, rebuilding the
    global prefixes from broadcast bucket offsets — value-identical
    output (verified at every SF), ~1/2,600 of the grid work.

    Scale shape: scan → (group, bucket) mergeable histogram (bounded
    by the bucket grid, constant in corpus size) → tiny prefix window
    → broadcast cut spec → filtered second scan over the cut buckets.
    """
    v = T(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("grp"),
        F.round(F.lit(100) * F.col("l_extendedprice")).cast("long").alias("vc"),
    )
    bkt = F.expr(f"vc div {_SEL_BUCKET}")
    h = v.groupBy("grp", bkt.alias("bkt")).agg(
        F.count(F.lit(1)).alias("c"), F.sum("vc").alias("s")
    )
    wg = Window.partitionBy("grp")
    wc = Window.partitionBy("grp").orderBy("bkt").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    hh = (
        h.select(
            "grp",
            "bkt",
            "c",
            "s",
            F.sum("c").over(wg).alias("n"),
            F.sum("s").over(wg).alias("total"),
            F.sum("c").over(wc).alias("cum"),
            F.sum("s").over(wc).alias("cums"),
        )
        .withColumn("k", F.expr("n div 20"))
    )
    # per tail: its cut BUCKET plus the global count/value prefixes strictly
    # below that bucket, so phase 2 can reconstruct the round-8 row-level
    # formulas verbatim (min_by/max_by ignore the NULL keys of non-cut rows)
    cuts = hh.groupBy("grp").agg(
        F.max("n").alias("n"),
        F.max("k").alias("k"),
        F.max("total").alias("total"),
        F.expr(
            "min_by(named_struct('b', bkt, 'cb', cum - c, 'sb', cums - s),"
            " CASE WHEN cum >= k THEN bkt END)"
        ).alias("lo"),
        F.expr(
            "max_by(named_struct('b', bkt, 'cb', cum - c, 'sb', cums - s),"
            " CASE WHEN n - (cum - c) >= k THEN bkt END)"
        ).alias("hi"),
    )
    cuts = cuts.select(
        "grp",
        "n",
        "k",
        "total",
        F.col("lo.b").alias("b1"),
        F.col("lo.cb").alias("cb1"),
        F.col("lo.sb").alias("sb1"),
        F.col("hi.b").alias("b2"),
        F.col("hi.cb").alias("cb2"),
        F.col("hi.sb").alias("sb2"),
    )
    sub = (
        v.join(F.broadcast(cuts), "grp")
        .withColumn("lbkt", bkt)
        .filter((F.col("lbkt") == F.col("b1")) | (F.col("lbkt") == F.col("b2")))
    )
    g2 = sub.groupBy(
        "grp", "vc", "lbkt", "n", "k", "total",
        "b1", "cb1", "sb1", "b2", "cb2", "sb2",
    ).agg(F.count(F.lit(1)).alias("cnt"))
    g2 = g2.withColumn("vsum", F.col("cnt") * F.col("vc"))
    wl = Window.partitionBy("grp", "lbkt").orderBy("vc").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    g2 = (
        g2.withColumn("lcum", F.sum("cnt").over(wl))
        .withColumn("lcumv", F.sum("vsum").over(wl))
        # global prefixes at this grid row, rebuilt from the bucket offsets —
        # identical to the round-8 full-grid cum/cumv wherever they are used
        .withColumn("gcum", F.expr("IF(lbkt = b1, cb1, cb2) + lcum"))
        .withColumn("gcumv", F.expr("IF(lbkt = b1, sb1, sb2) + lcumv"))
    )
    # the round-8 row-level tail formulas, evaluated only over the ≤2 cut
    # buckets per group; the lower cut row (first gcum >= k) lives in b1 and
    # the upper cut row (last with n - (gcum - cnt) >= k) lives in b2 by
    # construction of the bucket cuts, so restricting the scan is lossless.
    # k=0 degenerates to the group's first/last row where both terms are 0.
    sel = g2.groupBy("grp").agg(
        F.max("n").cast("long").alias("n"),
        F.max("k").cast("long").alias("k"),
        F.max("total").cast("long").alias("total"),
        F.expr(
            "min_by(CASE WHEN lbkt = b1 AND gcum >= k THEN (gcumv - vsum)"
            " + (k - (gcum - cnt)) * vc END,"
            " CASE WHEN lbkt = b1 AND gcum >= k THEN vc END)"
        )
        .cast("long")
        .alias("sum_low"),
        F.expr(
            "max_by(CASE WHEN lbkt = b2 AND n - (gcum - cnt) >= k"
            " THEN (total - gcumv) + (k - (n - gcum)) * vc END,"
            " CASE WHEN lbkt = b2 AND n - (gcum - cnt) >= k THEN vc END)"
        )
        .cast("long")
        .alias("sum_high"),
    )
    return sel.select(
        F.col("grp").alias("l_returnflag"),
        F.col("n").alias("n_rows"),
        F.col("k").alias("n_trimmed_each"),
        F.expr(_TRIM_MEAN).alias("trimmed_mean_r6"),
    ).orderBy("l_returnflag")


# ---------------------------------------------------------------------------
# events_seasonal_decompose — trend / day-of-week seasonality / residual
# ---------------------------------------------------------------------------


@register(
    "events_seasonal_decompose",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(sum(CAST(round(100 * value) AS BIGINT)) AS BIGINT) AS y
      FROM events WHERE value IS NOT NULL GROUP BY 1
    ),
    tr AS (
      SELECT d, y,
             date_diff('day', DATE '1970-01-01', d) % 7 AS dow,
             CASE WHEN count(*) OVER w = 7
                  THEN sum(y) OVER w // 7 END AS trend
      FROM daily
      WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    det AS (SELECT dow, y - trend AS detr FROM tr WHERE trend IS NOT NULL),
    seas AS (
      SELECT dow,
             CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(detr) // count(*) AS BIGINT) AS seasonal_centi
      FROM det GROUP BY dow
    )
    SELECT s.dow, s.n_days, s.seasonal_centi,
           CAST(sum(abs(d.detr - s.seasonal_centi)) // s.n_days AS BIGINT)
             AS mean_abs_resid_centi
    FROM seas s JOIN det d ON d.dow = s.dow
    GROUP BY s.dow, s.n_days, s.seasonal_centi
    ORDER BY s.dow
    """,
)
def events_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLASSICAL SEASONAL DECOMPOSITION of the daily value series —
    trend (centered 7-day moving average), day-of-week seasonal factors
    (mean of the detrended series per weekday), and the residual scale
    per weekday (`events_seasonality_profile` reads the raw hourly
    shape; this separates how much of the daily movement is trend vs
    weekday habit vs noise — the decomposition CUPED-style adjustments
    and anomaly thresholds should run on).

    Determinism: the series is exact centi integers; the trend is an
    integer div over full 7-day windows only (partial edges excluded,
    same rule both engines); detrended values go NEGATIVE, and both
    Spark `div` and DuckDB integer `//` truncate toward zero (measured
    — this query's first draft assumed DuckDB floors and diverged by
    one centi on a negative weekday factor); weekday = epoch-day mod 7
    (no locale dayofweek — Spark counts Sunday=1, DuckDB Sunday=0,
    epoch-day mod 7 counts Thursday=0 identically everywhere).

    Scale shape: the corpus collapses to the DAY domain in one agg;
    every window after (trend, seasonal, residual) runs on |days| rows.
    The seasonal join is 7-row broadcast scale.
    """
    daily = (
        T(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy(F.col("ts").cast("date").alias("d"))
        .agg(
            F.sum(F.round(F.lit(100) * F.col("value")).cast("long")).alias("y")
        )
    )
    w = Window.orderBy("d").rowsBetween(-3, 3)
    # detrended sums can be NEGATIVE: Spark's `div` and DuckDB's integer
    # `//` both truncate toward zero (measured: -7//2 = -3 on both), so
    # truncating division is the shared spelling throughout
    tr = daily.select(
        "d",
        "y",
        F.expr("CAST(datediff(d, DATE '1970-01-01') % 7 AS BIGINT)").alias("dow"),
        F.when(
            F.count(F.lit(1)).over(w) == 7,
            F.sum("y").over(w),
        ).alias("sum7"),
    ).withColumn("trend", F.expr("sum7 div 7"))
    det = tr.filter(F.col("trend").isNotNull()).select(
        "dow", (F.col("y") - F.col("trend")).alias("detr")
    )
    seas = det.groupBy("dow").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.expr("CAST(sum(detr) div count(*) AS BIGINT)").alias("seasonal_centi"),
    )
    return (
        det.join(F.broadcast(seas), "dow")
        .groupBy("dow", "n_days", "seasonal_centi")
        .agg(
            F.expr(
                "CAST(sum(abs(detr - seasonal_centi)) div max(n_days)"
                " AS BIGINT)"
            ).alias("mean_abs_resid_centi")
        )
        .orderBy("dow")
    )


# ---------------------------------------------------------------------------
# text_readability_flesch — reading-ease scoring per source
# ---------------------------------------------------------------------------

#: Flesch reading ease over integer counts, micro-quantized PER DOC so the
#: per-source sums stay order-free integer adds.  Syllables via vowel-run
#: counting (the standard no-dictionary proxy); sentences via [.!?] runs.
_FLESCH_DOC = (
    "CAST(round(1000000 * (206.835"
    " - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sents AS DOUBLE))"
    " - 84.6 * (CAST(n_syll AS DOUBLE) / CAST(n_words AS DOUBLE))))"
    " AS BIGINT)"
)
_HARD_MICRO = 30 * 1000000  # below 30 = college-graduate difficulty


@register(
    "text_readability_flesch",
    oracle=f"""
    WITH c AS (
      SELECT source,
             CAST(len(list_filter(string_split(text, ' '), w -> len(w) > 0))
                  AS BIGINT) AS n_words,
             CAST(greatest(length(regexp_extract_all(text, '[.!?]+')), 1)
                  AS BIGINT) AS n_sents,
             CAST(length(regexp_extract_all(lower(text), '[aeiouy]+'))
                  AS BIGINT) AS n_syll
      FROM documents
    ),
    s AS (
      SELECT source, {_FLESCH_DOC} AS f_micro
      FROM c WHERE n_words > 0 AND n_syll > 0
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(f_micro) // count(*) AS BIGINT) AS mean_flesch_micro,
           CAST((1000000 * sum(CASE WHEN f_micro < {_HARD_MICRO}
                                    THEN 1 ELSE 0 END)) // count(*) AS BIGINT)
             AS hard_share_micro
    FROM s GROUP BY source ORDER BY source
    """,
)
def text_readability_flesch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLESCH READING EASE per source — the classic readability gate
    (206.835 − 1.015·words/sentences − 84.6·syllables/word) with the
    standard dictionary-free syllable proxy (vowel-run count) and
    [.!?]-run sentence splitting: a corpus-mix diagnostic `text_quality`
    doesn't capture (length/punct ratios say nothing about sentence
    complexity), and the knob mixture pipelines tune toward a target
    audience.

    Determinism: all three counts are exact integers from portable
    regexes (verified same dialect both engines); the score
    micro-quantizes PER DOC (fixed float text over integer ratios), so
    per-source aggregation is order-free integer math; degenerate docs
    (no words / no vowels) are excluded identically on both sides, and
    sentence count floors at 1.

    Scale shape: scan-fused counting expressions (regexp_count — one
    pass over each doc, no explode, no UDF) → per-source hash agg
    (map-side combined).  One shuffle of |sources| partial rows.
    """
    c = T(spark, sf_dir, "documents").select(
        "source",
        F.expr(
            "CAST(size(filter(split(text, ' '), w -> length(w) > 0)) AS BIGINT)"
        ).alias("n_words"),
        F.expr("CAST(greatest(regexp_count(text, '[.!?]+'), 1) AS BIGINT)").alias(
            "n_sents"
        ),
        F.expr("CAST(regexp_count(lower(text), '[aeiouy]+') AS BIGINT)").alias(
            "n_syll"
        ),
    )
    s = c.filter((F.col("n_words") > 0) & (F.col("n_syll") > 0)).select(
        "source", F.expr(_FLESCH_DOC).alias("f_micro")
    )
    return (
        s.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.expr("CAST(sum(f_micro) div count(*) AS BIGINT)").alias(
                "mean_flesch_micro"
            ),
            F.expr(
                f"CAST((1000000 * sum(CASE WHEN f_micro < {_HARD_MICRO}"
                " THEN 1 ELSE 0 END)) div count(*) AS BIGINT)"
            ).alias("hard_share_micro"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# corpus_burstiness_dispersion — Church-Gale term burstiness
# ---------------------------------------------------------------------------

_BURST_MIN_FREQ = 100  # only terms frequent enough for a stable VMR
_BURST_TOP = 20

_VMR = (
    "round(((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)"
    " / CAST(nd AS DOUBLE)) / (CAST(nd AS DOUBLE) - 1.0))"
    " / nullif(CAST(s1 AS DOUBLE) / CAST(nd AS DOUBLE), 0.0), 6)"
)


@register(
    "corpus_burstiness_dispersion",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, t.w FROM documents,
        LATERAL (SELECT unnest(string_split(text, ' ')) AS w) t
      WHERE len(t.w) > 0
    ),
    wd AS (
      SELECT w, doc_id, CAST(count(*) AS BIGINT) AS c
      FROM tok GROUP BY w, doc_id
    ),
    m AS (
      SELECT w,
             CAST(count(*) AS BIGINT) AS nd,
             CAST(sum(c) AS BIGINT) AS s1,
             CAST(sum(c * c) AS BIGINT) AS s2
      FROM wd GROUP BY w
    ),
    d AS (
      SELECT w, nd, s1, {_VMR} AS vmr_r6
      FROM m WHERE s1 >= {_BURST_MIN_FREQ} AND nd >= 2
    )
    SELECT w AS term, nd AS n_docs, s1 AS n_occurrences, vmr_r6,
           CAST(row_number() OVER (ORDER BY vmr_r6 DESC, w) AS BIGINT) AS rk
    FROM d
    QUALIFY rk <= {_BURST_TOP}
    ORDER BY rk
    """,
)
def corpus_burstiness_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TERM BURSTINESS (Church & Gale): variance-to-mean ratio of a
    term's per-document counts — bursty terms (VMR >> 1) concentrate in
    few documents and carry content; uniform terms (VMR ≈ 1, Poisson)
    are function words and template glue.  The top-20 burstiest frequent
    terms are the corpus's topic signature — and a sudden VMR collapse
    is the template-injection fingerprint `text_dedup_templates` then
    localizes.

    Determinism: per-(term, doc) counts and the moment sums are exact
    integers; VMR is one shared float text per TERM row (sample
    variance over the docs CONTAINING the term, ≥2 required), rounded
    to 6; rank ties break by term.

    Scale shape: token explode → (term, doc) hash agg (map-side
    combined — the per-doc count table is the corpus-sized shuffle,
    keyed on term+doc) → term-level moment agg (vocabulary-sized) →
    frequency floor cuts the tail → top-20 rank window on the surviving
    terms only.
    """
    tok = (
        T(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") > 0)
    )
    wd = tok.groupBy("w", "doc_id").agg(F.count(F.lit(1)).alias("c"))
    m = wd.groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("nd"),
        F.sum("c").cast("long").alias("s1"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("s2"),
    )
    d = m.filter(
        (F.col("s1") >= _BURST_MIN_FREQ) & (F.col("nd") >= 2)
    ).select("w", "nd", "s1", F.expr(_VMR).alias("vmr_r6"))
    wtop = Window.orderBy(F.desc("vmr_r6"), F.asc("w"))
    return (
        d.withColumn("rk", F.row_number().over(wtop).cast("long"))
        .filter(F.col("rk") <= _BURST_TOP)
        .select(
            F.col("w").alias("term"),
            F.col("nd").alias("n_docs"),
            F.col("s1").alias("n_occurrences"),
            "vmr_r6",
            "rk",
        )
        .orderBy("rk")
    )


# ---------------------------------------------------------------------------
# shard_pack_partitioned — the 100 TB shard packer, made real
# ---------------------------------------------------------------------------

_PACK_BUDGET = 20000
_PACK_PARTS = 8


@register(
    "shard_pack_partitioned",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, doc_id % {_PACK_PARTS} AS part,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    packed AS (
      SELECT part, n_tokens,
             (sum(n_tokens) OVER (PARTITION BY part ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) - n_tokens)
               // {_PACK_BUDGET} AS shard
      FROM toks
    ),
    shards AS (
      SELECT part, shard,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tokens) AS BIGINT) AS fill
      FROM packed GROUP BY part, shard
    )
    SELECT part,
           CAST(count(*) AS BIGINT) AS n_shards,
           CAST(sum(n_docs) AS BIGINT) AS n_docs,
           CAST(sum(fill) AS BIGINT) AS total_tokens,
           CAST(max(fill) AS BIGINT) AS max_shard_tokens,
           CAST(min(fill) AS BIGINT) AS min_shard_tokens
    FROM shards GROUP BY part ORDER BY part
    """,
)
def shard_pack_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARTITION-PARALLEL shard packing — `shard_pack_tokens`'s
    documented 100 TB escape hatch, made REAL and balance-audited:
    distribute documents across {_PACK_PARTS} hash partitions, run the
    same greedy token-budget fill WITHIN each partition (shard ids
    namespaced by partition), and report per-partition shard counts and
    fill spread.  The global-order packer needs a total-order window
    (range-partitioned sort = one giant sort at 100 TB); this one's
    running sums are partition-local — embarrassingly parallel, and the
    audit shows the cost: per-partition final shards run underfull
    (min_shard_tokens), the waste you trade for parallelism.

    Determinism: partition = doc_id % {_PACK_PARTS} (hash-free so the
    oracle groups identically); greedy fill is exact integer math in
    doc_id order within each partition.

    Scale shape: one scan → per-partition cumulative window (the ONLY
    shuffle, keyed on the partition id — at 100 TB this is the natural
    write layout, one task per partition) → two dimension-sized aggs.
    """
    toks = T(spark, sf_dir, "documents").select(
        "doc_id",
        (F.col("doc_id") % _PACK_PARTS).alias("part"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    w = Window.partitionBy("part").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    packed = toks.select(
        "part",
        "n_tokens",
        F.expr(
            f"(sum(n_tokens) OVER (PARTITION BY part ORDER BY doc_id"
            f" ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens)"
            f" div {_PACK_BUDGET}"
        ).alias("shard"),
    )
    shards = packed.groupBy("part", "shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("fill"),
    )
    return (
        shards.groupBy("part")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shards"),
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.sum("fill").cast("long").alias("total_tokens"),
            F.max("fill").cast("long").alias("max_shard_tokens"),
            F.min("fill").cast("long").alias("min_shard_tokens"),
        )
        .orderBy("part")
    )
