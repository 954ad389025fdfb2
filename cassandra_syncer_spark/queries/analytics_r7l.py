"""Round-7 batch 12 — one-way ANOVA components, classifier confusion
matrix, Benford first-digit audit, equi-width histogram, and bounded
BFS reachability.

Reference parity note: analytics extensions beyond the reference's sync
surface (rax-maas/cassandra-syncer holds only backup/restore plumbing,
bin/cassandra-syncer:1-); integer/micro-unit exact formulas on both
engines per the registry contract — no libm ``ln``; quantize-before-sum
everywhere a per-group float term would otherwise accumulate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cassandra_syncer_spark.queries.relational import T
from cassandra_syncer_spark.registry import register

# ---------------------------------------------------------------------------
# agg_anova_f — one-way ANOVA of n_chars by source (exact sum-of-squares)
# ---------------------------------------------------------------------------


@register(
    "agg_anova_f",
    oracle="""
    WITH g AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS ng,
             CAST(sum(n_chars) AS BIGINT) AS sg,
             CAST(sum(CAST(n_chars AS HUGEINT) * n_chars) AS HUGEINT) AS qg
      FROM documents WHERE n_chars IS NOT NULL GROUP BY source
    ),
    t AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(ng) AS BIGINT) AS n,
             CAST(sum(sg) AS BIGINT) AS s,
             CAST(sum(CAST(1000000 AS HUGEINT) * sg * sg // ng) AS BIGINT) AS a_micro,
             CAST(sum(1000000 * qg) AS BIGINT) AS q_micro
      FROM g
    )
    SELECT k AS k_groups, n AS n_total,
           CAST(a_micro - (CAST(1000000 AS HUGEINT) * s * s // n) AS BIGINT)
             AS ssb_micro,
           CAST(q_micro - a_micro AS BIGINT) AS ssw_micro,
           CAST(round(1000000.0
                      * (a_micro - (CAST(1000000 AS HUGEINT) * s * s // n))
                      * (n - k)
                      / (CAST(q_micro - a_micro AS DOUBLE) * (k - 1)))
                AS BIGINT) AS f_micro
    FROM t WHERE k >= 2 AND n > k AND q_micro > a_micro
    """,
)
def agg_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of document length by source: between-group and
    within-group sums of squares plus the F statistic — "do the crawl
    sources differ in document length beyond chance?", the continuous
    complement of ``agg_chi_square``'s categorical test.

    Quantize-before-sum discipline: per-group Σx and Σx² are exact
    integers; the per-group correction term ``1e6·S_g²/n_g`` is a single
    DECIMAL/HUGEINT integral division quantized to micro BEFORE the
    cross-group sum (a double sum over groups would be order-sensitive);
    SSB/SSW come out as exact BIGINT micros, and the one float step is
    the final F ratio (correctly rounded IEEE ops on exact operands —
    same contract as ``agg_chi_square``).  Degenerate inputs (one group,
    zero within-variance, n≤k) emit zero rows on both engines.

    Scale shape: one scan → source-keyed agg (map-side combined,
    |sources| rows) → single-row total agg; everything after is scalar.
    DECIMAL(38) accumulators survive the 10×-scale int64 overflow that
    bit ``events_uplift_cuped``'s first draft.
    """
    d = T(spark, sf_dir, "documents").filter(F.col("n_chars").isNotNull())
    xd = F.col("n_chars").cast("decimal(38,0)")
    g = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("ng"),
        F.sum("n_chars").cast("long").alias("sg"),
        F.sum(xd * xd).alias("qg"),
    )
    t = g.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("ng").cast("long").alias("n"),
        F.sum("sg").cast("long").alias("s"),
        F.sum(
            F.expr(
                "(CAST(1000000 AS DECIMAL(38,0)) * sg * sg) div ng"
            )
        )
        .cast("long")
        .alias("a_micro"),
        F.sum(F.lit(1000000).cast("decimal(38,0)") * F.col("qg"))
        .cast("long")
        .alias("q_micro"),
    )
    ssb = F.expr(
        "CAST(a_micro - ((CAST(1000000 AS DECIMAL(38,0)) * s * s) div n) AS BIGINT)"
    )
    ssw = F.col("q_micro") - F.col("a_micro")
    return (
        t.filter(
            (F.col("k") >= 2) & (F.col("n") > F.col("k")) & (ssw > 0)
        ).select(
            F.col("k").alias("k_groups"),
            F.col("n").alias("n_total"),
            ssb.alias("ssb_micro"),
            ssw.cast("long").alias("ssw_micro"),
            F.round(
                F.lit(1000000.0)
                * ssb
                * (F.col("n") - F.col("k"))
                / (ssw.cast("double") * (F.col("k") - 1))
            )
            .cast("long")
            .alias("f_micro"),
        )
    )


# ---------------------------------------------------------------------------
# text_langid_confusion — classifier eval: confusion matrix + P/R
# ---------------------------------------------------------------------------


@register(
    "text_langid_confusion",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang, string_split(lower(text), ' ') AS words FROM documents
    ), scores AS (
      SELECT doc_id, lang,
             len(list_filter(words, w -> w IN ('the','a','of','and','is'))) AS s_en,
             len(list_filter(words, w -> w IN ('le','la','de','et','un')))  AS s_fr,
             len(list_filter(words, w -> w IN ('el','la','de','y','un')))   AS s_es,
             len(list_filter(words, w -> w IN ('der','die','das','und','ein'))) AS s_de
      FROM t
    ), pred AS (
      SELECT lang,
             CASE WHEN s_en >= s_fr AND s_en >= s_es AND s_en >= s_de AND s_en > 0 THEN 'en'
                  WHEN s_fr >= s_es AND s_fr >= s_de AND s_fr > 0 THEN 'fr'
                  WHEN s_es >= s_de AND s_es > 0 THEN 'es'
                  WHEN s_de > 0 THEN 'de'
                  ELSE 'unknown' END AS pred_lang
      FROM scores
    ),
    cells AS (
      SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n_docs
      FROM pred GROUP BY lang, pred_lang
    )
    SELECT lang, pred_lang, n_docs,
           CAST((1000000 * n_docs) // sum(n_docs) OVER (PARTITION BY lang)
                AS BIGINT) AS recall_micro,
           CAST((1000000 * n_docs) // sum(n_docs) OVER (PARTITION BY pred_lang)
                AS BIGINT) AS precision_micro
    FROM cells ORDER BY lang, pred_lang
    """,
)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-eval confusion matrix for the marker-word language-ID:
    per (true lang, predicted lang) cell the doc count plus its
    contribution to per-truth recall and per-prediction precision — the
    standard audit before trusting a cheap classifier to gate a corpus
    (which languages leak into which buckets, and how bad is
    'unknown'?).  Shares the exact classifier expression with
    ``text_langid`` so the matrix audits the registered operator, not a
    reimplementation.

    Scale shape: the marker scoring is scan-fused (no explode — filter
    over the split array); one hash agg to the ≤|langs|·(|langs|+1) cell
    table; both P/R windows run on that dimension table.  Integer
    micro division throughout — no floats anywhere.
    """
    docs = T(spark, sf_dir, "documents")
    words = F.split(F.lower("text"), " ")

    def score(markers: list[str]):
        return F.size(F.filter(words, lambda w: w.isin(*markers)))

    s_en = score(["the", "a", "of", "and", "is"])
    s_fr = score(["le", "la", "de", "et", "un"])
    s_es = score(["el", "la", "de", "y", "un"])
    s_de = score(["der", "die", "das", "und", "ein"])
    pred = docs.select(
        "lang",
        F.when((s_en >= s_fr) & (s_en >= s_es) & (s_en >= s_de) & (s_en > 0), "en")
        .when((s_fr >= s_es) & (s_fr >= s_de) & (s_fr > 0), "fr")
        .when((s_es >= s_de) & (s_es > 0), "es")
        .when(s_de > 0, "de")
        .otherwise("unknown")
        .alias("pred_lang"),
    )
    cells = pred.groupBy("lang", "pred_lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    return (
        cells.withColumn(
            "recall_micro",
            F.expr(
                "(1000000 * n_docs) div sum(n_docs) over (partition by lang)"
            ).cast("long"),
        )
        .withColumn(
            "precision_micro",
            F.expr(
                "(1000000 * n_docs) div sum(n_docs) over (partition by pred_lang)"
            ).cast("long"),
        )
        .orderBy("lang", "pred_lang")
    )


# ---------------------------------------------------------------------------
# agg_benford_digits — first-significant-digit distribution audit
# ---------------------------------------------------------------------------

#: micro-units of log10(1 + 1/d), d = 1..9 — fixed LITERALS shared by both
#: engines (the repo's no-libm rule: constants are data, not computation)
_BENFORD_MICRO = (301030, 176091, 124939, 96910, 79181, 66947, 57992, 51153, 45757)


@register(
    "agg_benford_digits",
    oracle=f"""
    WITH b(digit, benford_micro) AS (VALUES
      {', '.join(f'({d + 1}, {m})' for d, m in enumerate(_BENFORD_MICRO))}
    ),
    o AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                  AS BIGINT) AS digit,
             CAST(count(*) AS BIGINT) AS n_obs
      FROM orders WHERE o_totalprice >= 1 GROUP BY 1
    ),
    j AS (
      SELECT CAST(b.digit AS BIGINT) AS digit, CAST(b.benford_micro AS BIGINT) AS benford_micro,
             coalesce(o.n_obs, 0) AS n_obs,
             sum(coalesce(o.n_obs, 0)) OVER () AS n_total
      FROM b LEFT JOIN o ON b.digit = o.digit
    )
    SELECT digit, n_obs,
           CAST((1000000 * n_obs) // n_total AS BIGINT) AS obs_share_micro,
           benford_micro,
           CAST((1000000 * n_obs) // n_total - benford_micro AS BIGINT) AS dev_micro,
           CAST(round(1000000.0
                      * (1000 * n_obs - (n_total * benford_micro) // 1000)
                      * (1000 * n_obs - (n_total * benford_micro) // 1000)
                      / (1000.0 * ((n_total * benford_micro) // 1000)))
                AS BIGINT) AS chi2_cell_micro
    FROM j WHERE n_total > 0 ORDER BY digit
    """,
)
def agg_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals: observed vs
    expected digit shares and per-digit chi-square contribution — the
    classic fabricated-data / unit-mixup detector for financial and
    metric columns (synthetic uniform prices will flunk it loudly,
    which is itself the audit working).

    The nine Benford probabilities are fixed micro-unit LITERALS shared
    by both engines (constants are data — the no-libm rule stays
    intact); the digit is extracted by string head on the exact integer
    part, not ``log10``.  Expected counts are exact milli integers;
    the chi-square step is the ``agg_chi_square`` float contract.
    All nine digits emit even at zero observations (LEFT JOIN from the
    digit dimension) so the row set is schema-stable.

    Scale shape: one scan → 9-key hash agg (map-side combine collapses
    every partition to ≤9 rows); the digit dimension is a 9-row VALUES
    table joined broadcast-trivially.  Nothing else.
    """
    b = spark.createDataFrame(
        [(d + 1, m) for d, m in enumerate(_BENFORD_MICRO)],
        "digit long, benford_micro long",
    )
    o = (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") >= 1)
        .groupBy(
            F.substring(
                F.floor("o_totalprice").cast("long").cast("string"), 1, 1
            )
            .cast("long")
            .alias("digit")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_obs"))
    )
    j = (
        b.join(o, "digit", "left")
        .withColumn("n_obs", F.coalesce(F.col("n_obs"), F.lit(0)).cast("long"))
        .withColumn("n_total", F.sum("n_obs").over(Window.partitionBy()))
    )
    e_milli = F.expr("(n_total * benford_micro) div 1000")
    d_milli = F.lit(1000) * F.col("n_obs") - e_milli
    return (
        j.filter(F.col("n_total") > 0)
        .select(
            "digit",
            "n_obs",
            F.expr("(1000000 * n_obs) div n_total").cast("long").alias(
                "obs_share_micro"
            ),
            "benford_micro",
            (
                F.expr("(1000000 * n_obs) div n_total") - F.col("benford_micro")
            )
            .cast("long")
            .alias("dev_micro"),
            F.round(
                F.lit(1000000.0) * d_milli * d_milli / (F.lit(1000.0) * e_milli)
            )
            .cast("long")
            .alias("chi2_cell_micro"),
        )
        .orderBy("digit")
    )


# ---------------------------------------------------------------------------
# agg_histogram_equiwidth — equi-width histogram with derived bounds
# ---------------------------------------------------------------------------

_HIST_BINS = 20


@register(
    "agg_histogram_equiwidth",
    oracle=f"""
    WITH v AS (
      SELECT CAST(round(1000000 * value) AS BIGINT) AS vm FROM events
      WHERE value IS NOT NULL
    ),
    mm AS (SELECT min(vm) AS lo, max(vm) AS hi, count(*) AS n FROM v),
    binned AS (
      SELECT least(({_HIST_BINS} * (vm - lo)) // (hi - lo + 1), {_HIST_BINS - 1})
               AS bin,
             lo, hi, n
      FROM v, mm
    )
    SELECT CAST(bin AS BIGINT) AS bin,
           CAST(lo + bin * (hi - lo + 1) // {_HIST_BINS} AS BIGINT) AS lo_micro,
           CAST(lo + (bin + 1) * (hi - lo + 1) // {_HIST_BINS} AS BIGINT) AS hi_micro,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST((1000000 * count(*)) // max(n) AS BIGINT) AS share_micro
    FROM binned GROUP BY bin, lo, hi, n ORDER BY bin
    """,
)
def agg_histogram_equiwidth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of event values with bounds derived from the
    data (global min/max → {bins} equal buckets) — the complement of
    ``agg_percentile_hist``'s equi-HEIGHT form: fixed-width bins show
    the distribution's shape, equi-height bins its quantiles.

    Fully integer: values micro-quantize per row, the bin index is one
    integral division against the exact (hi−lo+1) span (the +1 makes
    the max value land in the last bin without a float epsilon), bin
    edges are reconstructed by the same integer division — so Spark and
    DuckDB agree bit-for-bit with no rounding contract needed at all.

    Scale shape: the min/max single-row agg broadcasts back to the scan
    (never a window over the fact table — that would shuffle everything
    to one partition); then one {bins}-key hash agg, map-side combined.
    Two scans of the value column total, both column-pruned.
    """
    v = (
        T(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(F.round(F.lit(1000000) * F.col("value")).cast("long").alias("vm"))
    )
    mm = v.agg(
        F.min("vm").alias("lo"), F.max("vm").alias("hi"), F.count(F.lit(1)).alias("n")
    )
    binned = v.crossJoin(F.broadcast(mm)).select(
        F.expr(
            f"least(({_HIST_BINS} * (vm - lo)) div (hi - lo + 1), {_HIST_BINS - 1})"
        ).alias("bin"),
        "lo",
        "hi",
        "n",
    )
    return (
        binned.groupBy("bin", "lo", "hi", "n")
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
        .select(
            F.col("bin").cast("long").alias("bin"),
            F.expr(f"lo + (bin * (hi - lo + 1)) div {_HIST_BINS}")
            .cast("long")
            .alias("lo_micro"),
            F.expr(f"lo + ((bin + 1) * (hi - lo + 1)) div {_HIST_BINS}")
            .cast("long")
            .alias("hi_micro"),
            "n_rows",
            F.expr("(1000000 * n_rows) div n").cast("long").alias("share_micro"),
        )
        .orderBy("bin")
    )


agg_histogram_equiwidth.__doc__ = agg_histogram_equiwidth.__doc__.format(
    bins=_HIST_BINS
)


# ---------------------------------------------------------------------------
# graph_bfs_hops — bounded breadth-first reachability with frontier dedup
# ---------------------------------------------------------------------------

_BFS_SEEDS = 2  # seed suppliers: l_suppkey < 2
_BFS_HOPS = 3


def _bfs_oracle() -> str:
    return f"""
    WITH e AS (SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem),
    s0 AS (SELECT DISTINCT s FROM e WHERE s < {_BFS_SEEDS}),
    p1 AS (SELECT DISTINCT p FROM e WHERE s IN (SELECT s FROM s0)),
    s2 AS (SELECT DISTINCT s FROM e
           WHERE p IN (SELECT p FROM p1) AND s NOT IN (SELECT s FROM s0)),
    p3 AS (SELECT DISTINCT p FROM e
           WHERE s IN (SELECT s FROM s2) AND p NOT IN (SELECT p FROM p1))
    SELECT * FROM (
      SELECT CAST(1 AS BIGINT) AS hop, 'part' AS side,
             (SELECT CAST(count(*) AS BIGINT) FROM p1) AS n_new
      UNION ALL
      SELECT CAST(2 AS BIGINT), 'supplier',
             (SELECT CAST(count(*) AS BIGINT) FROM s2)
      UNION ALL
      SELECT CAST(3 AS BIGINT), 'part',
             (SELECT CAST(count(*) AS BIGINT) FROM p3)
    ) ORDER BY hop
    """


@register("graph_bfs_hops", oracle=_bfs_oracle())
def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded breadth-first reachability on the supplier–part bipartite
    graph: starting from a seed supplier set, how many NEW nodes does
    each hop reach?  The blast-radius / contamination-spread primitive
    ("if these suppliers are compromised, how much of the catalog is
    within 3 hops?") — and the frontier-dedup pattern (visited sets
    subtracted per hop) every distributed BFS needs to avoid exponential
    frontier re-expansion.

    Scale shape: per hop one semi-join (frontier → neighbors, keyed on
    the frontier side) + one anti-join (minus visited) — frontier and
    visited sets are node-bounded, so they broadcast when small and
    hash-join co-partitioned otherwise; the edge list materializes once
    (localCheckpoint) and is never expanded.  Hops are a constant, and
    the per-hop work tracks |frontier-adjacent edges|, not the graph.
    """
    e = (
        T(spark, sf_dir, "lineitem")
        .select(F.col("l_suppkey").alias("s"), F.col("l_partkey").alias("p"))
        .distinct()
        .localCheckpoint()
    )
    s_visited = e.select("s").filter(F.col("s") < _BFS_SEEDS).distinct()
    p_visited = None
    out = []
    frontier_s, frontier_p = s_visited, None
    for hop in range(1, _BFS_HOPS + 1):
        if hop % 2 == 1:  # supplier frontier → new parts
            reached = (
                e.join(frontier_s, "s", "left_semi").select("p").distinct()
            )
            if p_visited is not None:
                reached = reached.join(p_visited, "p", "left_anti")
            frontier_p = reached.localCheckpoint()
            p_visited = (
                frontier_p
                if p_visited is None
                else p_visited.unionByName(frontier_p).localCheckpoint()
            )
            out.append(
                frontier_p.agg(
                    F.lit(hop).cast("long").alias("hop"),
                    F.lit("part").alias("side"),
                    F.count(F.lit(1)).cast("long").alias("n_new"),
                )
            )
        else:  # part frontier → new suppliers
            reached = (
                e.join(frontier_p, "p", "left_semi")
                .select("s")
                .distinct()
                .join(s_visited, "s", "left_anti")
            )
            frontier_s = reached.localCheckpoint()
            s_visited = s_visited.unionByName(frontier_s).localCheckpoint()
            out.append(
                frontier_s.agg(
                    F.lit(hop).cast("long").alias("hop"),
                    F.lit("supplier").alias("side"),
                    F.count(F.lit(1)).cast("long").alias("n_new"),
                )
            )
    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    return res.orderBy("hop")
