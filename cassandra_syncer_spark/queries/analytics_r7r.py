"""Round-7 batch 18 — cross-source vocabulary similarity and time-series
autocorrelation.

Reference parity note: analytics extensions beyond the reference's sync
surface (rax-maas/cassandra-syncer holds only backup/restore plumbing,
bin/cassandra-syncer:1-); integer/micro-unit exact formulas on both
engines per the registry contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_syncer_spark.queries.relational import T
from cassandra_syncer_spark.registry import register

# ---------------------------------------------------------------------------
# text_jaccard_source_similarity — vocabulary overlap between sources
# ---------------------------------------------------------------------------


@register(
    "text_jaccard_source_similarity",
    oracle="""
    WITH v AS (
      SELECT DISTINCT source, t.w
      FROM documents,
        LATERAL (SELECT unnest(string_split(lower(text), ' ')) AS w) t
      WHERE len(t.w) > 0 AND source IS NOT NULL
    ),
    sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS nv FROM v GROUP BY source),
    inter AS (
      SELECT a.source AS src_a, b.source AS src_b, CAST(count(*) AS BIGINT) AS ni
      FROM v a JOIN v b ON a.w = b.w AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT i.src_a, i.src_b, sa.nv AS vocab_a, sb.nv AS vocab_b, i.ni AS n_shared,
           CAST((1000000 * i.ni) // (sa.nv + sb.nv - i.ni) AS BIGINT)
             AS jaccard_micro
    FROM inter i
    JOIN sizes sa ON i.src_a = sa.source
    JOIN sizes sb ON i.src_b = sb.source
    ORDER BY src_a, src_b
    """,
)
def text_jaccard_source_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary Jaccard similarity between every source PAIR — the
    corpus-comparison matrix at the TOKEN level (are two crawl sources
    drawing from the same language/domain?), complementing
    ``dedup_cross_source_matrix``'s span-level mirror detection: spans
    catch copied passages, vocabulary catches shared register even with
    zero copying.

    Scale shape: distinct(source, token) collapses the corpus to a
    vocabulary-bounded table FIRST (a token repeated 10⁹ times in one
    source costs one row); the self-join is token-keyed and bucket-local
    (rows per token bounded by |sources|), the output ≤|sources|²; the
    size tables broadcast.  Integer micro Jaccard, no floats.
    """
    v = (
        T(spark, sf_dir, "documents")
        .filter(F.col("source").isNotNull())
        .select("source", F.explode(F.split(F.lower("text"), " ")).alias("w"))
        .filter(F.length("w") > 0)
        .distinct()
    )
    sizes = v.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("nv"))
    a, b = v.alias("a"), v.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.w") == F.col("b.w")) & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("ni"))
    )
    sa = sizes.select(F.col("source").alias("src_a"), F.col("nv").alias("vocab_a"))
    sb = sizes.select(F.col("source").alias("src_b"), F.col("nv").alias("vocab_b"))
    return (
        inter.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .select(
            "src_a",
            "src_b",
            "vocab_a",
            "vocab_b",
            F.col("ni").alias("n_shared"),
            F.expr("(1000000 * ni) div (vocab_a + vocab_b - ni)")
            .cast("long")
            .alias("jaccard_micro"),
        )
        .orderBy("src_a", "src_b")
    )


# ---------------------------------------------------------------------------
# events_autocorr_lags — minute-series ACF without a global row sort
# ---------------------------------------------------------------------------

_ACF_LAGS = 5

#: shared Pearson text over exact per-lag sums
_ACF_EXPR = (
    "round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    " / nullif(sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    " * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)"
    " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 0.0), 6)"
)


@register(
    "events_autocorr_lags",
    oracle=f"""
    WITH m AS (
      SELECT epoch_ns(ts) // 60000000000 AS minute,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ),
    lags AS (SELECT unnest(range(1, {_ACF_LAGS + 1})) AS lag),
    j AS (
      SELECT l.lag, a.c AS x, b.c AS y
      FROM lags l JOIN m a ON true JOIN m b ON b.minute = a.minute + l.lag
    ),
    s AS (
      SELECT lag, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(CAST(x AS HUGEINT) * y) AS BIGINT) AS sxy,
             CAST(sum(CAST(x AS HUGEINT) * x) AS BIGINT) AS sxx,
             CAST(sum(CAST(y AS HUGEINT) * y) AS BIGINT) AS syy
      FROM j GROUP BY lag
    )
    SELECT CAST(lag AS BIGINT) AS lag, n AS n_pairs, {_ACF_EXPR} AS acf_r6
    FROM s WHERE n >= 2 ORDER BY lag
    """,
)
def events_autocorr_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the per-minute event-count series at lags
    1..{lags} — the rhythm detector behind ``events_seasonality_profile``
    (a slowly decaying ACF = trending load, a spike at lag k = a k-minute
    periodic job) and the standard pre-check before fitting any
    forecasting model.

    Distributed shape: the corpus collapses to the MINUTE DOMAIN first
    (one map-side-combined agg); each lag is then a domain-table
    self-join on ``minute + lag`` — equi keys, domain-sized inputs, all
    {lags} lags shuffled once via the lag-dimension cross join.  Pairs
    where either minute is silent are absent on both engines (inner
    join semantics — the honest 'observed minutes only' ACF, stated
    rather than hidden).  Exact integer sums per lag; one shared-text
    Pearson finale per lag row.
    """
    m = (
        T(spark, sf_dir, "events")
        .groupBy(F.expr("ts_ns div 60000000000").alias("minute"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    lags = spark.range(1, _ACF_LAGS + 1).select(F.col("id").alias("lag"))
    a = m.select("minute", F.col("c").alias("x")).crossJoin(F.broadcast(lags))
    b = m.select(F.col("minute").alias("m_b"), F.col("c").alias("y"))
    j = a.join(b, F.col("m_b") == F.col("minute") + F.col("lag")).select(
        "lag", "x", "y"
    )
    xd, ydd = F.col("x").cast("decimal(38,0)"), F.col("y").cast("decimal(38,0)")
    s = j.groupBy("lag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(xd * ydd).cast("long").alias("sxy"),
        F.sum(xd * xd).cast("long").alias("sxx"),
        F.sum(ydd * ydd).cast("long").alias("syy"),
    )
    return (
        s.filter(F.col("n") >= 2)
        .select(
            F.col("lag").cast("long").alias("lag"),
            F.col("n").alias("n_pairs"),
            F.expr(_ACF_EXPR).alias("acf_r6"),
        )
        .orderBy("lag")
    )


events_autocorr_lags.__doc__ = events_autocorr_lags.__doc__.format(lags=_ACF_LAGS)
