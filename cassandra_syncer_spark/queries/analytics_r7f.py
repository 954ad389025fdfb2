"""Round-7 batch 6 — distributed power iteration (top principal
component, integer-exact), user survival curves, and tokenizer
fertility metrics.

Reference parity note: analytics extensions beyond the reference's sync
surface; integer/micro-unit exact formulas on both engines per the
registry contract (Spark ``div`` and DuckDB ``//`` both truncate toward
zero, verified including negative operands).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cassandra_syncer_spark.queries.relational import T
from cassandra_syncer_spark.registry import register

# ---------------------------------------------------------------------------
# embed_pca_power — top principal direction by matrix-free power iteration
# ---------------------------------------------------------------------------

# Per-iteration dot products rescale by this before the rank-1 update so
# the integer accumulators stay far from int64 range.  xi ≤ ~1e6 micro,
# normalized v ≤ 1000 ⇒ |dot| ≤ 64·1e6·1000 = 6.4e10; rescaled ≤ 3.9e6;
# per-row update term ≤ 1e6·3.9e6 ≈ 4e12 ⇒ safe to ~2.3e6 rows.  In
# production the shift grows with log2(N) (one extra scalar agg) — the
# fixture constant covers every test scale including the 30× replica.
_DOT_SHIFT = 16384


def _pca_sql() -> str:
    return f"""
    WITH x AS (
      SELECT vec_id, i.range AS dim,
             CAST(round(CAST(embedding[i.range] AS DOUBLE) * 1000000)
                  AS BIGINT) AS xi
      FROM embeddings, range(1, 65) i
    ),
    d0 AS (
      SELECT vec_id, (1000 * sum(xi)) // {_DOT_SHIFT} AS dot0
      FROM x GROUP BY vec_id
    ),
    u1 AS (
      SELECT dim, sum(x.xi * d0.dot0) AS u
      FROM x JOIN d0 ON x.vec_id = d0.vec_id GROUP BY dim
    ),
    m1 AS (SELECT greatest(max(abs(u)), 1) AS m FROM u1),
    v1 AS (SELECT dim, (1000 * u) // m AS v FROM u1, m1),
    d1 AS (
      SELECT x.vec_id, sum(x.xi * v1.v) // {_DOT_SHIFT} AS dot1
      FROM x JOIN v1 ON x.dim = v1.dim GROUP BY x.vec_id
    ),
    u2 AS (
      SELECT dim, sum(x.xi * d1.dot1) AS u
      FROM x JOIN d1 ON x.vec_id = d1.vec_id GROUP BY dim
    ),
    m2 AS (SELECT greatest(max(abs(u)), 1) AS m FROM u2),
    v2 AS (SELECT dim, (1000 * u) // m AS v FROM u2, m2)
    SELECT CAST(v1.dim AS BIGINT) AS dim,
           CAST(v1.v AS BIGINT) AS v_iter1,
           CAST(v2.v AS BIGINT) AS v_iter2
    FROM v1 JOIN v2 ON v1.dim = v2.dim ORDER BY dim
    """


@register("embed_pca_power", oracle=_pca_sql())
def embed_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOP PRINCIPAL DIRECTION by matrix-free POWER ITERATION — the
    distributed-linear-algebra kernel behind PCA whitening, spectral
    outlier screens, and debiasing projections, with NO per-node matrix:
    each iteration is v ← XᵀXv computed as two map-reduce rounds
    (per-row dot dᵢ = xᵢ·v, then the rank-1 accumulation Σᵢ dᵢ·xᵢ),
    so the 64×64 Gram matrix never materializes and the pattern scales
    to dimension counts where it couldn't.  Two fixed iterations from
    the all-ones start, each renormalized to ±1000 by its max |entry|.

    Everything is integer: values quantize to micro ints up front, dot
    products shift by 2^14 before the rank-1 update (overflow headroom
    documented at the constant), and renormalization is integer
    division by a 1-row max — hash-identical across engines, immune to
    float sum order.

    Scale shape: per iteration one vec_id-keyed agg (the dot — runs on
    the exploded (vec,dim) rows with map-side partials) and one
    dim-keyed agg (the update — 64 output rows), with v broadcast both
    times (64 rows).  The explode is 64× row growth but fixed width;
    at 100 TB each round is two shuffles of partial sums, never data.
    """
    x = (
        T(spark, sf_dir, "embeddings")
        .select("vec_id", F.posexplode("embedding").alias("pos", "val"))
        .select(
            "vec_id",
            (F.col("pos") + 1).cast("long").alias("dim"),
            F.round(F.col("val").cast("double") * 1000000.0)
            .cast("long")
            .alias("xi"),
        )
        .localCheckpoint()
    )

    def normalize(u: DataFrame) -> DataFrame:
        m = u.agg(
            F.greatest(F.max(F.abs(F.col("u"))), F.lit(1)).alias("m")
        )
        return u.crossJoin(F.broadcast(m)).select(
            "dim", F.expr("(1000 * u) div m").alias("v")
        )

    def iterate(v: DataFrame) -> DataFrame:
        d = (
            x.join(F.broadcast(v), "dim")
            .groupBy("vec_id")
            .agg(F.expr(f"sum(xi * v) div {_DOT_SHIFT}").alias("dot"))
        )
        u = (
            x.join(d, "vec_id")
            .groupBy("dim")
            .agg(F.sum(F.col("xi") * F.col("dot")).alias("u"))
        )
        return normalize(u)

    dims = x.select("dim").distinct()
    v0 = dims.select("dim", F.lit(1000).alias("v"))
    v1 = iterate(v0).localCheckpoint()
    v2 = iterate(v1)
    return (
        v1.withColumnRenamed("v", "v_iter1")
        .join(v2.withColumnRenamed("v", "v_iter2"), "dim")
        .select(
            F.col("dim").cast("long").alias("dim"),
            F.col("v_iter1").cast("long").alias("v_iter1"),
            F.col("v_iter2").cast("long").alias("v_iter2"),
        )
        .orderBy("dim")
    )


# ---------------------------------------------------------------------------
# events_survival_curve — user-lifetime survival function
# ---------------------------------------------------------------------------


@register(
    "events_survival_curve",
    oracle="""
    WITH life AS (
      SELECT user_id,
             date_diff('day', min(ts), max(ts)) // 7 AS lifetime_weeks
      FROM events GROUP BY user_id
    ),
    hist AS (
      SELECT lifetime_weeks, CAST(count(*) AS BIGINT) AS n_ending
      FROM life GROUP BY lifetime_weeks
    ),
    tot AS (SELECT CAST(sum(n_ending) AS BIGINT) AS n FROM hist)
    SELECT CAST(lifetime_weeks AS BIGINT) AS week,
           n_ending,
           CAST(sum(n_ending) OVER (ORDER BY lifetime_weeks DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS n_surviving,
           CAST((1000000 * sum(n_ending) OVER (ORDER BY lifetime_weeks DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                // (SELECT n FROM tot) AS BIGINT) AS survival_micro
    FROM hist ORDER BY week
    """,
)
def events_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """USER SURVIVAL CURVE — for each week k, the fraction of users whose
    observed lifetime (first event → last event) lasted at least k weeks:
    the Kaplan-Meier-style retention summary product teams read next to
    the cohort matrix (``events_cohort_matrix`` shows WHEN users churn,
    this shows the aggregate hazard).

    Scale shape: one user-keyed agg collapses the fact table to
    |users| lifetimes, a lifetime-keyed agg collapses those to
    |weeks| histogram rows, and the reverse-cumulative survival count
    is a window over that dimension-sized histogram.  The 1-row total
    broadcasts; integer micro division keeps the fraction hash-exact.
    """
    life = (
        T(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.expr("datediff(max(ts), min(ts)) div 7").alias("lifetime_weeks")
        )
    )
    hist = life.groupBy("lifetime_weeks").agg(
        F.count(F.lit(1)).cast("long").alias("n_ending")
    )
    w = Window.orderBy(F.desc("lifetime_weeks")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # total as an unbounded window over the SAME dimension-sized histogram
    # (an agg + crossJoin would re-expand lineage into a second fact scan)
    wall = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        hist.withColumn("n_surviving", F.sum("n_ending").over(w).cast("long"))
        .withColumn("n_total", F.sum("n_ending").over(wall).cast("long"))
        .select(
            F.col("lifetime_weeks").cast("long").alias("week"),
            "n_ending",
            "n_surviving",
            F.expr("(1000000 * n_surviving) div n_total")
            .cast("long")
            .alias("survival_micro"),
        )
        .orderBy("week")
    )


# ---------------------------------------------------------------------------
# tokenizer_fertility — tokens-per-word / chars-per-token by segment
# ---------------------------------------------------------------------------


@register(
    "tokenizer_fertility",
    oracle="""
    WITH t AS (
      SELECT lang, source,
             len(string_split(trim(text), ' ')) AS ws_tokens,
             len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]'))
               AS bpe_ish_tokens,
             len(text) AS n_chars
      FROM documents WHERE len(text) > 0
    )
    SELECT lang, source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(ws_tokens) AS BIGINT) AS total_words,
           CAST(sum(bpe_ish_tokens) AS BIGINT) AS total_tokens,
           CAST((1000000 * sum(bpe_ish_tokens)) // greatest(sum(ws_tokens), 1)
                AS BIGINT) AS fertility_micro,
           CAST((1000000 * sum(n_chars)) // greatest(sum(bpe_ish_tokens), 1)
                AS BIGINT) AS chars_per_token_micro
    FROM t GROUP BY lang, source ORDER BY lang, source
    """,
)
def tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOKENIZER FERTILITY by segment — tokens-per-word and
    chars-per-token for every (lang, source) cell: the metric that
    decides whether a tokenizer under-serves a language (high fertility
    → more tokens per word → shorter effective context and higher
    training cost for that slice) and that turns token-budget planning
    (``mix_budget_waterfill``) from guesswork into measurement.

    Scale shape: the two token counts are scan-fused regex/split lengths
    (same kernels as ``text_tokens`` — no explode), followed by one
    (lang, source)-keyed hash agg with map-side partials; ratios are
    integer micro divisions of the aggregated sums, not per-doc floats.
    """
    t = (
        T(spark, sf_dir, "documents")
        .filter(F.length("text") > 0)
        .select(
            "lang",
            "source",
            F.size(F.split(F.trim(F.col("text")), " ")).alias("ws_tokens"),
            F.size(
                F.expr(r"regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]', 0)")
            ).alias("bpe_ish_tokens"),
            F.length("text").alias("n_chars"),
        )
    )
    return (
        t.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("ws_tokens").cast("long").alias("total_words"),
            F.sum("bpe_ish_tokens").cast("long").alias("total_tokens"),
            F.expr(
                "(1000000 * sum(bpe_ish_tokens)) div greatest(sum(ws_tokens), 1)"
            )
            .cast("long")
            .alias("fertility_micro"),
            F.expr(
                "(1000000 * sum(n_chars)) div greatest(sum(bpe_ish_tokens), 1)"
            )
            .cast("long")
            .alias("chars_per_token_micro"),
        )
        .orderBy("lang", "source")
    )
