"""Round-5 batch 6: association-rule lift, corpus novelty curves,
product-quantization codes, and robust (MAD) anomaly detection.

Contract as everywhere: portable md5-derived constants, integer
micro-units before cross-engine comparison, identical aliases both
engines.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_syncer_spark.queries.relational import T
from cassandra_syncer_spark.registry import register

# ---------------------------------------------------------------------------
# events_cooccurrence_lift — market-basket lift between event types
# ---------------------------------------------------------------------------


@register(
    "events_cooccurrence_lift",
    oracle="""
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
    n AS (SELECT count(DISTINCT user_id) AS n_users FROM events),
    t AS (SELECT event_type, count(*) AS n_t FROM ut GROUP BY event_type),
    p AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b, count(*) AS n_ab
      FROM ut a JOIN ut b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT p.type_a, p.type_b, CAST(p.n_ab AS BIGINT) AS n_ab,
           (1000000 * p.n_ab * n.n_users) // (ta.n_t * tb.n_t) AS lift_micro
    FROM p, n
    JOIN t ta ON p.type_a = ta.event_type
    JOIN t tb ON p.type_b = tb.event_type
    ORDER BY type_a, type_b
    """,
)
def events_cooccurrence_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule lift between event types: for every unordered
    type pair, P(a,b) / (P(a)·P(b)) over users — lift > 1 means the
    behaviors attract, < 1 they repel; the market-basket statistic
    driving recommendation and funnel design.

    Scale shape: the corpus first SHRINKS to distinct (user, type) —
    bounded by users × |types|, with map-side combine — and the pair
    join is user-local (≤ |types|² rows per user, never events²); the
    final frame is |types|² keys.  Lift is integer micro-units via exact
    integer division (counts are integers), so the matrix hash-matches.
    """
    ev = T(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    n_users = ev.agg(F.countDistinct("user_id").alias("n_users"))
    t = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_t"))
    a, b = ut.alias("a"), ut.alias("b")
    p = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
    )
    ta = t.select(F.col("event_type").alias("type_a"), F.col("n_t").alias("na"))
    tb = t.select(F.col("event_type").alias("type_b"), F.col("n_t").alias("nb"))
    return (
        p.join(F.broadcast(ta), "type_a")
        .join(F.broadcast(tb), "type_b")
        .crossJoin(F.broadcast(n_users))
        .select(
            "type_a",
            "type_b",
            "n_ab",
            F.expr("(1000000 * n_ab * n_users) div (na * nb)").alias("lift_micro"),
        )
        .orderBy("type_a", "type_b")
    )


# ---------------------------------------------------------------------------
# text_ngram_novelty — per-doc novelty against everything before it
# ---------------------------------------------------------------------------

_NOV_N = 8  # 8-gram granularity, matching decontam_ngram_overlap


@register(
    "text_ngram_novelty",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS words FROM documents
    ),
    g AS (
      -- gram positions derived from len(words) — no silent cap on doc length
      SELECT DISTINCT doc_id,
             md5(array_to_string(words[k : k + {_NOV_N - 1}], ' ')) AS gh
      FROM (
        SELECT doc_id, words,
               unnest(range(1, len(words) - {_NOV_N - 1} + 1)) AS k
        FROM w
      )
    ),
    first_seen AS (SELECT gh, min(doc_id) AS first_doc FROM g GROUP BY gh)
    SELECT g.doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(count(CASE WHEN f.first_doc = g.doc_id THEN 1 END) AS BIGINT)
             AS n_novel,
           (1000000 * count(CASE WHEN f.first_doc = g.doc_id THEN 1 END))
             // count(*) AS novelty_micro
    FROM g JOIN first_seen f ON g.gh = f.gh
    GROUP BY g.doc_id ORDER BY doc_id
    """,
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus novelty curve: per document, the fraction of its distinct
    8-grams that no earlier document (smaller doc_id = earlier ingest)
    contains — the diminishing-returns metric that tells a data pipeline
    when additional crawl of a source stops adding information.

    Scale shape: the gram explode is scan-fused (same kernel as
    `decontam_ngram_overlap`); grams collapse to distinct (doc, gram)
    then aggregate to one `min(doc_id)` row per gram hash — the only
    wide shuffles are keyed on the gram hash (linear in corpus grams,
    map-side combined), and the join back is a gh-keyed equi join
    (plan-asserted shuffle-count bound in tests/test_plans.py).  Output
    is one row per document.  Docs shorter than 8 words contribute no
    grams and drop out (identical rule both engines).
    """
    w = T(spark, sf_dir, "documents").select("doc_id", F.split("text", " ").alias("words"))
    g = (
        w.select(
            "doc_id",
            F.explode(
                # Guard short docs: sequence(1, 0) is DESCENDING in Spark and
                # slice(words, 0, n) throws — docs with < _NOV_N words must
                # emit no grams (the oracle's range() already emits nothing).
                F.expr(
                    f"IF(size(words) >= {_NOV_N},"
                    f" transform(sequence(1, size(words) - {_NOV_N - 1}),"
                    f" k -> md5(array_join(slice(words, k, {_NOV_N}), ' '))),"
                    f" array())"
                )
            ).alias("gh"),
        )
        .distinct()
    )
    first_seen = g.groupBy("gh").agg(F.min("doc_id").alias("first_doc"))
    return (
        g.join(first_seen, "gh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.count(F.when(F.col("first_doc") == F.col("doc_id"), 1))
            .cast("long")
            .alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_novel",
            F.expr("(1000000 * n_novel) div n_grams").alias("novelty_micro"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# embed_pq_quantize — product-quantization codes + reconstruction error
# ---------------------------------------------------------------------------

_PQ_SUBS = 8  # 64 dims -> 8 subvectors of 8
_PQ_SUBDIM = 8
_PQ_K = 16  # centroids per subspace


def _pq_centroid(s: int, c: int, d: int) -> float:
    """Deterministic codebook entry in [-1, 1): md5-derived, precomputed
    in Python and inlined as literals on BOTH engines (a synthetic
    codebook standing in for a trained one — production broadcasts the
    trained table; the assignment/error plumbing is identical)."""
    h = int(hashlib.md5(f"pq#{s}#{c}#{d}".encode()).hexdigest()[:8], 16)
    return (h % 2001 - 1000) / 1000.0


def _pq_dist(s: int, c: int, *, duck: bool) -> str:
    """Squared distance of subvector s to centroid (s, c): 8 squared
    terms in a left-associated chain — identical addition order both
    engines -> bitwise-identical doubles."""
    terms = []
    for d in range(_PQ_SUBDIM):
        i = s * _PQ_SUBDIM + d
        elem = f"v[{i + 1}]" if duck else f"v[{i}]"
        cen = repr(_pq_centroid(s, c, d))
        terms.append(f"({elem} - {cen}) * ({elem} - {cen})")
    return " + ".join(terms)


def _pq_cols_duck() -> list[str]:
    """Unrolled left-associated distance chains — DuckDB evaluates the
    oracle at validation scale only, so expression size is fine there."""
    cols = []
    err_terms = []
    for s in range(_PQ_SUBS):
        arr = ", ".join(
            f"CAST({_pq_dist(s, c, duck=True)} AS DOUBLE)" for c in range(_PQ_K)
        )
        cols.append(
            f"CAST(list_position([{arr}], list_min([{arr}])) - 1 AS BIGINT) AS code{s}"
        )
        err_terms.append(f"list_min([{arr}])")
    err = " + ".join(err_terms)
    cols.append(f"round({err}, 6) AS recon_err")
    return cols


def _pq_dist_cols_spark() -> list[str]:
    """``ds{s}``: each subspace's 16 squared distances as ONE staged
    column.  Round 11: ``_pq_cols_spark`` referenced every ``ds`` tree
    three times (argmin position, argmin value, error term), so the plan
    carried 3 copies of the codebook literals and the fold — measured
    0.68 s of pure Catalyst planning per run plus triple interpreted
    evaluation.  Staging the distances in their OWN projection keeps one
    copy (CollapseProject does not inline non-cheap expressions consumed
    more than once); the cheap ``array_min``/``array_position`` consumers
    read the staged column.  Bitwise-identical outputs — the expressions
    are unchanged, only de-duplicated."""
    dcols = []
    for s in range(_PQ_SUBS):
        cents = ", ".join(
            "array(" + ", ".join(repr(_pq_centroid(s, c, d)) for d in range(_PQ_SUBDIM)) + ")"
            for c in range(_PQ_K)
        )
        dcols.append(
            f"transform(array({cents}), cen -> "
            f"aggregate(zip_with(slice(v, {s * _PQ_SUBDIM + 1}, {_PQ_SUBDIM}), cen,"
            f" (x, y) -> (x - y) * (x - y)), 0D, (acc, t) -> acc + t)) AS ds{s}"
        )
    return dcols


def _pq_staged(df: DataFrame) -> DataFrame:
    """(vec_id, ds0..ds7): the per-subspace distance arrays, staged."""
    return df.selectExpr("vec_id", *_pq_dist_cols_spark())


def _pq_code_exprs() -> list[str]:
    """code{s} from a staged ``ds{s}`` column (argmin, ties → smallest id)."""
    return [
        f"CAST(array_position(ds{s}, array_min(ds{s})) - 1 AS BIGINT) AS code{s}"
        for s in range(_PQ_SUBS)
    ]


@register(
    "embed_pq_quantize",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
    SELECT vec_id, {', '.join(_pq_cols_duck())}
    FROM e ORDER BY vec_id
    """,
)
def embed_pq_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization: 64-dim vectors split into 8 subvectors, each
    assigned its nearest of 16 per-subspace centroids — 8 4-bit codes
    (4 B) replacing 256 B of floats, the 64× compression behind
    IVF-PQ/FAISS-scale ANN; `recon_err` (sum of the 8 squared residuals)
    is the quantization-quality audit column.  Fifth compression family
    beside int8, matryoshka truncation, JL projection, and sign codes.

    Scale shape: the codebook folds into the plan as literals (production
    broadcasts a trained table — same dataflow), assignment is pure
    scan-fused arithmetic: no joins, no shuffles, no UDFs; ties in the
    argmin go to the smallest centroid id on both engines (first index of
    the minimum), and every distance is a left-associated chain so the
    doubles — and therefore codes — are bitwise identical cross-engine.
    """
    # round-11: fan the per-vector codebook math across cores (one-row-group
    # scan, no-op at scale) and stage the distance arrays once — see
    # _pq_dist_cols_spark; 1.84 s → 0.89 s same-session, identical output
    from cassandra_syncer_spark.session import fan_out

    e = fan_out(
        T(spark, sf_dir, "embeddings").select(
            "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
        ),
        spark,
    )
    err = " + ".join(f"array_min(ds{s})" for s in range(_PQ_SUBS))
    return (
        _pq_staged(e)
        .selectExpr("vec_id", *_pq_code_exprs(), f"round({err}, 6) AS recon_err")
        .orderBy("vec_id")
    )


# ---------------------------------------------------------------------------
# events_anomaly_mad — robust outliers via median absolute deviation
# ---------------------------------------------------------------------------


@register(
    "events_anomaly_mad",
    oracle="""
    WITH staged AS (
      SELECT event_id, event_type, CAST(round(value * 100.0) AS BIGINT) AS vc
      FROM events
    ),
    med AS (
      SELECT event_type, quantile_cont(vc, 0.5) AS med
      FROM staged GROUP BY event_type
    ),
    dev AS (
      SELECT s.event_id, s.event_type, s.vc, m.med, abs(s.vc - m.med) AS ad
      FROM staged s JOIN med m ON s.event_type = m.event_type
    ),
    mad AS (
      SELECT event_type, quantile_cont(ad, 0.5) AS mad FROM dev GROUP BY event_type
    )
    SELECT d.event_id, d.event_type,
           round(d.ad / nullif(1.4826 * t.mad, 0.0), 4) AS robust_z
    FROM dev d JOIN mad t ON d.event_type = t.event_type
    WHERE round(d.ad / nullif(1.4826 * t.mad, 0.0), 4) > 3.5
    ORDER BY event_id
    """,
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection: modified z-score |x - median| /
    (1.4826·MAD) per event type, flagging > 3.5 — the estimator that
    survives what breaks `events_anomaly_zscore`: heavy outliers inflate
    the mean/stddev and mask themselves, while median/MAD have a 50%
    breakdown point.

    Scale shape: two grouped exact medians over integer cents (at 100 TB
    swap each for `approx_percentile`, the same escape hatch as
    `agg_percentile`) plus two broadcast join-backs of 5-row stats
    frames; medians of integers land on k or k.5 — exactly representable
    doubles — so the division is bitwise-identical cross-engine and the
    rounded cut matches.  The threshold applies to the ROUNDED score on
    both engines.
    """
    staged = T(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100.0).cast("long").alias("vc"),
    )
    med = staged.groupBy("event_type").agg(F.expr("percentile(vc, 0.5)").alias("med"))
    dev = staged.join(F.broadcast(med), "event_type").select(
        "event_id", "event_type", F.abs(F.col("vc") - F.col("med")).alias("ad")
    )
    mad = dev.groupBy("event_type").agg(F.expr("percentile(ad, 0.5)").alias("mad"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .select(
            "event_id",
            "event_type",
            # nullif: a >50%-constant segment has MAD = 0 — null robust_z
            # drops at the filter instead of an ANSI DIVIDE_BY_ZERO abort
            F.round(
                F.col("ad") / F.nullif(F.lit(1.4826) * F.col("mad"), F.lit(0.0)), 4
            ).alias("robust_z"),
        )
        .filter(F.col("robust_z") > 3.5)
        .orderBy("event_id")
    )
