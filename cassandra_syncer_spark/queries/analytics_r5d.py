"""Round-5 batch 4: quality-classifier scoring, edit-distance verify,
behavioral transition matrices, random-projection sketching, and
multi-probe IVF — the remaining model-pipeline scale patterns.

Everything is oracle-checked: weights/signs/buckets are md5-derived (or
Python-precomputed from md5 and inlined as literals) so DuckDB evaluates
the identical arithmetic — see operators/fingerprint.py for the shared
hash builders and the portability rationale.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cassandra_syncer_spark.operators import fingerprint as fp
from cassandra_syncer_spark.queries.relational import T
from cassandra_syncer_spark.registry import register

# ---------------------------------------------------------------------------
# text_quality_linear — hashed-feature linear classifier scoring
# ---------------------------------------------------------------------------

# per-token weight in micro-units: md5-derived pseudo-weights standing in
# for a trained model's hashed-feature table.  In production the weights
# are a broadcast array indexed by (hash32(token) % D); here the weight is
# derived directly from the token hash so the oracle can recompute it.
_TOK_FEAT = "concat('q#', t)"
_W_SPARK = f"({fp.hash32(_TOK_FEAT, duck=False)}) % 2001 - 1000"
_W_DUCK = f"({fp.hash32(_TOK_FEAT, duck=True)}) % 2001 - 1000"


@register(
    "text_quality_linear",
    oracle=f"""
    WITH d AS (SELECT doc_id, source, string_split(lower(text), ' ') AS toks
               FROM documents)
    SELECT doc_id, source,
           CAST(len(toks) AS BIGINT) AS n_tok,
           CAST(list_sum(list_transform(toks, t -> {_W_DUCK})) AS BIGINT)
             AS score_micro,
           CAST(list_sum(list_transform(toks, t -> {_W_DUCK})) >= 0 AS BOOLEAN)
             AS keep
    FROM d ORDER BY doc_id
    """,
)
def text_quality_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-style linear quality classifier scoring: every token maps
    to a hashed feature whose weight is summed into a per-document score,
    and the sign of the score gates the document — the shape of the
    'model-based quality filter' stage every LLM data pipeline runs
    (the trained weights here are md5-derived stand-ins; production
    broadcasts the real weight table and indexes it by the same hash).

    Scale shape: the entire classifier is one scan-fused higher-order
    fold per row (transform + aggregate over the token array) — no
    explode, no shuffle, no UDF; 100 TB of text scores at scan speed and
    the output is one row per document.  Weights stay integer micro-units
    so the score is exact and the keep-cut identical on both engines.
    """
    d = T(spark, sf_dir, "documents")
    score = F.expr(
        f"aggregate(transform(split(lower(text), ' '), t -> {_W_SPARK}), "
        f"cast(0 as bigint), (acc, x) -> acc + x)"
    )
    return (
        d.select(
            "doc_id",
            "source",
            F.size(F.split(F.lower("text"), " ")).cast("long").alias("n_tok"),
            score.alias("score_micro"),
            (score >= 0).alias("keep"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# dedup_verify_edit — band-blocked edit-distance verify
# ---------------------------------------------------------------------------

_EDIT_PREFIX = 400  # bound the DP width: verify on a fixed prefix
_EDIT_MAX = 100  # verify cut: pairs beyond this distance are not near-dups


def _edit_sql() -> str:
    from cassandra_syncer_spark.queries.llm_dedup import _band_union, _minhash_cte

    return f"""
    {_minhash_cte(True)},
    bands AS ({_band_union(True)}),
    cand AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_id = b.band_id AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    p AS (SELECT doc_id, substr(text, 1, {_EDIT_PREFIX}) AS pre FROM documents)
    SELECT c.doc_a, c.doc_b,
           CAST(levenshtein(pa.pre, pb.pre) AS BIGINT) AS edit_dist,
           -- mx=0 guard: two empty texts that band-collide are a perfect
           -- match, not a division by zero
           CASE WHEN greatest(len(pa.pre), len(pb.pre)) = 0 THEN 1000000
                ELSE (1000000 * (greatest(len(pa.pre), len(pb.pre))
                                 - levenshtein(pa.pre, pb.pre)))
                     // greatest(len(pa.pre), len(pb.pre)) END AS edit_sim_micro
    FROM cand c
    JOIN p pa ON c.doc_a = pa.doc_id
    JOIN p pb ON c.doc_b = pb.doc_id
    WHERE levenshtein(pa.pre, pb.pre) <= {_EDIT_MAX}
    ORDER BY doc_a, doc_b
    """


@register("dedup_verify_edit", oracle=_edit_sql())
def dedup_verify_edit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance verify stage over MinHash band candidates — the
    character-level complement to ``dedup_verify_jaccard`` (word-set
    Jaccard misses transpositions and near-identical boilerplate with
    token-level noise; Levenshtein catches both).  Survivors only: pairs
    beyond distance 100 on the 400-char prefix are cut (they are not
    near-dups; a verify stage's contract is the cut, not a distance
    report for arbitrary pairs).

    Scale shape: candidate volume is bounded by the banding math, and the
    per-pair DP is double-screened — the two levers that matter on a
    dup-heavy corpus, where candidates are dominated by pairs that are
    either IDENTICAL or WILDLY DIFFERENT, and only the thin near-miss
    band needs the quadratic work:
    - exact-equality short-circuit: ``IF(pa = pb, 0, …)`` resolves
      identical prefixes (the bulk of true dup pairs in a crawl) with an
      O(n) compare instead of the DP;
    - thresholded DP for the rest: Spark's 3-arg ``levenshtein(a, b, k)``
      computes a banded O(n·k) strip, never the full n×m table, and
      returns -1 exactly when the true distance exceeds k — the same cut
      DuckDB's oracle applies on the full DP at validation scale.
    Measured on the 10x dup-heavy replica (404k candidates, ~all
    equal-prefix): unscreened full DP 268 s; threshold alone 362 s (no
    help — equal 400-char prefixes defeat the length-diff early-exit and
    true dups legitimately need the DP); with the equality short-circuit
    the DP runs only on the unequal minority.  Similarity is integer
    micro-units ((max_len - dist) * 1e6 // max_len), exact both engines.
    JVM-side — no Python in the loop.
    """
    from cassandra_syncer_spark.queries.llm_dedup import _minhash_pairs

    cand = _minhash_pairs(spark, sf_dir).select("doc_a", "doc_b")
    pre = T(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, _EDIT_PREFIX).alias("pre")
    )
    pa, pb = pre.alias("pa"), pre.alias("pb")
    return (
        cand.join(pa, cand.doc_a == F.col("pa.doc_id"))
        .join(pb, cand.doc_b == F.col("pb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            F.expr(
                f"IF(pa.pre = pb.pre, 0L,"
                f" CAST(levenshtein(pa.pre, pb.pre, {_EDIT_MAX}) AS BIGINT))"
            ).alias("edit_dist"),
            F.greatest(F.length("pa.pre"), F.length("pb.pre")).alias("mx"),
        )
        .filter((F.col("edit_dist") >= 0) & (F.col("edit_dist") <= _EDIT_MAX))
        .select(
            "doc_a",
            "doc_b",
            "edit_dist",
            F.expr(
                "IF(mx = 0, 1000000L, (1000000 * (mx - edit_dist)) div mx)"
            ).alias("edit_sim_micro"),
        )
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# events_markov_transitions — behavioral transition matrix
# ---------------------------------------------------------------------------


@register(
    "events_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT event_type AS src,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY epoch_ns(ts), event_id) AS dst
      FROM events
    ),
    t AS (SELECT src, dst, count(*) AS n FROM seq
          WHERE dst IS NOT NULL GROUP BY src, dst)
    SELECT src, dst, CAST(n AS BIGINT) AS n,
           CAST((1000000 * n) // CAST(sum(n) OVER (PARTITION BY src) AS BIGINT)
                AS BIGINT) AS p_micro
    FROM t ORDER BY src, dst
    """,
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next event type | current event type) — the behavioral
    fingerprint driving sessionization QA, bot detection, and journey
    analysis.

    Scale shape: ONE shuffle on user_id (the lead window), then the
    count agg collapses to |types|² keys with map-side combine — the
    transition matrix is tiny regardless of event volume, and the
    row-probability normalization windows over that tiny frame, never
    the raw events.  Probabilities are integer micro-units via exact
    integer division, so the matrix hash-matches cross-engine.
    """
    ev = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    seq = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    t = seq.groupBy("src", "dst").agg(F.count(F.lit(1)).cast("long").alias("n"))
    wsrc = Window.partitionBy("src")
    return (
        t.withColumn("row_total", F.sum("n").over(wsrc))
        .select(
            "src",
            "dst",
            "n",
            F.expr("(1000000 * n) div row_total").alias("p_micro"),
        )
        .orderBy("src", "dst")
    )


# ---------------------------------------------------------------------------
# embed_random_projection — Johnson–Lindenstrauss sign sketch
# ---------------------------------------------------------------------------

_IN_DIMS = 64
_OUT_DIMS = 8


def _rp_sign(j: int, i: int) -> int:
    """Deterministic ±1 from md5 — precomputed in Python and inlined as
    literals in BOTH engines' expressions (the md5 formula is the same
    one fingerprint.hash32 evaluates in SQL, hoisted to plan-time)."""
    h = int(hashlib.md5(f"rp#{j}#{i}".encode()).hexdigest()[:8], 16)
    return 1 if h % 2 == 0 else -1


def _rp_terms(j: int, *, duck: bool) -> str:
    """Left-associated chain of 64 sign·component products — identical
    addition order on both engines, so the double result is bitwise
    identical before rounding."""
    terms = []
    for i in range(_IN_DIMS):
        s = _rp_sign(j, i)
        elem = f"v[{i + 1}]" if duck else f"v[{i}]"
        terms.append(f"({s}) * {elem}" if s < 0 else elem)
    return " + ".join(terms)


@register(
    "embed_random_projection",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
    SELECT vec_id,
           {', '.join(f'round({_rp_terms(j, duck=True)}, 6) AS p{j}' for j in range(_OUT_DIMS))}
    FROM e ORDER BY vec_id
    """,
)
def embed_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss sign-matrix random projection 64 → 8 dims:
    each output component is Σᵢ sᵢⱼ·vᵢ with sᵢⱼ ∈ ±1 derived from md5
    — the classic embedding-sketch that preserves pairwise distances in
    expectation at an 8× storage/bandwidth cut, feeding cheap first-pass
    clustering and dedup blocking.

    Scale shape: pure scan-fused projection — the sign matrix folds into
    the plan as literals (zero lookup joins), no shuffle, no UDF; 100 TB
    of embeddings sketch at scan speed.  The 64-term sums are emitted as
    left-associated chains so both engines add in the same order →
    bitwise-identical doubles → the round(…,6) output hash-matches.
    """
    e = T(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    return e.select(
        "vec_id",
        *[
            F.expr(f"round({_rp_terms(j, duck=False)}, 6)").alias(f"p{j}")
            for j in range(_OUT_DIMS)
        ],
    ).orderBy("vec_id")


# ---------------------------------------------------------------------------
# sim_ivf_multiprobe — multi-probe IVF (hash-checked)
# ---------------------------------------------------------------------------


def _multiprobe_sql() -> str:
    from cassandra_syncer_spark.queries.llm_similarity import N_QUERIES, TOP_K

    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cent AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < 8),
    assign AS (
      SELECT e.vec_id, e.v, c.c_id,
             row_number() OVER (
               PARTITION BY e.vec_id
               ORDER BY round(list_inner_product(e.v, c.cv), 6) DESC, c.c_id) AS rn
      FROM e CROSS JOIN cent c
    ),
    cells AS (SELECT vec_id, v, c_id AS cell FROM assign WHERE rn = 1),
    q AS (SELECT vec_id AS q_id, v AS qv, c_id AS cell
          FROM assign WHERE vec_id < {N_QUERIES} AND rn <= 2),
    scored AS (
      SELECT q.q_id, c.vec_id, round(list_inner_product(q.qv, c.v), 6) AS cosine,
             row_number() OVER (
               PARTITION BY q.q_id
               ORDER BY round(list_inner_product(q.qv, c.v), 6) DESC, c.vec_id) AS rn
      FROM q JOIN cells c ON q.cell = c.cell AND q.q_id <> c.vec_id
    )
    SELECT q_id, vec_id, cosine, CAST(rn AS BIGINT) AS rn
    FROM scored WHERE rn <= {TOP_K}
    """


@register("sim_ivf_multiprobe", oracle=_multiprobe_sql())
def sim_ivf_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe IVF: probes search their TWO nearest cells instead of
    one — the standard recall lever when a query lands near a Voronoi
    boundary (its true neighbors sit just across it).  Same unified
    ``ivf_topk`` code path as ``sim_ivf_ann``/``sim_ivf_kmeans``; with
    the deterministic fixed quantizer the whole n_probe=2 dataflow is
    DuckDB-expressible, making this the HASH-CHECKED certification of
    the multi-probe plumbing the rows-only k-means variant relies on.

    Scale shape: unchanged from single-probe — the corpus stays
    partitioned by cell, each probe now broadcasts to 2 cells'
    partitions (probed fraction 2/n_cells, still ≪ the corpus); recall
    rises measurably (see test_ivf_recall_both_quantizers) while the
    scan cost stays cell-local.
    """
    from cassandra_syncer_spark.queries.llm_similarity import ivf_topk

    return ivf_topk(spark, sf_dir, quantizer="fixed", n_probe=2)
