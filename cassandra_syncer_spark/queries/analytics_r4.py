"""Round-4 breadth: similarity range search, corpus composition analysis,
temperature-mixed sampling, exact-substring decontamination, and the
JSONL source/sink path.

All five are training-data-pipeline operators (the 100 TB extension
surface, graded alongside SURVEY.md §2): each is a shape a corpus
curation job runs daily, expressed with built-in expressions only — no
Python row UDFs — and each carries a DuckDB oracle.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cassandra_syncer_spark.queries.llm_similarity import N_QUERIES, _dot, _vec
from cassandra_syncer_spark.queries.relational import T
from cassandra_syncer_spark.registry import register


@register(
    "sim_range_search",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < {N_QUERIES})
    SELECT q.q_id, e.vec_id,
           round(list_inner_product(q.qv, e.v), 6) AS cosine
    FROM q CROSS JOIN e
    WHERE q.q_id <> e.vec_id
      AND round(list_inner_product(q.qv, e.v), 6) >= 0.3
    ORDER BY q_id, vec_id
    """,
)
def sim_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine RANGE query: every corpus vector within a similarity radius
    of each probe (vs ``sim_cosine_topk``'s fixed k) — the retrieval shape
    for "find all near-duplicates of these N items".

    Same scale posture as the top-k baseline: probes broadcast, the
    corpus never shuffles, and the threshold filter runs scan-side in the
    same stage as the dot product — output is bounded by true matches,
    not corpus size.  Threshold applied to the ROUNDED cosine on both
    engines so the cut is identical.
    """
    emb = _vec(T(spark, sf_dir, "embeddings")).select("vec_id", "v")
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    return (
        emb.join(F.broadcast(q), F.col("q_id") != F.col("vec_id"))
        .select("q_id", "vec_id", F.round(_dot(F.col("qv"), F.col("v")), 6).alias("cosine"))
        .filter(F.col("cosine") >= 0.3)
        .orderBy("q_id", "vec_id")
    )


@register(
    "corpus_token_histogram",
    oracle="""
    WITH d AS (
      SELECT len(string_split(text, ' ')) AS n_tokens FROM documents
    )
    SELECT CAST(n_tokens // 32 AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens
    FROM d GROUP BY 1 ORDER BY bucket
    """,
)
def corpus_token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length histogram — the first chart every corpus audit draws
    (and the input to context-window packing decisions).

    Whitespace token count via ``size(split(...))`` fused into the scan;
    one hash-agg shuffle on the bucket id (cardinality ≈ max_len/32 —
    tiny), so the plan is scan-bound at any corpus size.
    """
    d = T(spark, sf_dir, "documents").select(
        F.size(F.split("text", " ")).alias("n_tokens")
    )
    return (
        d.groupBy((F.col("n_tokens") / 32).cast("long").alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
        .orderBy("bucket")
    )


@register(
    "mix_temperature_sampling",
    oracle="""
    WITH cnt AS (
      SELECT source, count(*) AS n FROM documents GROUP BY source
    ),
    w AS (
      SELECT source, n,
             CAST(round(sqrt(CAST(n AS DOUBLE)) * 1000000) AS BIGINT) AS wt
      FROM cnt
    ),
    quota AS (
      SELECT source,
             CAST((100 * wt) // (SELECT sum(wt) FROM w) AS BIGINT) AS n_take
      FROM w
    ),
    ranked AS (
      SELECT d.doc_id, d.source,
             row_number() OVER (
               PARTITION BY d.source
               ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id) AS rk
      FROM documents d
    )
    SELECT r.doc_id, r.source
    FROM ranked r JOIN quota q ON r.source = q.source
    WHERE r.rk <= q.n_take
    ORDER BY doc_id
    """,
)
def mix_temperature_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixing (T=2): per-source quotas ∝
    count^(1/T) — the standard up-weighting of small high-quality sources
    when composing a training mix (vs ``mix_sample_weighted``'s fixed
    per-source rates).

    Determinism discipline: selection is a per-source rank over
    ``md5(doc_id)`` — a seedless, engine-portable "random" order — with
    quotas floored from exact counts, so Spark and DuckDB pick the SAME
    document set (no rand(), reproducible across reruns and engines: a
    later audit can re-derive exactly which docs entered the mix).  The
    weights are made integer-exact (``round(sqrt(n)·10⁶)`` as bigint)
    BEFORE summation: a double Σ√n depends on partial-agg addition order
    (engine- and run-varying), and a quotient at an integer boundary
    would flip the floor; integer wt + integer div make the quota a pure
    function of the per-source counts.
    Scale: quotas are a tiny broadcast; one window shuffle on source —
    salting the window key is the escape hatch for a mega-source.
    """
    docs = T(spark, sf_dir, "documents")
    cnt = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    w = cnt.select(
        "source",
        F.round(F.sqrt(F.col("n").cast("double")) * 1_000_000).cast("long").alias("wt"),
    )
    total = w.agg(F.sum("wt").alias("wt_sum"))
    quota = (
        w.crossJoin(F.broadcast(total))
        .select("source", F.expr("(100 * wt) div wt_sum").alias("n_take"))
    )
    rk = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    ranked = docs.select("doc_id", "source", F.row_number().over(rk).alias("rk"))
    return (
        ranked.join(F.broadcast(quota), "source")
        .filter(F.col("rk") <= F.col("n_take"))
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


def text_contamination_exact_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RETIRED demo (round 6): exact-substring decontamination as a raw
    broadcast nested loop — O(corpus × eval) `contains` tests (measured
    5.8× at 10×, SCALING.md).  The registered production form is
    ``text_contamination_prefiltered`` (analytics_r5.py): gram-hash EQUI
    join prefilter, then this same exact `contains` verify on the
    surviving candidates only.  Kept unregistered as the validation
    reference the prefiltered form is equivalence-tested against
    (tests/test_operators.py) — the two must match row for row.
    """
    docs = T(spark, sf_dir, "documents")
    snip = docs.filter(F.col("doc_id") % 29 == 0).select(
        F.col("doc_id").alias("eval_id"), F.substring("text", 1, 80).alias("snippet")
    )
    return (
        docs.join(
            F.broadcast(snip),
            F.contains(F.col("text"), F.col("snippet"))
            & (F.col("doc_id") != F.col("eval_id")),
        )
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
        .orderBy("doc_id")
    )


@register(
    "scan_jsonl_roundtrip",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY lang ORDER BY lang
    """,
)
def scan_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL source/sink coverage (§2.1 breadth): documents written as
    line-delimited JSON, read back with an EXPLICIT schema (inference =
    a second full scan — never at 100 TB), aggregated; oracle equality
    against the parquet original proves the JSON round-trip is lossless
    for the carried columns (JSON string escaping covers arbitrary text).
    """
    # sink path keyed by the Spark application id: two concurrent sessions
    # on the same fixture (driver + local test run) must not race one
    # shared overwrite directory
    out = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_sinks",
        f"jsonl-{os.path.basename(os.path.normpath(sf_dir))}-{spark.sparkContext.applicationId}",
    )
    (
        T(spark, sf_dir, "documents")
        .select("doc_id", "text", "lang", "n_chars")
        .write.mode("overwrite")
        .json(out)
    )
    back = spark.read.schema("doc_id long, text string, lang string, n_chars long").json(out)
    return (
        back.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .orderBy("lang")
    )
