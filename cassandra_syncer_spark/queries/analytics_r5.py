"""Round-5 additions: the scalable two-stage decontamination pipeline.

``text_contamination_exact`` (analytics_r4.py) is the strict broadcast
nested-loop check — correct, but its cost is corpus × |eval| substring
tests.  This module implements its documented upgrade path: a word-gram
hash PREFILTER (the same explode pattern as ``decontam_ngram_overlap``)
generates an equi-join candidate set first, and the exact ``contains``
verify runs on candidates only — the MinHash→Jaccard two-stage pattern
applied to decontamination.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_syncer_spark.queries.relational import T
from cassandra_syncer_spark.registry import register

#: words per prefilter gram — small enough that every ≥5-word snippet
#: yields one, large enough that chance gram collisions stay rare
_GRAM_W = 4


@register(
    "text_contamination_prefiltered",
    oracle=f"""
    WITH snip AS (
      SELECT doc_id AS eval_id, substr(text, 1, 80) AS snippet
      FROM documents WHERE doc_id % 29 = 0
    ),
    sg AS (
      SELECT eval_id, snippet,
             md5(array_to_string((string_split(snippet, ' '))[1:{_GRAM_W}], ' ')) AS g
      FROM snip
      WHERE len(string_split(snippet, ' ')) >= {_GRAM_W + 1}
    ),
    tw AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    tg AS (
      SELECT doc_id, md5(array_to_string(w[i:i+{_GRAM_W - 1}], ' ')) AS g
      FROM tw, LATERAL (
        SELECT unnest(range(1, greatest(len(w) - {_GRAM_W - 1}, 0) + 1)) AS i)
    ),
    cand AS (
      SELECT DISTINCT tg.doc_id, sg.eval_id, sg.snippet
      FROM tg JOIN sg USING (g)
    )
    SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_hits
    FROM cand c JOIN documents d ON c.doc_id = d.doc_id
    WHERE contains(d.text, c.snippet) AND c.doc_id <> c.eval_id
    GROUP BY c.doc_id ORDER BY c.doc_id
    """,
)
def text_contamination_prefiltered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gram-prefiltered exact-substring decontamination — the 100 TB
    shape of ``text_contamination_exact``: candidates from an EQUI join
    on a word-gram hash, exact ``contains`` verify on candidates only.

    Stage 1 (prefilter): each eval snippet contributes the md5 of its
    first 4 words (the snippet starts at char 1 of the eval doc, so
    those words are intact; only the final word can be clipped by the
    80-char cut).  The training side explodes every 4-word gram the same
    way.  A doc whose text contains the snippet at a word boundary
    necessarily contains that gram, so the equi join is a candidate
    superset for word-aligned matches; mid-word matches — impossible for
    this corpus's space-delimited text, and excluded by real pipelines'
    tokenize-both-sides normalization — are the documented residual
    (tests assert output equality with the exact query on fixtures).

    Stage 2 (verify): distinct (doc_id, eval_id) candidates join back to
    the corpus by doc_id for the exact substring test — a hash join
    touching only candidate docs, replacing the corpus × |eval|
    nested-loop.  Snippets too short to yield a gram (<5 words) simply
    produce no candidates; at fixture scale none exist (min doc length
    ≫ 80 chars), and a production run would route them through the tiny
    exact broadcast path.

    Scale: both gram streams are fixed-width md5 keys; the eval side is
    benchmark-sized and broadcasts; the corpus gram stream never
    shuffles.  Candidate volume ≈ true leaks + rare gram collisions, so
    the verify join is output-bounded, not corpus-bounded.
    """
    docs = T(spark, sf_dir, "documents")
    snip = docs.filter(F.col("doc_id") % 29 == 0).select(
        F.col("doc_id").alias("eval_id"), F.substring("text", 1, 80).alias("snippet")
    )
    sg = (
        snip.withColumn("sw", F.split("snippet", " "))
        .filter(F.size("sw") >= _GRAM_W + 1)
        .select(
            "eval_id",
            "snippet",
            F.md5(F.concat_ws(" ", F.slice("sw", 1, _GRAM_W))).alias("g"),
        )
    )
    # guard the sequence bound: Spark's sequence(1, 0) counts DOWN, so an
    # under-length doc must map to an empty gram array, not [1, 0].
    # words projected BEFORE the lambda — no CSE across higher-order
    # function boundaries, an inline split would re-split per element
    tg = docs.select("doc_id", F.split("text", " ").alias("w")).select(
        "doc_id",
        F.explode(
            F.expr(
                f"CASE WHEN size(w) >= {_GRAM_W} THEN "
                f"transform(sequence(1, size(w) - {_GRAM_W - 1}), "
                f"i -> md5(concat_ws(' ', slice(w, i, {_GRAM_W})))) "
                "ELSE array() END"
            )
        ).alias("g"),
    )
    cand = (
        tg.join(F.broadcast(sg), "g")
        .select("doc_id", "eval_id", "snippet")
        .distinct()
    )
    return (
        cand.join(docs.select("doc_id", "text"), "doc_id")
        .filter(F.contains(F.col("text"), F.col("snippet")) & (F.col("doc_id") != F.col("eval_id")))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
        .orderBy("doc_id")
    )
