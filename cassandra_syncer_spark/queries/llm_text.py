"""Text-analysis operators over the ``documents`` table — SURVEY.md §2.10
and the mandated training-data-pipeline surface: normalization, token
counting, quality scoring, language-ID, document fingerprinting.

Everything is built-in expression work (JVM-side, whole-stage codegen);
fingerprints use the portable md5-based hash from operators/fingerprint.py
so the DuckDB oracle evaluates the identical formula.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_syncer_spark.operators import fingerprint as fp
from cassandra_syncer_spark.queries.relational import T
from cassandra_syncer_spark.registry import register


@register(
    "text_normalize",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g') AS norm
      FROM documents
    )
    SELECT doc_id,
           md5(norm) AS norm_md5,
           CAST(len(list_filter(string_split(norm, ' '), w -> w <> '')) AS BIGINT)
             AS n_tokens,
           CAST(length(norm) AS BIGINT) AS n_chars_norm
    FROM t
    """,
)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalize (lowercase, strip non-alphanumerics) + tokenize + stats.
    The md5 of the normalized text is a strong cross-engine check."""
    docs = T(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower("text"), "[^a-z0-9 ]", " ")
    toks = F.filter(F.split(norm, " "), lambda w: w != "")
    return docs.select(
        "doc_id",
        F.md5(norm).alias("norm_md5"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.length(norm).cast("long").alias("n_chars_norm"),
    )


@register(
    "text_tokens",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS BIGINT)
             AS bpe_ish_tokens,
           CAST(ceil(length(text) / 4.0) AS BIGINT) AS byte_len_estimate
    FROM documents
    """,
)
def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish regex tokenizer count +
    the chars/4 heuristic used for LLM budget estimates."""
    docs = T(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), " ")).cast("long").alias("ws_tokens"),
        F.size(F.expr(r"regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]', 0)"))
        .cast("long")
        .alias("bpe_ish_tokens"),
        F.ceil(F.length("text") / 4.0).cast("long").alias("byte_len_estimate"),
    )


@register(
    "text_quality",
    oracle="""
    WITH t AS (
      SELECT doc_id, n_chars,
             string_split(text, ' ') AS words,
             len(regexp_extract_all(text, '[.!?,;]')) AS n_punct
      FROM documents
    ), s AS (
      SELECT doc_id, n_chars, n_punct,
             len(words) AS n_words,
             len(list_filter(words, w -> w IN ('the','a','of','to','and','in')))
               AS n_stop
      FROM t
    )
    SELECT doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           round(CAST(n_stop AS DOUBLE) / n_words, 8) AS stopword_ratio,
           round(CAST(n_punct AS DOUBLE) / nullif(n_chars, 0), 8) AS punct_ratio,
           round(CAST(n_chars AS DOUBLE) / n_words, 8) AS avg_word_len,
           CASE WHEN n_words >= 50 AND CAST(n_stop AS DOUBLE) / n_words > 0.05
                THEN 1 ELSE 0 END AS passes_quality
    FROM s
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length / stopword ratio / punctuation ratio — the
    standard cheap pre-filters of a training-data pipeline."""
    docs = T(spark, sf_dir, "documents")
    words = F.split("text", " ")
    stop = F.filter(words, lambda w: w.isin("the", "a", "of", "to", "and", "in"))
    n_words = F.size(words)
    n_stop = F.size(stop)
    n_punct = F.size(F.expr("regexp_extract_all(text, '[.!?,;]', 0)"))
    return docs.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        F.round(n_stop.cast("double") / n_words, 8).alias("stopword_ratio"),
        # nullif: an empty doc has n_chars = 0 and ANSI division throws —
        # its punct ratio is undefined (NULL), identically on both engines
        F.round(
            n_punct.cast("double") / F.expr("nullif(n_chars, 0)"), 8
        ).alias("punct_ratio"),
        F.round(F.col("n_chars").cast("double") / n_words, 8).alias("avg_word_len"),
        F.when((n_words >= 50) & (n_stop.cast("double") / n_words > 0.05), 1)
        .otherwise(0)
        .alias("passes_quality"),
    )


@register(
    "text_langid",
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
    )
    SELECT doc_id, lang,
           CASE WHEN s_en >= s_fr AND s_en >= s_es AND s_en >= s_de AND s_en > 0 THEN 'en'
                WHEN s_fr >= s_es AND s_fr >= s_de AND s_fr > 0 THEN 'fr'
                WHEN s_es >= s_de AND s_es > 0 THEN 'es'
                WHEN s_de > 0 THEN 'de'
                ELSE 'unknown' END AS pred_lang,
           CAST(s_en AS BIGINT) AS s_en
    FROM scores
    """,
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID via marker-word scoring (n-gram heuristic).

    The fixture corpus shares one synthetic vocabulary across lang labels
    (verified), so this checks the *operator* — deterministic argmax over
    marker-set hit counts with a fixed preference order — not real-world
    accuracy.  A production version swaps the marker sets for char-n-gram
    profiles; the dataflow (one filter+size per class, argmax) is identical.
    """
    docs = T(spark, sf_dir, "documents")
    words = F.split(F.lower("text"), " ")

    def score(markers: list[str]):
        return F.size(F.filter(words, lambda w: w.isin(*markers)))

    s_en = score(["the", "a", "of", "and", "is"])
    s_fr = score(["le", "la", "de", "et", "un"])
    s_es = score(["el", "la", "de", "y", "un"])
    s_de = score(["der", "die", "das", "und", "ein"])
    return docs.select(
        "doc_id",
        "lang",
        F.when((s_en >= s_fr) & (s_en >= s_es) & (s_en >= s_de) & (s_en > 0), "en")
        .when((s_fr >= s_es) & (s_fr >= s_de) & (s_fr > 0), "fr")
        .when((s_es >= s_de) & (s_es > 0), "es")
        .when(s_de > 0, "de")
        .otherwise("unknown")
        .alias("pred_lang"),
        s_en.cast("long").alias("s_en"),
    )


def _uwords(duck: bool) -> str:
    distinct = "list_distinct" if duck else "array_distinct"
    return f"{distinct}({fp.words_expr('text', duck=duck)})"


@register(
    "text_fingerprint",
    oracle=f"""
    WITH h AS (
      SELECT doc_id,
             {fp.hash_array_expr(_uwords(True), duck=True)} AS harr,
             {fp.words_expr('text', duck=True)} AS words
      FROM documents
    )
    SELECT doc_id,
           CAST({fp.simhash_expr('harr', duck=True)} AS BIGINT) AS simhash32,
           list_min(list_transform(words, w -> md5(w))) AS min_word_md5
    FROM h
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: 32-bit SimHash over distinct words + a
    1-perm MinHash (min word md5).  Same md5-derived hash on both engines
    (operators/fingerprint.py); pure higher-order expressions, no UDF."""
    T(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        f"""
        WITH h AS (
          SELECT doc_id,
                 {fp.hash_array_expr(_uwords(False), duck=False)} AS harr,
                 {fp.words_expr('text', duck=False)} AS words
          FROM documents
        )
        SELECT doc_id,
               CAST({fp.simhash_expr('harr', duck=False)} AS BIGINT) AS simhash32,
               array_min(transform(words, w -> md5(w))) AS min_word_md5
        FROM h
        """
    )
