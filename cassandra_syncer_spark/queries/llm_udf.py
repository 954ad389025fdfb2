"""UDF / UDAF / UDTF surface — SURVEY.md §2.10.

These three queries deliberately route through Python to exercise the
Arrow boundary (everything else in the engine stays JVM-side):

- ``udf_scalar``   — vectorized scalar pandas_udf (Series → Series)
- ``udaf_grouped`` — grouped aggregation via applyInPandas
- ``udtf_explode`` — table function (1 row → N) via mapInPandas

All three compute deterministic arithmetic so the DuckDB oracle can check
them exactly (modulo rounding).  Per the 100 TB posture, a Python UDF is
only ever acceptable Arrow-batched like this; row-at-a-time
``F.udf`` never appears in this codebase.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from cassandra_syncer_spark.queries.relational import T
from cassandra_syncer_spark.registry import register


def _sigmoid_len_score_fn(n_chars: pd.Series) -> pd.Series:
    """Length-based quality score: sigmoid((n_chars - 500) / 200)."""
    import numpy as np

    return 1.0 / (1.0 + np.exp(-(n_chars.astype("float64") - 500.0) / 200.0))


@register(
    "udf_scalar",
    oracle="""
    SELECT doc_id,
           round(1.0 / (1.0 + exp(-(CAST(n_chars AS DOUBLE) - 500.0) / 200.0)), 6)
             AS len_score
    FROM documents
    """,
)
def udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF (Arrow-vectorized, Series→Series).

    The UDF is built inside the query (pandas_udf return-type parsing needs
    an active session in PySpark 4)."""
    score = pandas_udf(_sigmoid_len_score_fn, "double")
    docs = T(spark, sf_dir, "documents")
    return docs.select("doc_id", F.round(score("n_chars"), 6).alias("len_score"))


def _weighted_mean(pdf: pd.DataFrame) -> pd.DataFrame:
    w = (pdf["doc_id"] % 7 + 1).astype("float64")
    x = pdf["n_chars"].astype("float64")
    return pd.DataFrame(
        {
            "lang": [pdf["lang"].iloc[0]],
            "wmean_chars": [float((w * x).sum() / w.sum())],
            "n_docs": [len(pdf)],
        }
    )


@register(
    "udaf_grouped",
    oracle="""
    SELECT lang,
           round(sum((doc_id % 7 + 1) * CAST(n_chars AS DOUBLE))
                 / sum(doc_id % 7 + 1), 8) AS wmean_chars,
           count(*) AS n_docs
    FROM documents
    GROUP BY lang
    """,
)
def udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate UDAF via applyInPandas: per-language weighted mean
    of document length (weight = doc_id % 7 + 1, deterministic)."""
    docs = T(spark, sf_dir, "documents").select("lang", "doc_id", "n_chars")
    out = docs.groupBy("lang").applyInPandas(
        _weighted_mean, schema="lang string, wmean_chars double, n_docs long"
    )
    # round outside the UDF: Python's round() is banker's rounding and
    # disagrees with both engines' SQL round at half-way points
    return out.select("lang", F.round("wmean_chars", 8).alias("wmean_chars"), "n_docs")


def _chunker(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """1 row → N rows: split each document into 1000-char chunks."""
    for pdf in batches:
        out = {"doc_id": [], "chunk_idx": [], "chunk_len": []}
        for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
            if pd.isna(n_chars):
                # NULL n_chars → one chunk of unknown length, matching the
                # oracle: greatest(ceil(NULL/1000), 1) = 1 in DuckDB
                # (greatest ignores NULLs), least(1000, NULL) = NULL
                out["doc_id"].append(doc_id)
                out["chunk_idx"].append(0)
                out["chunk_len"].append(None)
                continue
            n_chunks = max(1, math.ceil(n_chars / 1000.0))
            for k in range(n_chunks):
                out["doc_id"].append(doc_id)
                out["chunk_idx"].append(k)
                out["chunk_len"].append(min(1000, int(n_chars) - k * 1000))
        yield pd.DataFrame(out)


@register(
    "udtf_explode",
    oracle="""
    WITH c AS (
      SELECT doc_id, n_chars,
             unnest(range(CAST(greatest(ceil(n_chars / 1000.0), 1) AS BIGINT))) AS k
      FROM documents
    )
    SELECT doc_id,
           CAST(k AS BIGINT) AS chunk_idx,
           -- explicit NULL guard: DuckDB's least() IGNORES null arguments
           -- (least(1000, NULL) = 1000), so without the CASE a NULL-length
           -- doc would claim a full 1000-char chunk
           CAST(CASE WHEN n_chars IS NULL THEN NULL
                     ELSE least(1000, n_chars - k * 1000) END AS BIGINT)
             AS chunk_len
    FROM c
    """,
)
def udtf_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table function via mapInPandas: document → chunk rows (the chunking
    stage of an LLM ingestion pipeline).  Arrow batches in and out; the
    expansion happens inside the executor, so no driver materialization."""
    docs = T(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return docs.mapInPandas(
        _chunker, schema="doc_id long, chunk_idx long, chunk_len long"
    )
