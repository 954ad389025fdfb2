"""Multimodal-column queries — binary payload + Arrow decode plumbing
(operators/multimodal.py) exercised end-to-end and oracle-checked.

The fake decode derives every output deterministically from md5 of the
payload, so DuckDB can evaluate the identical formulas (payloads are UTF-8
text bytes; corpus verified ASCII, so byte and char arithmetic agree).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cassandra_syncer_spark.operators.multimodal import attach_fake_payload, decode_media
from cassandra_syncer_spark.queries.relational import T
from cassandra_syncer_spark.registry import register


@register(
    "multimodal_decode",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                WHEN doc_id % 3 = 1 THEN 'audio/wav'
                ELSE 'video/mp4' END AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(16 + CAST(concat('0x', substr(md5(text), 1, 2)) AS INTEGER) % 240
                AS INTEGER) AS width,
           CAST(16 + CAST(concat('0x', substr(md5(text), 3, 2)) AS INTEGER) % 240
                AS INTEGER) AS height,
           md5(text) AS checksum
    FROM documents
    """,
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media column → mapInPandas decode stage (deterministic fake
    codec; real PIL/ffmpeg body is a drop-in, see operators/multimodal.py).
    Checks the full Arrow path: binary encode, batch transfer, typed
    metadata output."""
    docs = T(spark, sf_dir, "documents")
    return decode_media(attach_fake_payload(docs), fake=True)
