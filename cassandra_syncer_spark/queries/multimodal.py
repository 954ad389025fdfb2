"""Multimodal-column queries — binary payload + Arrow decode plumbing
(operators/multimodal.py) exercised end-to-end and oracle-checked.

The fake decode derives every output deterministically from md5 of the
payload, so DuckDB can evaluate the identical formulas (payloads are UTF-8
text bytes; corpus verified ASCII, so byte and char arithmetic agree).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_syncer_spark.operators.multimodal import (
    attach_fake_payload,
    decode_media,
    frame_sample,
)
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


FRAME_BYTES = 256


@register(
    "multimodal_frames",
    oracle=f"""
    WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 200)
    SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
           md5(substring(text, CAST(i * {FRAME_BYTES} + 1 AS BIGINT), {FRAME_BYTES}))
             AS frame_md5
    FROM d, UNNEST(range(CAST(ceil(greatest(length(text), 1) / {FRAME_BYTES}.0) AS BIGINT))) AS t(i)
    """,
)
def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over the media payload (video → periodic frames),
    run through the real Arrow-batched ``mapInPandas`` stage: one output
    row per {FRAME_BYTES}-byte 'frame' with its content hash.

    Oracle slices the source text by characters — equivalent because the
    corpus is verified ASCII (byte == char arithmetic; the module
    docstring's standing precondition for all fake-codec oracles)."""
    docs = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    frames = frame_sample(attach_fake_payload(docs), every_n_bytes=FRAME_BYTES)
    return frames.select(
        "doc_id", F.col("frame_idx").cast("long").alias("frame_idx"), "frame_md5"
    )
