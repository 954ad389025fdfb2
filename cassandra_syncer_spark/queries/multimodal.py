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
           -- NULL-text guard: concat('0x', NULL) is '0x' in DuckDB (concat
           -- ignores NULLs) and CAST('0x' AS INTEGER) aborts the query —
           -- null payloads must yield null dims, as the decode stage does
           CAST(CASE WHEN text IS NULL THEN NULL
                ELSE 16 + CAST(concat('0x', substr(md5(text), 1, 2)) AS INTEGER) % 240
                END AS INTEGER) AS width,
           CAST(CASE WHEN text IS NULL THEN NULL
                ELSE 16 + CAST(concat('0x', substr(md5(text), 3, 2)) AS INTEGER) % 240
                END AS INTEGER) AS height,
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


# -- real-decode query: genuine container bytes, genuine header parse --------
#
# Deterministic REAL image containers built JVM-side (unhex/lpad/hex — no
# Python in the build path): PNG signature+IHDR, JPEG SOI+SOF0, GIF89a
# logical screen descriptor, with width = 16 + doc_id % 240 and
# height = 16 + (doc_id div 7) % 240 baked into the real header fields.
# The decode stage then sniffs the magic bytes and parses the dims back
# out (operators/multimodal.py::_sniff_and_parse) — if the parser or the
# byte layout is wrong, the oracle's closed-form columns won't match.

_W = "16 + doc_id % 240"
_H = "16 + (doc_id div 7) % 240"        # Spark integer div
_H_DUCK = "16 + (doc_id // 7) % 240"    # DuckDB spelling of the same
# big-endian byte strings of the dims (hex() never needs more than 2 bytes
# for values < 256)
_W4 = f"lpad(hex({_W}), 8, '0')"  # 4-byte BE (PNG)
_H4 = f"lpad(hex({_H}), 8, '0')"
_W2 = f"lpad(hex({_W}), 4, '0')"  # 2-byte BE (JPEG)
_H2 = f"lpad(hex({_H}), 4, '0')"
# 2-byte LE (GIF): swap the two bytes of the BE hex string
_W2LE = f"concat(substr({_W2}, 3, 2), substr({_W2}, 1, 2))"
_H2LE = f"concat(substr({_H2}, 3, 2), substr({_H2}, 1, 2))"

#: payload byte lengths by format (PNG: sig8+len4+IHDR4+w4+h4+tail5+crc4;
#: JPEG: SOI2+SOF0 marker2+len2+prec1+h2+w2+ncomp1+comps9+EOI2; GIF: hdr6+w2+h2)
_PNG_LEN, _JPG_LEN, _GIF_LEN = 33, 23, 10

_PAYLOAD_EXPR = f"""
CASE
  WHEN doc_id % 3 = 0 THEN
    concat(unhex('89504E470D0A1A0A'), unhex('0000000D'), encode('IHDR', 'utf-8'),
           unhex({_W4}), unhex({_H4}), unhex('0806000000'), unhex('00000000'))
  WHEN doc_id % 3 = 1 THEN
    concat(unhex('FFD8FFC00011'), unhex('08'), unhex({_H2}), unhex({_W2}),
           unhex('03'), unhex('000000000000000000'), unhex('FFD9'))
  ELSE
    concat(encode('GIF89a', 'utf-8'), unhex({_W2LE}), unhex({_H2LE}))
END
"""


@register(
    "multimodal_decode_real",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                WHEN doc_id % 3 = 1 THEN 'image/jpeg'
                ELSE 'image/gif' END AS media_type,
           CAST(CASE WHEN doc_id % 3 = 0 THEN {_PNG_LEN}
                     WHEN doc_id % 3 = 1 THEN {_JPG_LEN}
                     ELSE {_GIF_LEN} END AS BIGINT) AS n_bytes,
           CAST({_W} AS INTEGER) AS width,
           CAST({_H_DUCK} AS INTEGER) AS height
    FROM documents ORDER BY doc_id
    """,
)
def multimodal_decode_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL media decode, end to end and hash-checked: deterministic PNG /
    JPEG / GIF containers are assembled JVM-side with the dimensions baked
    into the genuine header fields, and the mapInPandas decode stage
    sniffs each payload's magic bytes and parses width/height back out of
    the container (stdlib ``struct`` — PNG IHDR, JPEG SOF marker walk,
    GIF logical screen descriptor; no PIL dependency).  The oracle derives
    the expected type/size/dims in closed form, so a wrong byte layout OR
    a wrong parser breaks the hash.  Closes round-5's one stubbed leaf:
    ``decode_media(fake=False)`` is now a working image-metadata decoder;
    full pixel decode remains the documented PIL/ffmpeg extension point.

    Scale shape: payload construction and decode are both scan-fused and
    embarrassingly parallel (Arrow-batched mapInPandas, no shuffle); at
    100 TB this is the binaryFile-ingest → decode front door running at
    scan speed.
    """
    docs = T(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_PAYLOAD_EXPR).alias("payload"), F.lit("raw").alias("media_type")
    )
    return (
        decode_media(docs, fake=False)
        .select("doc_id", "media_type", "n_bytes", "width", "height")
        .orderBy("doc_id")
    )


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
