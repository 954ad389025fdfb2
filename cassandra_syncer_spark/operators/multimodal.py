"""Multimodal columns: opaque binary payloads + typed metadata, processed
with Arrow-batched mapInPandas.

Design (the 100 TB shape):
- media lives in a ``payload: binary`` column next to typed metadata
  (``media_type``, ``width``…): one row per asset, co-partitioned with its
  text/embedding row so joins stay local;
- decode / resize / frame-sample run as ``mapInPandas`` stages — Arrow
  moves the bytes to Python in columnar batches, the UDF touches only its
  batch, output schema is declared up front;
- real codecs (PIL/ffmpeg) are NOT in this container: ``decode_image``
  raises NotImplementedError unless ``fake=True``, which substitutes a
  deterministic metadata-only decode so the plumbing (schemas, batch
  shapes, partitioning) is fully testable.  Swapping in a real codec
  changes only the body of ``_decode_batch``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = "doc_id long, media_type string, n_bytes long, width int, height int, checksum string"


def attach_fake_payload(docs: DataFrame) -> DataFrame:
    """Derive a deterministic binary payload from text (stand-in for real
    image/audio bytes) + typed metadata columns."""
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("media_type"),
    )


def _fake_dims(data: bytes) -> tuple[int, int]:
    """Deterministic pseudo-decode: dimensions from the content hash."""
    h = hashlib.md5(data).digest()
    return 16 + h[0] % 240, 16 + h[1] % 240


def decode_media(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode stage over (doc_id, payload, media_type) → typed metadata.

    With ``fake=False`` this raises NotImplementedError at executor time —
    the image/audio libraries are not installed in this environment; the
    Spark-side contract (schema, Arrow batching) is identical either way.
    """

    def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg (not in this container); "
                    "pass fake=True for the deterministic test decode"
                )
            rows = {k: [] for k in ("doc_id", "media_type", "n_bytes", "width", "height", "checksum")}
            for doc_id, payload, mt in zip(pdf["doc_id"], pdf["payload"], pdf["media_type"]):
                data = bytes(payload)
                w, h = _fake_dims(data)
                rows["doc_id"].append(doc_id)
                rows["media_type"].append(mt)
                rows["n_bytes"].append(len(data))
                rows["width"].append(w)
                rows["height"].append(h)
                rows["checksum"].append(hashlib.md5(data).hexdigest())
            yield pd.DataFrame(rows)

    return df.mapInPandas(_decode_batch, schema=DECODED_SCHEMA)


def frame_sample(df: DataFrame, every_n_bytes: int = 4096) -> DataFrame:
    """Frame-sampling stage (video → periodic frames), modeled as slicing
    the payload every N bytes; one output row per sampled 'frame'."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_md5": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                for i, off in enumerate(range(0, max(len(data), 1), every_n_bytes)):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_md5"].append(hashlib.md5(data[off : off + every_n_bytes]).hexdigest())
            yield pd.DataFrame(out)

    return df.mapInPandas(_sample, schema="doc_id long, frame_idx int, frame_md5 string")
