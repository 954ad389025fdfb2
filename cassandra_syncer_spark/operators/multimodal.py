"""Multimodal columns: opaque binary payloads + typed metadata, processed
with Arrow-batched mapInPandas.

Design (the 100 TB shape):
- media lives in a ``payload: binary`` column next to typed metadata
  (``media_type``, ``width``…): one row per asset, co-partitioned with its
  text/embedding row so joins stay local;
- decode / resize / frame-sample run as ``mapInPandas`` stages — Arrow
  moves the bytes to Python in columnar batches, the UDF touches only its
  batch, output schema is declared up front;
- the REAL decode (``fake=False``, the default) parses image container
  headers with the stdlib — PNG / JPEG / GIF / BMP all carry their
  dimensions at fixed offsets, no PIL needed; the media type is sniffed
  from the magic bytes, never trusted from metadata.  Full pixel decode
  (PIL/ffmpeg, not in this container) would extend ``_sniff_and_parse``;
  everything else — schema, Arrow batching, partitioning — is the
  production dataflow already.  ``fake=True`` substitutes a deterministic
  md5-derived pseudo-decode so text-derived fixture payloads (not real
  images) remain oracle-checkable.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = "doc_id long, media_type string, n_bytes long, width int, height int, checksum string"


def _sniff_and_parse(data: bytes) -> tuple[str, int | None, int | None]:
    """(media_type, width, height) from container magic + fixed header
    offsets — stdlib-only real decode of the image-metadata layer.

    PNG: 8-byte signature, then the IHDR chunk: length(4) 'IHDR'(4)
    width(4) height(4), big-endian.  GIF: 'GIF87a'/'GIF89a' then
    width(2) height(2) little-endian.  BMP: 'BM', BITMAPINFOHEADER dims
    at offset 18 as little-endian int32 (height may be negative =
    top-down rows).  JPEG: walk the FF-marker stream to the first SOF
    frame header (C0-CF minus C4/C8/CC), which carries
    precision(1) height(2) width(2) after the segment length.
    """
    if data[:8] == b"\x89PNG\r\n\x1a\n" and len(data) >= 24:
        w, h = struct.unpack(">II", data[16:24])
        return "image/png", w, h
    if data[:6] in (b"GIF87a", b"GIF89a") and len(data) >= 10:
        w, h = struct.unpack("<HH", data[6:10])
        return "image/gif", w, h
    if data[:2] == b"BM" and len(data) >= 26:
        w, h = struct.unpack("<ii", data[18:26])
        return "image/bmp", w, abs(h)
    if data[:2] == b"\xff\xd8":
        i = 2
        while i + 9 <= len(data):
            if data[i] != 0xFF:
                i += 1
                continue
            marker = data[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers carry no length
                continue
            if i + 4 > len(data):
                break
            (seglen,) = struct.unpack(">H", data[i + 2 : i + 4])
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if i + 9 <= len(data):
                    h, w = struct.unpack(">HH", data[i + 5 : i + 9])
                    return "image/jpeg", w, h
                break
            i += 2 + seglen
        return "image/jpeg", None, None
    return "application/octet-stream", None, None


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

    ``fake=False`` (default) is the REAL decode: the media type is
    sniffed from the payload's magic bytes and width/height parsed from
    the container header (:func:`_sniff_and_parse`); unrecognized
    payloads yield null dimensions rather than failing the batch.
    ``fake=True`` keeps the deterministic md5 pseudo-decode for
    text-derived fixture payloads.  The Spark-side contract (schema,
    Arrow batching) is identical either way.
    """

    def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "media_type", "n_bytes", "width", "height", "checksum")}
            for doc_id, payload, mt in zip(pdf["doc_id"], pdf["payload"], pdf["media_type"]):
                if payload is None:
                    # no media object: pass the row through with null
                    # metadata (matches encode(NULL)/md5(NULL) = NULL on
                    # the oracle side) rather than failing the batch
                    rows["doc_id"].append(doc_id)
                    rows["media_type"].append(mt)
                    for c in ("n_bytes", "width", "height", "checksum"):
                        rows[c].append(None)
                    continue
                data = bytes(payload)
                if fake:
                    w, h = _fake_dims(data)
                else:
                    mt, w, h = _sniff_and_parse(data)
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
                if payload is None:
                    # no payload → one null frame (oracle: greatest(length
                    # (NULL),1)=1 frame, md5(substring(NULL,..)) = NULL)
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(0)
                    out["frame_md5"].append(None)
                    continue
                data = bytes(payload)
                for i, off in enumerate(range(0, max(len(data), 1), every_n_bytes)):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_md5"].append(hashlib.md5(data[off : off + every_n_bytes]).hexdigest())
            yield pd.DataFrame(out)

    return df.mapInPandas(_sample, schema="doc_id long, frame_idx int, frame_md5 string")
