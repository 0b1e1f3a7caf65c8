"""Multimodal column plumbing: image/audio/video as opaque ``binary``
payloads with typed metadata.

The decode kernels (image decode, audio resample, video frame-sample)
need codec libraries that are NOT in this container — they are STUBBED
behind ``DecodeUnavailable``/deterministic fakes, clearly marked. What
IS real and tested: the Spark-side plumbing — schemas, Arrow batch
shapes, ``mapInPandas`` signatures, partitioning — so swapping a real
decoder in changes one inner function, not the pipeline.

Scale notes: payloads ride in their own column so column pruning keeps
metadata-only queries from ever reading bytes; decode stages are
``mapInPandas`` (streaming batches, bounded memory) and run on
hash-of-asset_id partitions: a uniform key spreads the heavy payloads
in expectation. (Range-partitioning on payload size — the r1-r3
approach — CONCENTRATES all the largest blobs into one partition, the
opposite of balancing: ADVICE r3. A size-desc round-robin stripe would
balance bytes exactly but needs a global sort, which is its own
bottleneck at scale.)
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class DecodeUnavailable(NotImplementedError):
    """Raised by real-decoder seams when codec libs are absent."""


ASSET_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),       # image|audio|video
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("payload_bytes", T.LongType(), True),
    T.StructField("payload_md5", T.StringType(), True),
])

IMAGE_META_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("n_channels", T.IntegerType(), True),
])


def assets_from_docs(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Wrap a text corpus as binary assets (payload = utf8 bytes) —
    the schema/partitioning test-bed for the decode stages."""
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        F.col(id_col).alias("asset_id"),
        F.lit("image").alias("kind"),
        payload.alias("payload"),
        F.octet_length(payload).cast("long").alias("payload_bytes"),
        F.md5(payload).alias("payload_md5"))


def _fake_decode_image(payload: bytes) -> tuple[int, int, int]:
    """STUB decode: deterministic fake dimensions derived from the
    payload md5 — replace with PIL/libvips when available."""
    if payload is None:
        return None, None, None
    h = hashlib.md5(payload).digest()
    return 64 + h[0] % 192, 64 + h[1] % 192, 1 + h[2] % 4


def real_decode_image(payload: bytes):
    """The real-decoder seam. Codec libs absent in this container."""
    raise DecodeUnavailable("image codecs not installed; use the stub")


def decode_image_meta(assets: DataFrame, use_stub: bool = True) -> DataFrame:
    """mapInPandas decode stage: payload → (width, height, n_channels).
    Batches stream through Arrow; payload column pruned after use."""
    decode = _fake_decode_image if use_stub else real_decode_image

    def gen(it):
        for pdf in it:
            w, h, c = zip(*(decode(p) for p in pdf["payload"])) if len(pdf) \
                else ((), (), ())
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"],
                "width": pd.array(w, dtype="Int32"),
                "height": pd.array(h, dtype="Int32"),
                "n_channels": pd.array(c, dtype="Int32"),
            })

    balanced = assets.repartition(
        max(assets.rdd.getNumPartitions(), 1), F.col("asset_id"))
    return balanced.select("asset_id", "payload").mapInPandas(
        gen, schema=IMAGE_META_SCHEMA)


# ---------------------------------------------------------------------------
# REAL container-header sniffing (r3): PNG/GIF/JPEG dimensions and
# WAV/RIFF audio parameters are plain byte-layout parses — no codec
# library needed, so this stage is NOT a stub. Pixel/sample DECODING
# (the part that genuinely needs libjpeg/libsndfile) stays behind the
# DecodeUnavailable seam above.
# ---------------------------------------------------------------------------

import struct

MEDIA_META_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType(), False),
    T.StructField("format", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("n_channels", T.IntegerType(), True),
    T.StructField("sample_rate", T.IntegerType(), True),
    T.StructField("duration_ms", T.LongType(), True),
])

_NONE_META = {"format": None, "width": None, "height": None,
              "n_channels": None, "sample_rate": None, "duration_ms": None}

_JPEG_SOF = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
             0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def sniff_media_meta_py(b: bytes) -> dict:
    """Pure-function container-header parse → format + dimensions /
    audio params; unknown or truncated payloads → all-null (the
    logs-and-continues contract every gate in this repo follows)."""
    out = dict(_NONE_META)
    if not b:
        return out
    try:
        if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24:
            w, h = struct.unpack(">II", b[16:24])
            out.update(format="png", width=int(w), height=int(h))
        elif b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
            w, h = struct.unpack("<HH", b[6:10])
            out.update(format="gif", width=int(w), height=int(h))
        elif b[:2] == b"\xff\xd8":
            i = 2
            while i + 9 < len(b):
                if b[i] != 0xFF:
                    i += 1
                    continue
                marker = b[i + 1]
                if marker in _JPEG_SOF:
                    h, w = struct.unpack(">HH", b[i + 5:i + 9])
                    out.update(format="jpeg", width=int(w), height=int(h),
                               n_channels=int(b[i + 9]))
                    break
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    i += 2
                    continue
                seg_len = struct.unpack(">H", b[i + 2:i + 4])[0]
                i += 2 + seg_len
            if out["format"] is None:
                out["format"] = "jpeg"
        elif b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            out["format"] = "wav"
            i, byte_rate, data_size = 12, None, None
            while i + 8 <= len(b):
                cid = b[i:i + 4]
                size = struct.unpack("<I", b[i + 4:i + 8])[0]
                if cid == b"fmt " and i + 24 <= len(b):
                    (_fmt, ch, sr, br) = struct.unpack(
                        "<HHII", b[i + 8:i + 20])
                    out.update(n_channels=int(ch), sample_rate=int(sr))
                    byte_rate = br
                elif cid == b"data":
                    data_size = size
                i += 8 + size + (size & 1)
            if byte_rate and data_size is not None:
                out["duration_ms"] = int(data_size * 1000 // byte_rate)
    except (struct.error, IndexError):
        pass                               # truncated header: keep nulls
    return out


def sniff_media_meta(assets: DataFrame) -> DataFrame:
    """mapInPandas header-sniff stage over hash-of-asset_id partitions
    (uniform key → payload bytes spread in expectation); payload column
    pruned after use (metadata-only consumers never shuffle bytes)."""
    def gen(it):
        for pdf in it:
            metas = [sniff_media_meta_py(p) for p in pdf["payload"]]
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"],
                "format": [m["format"] for m in metas],
                "width": pd.array([m["width"] for m in metas],
                                  dtype="Int32"),
                "height": pd.array([m["height"] for m in metas],
                                   dtype="Int32"),
                "n_channels": pd.array([m["n_channels"] for m in metas],
                                       dtype="Int32"),
                "sample_rate": pd.array([m["sample_rate"] for m in metas],
                                        dtype="Int32"),
                "duration_ms": pd.array([m["duration_ms"] for m in metas],
                                        dtype="Int64"),
            })

    balanced = assets.repartition(
        max(assets.rdd.getNumPartitions(), 1), F.col("asset_id"))
    return balanced.select("asset_id", "payload").mapInPandas(
        gen, schema=MEDIA_META_SCHEMA)


def frame_sample_plan(assets: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: emits (asset_id, frame_idx) rows
    for a deterministic fake frame count (payload_bytes // 1024 + 1);
    the real decoder would replace the count source only."""
    n_frames = (F.col("payload_bytes") / F.lit(1024)).cast("int") + F.lit(1)
    return (assets
            .withColumn("frame_idx",
                        F.explode(F.sequence(F.lit(0), n_frames - 1,
                                             F.lit(every_n))))
            .select("asset_id", "frame_idx"))
