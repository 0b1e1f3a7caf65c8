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
``mapInPandas`` (streaming batches, bounded memory) and should run on
payload-size-balanced partitions (``repartitionByRange(octet_length)``)
to avoid stragglers from a few huge blobs.
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

    balanced = assets.repartitionByRange(
        max(assets.rdd.getNumPartitions(), 1), F.col("payload_bytes"))
    return balanced.select("asset_id", "payload").mapInPandas(
        gen, schema=IMAGE_META_SCHEMA)


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
