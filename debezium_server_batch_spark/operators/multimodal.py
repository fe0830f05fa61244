"""Multimodal column plumbing — image/audio/video as opaque binary columns
with typed metadata, processed via Arrow `mapInPandas` batches.

The container has no image/audio codecs, so the decode kernels are
STUBBED (deterministic fakes clearly marked below; `real_decode=True`
raises NotImplementedError). Everything Spark-side — schemas, UDF
signatures, Arrow batch shapes, partitioning — is real and tested, so
swapping in Pillow/ffmpeg later changes only the kernel body.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), True),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)


def _fake_pixels(payload: bytes, n: int) -> np.ndarray:
    """DETERMINISTIC FAKE decode: derive n bytes from sha256(payload).
    Stands in for a real codec; stable across runs/machines."""
    out = np.empty(n, dtype=np.uint8)
    h = hashlib.sha256(payload)
    pos = 0
    counter = 0
    while pos < n:
        d = hashlib.sha256(h.digest() + counter.to_bytes(4, "little")).digest()
        take = min(len(d), n - pos)
        out[pos : pos + take] = np.frombuffer(d[:take], dtype=np.uint8)
        pos += take
        counter += 1
    return out


DECODED_SCHEMA = "media_id long, width int, height int, mean_intensity double"


def decode_images(df: DataFrame, real_decode: bool = False) -> DataFrame:
    """binary → decoded stats, Arrow batch at a time (mapInPandas)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if real_decode:
            raise NotImplementedError("real image codecs are not installed in this container")
        for pdf in batches:
            rows = []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                w = int(meta["width"] or 8)
                h = int(meta["height"] or 8)
                px = _fake_pixels(bytes(payload), w * h)
                rows.append((mid, w, h, float(px.mean())))
            yield pd.DataFrame(rows, columns=["media_id", "width", "height", "mean_intensity"])

    return df.select("media_id", "payload", "meta").mapInPandas(kernel, DECODED_SCHEMA)


FEATURES_SCHEMA = T.ArrayType(T.FloatType())


def make_feature_extract_udf(dim: int = 16, real_decode: bool = False):
    """binary → fixed-dim float feature vector (deterministic fake)."""

    @F.pandas_udf(FEATURES_SCHEMA)
    def extract(payload: pd.Series) -> pd.Series:
        if real_decode:
            raise NotImplementedError("real feature extractors are not installed")
        feats = [
            (_fake_pixels(bytes(p), dim).astype(np.float32) / 255.0) if p is not None else None
            for p in payload
        ]
        return pd.Series(feats)

    return extract


FRAME_SCHEMA = "media_id long, frame_idx int, frame_ts_ms int, frame_hash long"


def sample_frames(df: DataFrame, every_ms: int = 1000, real_decode: bool = False) -> DataFrame:
    """Video frame sampling: one output row per sampled frame. The fake
    emits a frame-hash per timestamp; a real decoder would emit bytes."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if real_decode:
            raise NotImplementedError("ffmpeg is not installed in this container")
        for pdf in batches:
            rows = []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                dur = int(meta["duration_ms"] or 0)
                for idx, ts in enumerate(range(0, dur, every_ms)):
                    hb = hashlib.sha256(bytes(payload) + ts.to_bytes(8, "little")).digest()[:8]
                    rows.append((mid, idx, ts, int.from_bytes(hb, "little", signed=True)))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_ts_ms", "frame_hash"])

    return df.filter(F.col("kind") == "video").select("media_id", "payload", "meta").mapInPandas(kernel, FRAME_SCHEMA)


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic media table for tests (binary payload from hashes)."""
    kinds = F.array(F.lit("image"), F.lit("audio"), F.lit("video"))
    mid = F.col("id")
    return spark.range(n).select(
        mid.alias("media_id"),
        F.element_at(kinds, (F.pmod(F.xxhash64(F.lit(seed), mid), F.lit(3)) + 1).cast("int")).alias("kind"),
        F.sha2(F.concat(F.lit(str(seed)), mid.cast("string")), 256).cast("binary").alias("payload"),
        F.struct(
            (F.pmod(F.xxhash64(F.lit(seed + 1), mid), F.lit(32)) + 4).cast("int").alias("width"),
            (F.pmod(F.xxhash64(F.lit(seed + 2), mid), F.lit(32)) + 4).cast("int").alias("height"),
            ((F.pmod(F.xxhash64(F.lit(seed + 3), mid), F.lit(10)) + 1) * 1000).cast("int").alias("duration_ms"),
            F.lit("fake").alias("codec"),
        ).alias("meta"),
    )
