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
    Stands in for a real codec's per-item decode; stable across
    runs/machines. (A real codec is also a per-item call — the batch
    vectorization lives in the callers, which do stats/assembly over
    the whole Arrow batch at once.)"""
    h = hashlib.sha256(payload).digest()
    chunks = -(-n // 32)  # ceil: one sha256 digest per 32 bytes
    buf = b"".join(
        hashlib.sha256(h + c.to_bytes(4, "little")).digest() for c in range(chunks)
    )
    return np.frombuffer(buf[:n], dtype=np.uint8)


DECODED_SCHEMA = "media_id long, width int, height int, mean_intensity double"


def decode_images(df: DataFrame, real_decode: bool = False) -> DataFrame:
    """binary → decoded stats, Arrow batch at a time (mapInPandas)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if real_decode:
            raise NotImplementedError("real image codecs are not installed in this container")
        for pdf in batches:
            if not len(pdf):
                continue
            meta = pd.DataFrame(list(pdf["meta"]))
            # null OR non-positive dims fall back to 8 (a 0-width image
            # would make reduceat read the next image's pixels — or
            # raise on a trailing empty offset)
            w = meta["width"].fillna(0).astype(np.int64).to_numpy()
            h = meta["height"].fillna(0).astype(np.int64).to_numpy()
            w = np.where(w > 0, w, 8)
            h = np.where(h > 0, h, 8)
            sizes = w * h
            # one decode call per payload (a real codec is the same),
            # then ONE concatenated pixel buffer for the whole Arrow
            # batch with vectorized per-image means (np.add.reduceat) —
            # no per-row Python stats/assembly
            buf = np.concatenate(
                [_fake_pixels(bytes(p), n) for p, n in zip(pdf["payload"], sizes)]
            ).astype(np.float64)
            offsets = np.concatenate(([0], np.cumsum(sizes)[:-1]))
            means = np.add.reduceat(buf, offsets) / sizes
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "width": w.astype(np.int32),
                    "height": h.astype(np.int32),
                    "mean_intensity": means,
                }
            )

    return df.select("media_id", "payload", "meta").mapInPandas(kernel, DECODED_SCHEMA)


FEATURES_SCHEMA = T.ArrayType(T.FloatType())


def make_feature_extract_udf(dim: int = 16, real_decode: bool = False):
    """binary → fixed-dim float feature vector (deterministic fake)."""

    @F.pandas_udf(FEATURES_SCHEMA)
    def extract(payload: pd.Series) -> pd.Series:
        if real_decode:
            raise NotImplementedError("real feature extractors are not installed")
        mask = payload.notna().to_numpy()
        out = np.empty(len(payload), dtype=object)
        out[~mask] = None
        if mask.any():
            # per-payload decode, then ONE batch-wide (rows × dim)
            # matrix scale — the shape a real embedding model inherits
            mat = np.stack([_fake_pixels(bytes(p), dim) for p in payload[mask]])
            scaled = mat.astype(np.float32) / np.float32(255.0)
            for i, j in enumerate(np.nonzero(mask)[0]):
                out[j] = scaled[i]
        return pd.Series(out)

    return extract


FRAME_SCHEMA = "media_id long, frame_idx int, frame_ts_ms int, frame_hash long"


def sample_frames(df: DataFrame, every_ms: int = 1000, real_decode: bool = False) -> DataFrame:
    """Video frame sampling: one output row per sampled frame. The fake
    emits a frame-hash per timestamp; a real decoder would emit bytes."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if real_decode:
            raise NotImplementedError("ffmpeg is not installed in this container")
        for pdf in batches:
            if not len(pdf):
                continue
            meta = pd.DataFrame(list(pdf["meta"]))
            dur = meta["duration_ms"].fillna(0).astype(np.int64).to_numpy()
            counts = -(-dur // every_ms) * (dur > 0)  # frames per video
            if not counts.sum():
                continue
            # vectorized frame expansion: np.repeat for ids, a global
            # arange minus per-video offsets for frame indices — the
            # per-frame digest is the (fake) decode itself, one call per
            # frame like a real frame decoder
            mids = np.repeat(pdf["media_id"].to_numpy(), counts)
            starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
            idx = np.arange(counts.sum()) - np.repeat(starts, counts)
            ts = (idx * every_ms).astype(np.int64)
            payloads = np.repeat(pdf["payload"].to_numpy(), counts)
            hashes = np.fromiter(
                (
                    int.from_bytes(
                        hashlib.sha256(bytes(p) + int(t).to_bytes(8, "little")).digest()[:8],
                        "little",
                        signed=True,
                    )
                    for p, t in zip(payloads, ts)
                ),
                dtype=np.int64,
                count=int(counts.sum()),
            )
            yield pd.DataFrame(
                {
                    "media_id": mids,
                    "frame_idx": idx.astype(np.int32),
                    "frame_ts_ms": ts.astype(np.int32),
                    "frame_hash": hashes,
                }
            )

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
