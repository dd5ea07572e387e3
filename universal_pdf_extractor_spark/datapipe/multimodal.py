"""Multimodal binary-column plumbing.

Images / audio / video ride as opaque ``binary`` columns with a typed
metadata struct.  The Spark-side machinery — schema, partition-aware
batching, Arrow-friendly UDF signatures, frame-sampling plan shape —
is real and tested; the actual codec calls are stubbed behind
``_decode_stub`` because no image/audio libraries ship in this
container (clearly marked; swap the stub for PIL/ffmpeg calls in a
full environment).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: N812
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),          # image|audio|video
    StructField("mime", StringType(), True),
    StructField("payload", BinaryType(), True),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("duration_ms", IntegerType(), True),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),
    StructField("n_bytes", LongType(), False),
    StructField("content_sha256", StringType(), False),
    StructField("feat_mean", DoubleType(), True),
    StructField("feat_std", DoubleType(), True),
    StructField("frames_sampled", IntegerType(), True),
])


def _decode_stub(payload: bytes, kind: str) -> np.ndarray:
    """STUB decode: real deployments replace this with PIL / soundfile /
    pyav decode.  Here: deterministic pseudo-signal derived from the
    byte content so downstream feature math is exercised end-to-end.
    """
    if payload is None or len(payload) == 0:
        return np.zeros(0, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    return (arr.astype(np.float32) - 127.5) / 127.5


def sample_frames(signal: np.ndarray, n_frames: int = 8) -> np.ndarray:
    """Deterministic uniform frame/window sampling."""
    if len(signal) == 0 or n_frames <= 0:
        return signal[:0]
    idx = np.linspace(0, len(signal) - 1, num=min(n_frames, len(signal)), dtype=np.int64)
    return signal[idx]


def extract_features(media: DataFrame, n_frames: int = 8) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow ships each batch of binaries to Python once; per batch the
    decode + feature math is vectorized numpy.  Output is flat (no
    binary) so downstream joins stay cheap.
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # decode + hashing are inherently per-item (codec calls /
            # hashlib); the FEATURE math batches into one stacked
            # matrix op for the dominant fixed-width case
            payloads = [p if p is not None else b"" for p in pdf["payload"]]
            frames = [sample_frames(_decode_stub(p, k), n_frames)
                      for p, k in zip(payloads, pdf["kind"])]
            n = len(frames)
            means = np.full(n, np.nan)
            stds = np.full(n, np.nan)
            full_idx = [i for i, f in enumerate(frames) if len(f) == n_frames]
            if full_idx:
                m = np.stack([frames[i] for i in full_idx])
                means[full_idx] = m.mean(axis=1)
                stds[full_idx] = m.std(axis=1)
            for i, f in enumerate(frames):  # rare short/empty signals
                if 0 < len(f) < n_frames:
                    means[i] = f.mean()
                    stds[i] = f.std()
            yield pd.DataFrame({
                "media_id": pdf["media_id"].to_numpy(dtype="int64"),
                "kind": pdf["kind"].to_numpy(dtype=object),
                "n_bytes": np.fromiter((len(p) for p in payloads),
                                       dtype=np.int64, count=n),
                "content_sha256": [hashlib.sha256(p).hexdigest()
                                   for p in payloads],
                # object dtype so empty-media NaNs leave Python as real
                # None/NULL rather than relying on Arrow's NaN-as-null
                # coercion for float64 frames
                "feat_mean": pd.Series(means, dtype=object).where(pd.notna(means), None),
                "feat_std": pd.Series(stds, dtype=object).where(pd.notna(stds), None),
                "frames_sampled": np.fromiter((len(f) for f in frames),
                                              dtype=np.int32, count=n),
            }, columns=[f.name for f in FEATURE_SCHEMA.fields])

    slim = media.select("media_id", "kind", "payload")
    return slim.mapInPandas(run, schema=FEATURE_SCHEMA)


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests/benches."""
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.when(F.col("id") % 3 == 0, "image")
         .when(F.col("id") % 3 == 1, "audio").otherwise("video").alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        F.sha2(F.col("id").cast("string"), 256).cast("binary").alias("payload"),
        F.lit(64).alias("width"), F.lit(64).alias("height"),
        F.lit(1000).alias("duration_ms"),
    )
    return df.select(*[F.col(f.name).cast(f.dataType) for f in MEDIA_SCHEMA.fields])
