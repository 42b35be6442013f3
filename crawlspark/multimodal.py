"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decode/feature stages as Arrow-batched mapInPandas.

The container has no image/audio codecs, so the decode kernels are
STUBBED (deterministic fakes clearly marked); everything Spark-side —
schemas, batch shapes, partitioning, UDF signatures — is real and
tested, so swapping a real decoder (PIL / torchaudio / pyav) in is a
one-function change.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),        # image|audio|video
    T.StructField("payload", T.BinaryType(), True),      # opaque bytes
    T.StructField("mime", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.IntegerType(), True),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("feature", T.ArrayType(T.FloatType()), True),
    T.StructField("n_frames", T.IntegerType(), True),
])


def real_decode(payload: bytes, kind: str):
    """The real decoder seam. Not available in this container."""
    raise NotImplementedError(
        "image/audio codecs not installed in this sandbox; "
        "swap in PIL/torchaudio/pyav here in production")


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in feature: bytes -> sha256 -> unit-scaled
    floats. Keeps the pipeline end-to-end testable and reproducible."""
    h = hashlib.sha256(payload or b"").digest()
    arr = np.frombuffer(h[: dim * 4], dtype=np.uint32).astype(np.float64)
    return [float(x) for x in np.round(arr / 2**32, 6)]


def extract_features(media: DataFrame, dim: int = 8,
                     frame_stride: int = 10) -> DataFrame:
    """Decode + featurize via mapInPandas: Arrow batches in, one feature
    row per media item; video 'samples' every frame_stride-th frame
    (stub counts frames from payload length)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, frames = [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                raw = bytes(payload) if payload is not None else b""
                feats.append(_fake_feature(raw, dim))
                frames.append(max(1, len(raw) // 1024) // frame_stride + 1
                              if kind == "video" else 1)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "feature": feats,
                "n_frames": pd.array(frames, dtype="int32"),
            })

    return (media.repartition(F.col("media_id"))  # spread fat payloads
            .mapInPandas(run, schema=FEATURE_SCHEMA))


def gen_media_pandas(n: int, seed: int = 42) -> pd.DataFrame:
    """Deterministic synthetic media table (payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"])[rng.integers(0, 3, n)]
    rows = []
    for i in range(n):
        size = int(rng.integers(256, 8192))
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (size // 32 + 1)
        rows.append((i, kinds[i], payload[:size], f"{kinds[i]}/x-fake",
                     64, 64, 1000 if kinds[i] != "image" else None))
    return pd.DataFrame(rows, columns=["media_id", "kind", "payload", "mime",
                                       "width", "height", "duration_ms"])
