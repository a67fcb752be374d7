"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata structs, processed by Arrow-batched
``mapInPandas`` stages.

The decode step is STUBBED (no image/audio libs in this container): a
deterministic fake "decoder" produces feature vectors from the bytes, so
the Spark-side contract — schema, batch shape, partitioning, UDF
signatures — is real and tested, and a real decoder (PIL/librosa/ffmpeg)
drops in by replacing ``_decode_bytes`` only.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("mime", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("content_sha", T.StringType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def _decode_bytes(content: bytes, kind: str) -> np.ndarray:
    """STUB decoder — deterministic fake features from the byte content.

    Replace with real decode (PIL.Image.open / librosa.load /
    frame-sampling) in an environment that has the codecs. Raising
    NotImplementedError here would be the strict alternative; the fake
    keeps the pipeline end-to-end testable.
    """
    h = hashlib.sha256(content + kind.encode()).digest()
    return (
        np.frombuffer(h[:FEATURE_DIM * 2], dtype=np.uint16).astype(np.float32)
        / 65535.0
    )


def extract_features(df: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, Arrow batches
    out; constant memory per batch; binary column never leaves the
    executor. At cluster scale, repartition upstream by a content-hash
    bucket so batches are balanced regardless of media size skew."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                None if c is None else _decode_bytes(bytes(c), k)
                for c, k in zip(pdf["content"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [
                        0 if c is None else len(bytes(c)) for c in pdf["content"]
                    ],
                    "content_sha": [
                        "" if c is None
                        else hashlib.sha256(bytes(c)).hexdigest()
                        for c in pdf["content"]
                    ],
                    "features": feats,
                }
            )

    return df.mapInPandas(op, schema=FEATURES_SCHEMA)


def synthesize_media(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (bytes derived from md5 chains)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        content = hashlib.md5(f"{seed}:{i}".encode()).digest() * (4 + i % 7)
        rows.append(
            (
                f"m_{i:06d}",
                kind,
                bytearray(content),
                (64 + i % 512, 64, 1000 + i, f"{kind}/fake"),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_sha", T.StringType(), False),
        T.StructField("n_frame_bytes", T.LongType(), False),
    ]
)


def sample_frames(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling for video rows: one input row → up to ``n_frames``
    output rows (the one-to-many mapInPandas shape a real
    ffmpeg/decord sampler needs — Arrow batches in, a longer frame batch
    out, constant memory). The STUB "decoder" slices the byte content
    into equal chunks standing in for decoded frames (no codecs in this
    container); a real sampler replaces only the chunking line. Non-video
    rows produce no frames."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame_sha": [],
                   "n_frame_bytes": []}
            for mid, kind, content in zip(
                pdf["media_id"], pdf["kind"], pdf["content"]
            ):
                if kind != "video" or content is None:
                    continue
                data = bytes(content)
                k = min(n_frames, max(1, len(data)))
                step = len(data) // k
                for i in range(k):
                    chunk = data[i * step:(i + 1) * step] if i < k - 1 \
                        else data[(k - 1) * step:]
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["frame_sha"].append(
                        hashlib.sha256(chunk).hexdigest()
                    )
                    out["n_frame_bytes"].append(len(chunk))
            yield pd.DataFrame(out)

    return df.mapInPandas(op, schema=FRAMES_SCHEMA)
