"""Multimodal column plumbing: opaque binary media + typed metadata.

Media (image/audio/video) are opaque ``binary`` columns with a typed
metadata struct, processed by Arrow-batched kernels over ``mapInPandas``.
The image/audio codec libraries are NOT in this container, so the codec
step is STUBBED (clearly marked) behind ``decode_media`` — everything
around it (schema, batching, partition sizing, feature extraction
signature, deterministic fake features for tests) is real Spark plumbing
that works unchanged once a codec is dropped in.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),      # 'image' | 'audio' | 'video'
        StructField("mime", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
        StructField("payload", BinaryType(), False),
    ]
)


def decode_media(payload: bytes, mime: str) -> np.ndarray:
    """STUB: real deployments plug a codec (Pillow/ffmpeg/soundfile) here.

    Raises so nothing silently trains on fake pixels."""
    raise NotImplementedError(
        f"media codec for {mime!r} not available in this environment; "
        "wire Pillow/ffmpeg here on a real cluster"
    )


def fake_features(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in feature extractor: content-keyed RNG vector.
    Lets the full pipeline (schema, shuffles, joins, ANN) run end-to-end
    without codecs while staying reproducible."""
    seed = int.from_bytes(hashlib.blake2b(payload, digest_size=8).digest(), "little")
    return np.random.default_rng(seed).standard_normal(dim).astype(np.float32)


_FEAT_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("features", ArrayType(FloatType())),
        StructField("n_bytes", LongType()),
    ]
)


def extract_features(
    media: DataFrame, dim: int = 64, use_codec: bool = False, codec=None
) -> DataFrame:
    """media -> (media_id, features[dim], n_bytes). Arrow-batched; each
    batch handles its payloads in one pass.

    ``use_codec=True`` routes payloads through ``codec`` — this parameter
    IS the deployment seam: any ``(payload: bytes, mime: str) -> ndarray``
    callable, captured BY VALUE into the Arrow kernel's closure so
    executors need no module patching (a module-global would not survive
    the worker-process boundary). Default is :func:`decode_media`, which
    raises in this container; real clusters pass a Pillow/ffmpeg-backed
    callable. The seam is pinned by a contract test that injects a stub
    codec (tests/test_extras.py::test_multimodal_codec_seam)."""
    decode = codec if codec is not None else decode_media

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            nbytes = []
            for payload, mime in zip(pdf["payload"], pdf["mime"]):
                raw = bytes(payload)
                nbytes.append(len(raw))
                if use_codec:
                    arr = decode(raw, mime)
                    feats.append(arr.ravel()[:dim].astype(np.float32))
                else:
                    feats.append(fake_features(raw, dim))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "features": feats, "n_bytes": nbytes}
            )

    return media.select("media_id", "mime", "payload").mapInPandas(kernel, schema=_FEAT_SCHEMA)


_FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_ms", IntegerType()),
    ]
)


def sample_frames(media: DataFrame, fps_out: float = 1.0) -> DataFrame:
    """Video frame sampling plan: one row per sampled frame timestamp —
    pure Catalyst (sequence/explode); the decode of each frame is the
    stubbed codec step."""
    n = (F.col("duration_ms") / F.lit(1000.0) * fps_out).cast("int")
    idx = F.explode(F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0))))
    return (
        media.where(F.col("kind") == "video")
        .select("media_id", "duration_ms", idx.alias("frame_idx"))
        .withColumn("frame_ms", (F.col("frame_idx") * F.lit(1000.0) / fps_out).cast("int"))
        .select("media_id", "frame_idx", "frame_ms")
    )


def synth_media(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic opaque media table for tests/bench (no codecs needed)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ("image", "audio", "video")
        mimes = {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}
        for pdf in batches:
            rows = {k.name: [] for k in MEDIA.fields}
            for i in pdf["id"]:
                rng = np.random.default_rng([seed, int(i)])
                kind = kinds[int(i) % 3]
                payload = rng.bytes(int(rng.integers(64, 512)))
                rows["media_id"].append(int(i))
                rows["kind"].append(kind)
                rows["mime"].append(mimes[kind])
                rows["width"].append(int(rng.integers(16, 4096)) if kind == "image" else None)
                rows["height"].append(int(rng.integers(16, 4096)) if kind == "image" else None)
                rows["duration_ms"].append(int(rng.integers(1000, 60000)) if kind != "image" else None)
                rows["payload"].append(payload)
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(gen, schema=MEDIA)
