"""Multimodal column plumbing: opaque binary media + typed metadata.

Media (image/audio/video) are opaque ``binary`` columns with a typed
metadata struct, processed by Arrow-batched kernels over ``mapInPandas``.
One codec is REAL and stdlib-only: PCM WAV (``decode_wav`` — struct reads
over the RIFF chunks, 8/16/32-bit PCM + 32-bit float, any channel count),
feeding ``wav_features`` (duration, RMS, zero-crossing rate, peak +
log-magnitude spectrum bins). Image/video codec libraries are NOT in this
container, so those mimes still raise behind ``decode_media`` — the seam
(``extract_features(codec=...)``) accepts any ``(payload, mime) ->
ndarray`` callable, and everything around it (schema, batching, partition
sizing, feature signature, deterministic fake features for tests) is real
Spark plumbing that works unchanged once a richer codec is dropped in.
"""

from __future__ import annotations

import hashlib
import struct
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


_WAV_MIMES = ("audio/wav", "audio/x-wav", "audio/wave")


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Stdlib-only PCM WAV decoder: struct reads over the RIFF chunk list
    (word-aligned, unknown chunks skipped). Supports format 1 (PCM) at
    8/16/32 bits and format 3 (IEEE float) at 32 bits, any channel count
    (downmixed to mono by mean). Returns ``(float32 mono samples in
    [-1, 1], sample_rate)``. Raises ``ValueError`` on anything that is not
    a decodable WAV — nothing silently trains on garbage bytes."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    fmt = data = None
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            fmt = struct.unpack_from("<HHIIHH", body)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, n_ch, rate, _byte_rate, _block, bits = fmt
    if n_ch < 1 or rate < 1:
        raise ValueError(f"bad fmt chunk: channels={n_ch} rate={rate}")
    if (audio_fmt, bits) == (1, 8):
        raw = np.frombuffer(data, dtype=np.uint8)
        samples = (raw.astype(np.float32) - 128.0) / 128.0
    elif (audio_fmt, bits) == (1, 16):
        raw = np.frombuffer(data[: len(data) - (len(data) % 2)], dtype="<i2")
        samples = raw.astype(np.float32) / 32768.0
    elif (audio_fmt, bits) == (1, 32):
        raw = np.frombuffer(data[: len(data) - (len(data) % 4)], dtype="<i4")
        samples = raw.astype(np.float32) / 2147483648.0
    elif (audio_fmt, bits) == (3, 32):
        samples = np.frombuffer(data[: len(data) - (len(data) % 4)], dtype="<f4").copy()
    else:
        raise ValueError(f"unsupported WAV encoding: format={audio_fmt} bits={bits}")
    n_frames = samples.size // n_ch
    return samples[: n_frames * n_ch].reshape(n_frames, n_ch).mean(axis=1).astype(np.float32), rate


def encode_wav_pcm16(samples: np.ndarray, rate: int) -> bytes:
    """Canonical 44-byte-header PCM16 mono WAV writer (struct-only) — the
    synth/test counterpart of :func:`decode_wav`."""
    # x*32768 rounded (clipped to int16) inverts decode's /32768 exactly
    scaled = np.round(np.asarray(samples, dtype=np.float64) * 32768.0)
    pcm = np.clip(scaled, -32768, 32767).astype("<i2")
    data = pcm.tobytes()
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
    )
    return hdr + data


def wav_features(samples: np.ndarray, rate: int, n_spec: int = 60) -> np.ndarray:
    """Fixed-length audio feature vector: ``[duration_s, rms,
    zero_crossing_rate, peak]`` + ``n_spec`` log-magnitude spectrum bins
    (rfft magnitudes mean-pooled into equal bins). Deterministic, pure
    numpy."""
    n = samples.size
    if n == 0:
        return np.zeros(4 + n_spec, dtype=np.float32)
    rms = float(np.sqrt(np.mean(samples.astype(np.float64) ** 2)))
    zcr = float(np.count_nonzero(np.signbit(samples[1:]) != np.signbit(samples[:-1]))) / max(
        n - 1, 1
    )
    peak = float(np.max(np.abs(samples)))
    mag = np.abs(np.fft.rfft(samples.astype(np.float64)))
    # mean-pool the spectrum into n_spec equal bins (pad if shorter)
    if mag.size < n_spec:
        mag = np.pad(mag, (0, n_spec - mag.size))
    edges = np.linspace(0, mag.size, n_spec + 1).astype(int)
    pooled = np.add.reduceat(mag, edges[:-1]) / np.maximum(np.diff(edges), 1)
    spec = np.log1p(pooled)
    head = np.array([n / rate, rms, zcr, peak], dtype=np.float64)
    return np.concatenate([head, spec]).astype(np.float32)


def decode_media(payload: bytes, mime: str) -> np.ndarray:
    """Default codec for the ``extract_features`` seam.

    ``audio/wav`` is REAL (stdlib RIFF parse -> :func:`wav_features`);
    other mimes raise so nothing silently trains on fake pixels — real
    deployments plug Pillow/ffmpeg in via the ``codec=`` parameter."""
    if mime in _WAV_MIMES:
        return wav_features(*decode_wav(payload))
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
                    v = decode(raw, mime).ravel()[:dim].astype(np.float32)
                    if v.size < dim:  # uniform length: zero-pad short decodes
                        v = np.pad(v, (0, dim - v.size))
                    feats.append(v)
                else:
                    feats.append(fake_features(raw, dim))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "features": feats, "n_bytes": nbytes}
            )

    return media.select("media_id", "mime", "payload").mapInPandas(kernel, schema=_FEAT_SCHEMA)


_WAV_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", LongType()),
        StructField("n_samples", LongType()),
        StructField("duration_ms", LongType()),
    ]
)


def wav_decode_meta(media: DataFrame) -> DataFrame:
    """Decode WAV headers+data at scale: (media_id, sample_rate, n_samples,
    duration_ms), all derived from the BYTES by :func:`decode_wav` — the
    DuckDB oracle recomputes them arithmetically from ``octet_length`` and
    the staged ``rate`` column, so a hash match proves the byte-level
    parse. Arrow-batched ``mapInPandas``; duration uses integer math
    (``n*1000 // rate``) to stay float-free on both sides."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mid, sr, ns, ms = [], [], [], []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                samples, rate = decode_wav(bytes(payload))
                mid.append(int(media_id))
                sr.append(rate)
                ns.append(samples.size)
                ms.append(samples.size * 1000 // rate)
            yield pd.DataFrame(
                {"media_id": mid, "sample_rate": sr, "n_samples": ns, "duration_ms": ms}
            )

    return media.select("media_id", "payload").mapInPandas(kernel, schema=_WAV_META_SCHEMA)


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
