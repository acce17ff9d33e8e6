"""Progressive (SOF2) JPEG decode, T.81 Annex G (no Spark needed).

The progressive and baseline encoders share one coefficient front half
(same FDCT + quantization), so the decisive oracle is: decoding the
progressive stream must reproduce the baseline decode of the same image
BIT-FOR-BIT — any error in spectral-selection bookkeeping, successive
approximation, EOBRUN handling or correction bits breaks exact
equality."""

from __future__ import annotations

import numpy as np
import pytest

from osmgraft.operators.jpegcodec import (
    decode_jpeg,
    encode_jpeg_baseline,
    encode_jpeg_progressive,
)


def _img(shape, seed=11):
    return np.random.default_rng(seed).integers(0, 256, shape, dtype=np.uint8)


@pytest.mark.parametrize(
    "shape,sub",
    [
        ((16, 16), "444"),
        ((33, 41), "444"),
        ((8, 8), "444"),
        ((48, 64, 3), "444"),
        ((33, 41, 3), "420"),
        ((100, 75, 3), "420"),
    ],
)
@pytest.mark.parametrize("quality", [70, 90, 100])
def test_progressive_equals_baseline(shape, sub, quality):
    img = _img(shape)
    base = decode_jpeg(encode_jpeg_baseline(img, quality=quality, subsampling=sub))
    prog = decode_jpeg(encode_jpeg_progressive(img, quality=quality, subsampling=sub))
    assert np.array_equal(base, prog)


def test_progressive_smooth_gradient_eobrun_heavy():
    # smooth content makes most AC bands all-zero -> long EOBRUNs
    y, x = np.mgrid[0:64, 0:96]
    img = ((x + y) % 256).astype(np.uint8)
    b = decode_jpeg(encode_jpeg_baseline(img, quality=50))
    p = decode_jpeg(encode_jpeg_progressive(img, quality=50))
    assert np.array_equal(b, p)


@pytest.mark.parametrize("sub,rst", [("444", 2), ("420", 1), ("444", 3)])
def test_progressive_restart_intervals(sub, rst):
    img = _img((48, 64, 3), seed=13)
    b = decode_jpeg(encode_jpeg_baseline(img, quality=85, subsampling=sub))
    p = decode_jpeg(
        encode_jpeg_progressive(img, quality=85, subsampling=sub, restart_interval=rst)
    )
    assert np.array_equal(b, p)


def test_progressive_custom_scan_scripts():
    img = _img((24, 56, 3), seed=17)
    b = decode_jpeg(encode_jpeg_baseline(img, quality=80))
    scripts = {
        "spectral-only": [("dc", [0, 1, 2], 0, 0, 0, 0)]
        + [("ac", [c], 1, 63, 0, 0) for c in range(3)],
        "three-band": [("dc", [0, 1, 2], 0, 0, 0, 0)]
        + [("ac", [c], s, e, 0, 0) for c in range(3) for s, e in ((1, 2), (3, 20), (21, 63))],
        # four successive-approximation levels in both DC and AC: every
        # refinement path (corrections, ZRL-with-corrections, EOBRUN
        # buffering) fires repeatedly
        "deep-SA": (
            [("dc", [0, 1, 2], 0, 0, 0, 3)]
            + [("dc", [0, 1, 2], 0, 0, a + 1, a) for a in (2, 1, 0)]
            + [("ac", [c], 1, 63, 0, 3) for c in range(3)]
            + [("ac", [c], 1, 63, a + 1, a) for a in (2, 1, 0) for c in range(3)]
        ),
    }
    for name, script in scripts.items():
        p = decode_jpeg(encode_jpeg_progressive(img, quality=80, scan_script=script))
        assert np.array_equal(b, p), name


def test_progressive_gray():
    img = _img((40, 40), seed=19)
    b = decode_jpeg(encode_jpeg_baseline(img, quality=90))
    p = decode_jpeg(encode_jpeg_progressive(img, quality=90))
    assert np.array_equal(b, p)


def test_progressive_malformed():
    img = _img((16, 16), seed=23)
    p = bytearray(encode_jpeg_progressive(img, quality=90))
    # truncated entropy stream
    with pytest.raises(ValueError):
        decode_jpeg(bytes(p[: len(p) // 2]))
    # geometry bomb still capped before any allocation
    import struct

    sof = p.find(b"\xff\xc2")
    struct.pack_into(">HH", p, sof + 5, 60000, 60000)
    with pytest.raises(ValueError, match="max_samples"):
        decode_jpeg(bytes(p))
