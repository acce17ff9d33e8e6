"""Stdlib baseline JPEG codec (no Spark needed).

Strategy mirrors test_image_codec.py: the encoder (the synth/test
counterpart) forward-transforms known images and the decoder must invert
them within the format's own loss envelope — exact for flat blocks at
quality=100, ±2 for arbitrary content at quality=100 (DCT + color
rounding only), and restart-interval streams must decode identically to
their unsegmented twins. Unsupported shapes raise instead of decoding
garbage (the seam treats a raise as "route to the injected codec")."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from osmgraft.operators.jpegcodec import (
    _ZZ,
    decode_jpeg,
    encode_jpeg_baseline,
)


def _rand_img(shape, seed):
    return np.random.default_rng(seed).integers(0, 256, shape, dtype=np.uint8)


def test_zigzag_order_is_the_spec_table():
    # spot-pin the generated walk against the well-known T.81 sequence
    assert list(_ZZ[:12]) == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25]
    assert list(_ZZ[-4:]) == [47, 55, 62, 63]
    assert sorted(_ZZ) == list(range(64))


def test_flat_gray_roundtrip_exact():
    img = np.full((24, 16), 77, np.uint8)
    out = decode_jpeg(encode_jpeg_baseline(img, quality=100))
    assert out.shape == (24, 16)
    assert np.array_equal(out, img)


def test_random_gray_q100_within_rounding():
    img = _rand_img((40, 56), 11)
    out = decode_jpeg(encode_jpeg_baseline(img, quality=100))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1


def test_rgb_444_q100_within_rounding():
    img = _rand_img((33, 47, 3), 12)  # non-multiple-of-8 dims exercise padding
    out = decode_jpeg(encode_jpeg_baseline(img, quality=100, subsampling="444"))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2


def test_rgb_420_gradient_quality():
    x = np.linspace(0, 255, 64).astype(np.uint8)
    img = np.stack(
        [
            np.tile(x, (48, 1)),
            np.tile(np.linspace(0, 255, 48).astype(np.uint8)[:, None], (1, 64)),
            np.full((48, 64), 90, np.uint8),
        ],
        axis=2,
    )
    out = decode_jpeg(encode_jpeg_baseline(img, quality=90, subsampling="420"))
    assert out.shape == img.shape
    rmse = np.sqrt(((out.astype(float) - img.astype(float)) ** 2).mean())
    assert rmse < 4.0  # smooth gradient survives 4:2:0 at high quality


def test_420_subsampled_chroma_blocks():
    # constant-color image: chroma subsampling is lossless on it
    img = np.zeros((32, 32, 3), np.uint8)
    img[..., 0], img[..., 1], img[..., 2] = 200, 30, 90
    out = decode_jpeg(encode_jpeg_baseline(img, quality=100, subsampling="420"))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2


def test_restart_interval_stream_identical():
    img = _rand_img((40, 40), 13)
    with_rst = encode_jpeg_baseline(img, quality=100, restart_interval=3)
    without = encode_jpeg_baseline(img, quality=100)
    assert b"\xff\xd0" in with_rst or b"\xff\xd1" in with_rst  # RSTn present
    a, b = decode_jpeg(with_rst), decode_jpeg(without)
    assert np.array_equal(a, b)
    assert np.abs(a.astype(int) - img.astype(int)).max() <= 1


def test_decode_is_deterministic():
    img = _rand_img((24, 24, 3), 14)
    payload = encode_jpeg_baseline(img, quality=85, subsampling="420")
    assert np.array_equal(decode_jpeg(payload), decode_jpeg(payload))


def test_rejects_unsupported_shapes():
    img = _rand_img((16, 16), 15)
    ok = encode_jpeg_baseline(img, quality=100)
    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg")
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xd9")  # SOI+EOI, no frame
    # a baseline-layout stream relabeled SOF2 is malformed progressive
    # (Ss=0/Se=63 is no legal progressive scan); real progressive streams
    # decode — see test_jpeg_progressive.py
    prog = bytearray(ok)
    sof = prog.find(b"\xff\xc0")
    prog[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="Se=0"):
        decode_jpeg(bytes(prog))
    # genuinely unsupported SOF: lossless (SOF3)
    lossless = bytearray(ok)
    lossless[sof + 1] = 0xC3
    with pytest.raises(ValueError, match="SOF marker"):
        decode_jpeg(bytes(lossless))
    # truncated entropy stream
    with pytest.raises(ValueError):
        decode_jpeg(ok[: len(ok) - max(8, len(ok) // 4)])


def test_geometry_bomb_capped():
    img = _rand_img((16, 16), 16)
    ok = bytearray(encode_jpeg_baseline(img, quality=100))
    sof = ok.find(b"\xff\xc0")
    # claim a 60000x60000 canvas in the SOF of a tiny payload
    struct.pack_into(">HH", ok, sof + 5, 60000, 60000)
    with pytest.raises(ValueError, match="max_samples"):
        decode_jpeg(bytes(ok))


def test_decode_media_routes_jpeg():
    from osmgraft.operators.multimodal import decode_media

    img = _rand_img((20, 28, 3), 17)
    feats = decode_media(encode_jpeg_baseline(img, quality=100), "image/jpeg")
    # image_features head: [w, h, c, mean, std]
    assert feats[0] == 28 and feats[1] == 20 and feats[2] == 3
