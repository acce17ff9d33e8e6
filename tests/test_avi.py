"""MJPEG-AVI container codec: REAL video frame decode from bytes.

The frame path reuses the stdlib baseline JPEG codec — a RIFF-AVI walk
yields per-frame byte slices, so sampling at fps_out decodes ONLY the
sampled frames. Non-MJPEG video (mp4 et al.) still raises behind the
codec seam; this is the one container whose frames the sandbox can decode
for real."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from osmgraft.operators.multimodal import (
    decode_avi_frame,
    decode_media,
    decode_video_frames,
    encode_avi_mjpeg,
    parse_avi_mjpeg,
)


def _frames(n: int = 8, h: int = 24, w: int = 32, rgb: bool = True):
    out = []
    y, x = np.mgrid[0:h, 0:w]
    for k in range(n):
        base = ((x * 4 + y * 6 + k * 13) % 256).astype(np.uint8)
        out.append(np.stack([base, base[::-1], np.roll(base, k, axis=1)], axis=2) if rgb else base)
    return out


def test_container_roundtrip():
    frames = _frames(10)
    p = encode_avi_mjpeg(frames, fps=5.0, quality=92)
    m = parse_avi_mjpeg(p)
    assert m["us_per_frame"] == 200_000
    assert m["n_frames"] == 10
    assert (m["width"], m["height"]) == (32, 24)
    assert m["handler"] == "MJPG"
    assert len(m["frames"]) == 10


@pytest.mark.parametrize("rgb", [False, True])
def test_frame_decode_near_lossless(rgb):
    frames = _frames(6, rgb=rgb)
    p = encode_avi_mjpeg(frames, fps=10.0, quality=95)
    for k in (0, 3, 5):
        img = decode_avi_frame(p, k)
        assert img.shape == frames[k].shape
        # smooth gradients at q95: decode must track the source closely
        assert np.abs(img.astype(int) - frames[k].astype(int)).mean() < 1.5


def test_frame_index_bounds():
    p = encode_avi_mjpeg(_frames(3), fps=10.0)
    with pytest.raises(IndexError):
        decode_avi_frame(p, 3)


def test_rejects_garbage():
    with pytest.raises(ValueError):
        parse_avi_mjpeg(b"")
    with pytest.raises(ValueError):
        parse_avi_mjpeg(b"RIFF\x08\x00\x00\x00WAVE")  # RIFF but not AVI
    p = encode_avi_mjpeg(_frames(2), fps=10.0)
    with pytest.raises(ValueError, match="overruns"):
        parse_avi_mjpeg(p[:40])


def test_chunk_count_bounded():
    # flood of tiny valid chunks: the walk must stop at the bound
    flood = (b"JUNK" + struct.pack("<I", 0)) * 1000
    body = b"AVI " + flood
    p = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(ValueError, match="bound"):
        parse_avi_mjpeg(p, max_chunks=100)


def test_decode_media_uses_middle_frame():
    frames = _frames(5)
    p = encode_avi_mjpeg(frames, fps=10.0, quality=95)
    feats = decode_media(p, "video/x-msvideo")
    # feature head is [width, height, channels, mean, std]
    assert feats[0] == 32 and feats[1] == 24 and feats[2] == 3
    from osmgraft.operators.multimodal import image_features

    expect = image_features(decode_avi_frame(p, 2))
    assert np.allclose(feats, expect)


def test_decode_video_frames_spark(spark):
    # 2 clips at different fps; 2 fps sampling must decode only the
    # sampled source frames and reproduce the driver-side ground truth
    clips = {
        0: encode_avi_mjpeg(_frames(12), fps=6.0, quality=90),   # 2.0 s
        1: encode_avi_mjpeg(_frames(30, rgb=False), fps=30.0),   # 1.0 s
    }
    media = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in clips.items()], "media_id long, payload binary"
    )
    rows = {
        (r.media_id, r.frame_idx): r
        for r in decode_video_frames(media, fps_out=2.0).collect()
    }
    # clip 0: 2.0 s * 2 fps = 4 samples; clip 1: 30 frames at 30 fps is
    # 999.99 ms (µs/frame truncates), so one sample
    assert sorted(rows) == [(0, 0), (0, 1), (0, 2), (0, 3), (1, 0)]
    for (mid, k), r in rows.items():
        meta = parse_avi_mjpeg(clips[mid])
        src = min(int(r.frame_ms * 1000 / meta["us_per_frame"]), meta["n_frames"] - 1)
        img = decode_avi_frame(clips[mid], src)
        assert (r.width, r.height) == (img.shape[1], img.shape[0])
        assert r.px_sum == int(img.astype(np.int64).sum())
        assert r.frame_ms == int(k * 500)


def _avi_no_frames(total_frames: int = 5, us_per_frame: int = 100_000) -> bytes:
    """Structurally valid RIFF-AVI: avih header claims frames, but the
    movi list holds zero ..dc/..db chunks."""
    avih = struct.pack(
        "<14I", us_per_frame, 0, 0, 0, total_frames, 0, 1, 0, 32, 24, 0, 0, 0, 0
    )
    hdrl = b"hdrl" + b"avih" + struct.pack("<I", len(avih)) + avih
    body = (
        b"AVI "
        + b"LIST" + struct.pack("<I", len(hdrl)) + hdrl
        + b"LIST" + struct.pack("<I", 4) + b"movi"
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_zero_frame_avi_routes_through_on_error(spark):
    """An AVI whose movi list is empty must hit the on_error policy, not
    crash the task with an uncaught IndexError on frames[-1]."""
    p = _avi_no_frames()
    meta = parse_avi_mjpeg(p)  # the container itself parses fine...
    assert meta["frames"] == [] and meta["n_frames"] == 5

    media = spark.createDataFrame(
        [(0, bytearray(p)), (1, bytearray(encode_avi_mjpeg(_frames(4), fps=4.0)))],
        "media_id long, payload binary",
    )
    # skip: the bad clip contributes nothing, the good clip still decodes
    rows = decode_video_frames(media, fps_out=2.0, on_error="skip").collect()
    assert {r.media_id for r in rows} == {1}
    # raise: surfaces as a task error (ValueError inside the kernel)
    with pytest.raises(Exception, match="no video frame"):
        decode_video_frames(media, fps_out=2.0, on_error="raise").collect()
