"""ISO-BMFF (MP4) container metadata parser (no Spark needed).

The video modality's metadata path is real — duration/timescale/geometry
parsed from bytes by a struct-only box walk — while frame DECODE stays an
honest raise behind the codec seam (no stdlib video codec exists)."""

from __future__ import annotations

import struct

import pytest

from osmgraft.operators.multimodal import encode_mp4_stub, parse_mp4_meta


def test_roundtrip_basic():
    p = encode_mp4_stub(duration_ms=12_345, width=640, height=360)
    m = parse_mp4_meta(p)
    assert m["duration_ms"] == 12_345
    assert (m["width"], m["height"]) == (640, 360)
    assert m["n_tracks"] == 1
    assert m["brand"] == "isom"
    assert m["timescale"] == 1000


def test_roundtrip_timescales():
    # duration_ms = duration * 1000 // timescale must invert the writer's
    # duration = ms * timescale // 1000 exactly when timescale divides 1000
    for ts in (1000, 90_000, 600):
        p = encode_mp4_stub(duration_ms=7_000, width=128, height=72, timescale=ts)
        assert parse_mp4_meta(p)["duration_ms"] == 7_000


def test_rejects_garbage():
    with pytest.raises(ValueError):
        parse_mp4_meta(b"")
    with pytest.raises(ValueError):
        parse_mp4_meta(b"\x00" * 64)  # size-0 boxes but no ftyp/mvhd
    # a box claiming to overrun its container must fail cleanly
    bad = struct.pack(">I", 1 << 30) + b"ftypisom"
    with pytest.raises(ValueError, match="overruns"):
        parse_mp4_meta(bad)


def test_box_count_bounded():
    # many tiny valid boxes: the walk must stop at the bound, not spin
    flood = encode_mp4_stub(1000, 8, 8) + box_flood(20_000)
    with pytest.raises(ValueError, match="bound"):
        parse_mp4_meta(flood)


def box_flood(n: int) -> bytes:
    return (struct.pack(">I", 8) + b"free") * n


def test_video_decode_still_raises():
    from osmgraft.operators.multimodal import decode_media

    with pytest.raises(NotImplementedError):
        decode_media(encode_mp4_stub(1000, 64, 64), "video/mp4")
