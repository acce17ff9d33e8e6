"""S7 ingestion: TTF -> FontMetrics (struct-only parser, no FreeType).

Pinned against the checked-in metrics-only fixture tests/fixtures/mini.ttf
(regenerate: python tools/make_ttf_fixture.py) and round-tripped through
the same .info export / load path the atlas sink (K3) uses.
Ref semantics: /root/reference/src/label/font.cpp:54-75 (1pt @ 96dpi),
:100-122 (ceil'd kerning), :145-176 (ceil'd 26.6 advances)."""

from __future__ import annotations

import math
import os

import pytest

from util_ttf import FIXTURE_ADVANCES, FIXTURE_KERNING, FIXTURE_UPEM, encode_ttf

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "mini.ttf")


def test_fixture_bytes_deterministic():
    with open(FIXTURE, "rb") as fh:
        on_disk = fh.read()
    assert on_disk == encode_ttf(FIXTURE_ADVANCES, FIXTURE_KERNING, units_per_em=FIXTURE_UPEM)


def test_parse_ttf_tables():
    from osmgraft.functions.ttf import parse_ttf

    f = parse_ttf(FIXTURE)
    assert f.units_per_em == FIXTURE_UPEM
    assert f.num_glyphs == len(FIXTURE_ADVANCES) + 1  # + .notdef
    # cmap: every fixture char resolves to a distinct nonzero gid, in
    # sorted-codepoint order (the writer's assignment rule)
    chars = sorted(FIXTURE_ADVANCES)
    for i, c in enumerate(chars):
        assert f.cmap[ord(c)] == i + 1
        assert f.advance_units(f.cmap[ord(c)]) == FIXTURE_ADVANCES[c]
    assert ord("Z") not in f.cmap and f.glyph_id("Z") == 0  # .notdef fallback
    assert f.advance_units(0) == 500
    # kern: exact font-unit pairs
    got = {
        (chars[l - 1], chars[r - 1]): v for (l, r), v in f.kern.items()
    }
    assert got == FIXTURE_KERNING


def test_metrics_scaling_matches_reference_rule():
    from osmgraft.functions.ttf import metrics_from_ttf

    alphabet = "AVWTaoi"
    # reference rule: ceil(units * pt*dpi/72 / upem), font.cpp:172-176
    for pt in (1.0, 12.0):
        scale = pt * 96 / 72.0 / FIXTURE_UPEM
        m = metrics_from_ttf(FIXTURE, alphabet, pt=pt)
        for c in alphabet:
            assert m.advance(c) == math.ceil(FIXTURE_ADVANCES[c] * scale)
        for pair, units in FIXTURE_KERNING.items():
            want = math.ceil(units * scale)
            assert m.kerning.get(pair, 0) == want
    # at 12pt the fixture's kerning is observable in text_width
    m12 = metrics_from_ttf(FIXTURE, alphabet, pt=12.0)
    assert m12.text_width("AV") == m12.advance("A") + m12.advance("V") - 2


def test_info_roundtrip_through_atlas_format(tmp_path):
    """load_font_metrics(build_metrics_from_ttf(f)) — the VERDICT 'done'
    condition: a real .ttf flows into the exact metrics shape the label
    kernel broadcasts."""
    from osmgraft.functions.fontmetrics import load_font_metrics
    from osmgraft.functions.ttf import build_metrics_from_ttf, metrics_from_ttf

    alphabet = "AVWTaoi mne0123456789.-"
    info = build_metrics_from_ttf(FIXTURE, alphabet, "mini", str(tmp_path), pt=12.0)
    loaded = load_font_metrics(info)
    direct = metrics_from_ttf(FIXTURE, alphabet, pt=12.0)
    for c in set(alphabet):
        assert loaded.advance(c) == direct.advance(c)
    assert loaded.kerning == direct.kerning
    for s in ("AV", "To", "Wine 42", "no-kern ilmn"):
        assert loaded.text_width(s) == direct.text_width(s)


def test_label_split_with_ttf_metrics(tmp_path):
    # end-to-end: a TTF-derived metrics table drives the L4 split kernel
    from osmgraft.functions.labels import compute_label_ball
    from osmgraft.functions.ttf import metrics_from_ttf

    m = metrics_from_ttf(FIXTURE, "AVWTaoi mne0123456789.-", pt=12.0)
    label, radius = compute_label_ball(
        "Anna Anna Anna Anna", icon=None, factor=1.0, split_bound=4,
        split_chars=frozenset(" "), metrics=m,
    )
    assert "\n" in label  # wide text at a small bound must split
    assert radius > 0


def test_writer_parser_roundtrip_variants():
    from osmgraft.functions.ttf import parse_ttf

    for upem, advs, kern in [
        (1000, {"x": 450, "y": 470}, {}),
        (4096, {chr(0x20AC): 900, "Q": 1500, "q": 1100}, {("Q", "q"): -55}),  # € beyond BMP-ASCII
        (2048, {"a": 1, "b": 65000}, {("a", "b"): 120, ("b", "a"): -1}),  # positive kern too
    ]:
        path = f"/tmp/ttf_rt_{upem}.ttf"
        with open(path, "wb") as fh:
            fh.write(encode_ttf(advs, kern, units_per_em=upem))
        f = parse_ttf(path)
        assert f.units_per_em == upem
        chars = sorted(advs)
        for c in chars:
            assert f.advance_units(f.glyph_id(c)) == advs[c]
        got = {(chars[l - 1], chars[r - 1]): v for (l, r), v in f.kern.items()}
        assert got == kern


def test_parse_rejects_garbage(tmp_path):
    from osmgraft.functions.ttf import parse_ttf

    bad = tmp_path / "bad.ttf"
    bad.write_bytes(b"OTTO this is not a truetype font at all........")
    with pytest.raises(ValueError):
        parse_ttf(str(bad))
    short = tmp_path / "short.ttf"
    short.write_bytes(b"\x00\x01")
    with pytest.raises(ValueError):
        parse_ttf(str(short))
    # structurally valid sfnt but missing required tables
    nohead = tmp_path / "nohead.ttf"
    import struct

    nohead.write_bytes(
        struct.pack(">IHHHH", 0x00010000, 1, 16, 0, 0)
        + struct.pack(">4sIII", b"name", 0, 28, 4)
        + b"\0\0\0\0"
    )
    with pytest.raises(ValueError):
        parse_ttf(str(nohead))


# ---------------------------------------------------------------------------
# glyph outlines + scanline rasterizer (glyph-faithful K3 atlas)

# a 1000-upem toy outline font: square, square-with-hole, diamond (curves),
# composite = square shifted right by 300 units, and a blank space
_OUTLINE_UPEM = 1000
_SQUARE = [[(100, 0, True), (700, 0, True), (700, 600, True), (100, 600, True)]]
_HOLED = [
    [(0, 0, True), (800, 0, True), (800, 800, True), (0, 800, True)],  # CW outer
    [(200, 200, True), (200, 600, True), (600, 600, True), (600, 200, True)],  # CCW hole
]
_DIAMOND = [  # pure quadratic: all corners on-curve, all edges through off-curve ctrls
    [
        (400, 0, True), (700, 300, False), (400, 600, True), (100, 300, False),
    ]
]
_OUTLINES = {
    "s": _SQUARE,
    "h": _HOLED,
    "d": _DIAMOND,
    "c": ("ref", "s", 300, 0),
    # " " absent -> empty glyph
}
_OUTLINE_ADVANCES = {c: 800 for c in "shdc "}


def _outline_font(tmp_path):
    path = str(tmp_path / "outline.ttf")
    with open(path, "wb") as fh:
        fh.write(
            encode_ttf(_OUTLINE_ADVANCES, units_per_em=_OUTLINE_UPEM, outlines=_OUTLINES)
        )
    from osmgraft.functions.ttf import parse_ttf

    return parse_ttf(path), path


def test_glyph_contours_roundtrip(tmp_path):
    font, _ = _outline_font(tmp_path)
    assert font.glyph_contours(font.glyph_id("s")) == [
        [(x, y, on) for x, y, on in _SQUARE[0]]
    ]
    assert len(font.glyph_contours(font.glyph_id("h"))) == 2
    assert font.glyph_contours(font.glyph_id(" ")) == []  # blank glyph
    # composite: base square translated +300 in x
    comp = font.glyph_contours(font.glyph_id("c"))
    assert comp == [[(x + 300, y, on) for x, y, on in _SQUARE[0]]]


def test_rasterize_square_matches_analytic_box(tmp_path):
    import numpy as np

    from osmgraft.functions.ttf import rasterize_contours

    font, _ = _outline_font(tmp_path)
    w = h = 20
    scale = 20 / _OUTLINE_UPEM  # em -> 20px cell, baseline at cell bottom
    img = np.frombuffer(
        rasterize_contours(font.glyph_contours(font.glyph_id("s")), w, h, scale),
        dtype=np.uint8,
    ).reshape(h, w)
    # square spans x [2,14), y [0,12) in glyph px; row 0 is the TOP of the
    # cell so ink occupies rows [8,20), cols [2,14)
    assert (img[9:19, 3:13] == 255).all()  # strict interior
    assert (img[:7, :] == 0).all() and (img[:, 15:] == 0).all()
    assert (img[:, :1] == 0).all()


def test_rasterize_hole_is_empty(tmp_path):
    import numpy as np

    from osmgraft.functions.ttf import rasterize_contours

    font, _ = _outline_font(tmp_path)
    w = h = 20
    img = np.frombuffer(
        rasterize_contours(
            font.glyph_contours(font.glyph_id("h")), w, h, 20 / _OUTLINE_UPEM
        ),
        dtype=np.uint8,
    ).reshape(h, w)
    # outer [0,16) square px, hole [4,12): interior of hole must be blank,
    # ring between them solid (nonzero winding)
    # hole y [4,12) glyph px -> image rows [8,16); strict interior
    assert (img[9:15, 5:11] == 0).all()
    assert (img[17:19, 1:15] == 255).all()  # bottom ring band
    assert (img[9:15, 1:3] == 255).all()  # left ring band


def test_rasterize_quadratic_diamond_bounds(tmp_path):
    import numpy as np

    from osmgraft.functions.ttf import rasterize_contours

    font, _ = _outline_font(tmp_path)
    w = h = 20
    img = np.frombuffer(
        rasterize_contours(
            font.glyph_contours(font.glyph_id("d")), w, h, 20 / _OUTLINE_UPEM
        ),
        dtype=np.uint8,
    ).reshape(h, w)
    ink = img > 127
    # curve stays inside the control bbox [100,700]x[0,600] -> cols [2,14), rows [8,20)
    assert not ink[:8, :].any() and not ink[:, 15:].any() and not ink[:, :2].any()
    # and covers the straight-chord diamond (convex hull of on-curve pts is
    # a vertical segment x=400; the quadratic bulges out to the controls) —
    # center of mass is on the glyph center column
    ys, xs = np.nonzero(ink)
    assert abs(xs.mean() - (8 - 0.5)) < 1.0  # x=400units -> px 8
    # left-right symmetric coverage
    assert abs(ink[:, :8].sum() - ink[:, 8:16].sum()) <= ink.sum() * 0.1


def test_composite_equals_shifted_base(tmp_path):
    import numpy as np

    from osmgraft.functions.ttf import rasterize_contours

    font, _ = _outline_font(tmp_path)
    w, h = 26, 20
    scale = 20 / _OUTLINE_UPEM
    base = np.frombuffer(
        rasterize_contours(font.glyph_contours(font.glyph_id("s")), w, h, scale),
        dtype=np.uint8,
    ).reshape(h, w)
    comp = np.frombuffer(
        rasterize_contours(font.glyph_contours(font.glyph_id("c")), w, h, scale),
        dtype=np.uint8,
    ).reshape(h, w)
    # +300 units = +6px shift right
    assert (comp[:, 6:] == base[:, :-6]).all()
    assert (comp[:, :6] == 0).all()


def test_render_ttf_atlas_glyph_faithful(tmp_path):
    import numpy as np

    from osmgraft.functions.fontmetrics import load_font_metrics, read_png_gray8
    from osmgraft.functions.ttf import render_ttf_atlas

    alphabet = "shdc "
    info, png = render_ttf_atlas(
        str(_outline_font(tmp_path)[1]), alphabet, "outline", str(tmp_path), pt=12.0
    )
    m = load_font_metrics(info)
    width, height, pixels = read_png_gray8(png)
    img = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width)
    chars = sorted(set(alphabet))
    cell_w, cell_h = width // 14, 16
    cells = {c: img[:cell_h, i * cell_w : (i + 1) * cell_w] for i, c in enumerate(chars)}
    # space = blank glyph -> truly empty cell (not the synthetic box)
    assert (cells[" "] == 0).all()
    # square: antialiased real coverage — has gray edge pixels, and its ink
    # is narrower than the synthetic full-advance box would be
    sq = cells["s"]
    assert (sq == 255).any()
    assert ((sq > 0) & (sq < 255)).any(), "expected antialiased edges"
    # at 12pt (16px em, scale 16/1000), square ink cols ~[1.6, 11.2) while
    # advance(s)=ceil(800*0.016)=13 -> synthetic box would ink cols [0,13)
    assert (sq[:, 0] == 0).all() and (sq[:, 12] == 0).all()
    # diamond differs from square (shape actually drawn, not a box)
    assert not np.array_equal(cells["d"], cells["s"])
    # composite = square shifted (within the cell crop)
    assert m.advance("s") == 13


def test_gpos_only_kerning_roundtrip(tmp_path):
    """A font with kerning ONLY in GPOS PairPos must round-trip nonzero
    kerning through metrics_from_ttf (round-4 gap: modern fonts carry
    kerning exclusively in GPOS, and the parser yielded empty kerning for
    them). All three layouts: format 1, class-based format 2, and a
    type-9 Extension-wrapped lookup."""
    from osmgraft.functions.ttf import metrics_from_ttf, parse_ttf

    advs = {"A": 1200, "V": 1180, "o": 900, "T": 1100}
    pairs = {("A", "V"): -160, ("V", "A"): -140, ("T", "o"): -90}
    for fmt, ext in [(1, False), (2, False), (1, True), (2, True)]:
        path = str(tmp_path / f"gpos_{fmt}_{ext}.ttf")
        with open(path, "wb") as fh:
            fh.write(
                encode_ttf(advs, units_per_em=2048, gpos_kerning=pairs,
                           gpos_fmt=fmt, gpos_extension=ext)
            )
        f = parse_ttf(path)
        assert not f.kern  # no legacy kern table
        chars = sorted(advs)
        gid = {c: f.glyph_id(c) for c in chars}
        for (a, b), v in pairs.items():
            assert f.kern_units(gid[a], gid[b]) == v, (fmt, ext, a, b)
        # unkerned pairs stay 0 (incl. class-0 fallthrough in format 2)
        assert f.kern_units(gid["o"], gid["T"]) == 0
        m = metrics_from_ttf(path, "AVoT", pt=12.0)
        assert m.kerning.get(("A", "V")) == math.ceil(-160 * 12 * 96 / 72 / 2048)
        assert ("o", "T") not in m.kerning


def test_legacy_kern_wins_over_gpos(tmp_path):
    """FreeType serves the legacy kern table when both exist; the parser
    must do the same (ref font.cpp:100-122 via FT_Get_Kerning)."""
    from osmgraft.functions.ttf import parse_ttf

    advs = {"A": 1200, "V": 1180}
    path = str(tmp_path / "both.ttf")
    with open(path, "wb") as fh:
        fh.write(
            encode_ttf(advs, kerning={("A", "V"): -50}, units_per_em=2048,
                       gpos_kerning={("A", "V"): -999, ("V", "A"): -77})
        )
    f = parse_ttf(path)
    a, v = f.glyph_id("A"), f.glyph_id("V")
    assert f.kern_units(a, v) == -50      # kern shadows GPOS
    assert f.kern_units(v, a) == -77      # GPOS fills the gaps


def test_malformed_repeat_flag_raises(tmp_path):
    """A glyph whose REPEAT flag overruns the point count must fail
    cleanly instead of silently misaligning coordinate reads."""
    import struct as _s

    from osmgraft.functions.ttf import _parse_simple_glyph

    # one contour of 3 points; flags: first byte repeats 200 times
    hdr = _s.pack(">hhhhh", 1, 0, 0, 100, 100) + _s.pack(">HH", 2, 0)
    data = hdr + bytes([0x09, 200])  # on-curve | REPEAT, count 200
    with pytest.raises(ValueError, match="REPEAT"):
        _parse_simple_glyph(data, 0, 1)


# ---------------------------------------------------------------------------
# adversarial-bytes bombs: loops whose iteration count is NOT bounded by the
# payload size (fuzz-found: a single byte flip in a 356-byte font turned the
# cmap12 group walk into a multi-billion-iteration hang + dict bomb)
# ---------------------------------------------------------------------------


def _cmap12(groups: list[tuple[int, int, int]]) -> bytes:
    import struct

    hdr = struct.pack(">HH", 0, 1) + struct.pack(">HHI", 3, 10, 12)
    sub = struct.pack(">HHIII", 12, 0, 16 + 12 * len(groups), 0, len(groups))
    return hdr + sub + b"".join(struct.pack(">III", *g) for g in groups)


def test_cmap12_huge_group_raises_fast():
    import time

    from osmgraft.functions.ttf import _parse_cmap

    # bound CPU time, not wall time: a real group-walk bomb is CPU-bound,
    # while wall time is inflated by Spark suites saturating the box
    t0 = time.process_time()
    with pytest.raises(ValueError, match="cmap12"):
        _parse_cmap(_cmap12([(0, 0xFFFF_FFFE, 1)]), 0)
    with pytest.raises(ValueError, match="cmap12"):  # reversed range
        _parse_cmap(_cmap12([(0xFFFF_0000, 0x61_FFFF, 1)]), 0)
    with pytest.raises(ValueError, match="cmap12"):  # cumulative overflow
        _parse_cmap(_cmap12([(0, 0x10FFFF, 1), (0, 0x10FFFF, 1)]), 0)
    assert time.process_time() - t0 < 5.0
    # a full-Unicode single group is spec-valid and must still parse
    out = _parse_cmap(_cmap12([(0x41, 0x5A, 1)]), 0)
    assert out[0x41] == 1 and out[0x5A] == 1 + 0x5A - 0x41


def test_cmap4_overlapping_segments_raise():
    import struct

    from osmgraft.functions.ttf import _parse_cmap

    seg = 3  # three segments each claiming the full 16-bit space
    hdr = struct.pack(">HH", 0, 1) + struct.pack(">HHI", 3, 1, 12)
    sub = struct.pack(">HHHHHHH", 4, 0, 0, seg * 2, 0, 0, 0)
    ends = struct.pack(f">{seg}H", *([0xFFFE] * seg)) + b"\x00\x00"  # + pad
    starts = struct.pack(f">{seg}H", 0, 0, 0)
    deltas = struct.pack(f">{seg}h", 1, 1, 1)
    ros = struct.pack(f">{seg}H", 0, 0, 0)
    with pytest.raises(ValueError, match="cmap4"):
        _parse_cmap(hdr + sub + ends + starts + deltas + ros, 0)


def test_coverage_overlapping_ranges_raise():
    import struct

    from osmgraft.functions.ttf import _parse_coverage

    data = struct.pack(">HH", 2, 3) + b"".join(
        struct.pack(">HHH", 0, 0xFFFF, 0) for _ in range(3)
    )
    with pytest.raises(ValueError, match="coverage"):
        _parse_coverage(data, 0)
    with pytest.raises(ValueError, match="reversed"):
        _parse_coverage(struct.pack(">HH", 2, 1) + struct.pack(">HHH", 9, 3, 0), 0)
