"""Minimal TrueType WRITER (struct-only) — test counterpart of
``osmgraft.functions.ttf.parse_ttf``, used to build the checked-in
fixture and for round-trip tests. Emits the metric-bearing tables
(head/hhea/maxp/hmtx/cmap fmt4/kern fmt0) with valid checksums and a
sorted table directory; ``outlines=`` adds glyf/loca (long format) with
simple quadratic contours or offset composites, for rasterizer tests.
Layouts follow the public TrueType specification."""

from __future__ import annotations

import struct


def _checksum(table: bytes) -> int:
    padded = table + b"\0" * (-len(table) % 4)
    return sum(struct.unpack(f">{len(padded) // 4}I", padded)) & 0xFFFFFFFF


def _cmap_fmt4(code_to_gid: dict[int, int]) -> bytes:
    # contiguous (code, gid) runs -> delta segments; final 0xFFFF sentinel
    codes = sorted(code_to_gid)
    segs: list[tuple[int, int, int]] = []  # (start, end, delta)
    for code in codes:
        gid = code_to_gid[code]
        if segs and code == segs[-1][1] + 1 and (gid - code) % 65536 == segs[-1][2]:
            segs[-1] = (segs[-1][0], code, segs[-1][2])
        else:
            segs.append((code, code, (gid - code) % 65536))
    segs.append((0xFFFF, 0xFFFF, 1))
    n = len(segs)
    seg_x2 = 2 * n
    import math

    sel = int(math.log2(n))
    search = 2 * (2**sel)
    body = struct.pack(f">{n}H", *[s[1] for s in segs])  # endCode
    body += b"\0\0"  # reservedPad
    body += struct.pack(f">{n}H", *[s[0] for s in segs])  # startCode
    body += struct.pack(f">{n}h", *[d - 65536 if d >= 32768 else d for _, _, d in segs])
    body += struct.pack(f">{n}H", *([0] * n))  # idRangeOffset
    sub = struct.pack(">HHHHHHH", 4, 14 + len(body), 0, seg_x2, search, sel, seg_x2 - search)
    sub += body
    header = struct.pack(">HH", 0, 1) + struct.pack(">HHI", 3, 1, 12)
    return header + sub


def _kern_fmt0(gid_pairs: dict[tuple[int, int], int]) -> bytes:
    import math

    keys = sorted(gid_pairs)
    n = len(keys)
    sel = int(math.log2(n)) if n else 0
    search = 6 * (2**sel)
    body = struct.pack(">HHHH", n, search, sel, 6 * n - search)
    for left, right in keys:
        body += struct.pack(">HHh", left, right, gid_pairs[(left, right)])
    sub = struct.pack(">HHH", 0, 6 + 8 + 6 * n, 0x0001) + body
    return struct.pack(">HH", 0, 1) + sub


def _gpos_pairpos(
    gid_pairs: dict[tuple[int, int], int],
    fmt: int = 1,
    extension: bool = False,
) -> bytes:
    """GPOS with one PairPos lookup carrying XAdvance-on-first kerning.
    ``fmt=1`` emits per-pair sets; ``fmt=2`` a class matrix where every
    distinct left/right glyph gets its own class (class 0 = everything
    else). ``extension=True`` wraps the subtable in a type-9 Extension
    lookup. Layouts follow the public OpenType specification."""
    lefts = sorted({l for l, _ in gid_pairs})
    vf1, vf2 = 0x0004, 0x0000  # XAdvance on first glyph only

    def coverage(glyphs: list[int]) -> bytes:
        return struct.pack(f">HH{len(glyphs)}H", 1, len(glyphs), *glyphs)

    if fmt == 1:
        # subtable: header, pairset offsets, coverage, pairsets
        n_sets = len(lefts)
        header_len = 10 + 2 * n_sets
        sets = []
        for l in lefts:
            rights = sorted(r for (ll, r) in gid_pairs if ll == l)
            body = struct.pack(">H", len(rights))
            for r in rights:
                body += struct.pack(">Hh", r, gid_pairs[(l, r)])
            sets.append(body)
        cov = coverage(lefts)
        cov_off = header_len
        set_offs = []
        pos = cov_off + len(cov)
        for s in sets:
            set_offs.append(pos)
            pos += len(s)
        sub = struct.pack(">HHHHH", 1, cov_off, vf1, vf2, n_sets)
        sub += struct.pack(f">{n_sets}H", *set_offs)
        sub += cov + b"".join(sets)
    else:
        rights = sorted({r for _, r in gid_pairs})
        lcls = {g: i + 1 for i, g in enumerate(lefts)}
        rcls = {g: i + 1 for i, g in enumerate(rights)}
        c1n, c2n = len(lefts) + 1, len(rights) + 1

        def classdef(cls_map: dict[int, int]) -> bytes:
            out = struct.pack(">HH", 2, len(cls_map))
            for g in sorted(cls_map):
                out += struct.pack(">HHH", g, g, cls_map[g])
            return out

        matrix = b""
        for i in range(c1n):
            for j in range(c2n):
                l = lefts[i - 1] if i else -1
                r = rights[j - 1] if j else -1
                matrix += struct.pack(">h", gid_pairs.get((l, r), 0))
        cov = coverage(lefts)
        cd1, cd2 = classdef(lcls), classdef(rcls)
        head_len = 16
        cov_off = head_len + len(matrix)
        cd1_off = cov_off + len(cov)
        cd2_off = cd1_off + len(cd1)
        sub = struct.pack(
            ">HHHHHHHH", 2, cov_off, vf1, vf2, cd1_off, cd2_off, c1n, c2n
        )
        sub += matrix + cov + cd1 + cd2

    if extension:
        ext = struct.pack(">HHI", 1, 2, 8) + sub
        lookup = struct.pack(">HHHH", 9, 0, 1, 8) + ext
    else:
        lookup = struct.pack(">HHHH", 2, 0, 1, 8) + sub
    lookup_list = struct.pack(">HH", 1, 4) + lookup
    # GPOS header: version 1.0; script/feature lists point at empty stubs
    # placed after the lookup list (offset 0 would mean "absent" ambiguity)
    header = struct.pack(">IHHH", 0x00010000, 10, 10, 10)
    return header + lookup_list


def _encode_simple_glyph(contours) -> bytes:
    xs = [p[0] for c in contours for p in c]
    ys = [p[1] for c in contours for p in c]
    out = struct.pack(
        ">hhhhh", len(contours), min(xs), min(ys), max(xs), max(ys)
    )
    end = -1
    for c in contours:
        end += len(c)
        out += struct.pack(">H", end)
    out += struct.pack(">H", 0)  # no instructions
    pts = [p for c in contours for p in c]
    # flags: on-curve bit only; always 16-bit x/y deltas (no compression)
    out += bytes(0x01 if p[2] else 0x00 for p in pts)
    px = 0
    for x, _, _ in pts:
        out += struct.pack(">h", x - px)
        px = x
    py = 0
    for _, y, _ in pts:
        out += struct.pack(">h", y - py)
        py = y
    return out


def _encode_composite_glyph(base_gid: int, dx: int, dy: int) -> bytes:
    # one component: ARG_1_AND_2_ARE_WORDS | ARGS_ARE_XY_VALUES
    return struct.pack(">hhhhh", -1, 0, 0, 0, 0) + struct.pack(
        ">HHhh", 0x0003, base_gid, dx, dy
    )


def encode_ttf(
    char_advances: dict[str, int],
    kerning: dict[tuple[str, str], int] | None = None,
    units_per_em: int = 2048,
    notdef_advance: int = 500,
    ascender: int = 1900,
    descender: int = -500,
    outlines: dict | None = None,
    gpos_kerning: dict[tuple[str, str], int] | None = None,
    gpos_fmt: int = 1,
    gpos_extension: bool = False,
) -> bytes:
    """Build a TTF: glyph ids 1..n in sorted-codepoint order, glyph 0 =
    .notdef. Advances/kerning are in font units. ``outlines`` maps char ->
    list of contours ``[(x, y, on_curve), ...]`` or ``("ref", char, dx,
    dy)`` for an offset composite; chars absent from it get empty glyphs.
    Without it the font is metrics-only (no glyf/loca)."""
    chars = sorted(char_advances)
    gids = {c: i + 1 for i, c in enumerate(chars)}
    advances = [notdef_advance] + [char_advances[c] for c in chars]
    n_glyphs = len(advances)
    loc_fmt = 1 if outlines is not None else 0

    head = struct.pack(
        ">IIIIHHQQhhhhHHhhh",
        0x00010000, 0x00010000, 0, 0x5F0F3CF5, 0b0000000000000011, units_per_em,
        0, 0,  # created/modified (longdatetime; unused by metrics readers)
        0, descender, units_per_em, ascender,  # xMin yMin xMax yMax
        0, 8, 2, loc_fmt, 0,  # macStyle lowestRecPPEM dirHint indexToLoc glyphFmt
    )
    hhea = struct.pack(
        ">IhhhHhhhhhhhhhhhH",
        0x00010000, ascender, descender, 0,
        max(advances), 0, 0, units_per_em,
        1, 0, 0, 0, 0, 0, 0,  # caret + 4 reserved
        0, n_glyphs,  # metricDataFormat, numberOfHMetrics (all glyphs)
    )
    maxp = struct.pack(">IH", 0x00005000, n_glyphs)
    hmtx = b"".join(struct.pack(">Hh", aw, 0) for aw in advances)
    cmap = _cmap_fmt4({ord(c): g for c, g in gids.items()})
    tables = {"cmap": cmap, "head": head, "hhea": hhea, "hmtx": hmtx, "maxp": maxp}
    if outlines is not None:
        glyf = b""
        offsets = [0]
        for gid in range(n_glyphs):
            char = chars[gid - 1] if gid else None
            spec = outlines.get(char) if char is not None else None
            if spec is None:
                pass  # empty glyph: loca[i] == loca[i+1]
            elif isinstance(spec, tuple) and spec[0] == "ref":
                glyf += _encode_composite_glyph(gids[spec[1]], spec[2], spec[3])
            else:
                glyf += _encode_simple_glyph(spec)
            glyf += b"\0" * (-len(glyf) % 4)
            offsets.append(len(glyf))
        tables["glyf"] = glyf
        tables["loca"] = struct.pack(f">{len(offsets)}I", *offsets)
    if kerning:
        tables["kern"] = _kern_fmt0(
            {(gids[a], gids[b]): v for (a, b), v in kerning.items()}
        )
    if gpos_kerning:
        tables["GPOS"] = _gpos_pairpos(
            {(gids[a], gids[b]): v for (a, b), v in gpos_kerning.items()},
            fmt=gpos_fmt,
            extension=gpos_extension,
        )

    tags = sorted(tables)
    import math

    sel = int(math.log2(len(tags)))
    search = 16 * (2**sel)
    out = struct.pack(">IHHHH", 0x00010000, len(tags), search, sel, 16 * len(tags) - search)
    offset = 12 + 16 * len(tags)
    directory = b""
    bodies = b""
    for tag in tags:
        t = tables[tag]
        directory += struct.pack(">4sIII", tag.encode(), _checksum(t), offset, len(t))
        bodies += t + b"\0" * (-len(t) % 4)
        offset += len(t) + (-len(t) % 4)
    return out + directory + bodies


# the checked-in fixture's definition (regenerate: python tools/make_ttf_fixture.py)
FIXTURE_UPEM = 2048
FIXTURE_ADVANCES = {
    " ": 651, "-": 838, ".": 651, "A": 1401, "T": 1251, "V": 1401, "W": 1931,
    "a": 1139, "e": 1126, "i": 569, "l": 569, "m": 1787, "n": 1183, "o": 1180,
    **{d: 1303 for d in "0123456789"},
}
FIXTURE_KERNING = {("A", "V"): -300, ("V", "A"): -300, ("T", "o"): -260, ("T", "a"): -240}
