"""S7 ingestion path: TTF file -> FontMetrics table, no FreeType.

The reference loads an arbitrary ``.ttf`` at runtime through FreeType at
1pt on a 96-dpi display (/root/reference/src/label/font.cpp:54-75) and
derives integer metrics: per-glyph advance = ceil of the 26.6 fixed-point
horizontal advance (font.cpp:172-176) and pairwise kerning = ceil of the
26.6 kern vector (font.cpp:100-122). The engine pins a deterministic
metrics table instead (executors have no FreeType); this module closes the
ingestion gap — a pure ``struct`` parser over the TrueType tables that are
actually metric-bearing:

- ``head``  -> unitsPerEm
- ``maxp``  -> numGlyphs
- ``hhea``  -> numberOfHMetrics
- ``hmtx``  -> per-glyph advance widths (font units)
- ``cmap``  -> codepoint -> glyph id (formats 4 and 12; missing chars map
  to glyph 0, FreeType's .notdef behavior)
- ``kern``  -> format-0 horizontal pair kerning (font units)
- ``GPOS``  -> PairPos (lookup type 2, formats 1 and 2 incl. class-based,
  Extension/type-9 unwrapped) — modern fonts carry kerning exclusively
  here; legacy ``kern`` wins when both exist (FreeType behavior)
- ``loca``/``glyf`` -> glyph outlines (quadratic TrueType contours; simple
  and composite glyphs), consumed by the scanline rasterizer that makes
  the K3 atlas PNG glyph-faithful (ref renders via cairo+FreeType,
  /root/reference/src/label/font.cpp:195-293; here: Bézier flattening +
  nonzero-winding supersampled coverage, numpy, driver-side only)

Scaling mirrors the reference exactly for unhinted metrics:
``px_per_unit = pt * dpi / 72 / unitsPerEm`` and every advance/kern value
is ``ceil(units * px_per_unit)``. Fidelity delta (documented): FreeType's
``FT_LOAD_RENDER`` applies hinting, which can perturb advances by a pixel
at tiny sizes; a byte-table parser cannot execute hinting programs, so
these are the *linear* (unhinted) metrics.

Everything here derives from the public TrueType/OpenType specification.
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass

from osmgraft.guard import untrusted_parser

from osmgraft.functions.fontmetrics import FontMetrics, create_font_atlas_info


# one contour: [(x, y, on_curve), ...] in font units, implicit closing edge
Contour = list[tuple[int, int, bool]]


@dataclass(frozen=True)
class TtfTables:
    """Raw metric-bearing content of one TTF, in font units."""

    units_per_em: int
    num_glyphs: int
    cmap: dict[int, int]  # codepoint -> glyph id
    advances: list[int]  # per glyph id
    kern: dict[tuple[int, int], int]  # (left gid, right gid) -> units
    glyf: bytes | None = None  # raw glyf table (outline fonts only)
    loca: tuple[int, ...] | None = None  # per-gid offsets into glyf
    gpos_kern: tuple = ()  # PairPos subtables from _parse_gpos_kern

    def kern_units(self, left: int, right: int) -> int:
        """Pair kerning in font units: the legacy ``kern`` table wins when
        both exist (FreeType behavior — ref font.cpp:100-122 reads
        FT_Get_Kerning, which serves kern before synthesized GPOS);
        otherwise the first GPOS PairPos hit in lookup order applies. In
        the class-based format a 0 matrix cell means "no kerning for this
        class pair" and falls through to later subtables."""
        v = self.kern.get((left, right))
        if v is not None:
            return v
        for sub in self.gpos_kern:
            if sub[0] == "1":
                _, cov, sets = sub
                idx = cov.get(left)
                if idx is None or idx >= len(sets):
                    continue
                hit = sets[idx].get(right)
                if hit is not None:
                    return hit
            else:
                _, cov, cd1, cd2, matrix = sub
                if left not in cov:
                    continue
                c1, c2 = _class_of(cd1, left), _class_of(cd2, right)
                if c1 < len(matrix) and c2 < len(matrix[c1]):
                    v2 = matrix[c1][c2]
                    if v2:
                        return v2
        return 0

    def glyph_id(self, ch: str) -> int:
        return self.cmap.get(ord(ch), 0)

    def advance_units(self, gid: int) -> int:
        return self.advances[gid] if gid < len(self.advances) else self.advances[-1]

    def glyph_contours(self, gid: int, _depth: int = 0) -> list[Contour]:
        """Decode one glyph's outline (empty list for blank glyphs or
        metrics-only fonts). Composite glyphs resolve recursively with the
        2x2 + offset transform applied to each component."""
        if self.glyf is None or self.loca is None or gid + 1 >= len(self.loca):
            return []
        start, end = self.loca[gid], self.loca[gid + 1]
        if start >= end:
            return []  # blank glyph (e.g. space)
        if _depth > 5:
            raise ValueError("composite glyph nesting too deep")
        data = self.glyf
        (n_contours,) = struct.unpack_from(">h", data, start)
        if n_contours >= 0:
            return _parse_simple_glyph(data, start, n_contours)
        return _parse_composite_glyph(self, data, start, _depth)


def _table_directory(data: bytes) -> dict[str, tuple[int, int]]:
    if len(data) < 12:
        raise ValueError("not a TTF: too short")
    (version, num_tables) = struct.unpack_from(">IH", data, 0)
    if version not in (0x00010000, 0x74727565):  # 1.0 | 'true'
        raise ValueError(f"not a TTF: sfnt version 0x{version:08x}")
    tables: dict[str, tuple[int, int]] = {}
    off = 12
    for _ in range(num_tables):
        tag, _chk, t_off, t_len = struct.unpack_from(">4sIII", data, off)
        tables[tag.decode("latin-1")] = (t_off, t_len)
        off += 16
    return tables


def _parse_cmap(data: bytes, off: int) -> dict[int, int]:
    (_ver, n_enc) = struct.unpack_from(">HH", data, off)
    # prefer a Unicode-capable subtable: (3,10) fmt12 > (3,1)/(0,*) fmt4
    best_off, best_score = None, -1
    for i in range(n_enc):
        plat, enc, sub_off = struct.unpack_from(">HHI", data, off + 4 + 8 * i)
        score = {(3, 10): 3, (0, 4): 3, (3, 1): 2, (0, 3): 2}.get((plat, enc), 1 if plat == 0 else 0)
        if score > best_score:
            best_score, best_off = score, off + sub_off
    if best_off is None:
        raise ValueError("cmap: no encoding records")
    (fmt,) = struct.unpack_from(">H", data, best_off)
    out: dict[int, int] = {}
    if fmt == 4:
        (seg_x2,) = struct.unpack_from(">H", data, best_off + 6)
        seg = seg_x2 // 2
        ends = struct.unpack_from(f">{seg}H", data, best_off + 14)
        starts = struct.unpack_from(f">{seg}H", data, best_off + 16 + seg_x2)
        deltas = struct.unpack_from(f">{seg}h", data, best_off + 16 + 2 * seg_x2)
        ro_base = best_off + 16 + 3 * seg_x2
        range_offsets = struct.unpack_from(f">{seg}H", data, ro_base)
        covered = 0  # valid segments are ascending + disjoint: total <= 0x10000
        for s in range(seg):
            covered += max(0, min(ends[s], 0xFFFE) - starts[s] + 1)
            if covered > 0x10000:
                raise ValueError("cmap4 segments cover more than the 16-bit code space")
            for code in range(starts[s], min(ends[s], 0xFFFE) + 1):
                if range_offsets[s] == 0:
                    gid = (code + deltas[s]) & 0xFFFF
                else:
                    addr = ro_base + 2 * s + range_offsets[s] + 2 * (code - starts[s])
                    (gid,) = struct.unpack_from(">H", data, addr)
                    if gid:
                        gid = (gid + deltas[s]) & 0xFFFF
                if gid:
                    out[code] = gid
    elif fmt == 12:
        (n_groups,) = struct.unpack_from(">I", data, best_off + 12)
        covered = 0
        for g in range(n_groups):
            start, end, start_gid = struct.unpack_from(">III", data, best_off + 16 + 12 * g)
            # 32-bit bounds are untrusted: one flipped byte must not turn
            # this into a multi-billion-iteration loop / dict bomb. No
            # valid codepoint exceeds U+10FFFF and groups are disjoint.
            if end < start or end > 0x10FFFF:
                raise ValueError(f"cmap12 group range invalid: {start:#x}..{end:#x}")
            covered += end - start + 1
            if covered > 0x110000:
                raise ValueError("cmap12 groups cover more than the Unicode code space")
            for code in range(start, end + 1):
                out[code] = start_gid + (code - start)
    else:
        raise ValueError(f"cmap subtable format {fmt} not supported (need 4 or 12)")
    return out


def _parse_kern(data: bytes, off: int) -> dict[tuple[int, int], int]:
    (_ver, n_tables) = struct.unpack_from(">HH", data, off)
    pos = off + 4
    pairs: dict[tuple[int, int], int] = {}
    for _ in range(n_tables):
        (_sub_ver, length, coverage) = struct.unpack_from(">HHH", data, pos)
        fmt, horizontal = coverage >> 8, coverage & 0x0001
        if fmt == 0 and horizontal:
            (n_pairs,) = struct.unpack_from(">H", data, pos + 6)
            for p in range(n_pairs):
                left, right, value = struct.unpack_from(">HHh", data, pos + 14 + 6 * p)
                pairs[(left, right)] = value
        pos += length
    return pairs


def _parse_coverage(data: bytes, off: int) -> dict[int, int]:
    """OpenType Coverage table -> {glyph id: coverage index}."""
    (fmt,) = struct.unpack_from(">H", data, off)
    if fmt == 1:
        (n,) = struct.unpack_from(">H", data, off + 2)
        glyphs = struct.unpack_from(f">{n}H", data, off + 4)
        return {g: i for i, g in enumerate(glyphs)}
    if fmt == 2:
        (n,) = struct.unpack_from(">H", data, off + 2)
        cov: dict[int, int] = {}
        covered = 0  # valid ranges are ascending + disjoint: total <= 0x10000
        for r in range(n):
            start, end, start_idx = struct.unpack_from(">HHH", data, off + 4 + 6 * r)
            if end < start:
                raise ValueError(f"coverage range reversed: {start}..{end}")
            covered += end - start + 1
            if covered > 0x10000:
                raise ValueError("coverage ranges exceed the glyph id space")
            for g in range(start, end + 1):
                cov[g] = start_idx + (g - start)
        return cov
    raise ValueError(f"coverage format {fmt} invalid")


def _parse_classdef(data: bytes, off: int):
    (fmt,) = struct.unpack_from(">H", data, off)
    if fmt == 1:
        start, n = struct.unpack_from(">HH", data, off + 2)
        return ("1", start, struct.unpack_from(f">{n}H", data, off + 6))
    if fmt == 2:
        (n,) = struct.unpack_from(">H", data, off + 2)
        ranges = [
            struct.unpack_from(">HHH", data, off + 4 + 6 * r) for r in range(n)
        ]
        return ("2", ranges)
    raise ValueError(f"classdef format {fmt} invalid")


def _class_of(cd, gid: int) -> int:
    if cd[0] == "1":
        _, start, classes = cd
        return classes[gid - start] if start <= gid < start + len(classes) else 0
    for start, end, cls in cd[1]:
        if start <= gid <= end:
            return cls
    return 0  # glyphs outside all ranges are class 0 per spec


def _vr_size(vf: int) -> int:
    return bin(vf & 0xFF).count("1") * 2


def _vr_xadv_off(vf: int) -> int | None:
    """Byte offset of XAdvance inside a ValueRecord, None if absent."""
    if not vf & 0x0004:
        return None
    off = 0
    for bit in (0x0001, 0x0002):
        if vf & bit:
            off += 2
    return off


def _parse_pairpos(data: bytes, st: int):
    """One GPOS lookup-type-2 (PairPos) subtable -> kerning structure, or
    None when it carries no first-glyph XAdvance (not kerning as the
    reference consumes it)."""
    fmt, cov_off, vf1, vf2 = struct.unpack_from(">HHHH", data, st)
    xoff = _vr_xadv_off(vf1)
    if xoff is None:
        return None
    sz1, sz2 = _vr_size(vf1), _vr_size(vf2)
    cov = _parse_coverage(data, st + cov_off)
    if fmt == 1:
        (n_sets,) = struct.unpack_from(">H", data, st + 8)
        sets: list[dict[int, int]] = []
        step = 2 + sz1 + sz2
        for i in range(n_sets):
            ps = st + struct.unpack_from(">H", data, st + 10 + 2 * i)[0]
            (n_pairs,) = struct.unpack_from(">H", data, ps)
            d: dict[int, int] = {}
            for p in range(n_pairs):
                (second,) = struct.unpack_from(">H", data, ps + 2 + p * step)
                (xadv,) = struct.unpack_from(">h", data, ps + 2 + p * step + 2 + xoff)
                d[second] = xadv
            sets.append(d)
        return ("1", cov, sets)
    if fmt == 2:
        cd1_off, cd2_off, c1n, c2n = struct.unpack_from(">HHHH", data, st + 8)
        step = sz1 + sz2
        base = st + 16
        matrix = [
            [
                struct.unpack_from(">h", data, base + (i * c2n + j) * step + xoff)[0]
                for j in range(c2n)
            ]
            for i in range(c1n)
        ]
        return ("2", cov, _parse_classdef(data, st + cd1_off), _parse_classdef(data, st + cd2_off), matrix)
    return None


def _parse_gpos_kern(data: bytes, off: int) -> tuple:
    """GPOS -> PairPos subtables in lookup order. Walks the LookupList
    directly (no script/feature filtering: the metrics consumer wants any
    horizontal pair kerning, which in practice is the 'kern' feature);
    lookup type 2 consumed directly, type 9 (Extension) unwrapped."""
    _maj, _min, _script, _feat, lookup_list = struct.unpack_from(">HHHHH", data, off)
    ll = off + lookup_list
    (n_lookups,) = struct.unpack_from(">H", data, ll)
    out = []
    for i in range(n_lookups):
        lk = ll + struct.unpack_from(">H", data, ll + 2 + 2 * i)[0]
        ltype, _flag, n_sub = struct.unpack_from(">HHH", data, lk)
        for s in range(n_sub):
            st = lk + struct.unpack_from(">H", data, lk + 6 + 2 * s)[0]
            t = ltype
            if t == 9:  # Extension positioning: 32-bit indirection
                _efmt, ext_type, ext_off = struct.unpack_from(">HHI", data, st)
                st += ext_off
                t = ext_type
            if t != 2:
                continue
            sub = _parse_pairpos(data, st)
            if sub is not None:
                out.append(sub)
    return tuple(out)


def _parse_simple_glyph(data: bytes, off: int, n_contours: int) -> list[Contour]:
    end_pts = struct.unpack_from(f">{n_contours}H", data, off + 10)
    n_pts = end_pts[-1] + 1 if n_contours else 0
    (instr_len,) = struct.unpack_from(">H", data, off + 10 + 2 * n_contours)
    pos = off + 12 + 2 * n_contours + instr_len
    flags: list[int] = []
    while len(flags) < n_pts:
        flag = data[pos]
        pos += 1
        flags.append(flag)
        if flag & 0x08:  # REPEAT_FLAG
            rep = data[pos]
            pos += 1
            # a malformed font can claim more repeats than points remain;
            # unclamped, the oversized flags list would misalign every
            # subsequent coordinate read instead of failing cleanly
            if rep > n_pts - len(flags):
                raise ValueError(
                    f"glyph flag REPEAT overruns point count ({len(flags)}+{rep} > {n_pts})"
                )
            flags.extend([flag] * rep)
    xs: list[int] = []
    x = 0
    for flag in flags:
        if flag & 0x02:  # X_SHORT
            dx = data[pos]
            pos += 1
            x += dx if flag & 0x10 else -dx
        elif not flag & 0x10:  # 16-bit delta
            (dx,) = struct.unpack_from(">h", data, pos)
            pos += 2
            x += dx
        xs.append(x)
    ys: list[int] = []
    y = 0
    for flag in flags:
        if flag & 0x04:  # Y_SHORT
            dy = data[pos]
            pos += 1
            y += dy if flag & 0x20 else -dy
        elif not flag & 0x20:
            (dy,) = struct.unpack_from(">h", data, pos)
            pos += 2
            y += dy
        ys.append(y)
    contours: list[Contour] = []
    start = 0
    for end in end_pts:
        contours.append(
            [(xs[i], ys[i], bool(flags[i] & 0x01)) for i in range(start, end + 1)]
        )
        start = end + 1
    return contours


def _parse_composite_glyph(
    font: TtfTables, data: bytes, off: int, depth: int
) -> list[Contour]:
    pos = off + 10
    out: list[Contour] = []
    while True:
        flags_c, comp_gid = struct.unpack_from(">HH", data, pos)
        pos += 4
        if flags_c & 0x0001:  # ARG_1_AND_2_ARE_WORDS
            a1, a2 = struct.unpack_from(">hh", data, pos)
            pos += 4
        else:
            a1, a2 = struct.unpack_from(">bb", data, pos)
            pos += 2
        if not flags_c & 0x0002:  # ARGS_ARE_XY_VALUES required here
            raise ValueError("composite glyph with point-matching args not supported")
        dx, dy = a1, a2
        # 2x2 transform in F2Dot14
        xx = yy = 1.0
        xy = yx = 0.0
        if flags_c & 0x0008:  # WE_HAVE_A_SCALE
            (s,) = struct.unpack_from(">h", data, pos)
            pos += 2
            xx = yy = s / 16384.0
        elif flags_c & 0x0040:  # X_AND_Y_SCALE
            sx, sy = struct.unpack_from(">hh", data, pos)
            pos += 4
            xx, yy = sx / 16384.0, sy / 16384.0
        elif flags_c & 0x0080:  # TWO_BY_TWO
            m = struct.unpack_from(">hhhh", data, pos)
            pos += 8
            xx, xy, yx, yy = (v / 16384.0 for v in m)
        for contour in font.glyph_contours(comp_gid, depth + 1):
            out.append(
                [
                    (round(px * xx + py * yx + dx), round(px * xy + py * yy + dy), on)
                    for px, py, on in contour
                ]
            )
        if not flags_c & 0x0020:  # MORE_COMPONENTS
            break
    return out


def _contour_to_polyline(contour: Contour, steps: int = 8) -> list[tuple[float, float]]:
    """Flatten one TrueType quadratic contour to a closed polyline.
    Consecutive off-curve points imply an on-curve midpoint (TrueType
    convention); each quadratic segment is sampled at ``steps`` points."""
    if not contour:
        return []
    # normalize to start on-curve (rotate, or synthesize midpoint start)
    pts = list(contour)
    if not pts[0][2]:
        on_idx = next((i for i, p in enumerate(pts) if p[2]), None)
        if on_idx is not None:
            pts = pts[on_idx:] + pts[:on_idx]
        else:  # all off-curve: start at midpoint of last->first
            mx = (pts[-1][0] + pts[0][0]) / 2.0
            my = (pts[-1][1] + pts[0][1]) / 2.0
            pts = [(mx, my, True)] + pts
    out: list[tuple[float, float]] = [(float(pts[0][0]), float(pts[0][1]))]
    i = 0
    n = len(pts)
    while i < n:
        nxt = pts[(i + 1) % n]
        if nxt[2]:  # straight edge
            out.append((float(nxt[0]), float(nxt[1])))
            i += 1
            continue
        # quadratic: control = nxt, end = following on-curve or implied midpoint
        ctrl = nxt
        after = pts[(i + 2) % n]
        if after[2]:
            end = (float(after[0]), float(after[1]))
            i += 2
        else:
            end = ((ctrl[0] + after[0]) / 2.0, (ctrl[1] + after[1]) / 2.0)
            i += 1
        x0, y0 = out[-1]
        for s in range(1, steps + 1):
            t = s / steps
            mt = 1.0 - t
            out.append(
                (
                    mt * mt * x0 + 2 * mt * t * ctrl[0] + t * t * end[0],
                    mt * mt * y0 + 2 * mt * t * ctrl[1] + t * t * end[1],
                )
            )
        if i >= n:
            break
    if out[0] != out[-1]:
        out.append(out[0])
    return out


def rasterize_contours(
    contours: list[Contour],
    width: int,
    height: int,
    scale: float,
    x_off: float = 0.0,
    y_off: float = 0.0,
    supersample: int = 4,
) -> bytes:
    """Nonzero-winding coverage raster of glyph ``contours`` into a
    ``width x height`` gray8 cell (row 0 = top). Font units scale by
    ``scale``; ``x_off``/``y_off`` translate in *pixels* (y_off = the
    baseline's distance from the cell bottom). Antialiasing: each output
    pixel averages ``supersample**2`` point-in-polygon samples, evaluated
    with one vectorized numpy crossing pass per edge set — no per-pixel
    Python. Driver-side sink math (the atlas is a K3 artifact), so clarity
    over throughput is the right trade."""
    import numpy as np

    if width <= 0 or height <= 0:
        raise ValueError(f"invalid raster dimensions {width}x{height}")
    if not contours:
        return b"\x00" * (width * height)
    edges = []  # (x0, y0, x1, y1) in supersampled pixel space, y down
    ss = supersample
    for contour in contours:
        poly = _contour_to_polyline(contour)
        for (ax, ay), (bx, by) in zip(poly, poly[1:]):
            x0, y0 = (ax * scale + x_off) * ss, (height - (ay * scale + y_off)) * ss
            x1, y1 = (bx * scale + x_off) * ss, (height - (by * scale + y_off)) * ss
            if y0 != y1:
                edges.append((x0, y0, x1, y1))
    if not edges:
        return b"\x00" * (width * height)
    e = np.asarray(edges, dtype=np.float64)
    # sample grid at supersampled pixel centers
    sy = np.arange(height * ss, dtype=np.float64) + 0.5
    sx = np.arange(width * ss, dtype=np.float64) + 0.5
    winding = np.zeros((height * ss, width * ss), dtype=np.int32)
    for x0, y0, x1, y1 in e:
        y_lo, y_hi = (y0, y1) if y0 < y1 else (y1, y0)
        rows = (sy >= y_lo) & (sy < y_hi)
        if not rows.any():
            continue
        yr = sy[rows]
        x_cross = x0 + (yr - y0) * (x1 - x0) / (y1 - y0)
        direction = 1 if y1 > y0 else -1
        winding[rows] += direction * (sx[None, :] > x_cross[:, None])
    cover = (winding != 0).astype(np.float32)
    cover = cover.reshape(height, ss, width, ss).mean(axis=(1, 3))
    return (cover * 255.0 + 0.5).astype(np.uint8).tobytes()


@untrusted_parser
def parse_ttf(path: str) -> TtfTables:
    """Parse the metric-bearing tables of a TrueType font (struct-only)."""
    with open(path, "rb") as fh:
        data = fh.read()
    tables = _table_directory(data)
    for req in ("head", "maxp", "hhea", "hmtx", "cmap"):
        if req not in tables:
            raise ValueError(f"TTF missing required table {req!r}")
    (units_per_em,) = struct.unpack_from(">H", data, tables["head"][0] + 18)
    (num_glyphs,) = struct.unpack_from(">H", data, tables["maxp"][0] + 4)
    (n_hmetrics,) = struct.unpack_from(">H", data, tables["hhea"][0] + 34)
    if not (0 < n_hmetrics <= num_glyphs):
        raise ValueError(f"hhea: bad numberOfHMetrics {n_hmetrics} / {num_glyphs} glyphs")
    hmtx_off = tables["hmtx"][0]
    advances = [
        struct.unpack_from(">H", data, hmtx_off + 4 * i)[0] for i in range(n_hmetrics)
    ]
    advances += [advances[-1]] * (num_glyphs - n_hmetrics)  # trailing glyphs repeat last
    cmap = _parse_cmap(data, tables["cmap"][0])
    kern = _parse_kern(data, tables["kern"][0]) if "kern" in tables else {}
    gpos = _parse_gpos_kern(data, tables["GPOS"][0]) if "GPOS" in tables else ()
    glyf = loca = None
    if "glyf" in tables and "loca" in tables:
        (loc_fmt,) = struct.unpack_from(">h", data, tables["head"][0] + 50)
        l_off, l_len = tables["loca"]
        if loc_fmt == 1:  # long: uint32 byte offsets
            loca = struct.unpack_from(f">{l_len // 4}I", data, l_off)
        else:  # short: uint16 half-offsets
            loca = tuple(
                v * 2 for v in struct.unpack_from(f">{l_len // 2}H", data, l_off)
            )
        g_off, g_len = tables["glyf"]
        glyf = data[g_off : g_off + g_len]
    return TtfTables(units_per_em, num_glyphs, cmap, advances, kern, glyf, loca, gpos)


def metrics_from_ttf(
    path: str, alphabet: str, pt: float = 1.0, dpi: int = 96
) -> FontMetrics:
    """TTF -> broadcastable :class:`FontMetrics` over ``alphabet``, scaled
    like the reference's FreeType init (1pt @ 96dpi default): advance/kern
    = ``ceil(units * pt*dpi/72 / unitsPerEm)`` (font.cpp:172-176, 100-122).
    ``mean_letter_width`` substitutes ``max(1, round(ppem))`` for the
    FreeType ``x_ppem`` field (font.cpp:363-367) — same integer at the
    reference's size."""
    font = parse_ttf(path)
    px_per_unit = pt * dpi / 72.0 / font.units_per_em
    chars = sorted(set(alphabet))
    gids = {c: font.glyph_id(c) for c in chars}
    advances = {c: math.ceil(font.advance_units(g) * px_per_unit) for c, g in gids.items()}
    kerning: dict[tuple[str, str], int] = {}
    for prev in chars:
        for cur in chars:
            # legacy kern preferred, GPOS PairPos otherwise (kern_units)
            units = font.kern_units(gids[prev], gids[cur])
            if units:
                kerning[(prev, cur)] = math.ceil(units * px_per_unit)
    return FontMetrics(
        kerning=kerning,
        mean_letter_width=max(1, round(pt * dpi / 72.0)),
        advances=advances,
    )


def build_metrics_from_ttf(
    ttf_path: str,
    alphabet: str,
    name: str,
    out_dir: str,
    pt: float = 1.0,
    dpi: int = 96,
) -> str:
    """Full S7 ingestion: TTF file -> ``<name>.info`` atlas-metrics export
    (the same format :func:`~osmgraft.functions.fontmetrics.load_font_metrics`
    broadcasts from). Returns the ``.info`` path, so
    ``load_font_metrics(build_metrics_from_ttf(...))`` round-trips a real
    font into the engine's label kernel."""
    metrics = metrics_from_ttf(ttf_path, alphabet, pt=pt, dpi=dpi)
    return create_font_atlas_info(alphabet, name, out_dir, metrics=metrics)


def ttf_glyph_raster(font: TtfTables, pt: float = 12.0, dpi: int = 96, baseline_px: int = 4):
    """``(char, cell_w, cell_h) -> gray8 bytes | None`` closure for
    :func:`~osmgraft.functions.fontmetrics.render_font_atlas_png`: real
    glyph coverage from the font's quadratic outlines, scaled like the
    metrics (``pt*dpi/72 / unitsPerEm``) with the baseline ``baseline_px``
    above the cell bottom (the atlas grid's pinned bottom bearing).
    Returns ``None`` for chars without an outline (metrics-only fonts,
    .notdef fallbacks), which keeps the synthetic-box fallback."""
    scale = pt * dpi / 72.0 / font.units_per_em

    def raster(ch: str, cell_w: int, cell_h: int) -> bytes | None:
        gid = font.glyph_id(ch)
        if gid == 0 and ord(ch) not in font.cmap:
            return None
        contours = font.glyph_contours(gid)
        if not contours:
            # blank glyph (space): real, fully-empty coverage
            return b"\x00" * (cell_w * cell_h) if font.glyf is not None else None
        return rasterize_contours(contours, cell_w, cell_h, scale, y_off=float(baseline_px))

    return raster


def render_ttf_atlas(
    ttf_path: str,
    alphabet: str,
    name: str,
    out_dir: str,
    pt: float = 12.0,
    dpi: int = 96,
) -> tuple[str, str]:
    """Complete K3 export from a real font file: ``<name>.info`` metrics
    JSON + glyph-faithful ``<name>.png`` raster (ref font.cpp:195-361; the
    cairo render step is replaced by the struct parser + scanline
    rasterizer above). Returns ``(info_path, png_path)``."""
    from osmgraft.functions.fontmetrics import render_font_atlas_png

    font = parse_ttf(ttf_path)
    metrics = metrics_from_ttf(ttf_path, alphabet, pt=pt, dpi=dpi)
    info = create_font_atlas_info(alphabet, name, out_dir, metrics=metrics)
    png = render_font_atlas_png(
        alphabet, name, out_dir, metrics=metrics,
        glyph_raster=ttf_glyph_raster(font, pt=pt, dpi=dpi),
    )
    return info, png
