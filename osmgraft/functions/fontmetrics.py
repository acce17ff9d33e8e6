"""S7/L3 support: deterministic glyph metrics replacing live FreeType.

The reference measures label text with FreeType at 1pt/96dpi
(/root/reference/src/label/font.cpp:54-75): per-glyph integer advance
(ceil of 26.6 fixed point, font.cpp:172-176), pairwise kerning
(font.cpp:100-122), and mean letter width = ``x_ppem`` (font.cpp:363-367).

Executors have no FreeType, and the engine must be machine-independent, so
we pin a deterministic metrics table with the same *shape* as the font
atlas ``.info`` export (font.cpp:297-360): integer advances per codepoint,
a sparse integer kerning map, and an integer mean letter width. Widths are
class-based (narrow/wide/caps/digits) so label-split tests exercise
non-uniform metrics, and a few negative kerning pairs exercise the
pair-wise term of ``computeTextLength`` (font.cpp:145-193).
"""

from __future__ import annotations

from dataclasses import dataclass

_NARROW = "iljtf.,:;|!'ItrI()[]- /"
_WIDE = "mwMW@%&"
_KERN_PAIRS = {
    ("A", "V"): -2,
    ("V", "A"): -2,
    ("T", "o"): -1,
    ("T", "a"): -1,
    ("L", "T"): -2,
    ("f", "i"): -1,
}


def _advance(cp: int) -> int:
    ch = chr(cp)
    if ch in _NARROW:
        return 5
    if ch in _WIDE:
        return 16
    if ch.isdigit():
        return 10
    if ch.isupper():
        return 12
    if cp < 32:  # control chars (incl. '\n') measured as zero-width
        return 0
    return 9


@dataclass(frozen=True)
class FontMetrics:
    """Integer text metrics; pure data, broadcastable to executors.

    ``advances`` overrides the built-in class-based table per codepoint —
    set when metrics are loaded from a font-atlas ``.info`` file (K3)."""

    kerning: dict[tuple[str, str], int]
    mean_letter_width: int = 10
    advances: dict[str, int] | None = None

    def advance(self, ch: str) -> int:
        if self.advances is not None and ch in self.advances:
            return self.advances[ch]
        return _advance(ord(ch))

    def text_width(self, s: str) -> int:
        """computeTextLength (font.cpp:145-193): first advance, then
        advance + kerning(prev, cur) per following glyph."""
        if not s:
            return 0
        width = self.advance(s[0])
        prev = s[0]
        for ch in s[1:]:
            width += self.advance(ch) + self.kerning.get((prev, ch), 0)
            prev = ch
        return width


DEFAULT_METRICS = FontMetrics(kerning=dict(_KERN_PAIRS))

# pinned vertical-geometry substitutes for the FreeType face fields the
# atlas export reads (ascender/descender/bearings); the engine's label
# kernel never consumes heights, so these only shape the atlas grid
_GLYPH_V = {"ascender": 15, "descender": -4, "top_height": 12, "bottom_height": 4}


def create_font_atlas_info(
    alphabet: str,
    name: str,
    out_dir: str,
    metrics: FontMetrics = DEFAULT_METRICS,
) -> str:
    """K3 analog (font.cpp:195-361, triggered by ``-fa`` in main.cpp:138-144):
    driver-side utility exporting the ``<name>.info`` JSON the engine's
    metrics are broadcast from — same structure as the reference's atlas
    info file (advance array over the sorted alphabet, full kerning matrix
    ``kerning[i][j] = kern(prev=alphabet[j], cur=alphabet[i])``, atlas grid
    geometry, glyph summary with ``mean_width = ceil(mean(advance))``).
    The matching PNG raster is :func:`render_font_atlas_png`; the JSON is
    the part the pipeline consumes (fontmetrics <-> atlas roundtrip)."""
    import json
    import math
    import os

    chars = sorted(set(alphabet))
    advances = [metrics.advance(c) for c in chars]
    kern = [[metrics.kerning.get((c2, c), 0) for c2 in chars] for c in chars]
    max_adv = max(advances) if advances else 0
    mean_w = int(math.ceil(sum(advances) / len(advances))) if advances else 0
    columns = 14
    rows = int(math.ceil(len(chars) / columns)) if chars else 0
    height = _GLYPH_V["top_height"] + _GLYPH_V["bottom_height"]
    root = {
        "advance": advances,
        "alphabet": "".join(chars),
        "atlas": {
            "size": {"width": columns * max_adv, "height": rows * height},
            "dimension": {"columns": columns, "rows": rows},
            "name": name,
        },
        "font": {"style": "Book", "name": "osmgraft-pinned"},
        "glyph": {
            **_GLYPH_V,
            "height": height,
            "width": max_adv,
            "mean_width": mean_w,
        },
        "kerning": kern,
    }
    path = os.path.join(out_dir, f"{name}.info")
    with open(path, "w") as fh:
        json.dump(root, fh, indent=2)
    return path


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def write_png_gray8(path: str, width: int, height: int, pixels: bytes) -> None:
    """Minimal 8-bit grayscale PNG encoder (pure stdlib: zlib + struct).

    ``pixels`` is row-major, ``width * height`` bytes. Each scanline gets
    filter byte 0 (None); the stream is one zlib-deflated IDAT."""
    import struct
    import zlib

    if width <= 0 or height <= 0:
        # IHDR width/height of zero is invalid per the PNG spec; writing a
        # 0x0 file would only blow up in downstream readers
        raise ValueError(f"invalid PNG dimensions {width}x{height}")
    if len(pixels) != width * height:
        raise ValueError(f"expected {width * height} pixels, got {len(pixels)}")
    raw = b"".join(
        b"\x00" + pixels[y * width : (y + 1) * width] for y in range(height)
    )
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)  # gray8
    with open(path, "wb") as fh:
        fh.write(b"\x89PNG\r\n\x1a\n")
        fh.write(_png_chunk(b"IHDR", ihdr))
        fh.write(_png_chunk(b"IDAT", zlib.compress(raw, 9)))
        fh.write(_png_chunk(b"IEND", b""))


def read_png_gray8(path: str) -> tuple[int, int, bytes]:
    """Decode a PNG written by :func:`write_png_gray8` (filter-0 gray8
    only — a round-trip verifier, not a general decoder)."""
    import struct
    import zlib

    with open(path, "rb") as fh:
        data = fh.read()
    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, width, height, idat = 8, 0, 0, b""
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            width, height, depth, color = struct.unpack(">IIBB", payload[:10])
            if (depth, color) != (8, 0):
                raise ValueError("only gray8 supported")
        elif tag == b"IDAT":
            idat += payload
        pos += 12 + ln
    raw = zlib.decompress(idat)
    rows = []
    for y in range(height):
        line = raw[y * (width + 1) : (y + 1) * (width + 1)]
        if line[0] != 0:
            raise ValueError("only filter 0 supported")
        rows.append(line[1:])
    return width, height, b"".join(rows)


def render_font_atlas_png(
    alphabet: str,
    name: str,
    out_dir: str,
    metrics: FontMetrics = DEFAULT_METRICS,
    glyph_raster=None,
) -> str:
    """K3 raster side of the atlas export (font.cpp:195-293): the reference
    paints each glyph into a ``columns x rows`` grid cell via cairo. With
    ``glyph_raster`` — ``(char, cell_w, cell_h) -> gray8 bytes | None`` —
    each cell gets that real coverage bitmap (see
    :func:`osmgraft.functions.ttf.ttf_glyph_raster`, which scanline-fills
    actual TTF outlines, making the PNG glyph-faithful). Without one (or
    where it returns ``None``) the cell falls back to a deterministic
    coverage box — ink over ``advance(c)`` columns between the pinned
    bearings. Grid geometry (cell size, row/column layout, scan order over
    the sorted alphabet) matches the ``.info`` export exactly, so the PNG
    and the JSON describe the same atlas; the engine itself consumes only
    the metrics (the PNG is a sink artifact, as in the reference)."""
    import os

    chars = sorted(set(alphabet))
    advances = [metrics.advance(c) for c in chars]
    max_adv = max(advances) if advances else 0
    columns = 14
    rows = (len(chars) + columns - 1) // columns if chars else 0
    cell_h = _GLYPH_V["top_height"] + _GLYPH_V["bottom_height"]
    width, height = columns * max_adv, rows * cell_h
    px = bytearray(width * height)  # 0 = background
    ink_y0, ink_y1 = 2, _GLYPH_V["top_height"]  # between bearings
    for i, (c, adv) in enumerate(zip(chars, advances)):
        cx, cy = (i % columns) * max_adv, (i // columns) * cell_h
        cell = glyph_raster(c, max_adv, cell_h) if glyph_raster else None
        if cell is not None:
            if len(cell) != max_adv * cell_h:
                raise ValueError(
                    f"glyph_raster({c!r}) returned {len(cell)} bytes, "
                    f"expected {max_adv * cell_h}"
                )
            for y in range(cell_h):
                row0 = (cy + y) * width + cx
                px[row0 : row0 + max_adv] = cell[y * max_adv : (y + 1) * max_adv]
        else:
            for y in range(cy + ink_y0, cy + ink_y1):
                row0 = y * width + cx
                px[row0 : row0 + adv] = b"\xff" * adv
    path = os.path.join(out_dir, f"{name}.png")
    write_png_gray8(path, width, height, bytes(px))
    return path


def load_font_metrics(path: str) -> FontMetrics:
    """Load a ``.info`` atlas export back into broadcastable FontMetrics
    (advance table + sparse kerning + mean width)."""
    import json

    with open(path) as fh:
        root = json.load(fh)
    chars = list(root["alphabet"])
    advances = {c: int(a) for c, a in zip(chars, root["advance"])}
    kerning = {}
    for i, c in enumerate(chars):
        for j, c2 in enumerate(chars):
            k = int(root["kerning"][i][j])
            if k:
                kerning[(c2, c)] = k
    return FontMetrics(
        kerning=kerning,
        mean_letter_width=int(root["glyph"]["mean_width"]),
        advances=advances,
    )
