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
    The PNG side-output needs cairo and is out of engine scope; the JSON is
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
