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
    """Integer text metrics; pure data, broadcastable to executors."""

    kerning: dict[tuple[str, str], int]
    mean_letter_width: int = 10

    def advance(self, ch: str) -> int:
        return _advance(ord(ch))

    def text_width(self, s: str) -> int:
        """computeTextLength (font.cpp:145-193): first advance, then
        advance + kerning(prev, cur) per following glyph."""
        if not s:
            return 0
        width = _advance(ord(s[0]))
        prev = s[0]
        for ch in s[1:]:
            width += _advance(ord(ch)) + self.kerning.get((prev, ch), 0)
            prev = ch
        return width


DEFAULT_METRICS = FontMetrics(kerning=dict(_KERN_PAIRS))
