"""Minimal TrueType (sfnt) table parsing for glyph metrics.

Parity with crates/pdfplumber-parse/src/truetype.rs:1-310: parse the
`head` (unitsPerEm), `hhea` (numberOfHMetrics), `maxp` (numGlyphs) and
`hmtx` tables of an embedded /FontFile2 stream; advance widths come out
scaled to the PDF glyph-space convention of 1000 units per em. Glyphs
beyond numberOfHMetrics inherit the last longHorMetric advance.
`vmtx` (with `vhea`) gives vertical advances for CIDFontType2 fonts
(truetype.rs:254-310).

Intentionally minimal — metrics only, no outlines.
"""

from __future__ import annotations

import struct


def _u16(data: bytes, off: int) -> int | None:
    if off + 2 > len(data):
        return None
    return struct.unpack_from(">H", data, off)[0]


def _u32(data: bytes, off: int) -> int | None:
    if off + 4 > len(data):
        return None
    return struct.unpack_from(">I", data, off)[0]


def _find_table(data: bytes, tag: bytes) -> tuple[int, int] | None:
    """(offset, length) of a table from the sfnt directory."""
    n = _u16(data, 4)
    if n is None:
        return None
    for i in range(n):
        entry = 12 + i * 16
        if entry + 16 > len(data):
            return None
        if data[entry : entry + 4] == tag:
            off = _u32(data, entry + 8)
            length = _u32(data, entry + 12)
            if off is None or length is None:
                return None
            return off, length
    return None


def _units_per_em(data: bytes) -> int | None:
    head = _find_table(data, b"head")
    if head is None or head[1] < 20:
        return None
    return _u16(data, head[0] + 18)


def _num_metrics(data: bytes, tag: bytes) -> int | None:
    """numberOfHMetrics / numOfLongVerMetrics — last u16 of hhea/vhea."""
    t = _find_table(data, tag)
    if t is None or t[1] < 36:
        return None
    return _u16(data, t[0] + 34)


def _num_glyphs(data: bytes) -> int | None:
    maxp = _find_table(data, b"maxp")
    if maxp is None or maxp[1] < 6:
        return None
    return _u16(data, maxp[0] + 4)


def _parse_long_metrics(data: bytes, table: bytes, n_metrics: int,
                        n_glyphs: int) -> list[int] | None:
    t = _find_table(data, table)
    if t is None:
        return None
    off = t[0]
    if off + n_metrics * 4 > len(data):
        return None
    adv = [struct.unpack_from(">H", data, off + i * 4)[0]
           for i in range(n_metrics)]
    if n_glyphs > n_metrics:
        adv.extend([adv[-1]] * (n_glyphs - n_metrics))
    return adv


def parse_truetype_widths(data: bytes) -> list[float] | None:
    """Per-glyph advance widths scaled to 1000 units/em, indexed by
    glyph id; None when the font program is unusable (lenient)."""
    if len(data) < 28:
        return None
    ver = _u32(data, 0)
    if ver not in (0x00010000, 0x74727565):  # 1.0 or 'true'
        return None
    upem = _units_per_em(data)
    n_metrics = _num_metrics(data, b"hhea")
    n_glyphs = _num_glyphs(data)
    if not upem or not n_metrics or not n_glyphs:
        return None
    adv = _parse_long_metrics(data, b"hmtx", n_metrics, n_glyphs)
    if adv is None:
        return None
    scale = 1000.0 / float(upem)
    return [w * scale for w in adv]


def parse_truetype_vertical_metrics(data: bytes) -> list[float] | None:
    """Per-glyph advance heights (vmtx), scaled to 1000 units/em."""
    if len(data) < 28:
        return None
    ver = _u32(data, 0)
    if ver not in (0x00010000, 0x74727565):
        return None
    upem = _units_per_em(data)
    n_metrics = _num_metrics(data, b"vhea")
    n_glyphs = _num_glyphs(data)
    if not upem or not n_metrics or not n_glyphs:
        return None
    adv = _parse_long_metrics(data, b"vmtx", n_metrics, n_glyphs)
    if adv is None:
        return None
    scale = 1000.0 / float(upem)
    return [h * scale for h in adv]
