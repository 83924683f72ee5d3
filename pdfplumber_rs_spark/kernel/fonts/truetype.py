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


def parse_truetype_unicode_map(data: bytes) -> dict[int, str] | None:
    """gid -> unicode from the embedded `cmap` table (formats 0/4/6/12),
    preferring the Windows BMP (3,1) then symbol (3,0) then any subtable.

    pdfminer's TrueTypeFont.create_unicode_map analog: used when a
    CID-keyed font with Adobe-Identity ordering has no usable /ToUnicode
    (pdfbox-4322-empty-tounicode-reduced.pdf)."""
    t = _find_table(data, b"cmap")
    if t is None:
        return None
    base = t[0]
    n = _u16(data, base + 2)
    if n is None:
        return None
    subtables: list[tuple[int, int, int]] = []
    for i in range(n):
        rec = base + 4 + i * 8
        pid, eid, off = _u16(data, rec), _u16(data, rec + 2), _u32(data, rec + 4)
        if pid is None or eid is None or off is None:
            continue
        subtables.append((pid, eid, base + off))
    if not subtables:
        return None
    subtables.sort(key=lambda s: {(3, 1): 0, (3, 0): 1, (0, 3): 2, (0, 4): 3}
                   .get((s[0], s[1]), 9))
    for _pid, _eid, off in subtables:
        fmt = _u16(data, off)
        out: dict[int, str] = {}
        if fmt == 0 and off + 262 <= len(data):
            for ch in range(256):
                gid = data[off + 6 + ch]
                if gid:
                    out[gid] = chr(ch)
        elif fmt == 4:
            segx2 = _u16(data, off + 6)
            if not segx2:
                continue
            segs = segx2 // 2
            ends = [_u16(data, off + 14 + i * 2) for i in range(segs)]
            starts = [_u16(data, off + 16 + segx2 + i * 2) for i in range(segs)]
            deltas = [_u16(data, off + 16 + 2 * segx2 + i * 2) for i in range(segs)]
            ro_base = off + 16 + 3 * segx2
            ros = [_u16(data, ro_base + i * 2) for i in range(segs)]
            if None in ends or None in starts or None in deltas or None in ros:
                continue
            for i in range(segs):
                s, e, delta, ro = starts[i], ends[i], deltas[i], ros[i]
                if s == 0xFFFF:
                    continue
                for ch in range(s, min(e, 0xFFFE) + 1):
                    if ro == 0:
                        gid = (ch + delta) & 0xFFFF
                    else:
                        gi = ro_base + i * 2 + ro + (ch - s) * 2
                        gid = _u16(data, gi)
                        if not gid:
                            continue
                        gid = (gid + delta) & 0xFFFF
                    if gid:
                        out[gid] = chr(ch)
        elif fmt == 6:
            first, cnt = _u16(data, off + 6), _u16(data, off + 8)
            if first is None or cnt is None:
                continue
            for i in range(cnt):
                gid = _u16(data, off + 10 + i * 2)
                if gid:
                    out[gid] = chr(first + i)
        elif fmt == 12:
            ngroups = _u32(data, off + 12)
            if not ngroups or ngroups > 100_000:
                continue
            for i in range(ngroups):
                g = off + 16 + i * 12
                sc, ec, sg = _u32(data, g), _u32(data, g + 4), _u32(data, g + 8)
                if sc is None or ec is None or sg is None or ec < sc:
                    break
                for k in range(min(ec - sc + 1, 0x10000)):
                    if sc + k <= 0x10FFFF:
                        out[sg + k] = chr(sc + k)
        if out:
            return out
    return None


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
