"""Text post-processing: ligatures, unicode normalization, char dedupe,
BiDi-lite direction marking.

Reference parity:
- ligature expansion: words.rs:376-392
- normalize_chars: unicode_norm.rs:35-70 (default NFC)
- dedupe_chars: dedupe.rs:50-88 (tol 1.0, extra attrs fontname+size,
  sequential first-wins semantics)
- apply_bidi_directions: bidi.rs:30-96 (strong-RTL chars on a visual
  line get direction=rtl; vertical/non-upright chars untouched)
"""

from __future__ import annotations

import unicodedata

_LIGATURES = {
    "ﬀ": "ff",
    "ﬁ": "fi",
    "ﬂ": "fl",
    "ﬃ": "ffi",
    "ﬄ": "ffl",
    "ﬅ": "ſt",
    "ﬆ": "st",
}


import re as _re

_LIG_RE = _re.compile("[" + "".join(_LIGATURES) + "]")
# strong-RTL presence prescreen (mirrors _is_strong_rtl's ranges) — a
# compiled character-class search is C-speed vs a per-char genexpr
_RTL_RE = _re.compile(
    "[\u0590-\u08ff\ufb1d-\ufdff\ufe70-\ufeff\U0001ee00-\U0001eeff]")


def expand_ligatures(text: str) -> str:
    if _LIG_RE.search(text) is None:
        return text
    return "".join(_LIGATURES.get(ch, ch) for ch in text)


def normalize_chars(chars: list[dict], form: str | None) -> list[dict]:
    if form is None:
        return chars
    f = form.upper()
    for c in chars:
        c["text"] = unicodedata.normalize(f, c["text"])
    return chars


def _dedupe_collision_flags(chars, t, extra_attrs, default_attrs,
                            cols=None):
    """Vectorized prescreen: True where a char COULD be within tolerance
    of another char with the same base key (same or 3×3-adjacent grid
    cell). Chars not flagged can never be dropped — and can never drop
    anyone — so the exact sequential pass below only needs to visit
    flagged chars. Returns None when the coordinates don't fit the
    packed-int layout (fallback to the full pass)."""
    import numpy as np

    n = len(chars)
    gids = np.empty(n, dtype=np.int64)
    seen: dict = {}
    for i, ch in enumerate(chars):
        if default_attrs:
            base = (ch["text"], ch["fontname"], ch["size"])
        else:
            base = (ch["text"],) + tuple(ch.get(a) for a in extra_attrs)
        gid = seen.get(base)
        if gid is None:
            gid = len(seen)
            seen[base] = gid
        gids[i] = gid
    if len(seen) >= 1 << 20:
        return None
    if cols is not None and len(cols["x0"]) == n:
        x0, top = cols["x0"], cols["top"]
    else:
        x0 = np.fromiter((c["x0"] for c in chars), np.float64, n)
        top = np.fromiter((c["top"] for c in chars), np.float64, n)
    if not (np.isfinite(x0).all() and np.isfinite(top).all()):
        return None
    bx = np.floor(x0 / t)
    by = np.floor(top / t)
    bx -= bx.min()
    by -= by.min()
    if bx.max() >= (1 << 20) - 2 or by.max() >= (1 << 20) - 2:
        return None
    key = (gids << 42) | (bx.astype(np.int64) + 1 << 21) | (
        by.astype(np.int64) + 1)
    a = np.sort(key)
    # own-cell duplicates
    left = np.searchsorted(a, key, "left")
    right = np.searchsorted(a, key, "right")
    flag = (right - left) > 1
    # 8 neighbor cells
    sx, sy = 1 << 21, 1
    for off in (-sx - sy, -sx, -sx + sy, -sy, sy, sx - sy, sx, sx + sy):
        tgt = key + off
        pos = np.searchsorted(a, tgt)
        hit = (pos < n) & (a[np.minimum(pos, n - 1)] == tgt)
        flag |= hit
    return flag


def dedupe_chars(chars: list[dict], tolerance: float = 1.0,
                 extra_attrs: tuple[str, ...] = ("fontname", "size"),
                 cols: dict | None = None) -> list[dict]:
    """Drop a char if an earlier kept char has identical text, matching
    extra attrs, and |dx0| <= tol and |dtop| <= tol (dedupe.rs:50-88)."""
    # spatial hash on (text, attrs, x0//tol, top//tol): a match within
    # tolerance always lives in one of the 3×3 neighbor buckets, so this
    # is O(n) with semantics identical to the full scan
    t = tolerance if tolerance > 0 else 1e-9
    default_attrs_pre = extra_attrs == ("fontname", "size")
    if len(chars) >= 64:
        # vectorized prescreen: in the common no-duplicate case the
        # 9-probe dict walk below never runs at all
        try:
            flags = _dedupe_collision_flags(chars, t, extra_attrs,
                                            default_attrs_pre, cols=cols)
        except (TypeError, ValueError):  # odd coord types: full pass
            flags = None
        if flags is not None:
            if not flags.any():
                return list(chars)
            return _dedupe_pass(chars, tolerance, t, extra_attrs, flags)
    return _dedupe_pass(chars, tolerance, t, extra_attrs, None)


def _dedupe_pass(chars, tolerance, t, extra_attrs, flags):
    kept: list[dict] = []
    # two-level hash: base key (text+attrs) once per char, then single
    # INT cell keys (bx*2^32+by) for the 3x3 probe — int dict lookups
    # beat per-probe tuple allocation (this loop runs once per char)
    default_attrs = extra_attrs == ("fontname", "size")
    buckets: dict[tuple, dict[int, list]] = {}
    shift = 1 << 32
    for i, ch in enumerate(chars):
        if flags is not None and not flags[i]:
            # prescreen proved nothing is within tolerance of this char
            kept.append(ch)
            continue
        if default_attrs:
            base = (ch["text"], ch["fontname"], ch["size"])
        else:
            base = (ch["text"],) + tuple(ch.get(a) for a in extra_attrs)
        x0 = ch["x0"]
        top = ch["top"]
        cell = int(x0 // t) * shift + int(top // t)
        grid = buckets.get(base)
        dup = False
        if grid is not None:
            for dcell in (cell - shift - 1, cell - shift, cell - shift + 1,
                          cell - 1, cell, cell + 1,
                          cell + shift - 1, cell + shift, cell + shift + 1):
                for kx, ktop in grid.get(dcell, ()):
                    if abs(kx - x0) <= tolerance and abs(ktop - top) <= tolerance:
                        dup = True
                        break
                if dup:
                    break
        if not dup:
            kept.append(ch)
            if grid is None:
                grid = {}
                buckets[base] = grid
            lst = grid.get(cell)
            if lst is None:
                grid[cell] = [(x0, top)]
            else:
                lst.append((x0, top))
    return kept


# ---------------------------------------------------------------------------
# BiDi-lite

def _is_strong_rtl(ch: str) -> bool:
    o = ord(ch)
    return (
        0x0590 <= o <= 0x08FF  # Hebrew..Arabic Extended-A (incl. Syriac etc.)
        or 0xFB1D <= o <= 0xFDFF
        or 0xFE70 <= o <= 0xFEFF
        or 0x1EE00 <= o <= 0x1EEFF
    )


_ARABIC_DIACRITIC_RANGES = (
    (0x0610, 0x061A),
    (0x064B, 0x065F),
    (0x0670, 0x0670),
    (0x06D6, 0x06DC),
    (0x06DF, 0x06E4),
    (0x06E7, 0x06E8),
    (0x06EA, 0x06ED),
    (0x08D3, 0x08FF),
)


def is_arabic_diacritic(ch: str) -> bool:
    o = ord(ch)
    return any(lo <= o <= hi for lo, hi in _ARABIC_DIACRITIC_RANGES)


def is_arabic_diacritic_text(text: str) -> bool:
    return bool(text) and all(is_arabic_diacritic(c) for c in text)


def apply_bidi_directions(chars: list[dict], y_tolerance: float = 3.0) -> list[dict]:
    if not chars:
        return chars
    if _RTL_RE.search("".join(ch["text"] for ch in chars)) is None:
        return chars

    # group into lines by vertical center (bidi.rs:159-191)
    order = sorted(range(len(chars)),
                   key=lambda i: (chars[i]["top"] + chars[i]["bottom"]) / 2.0)
    groups: list[list[int]] = []
    cur: list[int] = [order[0]]
    cur_center = (chars[order[0]]["top"] + chars[order[0]]["bottom"]) / 2.0
    for idx in order[1:]:
        center = (chars[idx]["top"] + chars[idx]["bottom"]) / 2.0
        if abs(center - cur_center) <= y_tolerance:
            cur.append(idx)
        else:
            groups.append(cur)
            cur = [idx]
            cur_center = center
    groups.append(cur)

    for group in groups:
        group.sort(key=lambda i: chars[i]["x0"])
        # simplified UAX#9: strong-RTL chars and diacritics between them → rtl
        strong = [
            any(_is_strong_rtl(c) for c in chars[i]["text"]) for i in group
        ]
        if not any(strong):
            continue
        for gpos, i in enumerate(group):
            ch = chars[i]
            if not ch["upright"] or ch["direction"] in ("ttb", "btt"):
                continue
            if strong[gpos] or (
                is_arabic_diacritic_text(ch["text"])
                and any(strong)
            ):
                ch["direction"] = "rtl"
    return chars
