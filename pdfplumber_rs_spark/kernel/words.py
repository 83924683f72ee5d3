"""Word extraction: chars -> words via cluster-sort + gap-split.

Port of crates/pdfplumber-core/src/words.rs:71-392 semantics:
- horizontal (ltr+rtl) chars merged, sorted spatially; vertical (ttb+btt)
  chars handled as a separate ttb-sorted group
- cluster_sort: sort by cross axis, cluster within tolerance, sort within
  cluster by reading axis (with the RTL physical-direction vote)
- split when interval gap > x_tolerance or |dtop| > y_tolerance; blanks
  split words unless keep_blank_chars; Arabic diacritics never split
- make_word: concat text (ligature expansion), union bbox, min doctop,
  first char's direction
"""

from __future__ import annotations

from ..config import WordOptions
from .textnorm import expand_ligatures, is_arabic_diacritic_text

_VERTICAL = ("ttb", "btt")


def extract_words(chars: list[dict], options: WordOptions | None = None) -> list[dict]:
    if options is None:
        options = WordOptions()
    if not chars:
        return []

    has_vertical = any(c["direction"] in _VERTICAL for c in chars)
    if not has_vertical:
        return _extract_group(chars, options, None)

    horizontal = [c for c in chars if c["direction"] not in _VERTICAL]
    vertical = [c for c in chars if c["direction"] in _VERTICAL]
    words: list[dict] = []
    if horizontal:
        words.extend(_extract_group(horizontal, options, None))
    if vertical:
        words.extend(_extract_group(vertical, options, "ttb"))
    return words


def _extract_group(chars: list[dict], options: WordOptions,
                   force_direction: str | None) -> list[dict]:
    if not chars:
        return []
    direction = force_direction or options.text_direction
    sorted_chars = list(chars)
    if not options.use_text_flow:
        _cluster_sort(sorted_chars, options, direction)

    is_vertical = direction in _VERTICAL
    words: list[dict] = []
    current: list[dict] = []

    for ch in sorted_chars:
        is_blank = bool(ch["text"]) and all(c.isspace() for c in ch["text"])
        if not ch["text"]:
            is_blank = True
        if is_blank and not options.keep_blank_chars:
            if current:
                words.append(_make_word(current, options.expand_ligatures))
                current = []
            continue
        if not current:
            current.append(ch)
            continue
        last = current[-1]
        if is_vertical:
            split = _should_split_vertical(last, ch, options)
        else:
            split = _should_split_horizontal(last, ch, options)
        if split:
            words.append(_make_word(current, options.expand_ligatures))
            current = []
        current.append(ch)

    if current:
        words.append(_make_word(current, options.expand_ligatures))
    return words


def _cluster_sort(chars: list[dict], options: WordOptions, direction: str) -> None:
    is_vertical = direction in _VERTICAL

    if is_vertical:
        chars.sort(key=lambda c: -c["x0"])
        cross_tol = options.x_tolerance
    else:
        chars.sort(key=lambda c: c["top"])
        cross_tol = options.y_tolerance

    # cluster boundaries on consecutive cross-axis diffs
    starts = [0]
    for i in range(1, len(chars)):
        if is_vertical:
            diff = abs(chars[i - 1]["x0"] - chars[i]["x0"])
        else:
            diff = abs(chars[i]["top"] - chars[i - 1]["top"])
        if diff > cross_tol:
            starts.append(i)
    starts.append(len(chars))

    for s, e in zip(starts, starts[1:]):
        cluster = chars[s:e]
        if direction == "ttb":
            cluster.sort(key=lambda c: c["top"])
        elif direction == "btt":
            cluster.sort(key=lambda c: -c["bottom"])
        elif direction == "rtl":
            # physical-direction vote (words.rs:267-298)
            if len(cluster) >= 2:
                asc_pairs = sum(
                    1
                    for a, b in zip(cluster, cluster[1:])
                    if b["x0"] >= a["x0"]
                )
                physically_ltr = asc_pairs >= len(cluster) // 2
            else:
                physically_ltr = True
            cluster.sort(key=lambda c: c["x0"] if physically_ltr else -c["x0"])
        else:
            cluster.sort(key=lambda c: c["x0"])
        chars[s:e] = cluster


def _should_split_horizontal(last: dict, cur: dict, options: WordOptions) -> bool:
    if is_arabic_diacritic_text(cur["text"]) or is_arabic_diacritic_text(last["text"]):
        return False
    x_gap = max(0.0, max(last["x0"], cur["x0"]) - min(last["x1"], cur["x1"]))
    y_diff = abs(cur["top"] - last["top"])
    return x_gap > options.x_tolerance or y_diff > options.y_tolerance


def _should_split_vertical(last: dict, cur: dict, options: WordOptions) -> bool:
    y_gap = max(0.0, max(last["top"], cur["top"]) - min(last["bottom"], cur["bottom"]))
    x_diff = abs(cur["x0"] - last["x0"])
    return y_gap > options.y_tolerance or x_diff > options.x_tolerance


def _make_word(chars: list[dict], do_ligatures: bool) -> dict:
    text = "".join(c["text"] for c in chars)
    if do_ligatures:
        text = expand_ligatures(text)
    return {
        "text": text,
        "x0": min(c["x0"] for c in chars),
        "top": min(c["top"] for c in chars),
        "x1": max(c["x1"] for c in chars),
        "bottom": max(c["bottom"] for c in chars),
        "doctop": min(c["doctop"] for c in chars),
        "direction": chars[0]["direction"],
        "upright": chars[0]["upright"],
        "chars": chars,
    }
