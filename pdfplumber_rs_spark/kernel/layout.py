"""Line/block clustering and text assembly.

Port of crates/pdfplumber-core/src/layout.rs:
- cluster_words_into_lines (88-189): running-mean y-bucket clustering —
  word joins a line when |word_mid_y - line_mid_y| <= y_tol; the line
  bbox (and hence mid_y) grows as words join. Order-dependent; kept
  as a faithful sequential kernel.
- split_lines_at_columns (195-237), cluster_lines_into_blocks (243-286),
  detect_columns (316-381), sort_blocks_column_order (394-489),
  words_to_text (530-543), blocks_to_text (506-525).
"""

from __future__ import annotations

from ..config import TextOptions


def cluster_words_into_lines(words: list[dict], y_tolerance: float) -> list[dict]:
    if not words:
        return []
    swords = sorted(words, key=lambda w: (w["top"], w["x0"]))
    bucket_size = y_tolerance if y_tolerance > 0 else 1e-9

    lines: list[dict] = []  # {words, x0, top, x1, bottom}
    bucket_to_line: dict[int, list[int]] = {}

    for w in swords:
        mid = (w["top"] + w["bottom"]) / 2.0
        wb = int(mid // bucket_size)
        match = None
        for delta in (-1, 0, 1):
            for li in bucket_to_line.get(wb + delta, ()):
                line = lines[li]
                lmid = (line["top"] + line["bottom"]) / 2.0
                if abs(mid - lmid) <= y_tolerance:
                    match = li
                    break
            if match is not None:
                break
        if match is not None:
            line = lines[match]
            old_mid = (line["top"] + line["bottom"]) / 2.0
            old_bucket = int(old_mid // bucket_size)
            line["x0"] = min(line["x0"], w["x0"])
            line["top"] = min(line["top"], w["top"])
            line["x1"] = max(line["x1"], w["x1"])
            line["bottom"] = max(line["bottom"], w["bottom"])
            line["words"].append(w)
            new_mid = (line["top"] + line["bottom"]) / 2.0
            new_bucket = int(new_mid // bucket_size)
            if new_bucket != old_bucket:
                lst = bucket_to_line.get(old_bucket)
                if lst is not None and match in lst:
                    lst.remove(match)
                bucket_to_line.setdefault(new_bucket, []).append(match)
        else:
            li = len(lines)
            lines.append(
                {"words": [w], "x0": w["x0"], "top": w["top"],
                 "x1": w["x1"], "bottom": w["bottom"]}
            )
            bucket_to_line.setdefault(int(mid // bucket_size), []).append(li)

    for line in lines:
        rtl = sum(1 for w in line["words"] if w["direction"] == "rtl")
        if rtl > len(line["words"]) // 2:
            line["words"].sort(key=lambda w: -w["x0"])
        else:
            line["words"].sort(key=lambda w: w["x0"])

    lines.sort(key=lambda l: l["top"])
    return lines


def split_lines_at_columns(lines: list[dict], x_density: float) -> list[dict]:
    result: list[dict] = []
    for line in lines:
        if len(line["words"]) <= 1:
            result.append(line)
            continue
        words = line["words"]
        cur = [words[0]]
        bbox = dict(x0=words[0]["x0"], top=words[0]["top"],
                    x1=words[0]["x1"], bottom=words[0]["bottom"])
        for w in words[1:]:
            gap = w["x0"] - bbox["x1"]
            if gap > x_density:
                result.append({"words": cur, **bbox})
                cur = [w]
                bbox = dict(x0=w["x0"], top=w["top"], x1=w["x1"], bottom=w["bottom"])
            else:
                bbox["x0"] = min(bbox["x0"], w["x0"])
                bbox["top"] = min(bbox["top"], w["top"])
                bbox["x1"] = max(bbox["x1"], w["x1"])
                bbox["bottom"] = max(bbox["bottom"], w["bottom"])
                cur.append(w)
        result.append({"words": cur, **bbox})
    result.sort(key=lambda l: (l["top"], l["x0"]))
    return result


def cluster_lines_into_blocks(lines: list[dict], y_density: float) -> list[dict]:
    if not lines:
        return []
    blocks: list[dict] = []
    for line in lines:
        best = None
        best_gap = float("inf")
        for i, block in enumerate(blocks):
            gap = line["top"] - block["bottom"]
            if (
                0.0 <= gap <= y_density
                and line["x0"] < block["x1"]
                and block["x0"] < line["x1"]
                and gap < best_gap
            ):
                best_gap = gap
                best = i
        if best is not None:
            b = blocks[best]
            b["x0"] = min(b["x0"], line["x0"])
            b["top"] = min(b["top"], line["top"])
            b["x1"] = max(b["x1"], line["x1"])
            b["bottom"] = max(b["bottom"], line["bottom"])
            b["lines"].append(line)
        else:
            blocks.append(
                {"lines": [line], "x0": line["x0"], "top": line["top"],
                 "x1": line["x1"], "bottom": line["bottom"]}
            )
    for b in blocks:
        b["lines"].sort(key=lambda l: l["top"])
    return blocks


def detect_columns(words: list[dict], min_column_gap: float, max_columns: int) -> list[float]:
    if not words or max_columns <= 1:
        return []
    gap_positions: list[tuple[float, float]] = []
    for line in cluster_words_into_lines(words, 3.0):
        ws = line["words"]
        for a, b in zip(ws, ws[1:]):
            if b["x0"] - a["x1"] >= min_column_gap:
                gap_positions.append((a["x1"], b["x0"]))
    if not gap_positions:
        return []
    gap_positions.sort(key=lambda g: (g[0] + g[1]) / 2.0)
    boundaries: list[float] = []
    cluster_sum = (gap_positions[0][0] + gap_positions[0][1]) / 2.0
    cluster_count = 1
    for g in gap_positions[1:]:
        mid = (g[0] + g[1]) / 2.0
        if abs(mid - cluster_sum / cluster_count) <= min_column_gap:
            cluster_sum += mid
            cluster_count += 1
        else:
            boundaries.append(cluster_sum / cluster_count)
            cluster_sum = mid
            cluster_count = 1
    boundaries.append(cluster_sum / cluster_count)
    if len(boundaries) >= max_columns:
        boundaries = boundaries[: max_columns - 1]
    return boundaries


def _column_index(x: float, boundaries: list[float]) -> int:
    for i, b in enumerate(boundaries):
        if x < b:
            return i
    return len(boundaries)


def sort_blocks_column_order(blocks: list[dict], boundaries: list[float]) -> list[dict]:
    if not blocks or not boundaries:
        return sorted(blocks, key=lambda b: (b["top"], b["x0"]))
    cols = [_column_index(b["x0"], boundaries) for b in blocks]
    n = len(blocks)
    multi = [False] * n
    for i in range(n):
        for j in range(i + 1, n):
            if (
                cols[i] != cols[j]
                and blocks[i]["top"] < blocks[j]["bottom"]
                and blocks[j]["top"] < blocks[i]["bottom"]
            ):
                multi[i] = True
                multi[j] = True
    indices = sorted(range(n), key=lambda i: (blocks[i]["top"], blocks[i]["x0"]))
    sections: list[list[int]] = []
    cur: list[int] = []
    cur_multi = False
    for idx in indices:
        if not cur:
            cur = [idx]
            cur_multi = multi[idx]
        elif multi[idx] and cur_multi:
            cur.append(idx)
        elif not multi[idx] and not cur_multi:
            sections.append(cur)
            cur = [idx]
        else:
            sections.append(cur)
            cur = [idx]
            cur_multi = multi[idx]
    if cur:
        sections.append(cur)
    for sec in sections:
        if len(sec) > 1 and any(multi[i] for i in sec):
            sec.sort(key=lambda i: (cols[i], blocks[i]["top"]))
    return [blocks[i] for sec in sections for i in sec]


def blocks_to_text(blocks: list[dict]) -> str:
    return "\n\n".join(
        "\n".join(
            " ".join(w["text"] for w in line["words"]) for line in block["lines"]
        )
        for block in blocks
    )


def words_to_text_grouped(words: list[dict], y_tolerance: float) -> str:
    """Cell-text variant (T10, table.rs:1026-1136): ALL cell words —
    upright and rotated together — clustered into lines by doctop
    (chained clustering, extraction order within a line); ' ' within
    lines, '\n' between. Unlike page-level words_to_text this REGROUPS
    across the sequence (issue-90: the btt 'ofnI' word joins the upright
    header line whose doctop it overlaps)."""
    from .words import cluster_objects

    lines = cluster_objects(words, lambda w: w["doctop"], y_tolerance)
    return "\n".join(" ".join(w["text"] for w in line) for line in lines)


def words_to_text(words: list[dict], y_tolerance: float) -> str:
    """Default extract_text (oracle textmap semantics, derived byte-exact
    against the Python-pdfplumber goldens incl. rotated/mirrored pages):
    words stay in EXTRACTION ORDER; a page-global chained clustering of
    word doctops (tolerance y_tolerance) assigns line ids; a newline
    falls wherever consecutive words' cluster ids differ, a space
    otherwise. Note this splits the sequence into RUNS — two words
    sharing a cluster id but separated in extraction order (different
    rotated columns) land on different output lines."""
    from .words import cluster_value_ids

    if not words:
        return ""
    ids = cluster_value_ids([w["doctop"] for w in words], y_tolerance)
    lines: list[list[str]] = [[words[0]["text"]]]
    cur = ids[words[0]["doctop"]]
    for w in words[1:]:
        wid = ids[w["doctop"]]
        if wid == cur:
            lines[-1].append(w["text"])
        else:
            lines.append([w["text"]])
            cur = wid
    return "\n".join(" ".join(line) for line in lines)


def extract_text_from_words(words: list[dict], options: TextOptions | None = None) -> str:
    """Page::extract_text orchestration (page.rs:444-474)."""
    if options is None:
        options = TextOptions()
    if not words:
        return ""
    if not options.layout:
        return words_to_text(words, options.y_tolerance)
    lines = cluster_words_into_lines(words, options.y_tolerance)
    lines = split_lines_at_columns(lines, options.x_density)
    blocks = cluster_lines_into_blocks(lines, options.y_density)
    if options.column_mode == "auto":
        boundaries = detect_columns(words, options.min_column_gap, options.max_columns)
        blocks = sort_blocks_column_order(blocks, boundaries)
    else:
        blocks.sort(key=lambda b: (b["top"], b["x0"]))
    return blocks_to_text(blocks)
