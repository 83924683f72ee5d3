"""Table detection pipeline.

Port of crates/pdfplumber-core/src/table.rs:
strategy select (1422-1495) -> length filter (1497-1506) ->
snap_edges (199-267) -> join_edge_group (277-390) ->
edges_to_intersections (410-452) -> edges_to_cells two-phase (468-605) ->
cells_to_tables union-find (674-799) -> per-cell text (1026-1136) ->
normalize_table_columns (911-1004) / duplicate_merged_content (810-899) ->
quality metrics (145-188).
"""

from __future__ import annotations

import math

from ..config import TableSettings, WordOptions
from .words import extract_words


# -- edge pipeline stages ----------------------------------------------------

def edge_length(e: dict) -> float:
    return math.hypot(e["x1"] - e["x0"], e["bottom"] - e["top"])


def snap_edges(edges: list[dict], snap_x: float, snap_y: float) -> list[dict]:
    result = [e for e in edges if e["orientation"] == "d"]
    horizontals = [dict(e) for e in edges if e["orientation"] == "h"]
    verticals = [dict(e) for e in edges if e["orientation"] == "v"]

    def snap_group(group: list[dict], tol: float, key: str, setter) -> None:
        if not group:
            return
        group.sort(key=lambda e: e[key])
        start = 0
        n = len(group)
        for i in range(1, n + 1):
            if i == n or abs(group[i][key] - group[start][key]) > tol:
                mean = sum(g[key] for g in group[start:i]) / (i - start)
                for g in group[start:i]:
                    setter(g, mean)
                start = i

    snap_group(horizontals, snap_y, "top",
               lambda e, v: e.update(top=v, bottom=v))
    result.extend(horizontals)
    snap_group(verticals, snap_x, "x0",
               lambda e, v: e.update(x0=v, x1=v))
    result.extend(verticals)
    return result


def join_edge_group(edges: list[dict], join_x: float, join_y: float) -> list[dict]:
    result = [e for e in edges if e["orientation"] == "d"]

    def join(group: list[dict], keyf, spanf, build, tol: float) -> list[dict]:
        if not group:
            return []
        group = sorted(group, key=lambda e: (keyf(e), spanf(e)[0]))
        out: list[dict] = []
        i = 0
        n = len(group)
        while i < n:
            gk = keyf(group[i])
            j = i + 1
            while j < n and abs(keyf(group[j]) - gk) < 1e-9:
                j += 1
            cur_start, cur_end = spanf(group[i])
            proto = group[i]
            for k in range(i + 1, j):
                s, e = spanf(group[k])
                if s <= cur_end + tol:
                    if e > cur_end:
                        cur_end = e
                else:
                    out.append(build(proto, cur_start, cur_end))
                    cur_start, cur_end = s, e
                    proto = group[k]
            out.append(build(proto, cur_start, cur_end))
            i = j
        return out

    horizontals = [e for e in edges if e["orientation"] == "h"]
    verticals = [e for e in edges if e["orientation"] == "v"]
    result.extend(
        join(
            horizontals,
            lambda e: e["top"],
            lambda e: (e["x0"], e["x1"]),
            lambda p, s, e: {"x0": s, "top": p["top"], "x1": e,
                             "bottom": p["bottom"], "orientation": p["orientation"],
                             "source": p["source"]},
            join_x,
        )
    )
    result.extend(
        join(
            verticals,
            lambda e: e["x0"],
            lambda e: (e["top"], e["bottom"]),
            lambda p, s, e: {"x0": p["x0"], "top": s, "x1": p["x1"],
                             "bottom": e, "orientation": p["orientation"],
                             "source": p["source"]},
            join_y,
        )
    )
    return result


def edges_to_intersections(edges: list[dict], x_tol: float, y_tol: float) -> list[tuple]:
    horizontals = [e for e in edges if e["orientation"] == "h"]
    verticals = [e for e in edges if e["orientation"] == "v"]
    pts: list[tuple] = []
    for h in horizontals:
        hy = h["top"]
        for v in verticals:
            vx = v["x0"]
            if (
                h["x0"] - x_tol <= vx <= h["x1"] + x_tol
                and v["top"] - y_tol <= hy <= v["bottom"] + y_tol
            ):
                pts.append((vx, hy))
    pts.sort()
    deduped: list[tuple] = []
    for p in pts:
        if deduped and abs(p[0] - deduped[-1][0]) < 1e-9 and abs(p[1] - deduped[-1][1]) < 1e-9:
            continue
        deduped.append(p)
    return deduped


def _unique_sorted(vals: list[float]) -> list[float]:
    out: list[float] = []
    for v in sorted(vals):
        if not out or abs(v - out[-1]) >= 1e-9:
            out.append(v)
    return out


def edges_to_cells(intersections: list[tuple], edges: list[dict],
                   x_tol: float, y_tol: float) -> list[dict]:
    if not intersections or not edges:
        return []
    xs = _unique_sorted([p[0] for p in intersections])
    ys = _unique_sorted([p[1] for p in intersections])
    horizontals = [e for e in edges if e["orientation"] == "h"]
    verticals = [e for e in edges if e["orientation"] == "v"]

    def has_h(x0: float, x1: float, y: float) -> bool:
        return any(
            abs(e["top"] - y) <= y_tol and e["x0"] <= x0 + x_tol and e["x1"] >= x1 - x_tol
            for e in horizontals
        )

    def has_v(x: float, top: float, bottom: float) -> bool:
        return any(
            abs(e["x0"] - x) <= x_tol and e["top"] <= top + y_tol and e["bottom"] >= bottom - y_tol
            for e in verticals
        )

    cells: list[dict] = []
    established: set[int] = set()

    # Phase 1: strict 4-edge coverage
    for yi in range(len(ys) - 1):
        for xi in range(len(xs) - 1):
            x0, x1 = xs[xi], xs[xi + 1]
            top, bottom = ys[yi], ys[yi + 1]
            if (
                has_h(x0, x1, top)
                and has_h(x0, x1, bottom)
                and has_v(x0, top, bottom)
                and has_v(x1, top, bottom)
            ):
                cells.append({"x0": x0, "top": top, "x1": x1, "bottom": bottom,
                              "text": None})
                established.add(round(x0 * 1000))
                established.add(round(x1 * 1000))

    # Phase 2: merged-cell grid completion
    for yi in range(len(ys) - 1):
        top, bottom = ys[yi], ys[yi + 1]
        phase1 = sum(1 for c in cells if abs(c["top"] - top) < 1e-9)
        if phase1 >= len(xs) - 1:
            continue
        v_xs = [
            x for x in xs
            if round(x * 1000) in established and has_v(x, top, bottom)
        ]
        for vi in range(len(v_xs) - 1):
            cx0, cx1 = v_xs[vi], v_xs[vi + 1]
            exists = any(
                abs(c["x0"] - cx0) < 1e-9
                and abs(c["top"] - top) < 1e-9
                and abs(c["x1"] - cx1) < 1e-9
                and abs(c["bottom"] - bottom) < 1e-9
                for c in cells
            )
            if exists:
                continue
            if has_h(cx0, cx1, top) and has_h(cx0, cx1, bottom):
                cells.append({"x0": cx0, "top": top, "x1": cx1, "bottom": bottom,
                              "text": None})
    return cells


def _float_key(v: float) -> int:
    return round(v * 1000)


def cells_to_tables(cells: list[dict]) -> list[dict]:
    if not cells:
        return []
    n = len(cells)
    parent = list(range(n))

    def find(i: int) -> int:
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra

    eps = 1e-6
    for i in range(n):
        ci = cells[i]
        for j in range(i + 1, n):
            cj = cells[j]
            shared_v = (
                (abs(ci["x1"] - cj["x0"]) < eps or abs(ci["x0"] - cj["x1"]) < eps)
                and ci["top"] < cj["bottom"] + eps
                and cj["top"] < ci["bottom"] + eps
            )
            shared_h = (
                (abs(ci["bottom"] - cj["top"]) < eps or abs(ci["top"] - cj["bottom"]) < eps)
                and ci["x0"] < cj["x1"] + eps
                and cj["x0"] < ci["x1"] + eps
            )
            if shared_v or shared_h:
                union(i, j)

    groups: dict[int, list[int]] = {}
    for i in range(n):
        groups.setdefault(find(i), []).append(i)

    tables: list[dict] = []
    for idxs in groups.values():
        gcells = [cells[i] for i in idxs]
        bbox = {
            "x0": min(c["x0"] for c in gcells),
            "top": min(c["top"] for c in gcells),
            "x1": max(c["x1"] for c in gcells),
            "bottom": max(c["bottom"] for c in gcells),
        }
        row_map: dict[int, list[dict]] = {}
        for c in gcells:
            row_map.setdefault(_float_key(c["top"]), []).append(c)
        rows = [
            sorted(row_map[k], key=lambda c: c["x0"]) for k in sorted(row_map)
        ]
        col_map: dict[int, list[dict]] = {}
        for c in gcells:
            col_map.setdefault(_float_key(c["x0"]), []).append(c)
        columns = [
            sorted(col_map[k], key=lambda c: c["top"]) for k in sorted(col_map)
        ]
        tables.append({"bbox": bbox, "cells": gcells, "rows": rows, "columns": columns})

    tables.sort(key=lambda t: (t["bbox"]["top"], t["bbox"]["x0"]))
    return tables


# -- stream strategy ----------------------------------------------------------

def words_to_edges_stream(words: list[dict], text_x_tol: float, text_y_tol: float,
                          min_words_v: int, min_words_h: int) -> list[dict]:
    if not words:
        return []
    edges: list[dict] = []

    def cluster(keyf, tol: float, min_words: int, vertical: bool) -> None:
        if min_words == 0:
            return
        idxs = sorted(range(len(words)), key=lambda i: keyf(words[i]))
        start = 0
        n = len(idxs)
        for i in range(1, n + 1):
            end_cluster = i == n or abs(
                keyf(words[idxs[i]]) - keyf(words[idxs[start]])
            ) > tol
            if end_cluster:
                size = i - start
                if size >= min_words:
                    mean = sum(keyf(words[idxs[j]]) for j in range(start, i)) / size
                    cw = [words[idxs[j]] for j in range(start, i)]
                    if vertical:
                        edges.append(
                            {"x0": mean, "top": min(w["top"] for w in cw),
                             "x1": mean, "bottom": max(w["bottom"] for w in cw),
                             "orientation": "v", "source": "stream"}
                        )
                    else:
                        edges.append(
                            {"x0": min(w["x0"] for w in cw), "top": mean,
                             "x1": max(w["x1"] for w in cw), "bottom": mean,
                             "orientation": "h", "source": "stream"}
                        )
                start = i

    cluster(lambda w: w["x0"], text_x_tol, min_words_v, True)
    cluster(lambda w: w["x1"], text_x_tol, min_words_v, True)
    cluster(lambda w: w["top"], text_y_tol, min_words_h, False)
    cluster(lambda w: w["bottom"], text_y_tol, min_words_h, False)
    return edges


# -- per-cell text -------------------------------------------------------------

def extract_text_for_cells(cells: list[dict], chars: list[dict],
                           options: WordOptions | None = None) -> None:
    if options is None:
        options = WordOptions()
    is_vertical = options.text_direction in ("ttb", "btt")
    for cell in cells:
        cell_chars = [
            ch for ch in chars
            if cell["x0"] <= (ch["x0"] + ch["x1"]) / 2.0 <= cell["x1"]
            and cell["top"] <= (ch["top"] + ch["bottom"]) / 2.0 <= cell["bottom"]
        ]
        if not cell_chars:
            cell["text"] = None
            continue
        words = extract_words(cell_chars, options)
        if not words:
            cell["text"] = None
            continue
        if is_vertical:
            words.sort(key=lambda w: (w["x0"], w["top"]))
            keyf = lambda w: w["x0"]
            tol = options.x_tolerance
        else:
            words.sort(key=lambda w: (w["top"], w["x0"]))
            keyf = lambda w: w["top"]
            tol = options.y_tolerance
        lines: list[list[dict]] = []
        for w in words:
            if lines and abs(keyf(w) - keyf(lines[-1][0])) <= tol:
                lines[-1].append(w)
            else:
                lines.append([w])
        cell["text"] = "\n".join(
            " ".join(w["text"] for w in line) for line in lines
        )


# -- merged-cell normalization --------------------------------------------------

def _grid_coords(cells: list[dict]) -> tuple[list[float], list[float]]:
    xs: list[float] = []
    ys: list[float] = []
    for c in cells:
        for v in (c["x0"], c["x1"]):
            if not any(abs(v - x) < 1e-6 for x in xs):
                xs.append(v)
        for v in (c["top"], c["bottom"]):
            if not any(abs(v - y) < 1e-6 for y in ys):
                ys.append(v)
    return sorted(xs), sorted(ys)


def normalize_table_columns(table: dict, duplicate: bool = False) -> dict:
    """Split merged cells into grid sub-cells; text in top-left sub-cell
    only (table.rs:911-1004) or duplicated to all (810-899)."""
    cells = table["cells"]
    if not cells:
        return table
    xs, ys = _grid_coords(cells)
    new_cells: list[dict] = []
    for yi in range(len(ys) - 1):
        for xi in range(len(xs) - 1):
            sx0, sx1 = xs[xi], xs[xi + 1]
            st, sb = ys[yi], ys[yi + 1]
            cx = (sx0 + sx1) / 2.0
            cy = (st + sb) / 2.0
            enclosing = next(
                (
                    c for c in cells
                    if c["x0"] - 1e-6 <= cx <= c["x1"] + 1e-6
                    and c["top"] - 1e-6 <= cy <= c["bottom"] + 1e-6
                ),
                None,
            )
            if enclosing is None:
                continue
            is_first = (
                abs(sx0 - enclosing["x0"]) < 1e-6 and abs(st - enclosing["top"]) < 1e-6
            )
            text = enclosing["text"] if (is_first or duplicate) else None
            new_cells.append({"x0": sx0, "top": st, "x1": sx1, "bottom": sb,
                              "text": text})

    row_map: dict[int, list[dict]] = {}
    for c in new_cells:
        row_map.setdefault(_float_key(c["top"]), []).append(c)
    rows = [sorted(row_map[k], key=lambda c: c["x0"]) for k in sorted(row_map)]
    col_map: dict[int, list[dict]] = {}
    for c in new_cells:
        col_map.setdefault(_float_key(c["x0"]), []).append(c)
    columns = [sorted(col_map[k], key=lambda c: c["top"]) for k in sorted(col_map)]
    return {"bbox": table["bbox"], "cells": new_cells, "rows": rows, "columns": columns}


def table_quality(table: dict) -> tuple[float, float]:
    cells = table["cells"]
    if not cells:
        return 0.0, 0.0
    filled = sum(1 for c in cells if c["text"] is not None and c["text"].strip())
    accuracy = filled / len(cells)
    ratios = [
        sum(1 for ch in c["text"] if ch.isspace()) / len(c["text"])
        for c in cells
        if c["text"]
    ]
    whitespace = sum(ratios) / len(ratios) if ratios else 0.0
    return accuracy, whitespace


# -- orchestration ----------------------------------------------------------------

def find_tables(edges: list[dict], words: list[dict], chars: list[dict],
                settings: TableSettings | None = None,
                word_options: WordOptions | None = None) -> list[dict]:
    """Full pipeline -> list of tables with text-filled, normalized cells."""
    if settings is None:
        settings = TableSettings()

    strategy = settings.strategy
    if strategy == "lattice_strict":
        sel = [e for e in edges if e["source"] == "line"]
    elif strategy == "stream":
        sel = words_to_edges_stream(
            words, settings.text_x_tolerance, settings.text_y_tolerance,
            settings.min_words_vertical, settings.min_words_horizontal,
        )
    elif strategy == "explicit":
        sel = list(edges)
        ex = settings.explicit_lines
        if ex is not None:
            min_x = min([e["x0"] for e in sel] + list(ex.vertical_lines), default=None)
            max_x = max([e["x1"] for e in sel] + list(ex.vertical_lines), default=None)
            min_y = min([e["top"] for e in sel] + list(ex.horizontal_lines), default=None)
            max_y = max([e["bottom"] for e in sel] + list(ex.horizontal_lines), default=None)
            if (
                min_x is not None and max_x is not None
                and min_y is not None and max_y is not None
                and min_x <= max_x and min_y <= max_y
            ):
                for y in ex.horizontal_lines:
                    sel.append({"x0": min_x, "top": y, "x1": max_x, "bottom": y,
                                "orientation": "h", "source": "explicit"})
                for x in ex.vertical_lines:
                    sel.append({"x0": x, "top": min_y, "x1": x, "bottom": max_y,
                                "orientation": "v", "source": "explicit"})
    else:  # lattice
        sel = list(edges)

    sel = [e for e in sel if edge_length(e) >= settings.edge_min_length]
    if not sel:
        return []
    sel = snap_edges(sel, settings.snap_x_tolerance, settings.snap_y_tolerance)
    sel = join_edge_group(sel, settings.join_x_tolerance, settings.join_y_tolerance)
    intersections = edges_to_intersections(
        sel, settings.intersection_x_tolerance, settings.intersection_y_tolerance
    )
    cells = edges_to_cells(
        intersections, sel,
        settings.intersection_x_tolerance, settings.intersection_y_tolerance,
    )
    tables = cells_to_tables(cells)

    wopt = word_options or WordOptions()
    out: list[dict] = []
    for t in tables:
        extract_text_for_cells(t["cells"], chars, wopt)
        # re-group (cells mutated in place keeps rows/columns views consistent)
        t = normalize_table_columns(t, duplicate=settings.duplicate_merged_content)
        if settings.min_accuracy is not None:
            acc, _ws = table_quality(t)
            if acc < settings.min_accuracy:
                continue
        out.append(t)
    return out
