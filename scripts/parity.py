"""Parity harness: run our kernel over the reference's fixture PDFs and
score against the Python-pdfplumber golden JSONs.

Mirrors crates/pdfplumber/tests/cross_validation.rs:95-140 — coordinate
tolerance 1.0pt, font-size tolerance 0.5pt, golden settings = no unicode
normalization, no char dedupe. Reports per-file char/word/text/table match
rates and corpus-level aggregates.

Usage: python scripts/parity.py [--set gen|crates|all] [--file NAME]
       [--exact] (use 0-tolerance coordinate matching to chase exactness)
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pdfplumber_rs_spark.config import ExtractOptions
from pdfplumber_rs_spark.kernel.document import extract_document

REF = Path("/root/reference")
SETS = {
    "gen": (
        REF / "tests/fixtures/generated",
        REF / "tests/fixtures/golden",
    ),
    "crates": (
        REF / "crates/pdfplumber/tests/fixtures/pdfs",
        REF / "crates/pdfplumber/tests/fixtures/golden",
    ),
}

COORD_TOL = 1.0
SIZE_TOL = 0.5


def match_objs(ours: list[dict], gold: list[dict], keys: tuple, tol: float,
               text_key: str = "text") -> tuple[int, int]:
    """Greedy nearest matching like accuracy_benchmark.rs: for each golden
    object find an unused ours object with same text and coords within tol."""
    used = [False] * len(ours)
    # index ours by text for speed
    by_text: dict[str, list[int]] = {}
    for i, o in enumerate(ours):
        by_text.setdefault(str(o.get(text_key)), []).append(i)
    hit = 0
    for g in gold:
        cands = by_text.get(str(g.get(text_key)), [])
        for i in cands:
            if used[i]:
                continue
            o = ours[i]
            ok = True
            for k in keys:
                gv, ov = g.get(k), o.get(k)
                if gv is None or ov is None:
                    continue
                t = SIZE_TOL if k == "size" else tol
                if abs(float(gv) - float(ov)) > t:
                    ok = False
                    break
            if ok:
                used[i] = True
                hit += 1
                break
    return hit, len(gold)


def table_cells(tables) -> list[str]:
    cells = []
    for t in tables:
        rows = t["rows"] if isinstance(t, dict) else t
        for row in rows:
            for c in row:
                if isinstance(c, dict):
                    c = c.get("text")
                cells.append("" if c is None else str(c))
    return cells


def score_file(pdf_path: Path, gold_path: Path, tol: float) -> dict:
    data = pdf_path.read_bytes()
    gold = json.loads(gold_path.read_text())
    t0 = time.time()
    # golden settings: no unicode normalization, no dedupe
    # (cross_validation.rs:131-140)
    opts = ExtractOptions(unicode_norm=None, dedupe=None)
    res = extract_document(data, opts)
    dt = time.time() - t0
    out = {"file": pdf_path.name, "sec": round(dt, 3), "error": res["error"],
           "pages": f"{res['n_pages']}/{len(gold['pages'])}"}
    ch_hit = ch_tot = w_hit = w_tot = tb_hit = tb_tot = 0
    text_eq = 0
    text_tot = 0
    zero_indexed = bool(gold["pages"]) and gold["pages"][0]["page_number"] == 0
    for gp in gold["pages"]:
        pn = gp["page_number"] + (1 if zero_indexed else 0)
        op = next((p for p in res["pages"] if p["page_number"] == pn), None)
        if op is None:
            ch_tot += len(gp.get("chars", []))
            w_tot += len(gp.get("words", []))
            tb_tot += len(table_cells(gp.get("tables", [])))
            continue
        h, t = match_objs(op["chars"], gp.get("chars", []),
                          ("x0", "top", "x1", "bottom", "size"), tol)
        ch_hit += h; ch_tot += t
        h, t = match_objs(op["words"], gp.get("words", []),
                          ("x0", "top", "x1", "bottom"), tol)
        w_hit += h; w_tot += t
        gcells = table_cells(gp.get("tables", []))
        ocells = table_cells([t["rows"] for t in op["tables"]])
        # order-sensitive cell comparison
        m = sum(1 for a, b in zip(ocells, gcells) if a == b)
        tb_hit += m; tb_tot += len(gcells)
        if "text" in gp:
            text_tot += 1
            if op["text"] == gp["text"]:
                text_eq += 1
    out.update(
        chars=f"{ch_hit}/{ch_tot}",
        words=f"{w_hit}/{w_tot}",
        cells=f"{tb_hit}/{tb_tot}",
        text=f"{text_eq}/{text_tot}",
        char_rate=round(ch_hit / ch_tot, 4) if ch_tot else 1.0,
        word_rate=round(w_hit / w_tot, 4) if w_tot else 1.0,
        cell_rate=round(tb_hit / tb_tot, 4) if tb_tot else 1.0,
    )
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--set", default="all", choices=["gen", "crates", "all"])
    ap.add_argument("--file", default=None)
    ap.add_argument("--exact", action="store_true")
    ap.add_argument("--timeout", type=int, default=60)
    ap.add_argument("-v", action="store_true")
    args = ap.parse_args()
    tol = 0.005 if args.exact else COORD_TOL
    sets = ["gen", "crates"] if args.set == "all" else [args.set]
    agg_h = {"chars": 0, "words": 0, "cells": 0}
    agg_t = {"chars": 0, "words": 0, "cells": 0}
    rows = []
    for s in sets:
        pdf_dir, gold_dir = SETS[s]
        for gold_path in sorted(gold_dir.rglob("*.json")):
            rel = gold_path.relative_to(gold_dir)
            stem = gold_path.stem.replace(".golden", "")
            # suite goldens (pdfbox/pdfjs/poppler/oss-fuzz) mirror the
            # pdfs/ subdirectory layout (accuracy_benchmark.rs golden_rel)
            pdf_path = pdf_dir / rel.parent / f"{stem}.pdf"
            if not pdf_path.exists():
                hits = list(pdf_dir.rglob(f"{stem}.pdf"))
                if not hits:
                    continue
                pdf_path = hits[0]
            if args.file and args.file not in stem:
                continue
            import signal

            def _alarm(signum, frame):
                raise TimeoutError("per-file timeout")

            signal.signal(signal.SIGALRM, _alarm)
            signal.alarm(args.timeout)
            try:
                r = score_file(pdf_path, gold_path, tol)
            except Exception as e:  # noqa: BLE001
                r = {"file": pdf_path.name, "error": f"CRASH {type(e).__name__} {e}"}
            finally:
                signal.alarm(0)
            rows.append(r)
            for k in ("chars", "words", "cells"):
                if k in r:
                    h, t = r[k].split("/")
                    agg_h[k] += int(h); agg_t[k] += int(t)
            flag = ""
            if r.get("char_rate", 1) < 0.95 or r.get("word_rate", 1) < 0.95 \
                    or "CRASH" in str(r.get("error", "")):
                flag = " <<<"
            print(json.dumps(r), flag, flush=True)
    print("---- corpus totals ----")
    for k in ("chars", "words", "cells"):
        rate = agg_h[k] / agg_t[k] if agg_t[k] else 1.0
        print(f"{k}: {agg_h[k]}/{agg_t[k]} = {rate:.4f}")


if __name__ == "__main__":
    main()
