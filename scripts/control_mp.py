"""No-Spark control for the 8→32 scaling pairing: the same extraction
kernel driven by a plain multiprocessing.Pool on the same documents.

If raw multiprocessing shows the same (or worse) 8→32 efficiency and
the same absolute 32-way throughput, the ceiling is the HOST (memory
bandwidth for a Python kernel), not Spark orchestration.

Usage: python scripts/control_mp.py [sf_dir] [N]
Writes BENCH_CONTROL.json.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def _extract(pdf: bytes) -> int:
    """Same work as the flagship Spark path (include=()): parse +
    words + per-page text, tables skipped, result text assembled."""
    from pdfplumber_rs_spark.kernel.document import Document
    from pdfplumber_rs_spark.kernel.layout import extract_text_from_words

    doc = Document(pdf)
    texts = []
    for page in doc.pages():
        texts.append(extract_text_from_words(page.extract_words(), None))
    return len("\n".join(texts))


def _build_docs(sf_dir: str) -> list[bytes]:
    import duckdb

    from pdfplumber_rs_spark.sources.pdfgen import pdf_from_text

    rows = duckdb.sql(
        f"select text from read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    # same replication shape as scripts/scaling.py: text x10, docs x2
    docs = []
    for (text,) in rows:
        pdf = pdf_from_text("\n".join([text or ""] * 10))
        docs.append(pdf)
        docs.append(pdf)
    return docs


def run(docs: list[bytes], n: int) -> dict:
    with mp.Pool(n) as pool:
        pool.map(_extract, docs[: max(len(docs) // 50, n)])  # warm-up
        t0 = time.time()
        total = sum(pool.map(_extract, docs, chunksize=16))
        dt = time.time() - t0
    return {"procs": n, "sec": round(dt, 2), "n_docs": len(docs),
            "sum_chars": total, "docs_per_sec": round(len(docs) / dt, 2)}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    docs = _build_docs(sf_dir)
    lo = run(docs, n)
    hi = run(docs, 4 * n)
    efficiency = round((lo["sec"] / hi["sec"]) / 4, 3)
    result = {"sf_dir": sf_dir, "low": lo, "high": hi,
              "speedup": round(lo["sec"] / hi["sec"], 2),
              "scaling_efficiency": efficiency}
    (REPO / "BENCH_CONTROL.json").write_text(json.dumps(result, indent=2))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
