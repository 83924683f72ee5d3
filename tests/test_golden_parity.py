"""Golden parity gate: the generated-fixture corpus must match the
Python-pdfplumber golden JSONs 100% on chars/words/cells (SURVEY.md §5,
cross_validation.rs settings: no unicode-norm, no dedupe)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

SCRIPTS = Path(__file__).resolve().parents[1] / "scripts"
sys.path.insert(0, str(SCRIPTS))

REF = Path("/root/reference/tests/fixtures")


@pytest.mark.skipif(not REF.exists(), reason="reference corpus not present")
@pytest.mark.parametrize(
    "stem",
    [p.stem for p in sorted((REF / "golden").glob("*.json"))
     if (REF / "generated" / f"{p.stem}.pdf").exists()],
)
def test_generated_fixture_parity(stem: str):
    from parity import score_file

    r = score_file(REF / "generated" / f"{stem}.pdf",
                   REF / "golden" / f"{stem}.json", tol=1.0)
    assert r["error"] is None
    assert r["char_rate"] == 1.0, r
    assert r["word_rate"] == 1.0, r
    assert r["cell_rate"] == 1.0, r


CRATES = Path("/root/reference/crates/pdfplumber/tests/fixtures")


@pytest.mark.skipif(not CRATES.exists(), reason="reference corpus not present")
@pytest.mark.parametrize(
    "stem",
    [p.stem for p in sorted((CRATES / "golden" / "oss-fuzz").glob("*.json"))]
    if CRATES.exists() else [],
)
def test_fuzz_corpus_parity(stem: str):
    """oss-fuzz corpus: fuzzed documents must parse quickly (no lexer
    hangs) and match the pdfminer-quirk goldens — junk-byte tokens,
    fallback stream reads past a fuzzed /Length, first-trailer scan."""
    import time

    from parity import score_file

    t0 = time.time()
    r = score_file(CRATES / "pdfs" / "oss-fuzz" / f"{stem}.pdf",
                   CRATES / "golden" / "oss-fuzz" / f"{stem}.json", tol=1.0)
    assert time.time() - t0 < 20, f"slow parse {r}"
    assert r["char_rate"] >= 0.95, r


@pytest.mark.skipif(not CRATES.exists(), reason="reference corpus not present")
@pytest.mark.parametrize("suite", ["pdfbox", "pdfjs", "poppler"])
def test_suite_corpus_per_file(suite: str):
    """pdfbox/pdfjs/poppler suites: every golden'd file >=95% chars —
    these carry the CID-keyed fonts (Adobe ordering tables, identity
    ToUnicode, vertical vx) the top-level corpus lacks."""
    from parity import score_file

    for gold in sorted((CRATES / "golden" / suite).glob("*.json")):
        pdf = CRATES / "pdfs" / suite / f"{gold.stem}.pdf"
        if not pdf.exists():  # orphan golden (pdfjs/issue9262_reduced)
            continue
        r = score_file(pdf, gold, tol=1.0)
        assert r["char_rate"] >= 0.95, r
        assert r["word_rate"] >= 0.95, r


@pytest.mark.skipif(not CRATES.exists(), reason="reference corpus not present")
def test_real_world_corpus_thresholds():
    """Full real-world/issue corpus: byte-identical extract_text on
    EVERY page (the north-rule invariant), chars/words/cells above the
    reference's own cross-validation floors with margin."""
    from parity import score_file

    ch = [0, 0]; wd = [0, 0]; cl = [0, 0]; tx = [0, 0]
    for gold_path in sorted((CRATES / "golden").glob("*.json")):
        stem = gold_path.stem
        pdf = CRATES / "pdfs" / f"{stem}.pdf"
        if not pdf.exists():
            hits = list((CRATES / "pdfs").rglob(f"{stem}.pdf"))
            if not hits:
                continue
            pdf = hits[0]
        r = score_file(pdf, gold_path, tol=1.0)
        for agg, key in ((ch, "chars"), (wd, "words"), (cl, "cells"),
                         (tx, "text")):
            a, b = map(int, r[key].split("/"))
            agg[0] += a
            agg[1] += b
    assert tx[0] == tx[1], f"byte-identical text: {tx[0]}/{tx[1]}"
    assert ch[0] / ch[1] >= 0.999, f"chars {ch[0]}/{ch[1]}"
    assert wd[0] / wd[1] >= 0.999, f"words {wd[0]}/{wd[1]}"
    assert cl[0] / cl[1] >= 0.999, f"cells {cl[0]}/{cl[1]}"
