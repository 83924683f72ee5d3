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
