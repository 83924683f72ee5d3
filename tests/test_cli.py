"""S8 CLI sinks: ported reference CLI integration tests
(crates/pdfplumber-cli/tests/fixture_cli_tests.rs) running
`python -m pdfplumber_rs_spark` over the SAME fixture PDFs, plus
coverage for the subcommands the reference tests don't exercise."""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

import pytest

FIX = Path("/root/reference/tests/fixtures")
GEN = FIX / "generated"
DL = FIX / "downloaded"

pytestmark = pytest.mark.skipif(not GEN.exists(), reason="reference absent")


def run_cli(*args: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, "-m", "pdfplumber_rs_spark", *args],
        capture_output=True, text=True, timeout=120,
        cwd=Path(__file__).resolve().parents[1],
    )


def test_text_basic():  # fixture_cli_tests.rs:35
    r = run_cli("text", str(GEN / "basic_text.pdf"))
    assert r.returncode == 0 and "quick brown fox" in r.stdout


def test_text_pages():  # rs:45
    r = run_cli("text", str(GEN / "long_document.pdf"), "--pages", "1,3")
    assert r.returncode == 0
    assert "Page 1" in r.stdout and "Page 3" in r.stdout


def test_text_scotus():  # rs:55
    r = run_cli("text", str(DL / "scotus-transcript-p1.pdf"))
    assert r.returncode == 0 and r.stdout.strip()


def test_chars_json_basic():  # rs:66
    r = run_cli("chars", str(GEN / "basic_text.pdf"), "--format", "json")
    assert r.returncode == 0
    arr = json.loads(r.stdout)
    assert arr and all(k in arr[0] for k in ("text", "fontname", "size"))


def test_chars_multi_font():  # rs:85
    r = run_cli("chars", str(GEN / "multi_font.pdf"), "--format", "json")
    arr = json.loads(r.stdout)
    assert len({c["fontname"] for c in arr}) >= 2


def test_tables_json_lattice():  # rs:110
    r = run_cli("tables", str(GEN / "table_lattice.pdf"),
                "--format", "json")
    assert r.returncode == 0
    assert json.loads(r.stdout), "should detect tables in lattice PDF"


def test_tables_nics():  # rs:128 — real government PDF
    r = run_cli("tables", str(DL / "nics-firearm-checks.pdf"),
                "--format", "json")
    assert r.returncode == 0
    assert json.loads(r.stdout), "should detect tables in NICS PDF"


def test_info_nonempty():  # rs:151, rs:160
    for pdf in (GEN / "annotations_links.pdf", DL / "pdffill-demo.pdf"):
        r = run_cli("info", str(pdf))
        assert r.returncode == 0 and r.stdout.strip(), pdf


def test_search():  # rs:171
    r = run_cli("search", str(GEN / "long_document.pdf"), "Lorem ipsum")
    assert r.returncode == 0 and "Lorem ipsum" in r.stdout


def test_links():  # rs:182
    r = run_cli("links", str(GEN / "annotations_links.pdf"))
    assert r.returncode == 0
    assert "https://example.com" in r.stdout


# ---- beyond the reference's tests: the remaining subcommands ----------


def test_words_csv():
    r = run_cli("words", str(GEN / "basic_text.pdf"), "--format", "csv")
    assert r.returncode == 0
    lines = r.stdout.strip().splitlines()
    assert lines[0].startswith("page,text,x0")
    assert any("quick" in ln for ln in lines)


def test_bookmarks_forms_validate_debug_images(tmp_path):
    from pdfplumber_rs_spark.sources import pdfgen

    pdf = tmp_path / "full.pdf"
    pdf.write_bytes(pdfgen.pdf_from_text(
        "alpha beta\ngamma", mcid=True,
        info={"Title": "T"}, bookmarks_per_page="Sec {p}",
        form_fields=[{"name": "f1", "value": "v", "page": 0}],
        page1_extra=pdfgen.inline_image_content(10.0, 10.0, 4.0, 4.0)))

    r = run_cli("bookmarks", str(pdf), "--format", "json")
    assert r.returncode == 0 and json.loads(r.stdout)

    r = run_cli("forms", str(pdf), "--format", "json")
    rows = json.loads(r.stdout)
    assert rows and rows[0]["name"] == "f1"

    r = run_cli("validate", str(pdf))
    assert r.returncode == 0 and "No issues found." in r.stdout

    r = run_cli("debug", str(pdf), "--format", "json")
    dbg = json.loads(r.stdout)
    assert dbg and dbg[0]["chars"] > 0 and dbg[0]["images"] == 1

    r = run_cli("images", str(pdf), "--format", "json")
    pages = json.loads(r.stdout)
    assert pages[0]["images"][0]["name"].startswith("inline-")


def test_encrypted_password():
    from pdfplumber_rs_spark.sources import pdfgen

    enc = pdfgen.encrypt_pdf(
        pdfgen.pdf_from_text("secret words"), "pw", "owner-pw")
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".pdf") as f:
        f.write(enc)
        f.flush()
        r = run_cli("text", f.name, "--password", "pw")
        assert r.returncode == 0 and "secret words" in r.stdout


def test_text_html_and_layout():
    r = run_cli("text", str(GEN / "table_lattice.pdf"),
                "--format", "html")
    assert r.returncode == 0 and "<table>" in r.stdout
    r = run_cli("text", str(GEN / "basic_text.pdf"), "--layout")
    assert r.returncode == 0 and "quick brown fox" in r.stdout
