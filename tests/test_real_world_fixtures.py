"""Parity for the reference's un-goldened fixture PDFs.

The reference ships 12 `tests/fixtures/real-world/` PDFs whose expected
behavior is pinned by assertions in
`crates/pdfplumber/tests/real_world_integration.rs` (US-091) rather than
by pdfplumber golden JSONs. pdfplumber itself is not installed in this
container, so these ported assertions ARE the golden for those files:
every expected value below is copied from the reference test (file:line
cited per test), coordinate tolerance 2.0 like its COORD_TOLERANCE.
"""

from __future__ import annotations

from pathlib import Path

import pytest

from pdfplumber_rs_spark.config import DedupeOptions, ExtractOptions
from pdfplumber_rs_spark.kernel.document import Document, extract_document

RW = Path("/root/reference/tests/fixtures/real-world")
TOL = 2.0  # real_world_integration.rs:17 COORD_TOLERANCE

pytestmark = pytest.mark.skipif(not RW.exists(), reason="reference absent")


def _page(category: str, name: str, options: ExtractOptions | None = None):
    doc = Document((RW / category / name).read_bytes(), options)
    return doc.page(0)


def _text(page) -> str:
    from pdfplumber_rs_spark.kernel.layout import extract_text_from_words

    return extract_text_from_words(page.extract_words(), None)


# ---- fonts-encoding (real_world_integration.rs:514-670) ----------------


def test_standard_14_fonts():
    page = _page("fonts-encoding", "standard-14-fonts.pdf")
    fontnames = {c["fontname"] for c in page.chars}
    assert len(fontnames) >= 3
    assert any("Helvetica" in f for f in fontnames)
    assert any("Courier" in f for f in fontnames)
    assert any("Times" in f for f in fontnames)
    text = _text(page)
    for needle in ("Helvetica", "Courier", "Times"):
        assert needle in text
    words = {w["text"] for w in page.extract_words()}
    assert "Helvetica" in words and "Courier" in words
    for c in page.chars:
        assert c["x0"] < c["x1"] and c["top"] < c["bottom"]


def test_special_characters():
    page = _page("fonts-encoding", "special-characters.pdf")
    text = _text(page)
    assert "(hello)" in text
    assert "path\\to\\file" in text
    assert "©" in text or "Copyright" in text  # octal \251
    assert "&" in text


# ---- layout (real_world_integration.rs:672-840) ------------------------


def test_multi_font_sizes():
    page = _page("layout", "multi-font-sizes.pdf")
    sizes = {round(c["size"], 1) for c in page.chars if c["text"].strip()}
    assert len(sizes) >= 3  # 24, 12, 8
    d_char = next(c for c in page.chars if c["text"] == "D")
    assert abs(d_char["size"] - 24.0) < TOL
    assert "body text" in _text(page)
    assert any(7.0 < c["size"] < 9.0 for c in page.chars)  # footnote 8pt
    words = {w["text"] for w in page.extract_words()}
    assert "Document" in words and "Title" in words


def test_positioned_text():
    page = _page("layout", "positioned-text.pdf")
    text = _text(page)
    for corner in ("TopLeft", "TopRight", "BottomLeft", "BottomRight",
                   "Center"):
        assert corner in text
    words = {w["text"]: w for w in page.extract_words()}
    tl = words["TopLeft"]
    assert abs(tl["x0"] - 72.0) < TOL and tl["top"] < 100.0
    br = words["BottomRight"]
    assert br["x0"] > 400.0 and br["top"] > 700.0
    for c in page.chars:  # rs:1360-1378 float sanity
        for k in ("x0", "top", "x1", "bottom", "size"):
            assert c[k] == c[k] and abs(c[k]) != float("inf")


# ---- tables (real_world_integration.rs:842-980) ------------------------


def test_simple_bordered_table():
    page = _page("tables", "simple-bordered-table.pdf")
    tables = page.find_tables(None)
    assert tables, "lattice strategy should detect the bordered table"
    rows = tables[0]["rows"]
    assert len(rows) == 3 and len(rows[0]) == 3
    header = [c.get("text") or "" for c in rows[0]]
    assert any("Name" in h for h in header)
    for row in rows[1:]:
        assert any(c.get("text") for c in row), "data rows need content"
    text = _text(page)
    for needle in ("Name", "Width", "100", "mm"):
        assert needle in text


def test_multi_row_table():
    page = _page("tables", "multi-row-table.pdf")
    tables = page.find_tables(None)
    assert tables
    assert len(tables[0]["rows"]) == 5  # 1 header + 4 data
    text = _text(page)
    for fruit in ("Apple", "Banana", "Cherry", "Date"):
        assert fruit in text


# ---- images (real_world_integration.rs:982-1140) -----------------------


def test_xobject_image():
    page = _page("images", "xobject-image.pdf")
    imgs = page.images
    assert len(imgs) == 1
    img = imgs[0]
    assert img["name"] == "Im0"
    # CTM 200 0 0 150 100 400 cm → w=200 h=150, x0=100 top=792-400-150
    assert abs((img["x1"] - img["x0"]) - 200.0) < TOL
    assert abs((img["bottom"] - img["top"]) - 150.0) < TOL
    assert abs(img["x0"] - 100.0) < TOL and abs(img["top"] - 242.0) < TOL
    assert img["src_width"] == 4 and img["src_height"] == 4
    assert img["bits_per_component"] == 8
    assert img["colorspace"] == "DeviceRGB"
    assert img["data"] is None  # XObject data not extracted by default
    assert "image" in _text(page)


def test_inline_image():
    page = _page("images", "inline-image.pdf")
    imgs = page.images
    assert imgs and imgs[0]["name"].startswith("inline-")
    img = imgs[0]
    assert img["x1"] > img["x0"] and img["bottom"] > img["top"]
    assert "inline image" in _text(page)


# ---- edge-cases (real_world_integration.rs:1142-1290) ------------------


def test_empty_page():
    page = _page("edge-cases", "empty-page.pdf")
    assert page.chars == []
    assert page.extract_words() == []
    assert page.find_tables(None) == []
    assert _text(page).strip() == ""


def test_single_char():
    page = _page("edge-cases", "single-char.pdf")
    assert len(page.chars) == 1 and page.chars[0]["text"] == "X"
    words = page.extract_words()
    assert len(words) == 1 and words[0]["text"] == "X"
    ch = page.chars[0]
    assert abs(ch["x0"] - 300.0) < TOL
    assert 370.0 < ch["top"] < 400.0  # 792-400-12 ≈ 380


def test_whitespace_only():
    page = _page("edge-cases", "whitespace-only.pdf")
    assert _text(page).strip() == ""


def test_overlapping_text_dedup():
    no_dedup = ExtractOptions(dedupe=None)
    page = _page("edge-cases", "overlapping-text.pdf", no_dedup)
    assert len(page.chars) == 8  # "BOLD" twice, dedup off
    page = _page("edge-cases", "overlapping-text.pdf",
                 ExtractOptions(dedupe=DedupeOptions()))
    assert len(page.chars) <= 4  # auto-dedup collapses the overlap


# ---- whole-corpus crash-free sweep over every reference PDF ------------


def test_all_reference_pdfs_crash_free():
    """Every PDF anywhere in the reference tree must produce a result
    row (possibly an error row), never an exception — the un-goldened
    36 included (downloaded/, anytomd inputs, oss-fuzz extras)."""
    ref = Path("/root/reference")
    n = 0
    for pdf_path in sorted(ref.rglob("*.pdf")):
        res = extract_document(pdf_path.read_bytes())
        assert isinstance(res, dict) and "error" in res, pdf_path
        n += 1
    assert n >= 130, f"expected the full fixture corpus, saw {n}"


# ---- regression pins for PDFs whose goldens are absent from the -------
# reference snapshot (cross_validation.rs references golden JSONs for
# these six files that do not exist under fixtures/golden in this copy,
# and pdfplumber is not installable here). These values were produced
# by THIS kernel and are regression pins, not an independent oracle:
# they lock parsing behavior (page counts, char volume, distinctive
# leading text) against future kernel changes.

PINNED = Path("/root/reference/crates/pdfplumber/tests/fixtures/pdfs")

_PINS = [
    # (file, n_pages, n_chars, leading text)
    ("WARN-Report-for-7-1-2015-to-03-25-2016.pdf", 16, 77500,
     "WARN Report*\nSummary by Received Date"),
    ("chelsea_pdta.pdf", 65, 83807,
     "Plan directeur de transport actif"),
    ("federal-register-2020-17221.pdf", 15, 58251,
     "47698\nProposed Rules\nFederal Register"),
    ("issue-316-example.pdf", 17, 41202,
     "Thecurrentissueandfulltextarchiveofthisjournalisavailableat"),
    ("issue-71-duplicate-chars-2.pdf", 20, 38975,
     "Chapitre 5\nItem 265"),
    ("issue-982-example.pdf", 8, 24454,
     "1\nCreativity in Machine Learning"),
]


@pytest.mark.parametrize("fname,n_pages,n_chars,head",
                         _PINS, ids=[p[0] for p in _PINS])
def test_ungoldened_pdf_regression_pins(fname, n_pages, n_chars, head):
    res = extract_document((PINNED / fname).read_bytes())
    assert res["error"] is None
    assert res["n_pages"] == n_pages
    assert sum(len(pg["chars"]) for pg in res["pages"]) == n_chars
    assert (res["text"] or "").startswith(head)


def test_password_example_decrypts_with_password():
    """password-example.pdf (RC4): unreadable without the password,
    full text with it — the remaining un-goldened fixture."""
    data = (PINNED / "password-example.pdf").read_bytes()
    plain = extract_document(data)
    assert plain["error"] is None
    assert sum(len(pg["chars"]) for pg in plain["pages"]) == 0
    dec = extract_document(data, ExtractOptions(password="test"))
    assert dec["error"] is None
    assert sum(len(pg["chars"]) for pg in dec["pages"]) == 4568
    assert (dec["text"] or "").startswith(
        "Backup4all –backup solution for network environments")
