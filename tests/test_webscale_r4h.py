"""Round-4h operators: paragraph dedup, char entropy, HTML outline."""

import hashlib

import pytest


# ---------------------------------------------------------------------------
# dedup.paragraph_dedup


def test_paragraph_dedup_strips_repeated_boilerplate(spark):
    from pdfplumber_rs_spark.functions.dedup import paragraph_dedup

    boiler = "subscribe to our newsletter"
    docs = [
        (1, f"first article body\n\n{boiler}\n\nmore first text"),
        (2, f"second article body\n\n{boiler}"),
        (3, boiler),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.doc_id: r for r in paragraph_dedup(df).collect()}
    assert (out[1].n_paras, out[1].n_kept) == (3, 3)   # first owns boiler
    assert (out[2].n_paras, out[2].n_kept) == (2, 1)
    assert out[2].kept_md5 == hashlib.md5(
        b"second article body").hexdigest()
    assert (out[3].n_paras, out[3].n_kept) == (1, 0)
    assert out[3].kept_md5 == ""


def test_paragraph_dedup_trims_and_skips_blank_blocks(spark):
    from pdfplumber_rs_spark.functions.dedup import paragraph_dedup

    df = spark.createDataFrame(
        [(1, "  a  \n\n\n\n  \n\nb")], "doc_id long, text string")
    (r,) = paragraph_dedup(df).collect()
    # "  a  " and "b"; the whitespace-only block between them drops
    assert r.n_paras == 2 and r.n_kept == 2
    assert r.kept_md5 == hashlib.md5(b"a\n\nb").hexdigest()


# ---------------------------------------------------------------------------
# text.char_entropy


def test_char_entropy_bands(spark):
    from pdfplumber_rs_spark.functions.text import char_entropy

    df = spark.createDataFrame(
        [(1, "aaaaaaaa"),              # 0 bits
         (2, "abababab"),              # exactly 1 bit
         (3, "abcdefgh")],             # 3 bits (8 uniform symbols)
        "doc_id long, text string")
    out = {r.doc_id: r for r in char_entropy(df).collect()}
    assert out[1].entropy == 0.0 and out[1].n_chars == 8
    assert out[2].entropy == 1.0
    assert out[3].entropy == 3.0


def test_char_entropy_case_folded(spark):
    from pdfplumber_rs_spark.functions.text import char_entropy

    a = {r.doc_id: r.entropy for r in char_entropy(
        spark.createDataFrame([(1, "AbAb"), (2, "abab")],
                              "doc_id long, text string")).collect()}
    assert a[1] == a[2]


# ---------------------------------------------------------------------------
# webclean.html_outline


def test_html_outline_mixed_levels_in_order(spark):
    from pdfplumber_rs_spark.functions.webclean import html_outline

    page = (b"<html><body><h1 class='t'>Top</h1><p>x</p>"
            b"<h2>Sec <b>One</b></h2><h3>Deep</h3><h2>Sec Two</h2>"
            b"</body></html>")
    df = spark.createDataFrame([(1, page)], "doc_id long, html binary")
    rows = sorted(html_outline(df).collect(), key=lambda r: r.rank)
    assert [(r.rank, r.level, r.heading) for r in rows] == [
        (1, 1, "Top"), (2, 2, "Sec One"), (3, 3, "Deep"), (4, 2, "Sec Two")]


def test_html_outline_empty_page(spark):
    from pdfplumber_rs_spark.functions.webclean import html_outline

    df = spark.createDataFrame([(1, b"<html><p>no headings</p></html>")],
                               "doc_id long, html binary")
    assert html_outline(df).collect() == []
