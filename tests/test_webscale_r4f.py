"""Round-4f operators: meta-robots directives, incremental crawl
diff, KL corpus-drift contributions."""

import pytest


# ---------------------------------------------------------------------------
# webclean.meta_robots


def _pages(spark, htmls):
    return spark.createDataFrame(
        [(i, h.encode()) for i, h in enumerate(htmls)],
        "doc_id long, html binary")


def test_meta_robots_directives(spark):
    from pdfplumber_rs_spark.functions.webclean import meta_robots

    htmls = [
        '<html><head><meta name="robots" content="noindex,nofollow">',
        "<html><head><meta content=' NOFOLLOW ' name='robots'>",  # flipped
        '<html><head><meta name="robots" content="index, follow">',
        "<html><head><title>no robots tag</title>",
        '<html><head><meta name="robots" content="nofollowme">',  # substring
    ]
    rows = {r.doc_id: r for r in meta_robots(_pages(spark, htmls)).collect()}
    assert (rows[0].noindex, rows[0].nofollow) == (True, True)
    assert (rows[1].noindex, rows[1].nofollow) == (False, True)
    assert (rows[2].noindex, rows[2].nofollow) == (False, False)
    assert (rows[3].noindex, rows[3].nofollow) == (False, False)
    assert (rows[4].noindex, rows[4].nofollow) == (False, False)


# ---------------------------------------------------------------------------
# webclean.crawl_diff


def test_crawl_diff_classifies(spark):
    from pdfplumber_rs_spark.functions.webclean import crawl_diff

    old = spark.createDataFrame(
        [("a", "h1"), ("b", "h2"), ("c", "h3")], "url string, digest string")
    new = spark.createDataFrame(
        [("a", "h1"), ("b", "h2x"), ("d", "h4")], "url string, digest string")
    rows = {r.url: r for r in crawl_diff(old, new).collect()}
    assert set(rows) == {"b", "c", "d"}          # 'a' unchanged → omitted
    assert rows["b"].status == "changed"
    assert rows["b"].old_digest == "h2" and rows["b"].new_digest == "h2x"
    assert rows["c"].status == "removed" and rows["c"].new_digest is None
    assert rows["d"].status == "added" and rows["d"].old_digest is None


# ---------------------------------------------------------------------------
# text.kl_drift


def test_kl_drift_surfaces_slice_a_tokens(spark):
    from pdfplumber_rs_spark.functions.text import kl_drift

    a = spark.createDataFrame(
        [(1, "spam spam spam spam common"), (2, "spam spam common")],
        "doc_id long, text string")
    b = spark.createDataFrame(
        [(3, "common words only here"), (4, "common words again")],
        "doc_id long, text string")
    rows = kl_drift(a, b, top_n=3).collect()
    assert rows[0].tok == "spam"                 # dominant drift token
    assert rows[0].cnt_a == 6 and rows[0].cnt_b == 0
    assert all(r.contrib > 0 for r in rows)
    assert [r.contrib for r in rows] == sorted(
        (r.contrib for r in rows), reverse=True)


def test_kl_drift_identical_slices_have_no_positive_drift(spark):
    from pdfplumber_rs_spark.functions.text import kl_drift

    a = spark.createDataFrame([(1, "same words here")],
                              "doc_id long, text string")
    assert kl_drift(a, a, top_n=5).collect() == []
