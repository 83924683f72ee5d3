"""Unit tests for the round-4c operators: deterministic hash split,
WET (extracted-text) sink/source, and the sparse tf-idf cosine
similarity join."""

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# sampling.hash_split


def test_hash_split_deterministic_across_partitioning(spark):
    from pdfplumber_rs_spark.functions.sampling import hash_split

    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = {r.doc_id: (r.bucket, r.split)
         for r in hash_split(df).collect()}
    b = {r.doc_id: (r.bucket, r.split)
         for r in hash_split(df.repartition(13)).collect()}
    assert a == b  # partitioning-independent: pure function of the key


def test_hash_split_same_key_same_split(spark):
    from pdfplumber_rs_spark.functions.sampling import hash_split

    # two "crawls" of the same urls must agree row-for-row
    df = spark.createDataFrame(
        [(f"https://h{i % 5}.com/p{i}",) for i in range(100)] * 2,
        "url string")
    out = hash_split(df, key_col="url").groupBy("url").agg(
        F.count_distinct("split").alias("n"))
    assert out.agg(F.max("n")).first()[0] == 1


def test_hash_split_weight_boundaries(spark):
    from pdfplumber_rs_spark.functions.sampling import hash_split

    rows = hash_split(
        spark.range(0, 5000).withColumnRenamed("id", "doc_id")).collect()
    for r in rows:
        want = ("train" if r.bucket < 9800
                else "val" if r.bucket < 9900 else "test")
        assert r.split == want
    frac = sum(r.split == "train" for r in rows) / len(rows)
    assert 0.96 < frac < 1.0  # ~98% ± hash noise


def test_hash_split_rejects_mismatched_weights(spark):
    from pdfplumber_rs_spark.functions.sampling import hash_split

    with pytest.raises(ValueError):
        hash_split(spark.range(1), weights=(0.5, 0.5),
                   names=("a", "b", "c"))


# ---------------------------------------------------------------------------
# sources.warc WET layout


def _wet_corpus(spark, tmp_path):
    texts = ["plain ascii", "café — ünïcode ≠ bytes", ""]
    rows = [(f"doc://{i}",
             datetime(2024, 1, 1, tzinfo=timezone.utc), t)
            for i, t in enumerate(texts)]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, text string")
    return df, texts


def test_wet_roundtrip_preserves_unicode(spark, tmp_path):
    from pdfplumber_rs_spark.sources.warc import read_wet, write_wet

    df, texts = _wet_corpus(spark, tmp_path)
    out = str(tmp_path / "wet")
    man = write_wet(df.repartition(1), out).collect()
    assert len(man) == 1 and man[0].n_records == 3
    assert man[0].wet_file.endswith(".wet.gz")
    back = {r.url: r.text for r in read_wet(spark, out)
            .filter(F.col("warning").isNull()).collect()}
    assert back == {f"doc://{i}": t for i, t in enumerate(texts)}


def test_wet_sink_skips_null_url(spark, tmp_path):
    from pdfplumber_rs_spark.sources.warc import write_wet

    df = spark.createDataFrame(
        [(None, datetime(2024, 1, 1), "orphan"),
         ("doc://0", datetime(2024, 1, 1), None)],
        "url string, warc_ts timestamp, text string")
    man = write_wet(df.repartition(1), str(tmp_path / "w")).collect()
    assert man[0].n_records == 1 and man[0].n_skipped == 1


def test_read_wet_ignores_response_records(spark, tmp_path):
    # a WARC (response) file read through the WET reader yields no rows:
    # record-type selection, not file extension, drives the parse
    from pdfplumber_rs_spark.sources.warc import build_warc, read_wet

    ts = datetime(2024, 1, 1, tzinfo=timezone.utc)
    p = tmp_path / "mixed.warc"
    p.write_bytes(
        build_warc([("doc://0", ts, b"<html>x</html>")])
        + build_warc([("doc://1", ts, "wet text".encode())],
                     with_http=False, warc_type="conversion",
                     plain_content_type="text/plain"))
    rows = read_wet(spark, str(tmp_path)) \
        .filter(F.col("warning").isNull()).collect()
    assert [(r.url, r.text) for r in rows] == [("doc://1", "wet text")]


# ---------------------------------------------------------------------------
# text.tfidf_pairs


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_tfidf_pairs_identical_docs_sim_one(spark):
    from pdfplumber_rs_spark.functions.text import tfidf_pairs

    df = _docs(spark, [
        (1, "alpha beta gamma delta"),
        (2, "alpha beta gamma delta"),
        (3, "utterly unrelated words here entirely"),
        (4, "other totally different content again"),
    ])
    got = {(r.doc_a, r.doc_b): r.sim
           for r in tfidf_pairs(df, threshold=0.5).collect()}
    assert got == {(1, 2): 1.0}


def test_tfidf_pairs_stop_terms_dropped(spark):
    from pdfplumber_rs_spark.functions.text import tfidf_pairs

    # "the" appears in all 4 docs (df > 0.5·N) — it alone must not
    # make every pair a candidate
    df = _docs(spark, [
        (1, "the apple orchard"), (2, "the apple orchard"),
        (3, "the quantum ledger"), (4, "the velvet moth"),
    ])
    got = {(r.doc_a, r.doc_b)
           for r in tfidf_pairs(df, threshold=0.1).collect()}
    assert got == {(1, 2)}


def test_tfidf_pairs_top_terms_prunes(spark):
    from pdfplumber_rs_spark.functions.text import tfidf_pairs

    # docs share only their LOW-weight terms once top_terms=1 keeps the
    # single heaviest term (tf 3 beats tf 1): no candidate pair survives
    df = _docs(spark, [
        (1, "aa aa aa shared"), (2, "bb bb bb shared"),
        (3, "aa aa aa cc"), (4, "bb bb bb dd"),
    ])
    full = {(r.doc_a, r.doc_b)
            for r in tfidf_pairs(df, threshold=0.01).collect()}
    pruned = {(r.doc_a, r.doc_b)
              for r in tfidf_pairs(df, threshold=0.01,
                                   top_terms=1).collect()}
    assert (1, 2) in full
    assert pruned == {(1, 3), (2, 4)}  # only the heavy aa/bb pairings


# ---------------------------------------------------------------------------
# webclean.html_meta


def _pages(spark, htmls):
    return spark.createDataFrame(
        [(i, h.encode()) for i, h in enumerate(htmls)],
        "doc_id long, html binary")


def test_html_meta_both_attr_orders_and_quotes(spark):
    from pdfplumber_rs_spark.functions.webclean import html_meta

    htmls = [
        '<html lang="en"><head><title>A &amp; B</title>'
        '<meta name="description" content="first desc">'
        '<link rel="canonical" href="https://a.com/x"></head></html>',
        "<html lang='fr'><head><meta content='flipped' "
        "name='description'><meta charset='utf-8'>"
        "<meta property='og:title' content='OGT'></head></html>",
    ]
    rows = {r.doc_id: r for r in html_meta(_pages(spark, htmls)).collect()}
    assert rows[0].title == "A &amp; B"  # escaped exactly as written
    assert rows[0].description == "first desc"
    assert rows[0].canonical == "https://a.com/x"
    assert rows[0].page_lang == "en" and rows[0].charset is None
    assert rows[1].description == "flipped"  # content= before name=
    assert rows[1].og_title == "OGT" and rows[1].charset == "utf-8"
    assert rows[1].page_lang == "fr" and rows[1].title is None


def test_html_meta_absent_fields_are_null(spark):
    from pdfplumber_rs_spark.functions.webclean import html_meta

    (r,) = html_meta(_pages(spark, ["<html><body>x</body></html>"])).collect()
    assert (r.title, r.description, r.og_title, r.canonical,
            r.page_lang, r.charset) == (None,) * 6


# ---------------------------------------------------------------------------
# text.script_detect


def test_script_detect_counts_and_dominant(spark):
    from pdfplumber_rs_spark.functions.text import script_detect

    df = spark.createDataFrame(
        [(1, "hello Привет мир"),     # latin 5, cyrillic 9 → cyrillic
         (2, "漢字かなカナ한글"),        # han 2, kana 4, hangul 2 → kana
         (3, "12345 .,!"),            # no script chars → none
         (4, "abcd Ωμέγα")],          # latin 4, greek 5 → greek
        "doc_id long, text string")
    rows = {r.doc_id: r for r in script_detect(df).collect()}
    assert rows[1].n_cyrillic == 9 and rows[1].dominant == "cyrillic"
    assert (rows[2].n_han, rows[2].n_kana, rows[2].n_hangul) == (2, 4, 2)
    assert rows[2].dominant == "kana"
    assert rows[3].dominant == "none"
    assert rows[4].n_greek == 5 and rows[4].dominant == "greek"


def test_script_detect_tie_breaks_alphabetically(spark):
    from pdfplumber_rs_spark.functions.text import script_detect

    # 2 cyrillic vs 2 latin — tie → 'cyrillic' (alphabetically first)
    (r,) = script_detect(spark.createDataFrame(
        [(1, "ab Пр")], "doc_id long, text string")).collect()
    assert r.n_latin == r.n_cyrillic == 2 and r.dominant == "cyrillic"
