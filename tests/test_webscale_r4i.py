"""Round-4i operators: host template detection, crawl-trap scoring,
JL sparse projection, int8 embedding quantization."""

import hashlib

import pytest


# ---------------------------------------------------------------------------
# webclean.host_template_ratio


def test_host_template_ratio(spark):
    from pdfplumber_rs_spark.functions.webclean import host_template_ratio

    rows = [
        ("a.com", 1, "unique one\nshared footer"),
        ("a.com", 2, "unique two\nshared footer"),
        ("a.com", 3, "unique three\nshared footer"),
        ("b.com", 4, "alpha\nbeta"),
        ("b.com", 5, "gamma\ndelta"),
    ]
    df = spark.createDataFrame(rows, "host string, doc_id long, text string")
    out = {r.host: r for r in host_template_ratio(df).collect()}
    assert out["a.com"].n_docs == 3
    assert out["a.com"].top_line_docs == 3
    assert out["a.com"].template_ratio == 1.0
    assert out["b.com"].top_line_docs == 1
    assert out["b.com"].template_ratio == 0.5


def test_host_template_ratio_duplicate_lines_within_doc_count_once(spark):
    from pdfplumber_rs_spark.functions.webclean import host_template_ratio

    df = spark.createDataFrame(
        [("a.com", 1, "x\nx\nx"), ("a.com", 2, "y")],
        "host string, doc_id long, text string")
    (r,) = host_template_ratio(df).collect()
    assert r.top_line_docs == 1  # 'x' appears in ONE doc, thrice


# ---------------------------------------------------------------------------
# webclean.url_trap_score


def test_url_trap_score(spark):
    from pdfplumber_rs_spark.functions.webclean import url_trap_score

    rows = ([("trap.com", f"https://trap.com/item?session={i}")
             for i in range(10)]
            + [("clean.com", f"https://clean.com/p/{i}") for i in range(4)])
    df = spark.createDataFrame(rows, "host string, url string")
    out = {r.host: r for r in url_trap_score(df).collect()}
    assert out["trap.com"].n_urls == 10
    assert out["trap.com"].n_resources == 1
    assert out["trap.com"].trap_score == 0.9
    assert out["clean.com"].trap_score == 0.0


# ---------------------------------------------------------------------------
# similarity.jl_project


def _sign(plane, d):
    h = hashlib.md5(f"p:{plane}:{d}".encode()).hexdigest()[:8]
    return 1.0 if int(h, 16) % 2 == 0 else -1.0


def test_jl_project_matches_manual_matrix(spark):
    from pdfplumber_rs_spark.functions.similarity import jl_project

    vec = [1.0, 2.0, 3.0, 4.0]
    df = spark.createDataFrame([(7, vec)],
                               "vec_id long, embedding array<float>")
    (r,) = jl_project(df, dim=4, out_dim=2).collect()
    for j in range(2):
        expected = sum(v * _sign(j, d) for d, v in enumerate(vec)) / 2 ** 0.5
        assert r.proj[j] == pytest.approx(round(expected, 6), abs=1e-9)


# ---------------------------------------------------------------------------
# similarity.quantize_embeddings


def test_quantize_embeddings_global_minmax(spark):
    from pdfplumber_rs_spark.functions.similarity import quantize_embeddings

    df = spark.createDataFrame(
        [(1, [0.0, 10.0]), (2, [1.0, 10.0]), (3, [2.0, 10.0])],
        "vec_id long, embedding array<float>")
    out = {r.vec_id: r.q for r in quantize_embeddings(df, dim=2).collect()}
    # dim 0 spans [0, 2] → 0, 128 (127.5 rounds half-even? round() → 128)
    assert out[1][0] == 0 and out[3][0] == 255
    assert out[2][0] in (127, 128)  # 127.5 — engine rounding mode
    # dim 1 is degenerate (max == min) → 0
    assert [out[i][1] for i in (1, 2, 3)] == [0, 0, 0]


# ---------------------------------------------------------------------------
# classify.quality_report


def test_quality_report_reasons(spark):
    from pdfplumber_rs_spark.functions.classify import quality_report

    good = ("the quick brown fox jumps over the lazy dog and then "
            "the fox naps under the old oak tree for a long while today")
    df = spark.createDataFrame(
        [(1, good, "en"),
         (2, "short text", "en"),          # too_short (+low_stopword)
         (3, good, "de"),                  # lang_mismatch
         (4, "aa " * 30 + "the and of", "en")],  # bad_mean_len (mean 2ish)
        "doc_id long, text string, lang string")
    out = {r.doc_id: r for r in quality_report(df).collect()}
    assert out[1].kept and out[1].reasons == ""
    assert not out[2].kept and "too_short" in out[2].reasons
    assert out[3].reasons == "lang_mismatch"
    assert "bad_mean_len" in out[4].reasons
    # reasons are sorted
    for r in out.values():
        parts = r.reasons.split(",") if r.reasons else []
        assert parts == sorted(parts) and r.n_reasons == len(parts)


# ---------------------------------------------------------------------------
# text.compression_ratio


def test_compression_ratio(spark):
    from pdfplumber_rs_spark.functions.text import compression_ratio

    df = spark.createDataFrame(
        [(1, "hello world"),     # 11 bytes, 2 tokens
         (2, "héllo"),           # 6 bytes (é = 2), tokens: 'h','é'?…
         (3, "")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in compression_ratio(df).collect()}
    assert out[1].n_bytes == 11 and out[1].n_bpe_tokens == 2
    assert out[1].bytes_per_token == 5.5
    assert out[2].n_bytes == 6
    assert out[3].n_bytes == 0 and out[3].bytes_per_token == 0.0


# ---------------------------------------------------------------------------
# text.winnow_pairs


def test_winnow_pairs_detects_shared_span(spark):
    from pdfplumber_rs_spark.functions.text import winnow_pairs

    shared = "the quick brown fox jumps over the lazy sleeping dog again"
    df = spark.createDataFrame(
        [(1, shared + " plus completely unrelated trailing content here"),
         (2, "different opening words then " + shared),
         (3, "nothing in common with either of those two documents")],
        "doc_id long, text string")
    rows = {(r.id_a, r.id_b): r.n_shared
            for r in winnow_pairs(df, min_shared=3).collect()}
    assert (1, 2) in rows and rows[(1, 2)] >= 3
    assert all(3 not in pair for pair in rows)


def test_winnow_pairs_max_df_drops_boilerplate(spark):
    from pdfplumber_rs_spark.functions.text import winnow_pairs

    boiler = "identical boilerplate sentence shared by every document"
    df = spark.createDataFrame(
        [(i, boiler) for i in range(5)], "doc_id long, text string")
    # every fp has df=5 > max_df=3 → no pairs at all
    assert winnow_pairs(df, min_shared=1, max_df=3).collect() == []
    # raising the cap brings the pairs back
    assert len(winnow_pairs(df, min_shared=1, max_df=5).collect()) == 10


# ---------------------------------------------------------------------------
# webclean.consistent_shard


def test_consistent_shard_stability_under_growth(spark):
    from pdfplumber_rs_spark.functions.webclean import consistent_shard

    hosts = spark.createDataFrame(
        [(f"host{i}.example.com",) for i in range(200)], "host string")
    a = {r.host: r.shard
         for r in consistent_shard(hosts, n_shards=8).collect()}
    b = {r.host: r.shard
         for r in consistent_shard(hosts, n_shards=9).collect()}
    assert all(0 <= s < 8 for s in a.values())
    moved = sum(1 for h in a if a[h] != b[h])
    # consistent hashing: roughly 1/9 of keys move, never a wholesale
    # remap (plain mod-N would move ~8/9)
    assert moved < 200 * 0.35
    # deterministic across runs
    again = {r.host: r.shard
             for r in consistent_shard(hosts, n_shards=8).collect()}
    assert again == a


def test_consistent_shard_spreads_load(spark):
    from pdfplumber_rs_spark.functions.webclean import consistent_shard

    hosts = spark.createDataFrame(
        [(f"h{i}.org",) for i in range(400)], "host string")
    counts = {}
    for r in consistent_shard(hosts, n_shards=4, replicas=32).collect():
        counts[r.shard] = counts.get(r.shard, 0) + 1
    assert set(counts) == {0, 1, 2, 3}
    assert max(counts.values()) < 400 * 0.6  # no shard hogs the ring


# ---------------------------------------------------------------------------
# joins.apply_changelog


def test_apply_changelog_merge(spark):
    from pdfplumber_rs_spark.functions.joins import apply_changelog

    base = spark.createDataFrame(
        [("a", "v0"), ("b", "v0"), ("c", "v0")], "url string, val string")
    changes = spark.createDataFrame(
        [("a", 1, "U", "v1"), ("a", 2, "U", "v2"),     # latest upsert wins
         ("b", 1, "D", None),                          # deleted
         ("d", 1, "U", "new"),                         # insert
         ("e", 1, "U", "x"), ("e", 2, "D", None)],     # insert then delete
        "url string, ts long, op string, val string")
    out = {r.url: r.val for r in apply_changelog(base, changes).collect()}
    assert out == {"a": "v2", "c": "v0", "d": "new"}


def test_apply_changelog_tie_upsert_wins(spark):
    from pdfplumber_rs_spark.functions.joins import apply_changelog

    base = spark.createDataFrame([("a", "v0")], "url string, val string")
    changes = spark.createDataFrame(
        [("a", 5, "D", None), ("a", 5, "U", "v5")],
        "url string, ts long, op string, val string")
    out = {r.url: r.val for r in apply_changelog(base, changes).collect()}
    assert out == {"a": "v5"}


# ---------------------------------------------------------------------------
# text.corpus_datasheet


def test_corpus_datasheet(spark):
    from pdfplumber_rs_spark.functions.text import corpus_datasheet

    df = spark.createDataFrame(
        [(1, "a b c", "en"), (2, "d e", "en"), (3, "f g h i", "de")],
        "doc_id long, text string, lang string")
    out = {r.lang: r for r in corpus_datasheet(df).collect()}
    en, de = out["en"], out["de"]
    assert (en.n_docs, en.n_tokens, en.min_tokens, en.max_tokens) == (2, 5, 2, 3)
    assert en.avg_tokens == 2.5
    assert en.token_share == pytest.approx(5 / 9, abs=1e-6)
    assert de.n_docs == 1 and de.token_share == pytest.approx(4 / 9, abs=1e-6)


# ---------------------------------------------------------------------------
# text.bm25_batch


def test_bm25_batch_matches_single_query_op(spark):
    from pdfplumber_rs_spark.functions.text import bm25_batch, bm25_topk

    docs = spark.createDataFrame(
        [(1, "spark shuffle join window"), (2, "spark spark spark scan"),
         (3, "window window batch"), (4, "unrelated words entirely")],
        "doc_id long, text string")
    queries = spark.createDataFrame(
        [(0, "spark window"), (1, "batch scan")],
        "query_id long, query_text string")
    batch = {(r.query_id, r.rank): (r.doc_id, r.score)
             for r in bm25_batch(docs, queries, topk=3).collect()}
    single = [(r.doc_id, r.score)
              for r in bm25_topk(docs, ["spark", "window"], topk=3).collect()]
    got = [batch[(0, i + 1)] for i in range(len(single))]
    assert got == single  # batch q0 ≡ the single-query operator
    assert batch[(1, 1)][0] in (2, 3)  # batch/scan docs lead q1


def test_bm25_batch_queries_are_independent(spark):
    from pdfplumber_rs_spark.functions.text import bm25_batch

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], "doc_id long, text string")
    queries = spark.createDataFrame(
        [(0, "alpha"), (1, "gamma")], "query_id long, query_text string")
    out = {(r.query_id, r.doc_id) for r in
           bm25_batch(docs, queries).collect()}
    assert out == {(0, 1), (1, 2)}  # no cross-query bleed


# ---------------------------------------------------------------------------
# text.host_dup_rate


def test_host_dup_rate_counts_cross_host_dups(spark):
    from pdfplumber_rs_spark.functions.text import host_dup_rate

    rows = [
        ("a.com", 1, "Same   content"),
        ("a.com", 2, "same content"),       # dup of 1 (normalized)
        ("a.com", 3, "original one"),
        ("b.com", 4, "same\tcontent"),      # cross-host dup
        ("b.com", 5, "another original"),
    ]
    df = spark.createDataFrame(rows, "host string, doc_id long, text string")
    out = {r.host: r for r in host_dup_rate(df).collect()}
    assert out["a.com"].n_docs == 3 and out["a.com"].n_dup_docs == 2
    assert out["a.com"].dup_rate == pytest.approx(2 / 3, abs=1e-6)
    assert out["b.com"].n_dup_docs == 1 and out["b.com"].dup_rate == 0.5


# ---------------------------------------------------------------------------
# text.flesch_kincaid


def test_flesch_kincaid(spark):
    from pdfplumber_rs_spark.functions.text import flesch_kincaid

    df = spark.createDataFrame(
        [(1, "The cat sat. The dog ran!"),
         (2, "")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in flesch_kincaid(df).collect()}
    r = out[1]
    # words=6, sentences=2, vowel groups: e,a,a,e,o,a = 6 → syll 6
    assert (r.n_words, r.n_sentences, r.n_syllables) == (6, 2, 6)
    expected = round(0.39 * 3 + 11.8 * 1 - 15.59, 6)
    assert r.fk_grade == pytest.approx(expected, abs=1e-6)
    assert out[2].fk_grade is None and out[2].n_words == 0


# ---------------------------------------------------------------------------
# text.pmi_collocations


def test_pmi_surfaces_fixed_phrase(spark):
    import math

    from pdfplumber_rs_spark.functions.text import pmi_collocations

    # 'new york' always adjacent; filler words pair randomly
    docs = [(i, "new york " + " ".join(
        ["w%d x%d" % (i % 3, (i + j) % 4) for j in range(4)]))
        for i in range(20)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = pmi_collocations(df, min_count=5, top_n=10).collect()
    top = rows[0]
    assert (top.tok_a, top.tok_b) == ("new", "york")
    assert top.c_ab == 20
    # hand-check the pmi value: T tokens, B bigrams, c_a=c_b=20
    T = 20 * 10.0
    B = 20 * 9.0
    expected = round(math.log((20 / B) / ((20 / T) * (20 / T))), 6)
    assert top.pmi == pytest.approx(expected, abs=1e-6)


def test_pmi_min_count_filters(spark):
    from pdfplumber_rs_spark.functions.text import pmi_collocations

    df = spark.createDataFrame(
        [(1, "rare pair here"), (2, "other words")],
        "doc_id long, text string")
    assert pmi_collocations(df, min_count=2).collect() == []


# ---------------------------------------------------------------------------
# text.tokenizer_fertility


def test_tokenizer_fertility(spark):
    from pdfplumber_rs_spark.functions.text import tokenizer_fertility

    df = spark.createDataFrame(
        [(1, "hello world", "en"),      # 11 bytes, 2 tokens
         (2, "abc", "en"),              # 3 bytes, 1 token
         (3, "héllo", "fr")],           # 6 bytes
        "doc_id long, text string, lang string")
    out = {r.lang: r for r in tokenizer_fertility(df).collect()}
    en = out["en"]
    assert (en.n_docs, en.n_bytes, en.n_bpe_tokens) == (2, 14, 3)
    assert en.bytes_per_token == pytest.approx(14 / 3, abs=1e-6)
    assert out["fr"].n_bytes == 6
