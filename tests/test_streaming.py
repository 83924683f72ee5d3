"""Structured Streaming ingestion: micro-batch extraction via
foreachBatch with checkpointed resume (only NEW files reprocess)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdfplumber_rs_spark.sources import pdfgen
from pdfplumber_rs_spark.streaming import stream_extract


def _drop(spark, path, docs):
    rows = [(url, pdfgen.pdf_from_text(text)) for url, text in docs]
    spark.createDataFrame(rows, "url string, html binary").coalesce(1) \
        .write.mode("append").parquet(path)


def test_stream_extract_and_resume(spark, tmp_path):
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    _drop(spark, inp, [("u1", "alpha one"), ("u2", "beta two\ngamma")])
    q = stream_extract(spark, inp, out, ckpt)
    q.awaitTermination(120)

    got = {r.url: r.text for r in spark.read.parquet(out).collect()}
    assert got == {"u1": "alpha one", "u2": "beta two\ngamma"}

    # second drop: the checkpoint must skip the already-processed file
    _drop(spark, inp, [("u3", "delta")])
    q2 = stream_extract(spark, inp, out, ckpt)
    q2.awaitTermination(120)

    rows = spark.read.parquet(out).collect()
    assert {r.url for r in rows} == {"u1", "u2", "u3"}
    assert len(rows) == 3  # u1/u2 NOT reprocessed (resume semantics)
    assert {r.batch_id for r in rows} == {0, 1}


def test_stream_dedup_stateful(spark, tmp_path):
    """dropDuplicatesWithinWatermark: first occurrence per key emitted,
    duplicates suppressed across micro-batches while state is live."""
    import datetime as dt

    from pdfplumber_rs_spark.streaming import stream_dedup

    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    base = dt.datetime(2026, 1, 1)
    rows = [
        (1, base, 10, "click", 1.0, None),
        (2, base + dt.timedelta(minutes=5), 10, "click", 2.0, None),  # dup key
        (3, base + dt.timedelta(minutes=9), 11, "view", 3.0, None),
        (4, base + dt.timedelta(minutes=11), 10, "view", 4.0, None),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.parquet(inp)
    q = stream_dedup(spark, inp, out, ckpt, keys=["user_id", "event_type"],
                     watermark="365 days")
    q.awaitTermination(120)
    got = sorted((r.user_id, r.event_type)
                 for r in spark.read.parquet(out).collect())
    assert got == [(10, "click"), (10, "view"), (11, "view")]


def test_stream_sessionize_state_spans_batches(spark, tmp_path):
    """applyInPandasWithState sessionizer: a session whose events are
    split across two micro-batch files must come out as ONE session
    (state carries the open session across batches); each user's final
    open session is withheld."""
    import datetime as dt

    from pdfplumber_rs_spark.streaming import stream_sessionize

    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    t0 = dt.datetime(2024, 1, 1)

    def ev(eid, minutes, uid):
        return (eid, t0 + dt.timedelta(minutes=minutes), uid, "click",
                1.0, "{}")

    schema = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    # batch 1: user 1 session A starts (2 events, 10 min apart)
    spark.createDataFrame([ev(0, 0, 1), ev(1, 10, 1)], schema) \
        .coalesce(1).write.mode("append").parquet(inp)
    # batch 2: session A CONTINUES (gap 20 min < 30), then a >30 min gap
    # opens session B, which stays open (never emitted)
    spark.createDataFrame([ev(2, 30, 1), ev(3, 120, 1)], schema) \
        .coalesce(1).write.mode("append").parquet(inp)

    q = stream_sessionize(spark, inp, out, ckpt)
    q.awaitTermination(120)

    rows = spark.read.parquet(out).collect()
    assert len(rows) == 1, rows  # one closed session, open tail withheld
    r = rows[0]
    assert r.user_id == 1 and r.n_events == 3  # events 0,1,2 merged
    assert (r.end_us - r.start_us) == 30 * 60 * 1_000_000


def test_stream_dedup_against_store(spark, tmp_path):
    """Recrawl ingestion: content already ingested by an EARLIER drain
    (present in the fingerprint store) must not re-enter the corpus —
    cross-run dedup, not just within-stream state."""
    from pdfplumber_rs_spark.streaming import stream_dedup_against_store

    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    store = str(tmp_path / "store")
    ck = str(tmp_path / "ck")

    rows1 = [("u1", b"alpha content"), ("u2", b"beta content"),
             ("u3", b"alpha content")]  # within-batch dup of u1
    spark.createDataFrame(rows1, "url string, html binary").coalesce(1) \
        .write.mode("append").parquet(inp)
    q = stream_dedup_against_store(spark, inp, out, store, ck)
    q.awaitTermination(120)

    got1 = spark.read.parquet(out)
    assert got1.count() == 2  # u3 deduped within batch
    assert got1.select("fp").distinct().count() == 2

    # second drop: one recrawl of old content, one genuinely new doc
    rows2 = [("u1-recrawl", b"alpha content"), ("u4", b"gamma content")]
    spark.createDataFrame(rows2, "url string, html binary").coalesce(1) \
        .write.mode("append").parquet(inp)
    q = stream_dedup_against_store(spark, inp, out, store, ck)
    q.awaitTermination(120)

    got2 = spark.read.parquet(out)
    assert got2.count() == 3  # only gamma joined the corpus
    urls = {r.url for r in got2.collect()}
    assert "u4" in urls and "u1-recrawl" not in urls
    # the store now carries exactly the three distinct fingerprints
    assert spark.read.parquet(store).distinct().count() == 3
