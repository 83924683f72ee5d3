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
