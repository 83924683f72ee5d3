"""WARC source connector: Common-Crawl layout round-trip and lenient
parsing of malformed files."""

from __future__ import annotations

from datetime import datetime, timezone

from pdfplumber_rs_spark.sources.warc import build_warc, parse_warc, read_warc

TS = datetime(2024, 5, 6, 7, 8, 9, tzinfo=timezone.utc)
RECS = [("http://a.example/x", TS, b"<html>alpha</html>"),
        ("http://b.example/y", TS, "<html>été</html>".encode())]


def test_parse_roundtrip_plain_and_gzip():
    for gz in (False, True):
        rows = parse_warc(build_warc(RECS, gzip_per_record=gz), "t.warc")
        assert [r["url"] for r in rows] == [u for u, _, _ in RECS]
        assert rows[0]["html"] == RECS[0][2]
        assert rows[1]["html"] == RECS[1][2]
        assert all(r["warning"] is None for r in rows)
        assert rows[0]["warc_ts"] == TS


def test_parse_without_http_envelope():
    rows = parse_warc(build_warc(RECS, with_http=False), "t.warc")
    assert rows[0]["html"] == RECS[0][2]


def test_parse_lenient_on_malformed():
    # truncation mid-record -> warning row, no exception
    data = build_warc(RECS)
    rows = parse_warc(data[:60], "t")
    assert any(r["warning"] for r in rows)
    # garbage prefix, then a valid record: parser resynchronizes
    rows = parse_warc(b"NOISE" + data, "t")
    good = [r for r in rows if r["warning"] is None]
    assert [r["url"] for r in good] == [u for u, _, _ in RECS]
    # pure garbage
    rows = parse_warc(b"\x00\x01\x02", "t")
    assert rows and rows[0]["warning"]


def test_read_warc_spark(spark, tmp_path):
    (tmp_path / "a.warc.gz").write_bytes(
        build_warc(RECS[:1], gzip_per_record=True))
    (tmp_path / "b.warc").write_bytes(build_warc(RECS[1:]))
    got = {r.url: r for r in read_warc(spark, str(tmp_path)).collect()}
    assert set(got) == {u for u, _, _ in RECS}
    assert bytes(got["http://a.example/x"].html) == RECS[0][2]
    assert got["http://b.example/y"].warning is None
    assert got["http://a.example/x"].warc_file.endswith("a.warc.gz")


def test_parse_warc_fuzz_controlled():
    """Arbitrary, truncated, or bit-flipped WARC bytes: parse_warc
    either returns rows (with warnings) or raises ValueError — never
    an uncontrolled exception or hang."""
    import random

    valid = build_warc(RECS, gzip_per_record=True)
    plain = build_warc(RECS)
    rng = random.Random(99)
    for trial in range(800):
        mode = trial % 4
        base = valid if trial % 2 else plain
        if mode == 0:
            data = bytes(rng.randrange(256)
                         for _ in range(rng.randrange(400)))
        elif mode == 1:
            data = base[:rng.randrange(len(base))]
        elif mode == 2:
            b = bytearray(base)
            for _ in range(rng.randrange(1, 10)):
                b[rng.randrange(len(b))] = rng.randrange(256)
            data = bytes(b)
        else:
            b = bytearray(base)
            i = rng.randrange(len(b))
            del b[i:i + rng.randrange(1, 30)]
            data = bytes(b)
        try:
            parse_warc(data, "fuzz")
        except ValueError:
            pass


def test_write_warc_distributed_roundtrip(spark, tmp_path):
    """Distributed WARC sink: per-partition files + manifest, read
    back losslessly by the reader."""
    from pyspark.sql import functions as F

    from pdfplumber_rs_spark.sources.warc import write_warc

    rows = [(f"http://site/{i}", f"body {i} content".encode())
            for i in range(20)]
    df = (spark.createDataFrame(rows, "url string, html binary")
          .withColumn("warc_ts", F.timestamp_seconds(
              F.lit(1704067200) + F.crc32("url") % 1000))
          .repartition(3, "url"))
    out = str(tmp_path / "warc_out")
    manifest = write_warc(df, out).collect()
    assert sum(m.n_records for m in manifest) == 20
    assert all(m.warc_file.endswith(".warc.gz") for m in manifest)

    from pdfplumber_rs_spark.sources.warc import read_warc

    back = read_warc(spark, out)
    got = {r.url: bytes(r.html) for r in back.collect()
           if r.warning is None}
    assert got == {u: b for u, b in rows}
    # timestamps survive the serialize/parse round trip
    ts_in = {r.url: r.warc_ts for r in df.select("url", "warc_ts").collect()}
    ts_out = {r.url: r.warc_ts for r in back.collect()}
    assert ts_in == ts_out


def test_write_warc_lenient_on_null_rows(spark, tmp_path):
    """Null url rows are unserializable as WARC records: the sink must
    DROP them with a manifest n_skipped count (lenient-sink
    discipline), and a null warc_ts defaults to the epoch — never a
    task failure (the ADVICE write_warc finding)."""
    import datetime

    from pyspark.sql import functions as F

    from pdfplumber_rs_spark.sources.warc import read_warc, write_warc

    df = (spark.createDataFrame(
        [("http://ok/1", b"one", 1704067200),
         (None, b"dropped", 1704067201),
         ("http://ok/2", b"two", None)],
        "url string, html binary, epoch long")
        .withColumn("warc_ts", F.timestamp_seconds("epoch"))
        .drop("epoch").coalesce(1))
    out = str(tmp_path / "warc_null")
    manifest = write_warc(df, out).collect()
    assert sum(m.n_records for m in manifest) == 2
    assert sum(m.n_skipped for m in manifest) == 1
    back = {r.url: r for r in read_warc(spark, out).collect()
            if r.warning is None}
    assert set(back) == {"http://ok/1", "http://ok/2"}
    assert back["http://ok/2"].warc_ts == datetime.datetime(1970, 1, 1)


def test_write_warc_all_null_partition(spark, tmp_path):
    """A partition of ONLY null-url rows yields a manifest row with
    n_records=0 and the skip count — no file, no crash."""
    from pyspark.sql import functions as F

    from pdfplumber_rs_spark.sources.warc import write_warc

    df = (spark.createDataFrame(
        [(None, b"x", 1704067200)], "url string, html binary, epoch long")
        .withColumn("warc_ts", F.timestamp_seconds("epoch"))
        .drop("epoch").coalesce(1))
    manifest = write_warc(df, str(tmp_path / "warc_empty")).collect()
    assert len(manifest) == 1
    m = manifest[0]
    assert (m.warc_file, m.n_records, m.n_skipped) == (None, 0, 1)
