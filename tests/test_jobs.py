"""Checkpoint-resumable extraction job (jobs.run_extract_job): durable
batch commits, crash-leftover tolerance, exactly-once per url,
per-partition lineage."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from pdfplumber_rs_spark import jobs
from pdfplumber_rs_spark.sources import pdfgen


def _corpus(spark, n):
    rows = [(f"https://j.example/{i:04d}.pdf",
             pdfgen.pdf_from_text(f"doc {i} body text line"))
            for i in range(n)]
    rows.append(("https://j.example/garbage.pdf", b"\x00not a pdf at all"))
    return spark.createDataFrame(rows, "url string, html binary")


def test_job_resumes_from_committed_batches(spark, tmp_path):
    out = str(tmp_path / "job_out")
    corpus = _corpus(spark, 10)

    # first invocation: a prior run committed 4 urls as batch=0 ...
    first = corpus.filter(F.col("url") < "https://j.example/0004")
    m0 = jobs.run_extract_job(spark, first, out)
    assert m0["batch"] == 0 and m0["n_processed"] == 4

    # ... and a later run DIED mid-write: an uncommitted batch dir with
    # a stray part file and NO _SUCCESS must be ignored on resume
    dead = tmp_path / "job_out" / "results" / "batch=1"
    dead.mkdir(parents=True)
    (dead / "part-00000-dead.parquet").write_bytes(b"torn write")
    assert jobs.committed_batches(spark, out) == [f"{out}/results/batch=0"]

    # resume over the FULL corpus: only the 7 uncommitted docs run
    m1 = jobs.run_extract_job(spark, corpus, out)
    assert m1["n_processed"] == 7
    assert m1["n_errors"] == 1  # the garbage doc, lenient not fatal
    assert m1["batch"] == 2  # numbered past every batch dir, dead or alive

    res = jobs.committed_results(spark, out)
    got = {r.url: r for r in res.collect()}
    assert len(got) == 11  # exactly once per url, no duplicates
    assert got["https://j.example/garbage.pdf"].n_chars == 0
    assert got["https://j.example/0007.pdf"].n_chars > 0

    # fully caught up: a third run processes nothing and commits nothing
    m2 = jobs.run_extract_job(spark, corpus, out)
    assert m2["n_processed"] == 0
    assert len(jobs.committed_batches(spark, out)) == 2

    # lineage + metrics committed alongside the results
    lin = spark.read.parquet(f"{out}/lineage/batch=2")
    agg = lin.agg(F.sum("n_urls").alias("u"),
                  F.sum("n_errors").alias("e")).first()
    assert (agg["u"], agg["e"]) == (7, 1)
    assert os.path.exists(f"{out}/metrics-batch-2.json")
