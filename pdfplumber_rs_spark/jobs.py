"""Checkpoint-resumable batch extraction job — the north-rule driver
shape (BASELINE.json north_rule: "resumable from checkpoint with
per-partition lineage + metrics").

An extraction run over a 10^12-document corpus WILL be interrupted —
preemptions, quota, bad input batches — so the job must be re-invocable
and pick up exactly where the last durable commit left off:

- Output is committed in numbered BATCH directories
  (``{out}/results/batch=N/``), each written through Spark's own commit
  protocol: a batch directory is durable iff its ``_SUCCESS`` marker
  exists, so a run killed mid-write leaves only an ignorable
  uncommitted directory. At production scale each batch is an Iceberg
  snapshot commit (same all-or-nothing semantics); the parquet+_SUCCESS
  layout is the sandbox stand-in.
- Resume = one left-anti join against the union of committed batches'
  urls (``pipeline.resume_filter``) — no driver-side bookkeeping, no
  url lists in memory; the committed set is itself a distributed read.
- Every batch also commits per-partition LINEAGE rows
  (``{out}/lineage/batch=N/``: partition_id, url/page/char/error
  counts, kernel wall-ms — ``pipeline.lineage``) plus one job-level
  metrics JSON, so a stalled or skewed partition is visible from the
  output alone.

Deploy shape: ``spark-submit --py-files pdfplumber_rs_spark.zip
job.py --in s3://crawl --out s3://extracted`` re-run under any
scheduler until ``n_processed == 0``.
"""

from __future__ import annotations

import json
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import pipeline as P

RESULT_COLS = ("url", "text", "n_pages", "n_chars", "n_words")


def _fs(spark: SparkSession, path: str):
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def committed_batches(spark: SparkSession, out_dir: str) -> list[str]:
    """Batch directories under {out_dir}/results whose _SUCCESS marker
    exists — the durable commits. Uncommitted leftovers from a killed
    run are ignored (and may be garbage-collected out of band)."""
    fs, root = _fs(spark, f"{out_dir}/results")
    if not fs.exists(root):
        return []
    out = []
    for status in fs.listStatus(root):
        name = status.getPath().getName()
        if not name.startswith("batch="):
            continue
        marker = spark._jvm.org.apache.hadoop.fs.Path(
            status.getPath(), "_SUCCESS")
        if fs.exists(marker):
            out.append(f"{out_dir}/results/{name}")
    return sorted(out)


def committed_results(spark: SparkSession, out_dir: str) -> DataFrame | None:
    dirs = committed_batches(spark, out_dir)
    if not dirs:
        return None
    return spark.read.parquet(*dirs)


def _next_batch_no(spark: SparkSession, out_dir: str) -> int:
    """1 + the highest existing batch index, committed OR not — a dead
    run's uncommitted directory is never reused (clobbering a committed
    dir is impossible, and the torn leftover stays inert forever)."""
    fs, root = _fs(spark, f"{out_dir}/results")
    if not fs.exists(root):
        return 0
    idx = [-1]
    for status in fs.listStatus(root):
        name = status.getPath().getName()
        if name.startswith("batch="):
            try:
                idx.append(int(name.split("=", 1)[1]))
            except ValueError:
                continue
    return max(idx) + 1


def run_extract_job(spark: SparkSession, corpus: DataFrame, out_dir: str,
                    handle_skew: bool = True,
                    include: tuple = ()) -> dict:
    """One resumable pass: extract every document NOT yet in a
    committed batch, commit results + lineage + metrics as the next
    batch, and return the metrics dict. Invoke repeatedly until
    ``n_processed == 0`` (an interrupted run's partial writes have no
    _SUCCESS and are re-done).

    corpus: (url, html) rows. Results rows: url, extract_text output,
    page/char/word counters. A failed document becomes a result row
    with empty text and its error recorded in the lineage error count
    — lenient, the crawl-scale discipline (one poisoned PDF must not
    wedge a 10^12-doc job)."""
    t0 = time.time()
    done = committed_results(spark, out_dir)
    batch_no = _next_batch_no(spark, out_dir)
    todo = corpus if done is None else P.resume_filter(corpus, done)
    pages = P.extract_pages(todo, handle_skew=handle_skew,
                            include=include).persist()
    doc = (
        P.document_text(pages)
        .select("url", "text", "n_pages", "n_chars", "n_words")
    )
    n_processed = doc.count()
    metrics = {"batch": batch_no, "n_processed": int(n_processed)}
    if n_processed == 0:  # fully caught up: commit nothing
        pages.unpersist()
        metrics["sec"] = round(time.time() - t0, 3)
        return metrics
    doc.write.parquet(f"{out_dir}/results/batch={batch_no}")
    lin = P.lineage(pages)
    lin.write.parquet(f"{out_dir}/lineage/batch={batch_no}")
    err = lin.agg(F.sum("n_errors").alias("e")).first()["e"]
    pages.unpersist()
    metrics["n_errors"] = int(err or 0)
    metrics["sec"] = round(time.time() - t0, 3)
    fs, _ = _fs(spark, out_dir)
    mpath = spark._jvm.org.apache.hadoop.fs.Path(
        f"{out_dir}/metrics-batch-{batch_no}.json")
    stream = fs.create(mpath, True)
    stream.write(bytearray(json.dumps(metrics).encode()))
    stream.close()
    return metrics
