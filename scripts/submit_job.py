"""spark-submit entry point: the production extraction job.

    spark-submit --master <cluster> \
        --py-files dist/pdfplumber_rs_spark.zip \
        scripts/submit_job.py --input <corpus parquet> --output <dir>

Reads an Iceberg/parquet corpus of Common-Crawl-style pages
(url, html:binary, ...), runs the full extraction pipeline (skew-aware:
giant blobs spill once and ship pointer rows), assembles per-url text,
and APPENDS results plus per-partition lineage rows to the output.
Re-running with the same output is checkpoint-resumable: already-
committed urls are dropped with a left-anti join before any kernel work
(SURVEY §4(d); in production the append is an Iceberg transactional
commit and this degenerates to snapshot-diff semantics).
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="corpus parquet/Iceberg path")
    ap.add_argument("--output", required=True, help="result sink directory")
    ap.add_argument("--no-resume", action="store_true",
                    help="reprocess everything (skip the left-anti resume)")
    ap.add_argument("--handle-skew", action="store_true", default=True)
    ap.add_argument("--include", default="",
                    help="comma list of side sections (chars,words,...); "
                         "empty = text-only (maximum kernel pruning)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    # master/resources come from spark-submit; only job-level conf here
    spark = (
        SparkSession.builder.appName("pdfplumber-rs-spark-extract")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )

    from pdfplumber_rs_spark import pipeline as P

    corpus = spark.read.parquet(args.input)
    out_docs = f"{args.output.rstrip('/')}/documents"
    out_lineage = f"{args.output.rstrip('/')}/lineage"

    if not args.no_resume:
        try:
            committed = spark.read.parquet(out_docs)
            corpus = P.resume_filter(corpus, committed)
        except Exception:  # noqa: BLE001 — first run: nothing committed yet
            pass

    include = tuple(s for s in args.include.split(",") if s)
    pages = P.extract_pages(corpus, handle_skew=args.handle_skew,
                            include=include)
    # two consumers (text sink + lineage) — materialize the kernel
    # output once (PLANS.md "multi-reference reuse"; production writes
    # the page table to Iceberg and derives both from the commit)
    pages = pages.persist()
    try:
        P.document_text(pages).write.mode("append").parquet(out_docs)
        P.lineage(pages).write.mode("append").parquet(out_lineage)
    finally:
        pages.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
