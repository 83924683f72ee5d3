"""Deployment-shape test: the packaged zip + spark-submit entry point.

Runs the REAL `spark-submit --py-files dist/pdfplumber_rs_spark.zip`
flow (north rule: "run via spark-submit --py-files") against a tiny
corpus in a scratch dir, from a working directory OUTSIDE the repo so
only the zip provides the package; then re-runs to prove the left-anti
resume skips committed urls."""

from __future__ import annotations

import shutil
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


@pytest.fixture(scope="module")
def artifact():
    sys.path.insert(0, str(REPO / "scripts"))
    import package

    return package.main()


def _spark_submit() -> str:
    import pyspark

    return str(Path(pyspark.__file__).parent / "bin" / "spark-submit")


def test_spark_submit_extract_and_resume(artifact, tmp_path, spark):
    from pdfplumber_rs_spark.sources import pdfgen

    inp = tmp_path / "in"
    out = tmp_path / "out"
    rows = [(f"u{i}", pdfgen.pdf_from_text(f"doc number {i} body"))
            for i in range(6)]
    spark.createDataFrame(rows, "url string, html binary").coalesce(1) \
        .write.parquet(str(inp))

    cmd = [
        _spark_submit(), "--master", "local[2]",
        "--conf", "spark.sql.shuffle.partitions=4",
        "--conf", "spark.ui.enabled=false",
        "--py-files", str(artifact),
        str(REPO / "scripts" / "submit_job.py"),
        "--input", str(inp), "--output", str(out),
    ]
    # run from OUTSIDE the repo with PYTHONPATH cleared: the zip must be
    # the only source of the package
    r = subprocess.run(cmd, cwd=str(tmp_path), capture_output=True,
                       text=True, timeout=420, env={**__import__("os").environ,
                                                    "PYTHONPATH": ""},
                       check=False)
    assert r.returncode == 0, r.stderr[-3000:]

    from pdfplumber_rs_spark import jobs

    docs = jobs.committed_results(spark, str(out))
    got = {row.url: row.text for row in docs.collect()}
    assert got == {f"u{i}": f"doc number {i} body" for i in range(6)}
    lineage = spark.read.parquet(str(out / "lineage" / "batch=0"))
    assert lineage.groupBy().sum("n_pages").collect()[0][0] == 6

    # drop two NEW docs next to the old file; rerun must only add those
    rows2 = [(f"v{i}", pdfgen.pdf_from_text(f"new {i}")) for i in range(2)]
    spark.createDataFrame(rows2, "url string, html binary").coalesce(1) \
        .write.mode("append").parquet(str(inp))
    r2 = subprocess.run(cmd, cwd=str(tmp_path), capture_output=True,
                        text=True, timeout=420,
                        env={**__import__("os").environ, "PYTHONPATH": ""},
                        check=False)
    assert r2.returncode == 0, r2.stderr[-3000:]
    rows_after = jobs.committed_results(spark, str(out)).collect()
    assert len(rows_after) == 8  # u0-u5 committed once, v0-v1 in batch=1
    assert {r_.url for r_ in rows_after} == {f"u{i}" for i in range(6)} | {"v0", "v1"}
    assert len(jobs.committed_batches(spark, str(out))) == 2
