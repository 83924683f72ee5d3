"""Build the spark-submit deployment artifact.

Zips the `pdfplumber_rs_spark` package — Python sources plus the Adobe
CID table npz — into `dist/pdfplumber_rs_spark.zip`, suitable for
`spark-submit --py-files dist/pdfplumber_rs_spark.zip scripts/submit_job.py ...`
(the north-rule deployment shape). Pure stdlib; no build backend needed.
"""

from __future__ import annotations

import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
PKG = REPO / "pdfplumber_rs_spark"
OUT = REPO / "dist" / "pdfplumber_rs_spark.zip"


def main() -> Path:
    OUT.parent.mkdir(exist_ok=True)
    with zipfile.ZipFile(OUT, "w", zipfile.ZIP_DEFLATED) as z:
        for p in sorted(PKG.rglob("*")):
            if p.is_dir() or "__pycache__" in p.parts:
                continue
            if p.suffix not in (".py", ".npz"):
                continue
            z.write(p, p.relative_to(REPO))
    print(f"wrote {OUT} ({OUT.stat().st_size} bytes)")
    return OUT


if __name__ == "__main__":
    main()
