"""One-time generator: Adobe CID->Unicode tables -> compact npz.

The four tables are Adobe's public cmap-resources data
(adobe-type-tools/cmap-resources, the UniXX-UCS2 columns), which the
reference ships as generated Rust arrays
(crates/pdfplumber-parse/src/adobe_{gb1,cns1,japan1,korea1}_ucs2.rs,
consumed by cid_font.rs).  We re-pack the same public mapping data as
sorted uint32 arrays in ONE .npz so the runtime lookup is a
np.searchsorted over ~100k pairs (~800 KB on disk).

Usage: python scripts/gen_cid_tables.py   (writes
pdfplumber_rs_spark/kernel/fonts/data/adobe_cid_ucs2.npz)
"""

from __future__ import annotations

import re
from pathlib import Path

import numpy as np

REF = Path("/root/reference/crates/pdfplumber-parse/src")
OUT = (Path(__file__).resolve().parents[1]
       / "pdfplumber_rs_spark/kernel/fonts/data/adobe_cid_ucs2.npz")

# ordering key (CIDSystemInfo /Ordering) -> reference data file
TABLES = {
    "GB1": "adobe_gb1_ucs2.rs",
    "CNS1": "adobe_cns1_ucs2.rs",
    "Japan1": "adobe_japan1_ucs2.rs",
    "Korea1": "adobe_korea1_ucs2.rs",
}

PAIR_RE = re.compile(r"\((\d+),\s*0x([0-9A-Fa-f]+)\)")


def main() -> None:
    arrays: dict[str, np.ndarray] = {}
    for key, fname in TABLES.items():
        text = (REF / fname).read_text()
        pairs = [(int(c), int(u, 16)) for c, u in PAIR_RE.findall(text)]
        if key == "Japan1":
            # Supplement the proportional-Latin block the reference's
            # generated table omits: Adobe-Japan1 CIDs 231..325 are the
            # proportional forms of U+0020..U+007E (Adobe's public
            # Adobe-Japan1 character collection layout; pdfminer's
            # Adobe-Japan1 unicode map includes them — needed for
            # pdfjs/noembed-identity-2 digits, CID 247..249 -> 0 1 2)
            have = {c for c, _ in pairs}
            pairs.extend((231 + k, 0x20 + k) for k in range(95)
                         if (231 + k) not in have)
        pairs.sort()
        arr = np.asarray(pairs, dtype=np.uint32)
        assert len(arr) > 1000, f"{key}: suspiciously small table"
        assert (np.diff(arr[:, 0].astype(np.int64)) > 0).all(), \
            f"{key}: CIDs not strictly sorted"
        arrays[f"{key.lower()}_cid"] = arr[:, 0]
        arrays[f"{key.lower()}_uni"] = arr[:, 1]
        print(f"{key}: {len(arr)} entries, cid range "
              f"{arr[0, 0]}..{arr[-1, 0]}")
    OUT.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT, **arrays)
    print(f"wrote {OUT} ({OUT.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
