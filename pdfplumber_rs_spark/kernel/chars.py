"""Char assembly: CharEvents -> positioned Char dicts (numpy-vectorized).

Port of the reference bbox math
(crates/pdfplumber-parse/src/char_extraction.rs:28-128):
Trm = [Tfs*Th, 0, 0, Tfs, 0, Trise] x Tm x CTM; bbox = AABB of the four
transformed corners of (ox, oy+descent)-(ox+w0/1000, oy+ascent);
y-flip top = page_height - max_y; upright iff no shear; direction from
the dominant Trm axis. Vectorized across all chars of a page.
"""

from __future__ import annotations

import numpy as np


def chars_from_events(events: list, page_height: float) -> list[dict]:
    n = len(events)
    if n == 0:
        return []

    tfs = np.fromiter((e.font_size for e in events), dtype=np.float64, count=n)
    th = np.fromiter((e.h_scaling for e in events), dtype=np.float64, count=n)
    rise = np.fromiter((e.rise for e in events), dtype=np.float64, count=n)
    disp = np.fromiter((e.displacement for e in events), dtype=np.float64, count=n)
    asc = np.fromiter((e.ascent for e in events), dtype=np.float64, count=n)
    desc = np.fromiter((e.descent for e in events), dtype=np.float64, count=n)
    vx = np.fromiter((e.vertical_origin[0] for e in events), dtype=np.float64, count=n)
    vy = np.fromiter((e.vertical_origin[1] for e in events), dtype=np.float64, count=n)

    tmat = np.array([e.text_matrix for e in events], dtype=np.float64)  # (n,6)
    cmat = np.array([e.ctm for e in events], dtype=np.float64)

    # fm = [tfs*th, 0, 0, tfs, 0, rise]; trm1 = fm x Tm
    A1 = tfs * th
    D1 = tfs
    F1 = rise
    a2, b2, c2, d2, e2, f2 = (tmat[:, i] for i in range(6))
    t_a = A1 * a2
    t_b = A1 * b2
    t_c = D1 * c2
    t_d = D1 * d2
    t_e = F1 * c2 + e2
    t_f = F1 * d2 + f2

    # trm = trm1 x CTM
    a3, b3, c3, d3, e3, f3 = (cmat[:, i] for i in range(6))
    a = t_a * a3 + t_b * c3
    b = t_a * b3 + t_b * d3
    c = t_c * a3 + t_d * c3
    d = t_c * b3 + t_d * d3
    e = t_e * a3 + t_f * c3 + e3
    f = t_e * b3 + t_f * d3 + f3

    w = disp / 1000.0
    an = asc / 1000.0
    dn = desc / 1000.0
    ox = -vx / 1000.0
    oy = -vy / 1000.0

    # corners in glyph space: (ox,oy+dn) (ox+w,oy+dn) (ox+w,oy+an) (ox,oy+an)
    cx = np.stack([ox, ox + w, ox + w, ox], axis=1)  # (n,4)
    cy = np.stack([oy + dn, oy + dn, oy + an, oy + an], axis=1)
    px = a[:, None] * cx + c[:, None] * cy + e[:, None]
    py = b[:, None] * cx + d[:, None] * cy + f[:, None]

    min_x = px.min(axis=1)
    max_x = px.max(axis=1)
    min_y = py.min(axis=1)
    max_y = py.max(axis=1)

    top = page_height - max_y
    bottom = page_height - min_y

    # pdfminer upright semantics: evaluated on Tm×CTM (no font-size
    # prematrix), with the horizontal-scaling sign folded in:
    # upright = 0 < a·d·scaling and b·c <= 0. Negative Tz / mirrored
    # matrices make text non-upright (drives word grouping).
    am = a2 * a3 + b2 * c3
    bm = a2 * b3 + b2 * d3
    cm = c2 * a3 + d2 * c3
    dm = c2 * b3 + d2 * d3
    upright = (am * dm * th > 0) & (bm * cm <= 0)
    # direction from dominant Trm axis (char_extraction.rs:94-104)
    horiz = np.abs(a) >= np.abs(b)
    direction = np.where(horiz, np.where(a >= 0, 0, 1), np.where(b > 0, 3, 2))
    # 0=ltr 1=rtl 2=ttb 3=btt
    dir_names = ("ltr", "rtl", "ttb", "btt")

    # size = device-space bbox height for horizontal-mode fonts, width for
    # vertical-mode fonts (pdfminer LTChar semantics — the golden oracle);
    # equals Tfs on unrotated, unscaled text.
    is_vert = (vx != 0.0) | (vy != 0.0)
    size = np.where(is_vert, max_x - min_x, max_y - min_y)

    # bulk-convert to Python scalars once (tolist) instead of per-field
    # float() casts per char; CTMs are shared tuples — cache by identity
    min_x_l = min_x.tolist()
    max_x_l = max_x.tolist()
    top_l = top.tolist()
    bottom_l = bottom.tolist()
    size_l = size.tolist()
    upright_l = upright.tolist()
    vert_l = is_vert.tolist()
    dir_l = [dir_names[d] for d in direction.tolist()]
    ctm_cache: dict[int, tuple] = {}

    out: list[dict] = []
    for i, ev in enumerate(events):
        uni = ev.unicode
        if uni is None:
            uni = "�"
        raw_ctm = ev.ctm
        ctm = ctm_cache.get(id(raw_ctm))
        if ctm is None:
            ctm = tuple(float(v) for v in raw_ctm)
            ctm_cache[id(raw_ctm)] = ctm
        out.append(
            {
                "text": uni,
                "x0": min_x_l[i],
                "top": top_l[i],
                "x1": max_x_l[i],
                "bottom": bottom_l[i],
                "fontname": ev.font_name,
                "size": size_l[i],
                "_wmode": 1 if vert_l[i] else 0,
                "doctop": top_l[i],
                "upright": upright_l[i],
                "direction": dir_l[i],
                "stroking_color": ev.stroking_color,
                "non_stroking_color": ev.non_stroking_color,
                "ctm": ctm,
                "char_code": int(ev.char_code),
                "mcid": ev.mcid,
                "tag": ev.tag,
            }
        )
    return out
