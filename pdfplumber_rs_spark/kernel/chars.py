"""Char assembly: CharRuns -> positioned Char dicts (numpy-vectorized).

Port of the reference bbox math
(crates/pdfplumber-parse/src/char_extraction.rs:28-128):
Trm = [Tfs*Th, 0, 0, Tfs, 0, Trise] x Tm x CTM; bbox = AABB of the four
transformed corners of (ox, oy+descent)-(ox+w0/1000, oy+ascent);
y-flip top = page_height - max_y; upright iff no shear; direction from
the dominant Trm axis.

The interpreter emits COLUMNAR CharRuns (one per show op: constants on
the run, per-glyph lists) so the numpy columns here build from
list.extend + np.repeat over run lengths — no per-glyph object or
per-event attribute scan exists anywhere on this path.
"""

from __future__ import annotations

import numpy as np


def chars_from_events(runs: list, page_height: float,
                      want_cols: bool = False):
    """runs: list[interpreter.CharRun] for one page.

    want_cols=True additionally returns the positional numpy columns
    ({x0, x1, top, bot, doctop, up}) that downstream vectorized passes
    (dedupe prescreen, word ordering/splitting) would otherwise rebuild
    from the dicts with np.fromiter — the arrays already exist here
    (round 6). Caller contract: the columns are only valid while the
    char LIST is unfiltered and positions unmutated (no rotation)."""
    runs = [r for r in runs if r.codes]
    if not runs:
        return ([], None) if want_cols else []
    nruns = len(runs)
    lens = np.fromiter((len(r.codes) for r in runs), np.int64, nruns)
    n = int(lens.sum())

    # per-run constants -> per-glyph via repeat
    rscal = np.array(
        [(r.font_size, r.h_scaling, r.rise, r.ascent, r.descent)
         for r in runs],
        dtype=np.float64,
    )
    tfs, th, rise, asc, desc = np.repeat(rscal, lens, axis=0).T
    abcd = np.repeat(
        np.array([r.tm_abcd for r in runs], dtype=np.float64), lens, axis=0)
    a2, b2, c2, d2 = abcd.T
    cmat = np.repeat(
        np.array([r.ctm for r in runs], dtype=np.float64), lens, axis=0)

    # per-glyph columns -> flat lists (C-speed extend), one np.array each
    disp_l: list = []
    e_l: list = []
    f_l: list = []
    any_vert = False
    for r in runs:
        disp_l.extend(r.w0s)
        e_l.extend(r.es)
        f_l.extend(r.fs)
        if r.vxs is not None:
            any_vert = True
    disp = np.asarray(disp_l, dtype=np.float64)
    e2 = np.asarray(e_l, dtype=np.float64)
    f2 = np.asarray(f_l, dtype=np.float64)
    if any_vert:
        vx_l: list = []
        vy_l: list = []
        for r, ln in zip(runs, lens):
            if r.vxs is None:
                vx_l.extend([0.0] * int(ln))
                vy_l.extend([0.0] * int(ln))
            else:
                vx_l.extend(r.vxs)
                vy_l.extend(r.vys)
        vx = np.asarray(vx_l, dtype=np.float64)
        vy = np.asarray(vy_l, dtype=np.float64)
    else:
        vx = vy = np.zeros(n, dtype=np.float64)

    # fm = [tfs*th, 0, 0, tfs, 0, rise]; trm1 = fm x Tm
    A1 = tfs * th
    D1 = tfs
    F1 = rise
    t_a = A1 * a2
    t_b = A1 * b2
    t_c = D1 * c2
    t_d = D1 * d2
    t_e = F1 * c2 + e2
    t_f = F1 * d2 + f2

    # trm = trm1 x CTM
    a3, b3, c3, d3, e3, f3 = cmat.T
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

    # bulk-convert to Python scalars once (tolist); run constants
    # (fontname, colors, ctm tuple, mcid/tag) are reused per run
    min_x_l = min_x.tolist()
    max_x_l = max_x.tolist()
    top_l = top.tolist()
    bottom_l = bottom.tolist()
    size_l = size.tolist()
    upright_l = upright.tolist()
    vert_l = is_vert.tolist()
    dir_l = [dir_names[di] for di in direction.tolist()]
    ctm_cache: dict[int, tuple] = {}

    out: list[dict] = []
    out_append = out.append
    i = 0
    for r in runs:
        raw_ctm = r.ctm
        ctm = ctm_cache.get(id(raw_ctm))
        if ctm is None:
            ctm = tuple(float(v) for v in raw_ctm)
            ctm_cache[id(raw_ctm)] = ctm
        fname = r.font_name
        mcid = r.mcid
        tag = r.tag
        sc = r.stroking_color
        nsc = r.non_stroking_color
        j = i + len(r.codes)
        # zip over per-run list slices: one tuple unpack per glyph
        # instead of 7 list-index operations (hot loop, round 6)
        for code, uni, x0v, topv, x1v, botv, szv, vtv, upv, dirv in zip(
                r.codes, r.unis, min_x_l[i:j], top_l[i:j], max_x_l[i:j],
                bottom_l[i:j], size_l[i:j], vert_l[i:j], upright_l[i:j],
                dir_l[i:j]):
            if uni is None:
                uni = "�"
            out_append(
                {
                    "text": uni,
                    "x0": x0v,
                    "top": topv,
                    "x1": x1v,
                    "bottom": botv,
                    "fontname": fname,
                    "size": szv,
                    "_wmode": 1 if vtv else 0,
                    "doctop": topv,
                    "upright": upv,
                    "direction": dirv,
                    "stroking_color": sc,
                    "non_stroking_color": nsc,
                    "ctm": ctm,
                    "char_code": int(code),
                    "mcid": mcid,
                    "tag": tag,
                }
            )
        i = j
    if want_cols:
        cols = {
            "x0": min_x, "x1": max_x, "top": top, "bot": bottom,
            "doctop": top.copy(), "up": upright,
        }
        return out, cols
    return out
