"""Pure-numpy baseline JPEG codec — no codec library.

Encoder: single-component (grayscale) baseline sequential JPEG with
the Annex-K standard luminance quantization + Huffman tables, 8x8
orthonormal DCT as one numpy matrix-product pair, canonical Huffman
codes, byte-stuffed entropy stream.

Decoder: baseline sequential (SOF0/SOF1), 8-bit, 1x1 sampling, any
component count (returns the first/luma channel) — covers the
encoder's own output and standard-table grayscale JPEGs from real
tools. Progressive, arithmetic, subsampled-chroma, and
restart-interval streams raise NotImplementedError (plug Pillow /
libvips there in production).

Reference surface: pdfplumber-rs hands DCTDecode image streams to the
Rust `image` crate (crates/pdfplumber/src/page.rs image extraction);
this module is the zero-dependency counterpart used by the multimodal
pipeline (functions/multimodal.py decode_image).
"""

from __future__ import annotations

import math
import struct

import numpy as np

# Annex K.1 luminance quantization table (quality 50), raster order.
STD_LUMA_QUANT = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)

# zigzag scan: raster index of the i-th zigzag element
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K.3 standard Huffman tables: (BITS counts per code length 1-16,
# HUFFVAL symbol list)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _dct_matrix() -> np.ndarray:
    t = np.empty((8, 8))
    for i in range(8):
        a = math.sqrt(1.0 / 8.0) if i == 0 else math.sqrt(2.0 / 8.0)
        for j in range(8):
            t[i, j] = a * math.cos((2 * j + 1) * i * math.pi / 16.0)
    return t


_T = _dct_matrix()


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """JPEG canonical Huffman assignment: symbol -> (length, code)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, inverse of the canonical assignment."""
    return {lc: sym for sym, lc in _canonical_codes(bits, vals).items()}


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write_bits(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def write_code(self, lc: tuple[int, int]) -> None:
        self.write_bits(lc[1], lc[0])

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write_bits((1 << pad) - 1, pad)  # pad with 1s
        return bytes(self.out)


class _BitReader:
    """MSB-first reader over the entropy-coded segment with 0xFF00
    un-stuffing; a real marker mid-scan is an error (no restarts)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def read_bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated entropy stream")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("truncated after 0xFF")
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1
                elif nxt == 0xD9:  # EOI reached while padding bits remain
                    byte = 0xFF
                else:
                    raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
            self.acc = byte
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read_bits(self, nbits: int) -> int:
        v = 0
        for _ in range(nbits):
            v = (v << 1) | self.read_bit()
        return v


def _extend(value: int, category: int) -> int:
    """JPEG EXTEND: map the `category`-bit magnitude field to a signed
    coefficient value."""
    if category == 0:
        return 0
    if value < (1 << (category - 1)):
        return value - (1 << category) + 1
    return value


def _huff_decode(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    length = 0
    code = 0
    while length < 16:
        code = (code << 1) | br.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def encode_jpeg_gray(width: int, height: int, pixels: bytes) -> bytes:
    """Encode 8-bit grayscale pixels (row-major, len == width*height)
    as a baseline sequential JPEG with the standard Annex-K tables."""
    if len(pixels) != width * height:
        raise ValueError("pixel buffer size mismatch")
    img = (np.frombuffer(pixels, np.uint8).astype(np.float64)
           .reshape(height, width))
    bh = (height + 7) // 8 * 8
    bw_ = (width + 7) // 8 * 8
    img = np.pad(img, ((0, bh - height), (0, bw_ - width)), mode="edge")
    img -= 128.0
    q = STD_LUMA_QUANT.astype(np.float64).reshape(8, 8)
    dc_codes = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_codes = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    w = _BitWriter()
    prev_dc = 0
    for by in range(0, bh, 8):
        for bx in range(0, bw_, 8):
            block = img[by:by + 8, bx:bx + 8]
            coef = _T @ block @ _T.T
            qc = np.rint(coef / q).astype(np.int64)
            zz = qc.reshape(-1)[ZIGZAG]
            dc = int(zz[0])
            diff = dc - prev_dc
            prev_dc = dc
            cat = abs(diff).bit_length()
            w.write_code(dc_codes[cat])
            if cat:
                w.write_bits(diff if diff > 0 else diff + (1 << cat) - 1, cat)
            run = 0
            for k in range(1, 64):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    w.write_code(ac_codes[0xF0])  # ZRL
                    run -= 16
                s = abs(v).bit_length()
                w.write_code(ac_codes[(run << 4) | s])
                w.write_bits(v if v > 0 else v + (1 << s) - 1, s)
                run = 0
            if run:
                w.write_code(ac_codes[0x00])  # EOB
    scan = w.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    dqt = seg(0xDB, b"\x00"
              + bytes(int(STD_LUMA_QUANT[i]) for i in ZIGZAG))
    sof = seg(0xC0, struct.pack(">BHHB", 8, height, width, 1)
              + bytes([1, 0x11, 0]))
    dht_dc = seg(0xC4, b"\x00" + bytes(DC_LUMA_BITS) + bytes(DC_LUMA_VALS))
    dht_ac = seg(0xC4, b"\x10" + bytes(AC_LUMA_BITS) + bytes(AC_LUMA_VALS))
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return (b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + sos
            + scan + b"\xff\xd9")


def decode_jpeg(data: bytes) -> tuple[int, int, bytes]:
    """Decode a baseline sequential JPEG to (width, height, luma bytes).

    Supports 8-bit SOF0/SOF1 with 1x1 sampling on every component; the
    first (luma) channel is returned. Progressive/arithmetic coding,
    chroma subsampling, and restart intervals raise
    NotImplementedError — honest gating, not silent wrong pixels."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    width = height = None
    comps: list[tuple[int, int]] = []  # (comp_id, qtable_id)
    scan_comps: list[tuple[int, int, int]] = []  # (comp_id, dc_id, ac_id)
    scan_start = None
    while pos + 1 < len(data):
        if data[pos] != 0xFF:
            raise ValueError("expected marker")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        if pos + 2 > len(data):
            raise ValueError("truncated segment header")
        seglen = struct.unpack(">H", data[pos:pos + 2])[0]
        body = data[pos + 2:pos + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated segment")
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                raw = body[i + 1:i + 65]
                if len(raw) != 64:
                    raise ValueError("truncated quant table")
                tbl = np.zeros(64, dtype=np.int64)
                for z, rast in enumerate(ZIGZAG):
                    tbl[rast] = raw[z]
                qtables[tq] = tbl
                i += 65
        elif marker in (0xC0, 0xC1):  # baseline / extended sequential
            if len(body) < 6:
                raise ValueError("truncated SOF")
            precision, height, width, ncomp = struct.unpack(
                ">BHHB", body[:6])
            if precision != 8:
                raise NotImplementedError("non-8-bit precision")
            if len(body) < 6 + 3 * ncomp:
                raise ValueError("truncated SOF components")
            comps = []
            for c in range(ncomp):
                cid, sampling, tq = body[6 + 3 * c:9 + 3 * c]
                if sampling != 0x11:
                    raise NotImplementedError("chroma subsampling")
                comps.append((cid, tq))
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("progressive/arithmetic JPEG")
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1:i + 17])
                if len(bits) != 16:
                    raise ValueError("truncated DHT")
                nvals = sum(bits)
                vals = list(body[i + 17:i + 17 + nvals])
                if len(vals) != nvals:
                    raise ValueError("truncated DHT values")
                htables[(tc, th)] = _decode_table(bits, vals)
                i += 17 + nvals
        elif marker == 0xDD:
            raise NotImplementedError("restart intervals")
        elif marker == 0xDA:  # SOS
            if not body:
                raise ValueError("truncated SOS")
            ns = body[0]
            if len(body) < 1 + 2 * ns:
                raise ValueError("truncated SOS components")
            scan_comps = []
            for c in range(ns):
                cid = body[1 + 2 * c]
                dc_id = body[2 + 2 * c] >> 4
                ac_id = body[2 + 2 * c] & 0x0F
                scan_comps.append((cid, dc_id, ac_id))
            scan_start = pos + seglen
            break
        pos += seglen
    if width is None or scan_start is None:
        raise ValueError("missing SOF/SOS")
    if len(scan_comps) != len(comps):
        raise NotImplementedError("multi-scan JPEG")
    if width * height > 100_000_000:
        raise ValueError("implausible JPEG dimensions")
    q_ids = dict(comps)
    if any(cid not in q_ids for cid, _, _ in scan_comps):
        raise ValueError("SOS references unknown component")

    br = _BitReader(data, scan_start)
    bx = (width + 7) // 8
    by = (height + 7) // 8
    q_by_cid = dict(comps)
    planes = {cid: np.zeros((by * 8, bx * 8), dtype=np.float64)
              for cid, _, _ in scan_comps}
    prev_dc = {cid: 0 for cid, _, _ in scan_comps}
    for mby in range(by):
        for mbx in range(bx):
            for cid, dc_id, ac_id in scan_comps:
                dc_tbl = htables.get((0, dc_id))
                ac_tbl = htables.get((1, ac_id))
                qtbl = qtables.get(q_by_cid[cid])
                if dc_tbl is None or ac_tbl is None or qtbl is None:
                    raise ValueError("missing Huffman/quant table")
                zz = np.zeros(64, dtype=np.int64)
                cat = _huff_decode(br, dc_tbl)
                if cat > 15:
                    raise ValueError("bad DC category")
                diff = _extend(br.read_bits(cat), cat)
                prev_dc[cid] += diff
                zz[0] = prev_dc[cid]
                k = 1
                while k < 64:
                    sym = _huff_decode(br, ac_tbl)
                    if sym == 0x00:  # EOB
                        break
                    run, size = sym >> 4, sym & 0x0F
                    if size == 0:
                        if run != 15:
                            raise ValueError("bad AC symbol")
                        k += 16  # ZRL
                        continue
                    k += run
                    if k > 63:
                        raise ValueError("AC index overflow")
                    zz[k] = _extend(br.read_bits(size), size)
                    k += 1
                rast = np.zeros(64, dtype=np.float64)
                rast[ZIGZAG] = zz * qtbl[ZIGZAG]
                block = _T.T @ rast.reshape(8, 8) @ _T
                planes[cid][mby * 8:mby * 8 + 8,
                            mbx * 8:mbx * 8 + 8] = block
    luma_cid = scan_comps[0][0]
    luma = np.clip(np.rint(planes[luma_cid] + 128.0), 0, 255)
    return width, height, luma[:height, :width].astype(np.uint8).tobytes()
