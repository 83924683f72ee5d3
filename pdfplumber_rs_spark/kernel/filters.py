"""Stream filters (decode). FlateDecode dominates real PDFs.

Mirrors crates/pdfplumber-parse/src/interpreter.rs:1911 decode_stream and
lopdf's filter handling; lenient — failures return b"" rather than raising.
"""

from __future__ import annotations

import zlib


def _apply_png_predictor(data: bytes, colors: int, bpc: int, columns: int) -> bytes:
    bpp = max(1, (colors * bpc + 7) // 8)
    rowlen = (columns * colors * bpc + 7) // 8
    out = bytearray()
    prev = bytearray(rowlen)
    i = 0
    n = len(data)
    while i + 1 <= n:
        ft = data[i]
        i += 1
        row = bytearray(data[i : i + rowlen])
        i += rowlen
        if len(row) < rowlen:
            row.extend(b"\x00" * (rowlen - len(row)))
        if ft == 0:
            pass
        elif ft == 1:  # Sub
            for j in range(bpp, rowlen):
                row[j] = (row[j] + row[j - bpp]) & 0xFF
        elif ft == 2:  # Up
            for j in range(rowlen):
                row[j] = (row[j] + prev[j]) & 0xFF
        elif ft == 3:  # Average
            for j in range(rowlen):
                left = row[j - bpp] if j >= bpp else 0
                row[j] = (row[j] + ((left + prev[j]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for j in range(rowlen):
                a = row[j - bpp] if j >= bpp else 0
                b = prev[j]
                c = prev[j - bpp] if j >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[j] = (row[j] + pred) & 0xFF
        out.extend(row)
        prev = row
    return bytes(out)


def flate_decode(data: bytes, decode_parms: dict | None = None) -> bytes:
    try:
        raw = zlib.decompress(data)
    except zlib.error:
        # lenient: try raw deflate / truncated stream
        try:
            raw = zlib.decompressobj().decompress(data)
        except zlib.error:
            try:
                raw = zlib.decompressobj(-15).decompress(data)
            except zlib.error:
                return b""
    if decode_parms:
        pred = int(decode_parms.get("Predictor", 1) or 1)
        if pred >= 10:
            raw = _apply_png_predictor(
                raw,
                int(decode_parms.get("Colors", 1) or 1),
                int(decode_parms.get("BitsPerComponent", 8) or 8),
                int(decode_parms.get("Columns", 1) or 1),
            )
    return raw


def ascii_hex_decode(data: bytes) -> bytes:
    digits = bytearray(c for c in data.split(b">")[0] if c in b"0123456789abcdefABCDEF")
    if len(digits) % 2:
        digits.append(0x30)
    try:
        return bytes.fromhex(digits.decode("ascii"))
    except ValueError:
        return b""


def ascii85_decode(data: bytes) -> bytes:
    import base64

    body = data
    if body.startswith(b"<~"):
        body = body[2:]
    end = body.find(b"~>")
    if end >= 0:
        body = body[:end]
    body = bytes(c for c in body if c not in b" \t\r\n\x0c\x00")
    try:
        return base64.a85decode(body)
    except ValueError:
        return b""


def run_length_decode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        l = data[i]
        i += 1
        if l == 128:
            break
        if l < 128:
            out.extend(data[i : i + l + 1])
            i += l + 1
        else:
            if i < n:
                out.extend(bytes([data[i]]) * (257 - l))
                i += 1
    return bytes(out)


def lzw_decode(data: bytes, decode_parms: dict | None = None) -> bytes:
    # Minimal LZW per PDF spec (early change = 1 default)
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    bits, acc, code_len = 0, 0, 9
    prev: bytes | None = None
    for byte in data:
        acc = (acc << 8) | byte
        bits += 8
        while bits >= code_len:
            bits -= code_len
            code = (acc >> bits) & ((1 << code_len) - 1)
            if code == 256:
                table = [bytes([i]) for i in range(256)] + [b"", b""]
                code_len = 9
                prev = None
                continue
            if code == 257:
                raw = bytes(out)
                if decode_parms and int(decode_parms.get("Predictor", 1) or 1) >= 10:
                    raw = _apply_png_predictor(
                        raw,
                        int(decode_parms.get("Colors", 1) or 1),
                        int(decode_parms.get("BitsPerComponent", 8) or 8),
                        int(decode_parms.get("Columns", 1) or 1),
                    )
                return raw
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            else:
                entry = prev + prev[:1]
                table.append(entry)
            out.extend(entry)
            prev = entry
            if len(table) + 1 >= (1 << code_len) and code_len < 12:
                code_len += 1
    raw = bytes(out)
    if decode_parms and int(decode_parms.get("Predictor", 1) or 1) >= 10:
        raw = _apply_png_predictor(
            raw,
            int(decode_parms.get("Colors", 1) or 1),
            int(decode_parms.get("BitsPerComponent", 8) or 8),
            int(decode_parms.get("Columns", 1) or 1),
        )
    return raw


_DECODERS = {
    "FlateDecode": flate_decode,
    "Fl": flate_decode,
    "ASCIIHexDecode": lambda d, p=None: ascii_hex_decode(d),
    "AHx": lambda d, p=None: ascii_hex_decode(d),
    "ASCII85Decode": lambda d, p=None: ascii85_decode(d),
    "A85": lambda d, p=None: ascii85_decode(d),
    "RunLengthDecode": lambda d, p=None: run_length_decode(d),
    "RL": lambda d, p=None: run_length_decode(d),
    "LZWDecode": lzw_decode,
    "LZW": lzw_decode,
}

# image-only filters we pass through undecoded (DCT/JPX/CCITT/JBIG2)
PASSTHROUGH_FILTERS = {"DCTDecode", "DCT", "JPXDecode", "CCITTFaxDecode", "CCF", "JBIG2Decode"}


def decode_stream(stream_dict: dict, raw: bytes, resolve) -> bytes:
    """Apply the /Filter chain. `resolve` maps Ref -> object."""
    filt = resolve(stream_dict.get("Filter"))
    parms = resolve(stream_dict.get("DecodeParms") or stream_dict.get("DP"))
    if filt is None:
        return raw
    filters = filt if isinstance(filt, list) else [filt]
    parms_list = parms if isinstance(parms, list) else [parms] * len(filters)
    data = raw
    for f, p in zip(filters, parms_list):
        f = resolve(f)
        p = resolve(p)
        name = str(f) if f is not None else ""
        if name in PASSTHROUGH_FILTERS:
            return data  # caller keeps encoded image data
        dec = _DECODERS.get(name)
        if dec is None:
            return data  # unknown filter: lenient passthrough
        data = dec(data, p if isinstance(p, dict) else None)
    return data
