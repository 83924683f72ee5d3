"""Pure-Python GIF codec — no codec library.

Encoder: grayscale GIF89a with a 256-entry gray global color table and
the classic "uncompressed" LZW stream (every pixel emitted as its own
9-bit code with a CLEAR every 254 codes, so the code width never
grows) — byte-exact lossless, decodable by any GIF reader.

Decoder: full variable-width LSB-first GIF LZW (clear/EOI, width
growth to 12 bits), global or local color table, extension-block
skipping; returns the first image frame as 8-bit luma (ITU-R 601
integer weights — exact for gray palettes). Interlaced frames raise
NotImplementedError (plug Pillow in production).

Note the deliberate asymmetry with the PDF filter chain: PDF LZW
(kernel/filters.py lzw_decode) is MSB-first with a fixed alphabet;
GIF LZW is LSB-first with a min-code-size-dependent alphabet — they
share nothing but the name, hence the separate implementation.
"""

from __future__ import annotations

import struct


def make_gif_gray(width: int, height: int, pixels: bytes) -> bytes:
    """Real grayscale GIF89a; len(pixels) == width*height, values are
    both palette indices and gray levels (palette[i] = (i, i, i))."""
    if len(pixels) != width * height:
        raise ValueError("pixel buffer size mismatch")
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", width, height, 0xF7, 0, 0)  # 256-entry GCT
    for i in range(256):
        out += bytes((i, i, i))
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
    out.append(8)  # LZW minimum code size

    # uncompressed LZW: 9-bit codes, CLEAR every 254 pixels so the
    # decoder's table never reaches the 10-bit threshold
    CLEAR, EOI = 256, 257
    acc = n = 0
    stream = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, n
        acc |= code << n  # LSB-first
        n += 9
        while n >= 8:
            stream.append(acc & 0xFF)
            acc >>= 8
            n -= 8

    emit(CLEAR)
    since_clear = 0
    for px in pixels:
        if since_clear == 254:
            emit(CLEAR)
            since_clear = 0
        emit(px)
        since_clear += 1
    emit(EOI)
    if n:
        stream.append(acc & 0xFF)
    for i in range(0, len(stream), 255):
        chunk = stream[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def decode_gif(data: bytes) -> tuple[int, int, bytes]:
    """Decode the first frame of a GIF87a/89a to (width, height, luma
    bytes). Gray palettes round-trip exactly; color palettes collapse
    via integer ITU-R 601 luma."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    if len(data) < 13:
        raise ValueError("truncated logical screen descriptor")
    packed = data[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = data[pos:pos + 3 * n]
        if len(gct) != 3 * n:
            raise ValueError("truncated global color table")
        pos += 3 * n
    while pos < len(data):
        b = data[pos]
        if b == 0x3B:  # trailer before any image
            raise ValueError("GIF contains no image data")
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02X}")
        if pos + 10 > len(data):
            raise ValueError("truncated image descriptor")
        _, _, w, h, ipacked = struct.unpack("<HHHHB", data[pos + 1:pos + 10])
        pos += 10
        if w == 0 or h == 0 or w * h > 100_000_000:
            raise ValueError("bad GIF frame dimensions")
        if ipacked & 0x40:
            raise NotImplementedError("interlaced GIF")
        ct = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            ct = data[pos:pos + 3 * n]
            if len(ct) != 3 * n:
                raise ValueError("truncated local color table")
            pos += 3 * n
        if ct is None:
            raise ValueError("no color table")
        if pos >= len(data):
            raise ValueError("missing LZW minimum code size")
        min_code = data[pos]
        pos += 1
        lzw = bytearray()
        while pos < len(data) and data[pos] != 0:
            ln = data[pos]
            chunk = data[pos + 1:pos + 1 + ln]
            if len(chunk) != ln:
                raise ValueError("truncated image sub-block")
            lzw += chunk
            pos += 1 + ln
        indices = _lzw_decode_gif(bytes(lzw), min_code, w * h)
        luma = bytearray(w * h)
        for i, idx in enumerate(indices):
            off = 3 * idx
            if off + 3 > len(ct):
                raise ValueError("palette index out of range")
            r, g, bl = ct[off], ct[off + 1], ct[off + 2]
            luma[i] = (299 * r + 587 * g + 114 * bl + 500) // 1000
        return w, h, bytes(luma)
    raise ValueError("GIF contains no image data")


def _lzw_decode_gif(data: bytes, min_code: int, max_pixels: int) -> bytes:
    """LSB-first GIF LZW: code width starts at min_code+1, grows when
    the table fills the current width (cap 12 bits), CLEAR resets."""
    if not 2 <= min_code <= 8:
        raise ValueError("bad LZW minimum code size")
    CLEAR = 1 << min_code
    EOI = CLEAR + 1

    def fresh_table() -> list[bytes]:
        return [bytes([i]) for i in range(CLEAR)] + [b"", b""]

    table = fresh_table()
    width = min_code + 1
    acc = nbits = 0
    prev: bytes | None = None
    out = bytearray()
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == CLEAR:
                table = fresh_table()
                width = min_code + 1
                prev = None
                continue
            if code == EOI:
                return bytes(out[:max_pixels])
            if prev is None:
                if code >= len(table):
                    raise ValueError("bad first LZW code")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("LZW code out of range")
            out += entry
            prev = entry
            if len(table) >= (1 << width) and width < 12:
                width += 1
            if len(out) >= max_pixels:
                return bytes(out[:max_pixels])
    raise ValueError("LZW stream ended without EOI")
