"""Minimal CFF (Type1C / CIDFontType0C) parsing for glyph widths.

Parity with crates/pdfplumber-parse/src/cff.rs:38-575: header → Name
INDEX → Top DICT (CharStrings offset op 17, Private size/offset op 18)
→ Private DICT (defaultWidthX op 20, nominalWidthX op 21) → CharStrings
INDEX; each Type 2 charstring's optional leading width operand is
recovered by scanning operands up to the first stack-clearing operator
(stems/moveto/endchar/hintmask arg-count parity rules).

Widths are indexed by glyph id, already in 1000-unit glyph space
(CFF charstring widths are expressed in the font's design units, which
for Type1C is conventionally a 1000-unit em).
"""

from __future__ import annotations

import struct


def _parse_index(data: bytes, off: int) -> tuple[list[bytes], int] | None:
    """CFF INDEX at off → (items, end_offset)."""
    if off + 2 > len(data):
        return None
    count = struct.unpack_from(">H", data, off)[0]
    if count == 0:
        return [], off + 2
    if off + 3 > len(data):
        return None
    off_size = data[off + 2]
    if off_size < 1 or off_size > 4:
        return None
    pos = off + 3
    n_offsets = count + 1
    if pos + n_offsets * off_size > len(data):
        return None
    offsets = []
    for i in range(n_offsets):
        v = 0
        for b in data[pos + i * off_size : pos + (i + 1) * off_size]:
            v = (v << 8) | b
        offsets.append(v)
    data_start = pos + n_offsets * off_size - 1  # offsets are 1-based
    end = data_start + offsets[-1]
    if end > len(data):
        return None
    items = [data[data_start + offsets[i] : data_start + offsets[i + 1]]
             for i in range(count)]
    return items, end


def _parse_dict(data: bytes) -> dict[int, list[float]]:
    """CFF DICT → {operator: operands}. 2-byte ops keyed as 1200+op."""
    out: dict[int, list[float]] = {}
    operands: list[float] = []
    pos = 0
    n = len(data)
    while pos < n:
        b0 = data[pos]
        if b0 <= 21:  # operator
            if b0 == 12:
                if pos + 1 >= n:
                    break
                out[1200 + data[pos + 1]] = operands
                operands = []
                pos += 2
            else:
                out[b0] = operands
                operands = []
                pos += 1
        elif b0 == 28:
            if pos + 2 >= n:
                break
            operands.append(float(struct.unpack_from(">h", data, pos + 1)[0]))
            pos += 3
        elif b0 == 29:
            if pos + 4 >= n:
                break
            operands.append(float(struct.unpack_from(">i", data, pos + 1)[0]))
            pos += 5
        elif b0 == 30:  # real number (BCD nibbles)
            pos += 1
            buf = []
            done = False
            while pos < n and not done:
                byte = data[pos]
                pos += 1
                for nib in (byte >> 4, byte & 0xF):
                    if nib <= 9:
                        buf.append(str(nib))
                    elif nib == 0xA:
                        buf.append(".")
                    elif nib == 0xB:
                        buf.append("E")
                    elif nib == 0xC:
                        buf.append("E-")
                    elif nib == 0xE:
                        buf.append("-")
                    elif nib == 0xF:
                        done = True
                        break
            try:
                operands.append(float("".join(buf)))
            except ValueError:
                operands.append(0.0)
        elif 32 <= b0 <= 246:
            operands.append(float(b0 - 139))
            pos += 1
        elif 247 <= b0 <= 250:
            if pos + 1 >= n:
                break
            operands.append((b0 - 247) * 256.0 + data[pos + 1] + 108.0)
            pos += 2
        elif 251 <= b0 <= 254:
            if pos + 1 >= n:
                break
            operands.append(-(b0 - 251) * 256.0 - data[pos + 1] - 108.0)
            pos += 2
        else:
            pos += 1
    return out


def _charstring_width(cs: bytes, default_w: float, nominal_w: float) -> float:
    """Optional leading width of a Type 2 charstring (cff.rs:453-566)."""
    stack: list[float] = []
    pos = 0
    n = len(cs)
    while pos < n:
        b0 = cs[pos]
        if b0 in (1, 3, 18, 23, 19, 20):  # stems / hintmask: odd arity → width
            return nominal_w + stack[0] if len(stack) % 2 == 1 else default_w
        if b0 in (4, 22):  # vmoveto / hmoveto: 1 arg
            return nominal_w + stack[0] if len(stack) > 1 else default_w
        if b0 == 14:  # endchar: 0 args
            return nominal_w + stack[0] if stack else default_w
        if b0 == 21:  # rmoveto: 2 args
            return nominal_w + stack[0] if len(stack) > 2 else default_w
        if b0 == 12:  # escape ops clear the stack; no width
            return default_w
        if b0 == 28:
            if pos + 2 >= n:
                break
            stack.append(float(struct.unpack_from(">h", cs, pos + 1)[0]))
            pos += 3
        elif b0 == 255:
            if pos + 4 >= n:
                break
            stack.append(struct.unpack_from(">i", cs, pos + 1)[0] / 65536.0)
            pos += 5
        elif 32 <= b0 <= 246:
            stack.append(float(b0 - 139))
            pos += 1
        elif 247 <= b0 <= 250:
            if pos + 1 >= n:
                break
            stack.append((b0 - 247) * 256.0 + cs[pos + 1] + 108.0)
            pos += 2
        elif 251 <= b0 <= 254:
            if pos + 1 >= n:
                break
            stack.append(-(b0 - 251) * 256.0 - cs[pos + 1] - 108.0)
            pos += 2
        elif 5 <= b0 <= 31:  # other operators: width already decided
            return default_w
        else:
            pos += 1
    return default_w


def parse_cff_widths(data: bytes) -> list[float] | None:
    """Per-glyph widths indexed by glyph id; None when unusable."""
    if len(data) < 6 or data[0] != 1:
        return None
    hdr_size = data[2]
    if hdr_size < 4 or hdr_size > len(data):
        return None
    name_idx = _parse_index(data, hdr_size)
    if name_idx is None:
        return None
    top_idx = _parse_index(data, name_idx[1])
    if top_idx is None or not top_idx[0]:
        return None
    top = _parse_dict(top_idx[0][0])
    cs_off = top.get(17)
    priv = top.get(18)
    if not cs_off:
        return None
    default_w, nominal_w = 0.0, 0.0
    if priv and len(priv) >= 2:
        size, off = int(priv[0]), int(priv[1])
        if 0 <= off and off + size <= len(data):
            pd = _parse_dict(data[off : off + size])
            if 20 in pd and pd[20]:
                default_w = pd[20][0]
            if 21 in pd and pd[21]:
                nominal_w = pd[21][0]
    cs_idx = _parse_index(data, int(cs_off[0]))
    if cs_idx is None:
        return None
    return [_charstring_width(cs, default_w, nominal_w) for cs in cs_idx[0]]
