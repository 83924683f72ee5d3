"""Content-stream tokenizer: bytes -> [(operator, operands)].

Lenient by design (reference: crates/pdfplumber-parse/src/tokenizer.rs:60-161):
malformed tokens are skipped with a warning, never fatal. Inline images
(BI ... ID <data> EI) are captured as a single `BI` operator whose operand
is (dict, raw_bytes) (tokenizer.rs:681-790).
"""

from __future__ import annotations

from .objects import Kw, Lexer, LexError, Name

# Inline-image abbreviated key expansion (tokenizer.rs:721-756)
_II_KEY_ABBREV = {
    "BPC": "BitsPerComponent",
    "CS": "ColorSpace",
    "D": "Decode",
    "DP": "DecodeParms",
    "F": "Filter",
    "H": "Height",
    "IM": "ImageMask",
    "I": "Interpolate",
    "W": "Width",
}
_II_VALUE_ABBREV = {
    "G": "DeviceGray",
    "RGB": "DeviceRGB",
    "CMYK": "DeviceCMYK",
    "I": "Indexed",
    "AHx": "ASCIIHexDecode",
    "A85": "ASCII85Decode",
    "LZW": "LZWDecode",
    "Fl": "FlateDecode",
    "RL": "RunLengthDecode",
    "CCF": "CCITTFaxDecode",
    "DCT": "DCTDecode",
}

_IS_WS = frozenset(b"\x00\t\n\x0c\r ")


class Operator:
    __slots__ = ("name", "operands")

    def __init__(self, name: str, operands: list) -> None:
        self.name = name
        self.operands = operands

    def __repr__(self) -> str:  # pragma: no cover
        return f"Op({self.name} {self.operands})"


def _capture_inline_image(lexer: Lexer, img_dict: dict) -> bytes:
    """After ID, capture raw data until a whitespace-delimited EI."""
    data = lexer.data
    pos = lexer.pos
    # exactly one whitespace byte after ID per spec
    if pos < lexer.end and data[pos] in b"\x00\t\n\x0c\r ":
        pos += 1
    start = pos
    end = lexer.end
    while pos < end:
        # find candidate 'EI'
        idx = data.find(b"EI", pos)
        if idx < 0:
            pos = end
            break
        before_ok = idx == start or data[idx - 1] in b"\x00\t\n\x0c\r "
        after = data[idx + 2] if idx + 2 < end else 0x20
        after_ok = after in b"\x00\t\n\x0c\r " or idx + 2 >= end
        if before_ok and after_ok:
            lexer.pos = idx + 2
            return data[start:idx].rstrip(b"\x00\t\n\x0c\r ")
        pos = idx + 2
    lexer.pos = end
    return data[start:end]


def tokenize(content: bytes, warnings: list[str] | None = None) -> list[Operator]:
    """Lenient tokenize of one (concatenated) content stream."""
    ops: list[Operator] = []
    operands: list = []
    lexer = Lexer(content)
    while True:
        try:
            obj = lexer.next_object()
        except StopIteration:
            break
        except LexError as e:
            if warnings is not None:
                warnings.append(f"tokenize: {e}")
            operands = []
            continue
        if isinstance(obj, Kw):
            name = obj.name.decode("latin-1")
            if name == "BI":
                # inline image: parse key/value pairs until ID
                img: dict = {}
                while True:
                    try:
                        k = lexer.next_object()
                    except (StopIteration, LexError):
                        break
                    if isinstance(k, Kw) and k.name == b"ID":
                        break
                    if not isinstance(k, Name):
                        continue
                    try:
                        v = lexer.next_object()
                    except (StopIteration, LexError):
                        break
                    key = _II_KEY_ABBREV.get(str(k), str(k))
                    if isinstance(v, Name):
                        v = Name(_II_VALUE_ABBREV.get(str(v), str(v)))
                    elif isinstance(v, list):
                        v = [
                            Name(_II_VALUE_ABBREV.get(str(x), str(x)))
                            if isinstance(x, Name)
                            else x
                            for x in v
                        ]
                    img[key] = v
                raw = _capture_inline_image(lexer, img)
                ops.append(Operator("BI", [img, raw]))
                operands = []
            else:
                ops.append(Operator(name, operands))
                operands = []
        else:
            operands.append(obj)
            # defensive bound: operand floods from corrupt streams
            if len(operands) > 10_000:
                if warnings is not None:
                    warnings.append("tokenize: operand overflow, resetting")
                operands = []
    return ops
