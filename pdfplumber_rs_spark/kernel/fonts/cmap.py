"""ToUnicode CMap parser: bfchar / bfrange (scalar + array forms).

Reference parity: crates/pdfplumber-parse/src/cmap.rs (bfchar/bfrange
semantics, codespace ranges, identity detection).
"""

from __future__ import annotations

from ..objects import Kw, Lexer, LexError, Name


def _bytes_to_code(b: bytes) -> int:
    return int.from_bytes(b, "big") if b else 0


def _bytes_to_unicode(b: bytes) -> str:
    """UTF-16BE destination string (may be multi-char)."""
    if len(b) == 1:
        return chr(b[0])
    try:
        return b.decode("utf-16-be")
    except UnicodeDecodeError:
        return b.decode("utf-16-be", "replace")


class ToUnicodeCMap:
    __slots__ = ("single", "ranges", "codespace_nbytes")

    def __init__(self) -> None:
        self.single: dict[int, str] = {}
        # (lo, hi, dst_first_codepoint or None, dst_list or None)
        self.ranges: list[tuple[int, int, int | None, list[str] | None]] = []
        self.codespace_nbytes: int = 1

    def lookup(self, code: int) -> str | None:
        hit = self.single.get(code)
        if hit is not None:
            return hit
        for lo, hi, dst0, dst_list in self.ranges:
            if lo <= code <= hi:
                if dst_list is not None:
                    idx = code - lo
                    return dst_list[idx] if idx < len(dst_list) else None
                if dst0 is not None:
                    return chr(dst0 + (code - lo))
        return None

    def is_identity(self) -> bool:
        """True when the mapping is a full-range identity (CID == Unicode)."""
        if self.single:
            return False
        if len(self.ranges) != 1:
            return False
        lo, hi, dst0, dst_list = self.ranges[0]
        return lo == 0 and hi >= 0xFFFE and dst_list is None and dst0 == 0


def parse_tounicode(data: bytes) -> ToUnicodeCMap:
    cmap = ToUnicodeCMap()
    lexer = Lexer(data)
    stack: list = []
    max_cs = 1
    while True:
        try:
            obj = lexer.next_object()
        except StopIteration:
            break
        except LexError:
            continue
        if isinstance(obj, Kw):
            kw = obj.name
            if kw == b"endbfchar" or kw == b"endbfrange" or kw == b"endcodespacerange":
                pass  # handled at begin
            elif kw == b"begincodespacerange":
                items = _collect_until(lexer, b"endcodespacerange")
                for i in range(0, len(items) - 1, 2):
                    lo = items[i]
                    if isinstance(lo, bytes):
                        max_cs = max(max_cs, len(lo))
            elif kw == b"beginbfchar":
                items = _collect_until(lexer, b"endbfchar")
                for i in range(0, len(items) - 1, 2):
                    src, dst = items[i], items[i + 1]
                    if isinstance(src, bytes) and isinstance(dst, bytes):
                        cmap.single[_bytes_to_code(src)] = _bytes_to_unicode(dst)
                        max_cs = max(max_cs, len(src))
            elif kw == b"beginbfrange":
                items = _collect_until(lexer, b"endbfrange")
                for i in range(0, len(items) - 2, 3):
                    lo, hi, dst = items[i], items[i + 1], items[i + 2]
                    if not (isinstance(lo, bytes) and isinstance(hi, bytes)):
                        continue
                    lo_c, hi_c = _bytes_to_code(lo), _bytes_to_code(hi)
                    max_cs = max(max_cs, len(lo))
                    if isinstance(dst, bytes):
                        if len(dst) <= 2:
                            cmap.ranges.append((lo_c, hi_c, _bytes_to_code(dst), None))
                        else:
                            # multi-char destination: store per-code strings
                            base = _bytes_to_unicode(dst)
                            lst = [base]
                            # increment last UTF-16 unit for subsequent codes
                            for k in range(1, hi_c - lo_c + 1):
                                lst.append(base[:-1] + chr(ord(base[-1]) + k))
                            cmap.ranges.append((lo_c, hi_c, None, lst))
                    elif isinstance(dst, list):
                        lst = [
                            _bytes_to_unicode(d) if isinstance(d, bytes) else "�"
                            for d in dst
                        ]
                        cmap.ranges.append((lo_c, hi_c, None, lst))
        stack.append(obj)
        if len(stack) > 64:
            del stack[:32]
    cmap.codespace_nbytes = max_cs
    return cmap


def _collect_until(lexer: Lexer, end_kw: bytes) -> list:
    out = []
    while True:
        try:
            obj = lexer.next_object()
        except StopIteration:
            return out
        except LexError:
            continue
        if isinstance(obj, Kw):
            if obj.name == end_kw:
                return out
            continue
        out.append(obj)
