"""Predefined CJK CMap handling via Python's built-in legacy codecs.

Same strategy as the reference (crates/pdfplumber-parse/src/
cjk_encoding.rs): instead of shipping Adobe's CID tables, decode the
raw byte string with the charset the CMap name implies (GBK, Big5,
Shift-JIS, EUC-JP/KR), and treat Unicode CMaps (UniXX-UCS2/UTF16) as
UTF-16-BE. Returns (codec, lead_rule) per CMap name.
"""

from __future__ import annotations

# base CMap name (H/V suffix stripped) → (python codec, lead rule)
# lead rules: '2byte' fixed two bytes; else a byte-range spec evaluated
# by is_lead_byte().
_CMAP_CODECS = {
    "GB-EUC": ("gbk", "gbk"),
    "GBpc-EUC": ("gbk", "gbk"),
    "GBK-EUC": ("gbk", "gbk"),
    "GBKp-EUC": ("gbk", "gbk"),
    "GBK2K": ("gb18030", "gbk"),
    "UniGB-UCS2": ("utf_16_be", "2byte"),
    "UniGB-UTF16": ("utf_16_be", "2byte"),
    "B5pc": ("big5", "big5"),
    "ETen-B5": ("big5", "big5"),
    "HKscs-B5": ("big5hkscs", "big5"),
    "UniCNS-UCS2": ("utf_16_be", "2byte"),
    "UniCNS-UTF16": ("utf_16_be", "2byte"),
    "78-RKSJ": ("shift_jis", "sjis"),
    "83pv-RKSJ": ("shift_jis", "sjis"),
    "90ms-RKSJ": ("shift_jis", "sjis"),
    "90msp-RKSJ": ("shift_jis", "sjis"),
    "90pv-RKSJ": ("shift_jis", "sjis"),
    "Add-RKSJ": ("shift_jis", "sjis"),
    "Ext-RKSJ": ("shift_jis", "sjis"),
    "EUC": ("euc_jp", "eucjp"),
    "H": ("jis", "2byte"),  # raw JIS X 0208: +0x80 then EUC-JP
    "V": ("jis", "2byte"),
    "UniJIS-UCS2": ("utf_16_be", "2byte"),
    "UniJIS-UTF16": ("utf_16_be", "2byte"),
    "KSC-EUC": ("euc_kr", "euckr"),
    "KSCms-UHC": ("cp949", "gbk"),
    "KSCms-UHC-HW": ("cp949", "gbk"),
    "KSCpc-EUC": ("euc_kr", "euckr"),
    "UniKS-UCS2": ("utf_16_be", "2byte"),
    "UniKS-UTF16": ("utf_16_be", "2byte"),
}


def codec_for_cmap(name: str):
    """(codec, lead_rule) for a predefined CMap name, else None."""
    base = name
    for suf in ("-H", "-V"):
        if base.endswith(suf):
            base = base[: -len(suf)]
            break
    return _CMAP_CODECS.get(base)


def is_lead_byte(b: int, rule: str) -> bool:
    if rule == "2byte":
        return True
    if rule in ("gbk", "big5"):
        return 0x81 <= b <= 0xFE
    if rule == "sjis":
        return 0x81 <= b <= 0x9F or 0xE0 <= b <= 0xFC
    if rule == "eucjp":
        return 0xA1 <= b <= 0xFE or b == 0x8E
    if rule == "euckr":
        return 0xA1 <= b <= 0xFE
    return False


def decode_cjk(raw: bytes, codec: str) -> str:
    if codec == "jis":
        raw = bytes((b + 0x80) & 0xFF for b in raw)
        codec = "euc_jp"
    try:
        return raw.decode(codec)
    except (UnicodeDecodeError, LookupError):
        return ""


def split_codes(data: bytes, rule: str) -> list[tuple[int, bytes]]:
    """Byte string → [(char_code, raw_bytes)] with lead-byte awareness."""
    out: list[tuple[int, bytes]] = []
    i = 0
    n = len(data)
    while i < n:
        b = data[i]
        if is_lead_byte(b, rule) and i + 1 < n:
            out.append(((b << 8) | data[i + 1], data[i : i + 2]))
            i += 2
        else:
            out.append((b, data[i : i + 1]))
            i += 1
    return out
