"""Simple-font encodings: WinAnsi / MacRoman / Standard + /Differences.

Decodes a single-byte char code to a unicode char. WinAnsi is cp1252 and
MacRoman is mac-roman (both available as Python codecs); StandardEncoding
differs from ASCII in a handful of slots, handled via a delta table.
Glyph names for /Differences use a compact Adobe-Glyph-List subset plus
the uniXXXX / uXXXX[XX] conventions.

Reference parity: crates/pdfplumber-parse/src/encoding.rs (semantics only).
"""

from __future__ import annotations

# Adobe StandardEncoding deltas vs Latin-1 printable range.
# Slots not listed and not ASCII-printable are undefined (None).
_STD_DELTAS = {
    0x27: "’",  # quoteright
    0x60: "‘",  # quoteleft
    0xA4: "⁄",  # fraction
    0xA6: "ƒ",  # florin
    0xA8: "¤",  # currency
    0xA9: "'",  # quotesingle
    0xAA: "“",  # quotedblleft
    0xAB: "«",
    0xAC: "‹",
    0xAD: "›",
    0xAE: "ﬁ",  # fi
    0xAF: "ﬂ",  # fl
    0xB1: "–",  # endash
    0xB2: "†",  # dagger
    0xB3: "‡",  # daggerdbl
    0xB4: "·",  # periodcentered
    0xB6: "¶",
    0xB7: "•",  # bullet
    0xB8: "‚",  # quotesinglbase
    0xB9: "„",  # quotedblbase
    0xBA: "”",  # quotedblright
    0xBB: "»",
    0xBC: "…",  # ellipsis
    0xBD: "‰",  # perthousand
    0xBF: "¿",
    0xC1: "`",  # grave
    0xC2: "´",  # acute
    0xC3: "ˆ",  # circumflex
    0xC4: "˜",  # tilde
    0xC5: "¯",  # macron
    0xC6: "˘",  # breve
    0xC7: "˙",  # dotaccent
    0xC8: "¨",  # dieresis
    0xCA: "˚",  # ring
    0xCB: "¸",  # cedilla
    0xCD: "˝",  # hungarumlaut
    0xCE: "˛",  # ogonek
    0xCF: "ˇ",  # caron
    0xD0: "—",  # emdash
    0xE1: "Æ",  # AE
    0xE3: "ª",  # ordfeminine
    0xE8: "Ł",  # Lslash
    0xE9: "Ø",  # Oslash
    0xEA: "Œ",  # OE
    0xEB: "º",  # ordmasculine
    0xF1: "æ",  # ae
    0xF5: "ı",  # dotlessi
    0xF8: "ł",  # lslash
    0xF9: "ø",  # oslash
    0xFA: "œ",  # oe
    0xFB: "ß",  # germandbls
}


def _build_table(codec: str) -> list[str | None]:
    table: list[str | None] = [None] * 256
    for i in range(256):
        try:
            table[i] = bytes([i]).decode(codec)
        except UnicodeDecodeError:
            table[i] = None
    return table


_WINANSI = _build_table("cp1252")
# cp1252 leaves a few slots undefined that WinAnsi treats as bullets per spec
for _i in (0x81, 0x8D, 0x8F, 0x90, 0x9D):
    _WINANSI[_i] = "•"
_MACROMAN = _build_table("mac-roman")
# the encodings define NO glyphs at control positions (the codecs map the
# bytes to themselves) — pdfminer treats such codes as unmapped → (cid:N)
for _i in list(range(0x00, 0x20)) + [0x7F]:
    _WINANSI[_i] = None
    _MACROMAN[_i] = None
_STANDARD: list[str | None] = [None] * 256
for _i in range(0x20, 0x7F):
    _STANDARD[_i] = chr(_i)
_STANDARD.pop(0)  # no-op to appease linters about mutation pattern
_STANDARD.insert(0, None)
for _k, _v in _STD_DELTAS.items():
    _STANDARD[_k] = _v

_BASE_TABLES = {
    "WinAnsiEncoding": _WINANSI,
    "MacRomanEncoding": _MACROMAN,
    "StandardEncoding": _STANDARD,
    "MacExpertEncoding": _STANDARD,  # rare; approximate
}

# Compact Adobe Glyph List subset for /Differences resolution.
_AGL = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#", "dollar": "$",
    "percent": "%", "ampersand": "&", "quotesingle": "'", "parenleft": "(",
    "parenright": ")", "asterisk": "*", "plus": "+", "comma": ",", "hyphen": "-",
    "period": ".", "slash": "/", "zero": "0", "one": "1", "two": "2", "three": "3",
    "four": "4", "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=", "greater": ">",
    "question": "?", "at": "@", "bracketleft": "[", "backslash": "\\",
    "bracketright": "]", "asciicircum": "^", "underscore": "_", "grave": "`",
    "braceleft": "{", "bar": "|", "braceright": "}", "asciitilde": "~",
    "quoteleft": "‘", "quoteright": "’", "quotedblleft": "“",
    "quotedblright": "”", "quotesinglbase": "‚", "quotedblbase": "„",
    "endash": "–", "emdash": "—", "bullet": "•", "ellipsis": "…",
    "dagger": "†", "daggerdbl": "‡", "perthousand": "‰",
    "guilsinglleft": "‹", "guilsinglright": "›", "fraction": "⁄",
    "florin": "ƒ", "fi": "ﬁ", "fl": "ﬂ", "ff": "ﬀ",
    "ffi": "ﬃ", "ffl": "ﬄ", "dotlessi": "ı", "lslash": "ł",
    "Lslash": "Ł", "oe": "œ", "OE": "Œ", "oslash": "ø",
    "Oslash": "Ø", "ae": "æ", "AE": "Æ", "germandbls": "ß",
    "cent": "¢", "sterling": "£", "yen": "¥", "currency": "¤",
    "section": "§", "dieresis": "¨", "copyright": "©",
    "ordfeminine": "ª", "guillemotleft": "«", "logicalnot": "¬",
    "registered": "®", "macron": "¯", "degree": "°",
    "plusminus": "±", "acute": "´", "mu": "µ", "paragraph": "¶",
    "periodcentered": "·", "cedilla": "¸", "ordmasculine": "º",
    "guillemotright": "»", "onequarter": "¼", "onehalf": "½",
    "threequarters": "¾", "questiondown": "¿", "exclamdown": "¡",
    "multiply": "×", "divide": "÷", "brokenbar": "¦",
    "circumflex": "ˆ", "tilde": "˜", "caron": "ˇ", "breve": "˘",
    "dotaccent": "˙", "ring": "˚", "ogonek": "˛",
    "hungarumlaut": "˝", "trademark": "™", "Euro": "€",
    "minus": "−", "nbspace": " ", "softhyphen": "­",
}
# Accented Latin glyph names (Agrave..ydieresis) -> code points
_LATIN_GLYPHS = {
    "Agrave": 0xC0, "Aacute": 0xC1, "Acircumflex": 0xC2, "Atilde": 0xC3,
    "Adieresis": 0xC4, "Aring": 0xC5, "Ccedilla": 0xC7, "Egrave": 0xC8,
    "Eacute": 0xC9, "Ecircumflex": 0xCA, "Edieresis": 0xCB, "Igrave": 0xCC,
    "Iacute": 0xCD, "Icircumflex": 0xCE, "Idieresis": 0xCF, "Eth": 0xD0,
    "Ntilde": 0xD1, "Ograve": 0xD2, "Oacute": 0xD3, "Ocircumflex": 0xD4,
    "Otilde": 0xD5, "Odieresis": 0xD6, "Ugrave": 0xD9, "Uacute": 0xDA,
    "Ucircumflex": 0xDB, "Udieresis": 0xDC, "Yacute": 0xDD, "Thorn": 0xDE,
    "agrave": 0xE0, "aacute": 0xE1, "acircumflex": 0xE2, "atilde": 0xE3,
    "adieresis": 0xE4, "aring": 0xE5, "ccedilla": 0xE7, "egrave": 0xE8,
    "eacute": 0xE9, "ecircumflex": 0xEA, "edieresis": 0xEB, "igrave": 0xEC,
    "iacute": 0xED, "icircumflex": 0xEE, "idieresis": 0xEF, "eth": 0xF0,
    "ntilde": 0xF1, "ograve": 0xF2, "oacute": 0xF3, "ocircumflex": 0xF4,
    "otilde": 0xF5, "odieresis": 0xF6, "ugrave": 0xF9, "uacute": 0xFA,
    "ucircumflex": 0xFB, "udieresis": 0xFC, "yacute": 0xFD, "thorn": 0xFE,
    "ydieresis": 0xFF, "Scaron": 0x160, "scaron": 0x161, "Zcaron": 0x17D,
    "zcaron": 0x17E, "Ydieresis": 0x178,
}
for _n, _c in _LATIN_GLYPHS.items():
    _AGL[_n] = chr(_c)
# single letters/digits map to themselves
for _c in range(0x41, 0x5B):
    _AGL[chr(_c)] = chr(_c)
for _c in range(0x61, 0x7B):
    _AGL[chr(_c)] = chr(_c)


def glyph_name_to_unicode(name: str) -> str | None:
    if name in _AGL:
        return _AGL[name]
    if name.startswith("uni") and len(name) >= 7:
        try:
            return chr(int(name[3:7], 16))
        except ValueError:
            return None
    if name.startswith("u") and 5 <= len(name) <= 7:
        try:
            return chr(int(name[1:], 16))
        except ValueError:
            return None
    # gNN / cidNN / index names: unresolvable without the font program
    return None


class SimpleEncoding:
    """Base encoding table + /Differences overlay. decode(code) -> str|None."""

    __slots__ = ("table",)

    def __init__(self, base: str | None, differences: list | None = None) -> None:
        base_table = _BASE_TABLES.get(base or "", _STANDARD)
        self.table: list[str | None] = list(base_table)
        if differences:
            code = 0
            for item in differences:
                if isinstance(item, (int, float)):
                    code = int(item)
                else:
                    if 0 <= code <= 255:
                        u = glyph_name_to_unicode(str(item))
                        if u is not None:
                            self.table[code] = u
                    code += 1

    def decode(self, code: int) -> str | None:
        if 0 <= code <= 255:
            return self.table[code]
        return None
