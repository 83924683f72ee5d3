"""HTML main-content extraction: boilerplate stripping via DOM block
heuristics (north rule: "HTML boilerplate strip, PDF/layout parse, DOM
heuristics").

A jusText/boilerpipe-lite pass over stdlib html.parser — no external
dependencies, deterministic, lenient on malformed markup:

1. DOM walk drops non-content subtrees outright (script/style/noscript/
   template/head, and the nav/header/footer/aside landmarks).
2. Text accumulates into BLOCKS at block-level element boundaries
   (p, h1-h6, li, td, th, div, section, article, blockquote, pre, br).
3. Per block: word count and LINK DENSITY (fraction of words inside
   <a>). A block is CONTENT when it has >= `min_words` words and link
   density <= `max_link_density`; headings (h1-h6) only need one word
   (they label content but are short). Everything else is boilerplate
   (navs are short and link-dense — the classic separation).

The kernel returns (text, n_blocks_kept, n_blocks_total) so the Spark
layer exposes both the cleaned text and the strip diagnostics.
"""

from __future__ import annotations

from html.parser import HTMLParser

_DROP = {"script", "style", "noscript", "template", "head",
         "nav", "header", "footer", "aside"}
_BLOCK = {"p", "h1", "h2", "h3", "h4", "h5", "h6", "li", "td", "th",
          "div", "section", "article", "blockquote", "pre", "tr",
          "table", "ul", "ol", "body", "html", "main", "figure",
          "figcaption"}
_HEADING = {"h1", "h2", "h3", "h4", "h5", "h6"}


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[str, int, int, bool]] = []
        self.links: list[str] = []  # every href, incl. dropped subtrees
        self.anchors: list[tuple[str, str]] = []  # (href, anchor text)
        self._a_stack: list[list] = []  # open <a>: [href, text parts]
        # current block accumulators
        self._parts: list[str] = []
        self._link_words = 0
        self._heading = False
        self._drop_depth = 0
        self._link_depth = 0

    # -- block lifecycle ---------------------------------------------------

    def _flush(self) -> None:
        text = " ".join("".join(self._parts).split())
        if text:
            n_words = len(text.split())
            self.blocks.append(
                (text, n_words, self._link_words, self._heading))
        self._parts = []
        self._link_words = 0
        self._heading = False

    # -- parser hooks ------------------------------------------------------

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == "a":
            for k, v in attrs:
                if k == "href" and v:
                    self.links.append(v)
                    self._a_stack.append([v, []])
                    break
        if tag in _DROP:
            self._drop_depth += 1
            return
        if self._drop_depth:
            return
        if tag == "a":
            self._link_depth += 1
        if tag == "br" or tag in _BLOCK:
            self._flush()
            if tag in _HEADING:
                self._heading = True

    def _pop_anchor(self) -> None:
        href, parts = self._a_stack.pop()
        self.anchors.append((href, " ".join("".join(parts).split())))

    def handle_endtag(self, tag: str) -> None:
        if tag == "a" and self._a_stack:
            self._pop_anchor()
        if tag in _DROP:
            self._drop_depth = max(0, self._drop_depth - 1)
            return
        if self._drop_depth:
            return
        if tag == "a":
            self._link_depth = max(0, self._link_depth - 1)
        if tag in _BLOCK:
            self._flush()

    def handle_data(self, data: str) -> None:
        if data:  # anchor text accumulates even in dropped chrome —
            for a in self._a_stack:  # the link graph wants ALL anchors
                a[1].append(data)
        if self._drop_depth or not data:
            return
        self._parts.append(data)
        if self._link_depth:
            self._link_words += len(data.split())

    def close(self) -> None:  # final partial block + unclosed anchors
        super().close()
        while self._a_stack:
            self._pop_anchor()
        self._flush()


def extract_main_content(html: bytes | str, min_words: int = 5,
                         max_link_density: float = 0.33) -> dict:
    """Strip boilerplate, keep content blocks. Returns
    {text, n_blocks_kept, n_blocks_total} — lenient: any parse failure
    yields empty text, never an exception."""
    if isinstance(html, bytes):
        html = html.decode("utf-8", "replace")
    p = _Extractor()
    try:
        p.feed(html)
        p.close()
    except Exception:  # noqa: BLE001 — malformed markup: keep what we got
        pass
    kept: list[str] = []
    for text, n_words, link_words, heading in p.blocks:
        density = link_words / n_words if n_words else 1.0
        if heading and n_words >= 1 and density <= max_link_density:
            kept.append(text)
        elif n_words >= min_words and density <= max_link_density:
            kept.append(text)
    return {
        "text": "\n".join(kept),
        "n_blocks_kept": len(kept),
        "n_blocks_total": len(p.blocks),
        "links": p.links,
        "anchors": p.anchors,
    }
