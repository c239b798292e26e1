"""Deterministic HTML -> text extraction.

New functionality (the reference operates on plain text only); required by
the graft's input contract: pages arrive as ``html: binary`` and the
extracted ``text`` must be byte-identical per url between the pure-Python
oracle and the Spark UDF — trivially guaranteed by running THIS function in
both places (BASELINE.json input_hint invariant).

Rules (fixed, documented, order-independent of parser quirks):
- content inside <script> <style> <noscript> <template> and comments is
  dropped;
- character/entity references are decoded;
- every text chunk is whitespace-collapsed; chunks accumulate into the
  current line separated by single spaces when needed;
- block-level boundaries (p, div, br, h1-h6, li, ul, ol, table, tr, td,
  th, section, article, header, footer, title, blockquote, pre, hr)
  terminate the current line;
- empty lines are dropped; lines are joined with "\n".
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

_WS = re.compile(r"\s+")

_SKIP_TAGS = frozenset({"script", "style", "noscript", "template"})
_BLOCK_TAGS = frozenset(
    {
        "p", "div", "br", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul",
        "ol", "table", "tr", "td", "th", "section", "article", "header",
        "footer", "title", "blockquote", "pre", "hr",
    }
)


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._skip_depth = 0
        self._lines: list[str] = []
        self._current: list[str] = []

    def _flush(self) -> None:
        if self._current:
            line = " ".join(self._current)
            if line:
                self._lines.append(line)
            self._current = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
        elif tag in _BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
        elif tag in _BLOCK_TAGS:
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._skip_depth:
            return
        chunk = _WS.sub(" ", data).strip()
        if chunk:
            self._current.append(chunk)

    def result(self) -> str:
        self._flush()
        return "\n".join(self._lines)


def extract_text(html: bytes | str) -> str:
    """Extract readable text from an HTML document (bytes decoded UTF-8,
    errors replaced deterministically)."""
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    parser = _Extractor()
    parser.feed(html)
    parser.close()
    return parser.result()
