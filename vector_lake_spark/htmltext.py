"""HTML → text extraction — the crawl-cleaning step between WARC
ingestion (`sources/warc.py`) and the text-quality operators, pure
stdlib (``html.parser``).

What a 100 TB training pipeline does to every HTML response: drop
non-content subtrees (script/style/noscript/template), turn block
boundaries into line breaks, unescape entities, and normalize
whitespace — BEFORE language ID, quality scoring and dedup ever see
the text. The extraction contract is deterministic so the oracle can
recompute it:

1. content of <script>/<style>/<noscript>/<template> is dropped
   entirely (nesting-aware);
2. block-level tags (p, div, br, li, h1-h6, tr, table, td, th, hr,
   blockquote, pre, section, article, header, footer, title, ul, ol)
   contribute a line break; all other tags contribute nothing;
3. HTML entities are unescaped (``html.parser`` charref conversion);
4. each line's internal whitespace collapses to single spaces and is
   stripped; empty lines are dropped; lines join with "\\n".

`html_title` returns the first <title>'s collapsed text.

At 100 TB both run inside the same Arrow ``mapInPandas`` shape as the
codecs: HTML stays executor-side, only extracted text crosses into
the relational plan.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

_SKIP_TAGS = {"script", "style", "noscript", "template"}
_BLOCK_TAGS = {
    "p", "div", "br", "li", "ul", "ol", "h1", "h2", "h3", "h4", "h5",
    "h6", "tr", "table", "td", "th", "blockquote", "pre", "section",
    "article", "header", "footer", "title", "hr",
}
_WS_RUN = re.compile(r"[^\S\n]+")


class _Extractor(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self.skip_depth = 0
        self.title_parts: list[str] = []
        self.in_title = 0
        self.title_done = False

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self.skip_depth += 1
        if self.skip_depth:  # dropped subtrees contribute NOTHING —
            return  # not even the line breaks of block tags inside them
        if tag in _BLOCK_TAGS:
            self.parts.append("\n")
        if tag == "title" and not self.title_done:
            self.in_title += 1

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS and self.skip_depth:
            self.skip_depth -= 1
            return
        if self.skip_depth:
            return
        if tag in _BLOCK_TAGS:
            self.parts.append("\n")
        if tag == "title" and self.in_title:
            self.in_title -= 1
            if not self.in_title:
                self.title_done = True

    def handle_startendtag(self, tag, attrs):
        if self.skip_depth == 0 and tag in _BLOCK_TAGS:
            self.parts.append("\n")

    def handle_data(self, data):
        if self.skip_depth == 0:
            self.parts.append(data)
            if self.in_title:
                self.title_parts.append(data)


def _normalize(raw: str) -> str:
    lines = [_WS_RUN.sub(" ", ln).strip() for ln in raw.split("\n")]
    return "\n".join(ln for ln in lines if ln)


def html_extract(html: str) -> tuple[str, str | None]:
    """(visible text, first title or None) from ONE parser pass — use
    this when both are needed; html_to_text + html_title would parse
    the document twice."""
    ex = _Extractor()
    ex.feed(html or "")
    ex.close()
    title = (
        _WS_RUN.sub(" ", "".join(ex.title_parts)).strip()
        if ex.title_parts
        else None
    )
    return _normalize("".join(ex.parts)), title


def html_to_text(html: str) -> str:
    """Extract visible text per the module contract."""
    return html_extract(html)[0]


def html_title(html: str) -> str | None:
    """Collapsed text of the first <title>, or None."""
    return html_extract(html)[1]
