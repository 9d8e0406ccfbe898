"""HTML word-box dialect: the bridge between Common-Crawl-style html
pages (input_hint: ``html: binary``) and the converter's layout model.

The reference extracts word boxes from PDFs via PdfPig
(PdfToMarkdownConverter.cs:285 ``page.GetWords()``). Our corpus carries
html, so the synthetic pages (sources/pages.py) serialize the same
geometry into a deterministic dialect:

    <div class="pg" data-h="792">
      <span class="w" data-l="72" data-r="130.5" data-t="700" data-b="688">Text</span>
      ...
    </div>
    <a href="...">anchor</a>

Parsing is regex-based and allocation-light: it runs inside Arrow
batches over binary columns, one document per call — never per-word
DataFrame rows (SURVEY.md §1.2 note on the PDF micro-model).
"""

from __future__ import annotations

import html as _html
import re
from urllib.parse import urljoin

from sharepointcrawler_spark.extraction.converter import RawWord

_PAGE_RE = re.compile(rb'<div class="pg" data-h="([0-9.]+)">(.*?)</div>', re.S)
_WORD_RE = re.compile(
    rb'<span class="w" data-l="(-?[0-9.]+)" data-r="(-?[0-9.]+)" data-t="(-?[0-9.]+)" data-b="(-?[0-9.]+)">(.*?)</span>',
    re.S,
)
_HREF_RE = re.compile(rb'<a\s[^>]*href="([^"]*)"', re.I)


def parse_word_pages(html: bytes) -> tuple[list[list[RawWord]], list[float]]:
    """html bytes -> (per-page raw word boxes, page heights)."""
    pages: list[list[RawWord]] = []
    heights: list[float] = []
    for m in _PAGE_RE.finditer(html or b""):
        heights.append(float(m.group(1)))
        words: list[RawWord] = []
        for wm in _WORD_RE.finditer(m.group(2)):
            raw = wm.group(5)
            text = raw.decode("utf-8", errors="replace")
            if b"&" in raw:  # unescape only when an entity can exist
                text = _html.unescape(text)
            words.append(
                RawWord(
                    text=text,
                    left=float(wm.group(1)),
                    right=float(wm.group(2)),
                    top=float(wm.group(3)),
                    bottom=float(wm.group(4)),
                )
            )
        pages.append(words)
    return pages, heights


def extract_links(html: bytes, base_url: str | None = None) -> list[str]:
    """All <a href> targets in document order, resolved against the base
    URL (the UDTF-shaped addition, SURVEY.md §2.12). Duplicate hrefs are
    kept — within-wave dedup is the frontier's job, and sibling_idx must
    reflect in-document position (T1 ordering contract)."""
    out: list[str] = []
    for m in _HREF_RE.finditer(html or b""):
        href = _html.unescape(m.group(1).decode("utf-8", errors="replace")).strip()
        if not href or href.startswith(("#", "javascript:", "mailto:")):
            continue
        out.append(urljoin(base_url, href) if base_url else href)
    return out
