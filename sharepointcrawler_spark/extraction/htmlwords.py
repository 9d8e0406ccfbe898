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

# urljoin identity fast path: for an absolute http(s) href with a
# non-empty netloc and none of the characters whose parse/unparse
# round-trip can rewrite the string ('?' '#' ';' with empty parts,
# bracket validation, urlsplit's \t\r\n stripping), urllib's algorithm
# provably returns the href UNCHANGED for ANY base (same scheme ->
# urlunparse(urlparse(href)) which round-trips clean; different/absent
# scheme -> returned verbatim). Fuzz-pinned byte-equal to urljoin in
# tests/test_extraction.py::test_extract_links_fast_path_matches_urljoin;
# anything not matching falls back to urljoin. Absolute links dominate
# real pages, and urljoin (2x urlparse + urlunparse per call) is ~30%
# of the whole extraction UDF's CPU without this.
_ABS_HREF_RE = re.compile(r"^https?://[^/?#;\[\]\t\n\r][^?#;\[\]\t\n\r]*\Z")


def parse_word_pages(html: bytes) -> tuple[list[list[RawWord]], list[float]]:
    """html bytes -> (per-page raw word boxes, page heights).

    Hot loop of the extraction UDF (runs once per document inside Arrow
    batches): word matches are scanned in-place over the original bytes
    with pos/endpos bounds (no per-page body copy), coordinates unpack
    through one ``groups()`` call, and the unescape fallback triggers
    only when an entity can exist. Output is byte-identical to the
    naive per-group implementation (goldens pin it)."""
    pages: list[list[RawWord]] = []
    heights: list[float] = []
    data = html or b""
    unescape = _html.unescape
    for m in _PAGE_RE.finditer(data):
        heights.append(float(m.group(1)))
        words: list[RawWord] = []
        append = words.append
        for wm in _WORD_RE.finditer(data, m.start(2), m.end(2)):
            left, right, top, bottom, raw = wm.groups()
            text = raw.decode("utf-8", errors="replace")
            if b"&" in raw:  # unescape only when an entity can exist
                text = unescape(text)
            append(
                RawWord(text, float(left), float(right), float(top), float(bottom))
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
        if not base_url or _ABS_HREF_RE.match(href):
            out.append(href)
        else:
            out.append(urljoin(base_url, href))
    return out
