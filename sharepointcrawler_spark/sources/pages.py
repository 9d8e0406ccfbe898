"""Deterministic synthetic ``pages`` corpus (FIXTURES.md §1).

Generates Common-Crawl-style rows (url, warc_ts, html, text, lang)
where ``html`` serializes word boxes in the htmlwords dialect plus
``<a href>`` links realizing a site graph, and ``text`` is the GOLDEN
markdown computed **top-down from the logical document spec** — NOT by
running the converter. The engine's bottom-up extraction must reproduce
it byte-for-byte (BASELINE.json input_hint: "byte-identical extracted
text per url").

Each document exercises the reference converter's semantics
(PdfToMarkdownConverter.cs): repeated header/footer banners at the 0.6
threshold, noise lines, the SOP banner grid with combined value rows,
numbered headings with the min(6, 2+dots) clamp, paragraph merge rules
(lowercase continuation / sentence punctuation / list markers), and a
section-6 Step|Responsibility|Action table with a wrapped row (whose
merge keeps the reference's double-space quirk).
"""

from __future__ import annotations

import datetime as dt
import html as _html
import random
from dataclasses import dataclass, field

# ----------------------------------------------------------------- spec

_NOUNS = ["badge", "facility", "equipment", "locker", "waiver", "schedule", "entry", "permit"]
_VERBS = ["review", "submit", "record", "inspect", "approve", "update", "verify", "archive"]
_ORGS = ["Facilities Services", "Safety Office", "Site Operations", "Security Group"]
_NAMES = ["John Smith", "Jane Doe", "Alex Lee", "Sam Carter"]
_LANGS = ["en", "de", "fr"]


@dataclass
class Section:
    num: str
    title: str
    # each paragraph is a list of physical lines that merge into one
    # logical paragraph (crafted: non-final lines end without sentence
    # punctuation, continuation lines start lowercase)
    paragraphs: list[list[str]] = field(default_factory=list)
    # (step, responsibility, action) rows; one wrapped continuation is
    # attached to the LAST row when wrap_action is set
    table_rows: list[tuple[str, str, str]] | None = None
    wrap_action: str | None = None


@dataclass
class DocSpec:
    doc_no: str
    title: str
    eff: str
    rev: str
    org: str
    approver: str
    source: str
    sections: list[Section]
    n_pages: int
    repeat_header: str = "Example Corporation Internal"
    repeat_footer: str = "Example Corp Confidential"


def make_doc_spec(i: int, rng: random.Random) -> DocSpec:
    noun = _NOUNS[i % len(_NOUNS)]
    verb = _VERBS[(i * 3 + 1) % len(_VERBS)]
    noun2 = _NOUNS[(i * 5 + 2) % len(_NOUNS)]
    sections = [
        Section(
            "1.0",
            "Purpose",
            [
                [
                    f"This procedure defines handling of the {noun}",
                    f"for employees and registered contractors on site {i % 7}.",
                ]
            ],
        ),
        Section("2.0", "Scope", [[f"Applies to all {noun2} holders."]]),
        Section(
            "4.0",
            "Responsibilities",
            [
                ["Employees must:"],
                [f"a. Sign the {noun} register"],
                [f"b) Present a valid {noun2}"],
            ],
        ),
        Section(
            "6.0",
            "Process",
            [],
            table_rows=[
                ("1.", "Employee", f"Complete the {noun} form"),
                ("2.", "Staff", f"{verb.capitalize()} the {noun2}"),
            ],
            wrap_action=f"and archive the {noun} record",
        ),
        Section("7.0", "References", [[f"{noun.capitalize()} safety manual."]]),
    ]
    return DocSpec(
        doc_no=f"CLG-EN-PR-{1000 + i:04d}",
        title=f"{noun.capitalize()} {verb.capitalize()} Procedure",
        eff=f"{(i % 12) + 1:02d}/{(i % 28) + 1:02d}/{2020 + i % 6}",
        rev=chr(ord("A") + i % 26),
        org=_ORGS[i % len(_ORGS)],
        approver=_NAMES[(i * 7 + 3) % len(_NAMES)],
        source="Internal",
        sections=sections,
        n_pages=4,
    )


# ------------------------------------------------------ logical page plan


def _section_lines(sec: Section) -> list[str]:
    """Physical lines of one section. Table lines carry tab separators,
    resolved by the renderer into cells at the fixed column anchors."""
    lines = [f"{sec.num} {sec.title}"]
    for para in sec.paragraphs:
        lines.extend(para)
    if sec.table_rows:
        lines.append("\t".join(["Step", "Responsibility", "Action"]))
        for r, row in enumerate(sec.table_rows):
            lines.append("\t".join(row))
            if sec.wrap_action and r == len(sec.table_rows) - 1:
                lines.append("\t\t" + sec.wrap_action)
    return lines


def _doc_page_lines(spec: DocSpec) -> list[list[str]]:
    """Distribute the logical lines over pages with per-page banners.

    Sections map to fixed pages (a section never splits across pages:
    paragraph merge and table-block consumption are per-page effects,
    so a split would change the expected output). Layout: page 1 =
    banner grid + first two sections; remaining sections spread evenly
    over pages 2..n."""
    grid = [
        "Management System",
        "Standard Operating Procedure",
        "Document No.: Page:",
        f"{spec.doc_no} 1 of {spec.n_pages}",
        spec.title,
        "Effective Date: Revision:",
        f"{spec.eff} {spec.rev}",
        f"Accountable Organization: {spec.org}",
        f"Management Approval: {spec.approver}",
        f"Source: {spec.source}",
    ]
    n_body_pages = spec.n_pages - 1
    page_sections: list[list[Section]] = [[] for _ in range(spec.n_pages)]
    page_sections[0] = spec.sections[:2]
    rest = spec.sections[2:]
    for j, sec in enumerate(rest):
        page_sections[1 + j * n_body_pages // max(len(rest), 1)].append(sec)

    pages: list[list[str]] = []
    for pi in range(spec.n_pages):
        lines = [spec.repeat_header]
        if pi == 0:
            lines += grid
        for sec in page_sections[pi]:
            lines += _section_lines(sec)
        lines += [spec.repeat_footer, f"Page: {pi + 1} of {spec.n_pages}"]
        pages.append(lines)
    return pages


# ------------------------------------------------------------- rendering

_X0 = 72.0
_CHAR_W = 6.0
_GAP = 4.0
_ANCHORS = (72.0, 172.0, 342.0)
_PAGE_H = 792.0
_Y0 = 720.0
_DY = 14.0


def _words_for_line(text: str, y: float) -> list[tuple[str, float, float, float, float]]:
    """(text, l, r, t, b) boxes. Tab-separated text = table cells at the
    fixed column anchors; plain text flows from the left margin."""
    out = []
    if "\t" in text:
        cells = text.split("\t")
        for ci, cell in enumerate(cells[:3]):
            x = _ANCHORS[ci]
            for w in cell.split():
                wd = len(w) * _CHAR_W
                out.append((w, x, x + wd, y + 5, y - 5))
                x += wd + _GAP
    else:
        x = _X0
        for w in text.split():
            wd = len(w) * _CHAR_W
            out.append((w, x, x + wd, y + 5, y - 5))
            x += wd + _GAP
    return out


def render_html(spec: DocSpec, links: list[str]) -> bytes:
    parts = [b"<!doctype html><html><body>"]
    for page_lines in _doc_page_lines(spec):
        parts.append(f'<div class="pg" data-h="{_PAGE_H}">'.encode())
        y = _Y0
        for line in page_lines:
            for (t, l, r, tp, bt) in _words_for_line(line, y):
                esc = _html.escape(t, quote=False).encode()
                parts.append(
                    f'<span class="w" data-l="{l}" data-r="{r}" data-t="{tp}" data-b="{bt}">'.encode()
                    + esc
                    + b"</span>"
                )
            y -= _DY
        parts.append(b"</div>")
    for href in links:
        parts.append(f'<a href="{_html.escape(href)}">link</a>'.encode())
    parts.append(b"</body></html>")
    return b"".join(parts)


# ----------------------------------------------- top-down expected output


def expected_markdown(spec: DocSpec) -> str:
    """Golden markdown assembled from the SPEC (not from the converter):
    H1 title; '#'*min(6,2+dots) headings; crafted paragraphs merge to
    one line each; the section-6 table renders with the wrapped row
    merged into the last row's Action with the reference's double-space
    (ExtractTableWithAnchors ':726: join of a leading-empty cell list);
    a table block is followed by two blank lines (AppendLine(RenderTable)
    + AppendLine); whole doc ends trimmed + single newline."""
    out: list[str] = [f"# {spec.title}", ""]
    for sec in spec.sections:
        level = min(6, 2 + sec.num.count("."))
        out.append("#" * level + f" {sec.num} {sec.title}")
        out.append("")
        for para in sec.paragraphs:
            out.append(" ".join(para))
            out.append("")
        if sec.table_rows:
            rows = [("Step", "Responsibility", "Action")] + list(sec.table_rows)
            rendered = [list(r) for r in rows]
            if sec.wrap_action:
                # reference quirk: merged cell gets a double space
                rendered[-1][2] = rendered[-1][2] + "  " + sec.wrap_action
            out.append("| " + " | ".join(rendered[0]) + " |")
            out.append("| --- | --- | --- |")
            for r in rendered[1:]:
                out.append("| " + " | ".join(r) + " |")
            out.append("")
            out.append("")  # table emits an extra blank line
    return ("\n".join(out)).strip() + "\n"


# ---------------------------------------------------------- corpus build


def _host_of(i: int, n_docs: int, n_hosts: int, hot_host_fraction: float | None) -> str:
    if hot_host_fraction is not None and (i / max(n_docs, 1)) < hot_host_fraction:
        return "hot.example.com"
    return f"site{i % n_hosts}.example.com"


def build_page_row(
    i: int,
    n_docs: int,
    n_hosts: int = 5,
    branching: int = 2,
    hot_host_fraction: float | None = None,
) -> tuple[str, dt.datetime, bytes, str, str]:
    """One corpus row. Doc i links to docs i*b+1 .. i*b+b (a b-ary tree:
    crawl from doc 0 reaches everything; depth ~ log_b n, so wide trees
    give the breadth-dominated waves a real web frontier has) plus a
    back-link to the root (cycle — exercises URL-seen)."""
    base_ts = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)

    def url_of(j: int) -> str:
        return f"https://{_host_of(j, n_docs, n_hosts, hot_host_fraction)}/docs/doc{j}"

    spec = make_doc_spec(i, random.Random(42 + i))
    links = [url_of(c) for c in range(branching * i + 1, branching * i + branching + 1) if c < n_docs]
    if i > 0:
        links.append(url_of(0))
    return (
        url_of(i),
        base_ts + dt.timedelta(seconds=i * 37),
        render_html(spec, links),
        expected_markdown(spec),
        _LANGS[i % len(_LANGS)],
    )


def build_pages_rows(
    n_docs: int = 50,
    n_hosts: int = 5,
    seed: int = 42,
    hot_host_fraction: float | None = None,
    branching: int = 2,
) -> list[tuple[str, dt.datetime, bytes, str, str]]:
    """Driver-side corpus build (small fixtures). seed kept for
    signature stability; rows are a pure function of (i, shape)."""
    return [
        build_page_row(i, n_docs, n_hosts, branching, hot_host_fraction)
        for i in range(n_docs)
    ]


def pages_df_distributed(
    spark,
    n_docs: int,
    n_hosts: int = 5,
    branching: int = 32,
    hot_host_fraction: float | None = None,
    n_partitions: int | None = None,
):
    """Corpus generated ON THE EXECUTORS (mapInPandas over an id range) —
    the only way to materialize a large corpus without a driver
    bottleneck; also how a real 100 TB synthetic load would be laid
    down."""
    import pandas as pd

    n_parts = n_partitions or spark.sparkContext.defaultParallelism
    ids = spark.range(0, n_docs, 1, n_parts)

    def gen(batches):
        for pdf in batches:
            rows = [
                build_page_row(int(i), n_docs, n_hosts, branching, hot_host_fraction)
                for i in pdf["id"]
            ]
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    return ids.mapInPandas(gen, PAGES_SCHEMA)


PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def pages_df(spark, n_docs: int = 50, n_hosts: int = 5, seed: int = 42, hot_host_fraction=None):
    return spark.createDataFrame(
        build_pages_rows(n_docs, n_hosts, seed, hot_host_fraction), PAGES_SCHEMA
    )
