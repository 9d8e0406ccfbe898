"""DOCX (OpenXML WordprocessingML) extraction -> markdown.

Reference analog: the reference declares the Office surface by
importing DocumentFormat.OpenXml (SharePointClient.cs:14-19) alongside
its PDF path; a SharePoint document library is full of .docx files. A
.docx is a ZIP package whose body lives in ``word/document.xml``
(ECMA-376 / ISO 29500 WordprocessingML): paragraphs are ``<w:p>``
elements holding runs (``<w:r>``) of text (``<w:t>``), headings carry a
``<w:pStyle w:val="HeadingN"/>`` paragraph property, and tables are
``<w:tbl>/<w:tr>/<w:tc>`` grids.

The markdown conventions MATCH the PDF converter's so both modalities
feed one downstream chunk/ingest pipeline: ``# title`` from the
Title-styled paragraph (or the logical name), ``Heading{N}`` ->
``{'#' * (N+1)} text``, plain paragraphs separated by blank lines with
the same ``escape_md`` escaping, and tables through the converter's own
``render_table``. Flow XML has no page geometry, so this path emits
markdown directly instead of word boxes — the same dispatch seam
(``PK\\x03\\x04`` magic in extraction/udfs.py) the ``%PDF-`` branch
uses.

Constructs the extractor cannot handle (not a zip, missing
document.xml, malformed XML, zero extractable text) are collected as
issues and raised as :class:`UnsupportedDocxError` in strict mode —
the same never-silent-wrong-text contract as the PDF path.
"""

from __future__ import annotations

import io
import re
import zipfile
import xml.etree.ElementTree as ET

from sharepointcrawler_spark.extraction.converter import escape_md, render_table

W_NS = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
_HEADING_RE = re.compile(r"[Hh]eading(\d)$")


class UnsupportedDocxError(ValueError):
    """A .docx construct the extractor cannot handle faithfully; raised
    in strict mode so silent data loss is impossible."""

    def __init__(self, issues: list[str]):
        super().__init__("; ".join(issues))
        self.issues = issues


def is_docx(blob: bytes | None) -> bool:
    """Cheap dispatch probe: ZIP local-file magic AND a
    ``word/document.xml`` member name (the central directory stores
    names verbatim, so a substring scan is reliable without opening
    the archive)."""
    return (
        blob is not None
        and blob[:4] == b"PK\x03\x04"
        and b"word/document.xml" in blob
    )


def _para_text(p) -> str:
    """Concatenate a paragraph's run text in document order: ``<w:t>``
    carries text, ``<w:tab/>`` a tab stop (one space here — markdown
    has no tab semantics), ``<w:br/>`` a soft break (space: markdown
    paragraphs re-flow)."""
    parts: list[str] = []
    for el in p.iter():
        if el.tag == W_NS + "t":
            parts.append(el.text or "")
        elif el.tag in (W_NS + "tab", W_NS + "br"):
            parts.append(" ")
    return "".join(parts)


def _para_style(p) -> str | None:
    ppr = p.find(W_NS + "pPr")
    if ppr is None:
        return None
    st = ppr.find(W_NS + "pStyle")
    if st is None:
        return None
    return st.get(W_NS + "val")


def _para_ilvl(p) -> int | None:
    """List nesting level when the paragraph carries ``<w:numPr>``
    (numbered/bulleted list membership), else None. The concrete
    bullet/number FORMAT lives in numbering.xml; markdown has one list
    marker, so membership + level is the faithful projection."""
    ppr = p.find(W_NS + "pPr")
    if ppr is None:
        return None
    numpr = ppr.find(W_NS + "numPr")
    if numpr is None:
        return None
    ilvl = numpr.find(W_NS + "ilvl")
    if ilvl is None:
        return 0
    try:
        return int(ilvl.get(W_NS + "val") or 0)
    except ValueError:
        return 0


def docx_to_markdown(
    blob: bytes, logical_name: str = "document", strict: bool = False
) -> str:
    """DOCX bytes -> markdown under the converter's conventions.

    ``strict=True`` raises :class:`UnsupportedDocxError` when the
    package or XML is malformed or no text could be extracted — the
    production UDF path uses strict mode (same contract as
    ``parse_pdf_word_pages``)."""
    issues: list[str] = []
    xml_bytes = b""
    try:
        with zipfile.ZipFile(io.BytesIO(blob)) as zf:
            try:
                xml_bytes = zf.read("word/document.xml")
            except KeyError:
                issues.append("docx: word/document.xml missing from package")
    except zipfile.BadZipFile:
        issues.append("docx: not a valid ZIP package")
    body = None
    if xml_bytes:
        try:
            root = ET.fromstring(xml_bytes)
            body = root.find(W_NS + "body")
            if body is None:
                issues.append("docx: document.xml has no w:body")
        except ET.ParseError as e:
            issues.append(f"docx: malformed document.xml ({e})")
    if body is None:
        if strict:
            raise UnsupportedDocxError(sorted(set(issues)))
        return ""

    md: list[str] = []
    title: str | None = None
    blocks: list[tuple[str, object]] = []
    had_text = False
    for el in body:
        if el.tag == W_NS + "p":
            text = _para_text(el).strip()
            if not text:
                continue
            had_text = True
            style = _para_style(el) or ""
            hm = _HEADING_RE.match(style)
            lvl = _para_ilvl(el)
            if style == "Title" and title is None:
                title = text
            elif hm:
                blocks.append(("h", (int(hm.group(1)), text)))
            elif lvl is not None:
                blocks.append(("li", (lvl, text)))
            else:
                blocks.append(("p", text))
        elif el.tag == W_NS + "tbl":
            rows = []
            for tr in el.findall(W_NS + "tr"):
                cells = []
                for tc in tr.findall(W_NS + "tc"):
                    cells.append(
                        " ".join(
                            t
                            for t in (
                                _para_text(p).strip()
                                for p in tc.findall(W_NS + "p")
                            )
                            if t
                        )
                    )
                rows.append(cells)
            if rows:
                had_text = had_text or any(any(c for c in r) for r in rows)
                blocks.append(("tbl", rows))
    if not had_text:
        issues.append("docx: no extractable text in document body")
        if strict:
            raise UnsupportedDocxError(sorted(set(issues)))
        return ""

    md.append("# " + escape_md(title if title is not None else logical_name) + "\n")
    md.append("\n")
    _emit_blocks(md, blocks)
    return "".join(md)


def _emit_blocks(md: list[str], blocks: list[tuple[str, object]]) -> None:
    """Shared emission for extractor and golden builder: consecutive
    list items form one markdown list (no blank lines inside, one
    after); every other block is followed by a blank line."""
    for i, (kind, payload) in enumerate(blocks):
        if kind == "h":
            level, text = payload  # type: ignore[misc]
            md.append("#" * min(6, level + 1) + " " + escape_md(text) + "\n")
            md.append("\n")
        elif kind == "p":
            md.append(escape_md(payload) + "\n")  # type: ignore[arg-type]
            md.append("\n")
        elif kind == "li":
            lvl, text = payload  # type: ignore[misc]
            md.append("  " * lvl + "- " + escape_md(text) + "\n")
            if i + 1 >= len(blocks) or blocks[i + 1][0] != "li":
                md.append("\n")
        else:
            md.append(render_table(payload) + "\n")  # type: ignore[arg-type]
            md.append("\n")


# ------------------------------------------------------- fixture writer

_XML_ESC = {"&": "&amp;", "<": "&lt;", ">": "&gt;"}


def _xesc(s: str) -> str:
    return "".join(_XML_ESC.get(c, c) for c in s)


def _p_xml(text: str, style: str | None = None, ilvl: int | None = None) -> str:
    """One paragraph, text split across multiple runs at word
    boundaries (proves run concatenation; ``xml:space='preserve'``
    keeps the inter-run spaces). ``ilvl`` adds list membership
    (``w:numPr``)."""
    props = []
    if style:
        props.append(f'<w:pStyle w:val="{style}"/>')
    if ilvl is not None:
        props.append(
            f'<w:numPr><w:ilvl w:val="{ilvl}"/><w:numId w:val="1"/></w:numPr>'
        )
    ppr = f"<w:pPr>{''.join(props)}</w:pPr>" if props else ""
    words = text.split(" ")
    runs = []
    for i, wd in enumerate(words):
        seg = wd if i == len(words) - 1 else wd + " "
        runs.append(f'<w:r><w:t xml:space="preserve">{_xesc(seg)}</w:t></w:r>')
    return f"<w:p>{ppr}{''.join(runs)}</w:p>"


def write_docx(
    title: str,
    blocks: list[tuple],
) -> bytes:
    """Deterministic DOCX fixture writer: a minimal but VALID OpenXML
    package ([Content_Types].xml + _rels/.rels + word/document.xml,
    fixed zip timestamps so bytes are reproducible).

    ``blocks``: ("h", level, text) | ("p", text) | ("li", ilvl, text) |
    ("tbl", rows)."""
    parts = [
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>',
        '<w:document xmlns:w="http://schemas.openxmlformats.org/'
        'wordprocessingml/2006/main"><w:body>',
        _p_xml(title, style="Title"),
    ]
    for b in blocks:
        if b[0] == "h":
            parts.append(_p_xml(b[2], style=f"Heading{b[1]}"))
        elif b[0] == "p":
            parts.append(_p_xml(b[1]))
        elif b[0] == "li":
            parts.append(_p_xml(b[2], ilvl=b[1]))
        elif b[0] == "tbl":
            rows_xml = []
            for row in b[1]:
                cells = "".join(
                    f"<w:tc>{_p_xml(c)}</w:tc>" for c in row
                )
                rows_xml.append(f"<w:tr>{cells}</w:tr>")
            parts.append(f"<w:tbl>{''.join(rows_xml)}</w:tbl>")
        else:
            raise ValueError(f"unknown block kind {b[0]!r}")
    parts.append("</w:body></w:document>")
    document = "".join(parts).encode("utf-8")

    content_types = (
        b'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        b'<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
        b'content-types">'
        b'<Default Extension="rels" ContentType="application/vnd.'
        b'openxmlformats-package.relationships+xml"/>'
        b'<Default Extension="xml" ContentType="application/xml"/>'
        b'<Override PartName="/word/document.xml" ContentType="application/'
        b'vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>'
        b"</Types>"
    )
    rels = (
        b'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        b'<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        b'2006/relationships">'
        b'<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        b'officeDocument/2006/relationships/officeDocument" '
        b'Target="word/document.xml"/>'
        b"</Relationships>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, data in (
            ("[Content_Types].xml", content_types),
            ("_rels/.rels", rels),
            ("word/document.xml", document),
        ):
            zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zi.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(zi, data)
    return buf.getvalue()


def expected_docx_markdown(title: str, blocks: list[tuple]) -> str:
    """Golden builder for the fixture spec — states the expected
    markdown TOP-DOWN from the block list and the shared conventions
    (escape_md / render_table), independent of the zip/XML round
    trip, so any package/parse/run-concatenation bug diverges."""
    md = ["# " + escape_md(title) + "\n", "\n"]
    norm: list[tuple[str, object]] = []
    for b in blocks:
        if b[0] == "h":
            norm.append(("h", (b[1], b[2])))
        elif b[0] == "p":
            norm.append(("p", b[1]))
        elif b[0] == "li":
            norm.append(("li", (b[1], b[2])))
        else:
            norm.append(("tbl", b[1]))
    _emit_blocks(md, norm)
    return "".join(md)
