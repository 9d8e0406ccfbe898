"""PPTX (OpenXML PresentationML) extraction -> markdown.

Completes the Office trio the reference's DocumentFormat.OpenXml import
spans (SharePointClient.cs:14-19): presentations. Structure (ECMA-376):
``ppt/presentation.xml`` lists slides in order via ``<p:sldIdLst>``
relationship ids, ``ppt/_rels/presentation.xml.rels`` maps them to
``ppt/slides/slideN.xml`` parts, and each slide holds shapes
(``p:sp``) whose text body (``p:txBody``) is DrawingML paragraphs
(``a:p``) of runs (``a:r``/``a:t``).

Mapping: each slide becomes a ``## slide N`` section; the slide's
TITLE placeholder (``p:ph type="title"|"ctrTitle"``) becomes the
section heading text when present; body paragraphs render as plain
lines, indented-list levels (``a:pPr lvl``) as nested markdown list
items — the same markdown dialect as the PDF/DOCX/XLSX paths, one
pipeline downstream. Malformed packages raise
:class:`UnsupportedPptxError` in strict mode (the shared
never-silent contract).
"""

from __future__ import annotations

import io
import zipfile
import xml.etree.ElementTree as ET

from sharepointcrawler_spark.extraction.converter import escape_md

P_NS ="{http://schemas.openxmlformats.org/presentationml/2006/main}"
A_NS = "{http://schemas.openxmlformats.org/drawingml/2006/main}"
R_NS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
PKG_R_NS = "{http://schemas.openxmlformats.org/package/2006/relationships}"


class UnsupportedPptxError(ValueError):
    def __init__(self, issues: list[str]):
        super().__init__("; ".join(issues))
        self.issues = issues


def is_pptx(blob: bytes | None) -> bool:
    return (
        blob is not None
        and blob[:4] == b"PK\x03\x04"
        and b"ppt/presentation.xml" in blob
    )


def _shape_is_title(sp) -> bool:
    ph = sp.find(
        f"{P_NS}nvSpPr/{P_NS}nvPr/{P_NS}ph"
    )
    return ph is not None and (ph.get("type") or "") in ("title", "ctrTitle")


def _paragraphs(sp):
    """(level-or-None, text) per a:p; level comes from a:pPr lvl (list
    nesting) — only shapes with an explicit lvl render as list items."""
    tx = sp.find(P_NS + "txBody")
    if tx is None:
        return
    for p in tx.findall(A_NS + "p"):
        text = "".join(t.text or "" for t in p.iter(A_NS + "t")).strip()
        if not text:
            continue
        ppr = p.find(A_NS + "pPr")
        lvl = ppr.get("lvl") if ppr is not None else None
        yield (int(lvl) if lvl is not None else None), text


def pptx_to_markdown(
    blob: bytes, logical_name: str = "presentation", strict: bool = False
) -> str:
    issues: list[str] = []
    slides: list[tuple[str | None, list[tuple[int | None, str]]]] = []
    try:
        with zipfile.ZipFile(io.BytesIO(blob)) as zf:
            try:
                pres = ET.fromstring(zf.read("ppt/presentation.xml"))
            except KeyError:
                raise ValueError("ppt/presentation.xml missing from package")
            rels: dict[str, str] = {}
            try:
                relroot = ET.fromstring(
                    zf.read("ppt/_rels/presentation.xml.rels")
                )
                for rel in relroot.iter(PKG_R_NS + "Relationship"):
                    rels[rel.get("Id") or ""] = rel.get("Target") or ""
            except KeyError:
                pass
            sld_ids = [
                s.get(R_NS + "id")
                for s in pres.iter(P_NS + "sldId")
            ]
            for i, rid in enumerate(sld_ids):
                target = rels.get(rid or "", f"slides/slide{i + 1}.xml")
                part = "ppt/" + target.lstrip("/") if not target.startswith("ppt/") else target
                try:
                    slide = ET.fromstring(zf.read(part))
                except KeyError:
                    issues.append(f"pptx: slide part {part} missing")
                    continue
                title: str | None = None
                body: list[tuple[int | None, str]] = []
                for sp in slide.iter(P_NS + "sp"):
                    if _shape_is_title(sp) and title is None:
                        texts = [t for _, t in _paragraphs(sp)]
                        title = " ".join(texts) if texts else None
                    else:
                        body.extend(_paragraphs(sp))
                slides.append((title, body))
    except (zipfile.BadZipFile, ET.ParseError, ValueError) as e:
        issues.append(f"pptx: {e}")
    if not slides:
        issues.append("pptx: no readable slides")
    if issues and strict:
        raise UnsupportedPptxError(sorted(set(issues)))
    if not slides:
        return ""
    return _render_deck(logical_name, slides)


def _render_deck(
    logical_name: str,
    slides: list[tuple[str | None, list[tuple[int | None, str]]]],
) -> str:
    """Shared markdown emission for the extractor AND the golden
    builder (the docxwords._emit_blocks pattern): the golden's
    independence covers the zip/XML round trip; emission conventions
    must be single-sourced or a tweak desynchronizes them."""
    md: list[str] = ["# " + escape_md(logical_name) + "\n", "\n"]
    for n, (title, body) in enumerate(slides, start=1):
        md.append(
            f"## Slide {n}" + (f": {escape_md(title)}" if title else "") + "\n"
        )
        md.append("\n")
        i = 0
        while i < len(body):
            lvl, text = body[i]
            if lvl is None:
                md.append(escape_md(text) + "\n")
                md.append("\n")
                i += 1
            else:
                while i < len(body) and body[i][0] is not None:
                    md.append(
                        "  " * body[i][0] + "- " + escape_md(body[i][1]) + "\n"
                    )
                    i += 1
                md.append("\n")
    return "".join(md)


# ------------------------------------------------------- fixture writer


def _xesc(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _sp_xml(paragraphs: list[tuple[int | None, str]], title: bool = False) -> str:
    ph = '<p:ph type="title"/>' if title else ""
    ps = []
    for lvl, text in paragraphs:
        ppr = f'<a:pPr lvl="{lvl}"/>' if lvl is not None else ""
        # split across runs at word boundaries (proves concatenation)
        words = text.split(" ")
        runs = "".join(
            f"<a:r><a:t>{_xesc(w if i == len(words) - 1 else w + ' ')}</a:t></a:r>"
            for i, w in enumerate(words)
        )
        ps.append(f"<a:p>{ppr}{runs}</a:p>")
    return (
        "<p:sp><p:nvSpPr><p:nvPr>" + ph + "</p:nvPr></p:nvSpPr>"
        "<p:txBody>" + "".join(ps) + "</p:txBody></p:sp>"
    )


def write_pptx(slides: list[tuple[str | None, list[tuple[int | None, str]]]]) -> bytes:
    """Deterministic PPTX fixture writer: (title, [(lvl|None, text)])
    per slide; fixed zip timestamps."""
    p_ns = "http://schemas.openxmlformats.org/presentationml/2006/main"
    a_ns = "http://schemas.openxmlformats.org/drawingml/2006/main"
    r_ns = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    slide_parts = []
    for title, body in slides:
        shapes = []
        if title is not None:
            shapes.append(_sp_xml([(None, title)], title=True))
        if body:
            shapes.append(_sp_xml(body))
        slide_parts.append(
            (
                '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                f'<p:sld xmlns:p="{p_ns}" xmlns:a="{a_ns}">'
                "<p:cSld><p:spTree>" + "".join(shapes) + "</p:spTree></p:cSld></p:sld>"
            ).encode("utf-8")
        )
    sldids = "".join(
        f'<p:sldId id="{256 + i}" r:id="rId{i + 1}"/>'
        for i in range(len(slides))
    )
    presentation = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<p:presentation xmlns:p="{p_ns}" xmlns:r="{r_ns}">'
        f"<p:sldIdLst>{sldids}</p:sldIdLst></p:presentation>"
    ).encode("utf-8")
    pres_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships">'
        + "".join(
            f'<Relationship Id="rId{i + 1}" Type="http://schemas.'
            'openxmlformats.org/officeDocument/2006/relationships/slide" '
            f'Target="slides/slide{i + 1}.xml"/>'
            for i in range(len(slides))
        )
        + "</Relationships>"
    ).encode("utf-8")
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
        'content-types">'
        '<Default Extension="rels" ContentType="application/vnd.'
        'openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/ppt/presentation.xml" ContentType="application/'
        'vnd.openxmlformats-officedocument.presentationml.presentation.main+xml"/>'
        "</Types>"
    ).encode("utf-8")
    rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/officeDocument" '
        'Target="ppt/presentation.xml"/>'
        "</Relationships>"
    ).encode("utf-8")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        members = [
            ("[Content_Types].xml", content_types),
            ("_rels/.rels", rels),
            ("ppt/presentation.xml", presentation),
            ("ppt/_rels/presentation.xml.rels", pres_rels),
        ] + [
            (f"ppt/slides/slide{i + 1}.xml", part)
            for i, part in enumerate(slide_parts)
        ]
        for name, data in members:
            zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zi.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(zi, data)
    return buf.getvalue()


def expected_pptx_markdown(
    logical_name: str,
    slides: list[tuple[str | None, list[tuple[int | None, str]]]],
) -> str:
    """Golden builder stated top-down from the slide spec (shared
    emission with the extractor; the independent part is the package
    write/parse round trip)."""
    return _render_deck(logical_name, slides)
