"""XLSX (OpenXML SpreadsheetML) extraction -> markdown tables.

The reference's DocumentFormat.OpenXml import (SharePointClient.cs:14-19)
covers the spreadsheet side of the Office surface too; a SharePoint
document library is full of .xlsx files. Structure (ECMA-376):
``xl/workbook.xml`` lists sheets in order with relationship ids,
``xl/_rels/workbook.xml.rels`` maps those ids to worksheet parts,
``xl/sharedStrings.xml`` interns string cell values, and each
``xl/worksheets/sheetN.xml`` holds ``<row>``/``<c>`` cells whose ``r``
attribute ("B3") carries the column, ``t`` the type (``s`` shared
string, ``str`` formula string, ``inlineStr`` inline, default numeric).

Output: one ``## sheet name`` section per sheet with the cell grid as
a markdown table (first row = header, the converter's own
``render_table`` conventions), under a ``# logical name`` title — the
same markdown dialect the PDF and DOCX paths emit, so all three
modalities feed one chunk/ingest pipeline. Sparse rows/columns fill
with empty strings by the ``r`` references.

Malformed packages raise :class:`UnsupportedXlsxError` in strict mode
(same never-silent contract as PDF/DOCX).
"""

from __future__ import annotations

import io
import re
import zipfile
import xml.etree.ElementTree as ET

from sharepointcrawler_spark.extraction.converter import escape_md, render_table

S_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
R_NS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
PKG_R_NS = "{http://schemas.openxmlformats.org/package/2006/relationships}"

_CELL_REF_RE = re.compile(r"^([A-Z]+)(\d+)$")


class UnsupportedXlsxError(ValueError):
    def __init__(self, issues: list[str]):
        super().__init__("; ".join(issues))
        self.issues = issues


def is_xlsx(blob: bytes | None) -> bool:
    return (
        blob is not None
        and blob[:4] == b"PK\x03\x04"
        and b"xl/workbook.xml" in blob
    )


def _col_index(ref: str) -> int | None:
    m = _CELL_REF_RE.match(ref or "")
    if not m:
        return None
    idx = 0
    for ch in m.group(1):
        idx = idx * 26 + (ord(ch) - 64)
    return idx - 1


def _cell_text(c, shared: list[str]) -> str:
    t = c.get("t") or "n"
    if t == "s":
        v = c.find(S_NS + "v")
        try:
            return shared[int((v.text or "").strip())] if v is not None else ""
        except (ValueError, IndexError):
            raise ValueError("shared-string index out of range")
    if t == "inlineStr":
        is_el = c.find(S_NS + "is")
        if is_el is None:
            return ""
        return "".join(t_el.text or "" for t_el in is_el.iter(S_NS + "t"))
    v = c.find(S_NS + "v")
    return (v.text or "") if v is not None else ""


def xlsx_to_markdown(
    blob: bytes, logical_name: str = "workbook", strict: bool = False
) -> str:
    """XLSX bytes -> markdown (title + one table section per sheet)."""
    issues: list[str] = []
    sheets: list[tuple[str, list[list[str]]]] = []
    try:
        with zipfile.ZipFile(io.BytesIO(blob)) as zf:
            try:
                wb = ET.fromstring(zf.read("xl/workbook.xml"))
            except KeyError:
                raise ValueError("xl/workbook.xml missing from package")
            rels: dict[str, str] = {}
            try:
                relroot = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
                for rel in relroot.iter(PKG_R_NS + "Relationship"):
                    rels[rel.get("Id") or ""] = rel.get("Target") or ""
            except KeyError:
                pass
            shared: list[str] = []
            try:
                sst = ET.fromstring(zf.read("xl/sharedStrings.xml"))
                for si in sst.iter(S_NS + "si"):
                    shared.append(
                        "".join(t.text or "" for t in si.iter(S_NS + "t"))
                    )
            except KeyError:
                pass
            for i, sheet in enumerate(wb.iter(S_NS + "sheet")):
                name = sheet.get("name") or f"Sheet{i + 1}"
                target = rels.get(sheet.get(R_NS + "id") or "")
                part = (
                    "xl/" + target.lstrip("/")
                    if target and not target.startswith("xl/")
                    else (target or f"xl/worksheets/sheet{i + 1}.xml")
                )
                try:
                    ws = ET.fromstring(zf.read(part))
                except KeyError:
                    issues.append(f"xlsx: worksheet part {part} missing")
                    continue
                grid: list[list[str]] = []
                for row in ws.iter(S_NS + "row"):
                    cells: list[str] = []
                    for c in row.iter(S_NS + "c"):
                        ci = _col_index(c.get("r") or "")
                        try:
                            val = _cell_text(c, shared)
                        except ValueError as e:
                            issues.append(f"xlsx: {e}")
                            val = ""
                        if ci is None:
                            cells.append(val)
                        else:
                            while len(cells) < ci:
                                cells.append("")
                            if len(cells) == ci:
                                cells.append(val)
                            else:
                                cells[ci] = val
                    grid.append(cells)
                sheets.append((name, grid))
    except (zipfile.BadZipFile, ET.ParseError, ValueError) as e:
        issues.append(f"xlsx: {e}")
    if not sheets:
        issues.append("xlsx: no readable worksheets")
    if issues and strict:
        raise UnsupportedXlsxError(sorted(set(issues)))
    if not sheets:
        return ""
    md: list[str] = ["# " + escape_md(logical_name) + "\n", "\n"]
    for name, grid in sheets:
        md.append("## " + escape_md(name) + "\n")
        md.append("\n")
        if grid:
            md.append(render_table(grid) + "\n")
            md.append("\n")
    return "".join(md)


# ------------------------------------------------------- fixture writer


def _xesc(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _ref(col: int, row: int) -> str:
    letters = ""
    c = col + 1
    while c:
        c, rem = divmod(c - 1, 26)
        letters = chr(65 + rem) + letters
    return f"{letters}{row + 1}"


def write_xlsx(sheets: list[tuple[str, list[list]]]) -> bytes:
    """Deterministic XLSX fixture writer: shared strings for text cells,
    bare ``<v>`` for numerics, fixed zip timestamps. Cell grids may
    contain str / int / float; None leaves a gap (sparse cell)."""
    shared: list[str] = []
    sindex: dict[str, int] = {}

    def sid(s: str) -> int:
        if s not in sindex:
            sindex[s] = len(shared)
            shared.append(s)
        return sindex[s]

    ws_parts: list[bytes] = []
    for _, grid in sheets:
        rows_xml = []
        for ri, row in enumerate(grid):
            cells_xml = []
            for ci, val in enumerate(row):
                if val is None:
                    continue
                r = _ref(ci, ri)
                if isinstance(val, str):
                    cells_xml.append(
                        f'<c r="{r}" t="s"><v>{sid(val)}</v></c>'
                    )
                else:
                    cells_xml.append(f'<c r="{r}"><v>{val}</v></c>')
            rows_xml.append(f'<row r="{ri + 1}">{"".join(cells_xml)}</row>')
        ws_parts.append(
            (
                '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                '<worksheet xmlns="http://schemas.openxmlformats.org/'
                'spreadsheetml/2006/main"><sheetData>'
                + "".join(rows_xml)
                + "</sheetData></worksheet>"
            ).encode("utf-8")
        )

    sheets_xml = "".join(
        f'<sheet name="{_xesc(name)}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
        for i, (name, _) in enumerate(sheets)
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.'
        'org/officeDocument/2006/relationships">'
        f"<sheets>{sheets_xml}</sheets></workbook>"
    ).encode("utf-8")
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships">'
        + "".join(
            f'<Relationship Id="rId{i + 1}" Type="http://schemas.'
            'openxmlformats.org/officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(sheets))
        )
        + "</Relationships>"
    ).encode("utf-8")
    sst = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/'
        f'main" count="{len(shared)}" uniqueCount="{len(shared)}">'
        + "".join(f"<si><t>{_xesc(s)}</t></si>" for s in shared)
        + "</sst>"
    ).encode("utf-8")
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
        'content-types">'
        '<Default Extension="rels" ContentType="application/vnd.'
        'openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/'
        'vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        "</Types>"
    ).encode("utf-8")
    rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/officeDocument" '
        'Target="xl/workbook.xml"/>'
        "</Relationships>"
    ).encode("utf-8")

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        members = [
            ("[Content_Types].xml", content_types),
            ("_rels/.rels", rels),
            ("xl/workbook.xml", workbook),
            ("xl/_rels/workbook.xml.rels", wb_rels),
            ("xl/sharedStrings.xml", sst),
        ] + [
            (f"xl/worksheets/sheet{i + 1}.xml", part)
            for i, part in enumerate(ws_parts)
        ]
        for name, data in members:
            zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zi.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(zi, data)
    return buf.getvalue()


def expected_xlsx_markdown(
    logical_name: str, sheets: list[tuple[str, list[list]]]
) -> str:
    """Golden builder stated top-down from the sheet spec (interior
    None gaps become empty cells; TRAILING Nones disappear, matching
    the writer's sparse cells — render_table right-pads to the widest
    row anyway; numerics render as their python str)."""
    md = ["# " + escape_md(logical_name) + "\n", "\n"]
    for name, grid in sheets:
        md.append("## " + escape_md(name) + "\n")
        md.append("\n")
        rows = []
        for row in grid:
            r = list(row)
            while r and r[-1] is None:
                r.pop()
            rows.append(["" if v is None else str(v) for v in r])
        if rows:
            md.append(render_table(rows) + "\n")
            md.append("\n")
    return "".join(md)
