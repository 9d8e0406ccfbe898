"""Real-PDF word-box provider: the input contract the reference's
converter actually consumes.

The reference opens genuine PDF bytes with PdfPig and walks
``page.GetWords()`` for word boxes (PdfToMarkdownConverter.cs:81-113,
:285). Round 2's engine only spoke the synthetic html word-box dialect
(htmlwords.py) — geometry-faithful but not an entry point for real
PDFs. This module closes that gap with a pluggable provider:

* ``parse_pdf_word_pages(pdf_bytes)`` — a minimal pure-python PDF text
  extractor (the sandbox has no PdfPig analog / pdfminer): walks the
  page tree, FlateDecode-inflates content streams, interprets the text
  ops (BT/ET, Tf, Tm, Td, TD, TL, T*, Tj, TJ, ') with a text-matrix
  cursor, and emits per-word boxes. Word widths use the Courier metric
  (fixed 0.6 em advance) — exact for Courier-family fonts, approximate
  otherwise; per-glyph /Widths tables are the PdfPig-scale concern and
  the documented upgrade path.
* ``layout_words`` / ``write_pdf`` — a deterministic Courier layout
  engine + writer producing valid PDFs (xref table, page tree,
  FlateDecode streams). Fixture generator for the golden tests AND the
  round-trip proof: ``parse_pdf_word_pages(write_pdf(layout(text)))``
  reproduces the layout's word boxes exactly, so the converter output
  is byte-identical whether the words arrived via PDF bytes or not.

Both providers share the converter's ``RawWord`` contract:
``provider(bytes) -> (pages: list[list[RawWord]], heights: list[float])``.
"""

from __future__ import annotations

import re
import zlib

from sharepointcrawler_spark.extraction.converter import RawWord

# Courier metrics: every glyph advances 600/1000 em; cap height ~0.7 em.
# One shared helper so the layout engine and the parser compute
# IDENTICAL float expressions (exact round-trip through the PDF bytes).
CHAR_W = 0.6
CAP_H = 0.7


def word_box(x: float, y: float, size: float, text: str) -> RawWord:
    """The (baseline-x, baseline-y, font size) -> box mapping shared by
    writer and parser."""
    return RawWord(
        text=text,
        left=x,
        right=x + CHAR_W * size * len(text),
        top=y + CAP_H * size,
        bottom=y,
    )


# ------------------------------------------------------------- layout


def layout_words(
    text: str,
    page_width: float = 612.0,
    page_height: float = 792.0,
    margin: float = 72.0,
    size: float = 12.0,
    leading: float = 14.4,
) -> tuple[list[list[RawWord]], list[float]]:
    """Deterministic Courier word wrap: the fixture generator's geometry.
    Blank input lines force line breaks (paragraph gaps)."""
    pages: list[list[RawWord]] = [[]]
    heights: list[float] = [page_height]
    x, y = margin, page_height - margin
    max_x = page_width - margin

    def newline(n: int = 1):
        nonlocal x, y
        x = margin
        y -= leading * n
        if y < margin:
            pages.append([])
            heights.append(page_height)
            y = page_height - margin

    for line in text.split("\n"):
        if not line.strip():
            newline()
            continue
        for w in line.split():
            width = CHAR_W * size * len(w)
            if x > margin and x + width > max_x:
                newline()
            pages[-1].append(word_box(x, y, size, w))
            x += width + CHAR_W * size  # glyphs + one space advance
        newline()
    if not pages[-1] and len(pages) > 1:
        pages.pop()
        heights.pop()
    return pages, heights


# ------------------------------------------------------------- writer


def _num(v: float) -> str:
    """Shortest exact decimal for a coordinate (repr round-trips floats;
    PDF numbers cannot use exponent notation — our coordinate range
    never triggers it)."""
    s = repr(float(v))
    assert "e" not in s and "E" not in s, f"coordinate out of range: {v}"
    return s[:-2] if s.endswith(".0") else s


def _escape(text: str) -> bytes:
    return (
        text.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
    ).encode("latin-1", errors="replace")


def write_pdf(
    pages: list[list[RawWord]], heights: list[float], page_width: float = 612.0
) -> bytes:
    """Word boxes -> valid PDF bytes: page tree + Courier font +
    FlateDecode content streams, one absolute ``Tm`` + ``Tj`` per word
    (size recovered from the box height via the shared CAP_H metric)."""
    objs: list[bytes] = []  # 1-indexed by position+1

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)

    font = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Courier >>")
    page_ids: list[int] = []
    kids_slot = add(b"PLACEHOLDER")  # /Pages node patched after kids exist
    for words, h in zip(pages, heights):
        parts = [b"BT"]
        last_size = None
        for w in words:
            # recover the font size from the box height; round away the
            # top-bottom float residue so a 12pt layout writes "12" and
            # the parser's Courier width math reproduces `right` exactly
            size = round((w.top - w.bottom) / CAP_H, 6)
            if size != last_size:
                parts.append(b"/F1 " + _num(size).encode() + b" Tf")
                last_size = size
            parts.append(
                b"1 0 0 1 " + _num(w.left).encode() + b" " + _num(w.bottom).encode()
                + b" Tm (" + _escape(w.text) + b") Tj"
            )
        parts.append(b"ET")
        raw = b"\n".join(parts)
        flate = zlib.compress(raw)
        content = add(
            b"<< /Length " + str(len(flate)).encode()
            + b" /Filter /FlateDecode >>\nstream\n" + flate + b"\nendstream"
        )
        page_ids.append(
            add(
                b"<< /Type /Page /Parent " + str(kids_slot).encode() + b" 0 R"
                + b" /MediaBox [0 0 " + _num(page_width).encode() + b" "
                + _num(h).encode() + b"]"
                + b" /Resources << /Font << /F1 " + str(font).encode() + b" 0 R >> >>"
                + b" /Contents " + str(content).encode() + b" 0 R >>"
            )
        )
    kids = b" ".join(str(p).encode() + b" 0 R" for p in page_ids)
    objs[kids_slot - 1] = (
        b"<< /Type /Pages /Kids [" + kids + b"] /Count " + str(len(page_ids)).encode() + b" >>"
    )
    catalog = add(b"<< /Type /Catalog /Pages " + str(kids_slot).encode() + b" 0 R >>")

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += str(i).encode() + b" 0 obj\n" + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 " + str(len(objs) + 1).encode() + b"\n"
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        b"trailer\n<< /Size " + str(len(objs) + 1).encode()
        + b" /Root " + str(catalog).encode() + b" 0 R >>\n"
        + b"startxref\n" + str(xref_at).encode() + b"\n%%EOF\n"
    )
    return bytes(out)


# ------------------------------------------------------------- parser

_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b(.*?)endobj", re.S)
_STREAM_RE = re.compile(rb"^(.*?)stream\r?\n(.*)\nendstream\s*$", re.S)
_MEDIABOX_RE = re.compile(
    rb"/MediaBox\s*\[\s*([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s*\]"
)
_CONTENTS_RE = re.compile(rb"/Contents\s+(\d+)\s+\d+\s+R")
_KIDS_RE = re.compile(rb"/Kids\s*\[((?:\s*\d+\s+\d+\s+R)+)\s*\]")
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")
_TOKEN_RE = re.compile(
    rb"\((?:\\.|[^\\()])*\)"  # string literal
    rb"|/[^\s\[\]()<>/]+"  # name
    rb"|[-+]?[0-9]*\.?[0-9]+"  # number
    rb"|\[|\]"
    rb"|[A-Za-z'\"*]+"  # operator
)
_UNESCAPE_RE = re.compile(rb"\\([nrtbf\\()]|[0-7]{1,3})")
_UNESCAPE_MAP = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"\\": b"\\", b"(": b"(", b")": b")",
}


def _unescape(s: bytes) -> str:
    def sub(m: re.Match) -> bytes:
        g = m.group(1)
        return _UNESCAPE_MAP.get(g) or bytes([int(g, 8)])

    return _UNESCAPE_RE.sub(sub, s[1:-1]).decode("latin-1")


class _TextState:
    """The text-object cursor: enough of the PDF text matrix for word
    positions (translation + uniform scale; rotated text unsupported)."""

    def __init__(self) -> None:
        self.size = 12.0
        self.scale = 1.0
        self.x = self.y = self.line_x = 0.0
        self.leading = 0.0

    def eff_size(self) -> float:
        return self.size * self.scale


def _emit_words(st: _TextState, text: str, out: list[RawWord]) -> None:
    """Split a shown string on spaces, advancing the Courier cursor —
    handles whole-line Tj strings, not just one-word-per-Tj writers."""
    size = st.eff_size()
    for seg in text.split(" "):
        if seg:
            out.append(word_box(st.x, st.y, size, seg))
        st.x += CHAR_W * size * (len(seg) + 1)
    st.x -= CHAR_W * size  # the split added one trailing space advance


def _interpret(content: bytes, out: list[RawWord]) -> None:
    st = _TextState()
    stack: list = []
    in_array: list | None = None
    for m in _TOKEN_RE.finditer(content):
        tok = m.group(0)
        if tok == b"[":
            in_array = []
            continue
        if tok == b"]":
            stack.append(in_array)
            in_array = None
            continue
        if tok.startswith(b"("):
            (in_array if in_array is not None else stack).append(_unescape(tok))
            continue
        if tok.startswith(b"/"):
            stack.append(tok)
            continue
        if re.fullmatch(rb"[-+]?[0-9]*\.?[0-9]+", tok):
            (in_array if in_array is not None else stack).append(float(tok))
            continue
        op = tok
        if op == b"BT":
            st.x = st.y = st.line_x = 0.0
            st.scale = 1.0
        elif op == b"Tf" and len(stack) >= 1:
            st.size = float(stack[-1])
        elif op == b"Tm" and len(stack) >= 6:
            a, _b, _c, d, e, f = (float(v) for v in stack[-6:])
            st.scale = d if d else 1.0
            st.x = st.line_x = e
            st.y = f
        elif op in (b"Td", b"TD") and len(stack) >= 2:
            tx, ty = float(stack[-2]), float(stack[-1])
            st.line_x += tx
            st.x = st.line_x
            st.y += ty
            if op == b"TD":
                st.leading = -ty
        elif op == b"TL" and len(stack) >= 1:
            st.leading = float(stack[-1])
        elif op == b"T*":
            st.x = st.line_x
            st.y -= st.leading
        elif op == b"Tj" and stack and isinstance(stack[-1], str):
            _emit_words(st, stack[-1], out)
        elif op == b"'" and stack and isinstance(stack[-1], str):
            st.x = st.line_x
            st.y -= st.leading
            _emit_words(st, stack[-1], out)
        elif op == b"TJ" and stack and isinstance(stack[-1], list):
            for item in stack[-1]:
                if isinstance(item, str):
                    _emit_words(st, item, out)
                else:  # kerning adjustment: thousandths of em, leftward
                    st.x -= float(item) / 1000.0 * st.eff_size()
        stack.clear()


def parse_pdf_word_pages(pdf: bytes) -> tuple[list[list[RawWord]], list[float]]:
    """PDF bytes -> (per-page word boxes, page heights) — the PdfPig
    ``page.GetWords()`` analog (PdfToMarkdownConverter.cs:285)."""
    bodies: dict[int, bytes] = {}
    streams: dict[int, bytes] = {}
    for m in _OBJ_RE.finditer(pdf or b""):
        num, body = int(m.group(1)), m.group(2)
        sm = _STREAM_RE.match(body)
        if sm:
            head, payload = sm.group(1), sm.group(2)
            if b"/FlateDecode" in head:
                payload = zlib.decompress(payload)
            bodies[num] = head
            streams[num] = payload
        else:
            bodies[num] = body

    # page order from the /Pages node's /Kids; fall back to object order
    kid_order: list[int] = []
    for num, body in bodies.items():
        if b"/Type" in body and b"/Pages" in body and num not in streams:
            km = _KIDS_RE.search(body)
            if km:
                kid_order = [int(r.group(1)) for r in _REF_RE.finditer(km.group(1))]
                break
    page_nums = kid_order or sorted(
        n for n, b in bodies.items() if b"/Type" in b and re.search(rb"/Page\b", b)
    )

    pages: list[list[RawWord]] = []
    heights: list[float] = []
    for n in page_nums:
        body = bodies.get(n, b"")
        mb = _MEDIABOX_RE.search(body)
        heights.append(float(mb.group(4)) if mb else 792.0)
        cm = _CONTENTS_RE.search(body)
        words: list[RawWord] = []
        if cm and int(cm.group(1)) in streams:
            _interpret(streams[int(cm.group(1))], words)
        pages.append(words)
    return pages, heights


def is_pdf(blob: bytes | None) -> bool:
    return bool(blob) and blob[:5] == b"%PDF-"
