"""Real-PDF word-box provider: the input contract the reference's
converter actually consumes.

The reference opens genuine PDF bytes with PdfPig and walks
``page.GetWords()`` for word boxes (PdfToMarkdownConverter.cs:81-113,
:285). Round 2's engine only spoke the synthetic html word-box dialect
(htmlwords.py) — geometry-faithful but not an entry point for real
PDFs. This module closes that gap with a pluggable provider:

* ``parse_pdf_word_pages(pdf_bytes)`` — a minimal pure-python PDF text
  extractor (the sandbox has no PdfPig analog / pdfminer): walks the
  page tree, FlateDecode-inflates content streams (payloads delimited
  by the dict's /Length — literal or indirect — so binary bytes that
  happen to spell ``endobj`` cannot truncate an object), interprets
  the text ops (BT/ET, Tf, Tm, Td, TD, TL, T*, Tj, TJ, ') including
  hex string literals, with a text-matrix cursor, and emits per-word
  boxes. Word advances honor per-glyph ``/Widths`` + ``/FirstChar``
  tables from the page's font resources; fonts without a width table
  fall back to the Adobe core-14 Helvetica AFM advances when the
  /BaseFont says Helvetica/Arial, else the Courier 0.6-em metric.
  Modern (PDF 1.5+) file structure is handled natively: ``/ObjStm``
  compressed object streams are expanded into the object table and
  ``/Type /XRef`` cross-reference streams are decoded (PNG predictor,
  /W field widths) and validated entry-by-entry against the file.
  Constructs the interpreter genuinely cannot handle (corrupt xref or
  object streams, partially-mapped Type0 fonts, text ops yielding zero
  words) are COLLECTED AS ISSUES and raised as ``UnsupportedPdfError``
  in strict mode — never silent empty output (the production UDF path
  uses strict mode and surfaces the error as a null-markdown flag).
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


class UnsupportedPdfError(ValueError):
    """A real-PDF construct the minimal interpreter cannot extract
    faithfully (corrupt xref/object streams, partially-mapped Type0
    fonts, or text ops that produced zero words). Raised in strict mode
    so silent data loss is impossible; ``.issues`` lists every detected
    construct."""

    def __init__(self, issues: list[str]):
        super().__init__("; ".join(issues))
        self.issues = issues


# Adobe core-14 Helvetica advance widths (thousandths of an em) for the
# printable ASCII range, from the published Helvetica AFM — the
# PdfPig-style fallback when a Helvetica/Arial font omits /Widths.
_HELVETICA_ASCII = [
    278, 278, 355, 556, 556, 889, 667, 191, 333, 333, 389, 584, 278, 333,
    278, 278, 556, 556, 556, 556, 556, 556, 556, 556, 556, 556, 278, 278,
    584, 584, 584, 556, 1015, 667, 667, 722, 722, 667, 611, 778, 722, 278,
    500, 667, 556, 833, 722, 778, 667, 778, 722, 667, 611, 722, 667, 944,
    667, 667, 611, 278, 278, 278, 469, 556, 333, 556, 556, 500, 556, 556,
    278, 556, 556, 222, 222, 500, 222, 833, 556, 556, 556, 556, 333, 500,
    278, 556, 500, 722, 500, 500, 500, 334, 260, 334, 584,
]
HELVETICA_WIDTHS = {32 + i: w for i, w in enumerate(_HELVETICA_ASCII)}


class FontMetrics:
    """Per-glyph advance widths in thousandths of an em.

    ``widths=None`` means the fixed Courier metric — and then every box
    uses the LEGACY float expression ``CHAR_W * size * len(text)``
    verbatim, keeping the Courier round-trip bit-identical to round 3.
    With a width table, a word's advance is the integer sum of its
    glyph widths divided by 1000 once (deterministic, order-free), so
    the layout engine and the parser land on identical floats."""

    def __init__(
        self,
        name: str = "Courier",
        widths: dict[int, int] | None = None,
        default_width: int = 600,
        to_text: dict[int, str] | None = None,
    ):
        self.name = name
        self.widths = widths
        self.default_width = default_width
        # /Encoding /Differences remapping: byte code -> glyph text.
        # Advances stay keyed by CODE (the /Widths array is code-
        # indexed), only the extracted text changes.
        self.to_text = to_text

    def text_em(self, text: str) -> float:
        """Advance of ``text`` in em units (multiply by font size)."""
        assert self.widths is not None
        w = self.widths
        d = self.default_width
        return sum(w.get(ord(c), d) for c in text) / 1000.0

    def space_em(self) -> float:
        assert self.widths is not None
        return self.widths.get(32, self.default_width) / 1000.0


COURIER = FontMetrics("Courier")
HELVETICA = FontMetrics("Helvetica", widths=HELVETICA_WIDTHS, default_width=556)


class CIDFontMetrics:
    """Type0 / Identity-H composite font: show strings are 2-BYTE CIDs,
    advances come from the descendant CIDFont's ``/W`` array (+ ``/DW``
    default), and the extracted TEXT comes from the ``/ToUnicode`` CMap
    (cid -> unicode). The common real-PDF shape for embedded/subset
    fonts, which round 3 only flagged."""

    cid = True
    widths = None  # FontMetrics-compat: the non-CID paths never engage

    def __init__(
        self,
        name: str,
        w: dict[int, int],
        dw: int = 1000,
        to_unicode: dict[int, str] | None = None,
        issues: list[str] | None = None,
    ):
        self.name = name
        self.w = w
        self.dw = dw
        self.to_unicode = to_unicode or {}
        # shared reference to the document's issue list: a CID absent
        # from the CMap is flagged HERE, at show time, so strict mode
        # rejects partially-mapped fonts instead of silently emitting
        # U+FFFD word text (ADVICE r4 low: the 'never silent wrong
        # text' contract must cover the per-glyph fallback too)
        self.issues = issues
        self.missing_cids: set[int] = set()


def _emit_cid_string(st: "_TextState", raw: str, out: list[RawWord]) -> None:
    """Show a CID string: pair the latin-1 bytes into 2-byte CIDs, map
    each to (unicode, width); words split on mapped spaces. Widths are
    summed as INTEGER thousandths and divided once, mirroring
    FontMetrics.text_em so a layout round trip is float-exact."""
    f = st.font
    size = st.eff_size()
    decoded = []
    for i in range(0, len(raw) - 1, 2):
        cid = (ord(raw[i]) << 8) | ord(raw[i + 1])
        if cid not in f.to_unicode:
            if not f.missing_cids and f.issues is not None:
                f.issues.append(
                    f"Type0 font {f.name}: CIDs missing from ToUnicode CMap"
                )
            f.missing_cids.add(cid)
        decoded.append((f.to_unicode.get(cid, "�"), f.w.get(cid, f.dw)))
    acc_u: list[str] = []
    acc_w = 0

    def flush():
        nonlocal acc_u, acc_w
        if acc_u:
            em = acc_w / 1000.0
            out.append(
                RawWord(
                    text="".join(acc_u),
                    left=st.x,
                    right=st.x + em * size,
                    top=st.y + CAP_H * size,
                    bottom=st.y,
                )
            )
            st.x += em * size
            acc_u, acc_w = [], 0

    for u, wd in decoded:
        if u == " ":
            flush()
            st.x += wd / 1000.0 * size
        else:
            acc_u.append(u)
            acc_w += wd
    flush()


def word_box(
    x: float, y: float, size: float, text: str, font: FontMetrics | None = None
) -> RawWord:
    """The (baseline-x, baseline-y, font size) -> box mapping shared by
    writer and parser. Proportional fonts pass their metrics; the
    default keeps the exact legacy Courier expression."""
    if font is not None and font.widths is not None:
        right = x + font.text_em(text) * size
    else:
        right = x + CHAR_W * size * len(text)
    return RawWord(
        text=text,
        left=x,
        right=right,
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
    font: FontMetrics | None = None,
) -> tuple[list[list[RawWord]], list[float]]:
    """Deterministic word wrap: the fixture generator's geometry.
    Blank input lines force line breaks (paragraph gaps). ``font=None``
    is the legacy Courier layout; a proportional ``FontMetrics`` uses
    its per-glyph advances (the same expressions the parser computes,
    so the round trip stays float-exact)."""
    pages: list[list[RawWord]] = [[]]
    heights: list[float] = [page_height]
    x, y = margin, page_height - margin
    max_x = page_width - margin
    proportional = font is not None and font.widths is not None

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
            if proportional:
                width = font.text_em(w) * size
                space = font.space_em() * size
            else:
                width = CHAR_W * size * len(w)
                space = CHAR_W * size
            if x > margin and x + width > max_x:
                newline()
            pages[-1].append(word_box(x, y, size, w, font))
            x += width + space  # glyphs + one space advance
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


def _simple_font_body(
    font_metrics: FontMetrics | None, embed_widths: bool
) -> bytes:
    """The /Type1 font dict shared by the classic and modern writers:
    with a width table and ``embed_widths`` the /FirstChar+/Widths
    arrays are embedded (so a parser must READ them), without it only
    /BaseFont is named (so a parser must fall back to its AFM table)."""
    if font_metrics is not None and font_metrics.widths is not None and embed_widths:
        codes = sorted(font_metrics.widths)
        fc, lc = codes[0], codes[-1]
        warr = b" ".join(
            str(font_metrics.widths.get(c, font_metrics.default_width)).encode()
            for c in range(fc, lc + 1)
        )
        return (
            b"<< /Type /Font /Subtype /Type1 /BaseFont /"
            + font_metrics.name.encode()
            + b" /FirstChar " + str(fc).encode()
            + b" /LastChar " + str(lc).encode()
            + b" /Widths [" + warr + b"] >>"
        )
    base = font_metrics.name if font_metrics is not None else "Courier"
    return b"<< /Type /Font /Subtype /Type1 /BaseFont /" + base.encode() + b" >>"


def _simple_content_ops(words: list[RawWord]) -> bytes:
    """One absolute ``Tm`` + literal-string ``Tj`` per word (size
    recovered from the box height via the shared CAP_H metric; rounded
    so a 12pt layout writes "12" and the parser's width math reproduces
    ``right`` exactly)."""
    parts = [b"BT"]
    last_size = None
    for w in words:
        size = round((w.top - w.bottom) / CAP_H, 6)
        if size != last_size:
            parts.append(b"/F1 " + _num(size).encode() + b" Tf")
            last_size = size
        parts.append(
            b"1 0 0 1 " + _num(w.left).encode() + b" " + _num(w.bottom).encode()
            + b" Tm (" + _escape(w.text) + b") Tj"
        )
    parts.append(b"ET")
    return b"\n".join(parts)


def write_pdf(
    pages: list[list[RawWord]],
    heights: list[float],
    page_width: float = 612.0,
    font_metrics: FontMetrics | None = None,
    embed_widths: bool = True,
) -> bytes:
    """Word boxes -> valid PDF bytes: page tree + font + FlateDecode
    content streams, one absolute ``Tm`` + ``Tj`` per word (size
    recovered from the box height via the shared CAP_H metric).
    ``font_metrics`` with a width table writes a proportional font; with
    ``embed_widths`` the /FirstChar+/Widths arrays are embedded (so a
    parser must READ them), without it only /BaseFont is named (so a
    parser must fall back to its built-in AFM table)."""
    objs: list[bytes] = []  # 1-indexed by position+1

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)

    font = add(_simple_font_body(font_metrics, embed_widths))
    page_ids: list[int] = []
    kids_slot = add(b"PLACEHOLDER")  # /Pages node patched after kids exist
    for words, h in zip(pages, heights):
        flate = zlib.compress(_simple_content_ops(words))
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


def _png_predict_up(rows: list[bytes]) -> bytes:
    """Apply the PNG Up filter (Predictor 12) to fixed-width rows: each
    stored row is filter byte 2 + (row - previous row) mod 256 — the
    encoding real PDF writers use for xref stream data."""
    out = bytearray()
    prev = bytes(len(rows[0])) if rows else b""
    for r in rows:
        out.append(2)
        out += bytes((r[j] - prev[j]) & 0xFF for j in range(len(r)))
        prev = r
    return bytes(out)


def write_pdf_modern(
    pages: list[list[RawWord]],
    heights: list[float],
    page_width: float = 612.0,
    font_metrics: FontMetrics | None = None,
    embed_widths: bool = True,
) -> bytes:
    """Word boxes -> PDF 1.5 bytes with MODERN file structure: every
    dict-only object (font, page tree, pages, catalog) lives inside a
    FlateDecode ``/Type /ObjStm`` compressed object stream, and the
    cross-reference table is a ``/Type /XRef`` stream (binary /W [1 3 2]
    entries, PNG Up predictor /Predictor 12, trailer fields in the
    stream dict — no classic ``xref``/``trailer`` sections at all).
    This is the file shape nearly every PDF written since ~2010 uses
    (PdfPig reads it natively, PdfToMarkdownConverter.cs:81-113); the
    fixture generator for the parser's compressed-xref path. Content
    streams stay top-level (streams cannot live inside an ObjStm,
    §7.5.7) with type-1 xref entries; packed objects get type-2
    entries (objstm number, index)."""
    n_pages = len(pages)
    content_nums = list(range(1, n_pages + 1))
    font_num = n_pages + 1
    pages_num = n_pages + 2
    page_obj_nums = [n_pages + 3 + i for i in range(n_pages)]
    catalog_num = 2 * n_pages + 3
    objstm_num = 2 * n_pages + 4
    xref_num = 2 * n_pages + 5

    content_objs: list[bytes] = []
    for words in pages:
        flate = zlib.compress(_simple_content_ops(words))
        content_objs.append(
            b"<< /Length " + str(len(flate)).encode()
            + b" /Filter /FlateDecode >>\nstream\n" + flate + b"\nendstream"
        )
    page_bodies = [
        b"<< /Type /Page /Parent " + str(pages_num).encode() + b" 0 R"
        + b" /MediaBox [0 0 " + _num(page_width).encode() + b" "
        + _num(h).encode() + b"]"
        + b" /Resources << /Font << /F1 " + str(font_num).encode() + b" 0 R >> >>"
        + b" /Contents " + str(c).encode() + b" 0 R >>"
        for c, h in zip(content_nums, heights)
    ]
    kids = b" ".join(str(p).encode() + b" 0 R" for p in page_obj_nums)
    embedded: list[tuple[int, bytes]] = [
        (font_num, _simple_font_body(font_metrics, embed_widths)),
        (
            pages_num,
            b"<< /Type /Pages /Kids [" + kids + b"] /Count "
            + str(n_pages).encode() + b" >>",
        ),
        *zip(page_obj_nums, page_bodies),
        (catalog_num, b"<< /Type /Catalog /Pages " + str(pages_num).encode() + b" 0 R >>"),
    ]
    blob = b""
    pair_offs: list[tuple[int, int]] = []
    for onum, body in embedded:
        pair_offs.append((onum, len(blob)))
        blob += body + b"\n"
    header = b" ".join(b"%d %d" % p for p in pair_offs) + b"\n"
    stm_flate = zlib.compress(header + blob)
    objstm_body = (
        b"<< /Type /ObjStm /N " + str(len(embedded)).encode()
        + b" /First " + str(len(header)).encode()
        + b" /Length " + str(len(stm_flate)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + stm_flate + b"\nendstream"
    )

    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for onum, body in [*zip(content_nums, content_objs), (objstm_num, objstm_body)]:
        offsets[onum] = len(out)
        out += b"%d 0 obj\n" % onum + body + b"\nendobj\n"
    xref_at = len(out)
    offsets[xref_num] = xref_at

    size = xref_num + 1
    embedded_index = {onum: i for i, (onum, _) in enumerate(embedded)}
    raw_rows: list[bytes] = []
    for onum in range(size):
        if onum == 0:
            typ, f2, f3 = 0, 0, 65535
        elif onum in offsets:
            typ, f2, f3 = 1, offsets[onum], 0
        else:
            typ, f2, f3 = 2, objstm_num, embedded_index[onum]
        raw_rows.append(bytes([typ]) + f2.to_bytes(3, "big") + f3.to_bytes(2, "big"))
    xref_flate = zlib.compress(_png_predict_up(raw_rows))
    out += (
        b"%d 0 obj\n" % xref_num
        + b"<< /Type /XRef /Size " + str(size).encode()
        + b" /W [1 3 2] /Index [0 " + str(size).encode() + b"]"
        + b" /Root " + str(catalog_num).encode() + b" 0 R"
        + b" /Filter /FlateDecode"
        + b" /DecodeParms << /Predictor 12 /Columns 6 >>"
        + b" /Length " + str(len(xref_flate)).encode()
        + b" >>\nstream\n" + xref_flate + b"\nendstream\nendobj\n"
    )
    out += b"startxref\n" + str(xref_at).encode() + b"\n%%EOF\n"
    return bytes(out)


def append_pdf_update(
    pdf: bytes, replacements: dict[int, bytes], trailer_extra: bytes = b""
) -> bytes:
    """Append an incremental-update section (PDF 32000-1 §7.5.6 — the
    file shape digital signatures and annotations produce): replacement
    object bodies, a classic xref section with one subsection per
    replaced object, and a trailer chaining to the previous xref via
    /Prev. The original bytes are untouched (append-only), so the
    NEWEST definition of each object is the one nearest the end —
    exactly the precedence the parser's last-wins object scan applies.
    ``trailer_extra`` injects additional trailer entries (the
    encryption fixture adds /Encrypt + /ID this way)."""
    m = re.search(rb"startxref\s+(\d+)\s*%%EOF\s*$", pdf)
    prev_xref = int(m.group(1)) if m else 0
    rm = re.search(rb"/Root\s+(\d+)\s+\d+\s+R", pdf)
    root = int(rm.group(1)) if rm else 1
    sm = re.search(rb"/Size\s+(\d+)", pdf)
    size = max(
        int(sm.group(1)) if sm else 0, max(replacements, default=0) + 1
    )
    out = bytearray(pdf)
    if not out.endswith(b"\n"):
        out += b"\n"
    offsets: dict[int, int] = {}
    for num in sorted(replacements):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + replacements[num] + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n"
    for num in sorted(offsets):
        out += b"%d 1\n" % num + b"%010d 00000 n \n" % offsets[num]
    out += (
        b"trailer\n<< /Size " + str(size).encode()
        + b" /Root " + str(root).encode() + b" 0 R"
        + b" /Prev " + str(prev_xref).encode()
        + trailer_extra + b" >>\n"
        + b"startxref\n" + str(xref_at).encode() + b"\n%%EOF\n"
    )
    return bytes(out)


def encrypt_pdf(
    pdf: bytes,
    user_pwd: bytes = b"",
    owner_pwd: bytes = b"owner",
    r: int = 3,
    length_bits: int = 128,
    p: int = -4,
    file_id: bytes = bytes(range(16)),
) -> bytes:
    """Fixture encryptor: standard security handler §7.6.3, revision 2
    (RC4-40, /V 1) or 3 (RC4-128, /V 2). Every stream payload is
    RC4-encrypted IN PLACE with its per-object key (RC4 preserves
    length, so existing xref offsets stay valid), then an incremental
    update appends the /Encrypt dictionary and a trailer carrying
    /Encrypt + /ID. /O is computed properly from the owner password
    (Algorithm 3) and /U from the file key (Algorithm 4/5), so a
    spec-faithful reader opens ``user_pwd=b""`` files transparently and
    rejects others."""
    import hashlib

    if r not in (2, 3, 4):
        raise ValueError("only standard-handler revisions 2, 3 and 4 supported")
    v = {2: 1, 3: 2, 4: 4}[r]
    n = 5 if r == 2 else length_bits // 8
    # Algorithm 3: /O from the owner password
    h = hashlib.md5((owner_pwd + _PAD)[:32]).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h).digest()
    okey = h[:n]
    o = _rc4(okey, (user_pwd + _PAD)[:32])
    if r >= 3:
        for i in range(1, 20):
            o = _rc4(bytes(b ^ i for b in okey), o)
    key = _std_file_key(user_pwd, o, p, file_id, r, n)
    u = _std_user_check(key, file_id, r)
    if r >= 3:
        u = u + b"\x00" * 16  # §7.6.3.4: last 16 bytes arbitrary
    if r == 4:
        return _encrypt_pdf_aes_rebuild(pdf, key, o, u, p, file_id, n)
    out = bytearray(pdf)
    pos = 0
    while True:
        m = _OBJ_HEAD_RE.search(out, pos)
        if m is None:
            break
        num, gen, body_start = int(m.group(1)), int(m.group(2)), m.end()
        em = out.find(b"endobj", body_start)
        sm = _STREAM_KW_RE.search(out, body_start, em if em != -1 else len(out))
        if sm is None:
            pos = em + 6 if em != -1 else len(out)
            continue
        head = bytes(out[body_start : sm.start()])
        ll = _LENGTH_LIT_RE.search(head)
        if ll is None:
            raise ValueError(
                "encrypt_pdf fixture requires literal /Length stream dicts"
            )
        length, data_start = int(ll.group(1)), sm.end()
        if b"/XRef" not in head:  # xref streams are never encrypted
            enc = _rc4(
                _object_key(key, num, gen),
                bytes(out[data_start : data_start + length]),
            )
            out[data_start : data_start + length] = enc
        after = out.find(b"endobj", data_start + length)
        pos = after + 6 if after != -1 else data_start + length
    sm2 = re.search(rb"/Size\s+(\d+)", pdf)
    enc_num = (int(sm2.group(1)) if sm2 else 50) + 10
    enc_body = (
        b"<< /Filter /Standard /V " + str(v).encode()
        + b" /R " + str(r).encode()
        + b" /Length " + str(n * 8).encode()
        + b" /P " + str(p).encode()
        + b" /O <" + o.hex().encode() + b">"
        + b" /U <" + u.hex().encode() + b"> >>"
    )
    idhex = file_id.hex().encode()
    return append_pdf_update(
        bytes(out),
        {enc_num: enc_body},
        trailer_extra=(
            b" /Encrypt " + str(enc_num).encode() + b" 0 R"
            + b" /ID [<" + idhex + b"> <" + idhex + b">]"
        ),
    )


def _encrypt_pdf_aes_rebuild(
    pdf: bytes,
    key: bytes,
    o: bytes,
    u: bytes,
    p: int,
    file_id: bytes,
    n: int,
) -> bytes:
    """AES fixture path: AES-CBC grows every stream (16-byte IV +
    padding), so unlike RC4 the file cannot be patched in place — the
    whole body is re-emitted with updated /Length literals, a fresh
    classic xref over the REAL offsets, and a trailer carrying the
    crypt-filter /Encrypt dictionary (/V 4 /R 4 /StdCF /AESV2). IVs are
    deterministic (md5 of the object id) so fixture bytes reproduce."""
    import hashlib

    from sharepointcrawler_spark.extraction.aes import aes_cbc_encrypt

    objs: list[tuple[int, int, bytes | None, bytes]] = []
    pos = 0
    while True:
        m = _OBJ_HEAD_RE.search(pdf, pos)
        if m is None:
            break
        num, gen, body_start = int(m.group(1)), int(m.group(2)), m.end()
        em = pdf.find(b"endobj", body_start)
        if em == -1:
            raise ValueError(
                "encrypt_pdf fixture requires well-formed objects (endobj)"
            )
        sm = _STREAM_KW_RE.search(pdf, body_start, em)
        if sm is None:
            objs.append((num, gen, None, pdf[body_start:em]))
            pos = em + 6
            continue
        head = pdf[body_start : sm.start()]
        ll = _LENGTH_LIT_RE.search(head)
        if ll is None:
            raise ValueError(
                "encrypt_pdf fixture requires literal /Length stream dicts"
            )
        length, data_start = int(ll.group(1)), sm.end()
        objs.append((num, gen, head, pdf[data_start : data_start + length]))
        after = pdf.find(b"endobj", data_start + length)
        pos = after + 6 if after != -1 else data_start + length
    rm = re.search(rb"/Root\s+(\d+)\s+\d+\s+R", pdf)
    root = int(rm.group(1)) if rm else 1
    enc_num = max(num for num, _, _, _ in objs) + 1

    out = bytearray(b"%PDF-1.6\n")
    offsets: dict[int, int] = {}
    for num, gen, head, payload in objs:
        offsets[num] = len(out)
        if head is None:
            out += b"%d %d obj" % (num, gen) + payload + b"endobj\n"
            continue
        if b"/XRef" not in head:
            iv = hashlib.md5(b"iv%d_%d" % (num, gen) + file_id).digest()
            payload = aes_cbc_encrypt(
                _object_key(key, num, gen, aes=True), iv, payload
            )
        ll = _LENGTH_LIT_RE.search(head)
        head = (
            head[: ll.start()]
            + b"/Length " + str(len(payload)).encode()
            + head[ll.end() :]
        )
        out += (
            b"%d %d obj" % (num, gen) + head + b"stream\n" + payload
            + b"\nendstream\nendobj\n"
        )
    offsets[enc_num] = len(out)
    out += (
        b"%d 0 obj<< /Filter /Standard /V 4 /R 4 /Length %d /P %d"
        % (enc_num, n * 8, p)
        + b" /CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen /Length 16 >> >>"
        + b" /StmF /StdCF /StrF /StdCF"
        + b" /O <" + o.hex().encode() + b">"
        + b" /U <" + u.hex().encode() + b"> >>endobj\n"
    )
    xref_at = len(out)
    size = enc_num + 1
    out += b"xref\n0 %d\n" % size + b"0000000000 65535 f \n"
    for num in range(1, size):
        if num in offsets:
            out += b"%010d 00000 n \n" % offsets[num]
        else:
            out += b"0000000000 65535 f \n"
    idhex = file_id.hex().encode()
    out += (
        b"trailer\n<< /Size %d /Root %d 0 R /Encrypt %d 0 R /ID [<" % (size, root, enc_num)
        + idhex + b"> <" + idhex + b">] >>\nstartxref\n%d\n%%%%EOF\n" % xref_at
    )
    return bytes(out)


def write_pdf_type0(
    pages: list[list[RawWord]],
    heights: list[float],
    char_metrics: FontMetrics,
    page_width: float = 612.0,
    cid_shift: int = 3,
    omit_cmap_chars: frozenset[str] = frozenset(),
) -> bytes:
    """Word boxes -> PDF bytes through a Type0 / Identity-H composite
    font: every show string is 2-byte CIDs (``cid = ord(char) +
    cid_shift`` — a NONTRIVIAL mapping, so a parser that ignores the
    ToUnicode CMap extracts garbage), the descendant CIDFontType2
    carries per-CID ``/W`` widths copied from ``char_metrics``, and a
    ToUnicode CMap stream maps CIDs back to text. The fixture generator
    for the parser's composite-font path. ``omit_cmap_chars`` drops
    those characters' entries from the ToUnicode CMap (shown CIDs stay
    unchanged) — the partially-mapped-font fixture that must trip
    strict mode instead of silently extracting U+FFFD."""
    charset = sorted({c for ws in pages for w in ws for c in w.text} | {" "})
    cid_of = {c: ord(c) + cid_shift for c in charset}
    widths = char_metrics.widths or {}
    dw = char_metrics.default_width

    objs: list[bytes] = []

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)

    w_entries = b" ".join(
        b"%d [%d]" % (cid_of[c], widths.get(ord(c), dw)) for c in charset
    )
    desc = add(
        b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /"
        + char_metrics.name.encode()
        + b" /CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) /Supplement 0 >>"
        + b" /DW " + str(dw).encode()
        + b" /W [" + w_entries + b"] >>"
    )
    bf_lines = []
    for c in charset:
        if c in omit_cmap_chars:
            continue
        dst = c.encode("utf-16-be").hex().upper()
        bf_lines.append(b"<%04X> <%s>" % (cid_of[c], dst.encode()))
    cmap = (
        b"/CIDInit /ProcSet findresource begin\n12 dict begin\nbegincmap\n"
        b"/CMapName /Adobe-Identity-UCS def\n/CMapType 2 def\n"
        b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
        + str(len(bf_lines)).encode() + b" beginbfchar\n"
        + b"\n".join(bf_lines)
        + b"\nendbfchar\nendcmap\nCMapName currentdict /CMap defineresource pop\nend\nend\n"
    )
    tounicode = add(
        b"<< /Length " + str(len(cmap)).encode() + b" >>\nstream\n" + cmap + b"\nendstream"
    )
    font = add(
        b"<< /Type /Font /Subtype /Type0 /BaseFont /"
        + char_metrics.name.encode()
        + b" /Encoding /Identity-H /DescendantFonts ["
        + str(desc).encode() + b" 0 R] /ToUnicode "
        + str(tounicode).encode() + b" 0 R >>"
    )
    page_ids: list[int] = []
    kids_slot = add(b"PLACEHOLDER")
    for words, h in zip(pages, heights):
        parts = [b"BT"]
        last_size = None
        for w in words:
            size = round((w.top - w.bottom) / CAP_H, 6)
            if size != last_size:
                parts.append(b"/F1 " + _num(size).encode() + b" Tf")
                last_size = size
            hexcids = "".join(f"{cid_of[c]:04X}" for c in w.text)
            parts.append(
                b"1 0 0 1 " + _num(w.left).encode() + b" " + _num(w.bottom).encode()
                + b" Tm <" + hexcids.encode() + b"> Tj"
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
_OBJ_HEAD_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_STREAM_KW_RE = re.compile(rb"stream\r?\n")
_LENGTH_REF_RE = re.compile(rb"/Length\s+(\d+)\s+\d+\s+R")
_LENGTH_LIT_RE = re.compile(rb"/Length\s+(\d+)(?!\s+\d+\s+R)")
_ENDSTREAM_RE = re.compile(rb"\r?\n?endstream")
_MEDIABOX_RE = re.compile(
    rb"/MediaBox\s*\[\s*([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s*\]"
)
_CONTENTS_RE = re.compile(rb"/Contents\s+(\d+)\s+\d+\s+R")
_CONTENTS_ARR_RE = re.compile(rb"/Contents\s*\[((?:\s*\d+\s+\d+\s+R)+)\s*\]")
_KIDS_RE = re.compile(rb"/Kids\s*\[((?:\s*\d+\s+\d+\s+R)+)\s*\]")
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")
_RESOURCES_REF_RE = re.compile(rb"/Resources\s+(\d+)\s+\d+\s+R")
_FONT_DICT_RE = re.compile(rb"/Font\s*<<(.*?)>>", re.S)
_FONT_ENTRY_RE = re.compile(rb"(/[^\s/<>\[\]()]+)\s+(\d+)\s+\d+\s+R")
_BASEFONT_RE = re.compile(rb"/BaseFont\s*/([^\s/<>\[\]()]+)")
_DESC_FONTS_INLINE_RE = re.compile(rb"/DescendantFonts\s*\[\s*(\d+)\s+\d+\s+R")
_DESC_FONTS_REF_RE = re.compile(rb"/DescendantFonts\s+(\d+)\s+\d+\s+R")
_TOUNICODE_RE = re.compile(rb"/ToUnicode\s+(\d+)\s+\d+\s+R")
_DW_RE = re.compile(rb"/DW\s+(\d+)")
_W_REF_RE = re.compile(rb"/W(?![A-Za-z])\s+(\d+)\s+\d+\s+R")
_FIRSTCHAR_RE = re.compile(rb"/FirstChar\s+(\d+)")
_WIDTHS_INLINE_RE = re.compile(rb"/Widths\s*\[(.*?)\]", re.S)
_WIDTHS_REF_RE = re.compile(rb"/Widths\s+(\d+)\s+\d+\s+R")
_SHOW_OP_RE = re.compile(rb"\bTj\b|\bTJ\b|'")
_TOKEN_RE = re.compile(
    rb"\((?:\\.|[^\\()])*\)"  # string literal
    rb"|<[0-9A-Fa-f\s]*>"  # hex string literal
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
        self.font: FontMetrics = COURIER

    def eff_size(self) -> float:
        return self.size * self.scale


def _hex_string(tok: bytes) -> str:
    """PDF hex string literal <...> -> text (odd digit counts pad with
    '0' per the spec)."""
    digits = re.sub(rb"\s+", b"", tok[1:-1])
    if len(digits) % 2:
        digits += b"0"
    return bytes.fromhex(digits.decode("ascii")).decode("latin-1")


def _emit_diff_words(st: "_TextState", text: str, out: list[RawWord]) -> None:
    """Show a string through a simple font carrying an /Encoding
    /Differences map: each byte CODE advances by its code-indexed width
    while the emitted TEXT is the mapped glyph (possibly multi-char,
    e.g. /fi); words split where a code maps to space. Advances sum as
    integer thousandths and divide once (deterministic)."""
    font = st.font
    size = st.eff_size()
    w = font.widths or {}
    d = font.default_width
    chars: list[str] = []
    total = 0  # integer thousandths advanced since show start
    word_start = 0
    x0 = st.x

    def flush() -> None:
        if chars:
            out.append(
                RawWord(
                    text="".join(chars),
                    left=x0 + word_start / 1000.0 * size,
                    right=x0 + total / 1000.0 * size,
                    top=st.y + CAP_H * size,
                    bottom=st.y,
                )
            )

    for ch in text:
        code = ord(ch)
        mapped = font.to_text.get(code, ch)
        if mapped == " ":
            flush()
            chars = []
            total += w.get(code, d)
            word_start = total
        else:
            chars.append(mapped)
            total += w.get(code, d)
    flush()
    st.x = x0 + total / 1000.0 * size


def _emit_words(st: _TextState, text: str, out: list[RawWord]) -> None:
    """Split a shown string on spaces, advancing the cursor by the
    current font's metrics — handles whole-line Tj strings, not just
    one-word-per-Tj writers. CID (Type0) fonts route to the 2-byte
    decode path; /Differences-encoded simple fonts to the code-remap
    path."""
    if getattr(st.font, "cid", False):
        _emit_cid_string(st, text, out)
        return
    if getattr(st.font, "to_text", None):
        _emit_diff_words(st, text, out)
        return
    size = st.eff_size()
    font = st.font
    proportional = font.widths is not None
    segs = text.split(" ")
    for i, seg in enumerate(segs):
        if seg:
            out.append(word_box(st.x, st.y, size, seg, font))
        if proportional:
            st.x += font.text_em(seg) * size
            if i < len(segs) - 1:
                st.x += font.space_em() * size
        else:
            # the legacy Courier expression, verbatim, so round-3 boxes
            # stay bit-identical (the split adds one trailing space
            # advance, removed after the loop)
            st.x += CHAR_W * size * (len(seg) + 1)
    if not proportional:
        st.x -= CHAR_W * size


_INLINE_BI_RE = re.compile(rb"(?<![A-Za-z0-9])BI(?![A-Za-z0-9])")
_INLINE_EI_RE = re.compile(rb"[\r\n ]EI(?![A-Za-z0-9])")
_INLINE_ID_RE = re.compile(rb"(?<![A-Za-z0-9])ID[\r\n ]", re.S)
_INLINE_L_RE = re.compile(rb"/(?:L|Length)\s+(\d+)")


def _strip_inline_images(content: bytes, issues: list[str]) -> bytes:
    """Remove BI..ID..EI inline-image blocks (§8.9.7) before token
    interpretation: the binary sample data between ID and EI would
    otherwise desync the operator tokenizer into garbage words.

    When the image dict carries /L (or /Length), §8.9.5.1's sample-data
    byte count, it is honored FIRST: the data is skipped verbatim and EI
    is required right after it — binary data containing a spurious
    ' EI' can no longer truncate the strip. Without /L the fallback is
    the whitespace-framed EI scan; because that scan can terminate early
    inside binary data, any standalone ID token left over AFTER
    stripping is flagged as a suspect truncation instead of silently
    tokenizing image bytes as operators (the 'never silent wrong text'
    contract). An unterminated BI is likewise flagged."""
    if b"BI" not in content:
        return content
    out: list[bytes] = []
    pos = 0
    used_scan = False
    while True:
        mbi = _INLINE_BI_RE.search(content, pos)
        if not mbi:
            out.append(content[pos:])
            break
        out.append(content[pos : mbi.start()])
        out.append(b" ")
        mid = _INLINE_ID_RE.search(content, mbi.end())
        if not mid:
            issues.append("inline image (BI) without a matching EI")
            pos = mbi.end()
            continue
        params = content[mbi.end() : mid.start()]
        data_start = mid.end()
        ml = _INLINE_L_RE.search(params)
        end = None
        if ml:
            # /L declares the exact sample-data byte count: EI must sit
            # immediately after it (optionally whitespace-separated)
            after = data_start + int(ml.group(1))
            mei = re.match(rb"[\r\n ]*EI(?![A-Za-z0-9])", content[after:])
            if mei:
                end = after + mei.end()
            else:
                issues.append(
                    "inline image /L does not land on EI; falling back to scan"
                )
        if end is None:
            used_scan = True
            mei = _INLINE_EI_RE.search(content, data_start)
            if not mei:
                issues.append("inline image (BI) without a matching EI")
                pos = len(content)
                continue
            end = mei.end()
        pos = end
    stripped = b"".join(out)
    # the /L path cannot truncate; only the EI scan can — gate the
    # stray-ID heuristic on the scan AND exclude string literals, so
    # honest text like '(User ID 5) Tj' never flags: the heuristic
    # targets leftover BINARY image bytes, which do not sit inside
    # balanced parenthesis literals
    no_literals = re.sub(rb"\((?:\\.|[^\\()])*\)", b"", stripped) if used_scan else b""
    if used_scan and _INLINE_ID_RE.search(no_literals):
        issues.append(
            "stray ID after inline-image strip: image data may have been "
            "truncated at a spurious EI inside binary samples"
        )
    return stripped


def _interpret(
    content: bytes, out: list[RawWord], fonts: dict[bytes, FontMetrics] | None = None
) -> None:
    fonts = fonts or {}
    st = _TextState()
    stack: list = []
    in_array: list | None = None
    for m in _TOKEN_RE.finditer(content):
        tok = m.group(0)
        # dispatch on the first byte: _TOKEN_RE's alternation makes the
        # branches disjoint by leading byte, so a token starting with
        # '-', '+', '.' or a digit IS the number alternative — no
        # re.fullmatch needed (numbers are ~90% of content-stream
        # tokens, and the per-call module-level re overhead dominated
        # this loop). Checked first for the same reason.
        b0 = tok[0]
        if b0 in b"-+.0123456789":
            (in_array if in_array is not None else stack).append(float(tok))
            continue
        if tok == b"[":
            in_array = []
            continue
        if tok == b"]":
            stack.append(in_array)
            in_array = None
            continue
        if b0 == 40:  # b"("
            (in_array if in_array is not None else stack).append(_unescape(tok))
            continue
        if b0 == 60:  # b"<"
            (in_array if in_array is not None else stack).append(_hex_string(tok))
            continue
        if b0 == 47:  # b"/"
            stack.append(tok)
            continue
        op = tok
        if op == b"BT":
            st.x = st.y = st.line_x = 0.0
            st.scale = 1.0
        elif op == b"Tf" and len(stack) >= 1:
            st.size = float(stack[-1])
            if len(stack) >= 2 and isinstance(stack[-2], bytes):
                st.font = fonts.get(stack[-2], COURIER)
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


# -------------------------------------------- standard security handler
#
# PDF 32000-1 §7.6.3 (the RC4 "standard security handler", revisions
# 2/3 = RC4-40/RC4-128): the overwhelmingly common case in document
# libraries is an OWNER-password-protected file with an EMPTY user
# password — viewers (and PdfPig, which the reference relies on via
# PdfDocument.Open, PdfToMarkdownConverter.cs:88-93) open these
# transparently by deriving the file key from the empty password. We do
# the same; files whose user password is NOT empty (verification fails)
# or that use newer handlers (AES /V 4+) are strict-flagged with a
# clear "encrypted PDF" issue instead of an opaque filter error.

_PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)

_ENCRYPT_REF_RE = re.compile(rb"/Encrypt\s+(\d+)\s+(\d+)\s+R")
# first /ID element, hex OR literal-string form (both appear in the
# wild; some writers emit binary literals)
_ID_FIRST_RE = re.compile(
    rb"/ID\s*\[\s*(?:<([0-9A-Fa-f\s]*)>|(\((?:\\.|[^\\()])*\)))"
)
_NAME_VAL_RE = rb"\s*(-?\d+)"


def _rc4(key: bytes, data: bytes) -> bytes:
    """Plain RC4 (the cipher §7.6.3 prescribes for /V 1-2). Pure python
    is fine: fixtures and per-document decode are KB-scale."""
    s = list(range(256))
    j = 0
    for i in range(256):
        j = (j + s[i] + key[i % len(key)]) % 256
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for n, b in enumerate(data):
        i = (i + 1) % 256
        j = (j + s[i]) % 256
        s[i], s[j] = s[j], s[i]
        out[n] = b ^ s[(s[i] + s[j]) % 256]
    return bytes(out)


def _crypt_string(body: bytes, name: bytes) -> bytes | None:
    """The /O or /U entry: a 32-byte string, hex or literal form."""
    m = re.search(rb"/" + name + rb"\s*<([0-9A-Fa-f\s]*)>", body)
    if m:
        return bytes.fromhex(m.group(1).decode("ascii").replace(" ", ""))
    m = re.search(rb"/" + name + rb"\s*(\((?:\\.|[^\\()])*\))", body, re.S)
    if m:
        return _unescape_bytes(m.group(1))
    return None


def _unescape_bytes(tok: bytes) -> bytes:
    """Literal-string unescape yielding RAW bytes (the crypt entries are
    binary, not text): octal escapes, the two-char escapes, and pass-
    through for everything else."""
    body = tok[1:-1]
    out = bytearray()
    i = 0
    esc = {ord("n"): 10, ord("r"): 13, ord("t"): 9, ord("b"): 8, ord("f"): 12}
    while i < len(body):
        c = body[i]
        if c == 0x5C and i + 1 < len(body):  # backslash
            n = body[i + 1]
            if 0x30 <= n <= 0x37:  # octal, up to 3 digits
                j = i + 1
                oct_digits = b""
                while j < len(body) and len(oct_digits) < 3 and 0x30 <= body[j] <= 0x37:
                    oct_digits += bytes([body[j]])
                    j += 1
                out.append(int(oct_digits, 8) & 0xFF)
                i = j
                continue
            out.append(esc.get(n, n))
            i += 2
            continue
        out.append(c)
        i += 1
    return bytes(out)


def _std_file_key(
    password: bytes,
    o: bytes,
    p: int,
    file_id: bytes,
    r: int,
    n: int,
    encrypt_metadata: bool = True,
) -> bytes:
    """Algorithm 2: the file encryption key from a (padded) user
    password, the /O entry, /P and the first /ID string. For R4 with
    /EncryptMetadata false the spec appends 0xFFFFFFFF to the hash
    input."""
    import hashlib
    import struct as _struct

    padded = (password + _PAD)[:32]
    extra = b"\xff\xff\xff\xff" if (r >= 4 and not encrypt_metadata) else b""
    h = hashlib.md5(
        padded + o + _struct.pack("<I", p & 0xFFFFFFFF) + file_id + extra
    ).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h[:n]).digest()
    return h[:n]


def _std_user_check(key: bytes, file_id: bytes, r: int) -> bytes:
    """Algorithm 4 (R2) / 5 (R3): the expected /U value for ``key``
    (R3 compares the first 16 bytes only)."""
    import hashlib

    if r == 2:
        return _rc4(key, _PAD)
    x = hashlib.md5(_PAD + file_id).digest()
    x = _rc4(key, x)
    for i in range(1, 20):
        x = _rc4(bytes(b ^ i for b in key), x)
    return x


def _object_key(file_key: bytes, num: int, gen: int, aes: bool = False) -> bytes:
    """Algorithm 1's per-object key: MD5(file key + 3 low bytes of the
    object number + 2 low bytes of the generation [+ 'sAlT' for AES
    crypt filters]), truncated to min(n+5, 16)."""
    import hashlib

    h = hashlib.md5(
        file_key
        + (num & 0xFFFFFF).to_bytes(3, "little")
        + (gen & 0xFFFF).to_bytes(2, "little")
        + (b"sAlT" if aes else b"")
    ).digest()
    return h[: min(len(file_key) + 5, 16)]


def _strip_cf_subdict(body: bytes) -> bytes:
    """Remove the bracket-matched ``/CF << ... >>`` value (which may
    nest ``<< >>`` one per crypt filter) from an /Encrypt dictionary
    body, so top-level scalar parses cannot read the sub-dictionary's
    keys."""
    m = re.search(rb"/CF\s*<<", body)
    if not m:
        return body
    depth = 1
    i = m.end()
    while i < len(body) and depth:
        if body[i : i + 2] == b"<<":
            depth += 1
            i += 2
        elif body[i : i + 2] == b">>":
            depth -= 1
            i += 2
        else:
            i += 1
    return body[: m.start()] + body[i:]


_ENC_BLOCKED = "blocked"


def _setup_decryption(pdf: bytes, issues: list[str]):
    """Detect /Encrypt and build the stream decryptor.

    Returns ``(None, -1)`` for unencrypted files,
    ``(_ENC_BLOCKED, num)`` when the file is encrypted but NOT
    decryptable here (non-Standard handler, AES revisions, or a real
    user password) — with a clear issue appended — or
    ``(callable(num, gen, payload) -> bytes, num)`` when the empty-
    password key verified against /U."""
    refs = list(_ENCRYPT_REF_RE.finditer(pdf))
    if not refs:
        return None, -1
    enc_num, enc_gen = int(refs[-1].group(1)), int(refs[-1].group(2))
    body = None
    for m in re.finditer(
        rb"(?<![0-9])" + str(enc_num).encode() + rb"\s+"
        + str(enc_gen).encode() + rb"\s+obj\b(.*?)endobj",
        pdf,
        re.S,
    ):
        body = m.group(1)  # last definition wins (§7.5.6)
    if body is None:
        issues.append("encrypted PDF: /Encrypt dictionary not found")
        return _ENC_BLOCKED, enc_num
    fm = re.search(rb"/Filter\s*/([A-Za-z0-9]+)", body)
    handler = fm.group(1).decode("ascii", "replace") if fm else "?"
    if handler != "Standard":
        issues.append(f"encrypted PDF: unsupported security handler /{handler}")
        return _ENC_BLOCKED, enc_num
    # top-level keys must not be read out of the /CF crypt-filter
    # SUB-dictionary (Acrobat writes keys alphabetically, so /CF — with
    # its own '/Length 16' in BYTES and '/CFM /V2|/AESV2' names — comes
    # FIRST; a flat regex would pick those up as the top-level
    # /Length//V). Strip the bracket-matched /CF value for the scalar
    # parse; the original body still serves the CFM/StmF lookups.
    top = _strip_cf_subdict(body)

    def _int_of(name: bytes, default: int | None = None) -> int | None:
        m2 = re.search(rb"/" + name + rb"(?![A-Za-z])" + _NAME_VAL_RE, top)
        return int(m2.group(1)) if m2 else default
    v = _int_of(b"V", 0)
    r = _int_of(b"R", 0)
    p = _int_of(b"P")
    # V4's crypt filters imply AES/RC4-128; 40 is the pre-V4 default
    length_bits = _int_of(b"Length", 128 if v == 4 else 40)
    o = _crypt_string(top, b"O")
    u = _crypt_string(top, b"U")
    use_aes = False
    if v == 4 and r == 4:
        # crypt-filter layer (§7.6.5): the stream filter named by /StmF
        # must be the /StdCF standard filter with /CFM /V2 (RC4) or
        # /AESV2 (AES-128-CBC); /Identity or custom filters are out
        stmf = re.search(rb"/StmF\s*/([A-Za-z0-9]+)", body)
        cfm = re.search(rb"/StdCF\s*<<[^>]*?/CFM\s*/([A-Za-z0-9]+)", body, re.S)
        stmf_name = stmf.group(1).decode("ascii", "replace") if stmf else "StdCF"
        cfm_name = cfm.group(1).decode("ascii", "replace") if cfm else "?"
        if stmf_name != "StdCF" or cfm_name not in ("V2", "AESV2"):
            issues.append(
                "encrypted PDF: unsupported crypt filter "
                f"/StmF /{stmf_name} /CFM /{cfm_name}"
            )
            return _ENC_BLOCKED, enc_num
        use_aes = cfm_name == "AESV2"
    elif v not in (1, 2) or r not in (2, 3):
        issues.append(
            f"encrypted PDF: unsupported standard-handler revision V={v} R={r}"
            " (AESV3/V5+ not implemented)"
        )
        return _ENC_BLOCKED, enc_num
    if p is None or o is None or u is None or len(o) < 32 or len(u) < 32:
        issues.append("encrypted PDF: malformed /Encrypt dictionary (O/U/P)")
        return _ENC_BLOCKED, enc_num
    encrypt_metadata = not re.search(rb"/EncryptMetadata\s+false", body)
    idm = None
    for m2 in _ID_FIRST_RE.finditer(pdf):
        idm = m2  # last trailer wins
    if idm is None:
        file_id = b""
    elif idm.group(1) is not None:
        file_id = bytes.fromhex("".join(idm.group(1).decode("ascii").split()))
    else:
        file_id = _unescape_bytes(idm.group(2))
    n = 5 if v == 1 else max(5, min(16, (length_bits or 40) // 8))
    key = _std_file_key(b"", o, p, file_id, r, n, encrypt_metadata)
    expect = _std_user_check(key, file_id, r)
    stored = u[:32]
    ok = expect == stored if r == 2 else expect[:16] == stored[:16]
    if not ok:
        issues.append(
            "encrypted PDF: password required (empty user password failed"
            " /U verification)"
        )
        return _ENC_BLOCKED, enc_num

    if use_aes:
        from sharepointcrawler_spark.extraction.aes import aes_cbc_decrypt

        def decrypt(num: int, gen: int, payload: bytes) -> bytes:
            try:
                return aes_cbc_decrypt(
                    _object_key(key, num, gen, aes=True), payload
                )
            except ValueError as e:
                issues.append(f"object {num}: AES decrypt failed ({e})")
                return b""
    else:

        def decrypt(num: int, gen: int, payload: bytes) -> bytes:
            return _rc4(_object_key(key, num, gen), payload)

    return decrypt, enc_num


def _scan_objects(
    pdf: bytes,
) -> tuple[dict[int, bytes], dict[int, bytes], list[str]]:
    """Linear object scan with /Length-delimited stream payloads.

    The round-3 scanner regex-matched ``(.*?)endobj`` over the whole
    object, so a compressed payload containing the literal bytes
    ``endobj`` truncated the object and broke the inflate. Here the
    payload is sliced by the stream dict's /Length (resolving indirect
    ``N 0 R`` refs against a pre-pass over integer objects, the common
    real-PDF shape) and the cursor jumps PAST it, so payload bytes are
    never scanned for markers; the marker scan survives only as the
    fallback for a missing/unresolvable /Length."""
    issues: list[str] = []
    decryptor, enc_num = _setup_decryption(pdf, issues)
    if decryptor is _ENC_BLOCKED:
        # encrypted but not decryptable: never interpret ciphertext as
        # content (it would tokenize into garbage words) — empty object
        # table + the explicit issue; strict mode raises it verbatim
        return {}, {}, issues
    # pre-pass: integer-valued objects (indirect /Length targets). The
    # naive regex is safe here — int objects never contain streams.
    int_objs: dict[int, int] = {}
    for m in _OBJ_RE.finditer(pdf):
        body = m.group(2).strip()
        if re.fullmatch(rb"\d+", body):
            int_objs.setdefault(int(m.group(1)), int(body))

    bodies: dict[int, bytes] = {}
    streams: dict[int, bytes] = {}
    objstm_members: dict[int, list[int]] = {}
    xref_streams: list[tuple[int, bytes, bytes]] = []
    pos = 0
    while True:
        m = _OBJ_HEAD_RE.search(pdf, pos)
        if m is None:
            break
        num, body_start = int(m.group(1)), m.end()
        gen = int(m.group(2))
        em = pdf.find(b"endobj", body_start)
        sm = _STREAM_KW_RE.search(pdf, body_start, em if em != -1 else len(pdf))
        if sm is None:
            body = pdf[body_start:em] if em != -1 else pdf[body_start:]
            bodies[num] = body  # LAST definition wins (§7.5.6 updates)
            pos = em + 6 if em != -1 else len(pdf)
            continue
        head, data_start = pdf[body_start : sm.start()], sm.end()
        length: int | None = None
        lr = _LENGTH_REF_RE.search(head)
        if lr is not None:
            length = int_objs.get(int(lr.group(1)))
            if length is None:
                issues.append(
                    f"object {num}: indirect /Length {int(lr.group(1))} unresolved"
                )
        else:
            ll = _LENGTH_LIT_RE.search(head)
            if ll is not None:
                length = int(ll.group(1))
        if length is not None:
            tail = pdf[data_start + length : data_start + length + 16]
            if not tail.lstrip(b"\r\n ").startswith(b"endstream"):
                issues.append(f"object {num}: /Length does not reach endstream")
                length = None
        if length is not None:
            payload = pdf[data_start : data_start + length]
            after = pdf.find(b"endobj", data_start + length)
            pos = after + 6 if after != -1 else data_start + length
        else:  # fallback: marker scan (legacy behavior)
            endm = _ENDSTREAM_RE.search(pdf, data_start)
            if endm is None:
                payload = pdf[data_start:]
                pos = len(pdf)
            else:
                payload = pdf[data_start : endm.start()]
                after = pdf.find(b"endobj", endm.end())
                pos = after + 6 if after != -1 else endm.end()
        if (
            decryptor is not None
            and num != enc_num
            and b"/XRef" not in head  # §7.5.8.2: xref streams never encrypt
        ):
            payload = decryptor(num, gen, payload)
        payload = _apply_stream_filters(num, head, payload, issues)
        if b"/ObjStm" in head:
            _expand_objstm(num, payload, head, bodies, objstm_members, issues)
        elif b"/XRef" in head and b"/W" in head:
            xref_streams.append((num, head, payload))
        # LAST definition wins: an incrementally-updated PDF (§7.5.6 —
        # signatures, annotations) APPENDS replacement objects, so the
        # newest version is the one the latest xref would point at.
        # Payload bytes are never scanned for object headers (the
        # /Length jump above), so a spurious in-payload 'N 0 obj'
        # cannot shadow a real object.
        bodies[num] = head
        streams[num] = payload
    for num, head, payload in xref_streams:
        _check_xref_stream(num, head, payload, pdf, objstm_members, issues)
    return bodies, streams, issues


_FILTER_RE = re.compile(rb"/Filter\s*(\[[^\]]*\]|/[A-Za-z0-9]+)")
# image-data filters: the payload is pixel data, not content text —
# passed through raw (we never interpret it as operators)
_IMAGE_FILTERS = frozenset((b"DCTDecode", b"JPXDecode", b"CCITTFaxDecode", b"JBIG2Decode"))


def _lzw_decode(data: bytes, early: int = 1) -> bytes:
    """PDF LZWDecode (§7.4.4.2 — TIFF-style LZW: 9..12-bit codes,
    Clear=256, EOD=257, early-change width growth). The legacy
    compression pre-Flate PDFs (Acrobat 1.x era) use for content."""
    table: dict[int, bytes] = {i: bytes([i]) for i in range(256)}
    next_code, width = 258, 9
    out = bytearray()
    prev: bytes | None = None
    acc = nbits = 0
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == 256:
                table = {i: bytes([i]) for i in range(256)}
                next_code, width, prev = 258, 9, None
                continue
            if code == 257:
                return bytes(out)
            if prev is None:
                if code >= 256:
                    raise ValueError("LZW stream starts with a non-literal code")
                entry = table[code]
            elif code < next_code:
                entry = table[code]
                table[next_code] = prev + entry[:1]
                next_code += 1
            elif code == next_code:
                entry = prev + prev[:1]
                table[next_code] = entry
                next_code += 1
            else:
                raise ValueError("LZW code out of range")
            out += entry
            prev = entry
            if next_code >= (1 << width) - early and width < 12:
                width += 1
    return bytes(out)


def _lzw_encode(data: bytes, early: int = 1) -> bytes:
    """Greedy LZW encoder — the fixture generator for the legacy-filter
    path. Codes are serialized with the DECODER's width schedule
    (the decoder's table lags the encoder's by one entry — the classic
    early-change off-by-one — so the encoder cannot use its own table
    size to pick code widths)."""
    codes: list[int] = [256]
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    w = b""
    for b in data:
        wc = w + bytes([b])
        if wc in table:
            w = wc
            continue
        codes.append(table[w])
        table[wc] = next_code
        next_code += 1
        w = bytes([b])
        if next_code >= 4094 - early:  # table nearly full: restart
            codes.append(table[w])
            codes.append(256)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            w = b""
    if w:
        codes.append(table[w])
    codes.append(257)
    # serialize simulating the decoder's (next_code, width) evolution
    out = bytearray()
    acc = nbits = 0
    dec_next, width, first = 258, 9, True
    for code in codes:
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
        if code == 256:
            dec_next, width, first = 258, 9, True
        elif code != 257:
            if first:
                first = False
            else:
                dec_next += 1
                if dec_next >= (1 << width) - early and width < 12:
                    width += 1
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _asciihex_decode(data: bytes) -> bytes:
    """ASCIIHexDecode (§7.4.2): whitespace ignored, '>' terminates, an
    odd final digit is padded with 0."""
    end = data.find(b">")
    if end >= 0:
        data = data[:end]
    hexs = re.sub(rb"\s+", b"", data)
    if len(hexs) % 2:
        hexs += b"0"
    return bytes.fromhex(hexs.decode("ascii"))


def _ascii85_decode(data: bytes) -> bytes:
    """ASCII85Decode (§7.4.3): base-85 groups of 5 chars -> 4 bytes,
    'z' shorthand for four zero bytes, '~>' terminates, partial final
    group truncated."""
    if data.startswith(b"<~"):
        data = data[2:]
    end = data.find(b"~>")
    if end >= 0:
        data = data[:end]
    out = bytearray()
    group: list[int] = []
    for ch in data:
        if ch in b" \t\r\n\x0c\x00":
            continue
        if ch == 0x7A:  # 'z'
            if group:
                raise ValueError("ASCII85 'z' inside a group")
            out += b"\x00\x00\x00\x00"
            continue
        if not 0x21 <= ch <= 0x75:
            raise ValueError(f"bad ASCII85 character {ch}")
        group.append(ch - 33)
        if len(group) == 5:
            v = 0
            for d in group:
                v = v * 85 + d
            if v > 0xFFFFFFFF:
                raise ValueError("ASCII85 group overflow")
            out += v.to_bytes(4, "big")
            group = []
    if group:
        n = len(group)
        if n == 1:
            raise ValueError("ASCII85 trailing single digit")
        padded = group + [84] * (5 - n)
        v = 0
        for d in padded:
            v = v * 85 + d
        out += min(v, 0xFFFFFFFF).to_bytes(4, "big")[: n - 1]
    return bytes(out)


def _runlength_decode(data: bytes) -> bytes:
    """RunLengthDecode (§7.4.5): length byte L<128 copies the next L+1
    bytes, L>128 repeats the next byte 257-L times, L=128 is EOD."""
    out = bytearray()
    i = 0
    while i < len(data):
        ln = data[i]
        if ln == 128:
            break
        if ln < 128:
            out += data[i + 1 : i + 2 + ln]
            i += 2 + ln
        else:
            if i + 1 >= len(data):
                raise ValueError("RunLength run truncated")
            out += data[i + 1 : i + 2] * (257 - ln)
            i += 2
    return bytes(out)


def _runlength_encode(data: bytes) -> bytes:
    """Literal-runs-only RunLength encoder (valid per spec) for
    fixtures."""
    out = bytearray()
    for i in range(0, len(data), 128):
        chunk = data[i : i + 128]
        out.append(len(chunk) - 1)
        out += chunk
    out.append(128)
    return bytes(out)


def _apply_stream_filters(
    num: int, head: bytes, payload: bytes, issues: list[str]
) -> bytes:
    """Apply the stream's /Filter chain in order (name or array form,
    §7.4): Flate, LZW, ASCIIHex, ASCII85. Image-data filters pass the
    payload through raw (never interpreted as content); genuinely
    unknown filters and decode failures are flagged."""
    m = _FILTER_RE.search(head)
    if m is None:
        return payload
    for name in re.findall(rb"/([A-Za-z0-9]+)", m.group(1)):
        try:
            if name == b"FlateDecode":
                payload = zlib.decompress(payload)
            elif name == b"LZWDecode":
                payload = _lzw_decode(payload)
            elif name == b"ASCIIHexDecode":
                payload = _asciihex_decode(payload)
            elif name == b"ASCII85Decode":
                payload = _ascii85_decode(payload)
            elif name == b"RunLengthDecode":
                payload = _runlength_decode(payload)
            elif name in _IMAGE_FILTERS:
                break
            else:
                issues.append(f"object {num}: unsupported filter /{name.decode()}")
                break
        except (ValueError, zlib.error) as e:
            issues.append(f"object {num}: {name.decode()} failed ({e})")
            return b""
    return payload


def _png_unpredict(data: bytes, columns: int, colors: int = 1, bpc: int = 8) -> bytes:
    """Reverse PNG row predictors (PDF 32000-1 §7.4.4.4, Predictor >=
    10): each row is a filter-type byte + ``columns`` filtered bytes.
    All five PNG filters (None/Sub/Up/Average/Paeth) are reversed; xref
    streams in the wild are nearly always Up (Predictor 12)."""
    bpp = max(1, (colors * bpc + 7) // 8)
    rowlen = (columns * colors * bpc + 7) // 8
    out = bytearray()
    prev = bytearray(rowlen)
    i = 0
    while i < len(data):
        ft = data[i]
        row = bytearray(data[i + 1 : i + 1 + rowlen])
        if len(row) < rowlen:
            raise ValueError("truncated predictor row")
        i += 1 + rowlen
        if ft == 1:  # Sub
            for j in range(bpp, rowlen):
                row[j] = (row[j] + row[j - bpp]) & 0xFF
        elif ft == 2:  # Up
            for j in range(rowlen):
                row[j] = (row[j] + prev[j]) & 0xFF
        elif ft == 3:  # Average
            for j in range(rowlen):
                left = row[j - bpp] if j >= bpp else 0
                row[j] = (row[j] + (left + prev[j]) // 2) & 0xFF
        elif ft == 4:  # Paeth
            for j in range(rowlen):
                a = row[j - bpp] if j >= bpp else 0
                b = prev[j]
                c = prev[j - bpp] if j >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[j] = (row[j] + pred) & 0xFF
        elif ft != 0:
            raise ValueError(f"unknown PNG predictor filter {ft}")
        out += row
        prev = row
    return bytes(out)


def _expand_objstm(
    num: int,
    payload: bytes,
    head: bytes,
    bodies: dict[int, bytes],
    members: dict[int, list[int]],
    issues: list[str],
) -> None:
    """Expand a /Type /ObjStm compressed object stream (PDF 32000-1
    §7.5.7): the inflated payload is ``N`` (objnum, offset) integer
    pairs followed, at byte /First, by the concatenated object bodies.
    Expanded bodies join ``bodies`` so downstream resolution (page
    tree, fonts, /Widths) is agnostic to where an object lived;
    ``members[num]`` records the contained object numbers in stream
    order so xref type-2 entries can be validated."""
    nm = re.search(rb"/N\s+(\d+)", head)
    fm = re.search(rb"/First\s+(\d+)", head)
    if nm is None or fm is None:
        issues.append(f"object {num}: object stream missing /N or /First")
        return
    n, first = int(nm.group(1)), int(fm.group(1))
    if first > len(payload):
        issues.append(f"object {num}: object stream /First beyond payload")
        return
    ints = re.findall(rb"\d+", payload[:first])
    if len(ints) < 2 * n:
        issues.append(f"object {num}: object stream header truncated")
        return
    pairs = [(int(ints[2 * i]), int(ints[2 * i + 1])) for i in range(n)]
    body_len = len(payload) - first
    contained: list[int] = []
    for i, (onum, off) in enumerate(pairs):
        end = pairs[i + 1][1] if i + 1 < n else body_len
        if off > end or end > body_len:
            issues.append(f"object {num}: object stream offsets out of range")
            return
        bodies[onum] = payload[first + off : first + end].strip()
        contained.append(onum)
    members[num] = contained


def _check_xref_stream(
    num: int,
    head: bytes,
    payload: bytes,
    pdf: bytes,
    members: dict[int, list[int]],
    issues: list[str],
) -> None:
    """Decode a /Type /XRef cross-reference stream (PDF 32000-1 §7.5.8:
    /W field widths, optional /Index subsections, PNG predictor via
    /DecodeParms) and validate every entry against the file: a type-1
    entry's offset must land on ``objnum G obj`` and a type-2 entry
    must point at the right slot of a parsed object stream. Object
    DISCOVERY stays the /Length-delimited linear scan (robust to the
    broken-xref files a crawler actually meets); the xref stream is
    decoded in full so corruption is flagged, never silently ignored."""
    pm = re.search(rb"/Predictor\s+(\d+)", head)
    if pm is not None and int(pm.group(1)) >= 10:
        cm = re.search(rb"/Columns\s+(\d+)", head)
        try:
            payload = _png_unpredict(payload, int(cm.group(1)) if cm else 1)
        except (ValueError, IndexError) as e:
            issues.append(f"object {num}: xref stream predictor decode failed ({e})")
            return
    w_txt = _find_array(head, rb"/W(?![A-Za-z])")
    widths = [int(v) for v in re.findall(rb"\d+", w_txt)] if w_txt else []
    if len(widths) != 3:
        issues.append(f"object {num}: xref stream /W malformed")
        return
    rowlen = sum(widths)
    idx_txt = _find_array(head, rb"/Index")
    if idx_txt is not None:
        idx = [int(v) for v in re.findall(rb"\d+", idx_txt)]
    else:
        sm = re.search(rb"/Size\s+(\d+)", head)
        idx = [0, int(sm.group(1)) if sm else len(payload) // max(rowlen, 1)]
    pos = 0
    entries: list[tuple[int, int, int, int]] = []
    for k in range(0, len(idx) - 1, 2):
        start, count = idx[k], idx[k + 1]
        for j in range(count):
            row = payload[pos : pos + rowlen]
            if len(row) < rowlen:
                issues.append(f"object {num}: xref stream data truncated")
                return
            pos += rowlen
            fields, o = [], 0
            for wi in widths:
                fields.append(int.from_bytes(row[o : o + wi], "big") if wi else 0)
                o += wi
            typ = fields[0] if widths[0] else 1
            entries.append((start + j, typ, fields[1], fields[2]))
    for onum, typ, f2, f3 in entries:
        if typ == 1:
            if not re.match(rb"\s*%d\s+\d+\s+obj\b" % onum, pdf[f2 : f2 + 48]):
                issues.append(
                    f"broken cross-reference stream: object {onum} not at offset {f2}"
                )
        elif typ == 2:
            lst = members.get(f2)
            if lst is None or f3 >= len(lst) or lst[f3] != onum:
                issues.append(
                    f"broken cross-reference stream: object {onum}"
                    f" not at index {f3} of object stream {f2}"
                )


def _find_array(body: bytes, key_re: bytes) -> bytes | None:
    """Inner text of the (possibly nested) ``key [ ... ]`` array —
    bracket-matched, because /W arrays nest: ``[3 [500 600] 9 11 400]``."""
    m = re.search(key_re + rb"\s*\[", body)
    if m is None:
        return None
    depth, i = 1, m.end()
    start = i
    while i < len(body) and depth:
        ch = body[i : i + 1]
        if ch == b"[":
            depth += 1
        elif ch == b"]":
            depth -= 1
        i += 1
    return body[start : i - 1]


def _parse_w_array(txt: bytes) -> dict[int, int]:
    """CID /W array -> {cid: width}: both forms, ``c [w1 w2 ...]``
    (consecutive CIDs from c) and ``cfirst clast w`` (range)."""
    toks = re.findall(rb"\[|\]|[-+]?[\d.]+", txt)
    w: dict[int, int] = {}
    i = 0
    while i < len(toks):
        if toks[i] in (b"[", b"]"):
            i += 1
            continue
        a = int(float(toks[i]))
        if i + 1 < len(toks) and toks[i + 1] == b"[":
            j, k = i + 2, 0
            while j < len(toks) and toks[j] != b"]":
                w[a + k] = int(float(toks[j]))
                k += 1
                j += 1
            i = j + 1
        elif i + 2 < len(toks):
            b_, ww = int(float(toks[i + 1])), int(float(toks[i + 2]))
            for cid in range(a, b_ + 1):
                w[cid] = ww
            i += 3
        else:
            break
    return w


def _parse_tounicode(cmap: bytes) -> dict[int, str]:
    """ToUnicode CMap -> {cid: text}: bfchar pairs and both bfrange
    forms (incrementing scalar destination / explicit array)."""
    out: dict[int, str] = {}
    for block in re.findall(rb"beginbfrange(.*?)endbfrange", cmap, re.S):
        for lo, hi, arr in re.findall(
            rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*\[(.*?)\]", block, re.S
        ):
            for k, d in enumerate(re.findall(rb"<([0-9A-Fa-f]+)>", arr)):
                out[int(lo, 16) + k] = bytes.fromhex(d.decode()).decode("utf-16-be")
        for lo, hi, dst in re.findall(
            rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>", block
        ):
            base = int(dst, 16)
            for k in range(int(hi, 16) - int(lo, 16) + 1):
                out[int(lo, 16) + k] = chr(base + k)
    for block in re.findall(rb"beginbfchar(.*?)endbfchar", cmap, re.S):
        for src, dst in re.findall(rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>", block):
            out[int(src, 16)] = bytes.fromhex(dst.decode()).decode("utf-16-be")
    return out


def _cid_font_metrics(
    base: str,
    fbody: bytes,
    bodies: dict[int, bytes],
    streams: dict[int, bytes],
    issues: list[str],
) -> CIDFontMetrics | None:
    """Resolve a Type0 font to CIDFontMetrics, or None when a required
    part (DescendantFonts / ToUnicode stream) is genuinely missing."""
    dm = _DESC_FONTS_INLINE_RE.search(fbody)
    if dm is None:
        dr = _DESC_FONTS_REF_RE.search(fbody)
        if dr is not None:
            arr = bodies.get(int(dr.group(1)), b"")
            dm = _REF_RE.search(arr)
    tm = _TOUNICODE_RE.search(fbody)
    if dm is None or tm is None:
        return None
    desc = bodies.get(int(dm.group(1)), b"")
    cmap = streams.get(int(tm.group(1)))
    if not desc or cmap is None:
        return None
    if b"/Identity-H" not in fbody:
        issues.append(f"Type0 font {base}: non-Identity-H encoding approximated")
    dwm = _DW_RE.search(desc)
    dw = int(dwm.group(1)) if dwm else 1000
    warr = _find_array(desc, rb"/W(?![A-Za-z])")
    if warr is None:
        wr = _W_REF_RE.search(desc)
        if wr is not None:
            warr = bodies.get(int(wr.group(1)), b"")
    w = _parse_w_array(warr) if warr else {}
    return CIDFontMetrics(
        base, w=w, dw=dw, to_unicode=_parse_tounicode(cmap), issues=issues
    )


# Adobe Glyph List subset: the names real /Differences arrays use for
# Latin text. Single letters/digits map to themselves (handled in code).
_GLYPH_MAP: dict[str, str] = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
    "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@", "bracketleft": "[",
    "backslash": "\\", "bracketright": "]", "asciicircum": "^",
    "underscore": "_", "grave": "`", "braceleft": "{", "bar": "|",
    "braceright": "}", "asciitilde": "~",
    "adieresis": "ä", "odieresis": "ö", "udieresis": "ü",
    "Adieresis": "Ä", "Odieresis": "Ö", "Udieresis": "Ü",
    "germandbls": "ß", "eacute": "é", "egrave": "è",
    "ecircumflex": "ê", "agrave": "à", "acircumflex": "â",
    "ccedilla": "ç", "ntilde": "ñ", "aacute": "á",
    "iacute": "í", "oacute": "ó", "uacute": "ú",
    "quoteleft": "‘", "quoteright": "’",
    "quotedblleft": "“", "quotedblright": "”",
    "endash": "–", "emdash": "—", "bullet": "•",
    "fi": "ﬁ", "fl": "ﬂ", "degree": "°", "euro": "€",
}


def _glyph_text(name: str) -> str | None:
    if len(name) == 1 and name.isalnum():
        return name
    return _GLYPH_MAP.get(name)


def _parse_differences(
    fbody: bytes, bodies: dict[int, bytes], issues: list[str], base: str
) -> dict[int, str] | None:
    """/Encoding dict (inline or indirect) with a /Differences array ->
    {code: glyph text} (§9.6.6.3: numbers set the next code, names
    assign consecutive codes). Names outside the AGL subset are flagged
    so strict mode rejects rather than silently mis-mapping."""
    em = re.search(rb"/Encoding\s+(\d+)\s+\d+\s+R", fbody)
    enc = bodies.get(int(em.group(1)), b"") if em else fbody
    arr = _find_array(enc, rb"/Differences")
    if arr is None:
        return None
    out: dict[int, str] = {}
    code = 0
    for tok in re.findall(rb"/[^\s/\[\]()<>]+|\d+", arr):
        if tok.startswith(b"/"):
            name = tok[1:].decode("latin-1")
            text = _glyph_text(name)
            if text is None:
                issues.append(
                    f"font {base}: /Differences glyph /{name} not in the glyph table"
                )
                text = "�"
            out[code] = text
            code += 1
        else:
            code = int(tok)
    return out


def _page_fonts(
    page_body: bytes,
    bodies: dict[int, bytes],
    streams: dict[int, bytes],
    issues: list[str],
) -> dict[bytes, FontMetrics]:
    """Resolve the page's /Resources /Font dict to FontMetrics per font
    name: explicit /Widths (+/FirstChar) win; a widths-less
    Helvetica/Arial uses the built-in AFM table; anything else falls
    back to the Courier metric (flagged, since proportional text would
    get wrong advances)."""
    res = page_body
    rr = _RESOURCES_REF_RE.search(page_body)
    if rr is not None:
        res = bodies.get(int(rr.group(1)), b"")
    fd = _FONT_DICT_RE.search(res)
    if fd is None:
        return {}
    fonts: dict[bytes, FontMetrics] = {}
    for fe in _FONT_ENTRY_RE.finditer(fd.group(1)):
        fname, fnum = fe.group(1), int(fe.group(2))
        fbody = bodies.get(fnum, b"")
        bm = _BASEFONT_RE.search(fbody)
        base = bm.group(1).decode("latin-1") if bm else "Courier"
        if b"/Type0" in fbody:
            cfm = _cid_font_metrics(base, fbody, bodies, streams, issues)
            if cfm is not None:
                fonts[fname] = cfm
                continue
            issues.append(
                f"composite Type0 font {base} missing DescendantFonts/ToUnicode"
            )
        widths: dict[int, int] | None = None
        wtext: bytes | None = None
        wm = _WIDTHS_INLINE_RE.search(fbody)
        if wm is not None:
            wtext = wm.group(1)
        else:
            wr = _WIDTHS_REF_RE.search(fbody)
            if wr is not None:  # /Widths as an indirect array object
                wtext = bodies.get(int(wr.group(1)), b"").strip().strip(b"[]")
        if wtext:
            vals = [int(float(v)) for v in re.findall(rb"[-+]?[\d.]+", wtext)]
            if vals:
                fm = _FIRSTCHAR_RE.search(fbody)
                fc = int(fm.group(1)) if fm else 0
                widths = {fc + i: v for i, v in enumerate(vals)}
        stem = base.split("-")[0].split("+")[-1].lower()
        to_text = _parse_differences(fbody, bodies, issues, base)
        if widths is not None:
            fonts[fname] = FontMetrics(base, widths=widths, to_text=to_text)
        elif stem in ("helvetica", "arial", "arialmt"):
            fonts[fname] = FontMetrics(
                base, widths=HELVETICA_WIDTHS, default_width=556, to_text=to_text
            )
        else:
            if stem not in ("courier", "couriernew"):
                issues.append(
                    f"font {base} has no /Widths; Courier metrics assumed"
                )
            fonts[fname] = (
                FontMetrics(base, to_text=to_text) if to_text else COURIER
            )
    return fonts


def parse_pdf_word_pages(
    pdf: bytes, strict: bool = False
) -> tuple[list[list[RawWord]], list[float]]:
    """PDF bytes -> (per-page word boxes, page heights) — the PdfPig
    ``page.GetWords()`` analog (PdfToMarkdownConverter.cs:285).

    ``strict=True`` raises :class:`UnsupportedPdfError` when the file
    uses constructs this interpreter cannot extract faithfully (corrupt
    xref/object streams, partially-mapped Type0 fonts, widths-less
    proportional fonts)
    or when text-show operators were present but produced zero words —
    the production UDF path uses strict mode so a real crawled PDF can
    never silently become empty markdown (ADVICE r3 medium)."""
    bodies, streams, issues = _scan_objects(pdf or b"")

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
    saw_show_ops = False
    for n in page_nums:
        body = bodies.get(n, b"")
        mb = _MEDIABOX_RE.search(body)
        heights.append(float(mb.group(4)) if mb else 792.0)
        content_nums: list[int] = []
        ca = _CONTENTS_ARR_RE.search(body)
        if ca is not None:  # /Contents [a 0 R b 0 R]: concatenated parts
            content_nums = [int(r.group(1)) for r in _REF_RE.finditer(ca.group(1))]
        else:
            cm = _CONTENTS_RE.search(body)
            if cm is not None:
                content_nums = [int(cm.group(1))]
        fonts = _page_fonts(body, bodies, streams, issues)
        words: list[RawWord] = []
        content = b"\n".join(streams[c] for c in content_nums if c in streams)
        if content:
            if _SHOW_OP_RE.search(content):
                saw_show_ops = True
            _interpret(_strip_inline_images(content, issues), words, fonts)
        pages.append(words)

    if saw_show_ops and not any(pages):
        issues.append("text-show operators present but zero words extracted")
    if strict and issues:
        raise UnsupportedPdfError(sorted(set(issues)))
    return pages, heights


def is_pdf(blob: bytes | None) -> bool:
    return bool(blob) and blob[:5] == b"%PDF-"
