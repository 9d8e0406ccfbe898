"""Modern (PDF 1.5+) file structure: /Type /ObjStm compressed object
streams and /Type /XRef cross-reference streams with PNG predictors.

The reference ingests any real SharePoint PDF via PdfPig
(PdfToMarkdownConverter.cs:81-113), and nearly every PDF written since
~2010 uses compressed xref — round 5 closes that gap: write_pdf_modern
emits genuine PDF 1.5 bytes (no classic xref/trailer at all) and
parse_pdf_word_pages must extract them byte-identically, while corrupt
xref/ObjStm data must flip strict mode, never silently degrade."""

import re
import zlib

import pytest

from sharepointcrawler_spark.extraction.converter import (
    ConvertOptions,
    build_lines,
    convert_pages_to_markdown,
)
from sharepointcrawler_spark.extraction.pdfwords import (
    HELVETICA,
    UnsupportedPdfError,
    _png_predict_up,
    _png_unpredict,
    layout_words,
    parse_pdf_word_pages,
    write_pdf,
    write_pdf_modern,
)

TEXT = "2.0 Modern Structure Heading\n\n" + "\n".join(
    f"Paragraph {j} with deterministic words that exercise the layout "
    f"engine across several lines m{j % 7}n and o{j % 11}p of Courier text."
    for j in range(8)
) + "\n\n2.1 Scope\nA closing section so the converter emits headings too.\n"


def _boxes(pages):
    return [[(w.text, w.left, w.right, w.top, w.bottom) for w in ws] for ws in pages]


def test_modern_round_trip_exact_courier():
    pages, heights = layout_words(TEXT)
    pdf = write_pdf_modern(pages, heights)
    assert pdf.startswith(b"%PDF-1.5")
    assert b"\ntrailer" not in pdf and b"\nxref\n" not in pdf  # no classic sections
    assert b"/ObjStm" in pdf and b"/Type /XRef" in pdf
    got, gh = parse_pdf_word_pages(pdf, strict=True)
    assert gh == heights
    assert _boxes(got) == _boxes(pages)


def test_modern_round_trip_proportional_widths_inside_objstm():
    """The font dict (with /Widths) lives INSIDE the ObjStm — a parser
    that skips object-stream expansion loses the width table and every
    right edge diverges."""
    pages, heights = layout_words(TEXT, font=HELVETICA)
    pdf = write_pdf_modern(pages, heights, font_metrics=HELVETICA)
    got, _ = parse_pdf_word_pages(pdf, strict=True)
    assert _boxes(got) == _boxes(pages)
    # AFM-fallback variant: only /BaseFont named, widths from the table
    pdf2 = write_pdf_modern(pages, heights, font_metrics=HELVETICA, embed_widths=False)
    got2, _ = parse_pdf_word_pages(pdf2, strict=True)
    assert _boxes(got2) == _boxes(pages)


def test_modern_markdown_byte_identity_vs_classic():
    """Same words, classic-xref file vs compressed-xref file: converter
    markdown must be byte-identical (the file structure is transparent
    to extraction)."""
    opt = ConvertOptions()
    pages, heights = layout_words(TEXT)
    built = [
        build_lines(ws, n + 1, heights[n], opt.line_y_tolerance)
        for n, ws in enumerate(pages)
    ]
    golden = convert_pages_to_markdown(built, "doc", opt)

    for blob in (write_pdf(pages, heights), write_pdf_modern(pages, heights)):
        got, gh = parse_pdf_word_pages(blob, strict=True)
        rebuilt = [
            build_lines(ws, n + 1, gh[n], opt.line_y_tolerance)
            for n, ws in enumerate(got)
        ]
        assert convert_pages_to_markdown(rebuilt, "doc", opt) == golden


def test_modern_multi_page():
    long_text = "\n".join(
        f"Paragraph {j} fills the page with deterministic filler words "
        f"x{j % 7}y and z{j % 11}w repeated for layout volume." for j in range(80)
    )
    pages, heights = layout_words("3.0 Long Document\n\n" + long_text)
    assert len(pages) > 1
    pdf = write_pdf_modern(pages, heights)
    got, gh = parse_pdf_word_pages(pdf, strict=True)
    assert gh == heights and _boxes(got) == _boxes(pages)


# ----------------------------------------------------- corruption paths


def _xref_payload_span(pdf: bytes) -> tuple[int, int]:
    m = re.search(rb"/Type /XRef.*?stream\n", pdf, re.S)
    start = m.end()
    return start, pdf.find(b"\nendstream", start)


def _swap_xref_payload(pdf: bytes, new_raw: bytes) -> bytes:
    start, end = _xref_payload_span(pdf)
    new = zlib.compress(new_raw)
    out = pdf[:start] + new + pdf[end:]
    return out.replace(
        b"/Length " + str(end - start).encode(),
        b"/Length " + str(len(new)).encode(),
    )


@pytest.fixture(scope="module")
def modern_pdf() -> bytes:
    pages, heights = layout_words(TEXT)
    return write_pdf_modern(pages, heights)


def test_corrupt_predictor_filter_flagged(modern_pdf):
    start, end = _xref_payload_span(modern_pdf)
    raw = bytearray(zlib.decompress(modern_pdf[start:end]))
    raw[0] = 9  # invalid PNG filter type
    bad = _swap_xref_payload(modern_pdf, bytes(raw))
    with pytest.raises(UnsupportedPdfError, match="predictor decode failed"):
        parse_pdf_word_pages(bad, strict=True)


def test_corrupt_xref_offset_flagged(modern_pdf):
    start, end = _xref_payload_span(modern_pdf)
    raw = bytearray(zlib.decompress(modern_pdf[start:end]))
    raw[7 + 3] ^= 0x40  # row 1 (object 1), offset field byte
    bad = _swap_xref_payload(modern_pdf, bytes(raw))
    with pytest.raises(UnsupportedPdfError, match="broken cross-reference stream"):
        parse_pdf_word_pages(bad, strict=True)
    # lenient mode still extracts (linear scan is the discovery path)
    pages, _ = parse_pdf_word_pages(bad, strict=False)
    assert any(pages)


def test_truncated_xref_data_flagged(modern_pdf):
    start, end = _xref_payload_span(modern_pdf)
    raw = zlib.decompress(modern_pdf[start:end])
    bad = _swap_xref_payload(modern_pdf, raw[: len(raw) - 10])
    with pytest.raises(UnsupportedPdfError, match="predictor decode failed|truncated"):
        parse_pdf_word_pages(bad, strict=True)


def test_objstm_first_beyond_payload_flagged(modern_pdf):
    bad = re.sub(rb"/First (\d+)", b"/First 99999", modern_pdf)
    with pytest.raises(UnsupportedPdfError, match="/First beyond payload"):
        parse_pdf_word_pages(bad, strict=True)


def test_png_unpredict_all_filters_round_trip():
    """Every PNG filter type the spec allows must reverse exactly; the
    writer's Up encoder is the identity's other half."""
    rows = [bytes((i * 37 + j * 11) % 256 for j in range(6)) for i in range(5)]
    flat = b"".join(rows)
    # Up via the writer's encoder
    assert _png_unpredict(_png_predict_up(rows), 6) == flat
    # None / Sub / Average / Paeth encoded by hand
    for ft in (0, 1, 3, 4):
        enc = bytearray()
        prev = bytes(6)
        for r in rows:
            enc.append(ft)
            for j in range(6):
                a = r[j - 1] if j else 0
                b = prev[j]
                c = prev[j - 1] if j else 0
                if ft == 0:
                    pred = 0
                elif ft == 1:
                    pred = a
                elif ft == 3:
                    pred = (a + b) // 2
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc.append((r[j] - pred) & 0xFF)
            prev = r
        assert _png_unpredict(bytes(enc), 6) == flat, f"filter {ft}"


def test_udf_dispatch_on_modern_pdf(spark):
    """The production %PDF- UDF path must extract a compressed-xref PDF
    with no err flag."""
    from pyspark.sql import functions as F

    from sharepointcrawler_spark.extraction.udfs import extract_all_udf

    pages, heights = layout_words(TEXT)
    pdf = write_pdf_modern(pages, heights)
    df = spark.createDataFrame(
        [(1, bytearray(pdf), "u1")], "id long, html binary, url string"
    )
    row = (
        df.select(extract_all_udf(F.col("html"), F.col("url")).alias("ex"))
        .select("ex.md", "ex.err")
        .collect()[0]
    )
    assert row.err is None and row.md and "Paragraph 2 with deterministic" in row.md


def test_incremental_update_newest_object_wins():
    """Incrementally-updated PDF (§7.5.6, the signed/annotated-file
    shape): an appended replacement of the content stream must be the
    version extracted — a first-definition-wins scan would return the
    ORIGINAL text."""
    import zlib as _zlib

    from sharepointcrawler_spark.extraction.pdfwords import (
        _simple_content_ops,
        append_pdf_update,
    )

    text_a = "5.0 Original Heading\n\n" + "\n".join(
        f"Original paragraph {j} with words a{j % 5}b for the base file."
        for j in range(6)
    ) + "\n"
    text_b = "6.0 Updated Heading\n\n" + "\n".join(
        f"Updated paragraph {j} with words c{j % 7}d after the update."
        for j in range(6)
    ) + "\n"
    pages_a, heights = layout_words(text_a)
    pages_b, heights_b = layout_words(text_b)
    assert len(pages_a) == len(pages_b) == 1
    base = write_pdf(pages_a, heights)

    flate = _zlib.compress(_simple_content_ops(pages_b[0]))
    new_content = (
        b"<< /Length " + str(len(flate)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + flate + b"\nendstream"
    )
    # write_pdf object layout: font=1, pages=2, content=3, page=4
    updated = append_pdf_update(base, {3: new_content})
    assert updated.startswith(bytes(base[: len(base)]))  # append-only

    got, gh = parse_pdf_word_pages(updated, strict=True)
    assert gh == heights_b
    assert _boxes(got) == _boxes(pages_b)  # newest definition extracted
    # the base file still yields the original
    got_a, _ = parse_pdf_word_pages(base, strict=True)
    assert _boxes(got_a) == _boxes(pages_a)


def test_incremental_update_on_modern_pdf():
    """Incremental update over a compressed-xref base file: the
    replacement (appended as a top-level object) must override the
    version packed inside the base ObjStm/top-level objects."""
    import zlib as _zlib

    from sharepointcrawler_spark.extraction.pdfwords import (
        _simple_content_ops,
        append_pdf_update,
    )

    pages_a, heights = layout_words(TEXT)
    base = write_pdf_modern(pages_a, heights)
    text_b = "7.0 Modern Update\n\n" + "\n".join(
        f"Replacement paragraph {j} with tokens e{j % 3}f in the update."
        for j in range(6)
    ) + "\n"
    pages_b, heights_b = layout_words(text_b)
    assert len(pages_b) == len(pages_a) == 1

    flate = _zlib.compress(_simple_content_ops(pages_b[0]))
    new_content = (
        b"<< /Length " + str(len(flate)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + flate + b"\nendstream"
    )
    # write_pdf_modern layout (1 page): content=1 top-level
    updated = append_pdf_update(base, {1: new_content})
    got, gh = parse_pdf_word_pages(updated, strict=True)
    assert gh == heights_b
    assert _boxes(got) == _boxes(pages_b)


def test_legacy_stream_filters_end_to_end():
    """Content streams through every classic filter — LZWDecode (the
    pre-Flate Acrobat-era compression), ASCIIHexDecode, ASCII85Decode,
    RunLengthDecode, and a two-stage [/ASCII85Decode /FlateDecode]
    array — must extract word-box-identically to the FlateDecode
    original; an unknown filter is flagged in strict mode."""
    import base64

    from sharepointcrawler_spark.extraction.pdfwords import (
        _lzw_encode,
        _runlength_encode,
        _simple_content_ops,
        append_pdf_update,
    )

    pages, heights = layout_words(TEXT)
    assert len(pages) == 1
    base = write_pdf(pages, heights)
    raw = _simple_content_ops(pages[0])

    def body(filter_name: bytes, payload: bytes) -> bytes:
        return (
            b"<< /Length " + str(len(payload)).encode()
            + b" /Filter " + filter_name + b" >>\nstream\n" + payload + b"\nendstream"
        )

    variants = {
        b"/LZWDecode": _lzw_encode(raw),
        b"/ASCIIHexDecode": raw.hex().encode() + b">",
        b"/ASCII85Decode": base64.a85encode(raw) + b"~>",
        b"/RunLengthDecode": _runlength_encode(raw),
        b"[ /ASCII85Decode /FlateDecode ]": base64.a85encode(zlib.compress(raw)) + b"~>",
    }
    want = _boxes(pages)
    for fname, payload in variants.items():
        # write_pdf object layout: content stream is object 3
        blob = append_pdf_update(base, {3: body(fname, payload)})
        got, gh = parse_pdf_word_pages(blob, strict=True)
        assert gh == heights and _boxes(got) == want, fname

    bad = append_pdf_update(base, {3: body(b"/RunMadeUpDecode", raw)})
    with pytest.raises(UnsupportedPdfError, match="unsupported filter"):
        parse_pdf_word_pages(bad, strict=True)
