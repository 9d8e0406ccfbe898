"""Charset sniffing/decoding (extraction/charset.py): BOMs, meta
labels, mislabeled pages, utf-8 trial, latin-1 fallback — python unit
level plus the Spark UDF lane."""

from __future__ import annotations

from sharepointcrawler_spark.extraction.charset import (
    decode_pages,
    sniff_and_decode,
)

CAFE = "café résumé"


def test_boms_override_everything():
    body = f'<meta charset="ascii">{CAFE}'
    assert sniff_and_decode(b"\xef\xbb\xbf" + body.encode("utf-8")) == (
        body, "utf-8", "bom",
    )
    t, cs, src = sniff_and_decode(b"\xff\xfe" + body.encode("utf-16-le"))
    assert (t, cs, src) == (body, "utf-16-le", "bom")
    t, cs, src = sniff_and_decode(b"\xfe\xff" + body.encode("utf-16-be"))
    assert (t, cs, src) == (body, "utf-16-be", "bom")


def test_meta_labels():
    page = f'<html><meta charset="windows-1252"><body>{CAFE}</body>'.encode(
        "cp1252"
    )
    t, cs, src = sniff_and_decode(page)
    assert CAFE in t and (cs, src) == ("windows-1252", "meta")
    page2 = (
        '<meta http-equiv="Content-Type" content="text/html; '
        f'charset=ISO-8859-1">{CAFE}'
    ).encode("latin-1")
    t2, cs2, src2 = sniff_and_decode(page2)
    assert CAFE in t2 and (cs2, src2) == ("iso-8859-1", "meta")


def test_mislabeled_page_falls_through():
    # declares ascii but carries utf-8 bytes -> trial utf-8 succeeds
    page = f'<meta charset="us-ascii">{CAFE}'.encode("utf-8")
    t, cs, src = sniff_and_decode(page)
    assert CAFE in t and (cs, src) == ("utf-8", "utf8")


def test_unlabeled():
    assert sniff_and_decode(f"plain {CAFE}".encode("utf-8"))[1:] == (
        "utf-8", "utf8",
    )
    t, cs, src = sniff_and_decode(f"plain {CAFE}".encode("latin-1"))
    assert CAFE in t and (cs, src) == ("iso-8859-1", "fallback")
    assert sniff_and_decode(None) == (None, "none", "none")


def test_spark_lane(spark):
    rows = [
        (1, f"utf {CAFE}".encode("utf-8")),
        (2, b"\xff\xfe" + f"bom {CAFE}".encode("utf-16-le")),
        (3, f'<meta charset="iso-8859-1">{CAFE}'.encode("latin-1")),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html binary")
    got = {r["doc_id"]: r for r in decode_pages(df).collect()}
    assert got[1]["charset_src"] == "utf8" and CAFE in got[1]["html_text"]
    assert got[2]["charset_src"] == "bom" and CAFE in got[2]["html_text"]
    assert got[3]["charset_src"] == "meta" and CAFE in got[3]["html_text"]
    assert got[4]["html_text"] is None and got[4]["charset_src"] == "none"


def test_to_utf8_bytes_no_op_and_transcode():
    from sharepointcrawler_spark.extraction.charset import to_utf8_bytes

    plain = b"<div>ascii page</div>"
    assert to_utf8_bytes(plain) is plain  # exact same object: no-op
    u8 = "café".encode("utf-8")
    assert to_utf8_bytes(u8) is u8
    lat = '<meta charset="iso-8859-1"><p>café</p>'.encode("latin-1")
    assert to_utf8_bytes(lat) == (
        '<meta charset="iso-8859-1"><p>café</p>'.encode("utf-8")
    )


def test_extraction_identical_across_encodings(spark):
    """The same word-box page in utf-8 vs BOM'd utf-16 extracts to
    IDENTICAL markdown through the full extract UDF."""
    from sharepointcrawler_spark.extraction.udfs import extract_text_udf
    from sharepointcrawler_spark.sources.pages import (
        make_doc_spec,
        render_html,
    )
    import random

    spec = make_doc_spec(7, random.Random(7))
    u8 = render_html(spec, [])
    u16 = b"\xff\xfe" + u8.decode("utf-8").encode("utf-16-le")
    df = spark.createDataFrame(
        [(1, u8, "d"), (2, u16, "d")], "doc_id long, html binary, name string"
    )
    out = {
        r["doc_id"]: r["md"]
        for r in df.select(
            "doc_id", extract_text_udf("html", "name").alias("md")
        ).collect()
    }
    assert out[1] == out[2] and out[1]
