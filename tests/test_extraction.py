"""Byte-identical text extraction (SURVEY.md §5 item 3; BASELINE.json
input_hint "byte-identical extracted text per url").

The golden `text` column is computed TOP-DOWN from the document spec
(sources/pages.py); the engine extracts BOTTOM-UP from word boxes.
Equality is asserted byte-for-byte."""

from __future__ import annotations

from pyspark.sql import functions as F

from sharepointcrawler_spark.extraction.converter import (
    ConvertOptions,
    RawWord,
    convert_words_to_markdown,
)
from sharepointcrawler_spark.extraction.htmlwords import extract_links, parse_word_pages
from sharepointcrawler_spark.extraction.udfs import _extract_one, extract_text_udf
from sharepointcrawler_spark.sources.pages import (
    build_pages_rows,
    expected_markdown,
    make_doc_spec,
    render_html,
)
import random


def _mk_line(text: str, y: float, x0: float = 72.0) -> list[RawWord]:
    words = []
    x = x0
    for w in text.split():
        wd = len(w) * 6.0
        words.append(RawWord(w, x, x + wd, y + 5, y - 5))
        x += wd + 4.0
    return words


def _mk_page(lines: list[str], y0: float = 720.0) -> list[RawWord]:
    out: list[RawWord] = []
    y = y0
    for ln in lines:
        out.extend(_mk_line(ln, y))
        y -= 14.0
    return out


def test_golden_pairs_python():
    """All synthetic docs: converter output == top-down golden text."""
    rng = random.Random(42)
    for i in range(25):
        spec = make_doc_spec(i, rng)
        html = render_html(spec, links=[])
        got = _extract_one(html, f"doc{i}")
        want = expected_markdown(spec)
        assert got == want, (
            f"doc{i} mismatch:\n--- got ---\n{got!r}\n--- want ---\n{want!r}"
        )


def test_golden_pairs_spark(spark):
    rows = build_pages_rows(n_docs=30, n_hosts=3, seed=42)
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    extracted = df.withColumn(
        "extracted", extract_text_udf(F.col("html"), F.col("url"))
    )
    mism = extracted.filter(F.col("extracted") != F.col("text")).count()
    assert mism == 0


_PAGE2 = ["Distinct second page sentence.", "Another second page sentence."]
# single-page docs get min_hits=1 (every windowed line dropped as a
# "repeat" — faithful reference behavior); unit tests add a 2nd page


def _convert(lines: list[str], name: str = "d") -> str:
    # pad to >=8 lines: on shorter pages the first-4/last-4 repeat windows
    # overlap and double-count, turning unique lines into "repeats"
    pad = [f"Unique trailing pad sentence {k}." for k in range(max(0, 8 - len(lines)))]
    return convert_words_to_markdown([_mk_page(lines + pad), _mk_page(_PAGE2)], name)


def test_h1_fallback_doc_then_logical_name():
    # no title block, but a doc number -> H1 = doc  (:131)
    md = _convert(
        [
            "Management System",
            "Standard Operating Procedure",
            "Document No.: CLG-AB-CD-0001",
            "Some body text here.",
        ],
        "fallbackname",
    )
    assert md.startswith("# CLG-AB-CD-0001\n")
    # no header at all -> logical name
    md2 = _convert(["Just a line of text."], "fallbackname")
    assert md2.startswith("# fallbackname\n")


def test_key_only_folding_and_stray_line():
    """Variant B: 'Key:' on its own line folds with the next line; the
    reference never marks the bare 'Key:' line, so it survives into the
    body (replicated quirk). Trailing approver name splits off the org
    value (:576-582)."""
    page = _mk_page(
        [
            "Management System",
            "Standard Operating Procedure",
            "Document No.: Page:",
            "CLG-EN-PR-0175 1 of 4",
            "Fitness Center Access",
            "Effective Date: Revision:",
            "06/08/2023 G",
            "Accountable Organization:",
            "Management Approval:",
            "Facilities Services Jane Doe",
            "Filler body line one here.",
            "Filler body line two here.",
        ]
    )
    # second page: with 1 page, min_hits=ceil(max(1, 0.6))=1 and EVERY
    # first/last-4 line would be dropped as a "repeat" (faithful
    # reference behavior) — two distinct pages give min_hits=2
    page2 = _mk_page(["Second page content here.", "More second page text."])
    md = convert_words_to_markdown([page, page2], "x")
    assert md.startswith("# Fitness Center Access\n")
    # stray bare key line remains in the body (reference fidelity)
    assert "Accountable Organization:" in md
    # but the folded value line is dropped
    assert "Facilities Services Jane Doe" not in md
    assert "Management Approval:" not in md.replace(
        "Accountable Organization:", ""
    )  # the folded second key was rawValuesToDrop'd


def test_repeat_threshold_boundary():
    """A banner on 2 of 4 pages (< ceil(4*0.6)=3) is kept; on 3 of 4 it
    is dropped (:320)."""
    # pages need >=8 lines: on shorter pages the first-4/last-4 windows
    # overlap and double-count (faithful Take(4)+TakeLast(4) behavior)
    filler = [f"Middle filler sentence number {k}." for k in range(7)]
    mk = lambda banner_pages: [
        _mk_page(
            (["Rare Banner"] if p in banner_pages else [])
            + [f"Body line {p}."]
            + filler
        )
        for p in range(4)
    ]
    md_kept = convert_words_to_markdown(mk({0, 1}), "d")
    assert "Rare Banner" in md_kept
    md_dropped = convert_words_to_markdown(mk({0, 1, 2}), "d")
    assert "Rare Banner" not in md_dropped


def test_noise_lines_dropped():
    md = _convert([
            "Real content stays here.",
            "Copyright 2020 Example",
            "CUI material inside",
            "Page: 2 of 9",
            "use, or",
            "More real content.",
        ])
    assert "Real content stays here." in md
    assert "More real content." in md
    for bad in ("Copyright", "CUI", "Page:", "use, or"):
        assert bad not in md


def test_heading_levels_clamp():
    md = _convert(
        [
            "1 Top",
            "1.2 Sub",
            "1.2.3 SubSub",
            "1.2.3.4.5.6.7 Deep",
        ]
    )
    assert "\n## 1 Top\n" in md
    assert "\n### 1.2 Sub\n" in md
    assert "\n#### 1.2.3 SubSub\n" in md
    assert "\n###### 1.2.3.4.5.6.7 Deep\n" in md  # clamped at 6


def test_markdown_escape():
    md = _convert(["Use the pipe|char and star*mark and under_score now."])
    assert "pipe\\|char" in md and "star\\*mark" in md and "under\\_score" in md


def test_paragraph_merge_rules():
    md = _convert(
        [
            "This line continues",
            "onto the next one.",  # lowercase -> merged
            "This one ends now.",  # punctuation -> break
            "Another standalone",
            "Capitalized next",  # next starts uppercase -> no merge
        ]
    )
    assert "This line continues onto the next one.\n" in md
    assert "\nAnother standalone\n" in md
    assert "\nCapitalized next\n" in md


def test_table_requires_section6():
    """The same table outside section 6 is NOT table-ized (:202)."""
    table_lines = ["5.0 NotProcess", "\t".join(["Step", "Responsibility", "Action"]),
                   "\t".join(["1.", "Ops", "Do the thing"]),
                   "\t".join(["2.", "Sec", "Check the thing"])] + [
                       f"Unique pad sentence number {k}." for k in range(4)]
    from sharepointcrawler_spark.sources.pages import _words_for_line

    words = []
    y = 720.0
    for ln in table_lines:
        words.extend(
            RawWord(t, l, r, tp, b) for (t, l, r, tp, b) in _words_for_line(ln, y)
        )
        y -= 14.0
    md = convert_words_to_markdown([words, _mk_page(_PAGE2)], "d")
    assert "| Step |" not in md  # rendered as paragraphs instead
    assert "Step Responsibility Action" in md


def test_extract_links_order_and_resolution():
    html = (
        b'<html><body><a href="b.html">x</a>'
        b'<a href="https://other.com/z">y</a>'
        b'<a href="#frag">n</a>'
        b'<a href="mailto:a@b.c">n</a>'
        b'<a href="/abs/path">w</a></body></html>'
    )
    links = extract_links(html, "https://host.com/dir/page.html")
    assert links == [
        "https://host.com/dir/b.html",
        "https://other.com/z",
        "https://host.com/abs/path",
    ]


def test_extract_links_fast_path_matches_urljoin():
    """The absolute-href fast path in extract_links must be byte-equal
    to urljoin for every href it claims (and anything outside the
    predicate must still take the urljoin fallback). Fuzzes the
    predicate against urllib over adversarial and random hrefs."""
    import random as _random
    import string as _string
    from urllib.parse import urljoin

    from sharepointcrawler_spark.extraction.htmlwords import _ABS_HREF_RE

    bases = [
        "https://a.example.com/x/y", "http://b.example.com",
        "https://c.com/p?q=1#f", "ftp://weird", "not a url",
        "https://[::1]:8080/x", "HTTPS://UP.example/x",
    ]
    hrefs = [
        "https://site1.example.com/docs/doc2977", "http://h/p", "https://h",
        "https://h/", "https://h/p;params", "https://h/p?", "https://h/p#",
        "https://h/p?q", "https://h/p#f", "HTTPS://H/p", "https://h/p/../q",
        "https://h/./p", "https://h//double//slash", "https:///nonetloc",
        "https://", "https://h/p q", "https://h/p%20q",
        "https://user:pw@h:8080/p", "https://h/[x]", "https://[::1]/p",
        "https://h/p;", "https://h/;p", "https://h/€", "https://h/%E2%82%AC",
    ]
    rng = _random.Random(42)
    chars = _string.ascii_letters + _string.digits + "/?#;.%:@&=+$,-_!~*'()[] "
    for _ in range(20000):
        h = "https://" + "".join(
            rng.choice(chars) for _ in range(rng.randint(0, 25))
        )
        hrefs.append(h)
        hrefs.append("http://" + h[8:])
    for b in bases:
        for h in hrefs:
            if _ABS_HREF_RE.match(h):
                assert urljoin(b, h) == h, (b, h)
    # the fallback still resolves relatives (predicate must not claim them)
    assert not _ABS_HREF_RE.match("b.html")
    assert not _ABS_HREF_RE.match("/abs/path")
    assert not _ABS_HREF_RE.match("//proto-relative.com/x")


def test_html_roundtrip_words():
    rng = random.Random(1)
    spec = make_doc_spec(3, rng)
    html = render_html(spec, links=["https://x.com/a"])
    pages, heights = parse_word_pages(html)
    assert len(pages) == spec.n_pages
    assert heights == [792.0] * spec.n_pages
    assert all(len(p) > 0 for p in pages)


def test_dormant_operators_d5_d6_d7():
    """D5-D7 (SURVEY §2.8): dormant in the reference but part of the
    declared surface — IsOrphanWord (:643-650), WriteMetaRow (:347-351),
    AssignHeader (:371-399)."""
    from sharepointcrawler_spark.extraction.converter import (
        assign_header,
        is_orphan_word,
        write_meta_row,
    )

    body = ["1.0 Purpose", "Badge", "This is a full sentence line.", "2.0 Scope"]
    assert is_orphan_word(body, 1)            # adjacent to heading above
    assert not is_orphan_word(body, 2)        # not a 1-12-letter word
    assert is_orphan_word(body, 3) is False   # heading itself: has digits
    assert is_orphan_word(["x", "1.0 T"], 0)  # heading below
    assert not is_orphan_word(["abc", "plain"], 0)  # no adjacent heading
    assert not is_orphan_word(["supercalifragilistic", "1.0 T"], 0)  # >12

    out: list[str] = []
    write_meta_row(out, "Doc|No", "CLG_1*")
    write_meta_row(out, "Empty", "   ")
    write_meta_row(out, "None", None)
    assert out == ["| Doc\\|No | CLG\\_1\\* |"]  # escaped; blanks skipped

    h: dict[str, str] = {}
    assign_header(h, " Document No.: ", "CLG-EN-1000")
    assign_header(h, "document no", "lower-invalid")   # pattern rejects
    assign_header(h, "Effective Date", "01/02/2024")
    assign_header(h, "effective date:", "2024-01-02")  # pattern rejects
    assign_header(h, "Revision", "B")
    assign_header(h, "Accountable Organization", "Safety Office")
    assign_header(h, "Management Approval", "Jane Doe")
    assign_header(h, "Source", "Internal")
    assign_header(h, "Page", "2 of 4")                 # explicitly ignored
    assign_header(h, "Unknown Key", "whatever")        # unmapped
    assert h == {
        "doc": "CLG-EN-1000", "eff": "01/02/2024", "rev": "B",
        "org": "Safety Office", "appr": "Jane Doe", "src": "Internal",
    }
