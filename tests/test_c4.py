"""C4 page-cleaning heuristics (functions/c4.py): line predicate
edge cases, page flags, keep verdict, and the flag-don't-drop
contract."""

from __future__ import annotations

import pyspark.sql.functions as F

from sharepointcrawler_spark.functions.c4 import c4_clean


def _clean(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return c4_clean(df).first()


def test_line_filters(spark):
    page = "\n".join(
        [
            "this line has five words here.",   # kept
            "too short line.",                   # <5 words
            "no terminal punctuation on this line",  # no punct
            "does this question line survive the filter?",  # kept (?)
            'he said "it ends with a quote."',   # kept (quote after .)
            "please enable JavaScript to continue reading today.",  # js
            "another perfectly fine sentence with enough words.",  # kept
        ]
    )
    r = _clean(spark, page)
    assert r["c4_n_lines"] == 7
    assert r["c4_n_kept_lines"] == 4
    assert r["c4_keep"] is True
    kept = r["c4_kept_text"].split("\n")
    assert all("JavaScript" not in l for l in kept)
    assert "too short line." not in kept


def test_page_flags_block(spark):
    base = "a good line with five proper words.\n" * 4
    assert _clean(spark, base)["c4_keep"] is True
    assert _clean(spark, base + "\nsome Lorem Ipsum filler here now.")[
        "c4_has_lorem_ipsum"
    ]
    assert _clean(spark, base + "\nif (x) { return; }")["c4_has_brace"]
    r = _clean(spark, base + "\nthis mentions badword2 in passing today.")
    assert r["c4_has_naughty"] and r["c4_keep"] is False
    # substring of a blocklist word does NOT trip the word-boundary match
    r2 = _clean(spark, base + "\nthe word embadword1ed is different here.")
    assert not r2["c4_has_naughty"]


def test_min_lines_and_no_drop(spark):
    # two kept lines -> keep=False, but the row is still emitted
    page = "first good line with five words.\nsecond good line with five words."
    r = _clean(spark, page)
    assert r["c4_n_kept_lines"] == 2 and r["c4_keep"] is False


def test_batch_counts(spark):
    rows = [
        (i, "\n".join(f"line number {i}-{j} has words enough." for j in range(4)))
        for i in range(50)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = c4_clean(df)
    assert out.count() == 50  # flag-don't-drop
    assert out.filter(F.col("c4_keep")).count() == 50
