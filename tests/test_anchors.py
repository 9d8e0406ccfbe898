"""Anchor-text extraction + rollup (operators/anchors.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from sharepointcrawler_spark.operators.anchors import (
    anchor_links,
    anchor_text_rollup,
)


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url_canon string, html string")


def test_extraction_shapes(spark):
    html = (
        '<p>intro</p><a href="/a">first link</a>'
        "<a href='/b'><b>bold</b> text</a>"
        '<a href="">empty href dropped</a>'
        '<a href="/c"><img src="x.png"/></a>'
        '<a class="nav" href = "/d" rel="next">spaced attrs</a>'
    )
    rows = anchor_links(_pages(spark, [("u1", html)])).collect()
    got = {(r["href"], r["anchor_text"]) for r in rows}
    assert got == {
        ("/a", "first link"),
        ("/b", "bold text"),
        ("/c", ""),  # image link: empty text kept
        ("/d", "spaced attrs"),
    }


def test_rollup_top_text(spark):
    pages = _pages(
        spark,
        [
            ("s1", '<a href="/t">alpha</a><a href="/t">beta</a>'),
            ("s2", '<a href="/t">beta</a><a href="/u">only</a>'),
            ("s3", '<a href="/t">beta</a><a href="/t"></a>'),
        ],
    )
    out = {
        r["target"]: r
        for r in anchor_text_rollup(anchor_links(pages)).collect()
    }
    t = out["/t"]
    assert t["n_inlinks"] == 5 and t["n_sources"] == 3
    assert t["n_texts"] == 2  # alpha, beta (empty text excluded)
    assert t["top_text"] == "beta" and t["top_text_n"] == 3
    assert out["/u"]["top_text"] == "only"


def test_tie_breaks_lexical(spark):
    pages = _pages(
        spark, [("s", '<a href="/t">zeta</a><a href="/t">alpha</a>')]
    )
    r = anchor_text_rollup(anchor_links(pages)).first()
    assert r["top_text"] == "alpha" and r["top_text_n"] == 1


def test_target_with_only_empty_texts(spark):
    pages = _pages(spark, [("s", '<a href="/t"><img/></a>')])
    r = anchor_text_rollup(anchor_links(pages)).first()
    assert r["n_inlinks"] == 1 and r["n_texts"] == 0
    assert r["top_text"] is None


def test_no_python_in_plan(spark):
    pages = _pages(spark, [("s", '<a href="/t">x</a>')])
    plan = (
        anchor_text_rollup(anchor_links(pages))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    assert "EvalPython" not in plan
