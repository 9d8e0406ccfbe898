"""Main-content extraction (functions/boilerplate.py): block
segmentation, link-density classification, integer audit columns."""

from __future__ import annotations

import pyspark.sql.functions as F

from sharepointcrawler_spark.functions.boilerplate import extract_main_content

LONG = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"


def _one(spark, html):
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    return extract_main_content(df).first()


def test_nav_and_footer_dropped(spark):
    html = (
        "<html><body>"
        '<nav><a href="/">home</a> <a href="/a">about</a></nav>'
        f"<p>{LONG}</p>"
        '<footer>copyright <a href="/tos">terms</a></footer>'
        "</body></html>"
    )
    r = _one(spark, html)
    assert r["bp_n_content_blocks"] == 1
    assert r["bp_main_text"] == LONG
    # audit columns: anchors in nav+footer counted page-wide
    assert r["bp_link_chars"] == len("home") + len("about") + len("terms")
    assert r["bp_content_chars"] == len(LONG)


def test_link_density_integer_rule(spark):
    # 12 words but >=1/3 anchor chars -> boilerplate
    words = LONG.split()
    linky = (
        "<p>"
        + " ".join(words[:4])
        + ' <a href="/x">'
        + " ".join(words[4:])
        + "</a></p>"
    )
    r = _one(spark, f"<div>{linky}</div>")
    assert r["bp_n_content_blocks"] == 0
    # same block with a tiny anchor passes
    fine = "<p>" + " ".join(words[:-1]) + f' <a href="/x">{words[-1]}</a></p>'
    r2 = _one(spark, f"<div>{fine}</div>")
    assert r2["bp_n_content_blocks"] == 1


def test_short_blocks_dropped_and_counts(spark):
    html = f"<p>see more</p><p>{LONG}</p><p>{LONG}</p>"
    r = _one(spark, html)
    assert r["bp_n_blocks"] == 3
    assert r["bp_n_content_blocks"] == 2
    assert r["bp_main_text"] == LONG + "\n" + LONG


def test_no_rows_dropped(spark):
    df = spark.createDataFrame(
        [(i, f"<p>{LONG}</p>" if i % 2 else "<nav><a href='/'>x</a></nav>")
         for i in range(20)],
        "doc_id long, html string",
    )
    out = extract_main_content(df)
    assert out.count() == 20
    assert out.filter(F.col("bp_n_content_blocks") > 0).count() == 10
