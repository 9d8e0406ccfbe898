"""Descriptive html metadata probes (functions/htmlmeta.py):
title / description / og / lang extraction edge cases."""

from __future__ import annotations

import pytest

from sharepointcrawler_spark.functions.htmlmeta import (
    html_describe_columns,
    og_property,
)


def _probe(spark, html):
    df = spark.createDataFrame([(html,)], "html_text string")
    return html_describe_columns(df).first()


def test_title_variants(spark):
    assert _probe(spark, "<title>Plain Title</title>")["page_title"] == "Plain Title"
    assert _probe(spark, "<TITLE>Upper Case</TITLE>")["page_title"] == "Upper Case"
    assert (
        _probe(spark, "<title>A <b>bold</b>  doc</title>")["page_title"]
        == "A bold doc"
    )
    assert _probe(spark, "<title>multi\nline</title>")["page_title"] == "multi line"
    assert _probe(spark, "<body>no title</body>")["page_title"] is None
    assert _probe(spark, "<title>   </title>")["page_title"] is None


def test_description_both_orders_and_quotes(spark):
    a = '<meta name="description" content="first form">'
    b = "<meta content='second form' name='description'>"
    assert _probe(spark, a)["meta_description"] == "first form"
    assert _probe(spark, b)["meta_description"] == "second form"
    assert _probe(spark, "<meta name='keywords' content='x'>")[
        "meta_description"
    ] is None


def test_og_and_lang(spark):
    html = (
        '<html LANG="EN-us"><head>'
        '<meta property="og:title" content="OG Title">'
        '<meta content="article" property="og:type">'
        "</head></html>"
    )
    r = _probe(spark, html)
    assert r["og_title"] == "OG Title"
    assert r["og_type"] == "article"
    assert r["declared_lang"] == "en-us"
    assert _probe(spark, "<html><head></head></html>")["declared_lang"] is None


def test_og_property_name_validation(spark):
    with pytest.raises(ValueError):
        og_property(None, 'title"][')
