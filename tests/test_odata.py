"""OData response decode (S4), metadata projection (P1), endpoint
escaping (S3/F13), classifiers (F2), stopwords — reference semantics
from SharePointClient.cs."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from sharepointcrawler_spark.sources.odata import (
    classify_category,
    decode_folder_response,
    file_value_endpoint,
    is_page_number_line,
    is_signature_line,
    is_toc_line,
    project_file_entities,
    quote_escape_url,
    remove_stopwords,
)

VERBOSE = json.dumps(
    {
        "d": {
            "Files": {
                "results": [
                    {"Name": "a.pdf", "ServerRelativeUrl": "/lib/a.pdf", "Length": 120, "Exists": True},
                    {"Name": "b.docx", "ServerRelativeUrl": "/lib/b.docx"},
                ]
            },
            "Folders": {"results": [{"Name": "sub", "odata.id": "https://x/sub"}]},
        }
    }
)
MINIMAL = json.dumps(
    {
        "Files": [{"Name": "c.pdf", "ServerRelativeUrl": "/lib2/c.pdf", "Title": "C doc"}],
        "Folders": [],
    }
)
EMPTY = json.dumps({"d": {}})


def test_decode_both_shapes(spark):
    df = spark.createDataFrame([(1, VERBOSE), (2, MINIMAL), (3, EMPTY)], "id int, response string")
    out = {r.id: r for r in decode_folder_response(df).collect()}
    assert len(out[1].files) == 2 and len(out[1].folders) == 1
    assert len(out[2].files) == 1 and out[2].folders == []
    assert out[3].files == [] and out[3].folders == []


def test_project_entities_metadata_map(spark):
    df = spark.createDataFrame([(1, VERBOSE), (2, MINIMAL)], "id int, response string")
    ents = project_file_entities(decode_folder_response(df))
    rows = {(r.id, r.sibling_idx): r for r in ents.collect()}
    a = rows[(1, 0)]
    assert a.name == "a.pdf" and a.server_relative_url == "/lib/a.pdf"
    # open-world map with stringified coercion (P1)
    assert a.metadata["Length"] == "120" and a.metadata["Exists"] == "true"
    assert rows[(2, 0)].metadata["Title"] == "C doc"
    # in-response order preserved (T1 contract)
    assert rows[(1, 1)].name == "b.docx"


def test_endpoint_escaping(spark):
    df = spark.createDataFrame([("https://site", "/lib/o'brien.pdf")], "site string, url string")
    got = df.select(
        quote_escape_url("url").alias("esc"),
        file_value_endpoint("site", "url").alias("ep"),
    ).collect()[0]
    assert got.esc == "/lib/o''brien.pdf"
    assert got.ep == "https://site/_api/web/GetFileByServerRelativeUrl('/lib/o''brien.pdf')/$value"


def test_classifiers(spark):
    df = spark.createDataFrame(
        [
            ("Employee onboarding handbook",),
            ("Information Technology system notes",),
            ("Security policy and procedure",),
            ("Vacation request form",),
            ("Quarterly revenue numbers",),
            ("HR policy form",),  # first match in declaration order: HR
        ],
        ["title"],
    )
    got = [r.c for r in df.select(classify_category("title").alias("c")).collect()]
    assert got == ["HR", "IT", "Policy", "Form", "Other", "HR"]


def test_line_detectors(spark):
    df = spark.createDataFrame(
        [("Page 3 of 10",), ("42",), ("Approved by J. Smith",), ("Table of Contents",), ("Body text",)],
        ["line"],
    )
    rows = df.select(
        is_page_number_line("line").alias("p"),
        is_signature_line("line").alias("s"),
        is_toc_line("line").alias("t"),
    ).collect()
    assert [r.p for r in rows] == [True, True, False, False, False]
    assert [r.s for r in rows] == [False, False, True, False, False]
    assert [r.t for r in rows] == [False, False, False, True, False]


def test_stopword_removal(spark):
    df = spark.createDataFrame([("The quick and the dead will have answers",)], ["text"])
    got = df.select(remove_stopwords("text").alias("w")).collect()[0].w
    assert "the" not in got and "and" not in got and "will" not in got
    assert "quick" in got and "dead" in got and "answers" in got
