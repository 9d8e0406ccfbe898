"""PII detection/redaction (functions/pii.py): per-kind counts, typed
placeholder rewriting, cross-kind capture order, and the plan shape
(one projection, no shuffle, no Python)."""

from __future__ import annotations

import pyspark.sql.functions as F

from sharepointcrawler_spark.functions.pii import (
    PII_PATTERNS,
    pii_count,
    redact_pii,
    with_pii_columns,
)


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_counts_and_redaction_per_kind(spark):
    df = _df(
        spark,
        [
            "mail a.b+c@ex-1.org or x@y.io",
            "ssn 123-45-6789 tel 555-123-4567 and 555.867.5309",
            "server at 10.0.3.1 and 192.168.255.254, port none",
            "clean prose with no identifiers at all",
        ],
    )
    rows = {r["doc_id"]: r for r in with_pii_columns(df).collect()}
    assert (rows[0]["n_email"], rows[0]["n_pii"]) == (2, 2)
    assert (rows[1]["n_ssn"], rows[1]["n_phone"]) == (1, 2)
    assert rows[2]["n_ipv4"] == 2
    assert rows[3]["n_pii"] == 0 and not rows[3]["has_pii"]
    assert rows[0]["text_redacted"] == "mail [EMAIL] or [EMAIL]"
    assert rows[1]["text_redacted"] == "ssn [SSN] tel [PHONE] and [PHONE]"
    assert rows[2]["text_redacted"] == (
        "server at [IPV4] and [IPV4], port none"
    )
    assert rows[3]["text_redacted"] == rows[3]["text"]


def test_ip_domain_address_redacts_as_ipv4(spark):
    # the email pattern requires an ALPHABETIC TLD, so an address with
    # a raw-IP domain is not an email match; the IP inside it is still
    # caught and redacted by the ipv4 pass — no PII leaks either way
    df = _df(spark, ["report x@1.2.3.4 plus bare 5.6.7.8"])
    row = with_pii_columns(df).collect()[0]
    assert row["text_redacted"] == "report x@[IPV4] plus bare [IPV4]"
    assert (row["n_email"], row["n_ipv4"]) == (0, 2)


def test_ssn_phone_shapes_disjoint(spark):
    # 3-2-4 (SSN) and 3-3-4 (phone) shapes never cross-match
    df = _df(spark, ["123-45-6789 then 123-456-7890"])
    row = with_pii_columns(df).collect()[0]
    assert (row["n_ssn"], row["n_phone"]) == (1, 1)
    assert row["text_redacted"] == "[SSN] then [PHONE]"


def test_column_functions_standalone(spark):
    df = _df(spark, ["a@b.co c@d.io"])
    got = df.select(
        pii_count("text", "email").alias("n"),
        redact_pii("text", kinds=("email",)).alias("r"),
    ).collect()[0]
    assert got["n"] == 2 and got["r"] == "[EMAIL] [EMAIL]"


def test_plan_is_one_scan_no_shuffle_no_python(spark):
    df = _df(spark, ["x@y.io"] * 8)
    plan = (
        with_pii_columns(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange") == 0
    assert "ArrowEvalPython" not in final and "BatchEvalPython" not in final


def test_all_patterns_have_placeholders(spark):
    # every declared kind round-trips: a text of one planted span per
    # kind redacts to exactly the four placeholders
    text = "a@b.co 123-45-6789 555-123-4567 10.0.0.1"
    df = _df(spark, [text])
    row = with_pii_columns(df).collect()[0]
    assert row["text_redacted"] == "[EMAIL] [SSN] [PHONE] [IPV4]"
    assert row["n_pii"] == len(PII_PATTERNS)
