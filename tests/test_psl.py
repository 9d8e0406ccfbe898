"""Registrable-domain extraction (functions/psl.py): publicsuffix.org
algorithm over every structural rule kind (normal, multi-label,
wildcard, exception, private-registry), NULL edges, the site fallback,
and the shuffle-free plan shape."""

from __future__ import annotations

import pyspark.sql.functions as F

from sharepointcrawler_spark.functions.psl import (
    PSL_SNAPSHOT,
    registrable_domain,
    with_site_column,
)

CASES = {
    # normal 1-label rule
    "www.example.com": "example.com",
    "example.com": "example.com",
    "deep.a.b.example.com": "example.com",
    # multi-label rule: co.uk beats uk
    "news.bbc.co.uk": "bbc.co.uk",
    "bbc.co.uk": "bbc.co.uk",
    # sibling-hosts-one-site / same-suffix-different-sites contrast
    "a.blogspot.com": "a.blogspot.com",   # private registry suffix
    "b.blogspot.com": "b.blogspot.com",
    "user1.github.io": "user1.github.io",
    # wildcard *.ck: any x.ck is a public suffix
    "foo.bar.ck": "foo.bar.ck",
    "deep.foo.bar.ck": "foo.bar.ck",
    # exception !www.ck: www.ck is registrable at the bare TLD
    "www.ck": "www.ck",
    "sub.www.ck": "www.ck",
    # unknown TLD: implicit * rule (1 label)
    "some.unknown.zz": "unknown.zz",
    # host IS a public suffix -> nothing registrable
    "co.uk": None,
    "bar.ck": None,  # wildcard-made suffix
    "com": None,
    "localhost": None,
    # case/trim normalization
    "  WWW.Example.COM  ": "example.com",
}


def test_registrable_domain_rule_kinds(spark):
    df = spark.createDataFrame([(h,) for h in CASES], "host string")
    got = {
        r["host"]: r["reg"]
        for r in df.select(
            "host", registrable_domain("host").alias("reg")
        ).collect()
    }
    assert got == CASES


def test_null_and_empty_hosts(spark):
    df = spark.createDataFrame([(None,), ("",), ("   ",)], "host string")
    regs = [r["reg"] for r in df.select(registrable_domain("host").alias("reg")).collect()]
    assert regs == [None, None, None]


def test_with_site_fallback(spark):
    # hosts with no registrable domain still get a politeness bucket:
    # the raw host itself
    df = spark.createDataFrame(
        [("news.bbc.co.uk",), ("localhost",), ("co.uk",)], "host string"
    )
    sites = {
        r["host"]: r["site"] for r in with_site_column(df).collect()
    }
    assert sites == {
        "news.bbc.co.uk": "bbc.co.uk",
        "localhost": "localhost",
        "co.uk": "co.uk",
    }


def test_custom_rules_full_list_contract(spark):
    # production passes the real publicsuffix.org file: comments and
    # blanks are skipped, rules replace the snapshot entirely
    rules = ["// comment", "", "com", "uk", "co.uk", "*.kawasaki.jp", "!city.kawasaki.jp", "jp"]
    df = spark.createDataFrame(
        [("x.y.kawasaki.jp",), ("city.kawasaki.jp",), ("sub.city.kawasaki.jp",)],
        "host string",
    )
    got = [
        r["reg"]
        for r in df.select(
            registrable_domain("host", rules=rules).alias("reg")
        ).collect()
    ]
    # y.kawasaki.jp is a wildcard suffix -> x.y.kawasaki.jp registrable;
    # the exception makes city.kawasaki.jp registrable at kawasaki.jp
    assert got == ["x.y.kawasaki.jp", "city.kawasaki.jp", "city.kawasaki.jp"]


def test_plan_no_shuffle_no_python(spark):
    df = spark.createDataFrame([("a.example.com",)] * 4, "host string")
    plan = (
        with_site_column(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange") == 0
    assert "Python" not in final


def test_snapshot_has_every_rule_kind():
    kinds = {
        "exact": any("." not in r and not r.startswith(("*", "!")) for r in PSL_SNAPSHOT),
        "multi": any("." in r and not r.startswith(("*", "!")) for r in PSL_SNAPSHOT),
        "wild": any(r.startswith("*.") for r in PSL_SNAPSHOT),
        "exc": any(r.startswith("!") for r in PSL_SNAPSHOT),
    }
    assert all(kinds.values()), kinds
