"""Content-digest seen set (operators/contentseen.py): within-crawl
mirror collapse, cross-crawl change classification, and the pipeline
wiring (crawl_extract_ingest(content_dedup=True))."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from sharepointcrawler_spark.operators.contentseen import (
    content_digest,
    content_seen_outcomes,
    mark_content_dups,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "url_canon string, text string")


def test_mark_content_dups_keep_first(spark):
    df = _docs(
        spark,
        [
            ("https://a/1", "alpha"),
            ("https://b/9", "alpha"),   # mirror of a/1 (later in order)
            ("https://a/2", "beta"),
            ("https://a/0", "alpha"),   # mirror, EARLIEST url — the keeper
        ],
    )
    out = {
        r["url_canon"]: r["is_content_dup"]
        for r in mark_content_dups(df).collect()
    }
    assert out == {
        "https://a/0": False,
        "https://a/1": True,
        "https://b/9": True,
        "https://a/2": False,
    }


def test_mark_content_dups_respects_order_cols(spark):
    df = spark.createDataFrame(
        [("u1", "same", 5), ("u2", "same", 1)],
        "url_canon string, text string, crawl_seq int",
    )
    out = {
        r["url_canon"]: r["is_content_dup"]
        for r in mark_content_dups(df, order_cols=("crawl_seq",)).collect()
    }
    # u2 was crawled first — it wins despite the later url spelling
    assert out == {"u2": False, "u1": True}


def test_content_seen_outcomes_statuses(spark):
    current = _docs(
        spark,
        [
            ("u_new", "fresh text"),
            ("u_same", "stable text"),
            ("u_edit", "edited text"),
            ("u_zz_mirror", "stable text"),  # same bytes as u_same, later order
        ],
    )
    prior = spark.createDataFrame(
        [("u_same", "stable text"), ("u_edit", "original text")],
        "url_canon string, _t string",
    ).select("url_canon", content_digest("_t").alias("content_digest"))
    rows = {
        r["url_canon"]: (r["status"], r["changed"])
        for r in content_seen_outcomes(current, prior).collect()
    }
    assert rows["u_new"] == ("new", False)
    assert rows["u_same"] == ("unchanged", False)
    assert rows["u_edit"] == ("changed", True)
    # a mirror says nothing about its own url's history: changed is null
    assert rows["u_zz_mirror"] == ("dup_in_crawl", None)


def test_content_seen_outcomes_first_crawl(spark):
    current = _docs(spark, [("u1", "a"), ("u2", "b"), ("u3", "a")])
    rows = {
        r["url_canon"]: r["status"]
        for r in content_seen_outcomes(current, None).collect()
    }
    assert rows == {"u1": "new", "u2": "new", "u3": "dup_in_crawl"}


def test_outcomes_feed_recrawl_history(spark):
    """The `changed` column slots straight into apply_refresh_outcome:
    an unchanged page bumps n_fetches only, a changed page also bumps
    n_changes — the digest store IS the recrawl change detector."""
    from sharepointcrawler_spark.operators.recrawl import apply_refresh_outcome

    current = _docs(spark, [("u_same", "stable"), ("u_edit", "new body")])
    prior = spark.createDataFrame(
        [("u_same", "stable"), ("u_edit", "old body")],
        "url_canon string, _t string",
    ).select("url_canon", content_digest("_t").alias("content_digest"))
    outcomes = content_seen_outcomes(current, prior).filter(
        F.col("changed").isNotNull()
    )
    history = spark.createDataFrame(
        [("u_same", 100, 3, 1), ("u_edit", 100, 3, 1)],
        "url_canon string, last_fetch_s long, n_fetches int, n_changes int",
    )
    updated = apply_refresh_outcome(
        history, outcomes.select("url_canon", "changed"), now_s=200
    )
    got = {
        r["url_canon"]: (r["last_fetch_s"], r["n_fetches"], r["n_changes"])
        for r in updated.collect()
    }
    assert got["u_same"] == (200, 4, 1)  # unchanged: change count untouched
    assert got["u_edit"] == (200, 4, 2)  # changed: change count bumps


def test_digest_matches_duckdb(spark):
    """Cross-engine digest parity: Spark conv(substr(md5..)) == DuckDB
    ('0x'||substr(md5..))::UBIGINT — the lane the oracle entry relies on."""
    duckdb = pytest.importorskip("duckdb")
    texts = ["", "a", "hello world", "Ünïcode ünd émojis 🙂", "x" * 10000]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = {
        r["text"]: r["d"]
        for r in df.select("text", content_digest("text").alias("d")).collect()
    }
    con = duckdb.connect()
    for t in texts:
        (want,) = con.execute(
            "SELECT CAST(('0x' || substr(md5(?),1,15)) AS UBIGINT)::BIGINT", [t]
        ).fetchone()
        assert got[t] == want, t


def test_pipeline_content_dedup(spark, tmp_path):
    """End-to-end: a planted mirror (doc5 serves doc3's bytes) collapses
    to ONE ingest envelope row; a second crawl against the first crawl's
    digest store ingests nothing (all unchanged/dup)."""
    from sharepointcrawler_spark.plans.pipelines import crawl_extract_ingest
    from sharepointcrawler_spark.plans.snapshot import SnapshotStore
    from sharepointcrawler_spark.sources.pages import pages_df

    pages = pages_df(spark, n_docs=12, n_hosts=2, seed=42)
    d3 = pages.filter(F.col("url").endswith("doc3")).select(
        "html", "text"
    ).collect()[0]
    mirrored = pages.withColumn(
        "html",
        F.when(F.col("url").endswith("doc5"), F.lit(d3["html"])).otherwise(
            F.col("html")
        ),
    ).withColumn(
        "text",
        F.when(F.col("url").endswith("doc5"), F.lit(d3["text"])).otherwise(
            F.col("text")
        ),
    )
    seeds = [("https://site0.example.com/docs/doc0", 0)]

    res1 = crawl_extract_ingest(
        spark,
        SnapshotStore(spark, str(tmp_path / "s1")),
        mirrored,
        seeds,
        sink_target=None,
        content_dedup=True,
    )
    out1 = res1.content_outcomes.collect()
    by_status = {}
    for r in out1:
        by_status.setdefault(r["status"], []).append(r["url_canon"])
    assert len(by_status.get("dup_in_crawl", [])) == 1
    dup_url = by_status["dup_in_crawl"][0]
    titles = [r["title"] for r in res1.documents.select("title").collect()]
    assert dup_url not in [t for t in titles]  # mirror not ingested
    assert len(titles) == len(out1) - 1

    # second crawl, nothing edited: everything unchanged or dup
    res2 = crawl_extract_ingest(
        spark,
        SnapshotStore(spark, str(tmp_path / "s2")),
        mirrored,
        seeds,
        sink_target=None,
        content_dedup=True,
        prior_content_digests=res1.content_outcomes.select(
            "url_canon", "content_digest"
        ),
    )
    statuses = {r["status"] for r in res2.content_outcomes.collect()}
    assert statuses <= {"unchanged", "dup_in_crawl"}
    assert res2.documents.count() == 0
