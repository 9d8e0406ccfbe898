"""P9 page directives: canonical/meta-robots extraction units and the
end-to-end composition (nofollow gates link expansion; noindex and
canonical dedup gate ingest). Oracle parity: p9_html_meta_directives."""

from __future__ import annotations

from pyspark.sql import functions as F

from sharepointcrawler_spark.functions.htmlmeta import (
    html_meta_columns,
)


def _meta(spark, pages):
    df = spark.createDataFrame([(i, h) for i, h in enumerate(pages)], "id long, html_text string")
    out = html_meta_columns(df)
    return {r["id"]: r.asDict() for r in out.collect()}


def test_canonical_both_orders_and_quotes(spark):
    rows = _meta(
        spark,
        [
            '<link rel="canonical" href="https://e/x">',
            "<link href='https://e/y' rel='canonical'>",
            '<link rel="stylesheet" href="https://e/css">',
            "no head at all",
        ],
    )
    assert rows[0]["canonical_href"] == "https://e/x"
    assert rows[1]["canonical_href"] == "https://e/y"
    assert rows[2]["canonical_href"] is None
    assert rows[3]["canonical_href"] is None


def test_robots_meta_token_anchoring(spark):
    rows = _meta(
        spark,
        [
            '<meta name="robots" content="noindex, nofollow">',
            "<meta content='NOINDEX' name='robots'>",
            '<meta name="robots" content="noindexing nofollowup">',
            '<meta name="description" content="noindex">',
        ],
    )
    assert rows[0]["noindex"] and rows[0]["nofollow"]
    assert rows[1]["noindex"] and not rows[1]["nofollow"]
    assert not rows[2]["noindex"] and not rows[2]["nofollow"]  # substrings refused
    assert not rows[3]["noindex"] and rows[3]["meta_robots"] is None


def test_pipeline_respects_meta_robots(spark, tmp_path):
    """crawl_extract_ingest with respect_meta_robots: a nofollow page's
    links are never followed, a noindex page is crawled but not
    ingested, and two spellings declaring one canonical collapse to a
    single envelope row."""
    from sharepointcrawler_spark.plans.pipelines import crawl_extract_ingest
    from sharepointcrawler_spark.plans.snapshot import SnapshotStore

    h = "https://m.example.com"

    def page(url, body, links=(), head=""):
        anchors = "".join(f'<a href="{u}">l</a>' for u in links)
        return (
            url,
            f"<html><head><title>t</title>{head}</head><body><p>{body}</p>{anchors}</body></html>".encode(),
        )

    rows = [
        page(f"{h}/root", "root page", links=[f"{h}/nf", f"{h}/ni", f"{h}/a"]),
        page(
            f"{h}/nf",
            "nofollow page",
            links=[f"{h}/never"],
            head='<meta name="robots" content="nofollow">',
        ),
        page(
            f"{h}/ni",
            "noindex page",
            links=[f"{h}/b"],
            head='<meta name="robots" content="noindex">',
        ),
        page(f"{h}/a", "dup spelling", head=f'<link rel="canonical" href="{h}/b">'),
        page(f"{h}/b", "canonical target"),
        page(f"{h}/never", "should not be fetched"),
    ]
    pages = spark.createDataFrame(rows, "url string, html binary")
    store = SnapshotStore(spark, str(tmp_path / "snap_meta"))
    res = crawl_extract_ingest(
        spark,
        store,
        pages,
        seeds=[(f"{h}/root", 0)],
        sink_target=None,
        respect_meta_robots=True,
    )
    fetched = {
        r["url_canon"]
        for r in res.crawl.frontier.filter(F.col("state") == "fetched").collect()
    }
    assert f"{h}/never" not in fetched  # nofollow parent's link refused
    assert f"{h}/ni" in fetched and f"{h}/b" in fetched  # noindex still crawled
    titles = [r["title"] for r in res.documents.select("title").collect()]
    assert f"{h}/ni" not in titles  # ...but not ingested
    # canonical collapse: /a and /b -> one row, the canonical target
    assert titles.count(f"{h}/b") == 1 and f"{h}/a" not in titles
    assert f"{h}/root" in titles
