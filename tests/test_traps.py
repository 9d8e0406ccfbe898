"""Crawler-trap detection (T7): signal-by-signal unit checks plus the
no-shuffle plan contract. The DuckDB hash parity for the full fixture
runs in test_oracle_parity.py (entry t7_trap_detection)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sharepointcrawler_spark.operators.traps import (
    TrapRules,
    reject_traps,
    trap_flags,
)


def _flags(spark, urls, **rules):
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)], "id long, url string")
    out = trap_flags(df, rules=TrapRules(**rules) if rules else TrapRules())
    return {r["url"]: r.asDict() for r in out.collect()}


def test_cycle_and_depth_signals(spark):
    rows = _flags(
        spark,
        [
            "https://h.example.com/a/b/a/b/a",  # 'a' x3 -> cycle trap
            "https://h.example.com/" + "/".join(f"s{i}" for i in range(20)),
            "https://h.example.com/docs/guide/intro",
        ],
    )
    cyc = rows["https://h.example.com/a/b/a/b/a"]
    assert cyc["max_segment_repeat"] == 3 and cyc["is_trap"]
    deep = rows["https://h.example.com/" + "/".join(f"s{i}" for i in range(20))]
    assert deep["path_depth"] == 20 and deep["is_trap"]
    ok = rows["https://h.example.com/docs/guide/intro"]
    assert ok["path_depth"] == 3 and ok["max_segment_repeat"] == 1
    assert not ok["is_trap"]


def test_session_param_and_param_blowup(spark):
    rows = _flags(
        spark,
        [
            "https://h/p?JSESSIONID=ABC123&x=1",  # case-insensitive name
            "https://h/p?utm_source=feed",
            "https://h/p?" + "&".join(f"k{i}={i}" for i in range(13)),
            "https://h/p?page=2&sort=asc",
        ],
    )
    assert rows["https://h/p?JSESSIONID=ABC123&x=1"]["session_param"]
    assert rows["https://h/p?utm_source=feed"]["session_param"]
    blow = rows["https://h/p?" + "&".join(f"k{i}={i}" for i in range(13))]
    assert blow["query_param_count"] == 13 and blow["is_trap"]
    ok = rows["https://h/p?page=2&sort=asc"]
    assert ok["query_param_count"] == 2 and not ok["session_param"]
    assert not ok["is_trap"]


def test_calendar_run_and_length(spark):
    long_url = "https://h/x" + "/abcdefghij" * 200
    rows = _flags(
        spark,
        [
            "https://h/cal/2024/01/03/2024/next",  # numeric run 4
            "https://h/blog/2024/01/03/post-title",  # run 3: below threshold
            long_url,
        ],
    )
    cal = rows["https://h/cal/2024/01/03/2024/next"]
    assert cal["numeric_run"] == 4 and cal["is_trap"]
    blog = rows["https://h/blog/2024/01/03/post-title"]
    assert blog["numeric_run"] == 3 and not blog["is_trap"]
    assert rows[long_url]["url_length"] > 2048 and rows[long_url]["is_trap"]


def test_edge_cases_null_empty_and_no_path(spark):
    df = spark.createDataFrame(
        [(0, None), (1, ""), (2, "https://h.example.com"), (3, "not a url")],
        "id long, url string",
    )
    out = {r["id"]: r.asDict() for r in trap_flags(df).collect()}
    assert out[0]["is_trap"] is None or out[0]["is_trap"] is False  # null passes through
    assert out[2]["path_depth"] == 0 and not out[2]["is_trap"]
    assert not out[3]["is_trap"]


def test_reject_traps_keeps_schema_and_drops_only_traps(spark):
    df = spark.createDataFrame(
        [
            (1, "https://h/docs/a", "x"),
            (2, "https://h/a/b/a/b/a", "y"),
            (3, "https://h/p?sid=42", "z"),
        ],
        "id long, url string, extra string",
    )
    kept = reject_traps(df)
    assert kept.columns == ["id", "url", "extra"]
    assert [r["id"] for r in kept.collect()] == [1]


def test_crawl_gate_refuses_trap_subtree(spark, tmp_path):
    """run_crawl with trap_rules: a session-id child URL is refused at
    admission — never fetched, never in seen — while its benign sibling
    crawls normally; without the gate both are crawled."""
    from sharepointcrawler_spark.operators.frontier import graph_expander
    from sharepointcrawler_spark.plans.crawl import CrawlConfig, run_crawl
    from sharepointcrawler_spark.plans.snapshot import SnapshotStore

    h = "https://t.example.com"
    edges = spark.createDataFrame(
        [
            (f"{h}/lib", f"{h}/lib/doc.pdf", "file", 0),
            (f"{h}/lib", f"{h}/lib/view?phpsessid=deadbeef", "folder", 0),
        ],
        "parent_url string, child_url string, kind string, sibling_idx int",
    )
    for gated in (True, False):
        store = SnapshotStore(spark, str(tmp_path / f"snap_{gated}"))
        res = run_crawl(
            spark,
            store,
            graph_expander(edges),
            seeds=[(f"{h}/lib", 0)],
            config=CrawlConfig(trap_rules=TrapRules() if gated else None),
            resume=False,
        )
        urls = {r["url_canon"] for r in res.seen.collect()}
        assert (f"{h}/lib/view?phpsessid=deadbeef" in urls) == (not gated)
        assert any(u.endswith("/lib/doc.pdf") for u in urls)


def test_trap_flags_plan_has_no_exchange(spark):
    """Admission gate = one projection: no Exchange, no Python UDF."""
    df = spark.createDataFrame([(1, "https://h/a/b")], "id long, url string")
    plan = trap_flags(df)._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "Exchange" not in final
    assert "ArrowEvalPython" not in final and "BatchEvalPython" not in final
