"""Redirect-chain resolution (T8): pointer-doubling semantics — exact
hop counts, loop refusal, over-cap refusal, frontier rewrite. DuckDB
hash parity for the fixture runs in test_oracle_parity.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sharepointcrawler_spark.operators.redirects import (
    apply_redirect_map,
    resolve_redirects,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def _resolved(spark, pairs, max_hops=20):
    out = resolve_redirects(_edges(spark, pairs), max_hops=max_hops)
    return {r["src"]: (r["final_url"], r["hops"], r["is_loop"]) for r in out.collect()}


def test_chain_resolves_with_exact_hops(spark):
    res = _resolved(
        spark,
        [("a", "b"), ("b", "c"), ("c", "d"), ("e", "d")],
    )
    assert res["a"] == ("d", 3, False)
    assert res["b"] == ("d", 2, False)
    assert res["c"] == ("d", 1, False)
    assert res["e"] == ("d", 1, False)


def test_loop_refused_with_nulls(spark):
    res = _resolved(spark, [("a", "b"), ("b", "a"), ("x", "a"), ("y", "z")])
    assert res["a"] == (None, None, True)
    assert res["b"] == (None, None, True)
    assert res["x"] == (None, None, True)  # feeds the loop
    assert res["y"] == ("z", 1, False)


def test_over_cap_chain_refused_like_a_loop(spark):
    """A 25-hop TERMINATING chain beyond max_hops=20 is refused the way
    browsers refuse it (indistinguishable from a loop without unbounded
    work); the same chain under max_hops=32 resolves exactly."""
    pairs = [(f"n{i}", f"n{i+1}") for i in range(25)]
    capped = _resolved(spark, pairs, max_hops=20)
    assert capped["n0"] == (None, None, True)
    assert capped["n10"] == ("n25", 15, False)
    wide = _resolved(spark, pairs, max_hops=32)
    assert wide["n0"] == ("n25", 25, False)


def test_exact_hop_counts_not_powers_of_two(spark):
    """Doubling sums real hop counts: every chain length 1..7 reports
    its true length, not the doubling round that resolved it."""
    pairs = [(f"c{i}", f"c{i+1}") for i in range(7)]
    res = _resolved(spark, pairs)
    for i in range(7):
        assert res[f"c{i}"] == ("c7", 7 - i, False)


def test_apply_redirect_map_rewrites_and_drops_loops(spark):
    resolved = resolve_redirects(
        _edges(spark, [("old", "mid"), ("mid", "new"), ("l1", "l2"), ("l2", "l1")])
    )
    df = spark.createDataFrame(
        [("old",), ("new",), ("l1",), ("other",)], "url_canon string"
    )
    out = sorted(
        r["url_canon"] for r in apply_redirect_map(df, resolved).collect()
    )
    # 'old' lands on 'new' (now twice), loop member dropped, passthrough kept
    assert out == ["new", "new", "other"]


def test_crawl_dedups_on_redirect_landings(spark, tmp_path):
    """run_crawl(redirects_df=...): a discovered child that redirects
    lands on its final URL — the frontier holds the landing (which then
    expands normally), never the hop spelling; a child whose redirect
    chain loops is refused at admission."""
    from sharepointcrawler_spark.operators.frontier import graph_expander
    from sharepointcrawler_spark.plans.crawl import CrawlConfig, run_crawl
    from sharepointcrawler_spark.plans.snapshot import SnapshotStore

    h = "https://rd.example.com"
    edges = spark.createDataFrame(
        [
            (f"{h}/lib", f"{h}/old", "folder", 0),
            (f"{h}/lib", f"{h}/l1", "folder", 1),
            (f"{h}/new", f"{h}/new/doc.pdf", "file", 0),
        ],
        "parent_url string, child_url string, kind string, sibling_idx int",
    )
    redirects = spark.createDataFrame(
        [(f"{h}/old", f"{h}/new"), (f"{h}/l1", f"{h}/l2"), (f"{h}/l2", f"{h}/l1")],
        "src string, dst string",
    )
    store = SnapshotStore(spark, str(tmp_path / "snap_rd"))
    res = run_crawl(
        spark,
        store,
        graph_expander(edges),
        seeds=[(f"{h}/lib", 0)],
        config=CrawlConfig(),
        resume=False,
        redirects_df=redirects,
    )
    seen = {r["url_canon"] for r in res.seen.collect()}
    assert f"{h}/new" in seen and f"{h}/old" not in seen
    assert f"{h}/new/doc.pdf" in seen  # the landing URL expanded
    assert f"{h}/l1" not in seen and f"{h}/l2" not in seen  # loop refused


def test_functional_graph_guards(spark):
    with pytest.raises(ValueError):
        resolve_redirects(_edges(spark, [("a", "b")]), max_hops=0)
    # null edges are ignored, not propagated
    res = _resolved(spark, [("a", "b"), (None, "c"), ("d", None)])
    assert res == {"a": ("b", 1, False)}
