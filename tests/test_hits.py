"""Integer-scaled HITS (operators/ranking.py hits): python-reference
simulation, hub/authority separation on a bipartite-ish graph,
determinism across parallelism, lineage hygiene."""

from __future__ import annotations

import pyspark.sql.functions as F

from sharepointcrawler_spark.operators.ranking import HITS_SCALE, hits


def _py_hits(edges, n_iters=4, scale=HITS_SCALE):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    h = {n: scale for n in nodes}
    a = {}
    for _ in range(n_iters):
        a_raw = {n: 0 for n in nodes}
        for u, v in edges:
            a_raw[v] += h[u]
        mx = max(max(a_raw.values()), 1)
        a = {n: (r * scale) // mx for n, r in a_raw.items()}
        h_raw = {n: 0 for n in nodes}
        for u, v in edges:
            h_raw[u] += a[v]
        mx = max(max(h_raw.values()), 1)
        h = {n: (r * scale) // mx for n, r in h_raw.items()}
    return {n: (h[n], a[n]) for n in nodes}


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["node"]: (r["hub"], r["authority"])
        for r in hits(df, **kw).collect()
    }


def test_matches_python_reference(spark):
    # tangled graph: hubs 0..4 point at authorities 10..14 with skewed
    # fan-out, plus some authority->hub backlinks and a self-contained pair
    edges = []
    for u in range(5):
        for v in range(10, 10 + 1 + (u * 3) % 5):
            edges.append((u, v))
    edges += [(10, 0), (11, 0), (12, 1), (20, 21)]
    assert _run(spark, edges) == _py_hits(edges)


def test_hub_authority_separation(spark):
    # star: node 0 links to 1..9 -> 0 is the max hub, 1..9 tie as authorities
    edges = [(0, v) for v in range(1, 10)]
    got = _run(spark, edges)
    assert got[0] == (HITS_SCALE, 0)
    for v in range(1, 10):
        assert got[v] == (0, HITS_SCALE)


def test_parallelism_invariance(spark):
    edges = [(i % 7, (i * 3) % 11 + 7) for i in range(40)]
    base = _run(spark, edges)
    reparted = {
        r["node"]: (r["hub"], r["authority"])
        for r in hits(
            spark.createDataFrame(edges, "src long, dst long").repartition(17)
        ).collect()
    }
    assert base == reparted


def test_final_plan_reads_checkpoints_only(spark):
    edges = [(0, 1), (1, 2), (2, 0)]
    df = hits(spark.createDataFrame(edges, "src long, dst long"), n_iters=2)
    plan = df._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]
    # iterates were materialized: no shuffle tree replay in the final plan
    assert plan.count("Exchange") <= 3
