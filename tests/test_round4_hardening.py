"""Round-4 scale hardening (VERDICT r3 'top next' + ADVICE items).

1. near_dup_components is cluster-DURABLE with ``checkpoint_dir``: a job
   killed mid-propagation resumes from the last committed iteration
   table and reaches an identical fixpoint; superseded label tables are
   deleted; the non-durable path frees superseded localCheckpoint blocks
   instead of retaining one RDD per iteration.
2. Span dedup is single-pass: ONE explode (Generate) feeding a window
   count over h — no self-join re-running the explode.
3. jaccard_pairs skips the candidate count probe entirely when the
   broadcast gate is disabled (no eager action that cannot change the
   plan).
4. The ANN query-side broadcast is probe-gated like the candidate
   tables: small batch -> hint; oversized -> shuffle path; gate off ->
   no probe.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from sharepointcrawler_spark.operators import corpus as corpus_mod
from sharepointcrawler_spark.operators.corpus import (
    duplicated_window_stats,
    jaccard_pairs,
    near_dup_components,
)
from sharepointcrawler_spark.operators.similarity import (
    brute_force_topk,
    lsh_topk_multiband,
)


# ------------------------------------ 1. durable connected components


def _chain_fixture(spark, n=8):
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(n)], "doc_id long, text string"
    )
    # one long chain (needs ~n iterations: true propagation) + isolated node
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 2)], "id_a long, id_b long"
    )
    return docs, pairs


def test_near_dup_components_durable_matches_memory_path(spark, tmp_path):
    docs, pairs = _chain_fixture(spark)
    mem = {r.doc_id: r.cluster_id for r in near_dup_components(docs, pairs).collect()}
    dur = {
        r.doc_id: r.cluster_id
        for r in near_dup_components(
            docs, pairs, checkpoint_dir=str(tmp_path / "cc")
        ).collect()
    }
    assert dur == mem
    # storage bound: superseded label tables deleted (at most the last
    # two iterations + edges + state remain)
    label_dirs = [d for d in os.listdir(tmp_path / "cc") if d.startswith("labels-")]
    assert len(label_dirs) <= 2


def test_near_dup_components_kill_resume_mid_propagation(spark, tmp_path, monkeypatch):
    """Kill the job right after iteration 2 commits; a fresh call with the
    same checkpoint_dir must resume FROM iteration 2 (never recompute
    1-2) and converge to the same fixpoint as an uninterrupted run."""
    docs, pairs = _chain_fixture(spark)
    ckpt = str(tmp_path / "cc")
    expected = {r.doc_id: r.cluster_id for r in near_dup_components(docs, pairs).collect()}

    orig_write_state = corpus_mod._cc_write_state

    def killing_write_state(checkpoint_dir, state):
        orig_write_state(checkpoint_dir, state)  # the commit lands first
        if state["iter"] == 2:
            raise RuntimeError("simulated executor-storm kill")

    monkeypatch.setattr(corpus_mod, "_cc_write_state", killing_write_state)
    with pytest.raises(RuntimeError, match="simulated"):
        near_dup_components(docs, pairs, checkpoint_dir=ckpt)
    monkeypatch.setattr(corpus_mod, "_cc_write_state", orig_write_state)

    with open(corpus_mod._cc_state_path(ckpt)) as f:
        assert json.load(f) == {"iter": 2, "converged": False}

    # resume must not recompute committed iterations: iteration dirs < 2
    # may be garbage-collected but labels-0002 must be read, not rebuilt.
    # Track parquet WRITES to assert the resumed run starts at iter 3.
    written = []
    from pyspark.sql.readwriter import DataFrameWriter

    orig_parquet = DataFrameWriter.parquet

    def tracking_parquet(self, path, *a, **kw):
        written.append(os.path.basename(path.rstrip("/")))
        return orig_parquet(self, path, *a, **kw)

    monkeypatch.setattr(DataFrameWriter, "parquet", tracking_parquet)
    resumed = {
        r.doc_id: r.cluster_id
        for r in near_dup_components(docs, pairs, checkpoint_dir=ckpt).collect()
    }
    assert resumed == expected
    label_writes = [w for w in written if w.startswith("labels-")]
    assert label_writes and min(label_writes) >= "labels-0003", label_writes

    # converged state is terminal: a third call is pure read-back
    written.clear()
    again = {
        r.doc_id: r.cluster_id
        for r in near_dup_components(docs, pairs, checkpoint_dir=ckpt).collect()
    }
    assert again == expected and written == []


def test_near_dup_components_frees_superseded_checkpoints(spark):
    """The in-memory path must hold at most edges + two label RDDs at any
    moment and leave only the FINAL labels cached on return."""
    sc = spark.sparkContext
    docs, pairs = _chain_fixture(spark)

    def cached_ids():
        return {
            i.id()
            for i in sc._jsc.sc().getRDDStorageInfo()
            if i.numCachedPartitions() > 0
        }

    before = cached_ids()
    labels = near_dup_components(docs, pairs)
    labels.collect()
    leaked = cached_ids() - before
    # exactly the final labels RDD may remain (edges + superseded freed)
    assert len(leaked) <= 1, f"retained checkpoint RDDs: {leaked}"
    corpus_mod._free_local_checkpoint(labels)


# ------------------------------------------ 2. single-pass span dedup


def test_span_dedup_single_generate_no_join(spark):
    docs = spark.createDataFrame(
        [(i, f"some repeated boilerplate text body number {i % 3} padded out "
             "to exceed the window length comfortably") for i in range(30)],
        "doc_id long, text string",
    )
    stats = duplicated_window_stats(docs, 30)
    stats.collect()
    plan = stats._jdf.queryExecution().executedPlan().toString()
    # AQE's toString prints Final + Initial sections: assert on the final
    plan = plan.split("== Initial Plan ==")[0]
    assert plan.count("Generate") == 1, "explode ran more than once"
    for join in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin"):
        assert join not in plan, f"unexpected {join} in span-dedup plan"


# ------------------------------- 3. probe skipped when gate disabled


def test_jaccard_probe_skipped_when_gate_disabled(spark, monkeypatch):
    docs = spark.createDataFrame(
        [(i, f"words shared across documents plus token w{i} here") for i in range(6)],
        "doc_id long, text string",
    )
    cands = spark.createDataFrame(
        [(0, 1), (2, 3)], "id_a long, id_b long"
    )
    DataFrame = type(docs)
    calls = {"count": 0}
    orig_count = DataFrame.count

    def counting_count(self):
        calls["count"] += 1
        return orig_count(self)

    monkeypatch.setattr(DataFrame, "count", counting_count)
    # gate disabled (None / 0): plan building must run ZERO driver actions
    jaccard_pairs(docs, candidates=cands, broadcast_candidate_limit=None)
    jaccard_pairs(docs, candidates=cands, broadcast_candidate_limit=0)
    assert calls["count"] == 0
    # gate on: exactly one probe
    jaccard_pairs(docs, candidates=cands, broadcast_candidate_limit=100)
    assert calls["count"] == 1


# --------------------------------------- 4. ANN query broadcast gate


@pytest.fixture()
def tiny_vectors(spark):
    dim = 8
    rows = [(i, [float((i * 7 + j * 3) % 5 - 2) for j in range(dim)]) for i in range(40)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = spark.createDataFrame(
        [(100 + i, rows[i][1]) for i in range(3)], "query_id long, query_vec array<float>"
    )
    return corpus, queries, dim


def test_ann_query_broadcast_probe_gated(spark, tiny_vectors):
    corpus, queries, dim = tiny_vectors
    small = brute_force_topk(corpus, queries, k=2)
    assert "ResolvedHint" in small._jdf.queryExecution().analyzed().toString()
    # 3 queries > limit 1 -> probe says big -> no hint
    big = brute_force_topk(corpus, queries, k=2, broadcast_query_limit=1)
    assert "ResolvedHint" not in big._jdf.queryExecution().analyzed().toString()
    key = lambda df: sorted((r.query_id, r.rank, r.vec_id) for r in df.collect())
    assert key(small) == key(big)

    mb_small = lsh_topk_multiband(corpus, queries, k=2, dim=dim, n_planes=4)
    assert "ResolvedHint" in mb_small._jdf.queryExecution().analyzed().toString()
    mb_big = lsh_topk_multiband(
        corpus, queries, k=2, dim=dim, n_planes=4, broadcast_query_limit=1
    )
    assert "ResolvedHint" not in mb_big._jdf.queryExecution().analyzed().toString()


def test_ann_query_probe_skipped_when_disabled_or_known(spark, tiny_vectors, monkeypatch):
    corpus, queries, dim = tiny_vectors
    DataFrame = type(corpus)
    calls = {"count": 0}
    orig_count = DataFrame.count

    def counting_count(self):
        calls["count"] += 1
        return orig_count(self)

    monkeypatch.setattr(DataFrame, "count", counting_count)
    brute_force_topk(corpus, queries, k=2, broadcast_query_limit=0)
    brute_force_topk(corpus, queries, k=2, n_queries=3)
    assert calls["count"] == 0
    brute_force_topk(corpus, queries, k=2)
    assert calls["count"] == 1


# ------------------------------------------- 5. seen-set compaction


def test_seen_set_compacts_with_frontier(spark, tmp_path):
    """The seen set is merge-on-read like the frontier: per-wave deltas,
    a base rewrite on the compact_every cadence (manifest's seen_deltas
    resets), and the merged view always equals the union of every
    per-wave seen table — so wave-read IO is O(waves since compaction),
    not O(crawl history)."""
    from sharepointcrawler_spark.operators.frontier import graph_expander
    from sharepointcrawler_spark.plans.crawl import CrawlConfig, run_crawl
    from sharepointcrawler_spark.plans.snapshot import SnapshotStore
    from sharepointcrawler_spark.sources import sitegraph as sg

    root = sg.balanced_tree(depth=3, files_per_folder=3, folders_per_folder=2)
    edges = spark.createDataFrame(
        sg.edges_from_tree(root),
        "parent_url string, child_url string, kind string, sibling_idx int",
    )
    store = SnapshotStore(spark, str(tmp_path / "snap"))
    res = run_crawl(
        spark, store, graph_expander(edges), seeds=[(root.url, 0)],
        config=CrawlConfig(compact_every=2), resume=False,
    )
    last = store.latest_wave()
    for w in range(1, last + 1):
        m = store.manifest(w)
        assert "seen_base" in m["tables"]
        n_deltas = len(m["tables"]["seen_deltas"])
        if m["stats"].get("compacted"):
            assert n_deltas == 0, f"wave {w}: deltas not retired at compaction"
        else:
            assert n_deltas <= 2  # bounded by the cadence, not the history
    merged = {r.url_key for r in res.seen.collect()}
    appended = {r.url_key for r in store.read_appended("seen", last).collect()}
    assert merged == appended


# --------------------------------------- 6. per-partition lineage


def test_per_partition_lineage_recorded(spark, tmp_path):
    """Every wave's snapshot carries a lineage table of per-PARTITION
    delta row counts (north_rule 'per-partition lineage + metrics'),
    derived from the same single stats job — and the lineage sums must
    equal the per-wave delta_rows metrics exactly."""
    from sharepointcrawler_spark.operators.frontier import graph_expander
    from sharepointcrawler_spark.plans.crawl import CrawlConfig, run_crawl
    from sharepointcrawler_spark.plans.snapshot import SnapshotStore
    from sharepointcrawler_spark.sources import sitegraph as sg

    root = sg.balanced_tree(depth=3, files_per_folder=3, folders_per_folder=2)
    edges = spark.createDataFrame(
        sg.edges_from_tree(root),
        "parent_url string, child_url string, kind string, sibling_idx int",
    )
    store = SnapshotStore(spark, str(tmp_path / "snap"))
    res = run_crawl(
        spark, store, graph_expander(edges), seeds=[(root.url, 0)],
        config=CrawlConfig(), resume=False,
    )
    lineage = store.read_appended("lineage", res.waves)
    assert lineage is not None
    per_wave = {
        r.wave: r.total
        for r in lineage.groupBy("wave").agg(
            __import__("pyspark").sql.functions.sum("rows").alias("total")
        ).collect()
    }
    for m in res.metrics:
        if m["delta_rows"]:
            assert per_wave[m["wave"]] == m["delta_rows"]
    # partition ids are genuine (>= 1 partition, non-negative ids)
    assert lineage.filter("partition_id < 0").count() == 0


# ----------------------------- 7. two-phase connected components


def test_twophase_components_matches_propagation(spark):
    """large-star/small-star must reach the identical fixpoint as
    min-label propagation on chains, triangles, isolated nodes, and a
    64-node chain — where two-phase converges in O(log n) rounds while
    propagation needs O(n) (the chain is the adversarial case the
    two-phase algorithm exists for)."""
    from sharepointcrawler_spark.operators.corpus import (
        near_dup_components,
        near_dup_components_twophase,
    )

    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(7)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (4, 5), (5, 6), (4, 6)], "id_a long, id_b long"
    )
    got = {r.doc_id: r.cluster_id for r in near_dup_components_twophase(docs, pairs).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 4, 6: 4}

    # 64-chain: propagation with max_iters=8 CANNOT converge (needs ~63
    # rounds); two-phase with the same budget must (O(log n))
    n = 64
    chain_docs = spark.createDataFrame(
        [(i, "t") for i in range(n)], "doc_id long, text string"
    )
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        near_dup_components(chain_docs, chain, max_iters=8)
    tp = {
        r.doc_id: r.cluster_id
        for r in near_dup_components_twophase(chain_docs, chain, max_iters=8).collect()
    }
    assert tp == {i: 0 for i in range(n)}

    # random graphs: fixpoints agree with propagation
    import random as _random

    rng = _random.Random(7)
    nodes = list(range(30))
    edges = [(a, b) for a in nodes for b in nodes if a < b and rng.random() < 0.06]
    rdocs = spark.createDataFrame([(i, "t") for i in nodes], "doc_id long, text string")
    rpairs = spark.createDataFrame(edges or [(0, 1)], "id_a long, id_b long")
    prop = {r.doc_id: r.cluster_id for r in near_dup_components(rdocs, rpairs).collect()}
    two = {
        r.doc_id: r.cluster_id
        for r in near_dup_components_twophase(rdocs, rpairs).collect()
    }
    assert prop == two
