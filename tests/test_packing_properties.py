"""Property-based invariants (hypothesis) for sequence packing and
the skew-proof prefix sum — randomized token-count distributions
including zeros, giants, and boundary-exact fits."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from sharepointcrawler_spark.operators.packing import (
    global_prefix_sum,
    pack_sequences,
)

_counts = st.lists(
    st.one_of(
        st.integers(min_value=0, max_value=7),
        st.integers(min_value=0, max_value=300),
        st.sampled_from([0, 64, 128, 4096]),  # boundary-exact + giant
    ),
    min_size=1,
    max_size=60,
)


def _py_pack(token_counts, L):
    out, pos = [], 0
    for doc_id, n in sorted(token_counts):
        if n <= 0:
            continue
        start, end = pos, pos + n
        for s in range(start // L, (end - 1) // L + 1):
            g0, g1 = max(start, s * L), min(end, (s + 1) * L)
            out.append((doc_id, n, s, g0 - s * L, g0 - start, g1 - start))
        pos = end
    return sorted(out)


@settings(max_examples=6, deadline=None)
@given(_counts, st.sampled_from([1, 7, 64, 128]))
def test_pack_matches_reference_and_tiles_exactly(spark, counts, L):
    rows = list(enumerate(counts))
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = sorted(map(tuple, pack_sequences(df, L).collect()))
    assert got == _py_pack(rows, L)
    # global invariants: spans tile [0, total) without gap or overlap
    total = sum(c for c in counts if c > 0)
    assert sum(r[5] - r[4] for r in got) == total
    by_seq = {}
    for _, _, s, off, a, b in got:
        by_seq.setdefault(s, []).append((off, off + (b - a)))
    for s, spans in by_seq.items():
        spans.sort()
        expect_end = L if (s + 1) * L <= total else total - s * L
        assert spans[0][0] == 0 and spans[-1][1] == expect_end
        for (a0, a1), (b0, b1) in zip(spans, spans[1:]):
            assert a1 == b0  # adjacent, no gap/overlap inside a sequence


@settings(max_examples=6, deadline=None)
@given(_counts, st.integers(min_value=1, max_value=9))
def test_prefix_sum_partition_invariant(spark, counts, nparts):
    rows = list(enumerate(counts))
    df = spark.createDataFrame(rows, "doc_id long, v long").repartition(nparts)
    got = {
        r["doc_id"]: r["ps"]
        for r in global_prefix_sum(df, "doc_id", "v", out_col="ps").collect()
    }
    acc, want = 0, {}
    for i, v in rows:
        acc += v
        want[i] = acc
    assert got == want
