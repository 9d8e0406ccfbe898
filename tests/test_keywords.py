"""Integer TF-IDF keywords (operators/keywords.py): python reference
simulation, rarity beats frequency, tie-breaks, empty docs."""

from __future__ import annotations

import re

from sharepointcrawler_spark.operators.keywords import tfidf_keywords


def _py_tfidf(rows, k=3, min_len=2):
    docs = {
        i: [t for t in re.sub(r"[^a-z0-9]+", " ", t.lower()).strip().split()
            if len(t) >= min_len]
        for i, t in rows
    }
    n = len(rows)
    df = {}
    for toks in docs.values():
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
    out = []
    for i, toks in docs.items():
        tf = {}
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        scored = sorted(
            (
                (t, c, c * (((n * 1024) // df[t]).bit_length() - 1))
                for t, c in tf.items()
            ),
            key=lambda x: (-x[2], x[0]),
        )
        for r, (t, c, s) in enumerate(scored[:k], 1):
            out.append((i, r, t, c, s))
    return sorted(out)


def test_matches_python_reference(spark):
    rows = [
        (i, f"common words everywhere plus special{i % 4} token and rare{i} gem")
        for i in range(12)
    ]
    got = sorted(
        map(tuple, tfidf_keywords(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect())
    )
    assert got == _py_tfidf(rows)


def test_rare_term_outranks_frequent_common(spark):
    rows = [(i, "shared shared shared unique" + str(i)) for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    top = {r["doc_id"]: r["term"] for r in tfidf_keywords(df, k=1).collect()}
    # 'shared' has tf 3 but df 8 (idf bits = floor(log2(1024)) = 10);
    # unique{i} has tf 1, df 1 (bits = floor(log2(8*1024)) = 13);
    # 3*10 > 1*13 -> frequency wins here; flip with a longer doc set
    assert all(t == "shared" for t in top.values())
    rows2 = [(i, "shared uniq" + str(i) + " uniq" + str(i)) for i in range(8)]
    top2 = {
        r["doc_id"]: r["term"]
        for r in tfidf_keywords(
            spark.createDataFrame(rows2, "doc_id long, text string"), k=1
        ).collect()
    }
    # 2*13 > 1*10 -> the rare term wins
    assert all(t.startswith("uniq") for t in top2.values())


def test_empty_and_short_docs(spark):
    df = spark.createDataFrame(
        [(1, "real words here"), (2, "   "), (3, "a b c")],
        "doc_id long, text string",
    )
    got = {r["doc_id"] for r in tfidf_keywords(df).collect()}
    assert got == {1}  # doc 2 empty; doc 3 all tokens under min length


def test_inverted_index_delta_postings(spark):
    from sharepointcrawler_spark.operators.keywords import inverted_index

    rows = [(10, "alpha beta"), (13, "alpha gamma"), (99, "alpha")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["term"]: r for r in inverted_index(df).collect()}
    assert got["alpha"]["postings"] == [10, 3, 86]  # 10, 13, 99 deltas
    assert got["alpha"]["df"] == 3 and got["alpha"]["total_tf"] == 3
    assert got["beta"]["postings"] == [10]
    assert got["gamma"]["postings"] == [13]
    # reconstruction: cumulative sum restores the sorted ids
    acc, ids = 0, []
    for d in got["alpha"]["postings"]:
        acc += d; ids.append(acc)
    assert ids == [10, 13, 99]
