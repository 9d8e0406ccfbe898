"""Local replica of the driver's correctness gate: run every
``queries()`` entry AND its ``oracle_sql()`` on the same parquet tables,
compare row-count, column names, and order-insensitive values.

sf0.001 for speed in the default run; the driver uses sf0.01 (covered
by the slow marker / bench pre-check)."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _duck(sql: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con.execute(sql).fetchdf()


def _normalize_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6f}"
    return str(v)


def _canon(df_pandas):
    cols = sorted(df_pandas.columns)
    rows = [
        tuple(_normalize_cell(r[c]) for c in cols)
        for _, r in df_pandas[cols].iterrows()
    ]
    return cols, sorted(rows)


ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_query_matches_oracle(spark, name):
    spark_df = QUERIES[name](spark, SF_DIR).toPandas()
    duck_df = _duck(ORACLES[name])
    s_cols, s_rows = _canon(spark_df)
    d_cols, d_rows = _canon(duck_df)
    assert s_cols == d_cols, f"{name}: column names differ: {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    if s_rows != d_rows:
        diffs = [
            (a, b) for a, b in zip(s_rows, d_rows) if a != b
        ][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
