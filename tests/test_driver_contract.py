"""Replicates the driver's correctness gate locally: run every
__spark_entry__.queries() entry at sf0.01 and compare against its
oracle_sql() via DuckDB — row count, column names, and order-insensitive
values (normalized comparison on sorted rows)."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # Keep the float marker: the driver's value hash is
        # type-sensitive, so int64 3549 vs float64 3549.0 must FAIL
        # here too (round-1 token_stats lesson).
        return f"f:{v:.9g}"
    if isinstance(v, int):
        return str(v)
    return str(v)


def _normalize(df_pandas):
    cols = sorted(df_pandas.columns)
    rows = [
        tuple(_norm(r[c]) for c in cols)
        for _, r in df_pandas[cols].iterrows()
    ]
    return cols, sorted(rows)


ORACLE_KEYS = sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(spark, oracle_con, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    got = q(spark, SF_DIR).toPandas()
    want = oracle_con.execute(sql).df()
    gc, gr = _normalize(got)
    wc, wr = _normalize(want)
    assert gc == wc, f"{name}: column mismatch {gc} vs {wc}"
    assert len(gr) == len(wr), f"{name}: row count {len(gr)} vs {len(wr)}"
    mismatches = [i for i, (a, b) in enumerate(zip(gr, wr)) if a != b]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatched rows; first: "
        f"{gr[mismatches[0]]} vs {wr[mismatches[0]]}"
    )


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.limit(2000).collect()
    assert len(rows) > 0
    assert "geometry_wkb_hex" in df.columns


def test_all_queries_have_query_fn():
    q = entrymod.queries()
    for name in entrymod.oracle_sql():
        assert name in q


ROWS_ONLY = sorted(set(entrymod.queries()) - set(entrymod.oracle_sql()))


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run_and_are_deterministic(spark, name):
    """Queries without a SQL oracle (raster->vector, LSH, multimodal,
    pipeline stages) must still run and produce a stable row count +
    schema across invocations (the driver's weaker rows-only check)."""
    q = entrymod.queries()[name]
    a = q(spark, SF_DIR)
    b = q(spark, SF_DIR)
    ca, cb = a.count(), b.count()
    assert ca > 0
    assert ca == cb
    assert a.columns == b.columns
