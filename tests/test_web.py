"""URL canonicalization / registered-domain / per-domain cap tests
(operators/web.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from dea_coastlines_spark.operators.web import (
    canonical_url,
    cap_per_domain,
    with_url_parts,
)


CASES = [
    # (raw, canon, host, registered_domain)
    (
        "HTTPS://WWW.Example.COM:443/Path/?utm_source=x&id=3#frag",
        "https://example.com/Path?id=3",
        "example.com",
        "example.com",
    ),
    (
        "http://news.example.co.uk/a/b/",
        "http://news.example.co.uk/a/b",
        "news.example.co.uk",
        "example.co.uk",
    ),
    (
        "https://sub.blog.org?ref=home",
        "https://sub.blog.org",
        "sub.blog.org",
        "blog.org",
    ),
    ("http://example.com:80", "http://example.com", "example.com", "example.com"),
    # :443 on plain http is NOT a default port — preserved
    (
        "http://example.com:443/x",
        "http://example.com:443/x",
        "example.com",
        "example.com",
    ),
    # non-default port preserved; non-tracking params preserved in order
    (
        "https://shop.com.au:8080/p?b=2&a=1",
        "https://shop.com.au:8080/p?b=2&a=1",
        "shop.com.au",
        "shop.com.au",
    ),
    # single-label host: registered domain degrades to the host
    ("https://localhost/x", "https://localhost/x", "localhost", "localhost"),
    # every param is tracking -> '?' dropped entirely
    (
        "https://a.co.nz/?utm_source=a&utm_medium=b&fbclid=c",
        "https://a.co.nz",
        "a.co.nz",
        "a.co.nz",
    ),
    # a second '?' is legal INSIDE a query string: the query is
    # everything after the FIRST one (a last-'?' split would delete
    # the x=1 segment and collide distinct URLs)
    (
        "https://a.com/p?utm_source=f&x=1?y=2#z",
        "https://a.com/p?x=1?y=2",
        "a.com",
        "a.com",
    ),
]


def test_canon_cases_match_duckdb_oracle(spark):
    """Engine parity on the branch cases: the DuckDB replica used by
    the url_domain_caps driver oracle (_CANON_SQL) must produce the
    identical canon_url/host/registered_domain for every CASES row —
    including the second-'?' query-string case."""
    import duckdb

    from dea_coastlines_spark.plans.driver_queries import _CANON_SQL

    df = spark.createDataFrame(
        [(i, raw) for i, (raw, *_rest) in enumerate(CASES)], "i long, url string"
    )
    got = {
        r.i: (r.canon_url, r.host, r.registered_domain)
        for r in with_url_parts(df).collect()
    }
    values = ", ".join(
        "({}, '{}')".format(i, raw.replace("'", "''"))
        for i, (raw, *_rest) in enumerate(CASES)
    )
    sql = (
        f"WITH urls AS (SELECT * FROM (VALUES {values}) t(i, url)),\n"
        + _CANON_SQL
        + "\nSELECT i, canon_url, host, registered_domain FROM domains"
    )
    want = {
        int(r[0]): (r[1], r[2], r[3])
        for r in duckdb.connect().execute(sql).fetchall()
    }
    assert got == want


def test_canonicalization_branches(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, *_rest) in enumerate(CASES)], "i long, url string"
    )
    got = {r.i: r for r in with_url_parts(df).collect()}
    for i, (_raw, canon, host, dom) in enumerate(CASES):
        assert got[i].canon_url == canon, (i, got[i].canon_url)
        assert got[i].host == host, (i, got[i].host)
        assert got[i].registered_domain == dom, (i, got[i].registered_domain)


def test_canonical_url_collapses_variants(spark):
    variants = [
        "https://example.com/page?id=1",
        "HTTPS://example.com/page?id=1#top",
        "https://www.example.com/page?id=1&utm_campaign=z",
        "https://example.com:443/page?id=1",
    ]
    df = spark.createDataFrame([(u,) for u in variants], "url string")
    n = df.select(canonical_url(F.col("url")).alias("c")).distinct().count()
    assert n == 1


def _direct_cap(df, n, order_col, id_col="doc_id", domain_col="registered_domain"):
    w = Window.partitionBy(domain_col).orderBy(
        F.col(order_col).desc_nulls_last(), F.col(id_col).asc()
    )
    return df.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= n
    ).drop("_rn")


@pytest.mark.parametrize("salt", [1, 4, 16])
def test_salted_cap_matches_direct_window(spark, salt):
    # skewed: one mega-domain with 600 rows, many small ones; NULL
    # order values and order-value ties exercise the tie-break
    rows = [
        (i, "mega.com" if i < 600 else f"d{i % 37}.org",
         None if i % 13 == 0 else float(i % 11))
        for i in range(900)
    ]
    df = spark.createDataFrame(rows, "doc_id long, registered_domain string, q double")
    got = sorted(
        cap_per_domain(df, 7, order_col="q", salt=salt).collect(),
        key=lambda r: r.doc_id,
    )
    want = sorted(_direct_cap(df, 7, "q").collect(), key=lambda r: r.doc_id)
    assert got == want
    assert len(got) > 0


def test_cap_without_order_col_keeps_lowest_ids(spark):
    rows = [(i, "x.com") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, registered_domain string")
    kept = sorted(r.doc_id for r in cap_per_domain(df, 5).collect())
    assert kept == [0, 1, 2, 3, 4]


def test_cap_passes_through_null_and_empty_domains(spark):
    rows = [(i, None if i % 2 == 0 else "", float(i)) for i in range(40)]
    rows += [(100 + j, "real.com", float(j)) for j in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, registered_domain string, q double")
    kept = cap_per_domain(df, 3, order_col="q").collect()
    # all 40 domain-less rows survive; real.com capped at 3
    assert len(kept) == 43
    assert sum(1 for r in kept if r.registered_domain == "real.com") == 3


def test_cap_plan_has_no_cartesian(spark):
    rows = [(i, f"d{i % 3}.com", float(i)) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, registered_domain string, q double")
    plan = cap_per_domain(df, 2, order_col="q")._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
