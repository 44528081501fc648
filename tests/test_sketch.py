"""HyperLogLog + Count-Min sketch properties beyond the driver oracle:
error bounds, mergeability (the property that makes a sketch usable as
distributed aggregation state), and the CMS no-underestimate guarantee
under forced collisions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dea_coastlines_spark.operators import sketch

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_hll_error_within_bound(spark, events):
    """Relative error vs exact distinct within 5 standard errors
    (1.04/sqrt(m)); deterministic hashing makes this a fixed number,
    not a flaky statistical assertion."""
    est = {
        r["event_type"]: r["estimate"]
        for r in sketch.hll_distinct(events, "user_id", ["event_type"]).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    bound = 5 * 1.04 / (1 << 10) ** 0.5
    for k, n in exact.items():
        assert abs(est[k] - n) / n <= bound, (k, est[k], n)


def test_hll_registers_merge_equals_union(spark, events):
    """max-merging the register tables of two disjoint shards yields
    exactly the union's register table — the mergeable-state contract
    that lets 1000 executors each sketch their shard and combine."""
    a = events.filter(F.col("event_id") % 2 == 0)
    b = events.filter(F.col("event_id") % 2 == 1)
    merged = (
        sketch.hll_registers(a, "user_id", ["event_type"])
        .unionByName(sketch.hll_registers(b, "user_id", ["event_type"]))
        .groupBy("event_type", "bucket")
        .agg(F.max("rho").alias("rho"))
    )
    whole = sketch.hll_registers(events, "user_id", ["event_type"])
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_hll_small_range_correction(spark):
    """A 3-distinct-key input lands in the linear-counting regime and
    must return (to 4 dp) m*ln(m/(m-3)), not the raw harmonic estimate."""
    import math

    df = spark.createDataFrame(
        [(i % 3, "g") for i in range(50)], "user_id long, grp string"
    )
    est = sketch.hll_distinct(df, "user_id", ["grp"]).collect()[0]["estimate"]
    m = 1 << 10
    assert est == round(m * math.log(m / (m - 3)), 4)
    assert abs(est - 3) < 0.01


def test_cms_never_underestimates(spark, docs):
    """Defining CMS property: estimate >= exact for every probed token,
    even with width forced small enough to collide heavily."""
    out = sketch.cms_heavy_hitters(docs, "text", k=30, depth=2, width=64).collect()
    assert len(out) == 30
    assert all(r["cms_count"] >= r["exact_count"] for r in out)
    assert all(r["overcount"] == r["cms_count"] - r["exact_count"] for r in out)
    # with 64 buckets and a corpus vocabulary >> 64, collisions are
    # guaranteed: at least one probe must actually overcount, which
    # proves the estimate is read from the folded grid, not echoed
    assert any(r["overcount"] > 0 for r in out)


def test_cms_width_must_be_power_of_two(spark, docs):
    with pytest.raises(ValueError):
        sketch.cms_heavy_hitters(docs, "text", width=1000)


def test_hll_plan_shape(spark, events):
    """The sketch aggregations must partial-aggregate map-side: the
    executed plan carries HashAggregate (partial+final) and exactly one
    Python stage (the bucket/rho kernel)."""
    df = sketch.hll_distinct(events, "user_id", ["event_type"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") + plan.count("MapInPandas") == 1
    assert "HashAggregate" in plan


def test_streaming_hll_converges_to_batch(spark, events, tmp_path):
    """4-micro-batch stream over a 4-file split of events: the register
    store and the estimates must equal the batch sketch exactly —
    merge-invariance of HLL state, end to end through foreachBatch."""
    from dea_coastlines_spark.streaming.sketch_stream import (
        read_estimates,
        start_hll_stream,
    )

    src = str(tmp_path / "src")
    events.repartitionByRange(4, "event_id").write.parquet(src)
    store = str(tmp_path / "store")
    q = start_hll_stream(spark, src, store, str(tmp_path / "ckpt"), p=10)
    q.awaitTermination(300)
    got = read_estimates(spark, store, p=10)
    want = sketch.hll_distinct(events, "user_id", ["event_type"], p=10)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_streaming_hll_replay_idempotent(spark, events, tmp_path):
    """At-least-once safety: re-merging an already-applied batch leaves
    the store unchanged (max is idempotent), so a replayed micro-batch
    after a crash cannot corrupt the sketch."""
    from dea_coastlines_spark.streaming.sketch_stream import _merge_registers

    store = str(tmp_path / "store2")
    regs = sketch.hll_registers(events, "user_id", ["event_type"], p=10)
    _merge_registers(store, regs).write.parquet(store)
    once = spark.read.parquet(store)
    again = _merge_registers(store, regs)  # same batch re-applied
    assert again.exceptAll(once).count() == 0
    assert once.exceptAll(again).count() == 0


def test_hll_rejects_non_integral_non_string_key(spark):
    df = spark.createDataFrame([(1.5, "g")], "k double, grp string")
    with pytest.raises(ValueError, match="integral or string"):
        sketch.hll_registers(df, "k", ["grp"])
    with pytest.raises(ValueError, match="no column"):
        sketch.hll_registers(df, "nope", ["grp"])


def test_hll_string_keys_match_duckdb_replica(spark, docs):
    """String keys pre-fold through FNV-1a before splitmix; the DuckDB
    replica (hll_sql key_kind='string') must agree bit-for-bit on the
    estimates — same gate discipline as the integral driver query."""
    import duckdb

    got = {
        r["lang"]: (r["n_registers"], r["estimate"])
        for r in sketch.hll_distinct(
            docs.withColumn("doc_id_str", F.col("doc_id").cast("string")),
            "doc_id_str", ["lang"], p=8,
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT *, CAST(doc_id AS VARCHAR) "
        f"AS doc_id_str FROM read_parquet('{SF}/documents.parquet')"
    )
    sql = sketch.hll_sql(
        "documents", "doc_id_str", ["lang"], p=8, key_kind="string"
    )
    want = {
        r[0]: (r[1], r[2]) for r in con.execute(sql).fetchall()
    }
    assert got == want
