"""Salted-key skew handling: selective salting, two-phase aggregation
equality with the unsalted plan, deterministic salts, and actual
partition balancing of a hot key."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dea_coastlines_spark.operators import skew


@pytest.fixture()
def skewed(spark):
    """One pathologically hot cell (9k rows) + 50 cold cells (20 each)."""
    hot = spark.range(9000).select(
        F.lit(7).alias("cell"), F.col("id"), (F.col("id") % 13).cast("double").alias("v")
    )
    cold = spark.range(1000).select(
        (F.col("id") % 50 + 100).alias("cell"), (F.col("id") + 100000).alias("id"),
        F.lit(1.0).alias("v"),
    )
    return hot.unionByName(cold)


def test_hot_keys_selective(spark, skewed):
    hk = skew.hot_keys(skewed, ["cell"], target_rows_per_task=1000).collect()
    assert len(hk) == 1
    assert hk[0].cell == 7 and hk[0]._salt_factor == 9


def test_salted_agg_equals_unsalted(spark, skewed):
    got = (
        skew.salted_counts_sums(skewed, ["cell"], "id", ["v"], target_rows_per_task=1000)
        .orderBy("cell")
        .collect()
    )
    want = (
        skewed.groupBy("cell")
        .agg(F.count("*").alias("n"), F.sum("v").alias("sum_v"))
        .orderBy("cell")
        .collect()
    )
    assert [(r.cell, r.n, r.sum_v) for r in got] == [
        (r.cell, r.n, r.sum_v) for r in want
    ]


def test_salt_is_deterministic_and_spreads(spark, skewed):
    s1 = skew.with_salt(skewed, ["cell"], "id", 1000)
    s2 = skew.with_salt(skewed, ["cell"], "id", 1000)
    a = {(r.cell, r.id): r._salt for r in s1.collect()}
    b = {(r.cell, r.id): r._salt for r in s2.collect()}
    assert a == b  # same input -> same salts (N-vs-4N parity)
    # the hot key's rows spread over its 9 salt buckets, cold keys salt=0
    hot_salts = {s for (c, _), s in a.items() if c == 7}
    assert len(hot_salts) == 9
    assert {s for (c, _), s in a.items() if c != 7} == {0}
    # buckets are roughly balanced (hash uniformity): max <= 2x min
    from collections import Counter

    sizes = Counter(s for (c, _), s in a.items() if c == 7)
    assert max(sizes.values()) <= 2 * min(sizes.values())


def test_salted_repartition_splits_hot_cell(spark, skewed):
    rep = skew.salted_repartition(skewed, ["cell"], "id", 1000, num_partitions=16)
    # count rows of the hot cell per physical partition
    import pandas as pd

    def tag(batches):
        import os  # noqa: F401 — partition id comes from TaskContext

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        for pdf in batches:
            hot_rows = int((pdf["cell"] == 7).sum())
            yield pd.DataFrame({"pid": [pid], "hot": [hot_rows]})

    per_part = (
        rep.mapInPandas(tag, "pid int, hot int")
        .groupBy("pid").agg(F.sum("hot").alias("hot"))
        .filter(F.col("hot") > 0)
        .collect()
    )
    # an unsalted repartition by cell would put all 9000 hot rows in ONE
    # partition; salted must use several
    assert len(per_part) >= 4
    assert max(r.hot for r in per_part) < 9000


def test_null_key_group_gets_salted(spark):
    """A hot NULL-key group must receive salt too: the factor join is
    null-safe (a plain equi join would leave every null-key row at
    salt 0 on one task)."""
    import pandas as pd

    from dea_coastlines_spark.operators import skew

    pdf = pd.DataFrame(
        {
            "cell": [None] * 5000 + [1] * 10,
            "id": list(range(5010)),
            "v": [1.0] * 5010,
        }
    )
    df = spark.createDataFrame(pdf)
    salted = skew.with_salt(df, ["cell"], "id", target_rows_per_task=1000)
    null_salts = {
        r._salt for r in salted.filter(F.col("cell").isNull()).select("_salt").distinct().collect()
    }
    assert len(null_salts) > 1  # hot null group spread over salt buckets
    out = skew.salted_counts_sums(df, ["cell"], "id", ["v"], target_rows_per_task=1000)
    rows = {tuple(r)[:1][0]: (r.n, r.sum_v) for r in out.collect()}
    assert rows[None] == (5000, 5000.0) and rows[1] == (10, 10.0)
