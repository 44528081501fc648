"""Bloom-filter screening tests (operators/bloom.py): exactness
(no-false-negative end-to-end), broadcast vs distributed probe parity,
false-positive rate vs theory, and plan shape."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dea_coastlines_spark.operators import bloom as bloom_mod
from dea_coastlines_spark.operators.bloom import bloom_screen, build_bloom


def _seen_inc(spark):
    # string keys with overlap: seen = multiples of 3, incoming = 0..499
    seen = spark.range(0, 1500).select(
        F.concat(F.lit("k"), ((F.col("id") * 3) % 900).cast("string")).alias("key")
    )
    inc = spark.range(0, 500).select(
        F.concat(F.lit("k"), F.col("id").alias("id").cast("string")).alias("key"),
        (F.col("id") * 2).alias("payload"),
    )
    return seen, inc


def test_screen_is_exact_anti_join(spark):
    seen, inc = _seen_inc(spark)
    got = sorted(r.key for r in bloom_screen(inc, seen, "key", num_bits=1 << 14).collect())
    want = sorted(
        r.key for r in inc.join(seen.distinct(), "key", "left_anti").collect()
    )
    assert got == want
    assert 0 < len(got) < 500  # both outcomes exercised


def test_tiny_filter_stays_exact(spark):
    # pathologically small filter: every probe is bloom-positive, the
    # confirm join must still produce the exact anti-join answer
    seen, inc = _seen_inc(spark)
    got = sorted(r.key for r in bloom_screen(inc, seen, "key", num_bits=64).collect())
    want = sorted(
        r.key for r in inc.join(seen.distinct(), "key", "left_anti").collect()
    )
    assert got == want


def test_shuffled_confirm_matches_broadcast_confirm(spark):
    seen, inc = _seen_inc(spark)
    a = sorted(
        r.key
        for r in bloom_screen(
            inc, seen, "key", num_bits=1 << 14, broadcast_positives=True
        ).collect()
    )
    b = sorted(
        r.key
        for r in bloom_screen(
            inc, seen, "key", num_bits=1 << 14, broadcast_positives=False
        ).collect()
    )
    assert a == b


def test_distributed_probe_matches_broadcast(spark, monkeypatch):
    seen, inc = _seen_inc(spark)
    a = sorted(r.key for r in bloom_screen(inc, seen, "key", num_bits=1 << 14).collect())
    monkeypatch.setattr(bloom_mod, "BROADCAST_BITS_MAX", 0)
    b = sorted(r.key for r in bloom_screen(inc, seen, "key", num_bits=1 << 14).collect())
    assert a == b


def test_payload_columns_survive(spark):
    seen, inc = _seen_inc(spark)
    out = bloom_screen(inc, seen, "key", num_bits=1 << 14)
    assert set(out.columns) == {"key", "payload"}
    row = out.filter(F.col("key") == "k1").collect()
    assert len(row) == 1 and row[0].payload == 2


def test_no_false_negatives_and_fp_rate(spark):
    # build over n keys, probe disjoint keys; members must ALL hit,
    # non-member hit rate ~ (1 - e^{-kn/m})^k
    n, m, k = 2000, 1 << 15, 5
    seen = spark.range(0, n).select(F.concat(F.lit("s"), F.col("id").cast("string")).alias("key"))
    bloom = build_bloom(seen, "key", num_bits=m, num_hashes=k)
    words = {r.word_idx: r.word for r in bloom.collect()}

    import numpy as np

    def member(key_hashes):
        return all(
            words.get(p // 64, 0) & (1 << (p % 64)) for p in key_hashes
        )

    # recompute positions via Spark to use the same xxhash64
    probe = spark.range(0, 3000).select(
        F.concat(F.lit("s"), F.col("id").cast("string")).alias("key")
    )
    pos = (
        probe.select(
            "key",
            F.array(*[F.pmod(F.xxhash64("key", F.lit(i)), F.lit(m)) for i in range(k)]).alias("ps"),
        )
        .collect()
    )
    fns = [r.key for r in pos if int(r.key[1:]) < n and not member(r.ps)]
    assert fns == []  # a Bloom filter can never false-negative
    fps = [r.key for r in pos if int(r.key[1:]) >= n and member(r.ps)]
    theory = (1 - math.exp(-k * n / m)) ** k
    rate = len(fps) / 1000
    assert rate < max(5 * theory, 0.02), (rate, theory)


def test_null_keys_behave_like_anti_join(spark):
    # NULL never equals NULL in SQL joins: plain left_anti KEEPS
    # null-key rows, so bloom_screen must too
    seen = spark.createDataFrame([("a",), (None,)], "key string")
    inc = spark.createDataFrame(
        [("a", 1), (None, 2), ("b", 3)], "key string, v int"
    )
    got = sorted(
        ((r.key, r.v) for r in bloom_screen(inc, seen, "key", num_bits=1 << 10).collect()),
        key=lambda t: t[1],
    )
    want = sorted(
        ((r.key, r.v) for r in inc.join(seen, "key", "left_anti").collect()),
        key=lambda t: t[1],
    )
    assert got == want == [(None, 2), ("b", 3)]


def test_build_validates_params(spark):
    seen = spark.range(3).select(F.col("id").alias("key"))
    import pytest

    with pytest.raises(ValueError):
        build_bloom(seen, "key", num_bits=0)


def test_plan_no_cartesian_and_bit_or_aggregate(spark):
    seen, inc = _seen_inc(spark)
    plan = (
        bloom_screen(inc, seen, "key", num_bits=1 << 14)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
