"""Resample/interpolation invariants beyond the driver oracle: exact
linear closed forms, exact-hit grid points, grid alignment/bounds, and
partition invariance."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from dea_coastlines_spark.operators.resample import resample_interpolate


def _df(spark, rows):
    return spark.createDataFrame(rows, "user_id long, ts timestamp, value double")


@pytest.fixture(autouse=True)
def _utc(spark):
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def test_linear_closed_form(spark):
    t0 = dt.datetime(2024, 1, 1, 0, 30)
    t1 = dt.datetime(2024, 1, 1, 3, 30)
    out = resample_interpolate(
        _df(spark, [(1, t0, 0.0), (1, t1, 30.0)]), "user_id", "ts", "value",
        step_s=3600,
    ).collect()
    got = {r["grid_ts"]: r["value"] for r in out}
    # grid 01:00, 02:00, 03:00 -> fractions 1/6, 1/2, 5/6 of 30
    assert got == {
        dt.datetime(2024, 1, 1, 1): 5.0,
        dt.datetime(2024, 1, 1, 2): 15.0,
        dt.datetime(2024, 1, 1, 3): 25.0,
    }


def test_exact_hit_takes_observation_value(spark):
    t0 = dt.datetime(2024, 1, 1, 1, 0)  # ON the grid
    t1 = dt.datetime(2024, 1, 1, 2, 0)
    out = resample_interpolate(
        _df(spark, [(1, t0, 7.5), (1, t1, 9.5)]), "user_id", "ts", "value",
        step_s=3600,
    ).collect()
    got = {r["grid_ts"]: r["value"] for r in out}
    assert got[t0] == 7.5 and got[t1] == 9.5


def test_no_extrapolation_outside_range(spark):
    t0 = dt.datetime(2024, 1, 1, 0, 30)
    t1 = dt.datetime(2024, 1, 1, 1, 30)
    out = resample_interpolate(
        _df(spark, [(1, t0, 1.0), (1, t1, 2.0)]), "user_id", "ts", "value",
        step_s=3600,
    ).collect()
    assert [r["grid_ts"] for r in out] == [dt.datetime(2024, 1, 1, 1)]


def test_partition_invariance(spark):
    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    a = resample_interpolate(ev.coalesce(1), "user_id", "ts", "value", 21600)
    b = resample_interpolate(ev.repartition(16), "user_id", "ts", "value", 21600)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_single_shuffle_plan(spark):
    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    df = resample_interpolate(ev, "user_id", "ts", "value", 21600)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_no_aligned_grid_point_returns_empty(spark):
    """A key whose observed range straddles no aligned point must yield
    zero rows, not a sequence(start > stop) crash."""
    t0 = dt.datetime(2024, 1, 1, 0, 10)
    t1 = dt.datetime(2024, 1, 1, 0, 50)
    out = resample_interpolate(
        _df(spark, [(1, t0, 1.0), (1, t1, 2.0)]), "user_id", "ts", "value",
        step_s=3600,
    )
    assert out.count() == 0
    # single unaligned observation: same guarantee
    out1 = resample_interpolate(
        _df(spark, [(2, t0, 1.0)]), "user_id", "ts", "value", step_s=3600
    )
    assert out1.count() == 0


def test_same_second_collisions_resolve_deterministically(spark):
    """Two observations in the same (user, second) with different
    values must interpolate identically under any physical layout
    (min-per-second semantics) — the review-confirmed nondeterminism."""
    base = dt.datetime(2024, 1, 1, 0, 30)
    rows = [
        (1, base, 80.0),
        (1, base + dt.timedelta(microseconds=500), 20.0),  # same second
        (1, dt.datetime(2024, 1, 1, 1, 30), 40.0),
    ]
    a = resample_interpolate(_df(spark, rows).coalesce(1),
                             "user_id", "ts", "value", 3600).collect()
    b = resample_interpolate(_df(spark, list(reversed(rows))).repartition(8),
                             "user_id", "ts", "value", 3600).collect()
    ga = {r["grid_ts"]: r["value"] for r in a}
    gb = {r["grid_ts"]: r["value"] for r in b}
    assert ga == gb
    # min-of-second bracket: prev value at 01:00 is min(80, 20) = 20
    assert ga[dt.datetime(2024, 1, 1, 1)] == 30.0  # 20 + (40-20)*0.5
