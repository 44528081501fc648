"""Interval (range) join vs a pandas brute-force oracle + plan gates."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from dea_coastlines_spark.operators.interval import (
    interval_join,
    interval_overlap_join,
)


def _brute_points(pts: pd.DataFrame, ivs: pd.DataFrame, by: bool):
    rows = []
    for _, p in pts.iterrows():
        for _, i in ivs.iterrows():
            if by and p["grp"] != i["grp"]:
                continue
            if i["s"] <= p["ts"] < i["e"]:
                rows.append((p["pid"], i["iid"]))
    return sorted(rows)


@pytest.fixture()
def frames(spark):
    rng = np.random.default_rng(7)
    pts = pd.DataFrame(
        {
            "pid": np.arange(400, dtype="int64"),
            "grp": rng.integers(0, 5, 400).astype("int64"),
            "ts": rng.integers(0, 100_000, 400).astype("int64"),
        }
    )
    s = rng.integers(0, 100_000, 60).astype("int64")
    ivs = pd.DataFrame(
        {
            "iid": np.arange(60, dtype="int64"),
            "grp": rng.integers(0, 5, 60).astype("int64"),
            "s": s,
            # mix of zero-length (matches nothing), short, and long
            "e": s + rng.integers(0, 15_000, 60).astype("int64"),
        }
    )
    return spark.createDataFrame(pts), spark.createDataFrame(ivs), pts, ivs


@pytest.mark.parametrize("bucket_s", [500, 3600, 1_000_000])
def test_point_in_interval_matches_brute(spark, frames, bucket_s):
    pdf, idf, pts, ivs = frames
    got = (
        interval_join(pdf, idf, "ts", "s", "e", by=["grp"], bucket_s=bucket_s)
        .select("pid", "iid")
        .toPandas()
    )
    got_pairs = sorted(map(tuple, got.to_numpy()))
    assert got_pairs == _brute_points(pts, ivs, by=True)
    # exactly-once: no pair may surface twice
    assert len(got_pairs) == len(set(got_pairs))


def test_point_in_interval_no_by(spark, frames):
    pdf, idf, pts, ivs = frames
    got = (
        interval_join(
            pdf.drop("grp"), idf.drop("grp"), "ts", "s", "e", bucket_s=2000
        )
        .select("pid", "iid")
        .toPandas()
    )
    assert sorted(map(tuple, got.to_numpy())) == _brute_points(
        pts, ivs, by=False
    )


def test_left_join_keeps_unmatched_points(spark, frames):
    pdf, idf, pts, ivs = frames
    got = interval_join(
        pdf, idf, "ts", "s", "e", by=["grp"], bucket_s=2000, how="left"
    ).toPandas()
    matched = {p for p, _ in _brute_points(pts, ivs, by=True)}
    # every input point row appears; unmatched exactly once with NULL iid
    miss = got[got["iid"].isna()]
    assert set(miss["pid"]) == set(pts["pid"]) - matched
    assert len(miss) == len(set(miss["pid"]))
    hits = got[got["iid"].notna()]
    assert len(hits) == len(_brute_points(pts, ivs, by=True))


def test_left_join_duplicate_point_rows_multiset(spark):
    pts = pd.DataFrame({"pid": [1, 1, 2, 2], "ts": [10, 10, 99, 99]})
    ivs = pd.DataFrame({"iid": [7], "s": [5], "e": [20]})
    got = interval_join(
        spark.createDataFrame(pts),
        spark.createDataFrame(ivs),
        "ts", "s", "e", bucket_s=8, how="left",
    ).toPandas()
    # pid=1 duplicates both match once; pid=2 duplicates both miss once
    assert len(got[got["pid"] == 1]) == 2
    assert got[got["pid"] == 1]["iid"].notna().all()
    assert len(got[got["pid"] == 2]) == 2
    assert got[got["pid"] == 2]["iid"].isna().all()


def test_long_interval_broadcast_path_parity(spark, frames):
    pdf, idf, pts, ivs = frames
    base = interval_join(
        pdf, idf, "ts", "s", "e", by=["grp"], bucket_s=500,
        long_interval_buckets=None,
    ).select("pid", "iid").toPandas()
    split = interval_join(
        pdf, idf, "ts", "s", "e", by=["grp"], bucket_s=500,
        long_interval_buckets=4,  # most intervals take the broadcast leg
    ).select("pid", "iid").toPandas()
    key = lambda d: sorted(map(tuple, d.to_numpy()))
    assert key(base) == key(split)


def test_plan_has_no_nested_loop_on_exploded_path(spark, frames):
    pdf, idf, *_ = frames
    plan = interval_join(
        pdf, idf, "ts", "s", "e", by=["grp"], bucket_s=2000
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_timestamp_typed_columns(spark):
    pts = pd.DataFrame(
        {
            "pid": [0, 1, 2],
            "ts": pd.to_datetime(
                ["2024-01-01 00:10:00", "2024-01-01 01:10:00",
                 "2024-01-01 02:10:00"]
            ),
        }
    )
    ivs = pd.DataFrame(
        {
            "iid": [0],
            "s": pd.to_datetime(["2024-01-01 00:00:00"]),
            "e": pd.to_datetime(["2024-01-01 01:30:00"]),
        }
    )
    got = interval_join(
        spark.createDataFrame(pts), spark.createDataFrame(ivs),
        "ts", "s", "e", bucket_s=600,
    ).select("pid").toPandas()
    assert sorted(got["pid"]) == [0, 1]


def _brute_overlap(a: pd.DataFrame, b: pd.DataFrame):
    rows = []
    for _, x in a.iterrows():
        for _, y in b.iterrows():
            if x["as_"] < y["be"] and y["bs"] < x["ae"]:
                rows.append(
                    (
                        x["aid"], y["bid"],
                        min(x["ae"], y["be"]) - max(x["as_"], y["bs"]),
                    )
                )
    return sorted(rows)


def test_overlap_join_matches_brute(spark):
    rng = np.random.default_rng(11)
    sa = rng.integers(0, 50_000, 80).astype("int64")
    a = pd.DataFrame(
        {"aid": np.arange(80, dtype="int64"), "as_": sa,
         "ae": sa + rng.integers(1, 9_000, 80).astype("int64")}
    )
    sb = rng.integers(0, 50_000, 70).astype("int64")
    b = pd.DataFrame(
        {"bid": np.arange(70, dtype="int64"), "bs": sb,
         "be": sb + rng.integers(1, 9_000, 70).astype("int64")}
    )
    for bucket in (700, 5_000, 1_000_000):
        got = interval_overlap_join(
            spark.createDataFrame(a), spark.createDataFrame(b),
            "as_", "ae", "bs", "be", bucket_s=bucket,
        ).select("aid", "bid", "overlap_s").toPandas()
        pairs = sorted(map(tuple, got.to_numpy()))
        assert pairs == _brute_overlap(a, b), bucket
        assert len(pairs) == len({(x, y) for x, y, _ in pairs})


def test_empty_and_null_intervals_dropped(spark):
    pts = spark.createDataFrame(pd.DataFrame({"pid": [0], "ts": [100]}))
    ivs = spark.createDataFrame(
        pd.DataFrame(
            {"iid": [0, 1, 2], "s": [100, None, 50],
             "e": [100, 200, None]}
        ).astype({"s": "Int64", "e": "Int64"})
    )
    got = interval_join(pts, ivs, "ts", "s", "e", bucket_s=60).toPandas()
    assert len(got) == 0


def test_subsecond_boundaries_are_exact(spark):
    """A point in the same SECOND as — but microseconds before — the
    interval start must not match (and symmetrically at the end).
    Seconds-truncated epochs admitted both; surfaced by the sf0.1
    oracle sweep, where 10x event density puts events on sub-second
    boundaries."""
    import datetime as dt

    from dea_coastlines_spark.operators.interval import interval_join

    w0 = dt.datetime(2024, 1, 1, 10, 0, 0, 700000)
    intervals = spark.createDataFrame(
        [(1, w0, w0 + dt.timedelta(minutes=45))],
        "wid long, wstart timestamp, wend timestamp",
    )
    points = spark.createDataFrame(
        [
            (1, w0 - dt.timedelta(microseconds=500000)),  # same second, before
            (2, w0),                                      # exact start: in
            (3, w0 + dt.timedelta(minutes=45)),           # exact end: out
            (4, w0 + dt.timedelta(minutes=44, seconds=59, microseconds=999999)),
        ],
        "pid long, ts timestamp",
    )
    got = sorted(
        r["pid"]
        for r in interval_join(
            points, intervals, "ts", "wstart", "wend", bucket_s=600
        ).collect()
    )
    assert got == [2, 4]


def test_overlap_floor_semantics_pre_1970(spark):
    """overlap_s floors each endpoint to seconds (FLOOR(epoch(..)))
    BEFORE subtracting.  For negative epoch micros (pre-1970
    timestamps with sub-second parts) a truncating `div` disagrees
    with FLOOR by 1 — pin the floor semantics on both sides of 1970."""
    a = pd.DataFrame({
        "aid": [0],
        "as_": [pd.Timestamp("1969-12-31 23:59:58.700")],
        "ae": [pd.Timestamp("1970-01-01 00:00:02.300")],
    })
    b = pd.DataFrame({
        "bid": [0],
        "bs": [pd.Timestamp("1969-12-31 23:59:59.400")],
        "be": [pd.Timestamp("1970-01-01 00:00:01.100")],
    })
    got = interval_overlap_join(
        spark.createDataFrame(a), spark.createDataFrame(b),
        "as_", "ae", "bs", "be", bucket_s=2,
    ).select("overlap_s").toPandas()
    # FLOOR(-0.6s) = -1, FLOOR(1.1s) = 1 -> 2  (truncation would say 1)
    assert got["overlap_s"].tolist() == [2]
