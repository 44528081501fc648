"""As-of join vs pandas.merge_asof oracle + plan-shape gates."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from dea_coastlines_spark.operators.asof import asof_join


@pytest.fixture()
def sides(spark):
    rng = np.random.default_rng(5)
    left = pd.DataFrame(
        {
            "key": rng.integers(0, 4, 60),
            "t": rng.integers(0, 1000, 60).astype("int64"),
            "lid": np.arange(60, dtype="int64"),
        }
    )
    right_t = np.sort(rng.choice(np.arange(0, 1000), size=30, replace=False))
    right = pd.DataFrame(
        {
            "key": rng.integers(0, 4, 30),
            "t": right_t.astype("int64"),
            "price": np.round(rng.uniform(0, 10, 30), 3),
        }
    )
    # make (key, t) unique on the right so merge_asof picks are well-defined
    right = right.drop_duplicates(["key", "t"])
    return (
        spark.createDataFrame(left), spark.createDataFrame(right),
        left, right,
    )


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_asof_matches_pandas_merge_asof(spark, sides, direction):
    ldf, rdf, lp, rp = sides
    got = (
        asof_join(ldf, rdf, on="t", by=["key"], direction=direction)
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        lp.sort_values("t"),
        rp.sort_values("t"),
        on="t", by="key", direction=direction, suffixes=("", "_r"),
    ).sort_values("lid").reset_index(drop=True)
    assert got.price_r.fillna(-1).tolist() == want.price.fillna(-1).tolist()


def test_asof_exact_time_match_visible(spark):
    ldf = spark.createDataFrame([(1, 100)], "key long, t long")
    rdf = spark.createDataFrame([(1, 100, 7.0)], "key long, t long, v double")
    out = asof_join(ldf, rdf, on="t", by=["key"]).collect()
    assert out[0].v_r == 7.0 and out[0].t_r == 100


def test_asof_no_match_is_null(spark):
    ldf = spark.createDataFrame([(1, 50)], "key long, t long")
    rdf = spark.createDataFrame([(1, 100, 7.0)], "key long, t long, v double")
    out = asof_join(ldf, rdf, on="t", by=["key"]).collect()
    assert out[0].v_r is None
    fwd = asof_join(ldf, rdf, on="t", by=["key"], direction="forward").collect()
    assert fwd[0].v_r == 7.0


def test_asof_plan_no_nested_loop_one_key_shuffle(spark, sides):
    ldf, rdf, _, _ = sides
    plan = (
        asof_join(ldf, rdf, on="t", by=["key"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan and "Join" not in plan  # pure window


# ----------------------------------- sessionization (operators/sessions)


def test_sessionize_gap_splits(spark):
    from dea_coastlines_spark.operators.sessions import session_stats, sessionize
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, t0),
        (1, t0 + dt.timedelta(seconds=100)),
        (1, t0 + dt.timedelta(seconds=2200)),   # > 1800 gap: new session
        (1, t0 + dt.timedelta(seconds=2300)),
        (2, t0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    s = sessionize(df, gap_s=1800).orderBy("user_id", "ts").collect()
    assert [r.session_seq for r in s] == [1, 1, 2, 2, 1]
    st = {(r.user_id, r.session_seq): r for r in session_stats(df, gap_s=1800).collect()}
    assert st[(1, 1)].n_events == 2 and st[(1, 1)].duration_s == 100
    assert st[(1, 2)].n_events == 2 and st[(1, 2)].duration_s == 100
    assert st[(2, 1)].n_events == 1 and st[(2, 1)].duration_s == 0


def test_nearest_keeps_null_left_rows(spark):
    """ADVICE r2: nearest's backward/forward legs must join null-safely —
    a NULL in any left column must not drop the row from nearest output."""
    from dea_coastlines_spark.operators.asof import asof_join

    ldf = spark.createDataFrame(
        [(1, 10, None), (1, 20, "x"), (2, 15, None)],
        "key long, t long, note string",
    )
    rdf = spark.createDataFrame(
        [(1, 8, 1.0), (1, 22, 2.0), (2, 30, 3.0)],
        "key long, t long, v double",
    )
    got = asof_join(ldf, rdf, on="t", by=["key"], direction="nearest").collect()
    assert len(got) == 3  # the two NULL-note rows survive
    m = {(r.key, r.t): r.v_r for r in got}
    assert m[(1, 10)] == 1.0   # dist 2 back vs 12 fwd
    assert m[(1, 20)] == 2.0   # dist 12 back vs 2 fwd
    assert m[(2, 15)] == 3.0   # only fwd exists
