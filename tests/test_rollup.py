"""Hierarchical cell rollup vs brute-force pandas aggregation."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from dea_coastlines_spark.operators.rollup import hierarchical_rollup


def _brute_level(pdf: pd.DataFrame, size: float) -> pd.DataFrame:
    g = pdf.assign(
        cell_x=np.floor(pdf["x"] / size).astype(np.int64),
        cell_y=np.floor(pdf["y"] / size).astype(np.int64),
    ).groupby(["cell_x", "cell_y"])["v"]
    out = g.agg(n="count", sum_v="sum", min_v="min", max_v="max").reset_index()
    out["mean_v"] = out["sum_v"] / out["n"]
    return out.sort_values(["cell_x", "cell_y"]).reset_index(drop=True)


@pytest.fixture(scope="module")
def points():
    rng = np.random.default_rng(31)
    n = 5000
    return pd.DataFrame(
        {
            # includes negative coordinates: floor-div nesting must hold
            "x": rng.uniform(-300, 500, n),
            "y": rng.uniform(-400, 400, n),
            "v": rng.normal(10, 4, n),
        }
    )


def test_rollup_matches_direct_binning_every_level(spark, points):
    base, levels = 25.0, 4
    got = (
        hierarchical_rollup(
            spark.createDataFrame(points), "x", "y", "v", base, levels=levels
        )
        .toPandas()
        .sort_values(["level", "cell_x", "cell_y"])
        .reset_index(drop=True)
    )
    for lvl in range(levels):
        # direct binning at this level's size is the ground truth; the
        # operator reaches it by re-aggregating level lvl-1
        want = _brute_level(points, base * 2**lvl)
        have = (
            got[got["level"] == lvl]
            .drop(columns="level")
            .reset_index(drop=True)
        )
        assert len(have) == len(want)
        pd.testing.assert_frame_equal(
            have[["cell_x", "cell_y"]], want[["cell_x", "cell_y"]]
        )
        np.testing.assert_array_equal(have["n"], want["n"])
        for c in ("sum_v", "min_v", "max_v", "mean_v"):
            np.testing.assert_allclose(have[c], want[c], rtol=1e-12)


def test_rollup_cell_nesting_negative_coords(spark, points):
    got = hierarchical_rollup(
        spark.createDataFrame(points), "x", "y", "v", 25.0, levels=3
    ).toPandas()
    l0 = got[got["level"] == 0]
    l1 = got[got["level"] == 1]
    # every level-0 cell's floor-div parent must exist at level 1
    parents = set(zip(l1["cell_x"], l1["cell_y"]))
    for cx, cy in zip(l0["cell_x"], l0["cell_y"]):
        assert (cx // 2, cy // 2) in parents
    # total count conserved at every level
    assert l0["n"].sum() == l1["n"].sum() == len(points)


def test_rollup_single_level(spark, points):
    got = hierarchical_rollup(
        spark.createDataFrame(points), "x", "y", "v", 50.0, levels=1
    ).toPandas()
    assert set(got["level"]) == {0}
    want = _brute_level(points, 50.0)
    assert len(got) == len(want)
