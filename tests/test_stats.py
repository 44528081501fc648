"""Stats kernel parity tests: t-table values, MAD semantics, regression
round-trip, circular stats (SURVEY.md §5 'regression/MAD parity')."""

from __future__ import annotations

import numpy as np

from dea_coastlines_spark.functions import stats


def test_t_sf_matches_t_table():
    # classic two-sided 5% critical values
    for t, df in [(12.706, 1), (2.776, 4), (2.228, 10), (2.086, 20), (1.984, 100)]:
        assert abs(stats.t_sf_two_sided(t, df) - 0.05) < 2e-3


def test_linregress_perfect_line():
    x = np.arange(10, dtype=float)
    y = 3.0 * x + 2.0
    slope, intercept, r, p, se = stats.linregress_np(x, y)
    assert abs(slope - 3.0) < 1e-12 and abs(intercept - 2.0) < 1e-12
    assert abs(r - 1.0) < 1e-12 and se < 1e-10


def test_linregress_known_noisy():
    # cross-checked against scipy.stats.linregress offline conventions:
    # y = 2x + noise, p-value must be tiny, stderr positive
    rng = np.random.default_rng(3)
    x = np.arange(30, dtype=float)
    y = 2.0 * x + rng.normal(0, 1.0, 30)
    slope, intercept, r, p, se = stats.linregress_np(x, y)
    assert abs(slope - 2.0) < 0.05
    assert p < 1e-20
    assert 0 < se < 0.05
    # no-trend data -> p near uniform-large
    y2 = rng.normal(0, 1.0, 30)
    _, _, _, p2, _ = stats.linregress_np(x, y2)
    assert p2 > 0.05


def test_outlier_mad_reference_semantics():
    # 2-D euclidean form: an extreme y-offset is caught
    x = np.arange(21, dtype=float)
    y = 0.5 * x
    y[7] += 100.0
    xy = np.stack([x, y], axis=1)
    mask = stats.outlier_mad(xy)
    assert mask[7] and mask.sum() == 1
    # 1-D form mirrors reference reshape
    assert stats.outlier_mad(np.array([1.0, 1.1, 0.9, 50.0]))[3]


def test_change_regress_outlier_string_and_rounding():
    years = np.arange(2000, 2011)
    dists = (years - 2000) * 1.5 + 0.001
    dists = dists.astype(float)
    dists[3] = np.nan           # 2003 -> NaN outlier
    dists[8] = 500.0            # 2008 -> MAD outlier
    out = stats.change_regress(dists, years, years)
    assert out["outliers"] == "2003 2008"
    assert abs(out["slope"] - 1.5) < 0.01
    assert out["slope"] == round(out["slope"], 3)


def test_circular_stats_wraparound():
    # angles near the 0/180 fold: 178 and 2 are 4 degrees apart, mean 0
    m = stats.circmean_deg(np.array([178.0, 2.0]))
    assert min(m, 180 - m) < 1e-6
    s = stats.circstd_deg(np.array([178.0, 2.0]))
    assert s < 5.0
    # dispersed angles -> big std
    assert stats.circstd_deg(np.array([0.0, 45.0, 90.0, 135.0])) > 30.0


def test_all_time_stats_reference_semantics():
    years = np.array([1988, 1989, 1990, 1991, 1992])
    dists = np.array([0.0, 5.0, -3.0, 12.0, np.nan])
    out = stats.all_time_stats(years, dists, "1990", 1988)
    # 1990 dropped as outlier, 1992 NaN dropped
    assert out["valid_obs"] == 3
    assert out["valid_span"] == 1991 - 1988 + 1
    assert out["sce"] == 12.0 - 0.0
    assert out["nsm"] == -0.0
    assert out["max_year"] == 1991 and out["min_year"] == 1988
