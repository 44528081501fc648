"""Rates-of-change stage tests: analytic erosion-rate oracle + operator
unit checks (SURVEY.md §5, BASELINE.md 'transect rates within tolerance')."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from dea_coastlines_spark.functions import stats
from dea_coastlines_spark.operators import rates as rates_op
from dea_coastlines_spark.plans.pipeline import rates_pipeline
from dea_coastlines_spark.synth import corpus

SPEC = corpus.CorpusSpec(
    tile_px=96, halo_px=6, tiles_x=2, tiles_y=1,
    year0=2000, year1=2005, obs_per_year=5,
    cloud_frac=0.0, noise_sd=0.04, tide_amp_m=8.0,
    erosion_m_per_year=-12.0, seed=21,
)
BASELINE_YEAR = 2000


@pytest.fixture(scope="module")
def rates_df(spark):
    tiles = spark.createDataFrame(corpus.generate_pandas(SPEC))
    out = rates_pipeline(tiles, BASELINE_YEAR, apply_tide_filter=False).toPandas()
    return out


def test_rates_match_analytic_erosion(rates_df):
    """rate_time should approximate the analytic erosion rate at each
    point's x (negative = inland retreat; tide/noise add scatter)."""
    assert len(rates_df) > 20
    good = rates_df[rates_df.certainty.isin(["good"])]
    assert len(good) > 10
    ero = SPEC.erosion_m_per_year * (
        1.0 + 0.5 * np.sin(2 * np.pi * good.x.to_numpy() / (3.7 * SPEC.wavelen_m))
    )
    err = good.rate_time.to_numpy() - ero
    # median bias within half a pixel/yr; tide scatter bounded
    assert abs(np.median(err)) < 5.0
    assert np.percentile(np.abs(err), 90) < 10.0


def test_rates_structure(rates_df):
    assert (rates_df.valid_obs <= len(SPEC.years)).all()
    assert (rates_df.valid_span <= len(SPEC.years)).all()
    assert rates_df.uid.str.len().eq(10).all()
    assert rates_df.point_id.is_unique
    # movement is ~north-south (coast runs E-W): folded bearing near 0/180
    fold = np.minimum(rates_df.angle_mean % 180, 180 - (rates_df.angle_mean % 180))
    assert np.median(fold) < 30
    # sce >= |nsm| where both defined (envelope bounds net movement)
    both = rates_df.dropna(subset=["sce", "nsm"])
    assert (both.sce >= both.nsm.abs() - 1e-9).all()


def test_baseline_points_spacing_and_determinism(spark):
    tiles = spark.createDataFrame(corpus.generate_pandas(SPEC))
    from dea_coastlines_spark.operators import composite as comp_op
    from dea_coastlines_spark.operators import contours as cont_op

    sl = cont_op.shorelines(comp_op.annual_composites(tiles, False))
    p1 = rates_op.baseline_points(sl, BASELINE_YEAR).toPandas().sort_values("point_id")
    p2 = rates_op.baseline_points(sl, BASELINE_YEAR).toPandas().sort_values("point_id")
    assert p1.point_id.tolist() == p2.point_id.tolist()
    # spacing ~30 m along each piece: nearest-neighbor distance <= 30+eps
    pts = p1[["x", "y"]].to_numpy()
    if len(pts) > 2:
        d = np.hypot(pts[:, 0, None] - pts[None, :, 0], pts[:, 1, None] - pts[None, :, 1])
        np.fill_diagonal(d, np.inf)
        assert np.median(d.min(axis=1)) <= 31.0


def test_signed_distance_sign_convention(spark):
    """Synthetic oracle: with erosion, later-year coasts are INLAND of the
    baseline -> signed dists negative on average."""
    tiles = spark.createDataFrame(corpus.generate_pandas(SPEC))
    from dea_coastlines_spark.operators import composite as comp_op
    from dea_coastlines_spark.operators import contours as cont_op

    comps = comp_op.annual_composites(tiles, False)
    sl = cont_op.shorelines(comps)
    pts = rates_op.baseline_points(sl, BASELINE_YEAR)
    nearest = rates_op.annual_nearest(pts, sl)
    signed = rates_op.signed_distances(nearest, comps, BASELINE_YEAR).toPandas()
    last = signed[signed.year == 2005]
    assert np.nanmean(last.dist) < -20  # ~5 years of ~12 m/yr retreat
    base = signed[signed.year == BASELINE_YEAR]
    assert (base.dist == 0.0).all()


def test_certainty_cascade_priority(spark):
    """Later reference rules override earlier ones: a point that is both
    'baseline outlier' and 'insufficient observations' must read
    'insufficient observations' (vector.py:1549-1580 order)."""
    pdf = pd.DataFrame(
        [
            {"point_id": 1, "x": 0.0, "y": 0.0, "uid": "u", "rate_time": 1.0,
             "incpt_time": 0.0, "sig_time": 0.5, "se_time": 0.1,
             "outl_time": "2000", "angle_mean": 0, "angle_std": 0,
             "valid_obs": 1, "valid_span": 1, "sce": 0.0, "nsm": 0.0,
             "max_year": 2000, "min_year": 2000},
            {"point_id": 2, "x": 0.0, "y": 0.0, "uid": "u", "rate_time": 99.0,
             "incpt_time": 0.0, "sig_time": 0.5, "se_time": 0.1,
             "outl_time": "", "angle_mean": 0, "angle_std": 45,
             "valid_obs": 6, "valid_span": 6, "sce": 0.0, "nsm": 0.0,
             "max_year": 2000, "min_year": 2000},
            {"point_id": 3, "x": 0.0, "y": 0.0, "uid": "u", "rate_time": 99.0,
             "incpt_time": 0.0, "sig_time": 0.5, "se_time": 0.1,
             "outl_time": "", "angle_mean": 0, "angle_std": 0,
             "valid_obs": 6, "valid_span": 6, "sce": 0.0, "nsm": 0.0,
             "max_year": 2000, "min_year": 2000},
            {"point_id": 4, "x": 0.0, "y": 0.0, "uid": "u", "rate_time": 1.0,
             "incpt_time": 0.0, "sig_time": 0.5, "se_time": 0.1,
             "outl_time": "2000 2003", "angle_mean": 0, "angle_std": 0,
             "valid_obs": 6, "valid_span": 6, "sce": 0.0, "nsm": 0.0,
             "max_year": 2000, "min_year": 2000},
        ]
    )
    df = spark.createDataFrame(pdf)
    out = (
        rates_op.with_certainty(df, n_years=6, baseline_year=2000)
        .toPandas().set_index("point_id")
    )
    assert out.loc[1, "certainty"] == "insufficient observations"
    assert out.loc[2, "certainty"] == "high angular variability"
    assert out.loc[3, "certainty"] == "extreme value (> 50 m)"
    assert out.loc[4, "certainty"] == "baseline outlier"


def test_bilinear_sample_oracle():
    arr = np.array([[0.0, 1.0], [2.0, 3.0]], np.float32)
    tf = [1.0, 0.0, 0.0, 0.0, -1.0, 2.0]  # pixel centers at (0.5,1.5),(1.5,1.5)...
    # center of the 2x2 grid
    v = rates_op.bilinear_sample(arr, tf, np.array([1.0]), np.array([1.0]))
    assert abs(v[0] - 1.5) < 1e-9
    # outside -> NaN
    v2 = rates_op.bilinear_sample(arr, tf, np.array([10.0]), np.array([1.0]))
    assert np.isnan(v2[0])
