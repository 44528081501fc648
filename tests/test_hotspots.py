"""Hotspot stage tests (continental.py:262-331 semantics)."""

from __future__ import annotations

import numpy as np
import pytest

from dea_coastlines_spark.operators import composite as comp_op
from dea_coastlines_spark.operators import contours as cont_op
from dea_coastlines_spark.operators import hotspots as hs_op
from dea_coastlines_spark.operators import rates as rates_op
from dea_coastlines_spark.synth import corpus

SPEC = corpus.CorpusSpec(
    tile_px=96, halo_px=6, tiles_x=2, tiles_y=1,
    year0=2000, year1=2005, obs_per_year=5,
    cloud_frac=0.0, noise_sd=0.04, tide_amp_m=8.0,
    erosion_m_per_year=-12.0, seed=21,
)
BASELINE = 2000


@pytest.fixture(scope="module")
def stage(spark):
    tiles = spark.createDataFrame(corpus.generate_pandas(SPEC))
    comps = comp_op.annual_composites(tiles, False)
    sl = cont_op.shorelines(comps)
    pts = rates_op.baseline_points(sl, BASELINE)
    nearest = rates_op.annual_nearest(pts, sl)
    signed = rates_op.signed_distances(nearest, comps, BASELINE)
    sl.cache(); pts.cache(); signed.cache()
    return sl, pts, signed


def test_hotspots_aggregate_erosion(stage, spark):
    sl, pts, signed = stage
    hs = hs_op.hotspots(sl, pts, signed, BASELINE, radius_m=1000.0).toPandas()
    assert len(hs) > 3
    # hotspot rate ~ regional erosion average (-12 +- 50%)
    good = hs[hs.certainty == "good"]
    assert len(good) > 0
    assert -25 < good.rate_time.median() < -4
    assert good.n.min() >= 1000 / 30
    assert hs.uid.str.len().eq(11).all()


def test_hotspots_insufficient_points_flag(stage):
    sl, pts, signed = stage
    # huge radius -> few centers, many points each -> good; tiny radius ->
    # few member points per center -> insufficient
    hs_small = hs_op.hotspots(sl, pts, signed, BASELINE, radius_m=120.0).toPandas()
    flagged = hs_small[hs_small.n < 120.0 / 30.0]
    assert (flagged.certainty == "insufficient points").all()


def test_hotspot_median_matches_oracle(stage):
    """Brute-force parity over EVERY hotspot: membership by exact
    euclidean distance, n, and the regression slope recomputed with the
    numpy oracle (like test_spatial_join's exact-match checks)."""
    sl, pts, signed = stage
    hs = hs_op.hotspots(sl, pts, signed, BASELINE, radius_m=1000.0).toPandas()
    from dea_coastlines_spark.functions import stats as st

    pts_pdf = pts.toPandas()
    sd = signed.toPandas()
    assert len(hs) > 0
    for target in hs.itertuples():
        member = pts_pdf[
            np.hypot(pts_pdf.x - target.x, pts_pdf.y - target.y) <= 1000.0
        ].point_id
        sub = sd[sd.point_id.isin(member)]
        med = sub.groupby("year").dist.median()
        reg = st.change_regress(
            med.to_numpy(), med.index.to_numpy(), med.index.to_numpy()
        )
        assert target.n == member.nunique()
        assert abs(target.rate_time - reg["slope"]) < 1e-9 or (
            np.isnan(target.rate_time) and np.isnan(reg["slope"])
        )


def test_hotspots_has_no_driver_collect():
    """The hotspot stage must stay distributed end-to-end: no driver
    round-trip (toPandas/collect) anywhere in the operator source."""
    import inspect

    src = inspect.getsource(hs_op.hotspots)
    assert "toPandas" not in src and ".collect(" not in src


def test_continental_fused_equals_per_radius_loop(stage, spark):
    """The fused multi-radius plan (one per-feature-radius cover join +
    shared aggregations) must reproduce the per-radius loop exactly —
    same member sets, medians, regressions, flags — even though its
    cover cells are sized to the largest radius."""
    import pandas as pd

    sl, pts, signed = stage
    radii = (1000.0, 500.0)
    key = ["radius_m", "hotspot_id"]
    fused = (
        hs_op.continental_hotspots(sl, pts, signed, BASELINE, radii_m=radii)
        .toPandas().sort_values(key).reset_index(drop=True)
    )
    loop = pd.concat(
        [
            hs_op.with_wms_fields(
                hs_op.hotspots(sl, pts, signed, BASELINE, radius_m=r)
            ).toPandas()
            for r in radii
        ],
        ignore_index=True,
    ).sort_values(key).reset_index(drop=True)
    assert list(fused.columns) == list(loop.columns)
    pd.testing.assert_frame_equal(fused, loop, check_exact=False, rtol=1e-12)


def test_continental_hotspots_wms(stage, spark):
    hs = hs_op.continental_hotspots(*stage, BASELINE, radii_m=(1000.0, 500.0))
    pdf = hs.toPandas()
    assert set(pdf.radius_m.unique()) == {1000.0, 500.0}
    for c in ("wms_abs", "wms_conf", "wms_grew", "wms_retr", "wms_sig", "wms_good"):
        assert c in pdf.columns
    assert (pdf.wms_abs >= 0).all()
    assert ((pdf.wms_grew) == (pdf.rate_time < 0)).all()
    assert np.allclose(pdf.wms_conf, pdf.se_time * 1.96, equal_nan=True)
