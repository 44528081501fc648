"""Zonal statistics vs independent rectangle-comparison brute force."""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pytest

from dea_coastlines_spark.codecs import tiff
from dea_coastlines_spark.geometry import wkb
from dea_coastlines_spark.operators.composite import annual_composites
from dea_coastlines_spark.operators.zonal import zonal_stats
from dea_coastlines_spark.synth import corpus


@pytest.fixture(scope="module")
def composites(spark):
    spec = corpus.CorpusSpec(
        tile_px=48, halo_px=4, tiles_x=3, tiles_y=2,
        year0=2001, year1=2002, obs_per_year=4, cloud_frac=0.1, seed=21,
    )
    comp = annual_composites(
        corpus.generate_spark(spark, spec), apply_tide_filter=False
    )
    return comp.toPandas(), spec


def _rect_wkb(x0, y0, x1, y1):
    return wkb.polygon(
        np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], float)
    )


def _rect_hole_wkb(x0, y0, x1, y1, hx0, hy0, hx1, hy1):
    shell = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], float)
    hole = np.array(
        [[hx0, hy0], [hx1, hy0], [hx1, hy1], [hx0, hy1], [hx0, hy0]], float
    )
    return wkb.polygon(shell, [hole])


def _brute(comp_pdf, zones):
    """Independent reference: per-pixel rectangle comparisons (no
    shared PIP code) over the decoded core rasters."""
    acc: dict[tuple, list] = {}
    for r in comp_pdf.itertuples():
        arr = tiff.decode_f32(bytes(r.mndwi_bytes))
        a, _, c, _, e, f = json.loads(r.transform)
        halo = int(r.halo_px)
        core = arr[halo : arr.shape[0] - halo, halo : arr.shape[1] - halo]
        for (ri, ci), v in np.ndenumerate(core):
            if np.isnan(v):
                continue
            x = c + (ci + halo + 0.5) * a
            y = f + (ri + halo + 0.5) * e
            for zid, (x0, y0, x1, y1), hole in zones:
                inside = x0 <= x <= x1 and y0 <= y <= y1
                if inside and hole is not None:
                    hx0, hy0, hx1, hy1 = hole
                    if hx0 <= x <= hx1 and hy0 <= y <= hy1:
                        inside = False
                if inside:
                    acc.setdefault((zid, int(r.year)), []).append(float(v))
    return {
        k: (len(v), sum(v), min(v), max(v), sum(v) / len(v))
        for k, v in acc.items()
    }


def test_zonal_stats_matches_rectangle_brute(spark, composites):
    comp_pdf, spec = composites
    # zone rectangles in world coords (EPSG:3577-ish planar metres),
    # edges chosen off the pixel-center grid
    ox, oy = spec.tile_origin(0, 0)
    sz = spec.tile_px * spec.res_m
    zones_def = [
        ("z_west", (ox + 3.3, oy - 1.7 * sz, ox + 1.4 * sz, oy + 0.9 * sz), None),
        ("z_all", (ox - 10.0, oy - 3 * sz, ox + 4 * sz, oy + 2 * sz), None),
        (
            "z_hole",
            (ox + 0.2 * sz, oy - 1.4 * sz, ox + 2.6 * sz, oy + 0.7 * sz),
            (ox + 0.9 * sz, oy - 0.8 * sz, ox + 1.7 * sz, oy + 0.1 * sz),
        ),
    ]
    want = _brute(comp_pdf, zones_def)

    zrows = []
    for zid, (x0, y0, x1, y1), hole in zones_def:
        g = (
            _rect_wkb(x0, y0, x1, y1)
            if hole is None
            else _rect_hole_wkb(x0, y0, x1, y1, *hole)
        )
        zrows.append({"zone_id": zid, "geometry": g})
    zones_df = spark.createDataFrame(pd.DataFrame(zrows))
    comp_df = spark.createDataFrame(comp_pdf)
    got = zonal_stats(comp_df, zones_df).toPandas()

    assert len(got) == len(want)
    for r in got.itertuples():
        wn, ws, wmin, wmax, wmean = want[(r.zone_id, r.year)]
        assert r.n == wn, (r.zone_id, r.year)
        np.testing.assert_allclose(r.sum_v, ws, rtol=1e-9)
        np.testing.assert_allclose(r.min_v, wmin, rtol=1e-12)
        np.testing.assert_allclose(r.max_v, wmax, rtol=1e-12)
        np.testing.assert_allclose(r.mean_v, wmean, rtol=1e-9)


def test_zonal_stats_halo_exclusion(spark, composites):
    """A zone covering everything counts each core pixel exactly once:
    n equals the total non-NaN core pixel count per year."""
    comp_pdf, spec = composites
    zones_df = spark.createDataFrame(
        pd.DataFrame(
            [{"zone_id": "all", "geometry": _rect_wkb(-1e7, -1e7, 1e7, 1e7)}]
        )
    )
    got = (
        zonal_stats(spark.createDataFrame(comp_pdf), zones_df)
        .toPandas()
        .set_index("year")
    )
    for year, g in comp_pdf.groupby("year"):
        total = 0
        for r in g.itertuples():
            arr = tiff.decode_f32(bytes(r.mndwi_bytes))
            halo = int(r.halo_px)
            core = arr[halo : arr.shape[0] - halo, halo : arr.shape[1] - halo]
            total += int((~np.isnan(core)).sum())
        assert got.loc[int(year), "n"] == total


def test_zonal_stats_distributed_parity(spark, composites):
    """The large-zone-table path (cell-cover candidates + per-row
    geometry kernel, no driver-side zone materialization) must produce
    the same rows as the broadcast path — including hole subtraction
    and the zero-pixel-absent rule."""
    comp_pdf, spec = composites
    ox, oy = spec.tile_origin(0, 0)
    sz = spec.tile_px * spec.res_m
    zrows = [
        {"zone_id": "z_west", "geometry": _rect_wkb(ox + 3.3, oy - 1.7 * sz, ox + 1.4 * sz, oy + 0.9 * sz)},
        {"zone_id": "z_all", "geometry": _rect_wkb(ox - 10.0, oy - 3 * sz, ox + 4 * sz, oy + 2 * sz)},
        {
            "zone_id": "z_hole",
            "geometry": _rect_hole_wkb(
                ox + 0.2 * sz, oy - 1.4 * sz, ox + 2.6 * sz, oy + 0.7 * sz,
                ox + 0.9 * sz, oy - 0.8 * sz, ox + 1.7 * sz, oy + 0.1 * sz,
            ),
        },
        {"zone_id": "z_far", "geometry": _rect_wkb(9e6, 9e6, 9.1e6, 9.1e6)},
    ]
    zones_df = spark.createDataFrame(pd.DataFrame(zrows))
    comp_df = spark.createDataFrame(comp_pdf)

    dist = zonal_stats(comp_df, zones_df, broadcast_zones=False)
    # the distributed plan joins the slim cell frames — there must be a
    # join node and NO zone rows collected at plan-build time (the
    # broadcast path's closure capture); spot-check via the plan string
    plan = dist._jdf.queryExecution().executedPlan().toString()
    assert "Join" in plan

    key = ["zone_id", "year"]
    a = dist.toPandas().sort_values(key).reset_index(drop=True)
    b = (
        zonal_stats(comp_df, zones_df, broadcast_zones=True)
        .toPandas().sort_values(key).reset_index(drop=True)
    )
    assert list(a["zone_id"]) == list(b["zone_id"])
    assert list(a["year"]) == list(b["year"])
    assert list(a["n"]) == list(b["n"])
    for col in ("sum_v", "min_v", "max_v", "mean_v"):
        np.testing.assert_allclose(a[col], b[col], rtol=1e-9)
    assert "z_far" not in set(a["zone_id"])  # disjoint zone absent


def test_zonal_stats_disjoint_zone_absent(spark, composites):
    comp_pdf, _ = composites
    zones_df = spark.createDataFrame(
        pd.DataFrame(
            [{"zone_id": "far", "geometry": _rect_wkb(9e6, 9e6, 9.1e6, 9.1e6)}]
        )
    )
    got = zonal_stats(spark.createDataFrame(comp_pdf), zones_df).toPandas()
    assert len(got) == 0
