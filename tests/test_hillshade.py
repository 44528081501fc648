"""Hillshade / terrain-shadow kernel (raster.py:57-96 analog)."""

from __future__ import annotations

import numpy as np

from dea_coastlines_spark.functions.hillshade import hillshade, terrain_shadow_mask


def test_flat_terrain_illumination_matches_sun_altitude():
    flat = np.zeros((40, 40))
    hs = hillshade(flat, altitude_deg=45.0)
    assert np.allclose(hs, np.sin(np.radians(45.0)), atol=1e-9)


def test_slope_facing_sun_brighter_than_facing_away():
    # sun from NW (azimuth 315): a NW-facing slope is bright, SE-facing
    # dark. Row index grows southward (north-up raster), so (x + y)
    # rises toward the SE corner => that surface faces NW.
    y, x = np.mgrid[0:60, 0:60]
    nw_facing = (x + y) * 20.0
    se_facing = -nw_facing
    b = hillshade(nw_facing, azimuth_deg=315.0)[10:-10, 10:-10].mean()
    d = hillshade(se_facing, azimuth_deg=315.0)[10:-10, 10:-10].mean()
    assert b > 0.75 and d < 0.25


def test_shadow_mask_cleanup_sequence():
    # a steep SE-facing ramp in the middle of flat terrain -> shadow blob,
    # eroded then dilated (erode 1 / dilate 3 keeps the test tile small)
    elev = np.zeros((80, 80))
    yy, xx = np.mgrid[0:80, 0:80]
    ramp = (30 <= xx) & (xx < 50)
    elev[ramp] = ((50 - xx) * 60.0)[ramp]  # drops steeply toward +x (SE-ish)
    mask = terrain_shadow_mask(elev, erode_px=1, dilate_px=3)
    assert mask.any()
    # shadow confined to (dilated) ramp neighborhood, not the far flat area
    assert not mask[:, :20].any() and not mask[:, 65:].any()
    # dilation grows the eroded core: mask must be wider than the raw
    # thresholded-then-eroded core
    raw = hillshade(elev) <= 0.5
    assert mask.sum() > 0.5 * raw.sum()
