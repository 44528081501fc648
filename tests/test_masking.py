"""Masking stage tests: crafted fields with known expected outcomes
(inland lake removed, ocean kept, coast preserved, temporal flicker
removed) — numpy-oracle style per SURVEY.md §5."""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pytest

from dea_coastlines_spark.codecs import tiff
from dea_coastlines_spark.operators import masking


def _field(n=60, coast_row=30, lake=False, flicker_blob=False):
    """coast: rows < coast_row are water (+0.8), rows >= are land (-0.8)."""
    a = np.full((n, n), -0.8, np.float32)
    a[:coast_row, :] = 0.8
    if lake:
        a[45:50, 20:25] = 0.9  # inland lake (not ocean-connected)
    if flicker_blob:
        a[55:58, 50:53] = -0.9  # handled by caller per year
    return a


def test_kernel_inland_lake_masked_out():
    years = [2000, 2001, 2002]
    ann = {y: _field(lake=True) for y in years}
    cnt = {y: np.full((60, 60), 10.0, np.float32) for y in years}
    gap = {y: _field(lake=True) for y in years}
    out = masking.preprocess_tile_stack(years, ann, cnt, gap)
    m = out[2001]
    assert np.isnan(m[47, 22])          # lake removed (not ocean-connected)
    assert not np.isnan(m[29, 30])      # water at the coast kept
    assert not np.isnan(m[31, 30])      # land at the coast kept
    assert np.isnan(m[59, 30])          # deep inland outside buffer masked


def test_kernel_gapfill_coalesce_low_count():
    years = [2000, 2001, 2002]
    ann = {y: _field() * 0 + 0.5 for y in years}       # annual says water
    gap = {y: _field() for y in years}                 # gapfill has the coast
    cnt = {y: np.full((60, 60), 2.0, np.float32) for y in years}  # low count
    out = masking.preprocess_tile_stack(years, ann, cnt, gap)
    # with count <= 5 the gapfill field must be used: land exists below coast
    assert np.nanmin(out[2001]) < 0


def test_kernel_temporal_flicker_removed():
    """A land blob present only in ONE year (not in year+-1) is removed."""
    years = [2000, 2001, 2002]
    base = _field()
    flicker = base.copy()
    flicker[10:14, 40:44] = -0.9  # island in the water, only in 2001
    ann = {2000: base, 2001: flicker, 2002: base}
    cnt = {y: np.full((60, 60), 10.0, np.float32) for y in years}
    out = masking.preprocess_tile_stack(years, ann, cnt, ann.copy())
    # flicker blob is land in 2001 but not temporally contiguous -> masked
    assert np.isnan(out[2001][11, 41]) or out[2001][11, 41] >= 0


def test_kernel_persistent_island_kept():
    years = [2000, 2001, 2002]
    base = _field()
    base[10:16, 40:46] = -0.9  # island in all years, ocean around it
    ann = {y: base.copy() for y in years}
    cnt = {y: np.full((60, 60), 10.0, np.float32) for y in years}
    out = masking.preprocess_tile_stack(years, ann, cnt, ann.copy())
    assert not np.isnan(out[2001][12, 42])  # island land kept


def test_masked_composites_spark(spark):
    years = [2000, 2001]
    rows_a, rows_g = [], []
    transform = json.dumps([30.0, 0.0, 0.0, 0.0, -30.0, 1800.0])
    for y in years:
        f = _field()
        common = dict(
            tile_x=0, tile_y=0, year=y, w=60, h=60,
            transform=transform, halo_px=0, n_obs=5,
            stdev_bytes=tiff.encode_f32(np.zeros((60, 60), np.float32)),
            count_bytes=tiff.encode_f32(np.full((60, 60), 10.0, np.float32)),
        )
        rows_a.append({**common, "mndwi_bytes": tiff.encode_f32(f)})
        rows_g.append({**common, "mndwi_bytes": tiff.encode_f32(f)})
    annual = spark.createDataFrame(pd.DataFrame(rows_a))
    gapfill = spark.createDataFrame(pd.DataFrame(rows_g))
    out = masking.masked_composites(annual, gapfill).toPandas()
    assert len(out) == 2
    m = tiff.decode_f32(bytes(out[out.year == 2000].iloc[0].mndwi_bytes))
    assert not np.isnan(m[29, 30]) and not np.isnan(m[31, 30])  # coast kept
    assert np.isnan(m[59, 30])  # deep inland masked
