"""Masking stage: the engine's `contours_preprocess` analog
(coastlines/vector.py:476-697), producing analysis-ready masked MNDWI
composites per (tile, year).

Steps replicated (reference line refs):
  1. gapfill coalesce  — where(count > 5, annual, gapfill), then
                         where(count > 1)                 (vector.py:557-561)
  2. land threshold    — mndwi < 0 => land                (vector.py:563-566)
  3. temporal masking  — keep land blobs touching land in year+-1
                                                          (vector.py:256-318)
  4. all-time extents  — mean(land) over years: >0.8 stable land,
                         <0.2 persistent water            (vector.py:582-583)
  5. river masking     — black-tophat thin-water detector (vector.py:591-602)
  6. ocean connectivity— water blobs connected to persistent ocean
                         (edge-seeded)                    (vector.py:611-669)
  7. coastal buffer    — dilation of the active coastal zone
                                                          (vector.py:627-632)
  8. final mask        — mndwi kept only inside buffer where pixel is
                         (temporally-valid land) or (ocean-connected
                         water)                           (vector.py:673-675)

Spark shape: annual & gapfill composites are JOINED relationally on
(tile_x, tile_y, year) — the reference's dict-of-datasets coalesce is a
join + conditional select (SURVEY.md §2.2) — then ONE
`applyInPandas` per tile holds the full year stack (the cross-year
all-time/temporal steps force this grouping; the reference holds the
same stack in memory, vector.py:56-145). Group memory = years x tile^2
floats — bounded by tile size choice (SURVEY.md §7 hard part #4).
"""

from __future__ import annotations

import json
import warnings

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..codecs import tiff
from ..functions import label as lbl
from ..functions import morphology as mo

MASKED_SCHEMA = (
    "tile_x int, tile_y int, year int, "
    "mndwi_bytes binary, stdev_bytes binary, count_bytes binary, "
    "w int, h int, transform string, halo_px int, n_obs int"
)


def preprocess_tile_stack(
    years: list[int],
    mndwi_annual: dict[int, np.ndarray],
    count_annual: dict[int, np.ndarray],
    mndwi_gapfill: dict[int, np.ndarray],
    count_threshold: int = 5,
    min_valid_count: int = 1,
    river_tophat_radius: int = 3,
    river_threshold: float = 0.25,
    coastal_buffer_px: int = 10,
) -> dict[int, np.ndarray]:
    """Pure kernel: one tile's year stack -> masked MNDWI per year."""
    combined: dict[int, np.ndarray] = {}
    for y in years:
        ann, gap = mndwi_annual[y], mndwi_gapfill[y]
        cnt = count_annual[y]
        c = np.where(cnt > count_threshold, ann, gap)           # step 1
        # step 2: <=1 obs pixels -> NaN ("extremely vulnerable to
        # noise", vector.py:559-561 `.where(count > 1)` with no
        # fallback), NOT the gapfill value
        c = np.where(cnt > min_valid_count, c, np.nan)
        combined[y] = c.astype(np.float32)

    land = {y: (combined[y] < 0.0) & ~np.isnan(combined[y]) for y in years}

    # step 3: temporal masking (land blob kept iff touching land in year+-1)
    tland: dict[int, np.ndarray] = {}
    for i, y in enumerate(years):
        neigh = np.zeros_like(land[y])
        if i > 0:
            neigh |= land[years[i - 1]]
        if i + 1 < len(years):
            neigh |= land[years[i + 1]]
        tland[y] = lbl.keep_touching(land[y], neigh & land[y]) if len(years) > 1 else land[y]

    # step 4: all-time land fraction
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        stack = np.stack([np.where(np.isnan(combined[y]), np.nan, land[y].astype(np.float32)) for y in years])
        land_frac = np.nanmean(stack, axis=0)
    stable_land = land_frac > 0.8
    persistent_water = land_frac < 0.2

    # step 6: ocean = persistent water connected to the tile edge
    ocean_seed = lbl.edge_connected(persistent_water | np.isnan(land_frac))

    # step 7: coastal analysis buffer around the active zone
    active = ~(stable_land | persistent_water)
    coastal_zone = mo.dilate(active | _boundary_ring(stable_land, ocean_seed), coastal_buffer_px)

    out: dict[int, np.ndarray] = {}
    for y in years:
        water = (combined[y] >= 0.0) & ~np.isnan(combined[y])
        # step 5: thin-water river response masked out of the water side
        with np.errstate(invalid="ignore"):
            tophat = mo.black_tophat(np.nan_to_num(combined[y], nan=1.0), river_tophat_radius)
        river = water & (tophat > river_threshold) & ~ocean_seed
        ocean_water = lbl.keep_touching(water & ~river, (ocean_seed & water))
        keep = coastal_zone & (tland[y] | ocean_water)
        out[y] = np.where(keep, combined[y], np.nan).astype(np.float32)
    return out


def _boundary_ring(stable_land: np.ndarray, ocean: np.ndarray) -> np.ndarray:
    """Pixels where land meets ocean (1-px coastline band)."""
    return mo.dilate(stable_land, 1) & mo.dilate(ocean, 1)


def masked_composites(annual: DataFrame, gapfill: DataFrame) -> DataFrame:
    """Join annual+gapfill composites and apply the masking kernel per tile."""
    g = gapfill.select(
        "tile_x", "tile_y", "year",
        gapfill["mndwi_bytes"].alias("gf_mndwi_bytes"),
        gapfill["count_bytes"].alias("gf_count_bytes"),
    )
    # LEFT join: a (tile, year) whose gapfill composite is missing must
    # not silently vanish from the output — the kernel treats a missing
    # gapfill as all-NaN (coalesce then falls through to NaN, the same
    # thing the reference produces when the 3-year window is empty)
    joined = annual.join(g, ["tile_x", "tile_y", "year"], "left")

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("year")
        years = [int(y) for y in pdf["year"]]
        ann = {int(r.year): tiff.decode_f32(bytes(r.mndwi_bytes)) for r in pdf.itertuples()}
        cnt = {int(r.year): tiff.decode_f32(bytes(r.count_bytes)) for r in pdf.itertuples()}
        gap = {
            int(r.year): (
                tiff.decode_f32(bytes(r.gf_mndwi_bytes))
                if r.gf_mndwi_bytes is not None
                else np.full_like(ann[int(r.year)], np.nan)
            )
            for r in pdf.itertuples()
        }
        masked = preprocess_tile_stack(years, ann, cnt, gap)
        rows = []
        for r in pdf.itertuples():
            rows.append(
                {
                    "tile_x": int(r.tile_x), "tile_y": int(r.tile_y), "year": int(r.year),
                    "mndwi_bytes": tiff.encode_f32(masked[int(r.year)]),
                    "stdev_bytes": bytes(r.stdev_bytes),
                    "count_bytes": bytes(r.count_bytes),
                    "w": int(r.w), "h": int(r.h),
                    "transform": r.transform, "halo_px": int(r.halo_px),
                    "n_obs": int(r.n_obs),
                }
            )
        return pd.DataFrame(rows)

    return joined.groupBy("tile_x", "tile_y").applyInPandas(kernel, MASKED_SCHEMA)
