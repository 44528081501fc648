"""Hillshade + terrain-shadow mask (pure numpy).

Replaces the reference's `terrain_shadow` masking
(coastlines/raster.py:57-96: dea_tools `hillshade` on SRTM elevation,
threshold <= 0.5, then binary erosion(5)/dilation(15) cleanup). The
reference disables it in the test path (raster.py:560); the engine
ships it as a per-tile kernel usable inside the decode/mask Arrow UDF
when an elevation band is present.

Hillshade is the standard Horn (1981) illumination model — the same
formula GDAL's `gdaldem hillshade` and dea_tools use: per-pixel slope/
aspect from 3x3 central differences, dotted with the sun vector.
"""

from __future__ import annotations

import numpy as np

from . import morphology


def hillshade(
    elev: np.ndarray,
    azimuth_deg: float = 315.0,
    altitude_deg: float = 45.0,
    cell_m: float = 30.0,
) -> np.ndarray:
    """Illumination in [0, 1] per pixel (Horn's method, edge-replicated)."""
    e = np.asarray(elev, np.float64)
    p = np.pad(e, 1, mode="edge")
    # Horn kernel: weighted central differences over the 3x3 window
    dzdx = (
        (p[:-2, 2:] + 2 * p[1:-1, 2:] + p[2:, 2:])
        - (p[:-2, :-2] + 2 * p[1:-1, :-2] + p[2:, :-2])
    ) / (8.0 * cell_m)
    dzdy = (
        (p[2:, :-2] + 2 * p[2:, 1:-1] + p[2:, 2:])
        - (p[:-2, :-2] + 2 * p[:-2, 1:-1] + p[:-2, 2:])
    ) / (8.0 * cell_m)
    slope = np.arctan(np.hypot(dzdx, dzdy))
    aspect = np.arctan2(dzdy, -dzdx)
    az = np.radians(360.0 - azimuth_deg + 90.0)
    alt = np.radians(altitude_deg)
    shaded = np.sin(alt) * np.cos(slope) + np.cos(alt) * np.sin(slope) * np.cos(
        az - aspect
    )
    return np.clip(shaded, 0.0, 1.0)


def terrain_shadow_mask(
    elev: np.ndarray,
    azimuth_deg: float = 315.0,
    altitude_deg: float = 45.0,
    cell_m: float = 30.0,
    threshold: float = 0.5,
    erode_px: int = 5,
    dilate_px: int = 15,
) -> np.ndarray:
    """Boolean shadow mask with the reference's exact cleanup sequence
    (hillshade <= threshold -> erosion(5) -> dilation(15),
    coastlines/raster.py:88-95). True = shadowed (mask out)."""
    shadow = hillshade(elev, azimuth_deg, altitude_deg, cell_m) <= threshold
    shadow = morphology.erode(shadow, erode_px)
    return morphology.dilate(shadow, dilate_px)
