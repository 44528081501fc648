"""Deterministic synthetic coastal-tile corpus.

Replaces the reference's satellite inputs (ODC virtual product,
coastlines/raster.py:155-241) with an analytic coastline so every
stage has a closed-form oracle and zero external data:

    shoreline   y_coast(x, t) = AMP * sin(2*pi*x/WAVELEN + PHASE)
                              + EROSION_M_PER_YEAR(x) * (t - YEAR0)
                              + tide_m(t, obs)
    water index mndwi(x, y, t) = tanh((y - y_coast(x, t)) / BEACH_W)
                               + obs noise          (water > 0, land < 0,
                                 matching the reference's MNDWI>0 water
                                 convention, coastlines/vector.py:563-566)

One row per (tile, year, observation). Tiles are stored WITH a halo
(reference's 0.05-degree buffer, coastlines/raster.py:547,684-689) so
stencil ops are seamless; the caption carries the GDAL-style transform
of the halo-inclusive image plus tile/year/obs metadata (the reference
recovers the same from file paths, coastlines/vector.py:113-132).

Everything is a pure function of (spec, tile_x, tile_y, year, obs) —
the distributed generator (Spark mapInPandas over a range) and the
driver-side one (tests) produce byte-identical rows.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

import numpy as np

from ..codecs import image as img_codec


@dataclass(frozen=True)
class CorpusSpec:
    tile_px: int = 128          # core tile size in pixels
    halo_px: int = 8            # stored halo on each side
    res_m: float = 30.0         # pixel size (Landsat 30 m, raster.py:206)
    tiles_x: int = 4
    tiles_y: int = 2
    year0: int = 2000
    year1: int = 2005           # inclusive
    obs_per_year: int = 5
    seed: int = 42
    fmt: str = "png"            # png | jpeg | tiff | mixed (deterministic per key)
    # coastline shape
    amp_m: float = 600.0        # sinusoid amplitude
    wavelen_m: float = 6000.0
    phase: float = 0.7
    beach_w_m: float = 90.0     # tanh ramp width (~3 px)
    erosion_m_per_year: float = -12.0   # retreat rate (varies by x below)
    tide_amp_m: float = 40.0    # apparent shoreline shift from tide
    noise_sd: float = 0.08
    cloud_frac: float = 0.08
    # world placement: tile (0,0) core origin at (x0_m, y0_m)
    x0_m: float = 0.0
    y0_m: float = -3000.0

    @property
    def core_m(self) -> float:
        return self.tile_px * self.res_m

    @property
    def years(self) -> list[int]:
        return list(range(self.year0, self.year1 + 1))

    def tile_origin(self, tile_x: int, tile_y: int) -> tuple[float, float]:
        """World coords of the core's lower-left corner."""
        return self.x0_m + tile_x * self.core_m, self.y0_m + tile_y * self.core_m

    def tile_core_bounds(self, tile_x: int, tile_y: int) -> tuple[float, float, float, float]:
        x0, y0 = self.tile_origin(tile_x, tile_y)
        return x0, y0, x0 + self.core_m, y0 + self.core_m


def y_coast(spec: CorpusSpec, x: np.ndarray, year: int, tide_m: float = 0.0) -> np.ndarray:
    """Closed-form shoreline y position at world-x for a given year/tide."""
    x = np.asarray(x, np.float64)
    ero = spec.erosion_m_per_year * (1.0 + 0.5 * np.sin(2 * np.pi * x / (3.7 * spec.wavelen_m)))
    return (
        spec.amp_m * np.sin(2 * np.pi * x / spec.wavelen_m + spec.phase)
        + ero * (year - spec.year0)
        + tide_m
    )


def tide_for(spec: CorpusSpec, year: int, obs: int) -> float:
    """Deterministic pseudo-tide per observation (replaces FES2014,
    coastlines/raster.py:577): a fixed harmonic of (year, obs)."""
    t = (year - spec.year0) * spec.obs_per_year + obs
    return spec.tide_amp_m * np.sin(2.399963 * t + 0.5)  # golden-angle stride


_M = np.uint64(0xFFFFFFFFFFFFFFFF)


def _splitmix(z: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, vectorized (counter-based hash RNG)."""
    z = (z + np.uint64(0x9E3779B97F4A7C15)) & _M
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _M
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _M
    return z ^ (z >> np.uint64(31))


def _hash_normal(gx: np.ndarray, gy: np.ndarray, year: int, obs: int, seed: int, salt: int) -> np.ndarray:
    """Deterministic standard-normal field keyed on GLOBAL pixel coords.

    World-consistent noise is what makes the halo+clip discipline exact:
    a pixel has the same value no matter which tile's halo renders it
    (the synthetic analog of 'the satellite saw one value there').
    """
    with np.errstate(over="ignore"):
        k = (
            gx.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            + gy.astype(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F)
            + np.uint64(year) * np.uint64(0x165667B19E3779F9)
            + np.uint64(obs) * np.uint64(0x27D4EB2F165667C5)
            + np.uint64(seed) + np.uint64(salt)
        ) & _M
    h1 = _splitmix(k)
    h2 = _splitmix(h1 ^ np.uint64(0xD6E8FEB86659FD93))
    u1 = (h1 >> np.uint64(11)).astype(np.float64) * (2.0**-53)
    u2 = (h2 >> np.uint64(11)).astype(np.float64) * (2.0**-53)
    u1 = np.maximum(u1, 1e-300)
    return np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)


def cloud_rects(spec: CorpusSpec, year: int, obs: int) -> list[tuple[float, float, float, float]]:
    """World-space cloud rectangles for one observation epoch (shared by
    all tiles -> overlapping halos see identical nodata). Analog of the
    reference's cloud masking (coastlines/raster.py:223-234)."""
    rng = np.random.default_rng(
        np.array([spec.seed, 0xC10D, year, obs], dtype=np.uint64)
    )
    dom_w = spec.tiles_x * spec.core_m + 2 * spec.halo_px * spec.res_m
    dom_h = spec.tiles_y * spec.core_m + 2 * spec.halo_px * spec.res_m
    dom_x0 = spec.x0_m - spec.halo_px * spec.res_m
    dom_y0 = spec.y0_m - spec.halo_px * spec.res_m
    lam = spec.cloud_frac * 4 * spec.tiles_x * spec.tiles_y
    n_clouds = int(rng.poisson(lam))
    rects = []
    for _ in range(n_clouds):
        cw = float(rng.uniform(0.1, 0.35)) * spec.core_m
        ch = float(rng.uniform(0.1, 0.35)) * spec.core_m
        cx = dom_x0 + float(rng.uniform(0, 1)) * (dom_w - cw)
        cy = dom_y0 + float(rng.uniform(0, 1)) * (dom_h - ch)
        rects.append((cx, cy, cx + cw, cy + ch))
    return rects


def make_tile(
    spec: CorpusSpec, tile_x: int, tile_y: int, year: int, obs: int
) -> tuple[np.ndarray, float]:
    """Render one halo-inclusive observation tile. Returns (mndwi, tide_m).

    Pure function of (spec, GLOBAL position, year, obs): overlapping halo
    pixels of adjacent tiles are bit-identical.
    """
    n = spec.tile_px + 2 * spec.halo_px
    ox, oy = spec.tile_origin(tile_x, tile_y)
    # pixel centers; row 0 = top (north-up, matching GDAL transform)
    cols = np.arange(n) - spec.halo_px
    rows_from_bottom = (n - 1 - np.arange(n)) - spec.halo_px
    xs = ox + (cols + 0.5) * spec.res_m
    ys = oy + (rows_from_bottom + 0.5) * spec.res_m
    tide = tide_for(spec, year, obs)
    coast = y_coast(spec, xs, year, tide)
    base = np.tanh((ys[:, None] - coast[None, :]) / spec.beach_w_m)

    # global integer pixel grid for the hash-noise field
    gx = (tile_x * spec.tile_px + cols)[None, :] + np.zeros((n, 1), np.int64)
    gy = (tile_y * spec.tile_px + rows_from_bottom)[:, None] + np.zeros((1, n), np.int64)
    noise = _hash_normal(gx, gy, year, obs, spec.seed, salt=0)
    noisy = base + spec.noise_sd * noise

    # world-space clouds -> NaN
    for x0, y0, x1, y1 in cloud_rects(spec, year, obs):
        cmask = (xs[None, :] >= x0) & (xs[None, :] <= x1) & (ys[:, None] >= y0) & (ys[:, None] <= y1)
        noisy[cmask] = np.nan
    return np.clip(noisy, -1.0, 1.0).astype(np.float32), float(tide)


def make_row(spec: CorpusSpec, tile_x: int, tile_y: int, year: int, obs: int) -> dict:
    """One tiles-table row (the BASELINE.json input_hint schema)."""
    arr, tide = make_tile(spec, tile_x, tile_y, year, obs)
    n = arr.shape[0]
    ox, oy = spec.tile_origin(tile_x, tile_y)
    # GDAL affine of the halo-inclusive image: x = c + col*a, y = f + row*e
    transform = [
        spec.res_m, 0.0, ox - spec.halo_px * spec.res_m,
        0.0, -spec.res_m, oy + (spec.tile_px + spec.halo_px) * spec.res_m,
    ]
    caption = json.dumps(
        {
            "tile_x": tile_x, "tile_y": tile_y, "year": year, "obs": obs,
            "crs": "EPSG:3577", "transform": transform,
            "halo_px": spec.halo_px, "tide_m": round(tide, 4), "kind": "mndwi",
        },
        sort_keys=True,
    )
    fmt = spec.fmt
    if fmt == "mixed":
        # deterministic per-key cycle so every format appears in any
        # non-trivial corpus (exercises the png/jpeg/tiff decode paths)
        fmt = ("png", "jpeg", "tiff")[(tile_x * 7 + tile_y * 13 + year + obs) % 3]
    return {
        "image_id": f"t{tile_x:03d}_{tile_y:03d}_{year}_{obs:02d}",
        "bytes": img_codec.encode_tile(arr, fmt),
        "w": n, "h": n, "fmt": fmt,
        "caption": caption,
        "phash": img_codec.phash64(arr),
    }


def iter_keys(spec: CorpusSpec):
    for tx in range(spec.tiles_x):
        for ty in range(spec.tiles_y):
            for year in spec.years:
                for obs in range(spec.obs_per_year):
                    yield tx, ty, year, obs


def generate_pandas(spec: CorpusSpec):
    """Driver-side corpus (tests / tiny scales)."""
    import pandas as pd

    return pd.DataFrame([make_row(spec, *k) for k in iter_keys(spec)])


TILES_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long"
)


def generate_spark(spark, spec: CorpusSpec):
    """Distributed corpus: enumerate keys as a DataFrame, render tiles in
    Arrow batches on executors. This is the 100 TB-shape path — synthesis
    parallelism equals tile-key partitioning, no driver bottleneck."""
    import pandas as pd
    from pyspark.sql import functions as F

    keys = spark.range(
        spec.tiles_x * spec.tiles_y * len(spec.years) * spec.obs_per_year
    ).select(
        (F.col("id") % spec.tiles_x).cast("int").alias("tx"),
        ((F.col("id") / spec.tiles_x) % spec.tiles_y).cast("int").alias("ty"),
        (
            spec.year0
            + (F.col("id") / (spec.tiles_x * spec.tiles_y)) % len(spec.years)
        ).cast("int").alias("year"),
        (
            F.col("id") / (spec.tiles_x * spec.tiles_y * len(spec.years))
        ).cast("int").alias("obs"),
    )

    def render(batches):
        for pdf in batches:
            yield pd.DataFrame(
                [
                    make_row(spec, int(r.tx), int(r.ty), int(r.year), int(r.obs))
                    for r in pdf.itertuples()
                ]
            )

    return keys.repartition(max(8, spec.tiles_x * spec.tiles_y)).mapInPandas(
        render, TILES_SCHEMA
    )
