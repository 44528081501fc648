"""Annual composite stage: tiles -> per-(tile, year) median/std/count.

Reference semantics: `tidal_composite` (coastlines/raster.py:340-405) —
pixelwise median / std / valid-count over the year's observations, after
the tide-range subset (`load_tidal_subset`, coastlines/raster.py:330-337).

Spark plan (scale notes):
  * caption parsing is JVM-side `from_json` -> tide filtering and the
    per-tile tide-cutoff aggregation are pure DataFrame ops; Catalyst
    prunes `bytes` out of the scan for the cutoff aggregation (only
    caption columns are touched there).
  * the pixel stack never leaves Python: ONE `applyInPandas` per
    (tile_x, tile_y, year) group does decode -> stack -> nanmedian/std/
    count -> float32-TIFF re-encode. Group size = obs_per_year tiles
    (bounded memory: the dask-chunk analog, raster.py:549).
  * `repartition` before the grouped map uses (tile_x, tile_y) so the
    subsequent per-tile gapfill window reuses the shuffle partitioning.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, DoubleType, IntegerType, StringType, StructField, StructType,
)

from ..codecs import image as img_codec
from ..codecs import tiff

CAPTION_SCHEMA = StructType(
    [
        StructField("tile_x", IntegerType()),
        StructField("tile_y", IntegerType()),
        StructField("year", IntegerType()),
        StructField("obs", IntegerType()),
        StructField("crs", StringType()),
        StructField("transform", ArrayType(DoubleType())),
        StructField("halo_px", IntegerType()),
        StructField("tide_m", DoubleType()),
        # reserved metadata kind tag (sources.tiles parses it); unknown
        # JSON fields are ignored by from_json, so carrying the superset
        # here keeps this the ONE caption schema for the whole engine
        StructField("kind", StringType()),
    ]
)

COMPOSITE_SCHEMA = (
    "tile_x int, tile_y int, year int, "
    "mndwi_bytes binary, stdev_bytes binary, count_bytes binary, "
    "w int, h int, transform string, halo_px int, n_obs int"
)


_PARSED_COLS = ("tile_x", "tile_y", "year", "obs", "transform", "halo_px", "tide_m")


def with_caption(tiles: DataFrame) -> DataFrame:
    """Parse the caption JSON into columns (JVM-side, no Python).
    Idempotent: a frame already carrying ALL parsed columns passes
    through; a frame with only a partial set (e.g. a snapshot-table
    read that materialized tile_x/tile_y/year as partition columns)
    is re-parsed after dropping the partial columns."""
    if all(c in tiles.columns for c in _PARSED_COLS):
        return tiles
    tiles = tiles.drop(*[c for c in _PARSED_COLS if c in tiles.columns])
    return tiles.withColumn("meta", F.from_json("caption", CAPTION_SCHEMA)).select(
        "*",
        F.col("meta.tile_x").alias("tile_x"),
        F.col("meta.tile_y").alias("tile_y"),
        F.col("meta.year").alias("year"),
        F.col("meta.obs").alias("obs"),
        F.col("meta.transform").alias("transform"),
        F.col("meta.halo_px").alias("halo_px"),
        F.col("meta.tide_m").alias("tide_m"),
    ).drop("meta")


def tide_filtered(tiles_meta: DataFrame) -> DataFrame:
    """Keep observations inside the per-tile tide cutoff window.

    Reference: `tide_cutoffs` centre +- 0.25*(max-min) over ALL years of a
    tile (coastlines/raster.py:283-289), then subset + drop empty
    timesteps (raster.py:330-337). Row-level tide makes this a pure
    relational filter — it prunes rows BEFORE the expensive decode UDF
    (the reference's own early-pruning optimization, SURVEY.md §4).
    """
    cutoffs = tiles_meta.groupBy("tile_x", "tile_y").agg(
        ((F.min("tide_m") + F.max("tide_m")) / 2.0).alias("tide_centre"),
        ((F.max("tide_m") - F.min("tide_m")) * 0.25).alias("tide_halfwin"),
    )
    return tiles_meta.join(F.broadcast(cutoffs), ["tile_x", "tile_y"]).filter(
        (F.col("tide_m") >= F.col("tide_centre") - F.col("tide_halfwin"))
        & (F.col("tide_m") <= F.col("tide_centre") + F.col("tide_halfwin"))
    ).drop("tide_centre", "tide_halfwin")


def _nan_median_std_count(stack: np.ndarray):
    """Pixelwise nan-median / nan-std(ddof=1) / finite-count over the
    time axis in one sort + two sums — ~2x faster than
    np.nanmedian+np.nanstd (which each make masked copies), exact to
    float32 for values in [-1, 1]. Matches raster.py:379-384 semantics."""
    finite = np.isfinite(stack)
    n = finite.sum(axis=0)
    # float64 BEFORE squaring: squaring in float32 loses ~1e-8 relative
    # per element, which the tot2 - tot^2/n cancellation amplifies to
    # ~3e-4 absolute std error (caught by a hypothesis property test);
    # in float64 the error stays below the float32 output rounding.
    s = np.where(finite, stack, 0.0).astype(np.float64)
    tot = s.sum(axis=0)
    tot2 = (s * s).sum(axis=0)
    nf = n.astype(np.float64)
    with np.errstate(all="ignore"):
        var = (tot2 - tot * tot / nf) / (nf - 1)
        std = np.sqrt(np.maximum(var, 0.0)).astype(np.float32)
        std[n < 2] = np.nan
        srt = np.sort(stack, axis=0)  # NaN sorts last
        k = n - 1
        lo = np.take_along_axis(srt, np.maximum(k // 2, 0)[None, ...], axis=0)[0]
        hi = np.take_along_axis(srt, np.maximum((k + 1) // 2, 0)[None, ...], axis=0)[0]
        med = ((lo + hi) * np.float32(0.5)).astype(np.float32)
        med[n == 0] = np.nan
    return med, std, n.astype(np.float32)


def _composite_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Grouped-map kernel: one (tile, year) stack -> composite row."""
    first = pdf.iloc[0]
    stack = np.stack(
        [img_codec.decode_tile(bytes(b), f) for b, f in zip(pdf["bytes"], pdf["fmt"])]
    )
    med, std, cnt = _nan_median_std_count(stack)
    return pd.DataFrame(
        [
            {
                "tile_x": int(first["tile_x"]),
                "tile_y": int(first["tile_y"]),
                "year": int(first["year"]),
                "mndwi_bytes": tiff.encode_f32(med),
                "stdev_bytes": tiff.encode_f32(std),
                "count_bytes": tiff.encode_f32(cnt),
                "w": int(first["w"]),
                "h": int(first["h"]),
                "transform": json.dumps(list(first["transform"])),
                "halo_px": int(first["halo_px"]),
                "n_obs": len(pdf),
            }
        ]
    )


def annual_composites(tiles: DataFrame, apply_tide_filter: bool = True) -> DataFrame:
    """tiles (input_hint schema) -> composites, one row per (tile, year)."""
    meta = with_caption(tiles)
    if apply_tide_filter:
        meta = tide_filtered(meta)
    return meta.select(
        "tile_x", "tile_y", "year", "bytes", "fmt", "w", "h", "transform", "halo_px"
    ).groupBy("tile_x", "tile_y", "year").applyInPandas(_composite_group, COMPOSITE_SCHEMA)


def gapfill_composites(tiles: DataFrame, apply_tide_filter: bool = True) -> DataFrame:
    """3-year rolling composites: the reference's gapfill stack
    (export_annual_gapfill, coastlines/raster.py:408-501) re-expressed as
    the shuffle-native form of a rangeBetween(-1, 1) frame — a 3-way
    self-union keyed to (year-1, year, year+1) then one grouped map
    (SURVEY.md §2.5). Each task holds <=3 years of one tile."""
    meta = with_caption(tiles)
    if apply_tide_filter:
        meta = tide_filtered(meta)
    narrow = meta.select(
        "tile_x", "tile_y", "year", "bytes", "fmt", "w", "h", "transform", "halo_px"
    )
    # one scan, three shuffle keys per row (vs a 3-way self-union which
    # would read the source three times): explode is JVM-side
    shifted = narrow.withColumn(
        "target_year",
        F.explode(
            F.array(
                (F.col("year") - 1).cast("int"),
                F.col("year").cast("int"),
                (F.col("year") + 1).cast("int"),
            )
        ),
    )
    # keep only target years that exist as real years (reference composites
    # (prev, cur, next) only for produced years)
    years = narrow.select("year").distinct().withColumnRenamed("year", "target_year")
    shifted = shifted.join(F.broadcast(years), "target_year")
    return (
        shifted.drop("year")
        .withColumnRenamed("target_year", "year")
        .groupBy("tile_x", "tile_y", "year")
        .applyInPandas(_composite_group, COMPOSITE_SCHEMA)
    )
