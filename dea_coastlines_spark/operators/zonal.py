"""Zonal statistics: per-polygon aggregates of raster pixel values
(the distributed analog of rasterstats/xarray "zonal stats"; the
reference computes the same shape inline when it masks composites by
geomorphology/ocean polygons and summarises per region, e.g.
coastlines/raster.py tide-attribute summaries and vector.py's
certainty-mask statistics).

Spark-first shape — the same two-phase design as operators/rollup.py:

1. **Partial phase (no shuffle):** one mapInPandas pass over composite
   tiles. Each kernel call decodes the tile's float raster, masks it
   to each overlapping zone polygon (pixel-center point-in-polygon,
   holes subtracted — the engine's standard burn rule), and emits ONE
   partial row (n, sum, min, max) per (zone, tile, year). The halo is
   excluded so pixels shared by neighbouring tiles count exactly once.
2. **Combine phase (one small shuffle):** groupBy (zone, year) sums
   the partials — rows entering the shuffle are bounded by
   zones × tiles, not pixels.

Zones are a small dimension collected and closure-broadcast (with a
per-tile bbox prefilter so a tile only tests polygons it can touch).
For a large zone table, pre-join tiles to zones with
operators/spatial_join.py's cell-cover candidates and group the burn
by zone instead — the kernel below is unchanged.

Mean/count/sum/min/max only: they re-aggregate associatively. Median
over zones would need the raw pixel distribution — use the grouped
composite kernels for that.
"""

from __future__ import annotations

import json
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..codecs import tiff
from ..geometry import wkb
from ..geometry.algorithms import points_in_polygon


def zonal_stats(
    composites: DataFrame,
    zones: DataFrame,
    value_bytes_col: str = "mndwi_bytes",
    zone_id_col: str = "zone_id",
    geom_col: str = "geometry",
) -> DataFrame:
    """Per-(zone, year) stats of a composite raster band.

    composites: operators/composite.py output — (tile_x, tile_y, year,
    <value_bytes_col> float32 tiff, w, h, transform JSON, halo_px).
    zones: (zone_id, geometry WKB (Multi)Polygon) — small dimension.

    Out: (zone_id, year, n, sum_v, mean_v, min_v, max_v); NaN pixels
    (cloud/nodata) are excluded from every statistic; zones with zero
    valid pixels are absent (matching a groupBy over pixel rows).
    """
    zrows = zones.select(zone_id_col, geom_col).collect()
    zdata = [
        (r[0], wkb.polygon_rings(bytes(r[1])), wkb.bbox(bytes(r[1])))
        for r in zrows
    ]

    zid_type = next(
        f.dataType.simpleString()
        for f in zones.schema.fields
        if f.name == zone_id_col
    )
    out_schema = (
        f"zone_id {zid_type}, year int, n long, sum_v double, "
        "min_v double, max_v double"
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                arr = tiff.decode_f32(bytes(getattr(r, value_bytes_col)))
                a, _, c, _, e, f = json.loads(r.transform)
                halo = int(r.halo_px)
                core = arr[halo : arr.shape[0] - halo, halo : arr.shape[1] - halo]
                ny, nx = core.shape
                # pixel-center coords of the halo-free core
                xs = c + (np.arange(halo, halo + nx) + 0.5) * a
                ys = f + (np.arange(halo, halo + ny) + 0.5) * e
                tx0, tx1 = xs.min() - abs(a), xs.max() + abs(a)
                ty0, ty1 = ys.min() - abs(e), ys.max() + abs(e)
                gx, gy = np.meshgrid(xs, ys)
                flat_x, flat_y = gx.ravel(), gy.ravel()
                vals = core.ravel()
                for zid, rings, (bx0, by0, bx1, by1) in zdata:
                    if bx1 < tx0 or bx0 > tx1 or by1 < ty0 or by0 > ty1:
                        continue
                    inside = np.zeros(len(flat_x), bool)
                    for shell, holes in rings:
                        hit = points_in_polygon(flat_x, flat_y, shell)
                        for h in holes:
                            hit &= ~points_in_polygon(
                                flat_x, flat_y, h, boundary_counts=False
                            )
                        inside |= hit
                    v = vals[inside]
                    v = v[~np.isnan(v)]
                    if len(v) == 0:
                        continue
                    rows.append(
                        {
                            "zone_id": zid,
                            "year": int(r.year),
                            "n": int(len(v)),
                            "sum_v": float(v.sum(dtype=np.float64)),
                            "min_v": float(v.min()),
                            "max_v": float(v.max()),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["zone_id", "year", "n", "sum_v", "min_v", "max_v"]
            )

    partial = composites.select(
        "tile_x", "tile_y", "year", value_bytes_col, "transform", "halo_px"
    ).mapInPandas(kernel, out_schema)
    return (
        partial.groupBy("zone_id", "year")
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_v").alias("sum_v"),
            F.min("min_v").alias("min_v"),
            F.max("max_v").alias("max_v"),
        )
        .withColumn("mean_v", F.col("sum_v") / F.col("n"))
    )
