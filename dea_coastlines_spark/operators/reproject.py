"""CRS reprojection + geodesic column operators (gdf.to_crs /
pyproj.Geod.inv parity; reference coastlines/vector.py:856-862, 1591,
raster.py:206).

All math is the vectorized pure-numpy projection library in
geometry/crs.py; this module is only Spark plumbing:

  * ``reproject``       — rewrite a WKB geometry column between CRSs.
    One Arrow batch = one vectorized transform call: every vertex of
    every geometry in the batch is concatenated, projected once, and
    split back (no per-geometry trig dispatch).
  * ``project_points``  — lon/lat columns -> planar x/y columns.
  * ``with_geodesic``   — Vincenty forward/back azimuth + distance
    columns between two lon/lat pairs.

Scale: all three are mapInPandas over the rows they touch — no
shuffle, no driver participation; the projection constants are
closure-captured module constants (no broadcast needed).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..geometry import crs as crs_mod
from ..geometry import wkb


def reproject(
    df: DataFrame,
    src: str,
    dst: str,
    geom_col: str = "geometry",
) -> DataFrame:
    """Rewrite `geom_col` WKB from `src` to `dst` CRS (EPSG strings)."""
    if crs_mod._parse(src)[0] == crs_mod._parse(dst)[0]:
        return df
    fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    )

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf
                continue
            # batch-vectorize: parse all geometries, project ALL
            # vertices in one call, rebuild
            parsed = [wkb.parse(bytes(g)) for g in pdf[geom_col]]
            counts = []
            chunks = []
            for t, payload in parsed:
                c = _flatten(t, payload)
                counts.append(c.shape[0])
                chunks.append(c)
            allc = (
                np.concatenate(chunks) if chunks else np.zeros((0, 2))
            )
            tx, ty = crs_mod.transform_xy(allc[:, 0], allc[:, 1], src, dst)
            moved = np.column_stack([tx, ty])
            out = []
            pos = 0
            for (g, n) in zip(pdf[geom_col], counts):
                sl = moved[pos : pos + n]
                pos += n

                # map_coords visits parts in _flatten's order, so a
                # sequential cursor reassembles the projected vertices
                def take(arr, _sl=sl, _cur=[0]):
                    p = _cur[0]
                    _cur[0] = p + arr.shape[0]
                    return _sl[p : p + arr.shape[0]]

                out.append(wkb.map_coords(bytes(g), take))
            res = pdf.copy()
            res[geom_col] = out
            yield res

    return df.mapInPandas(kernel, fields)


def _flatten(t, payload) -> np.ndarray:
    if t == wkb.POINT:
        return payload.reshape(1, 2)
    if t == wkb.LINESTRING:
        return payload
    if t == wkb.POLYGON:
        return np.vstack(payload)
    if t == wkb.MULTIPOINT:
        return np.vstack([p.reshape(1, 2) for p in payload])
    if t == wkb.MULTILINESTRING:
        return np.vstack(payload) if payload else np.zeros((0, 2))
    if t == wkb.MULTIPOLYGON:
        return (
            np.vstack([np.vstack(r) for r in payload])
            if payload
            else np.zeros((0, 2))
        )
    raise ValueError(f"unsupported type {t}")


def project_points(
    df: DataFrame,
    lon_col: str,
    lat_col: str,
    crs: str,
    out_x: str = "x",
    out_y: str = "y",
) -> DataFrame:
    """lon/lat degree columns -> planar x/y columns in `crs`."""
    fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    )

    def kernel(batches):
        for pdf in batches:
            x, y = crs_mod.from_lonlat(
                pdf[lon_col].to_numpy(float), pdf[lat_col].to_numpy(float), crs
            )
            out = pdf.copy()
            out[out_x] = x
            out[out_y] = y
            yield out

    return df.mapInPandas(kernel, f"{fields}, `{out_x}` double, `{out_y}` double")


def with_geodesic(
    df: DataFrame,
    lon1: str,
    lat1: str,
    lon2: str,
    lat2: str,
) -> DataFrame:
    """Vincenty inverse columns (pyproj.Geod.inv analog): appends
    `az_fwd` / `az_back` (degrees, [0,360)) and `geo_dist_m`."""
    fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    )

    def kernel(batches):
        for pdf in batches:
            azf, azb, d = crs_mod.geodesic_inverse(
                pdf[lon1].to_numpy(float), pdf[lat1].to_numpy(float),
                pdf[lon2].to_numpy(float), pdf[lat2].to_numpy(float),
            )
            out = pdf.copy()
            out["az_fwd"] = azf
            out["az_back"] = azb
            out["geo_dist_m"] = d
            yield out

    return df.mapInPandas(
        kernel, f"{fields}, az_fwd double, az_back double, geo_dist_m double"
    )
