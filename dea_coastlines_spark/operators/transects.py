"""Coastline simplification + validation-transect generation
(reference coastlines/validation.py:362-460: ``perpendicular_line``,
``generate_transects``, ``coastal_transects``).

The reference builds its validation transect network by simplifying a
coastline layer (shapely ``.simplify``), interpolating tangent chords
every ``interval`` metres along it, rotating each chord 90° into a
fixed-length perpendicular transect, then orienting every transect
away from land using point-in-polygon tests of its two endpoints.

Spark-first shape: every step is per-line (or per-transect) local
math — no shuffle anywhere. Each operator is one ``mapInPandas``
pass whose Arrow batch is processed with vectorized numpy kernels
from ``geometry/algorithms``; land polygons for orientation are a
small broadcast dimension. At 10^12-image scale the coastline table
partitions by line id and the whole chain is embarrassingly parallel.

Geometry identities used instead of shapely constructions:

* ``perpendicular_line`` (validation.py:362-369) offsets the tangent
  chord ``length/2`` to each side and joins the two offset centroids.
  For a 2-point chord with unit direction ``t`` and midpoint ``m``
  the left/right offset centroids are exactly ``m ± (length/2)·n``
  with ``n = (-t_y, t_x)`` — so the transect is computed closed-form.
* ``line.interpolate(d)`` == ``geometry.algorithms.interpolate_along``
  (arc-length clamp semantics match shapely).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..geometry import wkb
from ..geometry.algorithms import (
    douglas_peucker,
    interpolate_along,
    points_in_polygon,
    polyline_length,
)


def simplify_lines(
    df: DataFrame, tol: float, geom_col: str = "geometry"
) -> DataFrame:
    """Douglas-Peucker simplify a WKB LineString column in place
    (``gdf.geometry.simplify(tol)``, reference validation.py:403).

    Per-row local; schema unchanged; no shuffle.
    """
    fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    )

    def simp_one(g: bytes) -> bytes:
        t, payload = wkb.parse(bytes(g))
        if t == wkb.LINESTRING:
            return wkb.linestring(douglas_peucker(payload, tol))
        if t == wkb.MULTILINESTRING:
            # simplify each part independently — flattening would invent
            # a phantom segment between parts and simplify across it
            return wkb.multilinestring(
                [douglas_peucker(p, tol) for p in payload]
            )
        raise ValueError(f"simplify_lines expects (Multi)LineString, got {t}")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                pdf = pdf.copy()
                pdf[geom_col] = [simp_one(g) for g in pdf[geom_col]]
            yield pdf

    return df.mapInPandas(kernel, fields)


def _transects_for_line(
    coords: np.ndarray, length: float, interval: float, buffer: float
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(dists, end1 xy, end2 xy) for one polyline — the closed-form
    ``generate_transects`` math (validation.py:372-387)."""
    total = polyline_length(coords)
    dists = np.arange(buffer, total, interval, dtype=np.float64)
    if len(dists) == 0:
        z = np.zeros((0,))
        return z, np.zeros((0, 2)), np.zeros((0, 2))
    pm = interpolate_along(coords, dists - buffer)
    pp = interpolate_along(coords, dists + buffer)
    chord = np.hypot(pp[:, 0] - pm[:, 0], pp[:, 1] - pm[:, 1])
    # reference drops tangents whose chord rounds longer than 2*buffer
    # (multi-part jump artefacts); also drop degenerate zero chords
    ok = (np.round(chord, 1) <= 2 * buffer) & (chord > 0)
    dists, pm, pp, chord = dists[ok], pm[ok], pp[ok], chord[ok]
    mid = (pm + pp) / 2.0
    tx = (pp[:, 0] - pm[:, 0]) / chord
    ty = (pp[:, 1] - pm[:, 1]) / chord
    nx, ny = -ty, tx
    half = length / 2.0
    e1 = np.stack([mid[:, 0] + half * nx, mid[:, 1] + half * ny], axis=1)
    e2 = np.stack([mid[:, 0] - half * nx, mid[:, 1] - half * ny], axis=1)
    return dists, e1, e2


def generate_transects(
    df: DataFrame,
    length: float = 400.0,
    interval: float = 200.0,
    buffer: float = 20.0,
    line_id: str = "line_id",
    geom_col: str = "geometry",
) -> DataFrame:
    """Cut perpendicular validation transects along each WKB LineString
    (reference ``generate_transects``, validation.py:372-387).

    Out: (line_id, transect_id, dist_along, x1, y1, x2, y2, geometry)
    — one row per transect, ``transect_id`` dense 0..k-1 in order of
    distance along the line, endpoints also exposed as scalar columns
    so downstream orientation / export never re-parses WKB.

    One mapInPandas pass, rows expand per line (UDTF shape); no
    shuffle. Deterministic for a given input partitioning or not —
    output is a pure function of each input row.
    """
    id_field = next(f for f in df.schema.fields if f.name == line_id)
    out_schema = (
        f"`{line_id}` {id_field.dataType.simpleString()}, transect_id int, "
        "dist_along double, x1 double, y1 double, x2 double, y2 double, "
        "geometry binary"
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict] = []
            for lid, g in zip(pdf[line_id], pdf[geom_col]):
                coords = wkb.coords_of(bytes(g))
                dists, e1, e2 = _transects_for_line(
                    coords, length, interval, buffer
                )
                for k in range(len(dists)):
                    out.append(
                        {
                            line_id: lid,
                            "transect_id": k,
                            "dist_along": float(dists[k]),
                            "x1": float(e1[k, 0]),
                            "y1": float(e1[k, 1]),
                            "x2": float(e2[k, 0]),
                            "y2": float(e2[k, 1]),
                            "geometry": wkb.linestring(
                                np.array([e1[k], e2[k]])
                            ),
                        }
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    line_id,
                    "transect_id",
                    "dist_along",
                    "x1",
                    "y1",
                    "x2",
                    "y2",
                    "geometry",
                ],
            )

    return df.mapInPandas(kernel, out_schema)


def orient_transects(
    transects: DataFrame,
    land_polys: DataFrame,
    geom_col: str = "geometry",
    broadcast_land: bool | str = "auto",
) -> DataFrame:
    """Orient transects away from land and drop invalid ones
    (reference ``coastal_transects``, validation.py:440-455).

    Endpoint 1 / endpoint 2 are PIP-tested against the union of land
    polygons; transects whose endpoints agree (land-land or
    water-water) are dropped; those starting in water are reversed so
    every surviving transect runs land → water.

    broadcast_land: True / False / "auto" — "auto" probes the land
    table's row count (bounded LIMIT scan, spatial_join.
    resolve_broadcast). Small dimensions (study-area land masks) are
    collected and closure-broadcast into one mapInPandas pass over the
    transects — the big side never shuffles. A continental land-polygon
    table takes the distributed path instead: endpoints fan out to the
    cell-cover PIP join (points_in_polygons broadcast_polys=False), so
    neither side ever lands on the driver. The distributed path
    inherits the cell index's planar world-frame domain
    (|coord| < 2^22 m, see transect_chainages_dist); out-of-frame
    geometry CLAMPS to edge cells on both sides of the cover join —
    the same rule the point encoders apply — so the exact PIP refine
    still decides and the distributed result stays identical to the
    broadcast one even for out-of-frame CRSs.
    """
    from .spatial_join import resolve_broadcast

    if not resolve_broadcast(land_polys, broadcast_land):
        return _orient_transects_dist(transects, land_polys, geom_col)
    polys = [
        wkb.polygon_rings(bytes(r[0]))
        for r in land_polys.select(geom_col).collect()
    ]
    fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in transects.schema.fields
    )

    def in_land(px: np.ndarray, py: np.ndarray) -> np.ndarray:
        hit = np.zeros(len(px), bool)
        for rings in polys:
            for shell, holes in rings:
                inside = points_in_polygon(px, py, shell)
                for h in holes:
                    inside &= ~points_in_polygon(
                        px, py, h, boundary_counts=False
                    )
                hit |= inside
        return hit

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                yield pdf
                continue
            p1 = in_land(pdf["x1"].to_numpy(), pdf["y1"].to_numpy())
            p2 = in_land(pdf["x2"].to_numpy(), pdf["y2"].to_numpy())
            keep = p1 != p2
            pdf = pdf.loc[keep].copy()
            flip = (~p1[keep]) & p2[keep]  # p1 < p2 in the reference
            if flip.any():
                fx1 = pdf.loc[flip, "x1"].copy()
                fy1 = pdf.loc[flip, "y1"].copy()
                pdf.loc[flip, "x1"] = pdf.loc[flip, "x2"].to_numpy()
                pdf.loc[flip, "y1"] = pdf.loc[flip, "y2"].to_numpy()
                pdf.loc[flip, "x2"] = fx1.to_numpy()
                pdf.loc[flip, "y2"] = fy1.to_numpy()
                pdf.loc[flip, "geometry"] = [
                    wkb.linestring(
                        np.array([[r.x1, r.y1], [r.x2, r.y2]], np.float64)
                    )
                    for r in pdf.loc[flip].itertuples()
                ]
            yield pdf

    return transects.mapInPandas(kernel, fields)


def _orient_transects_dist(
    transects: DataFrame,
    land_polys: DataFrame,
    geom_col: str,
) -> DataFrame:
    """Distributed orient_transects: no driver-side land collect.

    Each transect's two endpoints fan out as point rows into the
    cell-cover PIP join (points_in_polygons broadcast_polys=False —
    the land geometry replicates per covering cell, candidates come
    from one equi join, the refine is exact). An endpoint is "in land"
    iff it matches ≥ 1 land polygon, which reproduces the broadcast
    closure's union-over-polygons OR exactly (each polygon's holes
    subtract only from that polygon). The keep/flip decision then runs
    in one final kernel over the transect rows.

    Row identity for the fan-out is monotonically_increasing_id pinned
    by a localCheckpoint (lazy: the ids are assigned once on first
    materialization and cached): the id column is referenced by two
    plan branches (endpoint rows and the final join-back) and must not
    shift under recomputation. The checkpoint holds only the transect
    table — always orders of magnitude smaller than the raster corpus
    upstream of it."""
    from .spatial_join import points_in_polygons

    base = transects.withColumn(
        "_tid", F.monotonically_increasing_id()
    ).localCheckpoint(eager=False)

    # MultiPolygon rows explode to simple polygons first (the PIP
    # refine kernels are Polygon-only); holes stay attached to their
    # own shell, preserving the per-polygon hole-subtraction semantics
    def _simple(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for g in pdf[geom_col]:
                for shell, holes in wkb.polygon_rings(bytes(g)):
                    out.append(wkb.polygon(shell, holes))
            yield pd.DataFrame({"geometry": pd.Series(out, dtype=object)})

    land_simple = land_polys.select(geom_col).mapInPandas(
        _simple, "geometry binary"
    )

    eps = base.select(
        (F.col("_tid") * 2).alias("_pid"),
        F.col("x1").alias("x"),
        F.col("y1").alias("y"),
    ).unionByName(
        base.select(
            (F.col("_tid") * 2 + 1).alias("_pid"),
            F.col("x2").alias("x"),
            F.col("y2").alias("y"),
        )
    )
    hits = (
        points_in_polygons(
            eps, land_simple, how="inner", point_id="_pid",
            broadcast_polys=False,
        )
        .select("_pid")
        .distinct()  # an endpoint inside two overlapping polys is one hit
    )
    flags = (
        hits.withColumn("_tid", F.expr("_pid div 2"))
        .groupBy("_tid")
        .agg(
            F.max(F.pmod(F.col("_pid"), F.lit(2)) == 0).alias("_p1"),
            F.max(F.pmod(F.col("_pid"), F.lit(2)) == 1).alias("_p2"),
        )
    )
    joined = (
        base.join(flags, "_tid", "left")
        .fillna({"_p1": False, "_p2": False})
        .filter(F.col("_p1") != F.col("_p2"))
    )

    fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in transects.schema.fields
    )

    def flip_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            flip = (~pdf["_p1"].to_numpy(bool)) & pdf["_p2"].to_numpy(bool)
            pdf = pdf.drop(columns=["_tid", "_p1", "_p2"])
            if flip.any():
                fx1 = pdf.loc[flip, "x1"].copy()
                fy1 = pdf.loc[flip, "y1"].copy()
                pdf.loc[flip, "x1"] = pdf.loc[flip, "x2"].to_numpy()
                pdf.loc[flip, "y1"] = pdf.loc[flip, "y2"].to_numpy()
                pdf.loc[flip, "x2"] = fx1.to_numpy()
                pdf.loc[flip, "y2"] = fy1.to_numpy()
                pdf.loc[flip, "geometry"] = [
                    wkb.linestring(
                        np.array([[r.x1, r.y1], [r.x2, r.y2]], np.float64)
                    )
                    for r in pdf.loc[flip].itertuples()
                ]
            yield pdf

    return joined.mapInPandas(flip_kernel, fields)


def lines_from_vertices(
    verts: DataFrame,
    line_id: str = "line_id",
    seq: str = "seq",
) -> DataFrame:
    """Assemble (line_id, geometry WKB LineString) from an exploded
    vertex table (line_id, seq, x, y) — one groupBy shuffle on line_id,
    then a local sort + WKB build per group."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(seq)
        return pd.DataFrame(
            {
                line_id: [pdf[line_id].iloc[0]],
                "geometry": [
                    wkb.linestring(
                        np.stack(
                            [
                                pdf["x"].to_numpy(np.float64),
                                pdf["y"].to_numpy(np.float64),
                            ],
                            axis=1,
                        )
                    )
                ],
            }
        )

    id_field = next(f for f in verts.schema.fields if f.name == line_id)
    return verts.groupBy(line_id).applyInPandas(
        build, f"`{line_id}` {id_field.dataType.simpleString()}, geometry binary"
    )
