"""Overlay joins: line x polygon intersection / difference / union —
the engine's `gpd.overlay` replacements (SURVEY.md §2.3):

  * how="intersection" — clip each year's contours by attribute
    polygons, attributing the split segments
    (`contour_certainty`, coastlines/vector.py:454)
  * how="difference"   — remove coverage of "remove"-typed modification
    polygons; unmatched lines pass through
    (coastlines/validation.py:2189)
  * how="union"        — both: inside pieces carry polygon attributes,
    outside pieces carry nulls (coastlines/vector.py:1294-1299)

Plan shape (same contract as points_in_polygons): the polygon side is
the SMALL side (attribute/AOI tables) and is broadcast; the line side
streams through a cell-cover equi join (bbox polyfill on both sides)
followed by a row-streaming mapInPandas clip kernel that emits 0..n
pieces per (line, polygon) candidate — flatMap/UDTF semantics. Lines
whose bbox covers no polygon cell never enter the kernel (difference/
union fast path: they pass through via a left-anti union).

Polygon x polygon boolean overlay is deliberately NOT a vector op in
this engine: the reference itself burns modification polygons into the
raster (xr_rasterize, coastlines/vector.py:647-653) whenever the result
feeds masking, and the engine follows that raster-burn path
(operators/masking.py). Line-valued overlays are the ones the pipeline
needs as vectors.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..geometry import algorithms as ga
from ..geometry import wkb
from ..index import cells
from .spatial_join import DEFAULT_RES, _rebatched, explode_polygons_to_cells


def _line_cells(lines: DataFrame, res: int) -> DataFrame:
    """Attach covering cells of each line's bbox (coarse stage)."""
    return explode_polygons_to_cells(lines, res)  # bbox-based: works for any WKB


def overlay_lines_polygons(
    lines: DataFrame,
    polys: DataFrame,
    how: str = "intersection",
    res: int = DEFAULT_RES,
    line_id: str = "line_id",
    poly_id: str = "poly_id",
    broadcast_polys: bool | str = True,
    match_cols: list[str] | None = None,
) -> DataFrame:
    """lines(line_id, geometry, attrs...) x polys(poly_id, geometry,
    attrs...) -> split line pieces.

    match_cols: columns present on BOTH sides that candidate pairs must
    agree on (e.g. ["year"] for the reference's per-year certainty
    overlay loop, vector.py:454-459 — one distributed join instead of a
    year loop). The equality rides the candidate equi-join key, so it
    prunes before the clip kernel.

    Output: line attrs + `geometry` (the piece) + `piece_len_m` +
    polygon attrs (null for outside pieces under union/difference).
    Deterministic output: pieces are emitted in (line_id, poly_id,
    piece index) order with exact crossing interpolation, so N-vs-4N
    runs produce identical rows.

    broadcast_polys=True (default) materializes the polygon side
    driver-side — by contract the small side (AOI/certainty tables).
    broadcast_polys=False is the big-polygon-table path: polygons are
    exploded to covering cells DISTRIBUTED, candidates come from a
    shuffled cell equi-join, and geometry is parsed inside the kernels
    (same contract as points_in_polygons(broadcast_polys=False));
    "auto" probes the polygon side's row count and picks the path.
    """
    if how not in ("intersection", "difference", "union"):
        raise ValueError(how)
    match_cols = list(match_cols or [])
    from .spatial_join import resolve_broadcast

    if not resolve_broadcast(polys, broadcast_polys):
        return _overlay_dist(lines, polys, how, res, line_id, poly_id, match_cols)
    spark = lines.sparkSession

    polys_pdf = polys.toPandas()
    geoms: list[tuple[list[np.ndarray], ...]] = []
    for g in polys_pdf["geometry"]:
        t, payload = wkb.parse(bytes(g))
        if t != wkb.POLYGON:
            raise ValueError("overlay expects Polygon geometry on the right")
        geoms.append((payload[0], payload[1:]))
    poly_ids = polys_pdf[poly_id].tolist()

    # candidate pairs via cell cover of both bboxes (+ match-col
    # equality riding the same equi-join key). Built column-wise:
    # polyfill_bbox returns an int64 array per polygon, match values
    # gather through ONE numpy take per column — never pandas .iloc in
    # the per-cell loop (a world-spanning certainty polygon covers 10^4+
    # cells; per-cell Series indexing measured 33 s of a 44 s build).
    covers = [
        cells.polyfill_bbox(*wkb.bbox(bytes(g)), res)
        for g in polys_pdf["geometry"]
    ]
    cell_cat = (
        np.concatenate(covers) if covers else np.array([], dtype=np.int64)
    )
    pos_cat = np.repeat(
        np.arange(len(covers), dtype=np.int64),
        [len(c) for c in covers],
    )
    cover_pdf = pd.DataFrame({"cell_id": cell_cat, "_poly_pos": pos_cat})
    for c in match_cols:
        cover_pdf[c] = polys_pdf[c].to_numpy()[pos_cat]
    cover_df = spark.createDataFrame(cover_pdf)
    line_cells = _line_cells(lines.select(line_id, "geometry", *match_cols), res)
    cand = (
        line_cells.join(F.broadcast(cover_df), ["cell_id", *match_cols])
        .dropDuplicates([line_id, "_poly_pos"])
        .drop("cell_id", *match_cols)
    )

    # id type comes from the input schema — hardcoding `long` would die
    # in an opaque Arrow cast for string ids (e.g. validation transects)
    id_type = lines.schema[line_id].dataType.simpleString()
    out_schema = (
        f"{line_id} {id_type}, _poly_pos long, geometry binary, piece_len_m double"
    )

    def clip_kernel(batches):
        keep_inside = how != "difference"
        for pdf in _rebatched(batches, 8192):
            rows = []
            order = np.lexsort((pdf["_poly_pos"].to_numpy(), pdf[line_id].to_numpy()))
            for i in order:
                lid = pdf[line_id].iloc[i]
                pos = int(pdf["_poly_pos"].iloc[i])
                t, payload = wkb.parse(bytes(pdf["geometry"].iloc[i]))
                parts = payload if t == wkb.MULTILINESTRING else [payload]
                shell, holes = geoms[pos]
                for part in parts:
                    for piece in ga.clip_polyline_by_polygon(
                        part, shell, list(holes), keep_inside=keep_inside
                    ):
                        rows.append(
                            {
                                line_id: lid,
                                "_poly_pos": pos,
                                "geometry": wkb.linestring(piece),
                                "piece_len_m": ga.polyline_length(piece),
                            }
                        )
            if rows:
                yield pd.DataFrame(rows)

    pieces = cand.mapInPandas(clip_kernel, out_schema)
    # match cols are dropped from the polygon attrs (they equal the
    # line's values by construction; keeping both would collide)
    poly_attrs = spark.createDataFrame(
        polys_pdf.drop(columns=["geometry", *match_cols]).assign(
            _poly_pos=np.arange(len(polys_pdf), dtype=np.int64)
        )
    )
    line_attrs = lines.drop("geometry")

    if how == "intersection":
        return (
            pieces.join(F.broadcast(poly_attrs), "_poly_pos")
            .drop("_poly_pos")
            .join(line_attrs, line_id)
        )

    if how == "difference":
        # pieces are per-(line, poly) OUTSIDE fragments; a line piece
        # survives the difference only where it is outside EVERY matched
        # polygon. Re-clip iteratively driver-free: subtract by
        # intersecting the outside fragments of successive polygons —
        # equivalent and simpler: keep fragments of the line against the
        # union, computed per line by sequential clipping in one kernel.
        return _difference(lines, cand, geoms, line_id, out_schema, line_attrs)

    # union = intersection pieces + difference remainder with null attrs
    inter = (
        pieces.join(F.broadcast(poly_attrs), "_poly_pos")
        .drop("_poly_pos")
        .join(line_attrs, line_id)
    )
    diff = _difference(lines, cand, geoms, line_id, out_schema, line_attrs)
    for c in inter.columns:
        if c not in diff.columns:
            diff = diff.withColumn(c, F.lit(None))
    return inter.unionByName(diff.select(inter.columns))


def _overlay_dist(lines, polys, how, res, line_id, poly_id, match_cols=()):
    """Fully distributed overlay: no driver-side polygon
    materialization, no broadcast. The polygon side is exploded to
    covering cells (geometry replicated per cell), candidates come from
    a shuffled cell equi-join (AQE skew-split applies), and both WKBs
    are parsed inside the kernels. Output rows match the broadcast path
    exactly (pinned by test_overlay_dist_matches_broadcast)."""
    id_type = lines.schema[line_id].dataType.simpleString()
    pid_type = polys.schema[poly_id].dataType.simpleString()

    match_cols = list(match_cols)
    line_cells = _line_cells(lines.select(line_id, "geometry", *match_cols), res)
    poly_cells = explode_polygons_to_cells(
        polys.select(poly_id, "geometry", *match_cols), res
    ).select(poly_id, F.col("geometry").alias("_poly_geom"), "cell_id", *match_cols)
    cand = (
        line_cells.join(poly_cells, ["cell_id", *match_cols])
        .dropDuplicates([line_id, poly_id])
        .drop("cell_id", *match_cols)
    )

    line_attrs = lines.drop("geometry")
    poly_attrs = polys.drop("geometry", *match_cols)
    pair_schema = (
        f"{line_id} {id_type}, {poly_id} {pid_type}, "
        "geometry binary, piece_len_m double"
    )

    def clip_kernel(batches):
        for pdf in _rebatched(batches, 8192):
            pdf = pdf.sort_values([line_id, poly_id], kind="mergesort")
            rows = []
            # parse each distinct polygon once per chunk (itertuples
            # would mangle the underscore-prefixed column name; zip the
            # columns explicitly)
            parsed = {}
            for lid, pid, lg, pg in zip(
                pdf[line_id], pdf[poly_id], pdf["geometry"], pdf["_poly_geom"]
            ):
                g = bytes(pg)
                if g not in parsed:
                    t, payload = wkb.parse(g)
                    if t != wkb.POLYGON:
                        raise ValueError("overlay expects Polygon geometry on the right")
                    parsed[g] = (payload[0], payload[1:])
                shell, holes = parsed[g]
                t, payload = wkb.parse(bytes(lg))
                parts = payload if t == wkb.MULTILINESTRING else [payload]
                for part in parts:
                    for piece in ga.clip_polyline_by_polygon(
                        part, shell, list(holes), keep_inside=True
                    ):
                        rows.append(
                            {
                                line_id: lid,
                                poly_id: pid,
                                "geometry": wkb.linestring(piece),
                                "piece_len_m": ga.polyline_length(piece),
                            }
                        )
            if rows:
                yield pd.DataFrame(rows, columns=[line_id, poly_id, "geometry", "piece_len_m"])

    def make_inter():
        pieces = cand.mapInPandas(clip_kernel, pair_schema)
        return pieces.join(poly_attrs, poly_id).join(line_attrs, line_id)

    grouped_schema = f"{line_id} {id_type}, geometry binary, piece_len_m double"

    def diff_kernel(key, pdf):
        lid = key[0]
        t, payload = wkb.parse(bytes(pdf["geometry"].iloc[0]))
        parts = payload if t == wkb.MULTILINESTRING else [payload]
        rows = []
        # deterministic subtraction order; piece geometry is
        # order-independent (splits happen only at true crossings) but
        # emission order is pinned for reproducibility
        pdf = pdf.sort_values(poly_id, kind="mergesort")
        geoms = []
        for g in pdf["_poly_geom"]:
            _, payload_p = wkb.parse(bytes(g))
            geoms.append((payload_p[0], payload_p[1:]))
        for part in parts:
            pieces = [np.asarray(part, np.float64)]
            for shell, holes in geoms:
                nxt = []
                for piece in pieces:
                    nxt.extend(
                        ga.clip_polyline_by_polygon(
                            piece, shell, list(holes), keep_inside=False
                        )
                    )
                pieces = nxt
            for piece in pieces:
                rows.append(
                    {
                        line_id: lid,
                        "geometry": wkb.linestring(piece),
                        "piece_len_m": ga.polyline_length(piece),
                    }
                )
        return pd.DataFrame(rows, columns=[line_id, "geometry", "piece_len_m"])

    def make_diff():
        matched = cand.groupBy(line_id).applyInPandas(diff_kernel, grouped_schema)

        def passthrough(batches):
            for pdf in batches:
                lens = []
                for g in pdf["geometry"]:
                    t, payload = wkb.parse(bytes(g))
                    parts = payload if t == wkb.MULTILINESTRING else [payload]
                    lens.append(sum(ga.polyline_length(p) for p in parts))
                out = pdf[[line_id, "geometry"]].copy()
                out["piece_len_m"] = lens
                yield out

        unmatched = (
            lines.join(cand.select(line_id).distinct(), line_id, "left_anti")
            .select(line_id, "geometry")
            .mapInPandas(passthrough, grouped_schema)
        )
        return matched.unionByName(unmatched).join(line_attrs, line_id)

    if how == "intersection":
        return make_inter()
    if how == "difference":
        return make_diff()
    inter = make_inter()
    diff = make_diff()
    for c in inter.columns:
        if c not in diff.columns:
            diff = diff.withColumn(c, F.lit(None))
    return inter.unionByName(diff.select(inter.columns))


def _difference(lines, cand, geoms, line_id, out_schema, line_attrs):
    """Line minus union of its candidate polygons (left-anti pass-through
    for lines with no candidates)."""
    spark = lines.sparkSession

    id_type = lines.schema[line_id].dataType.simpleString()
    grouped_schema = f"{line_id} {id_type}, geometry binary, piece_len_m double"

    def diff_kernel(key, pdf):
        lid = key[0]
        t, payload = wkb.parse(bytes(pdf["geometry"].iloc[0]))
        parts = payload if t == wkb.MULTILINESTRING else [payload]
        rows = []
        for part in parts:
            pieces = [np.asarray(part, np.float64)]
            for pos in sorted(set(int(p) for p in pdf["_poly_pos"])):
                shell, holes = geoms[pos]
                nxt = []
                for piece in pieces:
                    nxt.extend(
                        ga.clip_polyline_by_polygon(
                            piece, shell, list(holes), keep_inside=False
                        )
                    )
                pieces = nxt
            for piece in pieces:
                rows.append(
                    {
                        line_id: lid,
                        "geometry": wkb.linestring(piece),
                        "piece_len_m": ga.polyline_length(piece),
                    }
                )
        return pd.DataFrame(rows, columns=[line_id, "geometry", "piece_len_m"])

    matched = cand.groupBy(line_id).applyInPandas(diff_kernel, grouped_schema)

    def passthrough(batches):
        for pdf in batches:
            lens = []
            for g in pdf["geometry"]:
                t, payload = wkb.parse(bytes(g))
                parts = payload if t == wkb.MULTILINESTRING else [payload]
                lens.append(sum(ga.polyline_length(p) for p in parts))
            out = pdf[[line_id, "geometry"]].copy()
            out["piece_len_m"] = lens
            yield out

    unmatched = (
        lines.join(cand.select(line_id).distinct(), line_id, "left_anti")
        .select(line_id, "geometry")
        .mapInPandas(passthrough, grouped_schema)
    )
    return matched.unionByName(unmatched).join(line_attrs, line_id)