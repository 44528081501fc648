"""Transect generation + line simplification vs brute-force scalar
reference implementations (reference validation.py:362-460 semantics)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from dea_coastlines_spark.geometry import wkb
from dea_coastlines_spark.geometry.algorithms import (
    douglas_peucker,
    interpolate_along,
    points_to_polyline_distance,
    polyline_length,
)
from dea_coastlines_spark.operators.transects import (
    generate_transects,
    lines_from_vertices,
    orient_transects,
    simplify_lines,
)


def _dp_recursive(line: np.ndarray, tol: float) -> np.ndarray:
    """Textbook recursive Douglas-Peucker — the independent oracle."""
    if len(line) <= 2:
        return line.copy()
    a, b = line[0], line[-1]
    seg = b - a
    ll = np.hypot(*seg)
    pts = line[1:-1]
    if ll == 0:
        d = np.hypot(pts[:, 0] - a[0], pts[:, 1] - a[1])
    else:
        d = (
            np.abs(seg[0] * (pts[:, 1] - a[1]) - seg[1] * (pts[:, 0] - a[0]))
            / ll
        )
    k = int(np.argmax(d))
    if d[k] <= tol:
        return np.array([a, b])
    left = _dp_recursive(line[: k + 2], tol)
    right = _dp_recursive(line[k + 1 :], tol)
    return np.vstack([left[:-1], right])


def _wiggle(n: int, seed: int, scale: float = 100.0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    x = np.cumsum(rng.uniform(0.5, 2.0, n)) * scale / n
    y = np.sin(x / 7.0) * scale / 4 + rng.normal(0, scale / 50, n)
    return np.stack([x, y], axis=1)


def test_douglas_peucker_matches_recursive_reference():
    for seed in range(5):
        line = _wiggle(60, seed)
        for tol in (0.5, 2.0, 10.0):
            got = douglas_peucker(line, tol)
            want = _dp_recursive(line, tol)
            np.testing.assert_allclose(got, want)


def test_douglas_peucker_tolerance_invariant():
    line = _wiggle(200, 42)
    tol = 3.0
    simp = douglas_peucker(line, tol)
    d, _ = points_to_polyline_distance(line[:, 0], line[:, 1], simp)
    assert d.max() <= tol + 1e-9
    np.testing.assert_allclose(simp[0], line[0])
    np.testing.assert_allclose(simp[-1], line[-1])


def test_simplify_lines_spark(spark):
    lines = [_wiggle(80, s) for s in range(3)]
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "line_id": [f"l{s}" for s in range(3)],
                "geometry": [wkb.linestring(c) for c in lines],
            }
        )
    )
    out = {
        r["line_id"]: wkb.coords_of(bytes(r["geometry"]))
        for r in simplify_lines(df, 2.0).collect()
    }
    for s in range(3):
        np.testing.assert_allclose(
            out[f"l{s}"], douglas_peucker(lines[s], 2.0)
        )


def _brute_transects(coords, length, interval, buffer):
    """Scalar per-distance re-derivation of the reference math."""
    total = polyline_length(coords)
    rows = []
    d = buffer
    while d < total:
        pm = interpolate_along(coords, np.array([d - buffer]))[0]
        pp = interpolate_along(coords, np.array([d + buffer]))[0]
        chord = float(np.hypot(pp[0] - pm[0], pp[1] - pm[1]))
        if round(chord, 1) <= 2 * buffer and chord > 0:
            mx, my = (pm[0] + pp[0]) / 2, (pm[1] + pp[1]) / 2
            tx, ty = (pp[0] - pm[0]) / chord, (pp[1] - pm[1]) / chord
            nx, ny = -ty, tx
            h = length / 2
            rows.append(
                (d, mx + h * nx, my + h * ny, mx - h * nx, my - h * ny)
            )
        d += interval
    return rows


def test_generate_transects_matches_brute(spark):
    lines = {f"l{s}": _wiggle(50, 100 + s, scale=400.0) for s in range(3)}
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "line_id": list(lines),
                "geometry": [wkb.linestring(c) for c in lines.values()],
            }
        )
    )
    got = (
        generate_transects(df, length=60.0, interval=40.0, buffer=5.0)
        .orderBy("line_id", "transect_id")
        .collect()
    )
    by_line: dict[str, list] = {}
    for r in got:
        by_line.setdefault(r["line_id"], []).append(r)
    for lid, coords in lines.items():
        want = _brute_transects(coords, 60.0, 40.0, 5.0)
        have = by_line.get(lid, [])
        assert len(have) == len(want)
        for r, (d, x1, y1, x2, y2) in zip(have, want):
            np.testing.assert_allclose(
                [r["dist_along"], r["x1"], r["y1"], r["x2"], r["y2"]],
                [d, x1, y1, x2, y2],
                atol=1e-9,
            )
            # WKB column mirrors the scalar endpoint columns
            np.testing.assert_allclose(
                wkb.coords_of(bytes(r["geometry"])),
                [[r["x1"], r["y1"]], [r["x2"], r["y2"]]],
            )


def test_transect_perpendicular_and_length(spark):
    coords = _wiggle(40, 7, scale=300.0)
    df = spark.createDataFrame(
        pd.DataFrame({"line_id": ["a"], "geometry": [wkb.linestring(coords)]})
    )
    rows = generate_transects(df, length=80.0, interval=30.0, buffer=4.0).collect()
    assert rows
    for r in rows:
        tlen = np.hypot(r["x2"] - r["x1"], r["y2"] - r["y1"])
        np.testing.assert_allclose(tlen, 80.0, rtol=1e-12)
        # perpendicular to the local tangent chord
        pm = interpolate_along(coords, np.array([r["dist_along"] - 4.0]))[0]
        pp = interpolate_along(coords, np.array([r["dist_along"] + 4.0]))[0]
        dot = (r["x2"] - r["x1"]) * (pp[0] - pm[0]) + (r["y2"] - r["y1"]) * (
            pp[1] - pm[1]
        )
        assert abs(dot) < 1e-6


def test_orient_transects_land_water(spark):
    # horizontal shoreline y=0; land is the half-plane-ish box y<0
    coords = np.stack([np.linspace(0, 100, 21), np.zeros(21)], axis=1)
    df = spark.createDataFrame(
        pd.DataFrame({"line_id": ["a"], "geometry": [wkb.linestring(coords)]})
    )
    t = generate_transects(df, length=20.0, interval=10.0, buffer=2.0)
    land = spark.createDataFrame(
        pd.DataFrame(
            {
                "geometry": [
                    wkb.polygon(
                        np.array(
                            [[-10, -50], [110, -50], [110, 0], [-10, 0], [-10, -50]],
                            float,
                        )
                    )
                ]
            }
        )
    )
    out = orient_transects(t, land).collect()
    assert len(out) == t.count()  # every transect crosses the shoreline
    for r in out:
        assert r["y1"] < 0 < r["y2"]  # start on land, end in water


def test_lines_from_vertices_roundtrip(spark):
    coords = _wiggle(30, 11)
    verts = spark.createDataFrame(
        pd.DataFrame(
            {
                "line_id": ["z"] * len(coords),
                "seq": np.arange(len(coords)),
                "x": coords[:, 0],
                "y": coords[:, 1],
            }
        )
    ).repartition(8)
    out = lines_from_vertices(verts).collect()
    assert len(out) == 1
    np.testing.assert_allclose(wkb.coords_of(bytes(out[0]["geometry"])), coords)


def test_transect_rates_constant_retreat(spark):
    """Horizontal coastline retreating +2.5 m/yr northward; oriented
    transects (land south) must regress chainage at exactly +2.5 m/yr
    with zero stderr and significant fit."""
    from dea_coastlines_spark.operators.transects import (
        generate_transects as gen_t,
        orient_transects as orient_t,
    )
    from dea_coastlines_spark.operators.validation import transect_rates

    base = np.stack([np.linspace(0, 400, 41), np.zeros(41)], axis=1)
    lines = spark.createDataFrame(
        pd.DataFrame({"line_id": ["c0"], "geometry": [wkb.linestring(base)]})
    )
    t = gen_t(lines, length=60.0, interval=25.0, buffer=2.0)
    land = spark.createDataFrame(
        pd.DataFrame(
            {
                "geometry": [
                    wkb.polygon(
                        np.array(
                            [[-50, -200], [450, -200], [450, 0], [-50, 0], [-50, -200]],
                            float,
                        )
                    )
                ]
            }
        )
    )
    t = orient_t(t, land)
    years = range(2000, 2005)
    sl = spark.createDataFrame(
        pd.DataFrame(
            {
                "year": list(years),
                "geometry": [
                    wkb.linestring(
                        np.stack(
                            [
                                np.linspace(-10, 410, 43),
                                np.full(43, 2.5 * (y - 2000) + 0.3),
                            ],
                            axis=1,
                        )
                    )
                    for y in years
                ],
            }
        )
    )
    out = transect_rates(t, sl, 2000).toPandas()
    assert len(out) == t.count()
    np.testing.assert_allclose(out["rate_time"], 2.5, atol=1e-9)
    np.testing.assert_allclose(out["se_time"], 0.0, atol=1e-9)
    assert (out["valid_obs"] == 5).all()
    # chainage at year 2000 is 30.3 (transect start at y=-30 on land,
    # shoreline at y=0.3); change_regress intercepts at calendar year 0
    np.testing.assert_allclose(out["incpt_time"], 30.3 - 2.5 * 2000, atol=1e-6)
    # reference semantics: sce = max-min spread, nsm = -dist(initial_year)
    np.testing.assert_allclose(out["sce"], 10.0, atol=1e-9)  # 4 yr x 2.5 m
    np.testing.assert_allclose(out["nsm"], -30.3, atol=1e-9)


def test_transect_chainages_dist_parity(spark):
    """Cell-cover distributed chainage join == broadcast form, row for
    row, on a wiggly multi-year fixture (incl. n_crossings flags)."""
    from pyspark.sql import functions as F

    from dea_coastlines_spark.operators.transects import generate_transects as gen_t
    from dea_coastlines_spark.operators.validation import (
        transect_chainages,
        transect_chainages_dist,
    )

    base = _wiggle(60, 5, scale=600.0)
    lines = spark.createDataFrame(
        pd.DataFrame({"line_id": ["c"], "geometry": [wkb.linestring(base)]})
    )
    t = gen_t(lines, length=120.0, interval=40.0, buffer=5.0).select(
        "transect_id", "geometry"
    ).withColumn("id", F.col("transect_id").cast("string")).drop("transect_id")
    years = range(2000, 2003)
    sl = spark.createDataFrame(
        pd.DataFrame(
            {
                "year": list(years),
                "geometry": [
                    wkb.linestring(base + np.array([0.0, 8.0 * (y - 2000)]))
                    for y in years
                ],
            }
        )
    )
    a = transect_chainages(t, sl).orderBy("id", "year").toPandas()
    b = transect_chainages_dist(t, sl, res=10).orderBy("id", "year").toPandas()
    assert len(a) > 0
    pd.testing.assert_frame_equal(a.reset_index(drop=True), b.reset_index(drop=True))


def test_transect_rates_distributed_parity(spark):
    """transect_rates(distributed=True) == broadcast form end to end."""
    from dea_coastlines_spark.operators.transects import (
        generate_transects as gen_t,
    )
    from dea_coastlines_spark.operators.validation import transect_rates

    base = _wiggle(50, 3, scale=500.0)
    lines = spark.createDataFrame(
        pd.DataFrame({"line_id": ["c"], "geometry": [wkb.linestring(base)]})
    )
    t = gen_t(lines, length=100.0, interval=60.0, buffer=5.0)
    years = range(2000, 2004)
    sl = spark.createDataFrame(
        pd.DataFrame(
            {
                "year": list(years),
                "geometry": [
                    wkb.linestring(base + np.array([0.0, 4.0 * (y - 2000)]))
                    for y in years
                ],
            }
        )
    )
    a = transect_rates(t, sl, 2000).orderBy("id").toPandas()
    b = transect_rates(t, sl, 2000, distributed=True, cell_res=10).orderBy(
        "id"
    ).toPandas()
    assert len(a) > 0
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True)
    )


def test_orient_transects_distributed_parity(spark):
    """broadcast_land=False (cell-cover endpoint PIP fan-out) must
    produce exactly the broadcast closure's rows — keep set, flip set,
    rebuilt geometries — on a land table exercising MultiPolygon
    explode, hole subtraction, and dropped land-land / water-water
    transects."""
    coords = np.stack([np.linspace(0, 200, 41),
                       10 * np.sin(np.linspace(0, 6, 41))], axis=1)
    df = spark.createDataFrame(
        pd.DataFrame({"line_id": ["a"], "geometry": [wkb.linestring(coords)]})
    )
    t = generate_transects(df, length=30.0, interval=7.0, buffer=2.0)
    # land: mainland south of the sine coast (with a lake hole that
    # flips some "land" endpoints back to water) + an island strip
    # north of it, packed as ONE MultiPolygon row plus a second plain
    # Polygon row — both WKB container kinds go through the explode
    mainland = wkb.polygon(
        np.array([[-20, -60], [220, -60], [220, 8], [-20, 8], [-20, -60]],
                 float),
        holes=[np.array([[40, -20], [80, -20], [80, -5], [40, -5],
                         [40, -20]], float)],
    )
    island = wkb.polygon(
        np.array([[100, 18], [140, 18], [140, 30], [100, 30], [100, 18]],
                 float)
    )
    far_box = wkb.polygon(
        np.array([[500, 500], [510, 500], [510, 510], [500, 510],
                  [500, 500]], float)
    )
    land = spark.createDataFrame(
        pd.DataFrame({
            "geometry": [wkb.multipolygon([mainland, island]), far_box]
        })
    )
    cols = ["line_id", "transect_id", "dist_along", "x1", "y1", "x2", "y2"]
    bc = orient_transects(t, land, broadcast_land=True).toPandas()
    dist = orient_transects(t, land, broadcast_land=False).toPandas()
    key = ["line_id", "transect_id"]
    bc = bc.sort_values(key).reset_index(drop=True)
    dist = dist.sort_values(key).reset_index(drop=True)
    assert len(bc) > 0 and len(bc) < t.count()  # some rows really drop
    assert bc[cols].values.tolist() == dist[cols].values.tolist()
    assert [bytes(g) for g in bc["geometry"]] == [
        bytes(g) for g in dist["geometry"]
    ]
    # "auto" on a 2-row land table must resolve to the broadcast path's
    # output too (and trivially: same rows either way)
    auto = orient_transects(t, land).toPandas().sort_values(key)
    assert auto[cols].values.tolist() == bc[cols].values.tolist()


def test_orient_distributed_out_of_frame_clamps_to_parity(spark):
    """Geometry wholly outside the cell index's world frame must CLAMP
    to edge cells on both sides of the cover join (the rule the point
    encoders already apply), so the distributed path still forms the
    candidate pair and the exact PIP refine decides — identical output
    to the broadcast path, never a silent empty-cover drop (which
    would classify out-of-frame land endpoints as water and drop the
    transect)."""
    far = 9e6  # well beyond WORLD_X0 + WORLD_SPAN (~4.19e6)
    t = spark.createDataFrame(pd.DataFrame({
        "line_id": ["in", "out"], "transect_id": [0, 0],
        "dist_along": [0.0, 0.0],
        # "in": both endpoints in-frame open water (drops either way);
        # "out": land-side endpoint INSIDE the out-of-frame land box
        "x1": [0.0, far + 5e4], "y1": [-5.0, far + 5e4],
        "x2": [0.0, far + 3e5], "y2": [5.0, far + 3e5],
        "geometry": [
            wkb.linestring(np.array([[0.0, -5.0], [0.0, 5.0]])),
            wkb.linestring(np.array(
                [[far + 5e4, far + 5e4], [far + 3e5, far + 3e5]])),
        ],
    }))
    land = spark.createDataFrame(pd.DataFrame({
        "geometry": [wkb.polygon(np.array(
            [[far, far], [far + 1e5, far], [far + 1e5, far + 1e5],
             [far, far + 1e5], [far, far]], float))],
    }))
    cols = ["line_id", "transect_id", "x1", "y1", "x2", "y2"]
    bc = (orient_transects(t, land, broadcast_land=True)
          .toPandas().sort_values("line_id").reset_index(drop=True))
    dist = (orient_transects(t, land, broadcast_land=False)
            .toPandas().sort_values("line_id").reset_index(drop=True))
    assert bc["line_id"].tolist() == ["out"]  # land/water keeps it
    assert bc[cols].values.tolist() == dist[cols].values.tolist()
