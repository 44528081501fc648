"""Overlay joins (intersection/difference/union) with exact expected
pieces, and the validation stage (transect x shoreline chainage + error
stats) against the synthetic corpus's closed-form coastline."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from dea_coastlines_spark.geometry import wkb
from dea_coastlines_spark.operators.overlay import overlay_lines_polygons
from dea_coastlines_spark.operators.validation import (
    transect_chainages,
    validation_errors,
    validation_stats,
)
from dea_coastlines_spark.plans.pipeline import shoreline_pipeline
from dea_coastlines_spark.synth import corpus


def _rect(x0, y0, x1, y1):
    return wkb.polygon(np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], float))


@pytest.fixture()
def lines_polys(spark):
    lines = spark.createDataFrame(
        pd.DataFrame(
            {
                "line_id": [1, 2, 3],
                "kind": ["a", "b", "c"],
                "geometry": [
                    wkb.linestring(np.array([[-5.0, 5.0], [25.0, 5.0]])),  # crosses both
                    wkb.linestring(np.array([[2.0, 2.0], [8.0, 8.0]])),    # inside r1
                    wkb.linestring(np.array([[40.0, 40.0], [50.0, 50.0]])),  # outside
                ],
            }
        )
    )
    polys = spark.createDataFrame(
        pd.DataFrame(
            {
                "poly_id": ["r1", "r2"],
                "zone": ["west", "east"],
                "geometry": [_rect(0, 0, 10, 10), _rect(15, 0, 22, 10)],
            }
        )
    )
    return lines, polys


def test_overlay_intersection(spark, lines_polys):
    lines, polys = lines_polys
    out = overlay_lines_polygons(lines, polys, how="intersection", res=20).collect()
    by = {(r.line_id, r.poly_id): r for r in out}
    assert set(by) == {(1, "r1"), (1, "r2"), (2, "r1")}
    assert by[(1, "r1")].piece_len_m == pytest.approx(10.0)
    assert by[(1, "r2")].piece_len_m == pytest.approx(7.0)
    assert by[(2, "r1")].piece_len_m == pytest.approx(np.hypot(6, 6))
    assert by[(1, "r2")].zone == "east" and by[(1, "r1")].kind == "a"


def test_overlay_difference(spark, lines_polys):
    lines, polys = lines_polys
    out = overlay_lines_polygons(lines, polys, how="difference", res=20).collect()
    per_line = {}
    for r in out:
        per_line.setdefault(r.line_id, []).append(r.piece_len_m)
    # line 1: 30 total − 10 (r1) − 7 (r2) = 13 in 3 pieces
    assert sorted(per_line[1]) == pytest.approx([3.0, 5.0, 5.0])
    # line 2 fully inside r1 -> nothing survives
    assert 2 not in per_line
    # line 3 untouched (left-anti pass-through)
    assert per_line[3] == pytest.approx([np.hypot(10, 10)])


def test_overlay_union_partitions_length(spark, lines_polys):
    lines, polys = lines_polys
    out = overlay_lines_polygons(lines, polys, how="union", res=20)
    total = (
        out.filter(F.col("line_id") == 1)
        .agg(F.sum("piece_len_m").alias("s"))
        .collect()[0]
        .s
    )
    assert total == pytest.approx(30.0)
    # inside pieces carry poly attrs, outside pieces carry nulls
    zones = {
        (r.poly_id, round(r.piece_len_m, 6))
        for r in out.filter(F.col("line_id") == 1).collect()
    }
    assert ("r1", 10.0) in zones and ("r2", 7.0) in zones
    assert any(p is None for p, _ in zones)


@pytest.mark.parametrize("how", ["intersection", "difference", "union"])
def test_overlay_dist_matches_broadcast(spark, lines_polys, how):
    """The distributed (big-polygon-table) path returns exactly the
    broadcast path's rows — same parity contract points_in_polygons
    has for its two paths."""

    def rows(broadcast):
        out = overlay_lines_polygons(
            lines_polys[0], lines_polys[1], how=how, res=20,
            broadcast_polys=broadcast,
        )
        return sorted(
            (
                r.line_id,
                getattr(r, "poly_id", None) or "",
                bytes(r.geometry).hex(),
                round(r.piece_len_m, 9),
            )
            for r in out.collect()
        )

    assert rows(True) == rows(False)


@pytest.fixture(scope="module")
def beach(spark):
    spec = corpus.CorpusSpec(
        tile_px=96, halo_px=6, tiles_x=3, tiles_y=2,
        year0=2000, year1=2002, obs_per_year=5, cloud_frac=0.04, seed=7,
    )
    tiles = spark.createDataFrame(corpus.generate_pandas(spec))
    sl = shoreline_pipeline(tiles, apply_tide_filter=True)
    return spec, sl


def test_transect_chainages_match_analytic_coast(spark, beach):
    spec, sl = beach
    y_lo, y_hi = -2000.0, 2000.0
    xs = [700.0, 2500.0, 4300.0, 6100.0, 7900.0]
    transects = spark.createDataFrame(
        pd.DataFrame(
            {
                "id": [f"t{i}" for i in range(len(xs))],
                "geometry": [
                    wkb.linestring(np.array([[x, y_lo], [x, y_hi]])) for x in xs
                ],
            }
        )
    )
    ch = transect_chainages(transects, sl).filter(F.col("n_crossings") == 1)
    rows = ch.collect()
    assert len(rows) >= 10  # most (transect, year) pairs cross exactly once
    for r in rows:
        x = xs[int(r.id[1:])]
        want = float(corpus.y_coast(spec, np.array([x]), r.year, tide_m=0.0)[0]) - y_lo
        # subpixel contour on median composite: within one pixel of truth
        assert abs(r.chainage_m - want) < spec.res_m, (r.id, r.year)


def test_validation_errors_and_stats(spark, beach):
    spec, sl = beach
    y_lo, y_hi = -2000.0, 2000.0
    xs = [700.0, 2500.0, 4300.0, 6100.0, 7900.0]
    transects = spark.createDataFrame(
        pd.DataFrame(
            {
                "id": [f"t{i}" for i in range(len(xs))],
                "geometry": [
                    wkb.linestring(np.array([[x, y_lo], [x, y_hi]])) for x in xs
                ],
            }
        )
    )
    survey_rows = []
    for i, x in enumerate(xs):
        for year in spec.years:
            truth = float(corpus.y_coast(spec, np.array([x]), year, 0.0)[0]) - y_lo
            survey_rows.append((f"t{i}", f"{year}-06-01", truth))
    survey = spark.createDataFrame(
        pd.DataFrame(survey_rows, columns=["id", "date", "distance"])
    ).withColumn("date", F.to_timestamp("date"))

    errs = validation_errors(survey, transects, sl)
    stats = validation_stats(errs).collect()[0]
    assert stats.n >= 10
    assert stats.mae < spec.res_m          # within one pixel
    assert abs(stats.bias) < spec.res_m
    assert stats.corr > 0.99               # transect positions track truth
