"""dissolve / contour_certainty / Pinatubo rule (vector.py:344,
414-471 semantics) with closed-form oracles on pixel-aligned input."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from dea_coastlines_spark.geometry import wkb
from dea_coastlines_spark.operators import dissolve as dz


def _rect(x0, y0, x1, y1):
    return wkb.polygon(np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], float))


def test_dissolve_union_area_and_parts(spark):
    """Overlapping rects union (inclusion-exclusion oracle); disjoint
    rects stay separate parts; keys don't mix."""
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "cls": ["a", "a", "a", "b"],
                "geometry": [
                    _rect(0, 0, 10, 10),     # 100
                    _rect(5, 5, 15, 15),     # 100, overlap 25 -> union 175
                    _rect(30, 30, 34, 38),   # disjoint: 32
                    _rect(0, 0, 4, 4),       # other key: 16
                ],
            }
        )
    )
    out = dz.dissolve(df, ["cls"], pixel=1.0).toPandas().set_index("cls")
    assert out.loc["a", "area_px"] == pytest.approx(175 + 32)
    assert out.loc["a", "n_parts"] == 2
    assert out.loc["b", "area_px"] == pytest.approx(16)
    assert out.loc["b", "n_parts"] == 1
    # geometry is a parsable MultiPolygon with the right part count
    t, payload = wkb.parse(bytes(out.loc["a", "geometry"]))
    assert t == wkb.MULTIPOLYGON and len(payload) == 2


def test_dissolve_preserves_holes(spark):
    """A polygon with a hole dissolves to a shell + hole; the hole area
    is excluded."""
    shell = np.array([[0, 0], [12, 0], [12, 12], [0, 12]], float)
    hole = np.array([[4, 4], [8, 4], [8, 8], [4, 8]], float)
    df = spark.createDataFrame(
        pd.DataFrame({"cls": ["h"], "geometry": [wkb.polygon(shell, [hole])]})
    )
    out = dz.dissolve(df, ["cls"], pixel=1.0).toPandas().iloc[0]
    assert out.area_px == pytest.approx(144 - 16)
    t, payload = wkb.parse(bytes(out.geometry))
    assert t == wkb.MULTIPOLYGON
    assert len(payload) == 1 and len(payload[0]) == 2  # shell + hole ring


def test_dissolve_grid_origin_invariance(spark):
    """Shifting a group by an exact pixel multiple shifts the geometry
    but keeps area/parts identical (origin snapping)."""
    base = [_rect(1, 1, 7, 5), _rect(5, 3, 11, 9)]
    shifted = [_rect(101, 201, 107, 205), _rect(105, 203, 111, 209)]
    df = spark.createDataFrame(
        pd.DataFrame(
            {"cls": ["a", "a", "b", "b"], "geometry": base + shifted}
        )
    )
    out = dz.dissolve(df, ["cls"], pixel=1.0).toPandas().set_index("cls")
    assert out.loc["a", "area_px"] == out.loc["b", "area_px"]
    assert out.loc["a", "n_parts"] == out.loc["b", "n_parts"] == 1


def test_pinatubo_rule(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "year": [1991, 1992, 1991, 1993],
                # planar metres; *1e-5 deg/m -> lat deg
                "cy": [-1.0e6, -1.0e6, -2.9e6, -1.0e6],
                "certainty": ["good"] * 4,
            }
        )
    )
    out = dz.apply_pinatubo_rule(df).toPandas().sort_values("year").certainty.tolist()
    # 1991 @ -10deg -> flagged; 1991 @ -29deg -> south of limit, kept;
    # 1992 @ -10deg -> flagged; 1993 -> wrong year, kept
    assert sorted(out) == sorted(["aerosol issues", "aerosol issues", "good", "good"])


def test_contour_certainty_year_matched_overlay(spark):
    """Shorelines are clipped by THEIR year's certainty polygons only,
    attributed with the polygon class, and the Pinatubo rule applies."""
    lines = spark.createDataFrame(
        pd.DataFrame(
            {
                "_sl_id": [1, 2],
                "year": [1991, 1995],
                "geometry": [
                    wkb.linestring(np.array([[-5.0, 5.0], [25.0, 5.0]])),
                    wkb.linestring(np.array([[-5.0, 5.0], [25.0, 5.0]])),
                ],
            }
        )
    )
    polys = spark.createDataFrame(
        pd.DataFrame(
            {
                "poly_id": ["p91", "p95"],
                "year": [1991, 1995],
                "certainty": ["good", "unstable data"],
                "geometry": [_rect(0, 0, 10, 10), _rect(15, 0, 22, 10)],
            }
        )
    )
    out = dz.contour_certainty(lines, polys, res=20).toPandas()
    by = {(r["_sl_id"], r["poly_id"]): r for _, r in out.iterrows()}
    # 1991 line clipped by 1991 poly only; 1995 by 1995 poly only
    assert set(by) == {(1, "p91"), (2, "p95")}
    assert by[(1, "p91")].piece_len_m == pytest.approx(10.0)
    assert by[(2, "p95")].piece_len_m == pytest.approx(7.0)
    # Pinatubo: the 1991 piece sits at cy=5 m ~ lat 0.00005 deg > -23
    assert by[(1, "p91")].certainty == "aerosol issues"
    assert by[(2, "p95")].certainty == "unstable data"


def test_contour_certainty_broadcast_matches_distributed(spark):
    lines = spark.createDataFrame(
        pd.DataFrame(
            {
                "_sl_id": [1],
                "year": [2000],
                "geometry": [wkb.linestring(np.array([[-5.0, 5.0], [25.0, 5.0]]))],
            }
        )
    )
    polys = spark.createDataFrame(
        pd.DataFrame(
            {
                "poly_id": ["p"],
                "year": [2000],
                "certainty": ["good"],
                "geometry": [_rect(0, 0, 10, 10)],
            }
        )
    )

    def rows(bc):
        return sorted(
            (r["_sl_id"], r["poly_id"], round(r["piece_len_m"], 9), r["certainty"])
            for r in dz.contour_certainty(
                lines, polys, res=20, broadcast_polys=bc
            ).collect()
        )

    assert rows(True) == rows(False)
