"""Triangle-counting invariants beyond the driver oracle: closed-form
small graphs, orientation independence, hub-wedge boundedness (the
scale property degree ordering buys), and a no-cartesian plan gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from dea_coastlines_spark.operators.triangles import (
    triangle_counts,
    undirected_simple,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_k4_closed_form(spark):
    """K4: every node is in C(3,2)=3 triangles, clustering 1.0."""
    pairs = [(a, b) for a in range(4) for b in range(4) if a < b]
    out = {r["id"]: r for r in triangle_counts(_edges(spark, pairs)).collect()}
    assert set(out) == {0, 1, 2, 3}
    for v in out.values():
        assert v["tri_count"] == 3 and v["deg"] == 3 and v["clustering"] == 1.0


def test_square_has_no_triangles(spark):
    pairs = [(0, 1), (1, 2), (2, 3), (3, 0)]
    assert triangle_counts(_edges(spark, pairs)).count() == 0


def test_multiedges_selfloops_direction_ignored(spark):
    """A triangle reported identically whether edges arrive duplicated,
    reversed, or with self-loops mixed in."""
    clean = [(0, 1), (1, 2), (0, 2)]
    dirty = [(1, 0), (0, 1), (2, 1), (0, 2), (2, 0), (1, 1)]
    a = sorted(map(tuple, triangle_counts(_edges(spark, clean)).collect()))
    b = sorted(map(tuple, triangle_counts(_edges(spark, dirty)).collect()))
    assert a == b and len(a) == 3


def test_hub_wedge_boundedness(spark):
    """A star hub (degree 100) plus one pendant triangle: with degree
    ordering the hub generates ZERO wedges from itself (every star edge
    orients INTO the hub), so the wedge count stays linear. The check
    is on the result (correct counts despite the hub) — the plan-level
    guarantee is the orientation rule itself, pinned here by
    construction on a graph where naive wedge-joins would build 100^2
    candidates."""
    star = [(0, i) for i in range(1, 101)]
    tri = [(1, 2)]  # closes triangle 0-1-2
    out = {r["id"]: r["tri_count"] for r in triangle_counts(_edges(spark, star + tri)).collect()}
    assert out == {0: 1, 1: 1, 2: 1}


def test_undirected_simple_canonicalizes(spark):
    e = undirected_simple(_edges(spark, [(2, 1), (1, 2), (3, 3), (1, 3)]))
    assert sorted(map(tuple, e.collect())) == [(1, 2), (1, 3)]


def test_plan_no_cartesian(spark):
    pairs = [(a, b) for a in range(4) for b in range(4) if a < b]
    df = triangle_counts(_edges(spark, pairs))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
