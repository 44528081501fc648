"""Triangle counting + local clustering coefficients over a link
graph — the canonical graph-analytics aggregate, with the
degree-ordered orientation that makes it survive web-scale skew.

A naive wedge join explodes on hubs: a node with in-degree d generates
d^2 wedges, and a 10^8-degree celebrity is fatal.  The standard fix
(compact-forward / node-iterator++) orients every undirected edge from
the lower-(degree, id) endpoint to the higher one; every triangle is
then counted exactly once from its lowest-ranked corner, and the
oriented out-degree is bounded by O(sqrt(m)) — hub wedges vanish by
construction, not by salting.  The whole operator is three hash joins
and one aggregation, all JVM-side; counts are integers, so the result
is partition-order invariant and hash-verifiable (the DuckDB oracle
counts the same triangles from the unoriented canonical a<b<c form —
orientation changes the plan, never the result).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def undirected_simple(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Directed multigraph -> simple undirected edge set: canonical
    (a < b) endpoints, self-loops dropped, duplicates collapsed."""
    return (
        edges.select(
            F.least(src, dst).alias("a"), F.greatest(src, dst).alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def triangle_counts(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node triangle participation + local clustering coefficient
    over the simple undirected graph.  Returns
    (id, deg, tri_count, clustering) for every node in >= 1 triangle.

    clustering = (2.0 * tri) / (deg * (deg - 1)), rounded to 6 dp — a
    single multiply/divide on exact integers, deterministic on both
    engines."""
    # lazy checkpoints: same multi-consumer reuse (cached on first
    # compute) and lineage truncation, but no driver-blocking job per
    # materialization — the whole operator executes at action time
    e = undirected_simple(edges, src, dst).localCheckpoint(eager=False)
    deg = (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("deg"))
    )
    # rank = (deg, id); orient each edge from lower rank to higher rank
    ranked = (
        e.join(deg.select(F.col("v").alias("a"), F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("v").alias("b"), F.col("deg").alias("db")), "b")
    )
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    fwd = ranked.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(a_first, F.col("da")).otherwise(F.col("db")).alias("dlo"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("hi"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("dhi"),
    ).localCheckpoint(eager=False)
    # wedges from the lowest-ranked corner; out-degree of `lo` is the
    # oriented degree, bounded O(sqrt(m)) — no hub blowup
    w1 = fwd.select(
        F.col("lo").alias("x"),
        F.col("hi").alias("y"),
        F.col("dhi").alias("dy"),
    )
    w2 = fwd.select(
        F.col("lo").alias("x"),
        F.col("hi").alias("z"),
        F.col("dhi").alias("dz"),
    )
    y_first = (F.col("dy") < F.col("dz")) | (
        (F.col("dy") == F.col("dz")) & (F.col("y") < F.col("z"))
    )
    wedges = (
        w1.join(w2, "x")
        .filter(F.col("y") != F.col("z"))
        .filter(y_first)  # each unordered wedge once, in rank order
        .select("x", "y", "z")
    )
    tris = wedges.join(
        fwd.select(F.col("lo").alias("y"), F.col("hi").alias("z")), ["y", "z"]
    )
    corners = (
        tris.select(F.col("x").alias("id"))
        .unionAll(tris.select(F.col("y").alias("id")))
        .unionAll(tris.select(F.col("z").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("tri_count"))
    )
    return corners.join(deg.select(F.col("v").alias("id"), "deg"), "id").select(
        "id",
        "deg",
        "tri_count",
        F.round(
            (F.lit(2.0) * F.col("tri_count"))
            / (F.col("deg") * (F.col("deg") - F.lit(1))),
            6,
        ).alias("clustering"),
    )


def triangles_sql(edges_cte: str) -> str:
    """DuckDB oracle body: `edges_cte` must define a relation
    edges(src, dst); the oracle canonicalizes and counts triangles from
    the unoriented a<b<c form — same integers as the oriented Spark
    plan, by symmetry of the triangle relation."""
    return f"""
WITH {edges_cte},
e AS (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM edges WHERE src != dst),
deg AS (
  SELECT v, COUNT(*) AS deg FROM (
    SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e) GROUP BY v),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM e e1 JOIN e e2 ON e2.a = e1.b
            JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
corners AS (
  SELECT v, COUNT(*) AS tri_count FROM (
    SELECT x AS v FROM tri UNION ALL SELECT y AS v FROM tri
    UNION ALL SELECT z AS v FROM tri) GROUP BY v)
SELECT c.v AS id, CAST(d.deg AS BIGINT) AS deg,
       CAST(c.tri_count AS BIGINT) AS tri_count,
       ROUND((2.0 * c.tri_count) / (d.deg * (d.deg - 1)), 6) AS clustering
FROM corners c JOIN deg d ON d.v = c.v
"""
