"""Fixed-point PageRank invariants beyond the driver oracle: mass
conservation, parallelism invariance (the property the fixed-point
representation buys), dangling-node leak semantics, and plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dea_coastlines_spark.operators.pagerank import (
    pagerank_fixed_point,
    synth_citation_edges,
)

SF = "/root/testdata/sf0.01"
TOTAL = 10**12


@pytest.fixture(scope="module")
def graph(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    nodes = docs.select(F.col("doc_id").alias("id"))
    edges = synth_citation_edges(docs)
    return nodes, edges


def test_mass_conserved_up_to_truncation(spark, graph):
    """Every node has out-degree 3 by construction, so the only mass
    loss is integer-division truncation: < 1 unit per (edge + node) per
    iteration."""
    nodes, edges = graph
    n_nodes, n_edges = nodes.count(), edges.count()
    iters = 8
    ranks = pagerank_fixed_point(nodes, edges, id_col="id", iters=iters)
    tot = ranks.agg(F.sum("rank_fp")).collect()[0][0]
    assert tot <= TOTAL
    assert TOTAL - tot <= iters * (n_edges + 2 * n_nodes)


def test_partition_count_invariance(spark, graph):
    """Identical bigint ranks under 1 partition and 16 partitions —
    the bit-reproducibility claim the fixed-point arithmetic makes.
    A float implementation fails this in the last ulp."""
    nodes, edges = graph
    a = pagerank_fixed_point(
        nodes.coalesce(1), edges.coalesce(1), id_col="id", iters=4
    )
    b = pagerank_fixed_point(
        nodes.repartition(16), edges.repartition(16), id_col="id", iters=4
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_dangling_nodes_keep_base_rank(spark):
    """A node with no in-edges holds exactly the teleport base; a
    2-node cycle plus a dangling source: ranks are the closed-form
    recurrence values."""
    nodes = spark.createDataFrame([(0,), (1,), (2,)], "id long")
    # 0 -> 1, 1 -> 0 cycle; 2 -> 0 dangling-source
    edges = spark.createDataFrame([(0, 1), (1, 0), (2, 0)], "src long, dst long")
    total, iters = 10**12, 3
    base = total * 3 // 20 // 3
    r = {0: total // 3, 1: total // 3, 2: total // 3}

    def contrib(x):
        return x * 17 // 20  # out_deg 1 for every src here

    for _ in range(iters):
        r = {
            0: base + contrib(r[1]) + contrib(r[2]),
            1: base + contrib(r[0]),
            2: base,
        }
    got = {
        row["id"]: row["rank_fp"]
        for row in pagerank_fixed_point(nodes, edges, id_col="id", iters=iters).collect()
    }
    assert got == r


def test_plan_has_no_cartesian(spark, graph):
    nodes, edges = graph
    ranks = pagerank_fixed_point(nodes, edges, id_col="id", iters=2)
    plan = ranks._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
