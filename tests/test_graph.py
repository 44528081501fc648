"""Connected components / dedup clustering vs a brute-force union-find
oracle implemented in the test."""

from __future__ import annotations

import numpy as np

from dea_coastlines_spark.operators import graph


def _uf_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min id per component
    out = {}
    for node in list(parent):
        root = find(node)
        out.setdefault(root, []).append(node)
    label = {}
    for members in out.values():
        m = min(members)
        for node in members:
            label[node] = m
    return label


def test_components_random_graph_matches_union_find(spark):
    rng = np.random.default_rng(17)
    edges = [
        (int(a), int(b))
        for a, b in zip(rng.integers(0, 200, 300), rng.integers(0, 200, 300))
        if a != b
    ]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r.node_id: r.cluster_id
        for r in graph.connected_components_pairs(df).collect()
    }
    want = _uf_components(edges)
    assert got == want


def test_components_chain_needs_propagation(spark):
    # a path graph exercises multi-round propagation (diameter >> 1)
    n = 40
    edges = [(i, i + 1) for i in range(n)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = graph.connected_components_pairs(
        df, max_rounds=50, small_graph_edges=0
    ).collect()
    assert all(r.cluster_id == 0 for r in got)
    assert {r.node_id for r in got} == set(range(n + 1))


def test_keep_canonical(spark):
    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in range(6)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (4, 5)], "id_a long, id_b long"
    )
    kept = sorted(
        r.doc_id for r in graph.keep_canonical(docs, pairs).collect()
    )
    # clusters {0,1,2} -> keep 0; {4,5} -> keep 4; 3 untouched
    assert kept == [0, 3, 4]


def test_components_raise_on_round_cap(spark):
    """ADVICE r2: exiting via the round cap means labels are still
    moving — must raise, not silently return split clusters."""
    import pytest

    edges = [(i, i + 1) for i in range(40)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        graph.connected_components_pairs(
            df, max_rounds=2, small_graph_edges=0
        ).collect()


def test_components_log_rounds_on_long_chain(spark):
    """Pointer jumping converges a 1,000-node path in O(log n) rounds —
    plain min-label propagation would need ~1,000."""
    n = 1000
    edges = [(i, i + 1) for i in range(n)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = graph.connected_components_pairs(
        df, max_rounds=15, small_graph_edges=0
    ).collect()
    assert all(r.cluster_id == 0 for r in got)
    assert {r.node_id for r in got} == set(range(n + 1))


def test_components_driver_path_equals_distributed(spark):
    """The auto small-graph driver union-find and the distributed
    min-label loop must produce the identical labeling (same schema,
    same rows) on the same input."""
    rng = np.random.default_rng(23)
    edges = [
        (int(a), int(b))
        for a, b in zip(rng.integers(0, 300, 450), rng.integers(0, 300, 450))
        if a != b
    ]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    fast = graph.connected_components_pairs(df)
    slow = graph.connected_components_pairs(df, small_graph_edges=0)
    assert fast.schema == slow.schema
    assert sorted(map(tuple, fast.collect())) == sorted(
        map(tuple, slow.collect())
    )


def test_components_driver_path_string_ids(spark):
    """Driver path handles non-numeric node ids (doc-id strings)."""
    pairs = [("d1", "d2"), ("d2", "d3"), ("x9", "x2")]
    df = spark.createDataFrame(pairs, "id_a string, id_b string")
    got = {
        r.node_id: r.cluster_id
        for r in graph.connected_components_pairs(df).collect()
    }
    assert got == {"d1": "d1", "d2": "d1", "d3": "d1", "x9": "x2", "x2": "x2"}


def test_keep_best_picks_highest_score(spark):
    from dea_coastlines_spark.operators.graph import keep_best

    docs = spark.createDataFrame(
        [(1, 0.5), (2, 0.9), (3, 0.9), (4, 0.1), (10, 0.0), (20, None),
         (30, 0.7)],
        "doc_id long, score double",
    )
    # clusters: {1,2,3,4} and {10,20}; 30 isolated
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 20)], "id_a long, id_b long"
    )
    kept = sorted(
        r.doc_id
        for r in keep_best(docs, pairs, "score").select("doc_id").collect()
    )
    # cluster 1: max score 0.9 tie between 2 and 3 -> smaller id 2
    # cluster 2: 0.0 beats NULL -> 10; isolated 30 always kept
    assert kept == [2, 10, 30]


def test_keep_best_ascending_and_all_null(spark):
    from dea_coastlines_spark.operators.graph import keep_best

    docs = spark.createDataFrame(
        [(1, 3.0), (2, 1.0), (3, None), (7, None), (8, None)],
        "doc_id long, score double",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "id_a long, id_b long"
    )
    kept = sorted(
        r.doc_id
        for r in keep_best(docs, pairs, "score", ascending=True)
        .select("doc_id").collect()
    )
    # ascending: min score wins (2); all-NULL cluster {7,8} -> min id 7
    assert kept == [2, 7]
