"""Cell index + geohash unit tests (SURVEY.md §5: H3 assignment parity)."""

from __future__ import annotations

import numpy as np

from dea_coastlines_spark.index import cells
from dea_coastlines_spark.index.geohash import geohash_encode


def test_cell_roundtrip_ij():
    rng = np.random.default_rng(0)
    for res in (3, 10, 20, 29):
        n = 1 << res
        ix = rng.integers(0, n, 100)
        iy = rng.integers(0, n, 100)
        c = cells.ij_to_cell(ix, iy, res)
        jx, jy = cells.cell_to_ij(c)
        assert np.array_equal(ix, jx) and np.array_equal(iy, jy)
        assert np.all(cells.cell_res(c) == res)


def test_xy_to_cell_bounds_contain_point():
    rng = np.random.default_rng(1)
    x = rng.uniform(-2.5e6, 2.5e6, 200)
    y = rng.uniform(-2.5e6, 2.5e6, 200)
    for res in (5, 12, 18):
        c = cells.xy_to_cell(x, y, res)
        b = cells.cell_bounds(c)
        assert np.all((x >= b[:, 0]) & (x < b[:, 2]) & (y >= b[:, 1]) & (y < b[:, 3]))


def test_cell_parent_consistency():
    x = np.array([123456.7]), np.array([-987654.3])
    fine = cells.xy_to_cell(x[0], x[1], 20)
    coarse = cells.xy_to_cell(x[0], x[1], 8)
    assert cells.cell_parent(fine, 8)[0] == coarse[0]


def test_k_ring_counts_and_adjacency():
    c = cells.xy_to_cell(np.array([0.0]), np.array([0.0]), 10)[0]
    ring = cells.k_ring(c, 1)
    assert len(ring) == 9 and c in ring
    b0 = cells.cell_bounds(np.array([c]))[0]
    for nb in ring:
        b = cells.cell_bounds(np.array([nb]))[0]
        assert abs(b[0] - b0[0]) <= (b0[2] - b0[0]) + 1e-6


def test_k_ring_batch_matches_scalar():
    cs = cells.xy_to_cell(np.array([0.0, 5e5]), np.array([0.0, -5e5]), 12)
    src, nb = cells.k_ring_batch(cs, 1)
    for i, c in enumerate(cs):
        got = np.sort(nb[src == i])
        want = np.sort(cells.k_ring(c, 1))
        assert np.array_equal(got, want)


def test_polyfill_bbox_cover():
    res = 10
    size = cells.cell_size_m(res)
    cover = cells.polyfill_bbox(0.0, 0.0, 2.5 * size, 1.5 * size, res)
    assert len(cover) == 3 * 2
    b = cells.cell_bounds(cover)
    assert b[:, 0].min() <= 0.0 and b[:, 2].max() >= 2.5 * size


def test_geohash_known_values():
    # canonical test vector: (57.64911, 10.40744) -> u4pruydqqvj
    gh = geohash_encode(np.array([57.64911]), np.array([10.40744]), 11)
    assert gh[0] == "u4pruydqqvj"
    gh10 = geohash_encode(np.array([-33.71, -33.72]), np.array([151.30, 151.31]), 10)
    assert len(gh10[0]) == 10 and gh10[0] != gh10[1]


def test_cell_expr_matches_numpy_at_all_resolutions(spark):
    """JVM Catalyst encoder == numpy encoder bit-for-bit INCLUDING
    res >= 16, where the header bits cross 2^63 and must be emitted as
    a signed (two's complement) int64 literal."""
    import pandas as pd
    from pyspark.sql import functions as F

    from dea_coastlines_spark.index import cells, cells_expr

    rng = np.random.default_rng(5)
    xs = rng.uniform(-2e6, 2e6, 100)
    ys = rng.uniform(-2e6, 2e6, 100)
    df = spark.createDataFrame(pd.DataFrame({"x": xs, "y": ys}))
    for res in (8, 15, 16, 20, 29):
        want = cells.xy_to_cell(xs, ys, res).astype(np.int64)
        got = np.array(
            [
                r.cell_id
                for r in df.select(
                    cells_expr.cell_id_expr(F.col("x"), F.col("y"), res)
                ).collect()
            ]
        )
        np.testing.assert_array_equal(got, want, err_msg=f"res={res}")
