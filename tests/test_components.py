"""Distributed cross-tile connected components vs a whole-domain
single-array labeling oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from dea_coastlines_spark.functions import label as label_fn
from dea_coastlines_spark.operators.components import global_components

W = H = 32
TX = TY = 3  # 3x3 tile grid, 96x96 world


def world_mask(seed: int = 4) -> np.ndarray:
    """96x96 world: one snake spanning many tiles, one cross-boundary
    diagonal touch, several isolated blobs."""
    m = np.zeros((H * TY, W * TX), bool)
    m[46:50, 5:90] = True          # horizontal snake across all 3 tile cols
    m[10:60, 46:49] = True         # vertical bar crossing tile rows, touches snake
    m[5:8, 5:8] = True             # isolated blob tile (0,0)
    m[70:74, 70:74] = True         # isolated blob tile (2,2)
    # diagonal-only contact across the corner of 4 tiles at (32, 32):
    m[31, 31] = True
    m[32, 32] = True
    return m


def tiles_from_world(spark, world: np.ndarray):
    rows = []
    for ty in range(TY):
        for tx in range(TX):
            # row 0 of the tile = TOP; world array row 0 = top as well
            block = world[
                (TY - 1 - ty) * H : (TY - ty) * H, tx * W : (tx + 1) * W
            ]
            rows.append(
                {
                    "tile_x": tx,
                    "tile_y": ty,
                    "w": W,
                    "h": H,
                    "mask_bytes": block.astype(np.uint8).tobytes(),
                }
            )
    return spark.createDataFrame(
        pd.DataFrame(rows),
        "tile_x int, tile_y int, w int, h int, mask_bytes binary",
    )


@pytest.mark.parametrize("connectivity", [1, 2])
def test_global_components_match_whole_domain_oracle(spark, connectivity):
    world = world_mask()
    got = global_components(
        tiles_from_world(spark, world), connectivity=connectivity
    ).collect()

    labels, n = label_fn.label(world, connectivity)
    oracle_sizes = sorted(
        int((labels == i).sum()) for i in range(1, n + 1)
    )

    comp_sizes = {}
    for r in got:
        comp_sizes[r.component_id] = r.component_px
    assert sorted(comp_sizes.values()) == oracle_sizes
    # per-tile pixel sums add up to the component sizes
    per_comp = {}
    for r in got:
        per_comp[r.component_id] = per_comp.get(r.component_id, 0) + r.n_px
    assert per_comp == comp_sizes


def test_components_parallelism_invariant(spark):
    world = world_mask()
    tiles = tiles_from_world(spark, world)

    def run(parts):
        old = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        try:
            rows = global_components(tiles).collect()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)
        return sorted((r.component_id, r.tile_x, r.tile_y, r.label) for r in rows)

    assert run(2) == run(16)


def test_global_components_driver_path_equals_distributed(spark):
    """The auto small-graph driver union-find and the distributed
    min-label loop must produce identical output rows."""
    tiles = tiles_from_world(spark, world_mask())
    fast = global_components(tiles).collect()
    slow = global_components(tiles, small_graph_edges=0).collect()
    assert sorted(map(tuple, fast)) == sorted(map(tuple, slow))
