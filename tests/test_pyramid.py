"""Overview-pyramid invariants beyond the driver oracle: block-mean
closed forms, NaN propagation, mosaic-edge (missing-child) handling,
partition invariance of the fingerprints, and geometric output counts."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dea_coastlines_spark.operators.pyramid import (
    assemble_parent,
    build_pyramid,
    downsample_block_mean,
    px_fingerprint,
    quantize_px,
)


def test_block_mean_closed_form():
    px = np.arange(16, dtype=np.float64).reshape(4, 4)
    out = downsample_block_mean(px)
    # block (0,0) = mean(0,1,4,5) = 2.5 etc.
    assert out.tolist() == [[2.5, 4.5], [10.5, 12.5]]


def test_nan_poisons_parent_pixel():
    px = np.ones((4, 4), np.float64)
    px[0, 0] = np.nan
    out = downsample_block_mean(px)
    assert np.isnan(out[0, 0]) and out[0, 1] == 1.0


def test_missing_child_becomes_nan_quadrant():
    child = np.ones((4, 4), np.float64)
    parent = assemble_parent({(0, 0): child}, 4)
    assert parent.shape == (4, 4)
    assert np.isfinite(parent[:2, :2]).all()
    assert np.isnan(parent[2:, :]).all() and np.isnan(parent[:2, 2:]).all()


def test_fingerprint_is_position_sensitive():
    a = quantize_px(np.array([[1.0, 2.0]]))
    b = quantize_px(np.array([[2.0, 1.0]]))
    assert px_fingerprint(a) != px_fingerprint(b)
    assert px_fingerprint(a) == px_fingerprint(a.copy())


@pytest.fixture(scope="module")
def comps(spark):
    from dea_coastlines_spark.operators.composite import annual_composites
    from dea_coastlines_spark.synth import corpus as _corpus

    spec = _corpus.CorpusSpec(tile_px=32, halo_px=4, tiles_x=4, tiles_y=2,
                              year0=2000, year1=2000, obs_per_year=3,
                              cloud_frac=0.05, seed=21)
    tiles = _corpus.generate_spark(spark, spec)
    return annual_composites(tiles, apply_tide_filter=False).localCheckpoint()


def test_level_counts_are_geometric(spark, comps):
    out = build_pyramid(comps, levels=2)
    counts = {r["level"]: r["n"] for r in
              out.groupBy("level").agg(F.count("*").alias("n")).collect()}
    # 4x2 -> 2x1 -> 1x1
    assert counts == {0: 8, 1: 2, 2: 1}
    # stored tiles are tile_px + 2*halo = 40x40; the 32x32 core remains
    # after halo crop, and parents keep the per-tile size by 2x decimation
    dims = out.select("w", "h").distinct().collect()
    assert {(r["w"], r["h"]) for r in dims} == {(32, 32)}


def test_partition_invariance(spark, comps):
    a = build_pyramid(comps.coalesce(1), levels=2).drop("px")
    b = build_pyramid(comps.repartition(8), levels=2).drop("px")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_no_cartesian(spark, comps):
    df = build_pyramid(comps, levels=1)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


@pytest.mark.parametrize("seed", [7, 42])
def test_multi_seed_engine_vs_sequential_oracle(spark, seed):
    """The driver gate pins seed 13 only; the level-chaining float32
    round-trip (engine re-encodes each level's px payload as f32
    before the next level decodes it) is seed-dependent — a float64
    oracle chain happens to agree at seed 13.  Pin two more seeds so
    the parity is structural, not coincidental."""
    from dea_coastlines_spark.operators.composite import annual_composites
    from dea_coastlines_spark.plans.driver_queries import pyramid_oracle_rows
    from dea_coastlines_spark.synth import corpus as _corpus

    spec = _corpus.CorpusSpec(tile_px=64, halo_px=4, tiles_x=4, tiles_y=4,
                              year0=2000, year1=2001, obs_per_year=4,
                              cloud_frac=0.05, seed=seed)
    tiles = _corpus.generate_spark(spark, spec)
    comps = annual_composites(tiles, apply_tide_filter=True)
    got = (build_pyramid(comps, levels=2)
           .orderBy("year", "level", "x", "y").toPandas())
    want = pyramid_oracle_rows(spec)
    cols = ["year", "level", "x", "y", "w", "h", "n_valid", "mean_q",
            "px_hash"]
    assert got[cols].astype("int64").values.tolist() == \
        want[cols].astype("int64").values.tolist()
