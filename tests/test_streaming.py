"""Structured Streaming incremental-composite test: stream two file
drops, assert the composites table converges to the batch result."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from dea_coastlines_spark.operators import composite as comp_op
from dea_coastlines_spark.streaming.incremental import start_incremental_composites
from dea_coastlines_spark.synth import corpus

SPEC = corpus.CorpusSpec(
    tile_px=48, halo_px=4, tiles_x=2, tiles_y=1,
    year0=2000, year1=2001, obs_per_year=3, cloud_frac=0.0, seed=17,
)


@pytest.fixture()
def dirs():
    base = tempfile.mkdtemp(prefix="stream_")
    yield {
        "tiles": f"{base}/tiles",
        "out": f"{base}/composites",
        "ckpt": f"{base}/ckpt",
    }
    shutil.rmtree(base, ignore_errors=True)


def test_incremental_composites_converge(spark, dirs):
    pdf = corpus.generate_pandas(SPEC)
    half1 = pdf[pdf.image_id.str.contains("_2000_")]
    half2 = pdf[~pdf.image_id.str.contains("_2000_")]

    # drop 1: year 2000 only (explicit schema: the stream reader expects
    # the canonical tiles schema, not pandas-inferred int64)
    spark.createDataFrame(half1, schema=corpus.TILES_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(dirs["tiles"])
    q = start_incremental_composites(spark, dirs["tiles"], dirs["out"], dirs["ckpt"])
    q.awaitTermination(120)
    got1 = spark.read.parquet(dirs["out"])
    assert got1.select("year").distinct().count() == 1

    # drop 2: year 2001 arrives later
    spark.createDataFrame(half2, schema=corpus.TILES_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(dirs["tiles"])
    q = start_incremental_composites(spark, dirs["tiles"], dirs["out"], dirs["ckpt"])
    q.awaitTermination(120)

    got = (
        spark.read.parquet(dirs["out"])
        .select("tile_x", "tile_y", "year", F.md5("mndwi_bytes").alias("h"))
        .toPandas().sort_values(["tile_x", "tile_y", "year"]).reset_index(drop=True)
    )
    want = (
        comp_op.annual_composites(spark.createDataFrame(pdf), False)
        .select("tile_x", "tile_y", "year", F.md5("mndwi_bytes").alias("h"))
        .toPandas().sort_values(["tile_x", "tile_y", "year"]).reset_index(drop=True)
    )
    assert got.equals(want)


def test_incremental_shorelines_upsert(spark, tmp_path):
    """Streamed new-year arrivals update only affected shoreline
    partitions; final table equals a from-scratch batch run."""
    from dea_coastlines_spark.plans.pipeline import shoreline_pipeline
    from dea_coastlines_spark.sources.table import SnapshotTable
    from dea_coastlines_spark.streaming.incremental import (
        start_incremental_shorelines,
    )

    tiles_dir = str(tmp_path / "tiles")
    table_path = str(tmp_path / "sl")
    ckpt = str(tmp_path / "ck")

    spec1 = corpus.CorpusSpec(
        tile_px=96, halo_px=6, tiles_x=2, tiles_y=2,
        year0=2000, year1=2001, obs_per_year=4, cloud_frac=0.0, seed=3,
    )
    spark.createDataFrame(
        corpus.generate_pandas(spec1), schema=corpus.TILES_SCHEMA
    ).write.mode("append").parquet(tiles_dir)
    q = start_incremental_shorelines(spark, tiles_dir, table_path, ckpt)
    q.awaitTermination(300)
    t = SnapshotTable(spark, table_path)
    v1 = t.current_version()
    n1 = t.read().count()
    assert n1 > 0

    # a new year lands
    spec2 = corpus.CorpusSpec(
        tile_px=96, halo_px=6, tiles_x=2, tiles_y=2,
        year0=2002, year1=2002, obs_per_year=4, cloud_frac=0.0, seed=3,
    )
    spark.createDataFrame(
        corpus.generate_pandas(spec2), schema=corpus.TILES_SCHEMA
    ).write.mode("append").parquet(tiles_dir)
    q2 = start_incremental_shorelines(spark, tiles_dir, table_path, ckpt)
    q2.awaitTermination(300)
    assert t.current_version() > v1
    got = t.read()
    assert got.filter(F.col("year") == 2002).count() > 0

    # equals from-scratch batch output
    batch = shoreline_pipeline(
        comp_op.with_caption(spark.read.parquet(tiles_dir)),
        apply_tide_filter=True,
    )
    want = sorted(
        (r.tile_x, r.tile_y, r.year, bytes(r.geometry).hex())
        for r in batch.collect()
    )
    have = sorted(
        (r.tile_x, r.tile_y, r.year, bytes(r.geometry).hex())
        for r in got.collect()
    )
    assert have == want
