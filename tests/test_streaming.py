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
