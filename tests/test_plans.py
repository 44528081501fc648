"""Physical-plan regression tests: the optimizations we rely on at
scale must stay visible in explain output (predicate pushdown reaching
the scan, column pruning, broadcast joins, bounded exchange counts,
JVM-only caption parsing)."""

from __future__ import annotations

import contextlib
import io
import re

import pytest

from dea_coastlines_spark.plans import driver_queries as dq
from dea_coastlines_spark.plans.pipeline import shoreline_pipeline
from dea_coastlines_spark.synth import corpus

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_and_column_pruning(spark):
    p = plan_of(dq.QUERIES["pricing_summary"](spark, SF))
    assert "LessThanOrEqual(l_shipdate" in p  # predicate reached parquet
    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    assert m, p
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert "l_comment" not in cols and len(cols) <= 6  # pruned scan


def test_star_join_broadcasts_all_dims(spark):
    p = plan_of(dq.QUERIES["join_star"](spark, SF))
    # formatted mode lists each node in the tree AND in the detail
    # section — count the numbered detail entries
    assert len(re.findall(r"\(\d+\) BroadcastHashJoin", p)) == 3


def test_semi_anti_join_strategies(spark):
    p = plan_of(dq.QUERIES["semi_anti_join"](spark, SF))
    assert "LeftSemi" in p and "LeftAnti" in p


def test_flagship_parquet_plan_shape(spark, tmp_path):
    spec = corpus.CorpusSpec(
        tile_px=64, halo_px=4, tiles_x=2, tiles_y=1,
        year0=2000, year1=2001, obs_per_year=2, seed=3,
    )
    spark.createDataFrame(
        corpus.generate_pandas(spec), schema=corpus.TILES_SCHEMA
    ).write.parquet(str(tmp_path / "t"))
    tiles = spark.read.parquet(str(tmp_path / "t"))
    p = plan_of(shoreline_pipeline(tiles, apply_tide_filter=True))
    # exactly two exchanges: tiny tide-cutoff aggregate + the one
    # (tile, year) group shuffle
    assert len(re.findall(r"\) Exchange", p)) == 2
    # the cutoff subtree scans ONLY the caption column
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", p)
    assert any(s.strip() == "caption:string" for s in schemas), schemas
    # image bytes cross into Python exactly twice (composite + contours)
    assert len(re.findall(r"\(\d+\) (?:FlatMapGroupsInPandas|MapInPandas)", p)) == 2


def test_knn_k1_plan_has_single_aggregate_no_window(spark):
    p = plan_of(dq.QUERIES["knn_anchor_join"](spark, SF))
    assert "Window" not in p  # k=1 path is the argmin aggregation


def test_hamming_pairs_plan_is_jvm_only(spark):
    """phash near-dup must never leave the JVM: no Python evals in the
    plan, and the signature table is scanned with only (id, phash)."""
    import pandas as pd

    from dea_coastlines_spark.operators.dedup import hamming_pairs

    sdf = spark.createDataFrame(
        pd.DataFrame({"image_id": ["a", "b", "c"], "phash": [1, 2, 3]})
    )
    p = plan_of(hamming_pairs(sdf, "phash", "image_id", max_hamming=6))
    assert "PythonUDF" not in p and "EvalPython" not in p
    assert "bit_count" in p.lower()


def test_ngram_jaccard_plan_is_jvm_only(spark):
    p = plan_of(dq.QUERIES["ngram_jaccard"](spark, SF))
    assert "PythonUDF" not in p and "EvalPython" not in p
