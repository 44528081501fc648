"""IVF-PQ properties beyond the driver oracle: planted-duplicate
retrieval (the deterministic quality guarantee), ambient overlap vs the
exact brute-force baseline, code-table compression contract, and the
zero-Python-scoring plan gate."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dea_coastlines_spark.operators import pq
from dea_coastlines_spark.operators.similarity import (
    brute_force_topk,
    train_ivf_centroids,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def fitted(emb):
    coarse = train_ivf_centroids(emb, 16)
    codebook = pq.pq_train_codebook(emb, ksub=64)
    return coarse, codebook


def test_codebook_shape_and_grid(emb, fitted):
    _, cb = fitted
    assert cb.shape == (8, 64, 8)
    assert cb.dtype == np.int64
    # grid units: unit-normalized coordinates stay well inside the
    # int64-square-sum safe range (|v| <= SCALE up to rounding)
    assert np.abs(cb).max() <= pq.SCALE + 1


def test_encode_compression_contract(emb, fitted):
    """The memory-scale claim: the code table carries exactly m small
    ints per vector (sub-byte information content vs 64 float32)."""
    _, cb = fitted
    codes = pq.pq_encode(emb, cb)
    row = codes.first()
    assert len(row["codes"]) == 8
    stats = codes.select(
        F.min(F.array_min("codes")).alias("lo"),
        F.max(F.array_max("codes")).alias("hi"),
    ).collect()[0]
    assert stats["lo"] >= 0 and stats["hi"] < 64


def test_planted_duplicate_is_rank_one(spark, emb, fitted):
    """Deterministic retrieval guarantee: an exact copy of the query
    vector gets the query's own codes, and ADC to one's own codes is
    the minimum over all code words (argmin definition) — so the
    planted copy must come back at rank 1 for every query, through the
    coarse probe AND the quantized scoring. This is the PQ analog of
    embedding_neardup's planted-duplicate recall-1 test."""
    coarse, cb = fitted
    base = emb.select("vec_id", "embedding")
    seed = base.filter(F.col("vec_id") < 10)
    copies = seed.select(
        (F.col("vec_id") + 100000).alias("vec_id"), F.col("embedding")
    )
    aug = base.unionByName(copies)
    got = pq.ivfpq_topk(aug, seed, k=5, centroids=coarse, codebook=cb).collect()
    rank1 = {r["query_id"]: r["item_id"] for r in got if r["rank"] == 1}
    for q in range(10):
        assert rank1[q] == q + 100000, (q, rank1.get(q))


def test_ambient_overlap_vs_brute(spark, emb, fitted):
    """On this isotropic random corpus (PQ's worst case: no low-dim
    structure to exploit, true-neighbour cosine ~0.3-0.5 vs ambient
    ~0.25) the quantization noise eats most of the margin; the check
    pins that the ADC ranking still beats chance by a wide factor.
    Deterministic quantizers make this a fixed number: top-5 overlap
    0.34 at ksub=64 vs ~0.01 for random guessing (5/450 candidates)."""
    coarse, cb = fitted
    queries = emb.filter(F.col("vec_id") < 10)
    got = pq.ivfpq_topk(emb, queries, k=5, centroids=coarse, codebook=cb).collect()
    exact = brute_force_topk(emb, queries, k=5).collect()
    got_sets, exact_sets = {}, {}
    for r in got:
        got_sets.setdefault(r["query_id"], set()).add(r["item_id"])
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["item_id"])
    overlap = sum(len(got_sets[q] & exact_sets[q]) for q in exact_sets) / (
        5 * len(exact_sets)
    )
    assert overlap >= 0.25, f"top5 overlap {overlap}"


def test_scoring_is_jvm_side(spark, emb, fitted):
    """After the two Arrow passes (encode, query LUTs) and the two
    coarse assignment kernels, the ADC scoring itself must be a JVM
    aggregate: the plan's Python stages are exactly the four kernels,
    and no cartesian product appears."""
    coarse, cb = fitted
    queries = emb.filter(F.col("vec_id") < 10)
    df = pq.ivfpq_topk(emb, queries, k=5, centroids=coarse, codebook=cb)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_python = plan.count("MapInPandas")
    assert n_python == 4, f"expected 4 Arrow kernels, saw {n_python}"
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
