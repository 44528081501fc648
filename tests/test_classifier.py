"""Hashed linear quality classifier: scoring parity vs a scalar Python
replica, trained-weights path, and the map-only plan gate."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from dea_coastlines_spark.operators.classifier import (
    HASH_MOD,
    quality_classifier,
)


def _tok_hash(t: str) -> int:
    h = 0
    for ch in t:
        h = (h * 31 + ord(ch)) % HASH_MOD
    return h


def _round6(x: float) -> float:
    # Spark ROUND is HALF_UP; python round() is banker's — the scores
    # are exact dyadic rationals, so midpoints (e.g. 0.9453125) occur
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(x)).quantize(Decimal("0.000001"),
                                           ROUND_HALF_UP))


def _replica(text, dim=1024, scale=4.0, weights=None):
    import re

    toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
    if not toks:
        return len(toks), None
    if weights is None:
        ws = [
            ((_tok_hash(t) % dim) * 2654435761) % 4096 / 2048.0 - 1.0
            for t in toks
        ]
    else:
        ws = [weights[_tok_hash(t) % dim] for t in toks]
    z = scale * sum(ws) / len(toks)
    return len(toks), _round6(min(1.0, max(0.0, z * 0.25 + 0.5)))


@pytest.fixture()
def docs(spark):
    rng = np.random.default_rng(3)
    vocab = ["alpha", "beta", "gamma", "delta", "echo", "foxtrot", "42",
             "the", "of", "and", "zebra", "Quick", "BROWN"]
    texts = [
        " ".join(rng.choice(vocab, rng.integers(1, 30)).tolist())
        for _ in range(60)
    ] + ["", "!!!", "éàü 漢字", "MiXeD CaSe 123abc"]
    pdf = pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype="int64"), "text": texts}
    )
    return spark.createDataFrame(pdf), pdf


def test_scores_match_python_replica(spark, docs):
    df, pdf = docs
    got = (
        quality_classifier(df)
        .select("doc_id", "n_feats", "score", "keep")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for _, row in got.iterrows():
        n, s = _replica(pdf["text"].iloc[int(row["doc_id"])])
        assert row["n_feats"] == n
        if s is None:
            assert pd.isna(row["score"]) and not row["keep"]
        else:
            assert row["score"] == pytest.approx(s, abs=0)
            assert bool(row["keep"]) == (s >= 0.5)


def test_trained_weights_path(spark, docs):
    df, pdf = docs
    rng = np.random.default_rng(9)
    w = np.round(rng.uniform(-1, 1, 64), 4).tolist()
    got = (
        quality_classifier(df, dim=64, weights=w, threshold=0.6)
        .select("doc_id", "score", "keep")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for _, row in got.iterrows():
        n, s = _replica(pdf["text"].iloc[int(row["doc_id"])], dim=64,
                        weights=w)
        if s is None:
            assert pd.isna(row["score"])
        else:
            assert row["score"] == pytest.approx(s, abs=1e-6)
            assert bool(row["keep"]) == (row["score"] >= 0.6)


def test_weights_length_validated(spark, docs):
    df, _ = docs
    with pytest.raises(ValueError):
        quality_classifier(df, dim=64, weights=[0.0] * 10)


def test_plan_is_map_only_jvm(spark, docs):
    df, _ = docs
    plan = (
        quality_classifier(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    for marker in ("ArrowEvalPython", "BatchEvalPython", "FlatMapsInPandas",
                   "MapInPandas"):
        assert marker not in plan
