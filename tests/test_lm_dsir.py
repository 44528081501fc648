"""N-gram LM perplexity (operators/lm.py) and DSIR importance
resampling (operators/dsir.py).

Python-reference parity on crafted corpora that exercise what the sf
tables cannot (unseen grams/contexts, sub-n documents, empty text),
semantic direction checks (target-like documents score better), exact
vs threshold selection parity, and plan gates: both operators are pure
JVM expression pipelines — no Python stage, no nested-loop join.
"""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from dea_coastlines_spark.operators.dsir import (
    dsir_weights,
    select_target_like,
)
from dea_coastlines_spark.operators.lm import MICRO, ngram_lm_logppl

LM_DOCS = [
    "the cat sat on the mat",
    "the dog sat on the rug",
    "a cat and a dog",
]
SCORE_DOCS = [
    (0, "the cat sat on the mat"),          # in-distribution
    (1, "quantum flux capacitor overload"),  # all-unseen
    (2, "the cat"),                          # one seen bigram
    (3, "word"),                             # sub-n: no bigrams
    (4, ""),                                 # empty text
]


def _toks(s):
    return [t for t in s.lower().split() if t]


def _ref_bigram_logppl(lm_texts, text):
    grams, ctxs = {}, {}
    vocab = set()
    for t in lm_texts:
        tk = _toks(t)
        vocab.update(tk)
        for i in range(len(tk) - 1):
            g = tk[i] + " " + tk[i + 1]
            grams[g] = grams.get(g, 0) + 1
            ctxs[tk[i]] = ctxs.get(tk[i], 0) + 1
    v = len(vocab)
    tk = _toks(text)
    if len(tk) < 2:
        return 0, None
    s = 0
    for i in range(len(tk) - 1):
        g = tk[i] + " " + tk[i + 1]
        term = math.log2(grams.get(g, 0) + 1) - math.log2(
            ctxs.get(tk[i], 0) + v
        )
        s += int(round(term * MICRO))
    n = len(tk) - 1
    return n, round(-(s / MICRO) / n, 6)


def test_lm_logppl_matches_python_reference(spark):
    lm = spark.createDataFrame([(t,) for t in LM_DOCS], "text string")
    corpus = spark.createDataFrame(SCORE_DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_grams"], r["logppl"])
        for r in ngram_lm_logppl(corpus, lm).collect()
    }
    for doc_id, text in SCORE_DOCS:
        n, ppl = _ref_bigram_logppl(LM_DOCS, text)
        assert got[doc_id][0] == n, (doc_id, got[doc_id], n)
        if ppl is None:
            assert got[doc_id][1] is None
        else:
            assert got[doc_id][1] == pytest.approx(ppl, abs=2e-6)


def test_lm_in_distribution_beats_unseen(spark):
    lm = spark.createDataFrame([(t,) for t in LM_DOCS], "text string")
    corpus = spark.createDataFrame(SCORE_DOCS, "doc_id long, text string")
    got = {r["doc_id"]: r["logppl"] for r in ngram_lm_logppl(corpus, lm).collect()}
    # the memorized sentence must be far more probable than the
    # all-unseen one (every unseen bigram costs the log2(V)-ish floor)
    assert got[0] < got[1]


def test_lm_unigram_model(spark):
    # n=1: context is the empty string; p(w) = (c(w)+1)/(N+V)
    lm = spark.createDataFrame([("a a b",)], "text string")
    corpus = spark.createDataFrame([(0, "a c")], "doc_id long, text string")
    row = ngram_lm_logppl(corpus, lm, n=1).collect()[0]
    # N=3 tokens, V=2; p(a)=(2+1)/(3+2), p(c)=(0+1)/(3+2)
    want = -(
        int(round(math.log2(3 / 5) * MICRO))
        + int(round(math.log2(1 / 5) * MICRO))
    ) / MICRO / 2
    assert row["n_grams"] == 2
    assert row["logppl"] == pytest.approx(round(want, 6), abs=2e-6)


RAW_DOCS = [
    (0, "stock market prices fell sharply today amid trading"),
    (1, "the recipe needs flour butter sugar and eggs"),
    (2, "encyclopedia article about the history of mathematics"),
    (3, "encyclopedia entry on the history of astronomy"),
    (4, ""),
]
TARGET_DOCS = [
    "encyclopedia article about the history of science",
    "encyclopedia entry covering the history of physics",
]


def _ref_dsir(raw_docs, target_texts, hex_chars=3):
    B = 16 ** hex_chars

    def feats(text):
        tk = _toks(text)
        return tk + [tk[i] + " " + tk[i + 1] for i in range(len(tk) - 1)]

    def bucket(f):
        return hashlib.md5(f.encode("utf-8")).hexdigest()[:hex_chars]

    ct, cr = {}, {}
    for t in target_texts:
        for f in feats(t):
            ct[bucket(f)] = ct.get(bucket(f), 0) + 1
    for _, t in raw_docs:
        for f in feats(t):
            cr[bucket(f)] = cr.get(bucket(f), 0) + 1
    nt, nr = sum(ct.values()), sum(cr.values())
    out = {}
    for doc_id, t in raw_docs:
        fs = feats(t)
        if not fs:
            out[doc_id] = (0, None)
            continue
        s = 0
        for f in fs:
            b = bucket(f)
            lr = (
                math.log2(ct.get(b, 0) + 1)
                - math.log2(nt + B)
                - math.log2(cr.get(b, 0) + 1)
                + math.log2(nr + B)
            )
            s += int(round(lr * MICRO))
        out[doc_id] = (len(fs), round(s / MICRO, 6))
    return out


def test_dsir_matches_python_reference(spark):
    raw = spark.createDataFrame(RAW_DOCS, "doc_id long, text string")
    target = spark.createDataFrame([(t,) for t in TARGET_DOCS], "text string")
    got = {
        r["doc_id"]: (r["n_feats"], r["logw"])
        for r in dsir_weights(raw, target).collect()
    }
    want = _ref_dsir(RAW_DOCS, TARGET_DOCS)
    for doc_id, (n, w) in want.items():
        assert got[doc_id][0] == n
        if w is None:
            assert got[doc_id][1] is None
        else:
            assert got[doc_id][1] == pytest.approx(w, abs=2e-6)


def test_dsir_target_like_docs_rank_higher(spark):
    raw = spark.createDataFrame(RAW_DOCS, "doc_id long, text string")
    target = spark.createDataFrame([(t,) for t in TARGET_DOCS], "text string")
    got = {r["doc_id"]: r["logw"] for r in dsir_weights(raw, target).collect()}
    # the two encyclopedia/history docs must outscore stock-market and
    # recipe docs
    assert min(got[2], got[3]) > max(got[0], got[1])


def test_select_exact_and_threshold_paths_agree(spark):
    raw = spark.createDataFrame(RAW_DOCS, "doc_id long, text string")
    target = spark.createDataFrame([(t,) for t in TARGET_DOCS], "text string")
    w = dsir_weights(raw, target)
    for frac in (0.2, 0.5, 1.0):
        a = {
            r["doc_id"]: r["selected"]
            for r in select_target_like(w, frac).collect()
        }
        b = {
            r["doc_id"]: r["selected"]
            for r in select_target_like(w, frac, exact_rank=False).collect()
        }
        assert a == b, (frac, a, b)
        # ceil(5 * frac) ranks, capped by the 4 docs with weights
        # (the empty-text doc has NULL weight and is never selected)
        assert sum(a.values()) == min(math.ceil(len(RAW_DOCS) * frac), 4)
    # empty-text doc is never selected
    full = {
        r["doc_id"]: r["selected"]
        for r in select_target_like(w, 1.0).collect()
    }
    assert full[4] is False and sum(full.values()) == 4


def test_plans_are_jvm_only(spark):
    raw = spark.createDataFrame(RAW_DOCS, "doc_id long, text string")
    target = spark.createDataFrame([(t,) for t in TARGET_DOCS], "text string")
    lm_plan = (
        ngram_lm_logppl(raw, target)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    dsir_plan = (
        dsir_weights(raw, target)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for plan in (lm_plan, dsir_plan):
        for bad in ("BatchEvalPython", "ArrowEvalPython", "InPandas",
                    "CartesianProduct"):
            assert bad not in plan
