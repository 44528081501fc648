"""Gopher-style repetition signals + test-set decontamination.

Python-reference parity on crafted documents that exercise the paths
the synthetic sf corpora cannot (multi-line texts with duplicate lines;
documents shorter than n tokens; empty text), plus plan-shape gates:
both operators must stay broadcast/HOF-shaped — no nested-loop join,
no Python stage.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dea_coastlines_spark.operators.decontam import decontaminate
from dea_coastlines_spark.operators.text import with_repetition_signals


def _ref_signals(text: str):
    """Plain-Python mirror of with_repetition_signals."""
    lines = [l.strip() for l in text.split("\n") if l.strip() != ""]
    n_lines = len(lines)
    dlf = 0.0 if n_lines == 0 else (n_lines - len(set(lines))) / n_lines
    line_chars = sum(len(l) for l in lines)
    dup_chars = sum((lines.count(d) - 1) * len(d) for d in set(lines))
    dlcf = 0.0 if line_chars == 0 else dup_chars / line_chars
    toks = [t for t in text.lower().split() if t]
    denom = max(len(text), 1)

    def grams(n):
        if len(toks) < n:
            return []
        return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]

    g2 = grams(2)
    if not g2:
        t2f = 0.0
    else:
        best = sorted((-g2.count(d), d) for d in set(g2))[0]
        t2f = (-best[0]) * len(best[1]) / denom
    g5 = grams(5)
    d5f = sum(g5.count(d) * len(d) for d in set(g5) if g5.count(d) > 1) / denom
    rep = dlf > 0.30 or dlcf > 0.20 or t2f > 0.20 or d5f > 0.15
    return (
        round(dlf, 6),
        round(dlcf, 6),
        round(t2f, 6),
        round(d5f, 6),
        rep,
    )


TEXTS = [
    # duplicate lines dominate
    "spam line\nspam line\nspam line\nunique tail",
    # no duplication at all
    "alpha beta gamma delta epsilon zeta eta theta",
    # heavy 2-gram repetition, single line
    "buy now buy now buy now buy now buy now",
    # duplicate 5-gram (two occurrences of a 5-token window)
    "a b c d e x a b c d e y z w v u t s",
    # shorter than 5 tokens (no 5-grams), shorter than 2 lines
    "tiny doc",
    # one token, no 2-grams
    "solo",
    # empty and whitespace-only
    "",
    "   \n  \n ",
    # mixed-case + tabs (lowercasing, WS_CLASS tokenization)
    "The THE the\tThe the",
]


def test_repetition_signals_match_python_reference(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    rows = (
        with_repetition_signals(df)
        .select(
            "doc_id",
            "dup_line_frac",
            "dup_line_char_frac",
            "top2gram_char_frac",
            "dup5gram_char_frac",
            "repetitive",
        )
        .orderBy("doc_id")
        .collect()
    )
    assert len(rows) == len(TEXTS)
    for r in rows:
        exp = _ref_signals(TEXTS[r.doc_id])
        got = (
            r.dup_line_frac,
            r.dup_line_char_frac,
            r.top2gram_char_frac,
            r.dup5gram_char_frac,
            r.repetitive,
        )
        assert got[:4] == pytest.approx(exp[:4], abs=1e-9), (r.doc_id, got, exp)
        assert got[4] == exp[4], (r.doc_id, got, exp)


def test_repetition_flags_obvious_spam(spark):
    df = spark.createDataFrame(
        [(0, "click here click here click here click here"),
         (1, "a perfectly ordinary sentence with varied words throughout")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.repetitive
        for r in with_repetition_signals(df).select("doc_id", "repetitive").collect()
    }
    assert got == {0: True, 1: False}


def test_repetition_plan_is_jvm_only(spark):
    df = spark.createDataFrame([(0, "x y x y")], "doc_id long, text string")
    plan = (
        with_repetition_signals(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for bad in ("BatchEvalPython", "ArrowEvalPython", "FlatMapsInPandas"):
        assert bad not in plan


def _decontam_frames(spark):
    train = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "completely unrelated training text about spark shuffles"),
            (2, "prefix words then the quick brown fox appears here"),
            (3, "quick brown fox jumps"),  # exactly one shared 4-gram
            (4, "too short"),  # < n tokens: never contaminated
        ],
        "doc_id long, text string",
    )
    eval_df = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id long, text string"
    )
    return train, eval_df


def test_decontaminate_flags_ngram_overlap(spark):
    train, eval_df = _decontam_frames(spark)
    out = decontaminate(train, eval_df, n=4, min_hits=1)
    got = {r.doc_id: (r.hits, r.contaminated) for r in out.collect()}
    # eval 4-grams: "the quick brown fox", "quick brown fox jumps"
    assert got[0] == (2, True)
    assert got[1] == (0, False)
    assert got[2] == (1, True)
    assert got[3] == (1, True)
    assert got[4] == (0, False)


def test_decontaminate_min_hits_threshold(spark):
    train, eval_df = _decontam_frames(spark)
    out = decontaminate(train, eval_df, n=4, min_hits=2)
    got = {r.doc_id: r.contaminated for r in out.collect()}
    assert got == {0: True, 1: False, 2: False, 3: False, 4: False}


def test_decontaminate_counts_distinct_grams_once(spark):
    # the shared 4-gram occurs twice in the train doc but is ONE
    # distinct gram -> hits == 1
    train = spark.createDataFrame(
        [(0, "a b c d zz a b c d")], "doc_id long, text string"
    )
    eval_df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    row = decontaminate(train, eval_df, n=4).collect()[0]
    assert (row.hits, row.contaminated) == (1, True)


def test_decontaminate_broadcasts_eval_side(spark):
    train, eval_df = _decontam_frames(spark)
    plan = (
        decontaminate(train, eval_df, n=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_decontaminate_validates_params(spark):
    train, eval_df = _decontam_frames(spark)
    with pytest.raises(ValueError):
        decontaminate(train, eval_df, n=0)
    with pytest.raises(ValueError):
        decontaminate(train, eval_df, min_hits=0)
