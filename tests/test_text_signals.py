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


# ---------------------------------------------------------------- passages


def _passages_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_dedup_passages_cross_doc_removal(spark):
    from dea_coastlines_spark.operators.text import remove_duplicate_passages

    shared = "alpha beta gamma delta"
    # tokens adjacent to the shared passage differ between the docs, so
    # only the one fully-shared 4-gram window is duplicated
    texts = [
        f"start one {shared} endA one",
        f"start two {shared} endB two",
        "totally unrelated content here now",
    ]
    out = (
        remove_duplicate_passages(_passages_df(spark, texts), n=4, min_count=2)
        .orderBy("doc_id")
        .collect()
    )
    # the shared 4-gram appears twice -> its 4 tokens vanish from both
    assert out[0].text_clean == "start one endA one"
    assert out[1].text_clean == "start two endB two"
    assert out[0].n_removed == 4 and out[1].n_removed == 4
    assert out[2].text_clean == texts[2] and out[2].n_removed == 0


def test_dedup_passages_within_doc_repeat(spark):
    from dea_coastlines_spark.operators.text import remove_duplicate_passages

    # the same 3-gram twice INSIDE one doc counts toward min_count
    t = "x y z pad1 pad2 x y z"
    out = remove_duplicate_passages(
        _passages_df(spark, [t]), n=3, min_count=2
    ).collect()[0]
    assert out.text_clean == "pad1 pad2"
    assert out.n_removed == 6 and out.n_tokens == 8


def test_dedup_passages_overlapping_windows_merge(spark):
    from dea_coastlines_spark.operators.text import remove_duplicate_passages

    # a 5-token duplicated passage with n=4 -> two overlapping windows,
    # covered positions merge to exactly the 5 passage tokens
    p = "a1 a2 a3 a4 a5"
    texts = [f"{p} left", f"right {p}"]
    out = (
        remove_duplicate_passages(_passages_df(spark, texts), n=4, min_count=2)
        .orderBy("doc_id")
        .collect()
    )
    assert out[0].text_clean == "left" and out[0].n_removed == 5
    assert out[1].text_clean == "right" and out[1].n_removed == 5


def test_dedup_passages_short_docs_untouched(spark):
    from dea_coastlines_spark.operators.text import remove_duplicate_passages

    texts = ["tiny doc", "tiny doc", ""]  # identical but < n tokens
    out = (
        remove_duplicate_passages(_passages_df(spark, texts), n=8, min_count=2)
        .orderBy("doc_id")
        .collect()
    )
    for r, t in zip(out, texts):
        assert r.n_removed == 0
        assert r.text_clean == t  # whitespace-normal already


def test_dedup_passages_case_insensitive_match_original_case_output(spark):
    from dea_coastlines_spark.operators.text import remove_duplicate_passages

    texts = ["Foo Bar Baz Qux keepA", "foo bar baz qux keepB"]
    out = (
        remove_duplicate_passages(_passages_df(spark, texts), n=4, min_count=2)
        .orderBy("doc_id")
        .collect()
    )
    # windows match case-insensitively; surviving tokens keep case
    assert out[0].text_clean == "keepA"
    assert out[1].text_clean == "keepB"


def test_dedup_passages_no_python_stage(spark):
    from dea_coastlines_spark.operators.text import remove_duplicate_passages

    df = _passages_df(spark, ["a b c d e f g h", "a b c d e f x y"])
    plan = (
        remove_duplicate_passages(df, n=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan and "CartesianProduct" not in plan


def test_chunk_documents_edges_and_coverage(spark):
    """Chunk grid: full token coverage with exact overlap, short docs
    one chunk, empty docs none; map-only plan."""
    import pandas as pd

    from dea_coastlines_spark.operators.text import chunk_documents

    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                " ".join(f"t{i}" for i in range(10)),  # 10 toks
                "a b c",                                # shorter than window
                "",                                     # empty -> no chunks
                " ".join(f"u{i}" for i in range(12)),   # exact multiple
            ],
        }
    )
    out = (
        chunk_documents(spark.createDataFrame(docs), window=4, overlap=1)
        .toPandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    d0 = out[out.doc_id == 0]
    assert list(d0.chunk) == [
        "t0 t1 t2 t3", "t3 t4 t5 t6", "t6 t7 t8 t9"
    ]
    assert list(d0.n_chunk_tokens) == [4, 4, 4]
    d1 = out[out.doc_id == 1]
    assert list(d1.chunk) == ["a b c"] and list(d1.chunk_idx) == [0]
    assert len(out[out.doc_id == 2]) == 0
    d3 = out[out.doc_id == 3]
    # 12 toks, stride 3: starts 0,3,6,9 -> last chunk 3 tokens
    assert list(d3.n_chunk_tokens) == [4, 4, 4, 3]
    assert d3.chunk.iloc[-1] == "u9 u10 u11"

    plan = (
        chunk_documents(spark.createDataFrame(docs), window=4, overlap=1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Python" not in plan

    import pytest as _pt

    with _pt.raises(ValueError):
        chunk_documents(spark.createDataFrame(docs), window=4, overlap=4)


# ---- skip-gram co-occurrence + PMI ----------------------------------------


def test_pmi_closed_form(spark):
    """Two-token docs: pair counts and PMI from the closed form.
    Corpus: 3x "a b", 1x "a c" -> pairs: (a,b)x3, (a,c)x1; T=8 tokens,
    P=4 pairs; pmi(a,b) = ln((3/4) / ((4/8)*(3/8)))."""
    import math

    from dea_coastlines_spark.operators.text import cooccurrence_pmi

    docs = spark.createDataFrame(
        [("a b",), ("a b",), ("a b",), ("a c",)], "text string"
    )
    out = {(r["a"], r["b"]): r for r in cooccurrence_pmi(docs, k=10).collect()}
    assert out[("a", "b")]["pair_count"] == 3
    assert out[("a", "c")]["pair_count"] == 1
    assert out[("a", "b")]["pmi"] == round(math.log((3 / 4) / ((4 / 8) * (3 / 8))), 6)


def test_pmi_window_bounds(spark):
    """window=2: tokens 3 apart never pair; adjacent + skip-1 do."""
    from dea_coastlines_spark.operators.text import cooccurrence_pmi

    docs = spark.createDataFrame([("w x y z",)], "text string")
    pairs = {
        (r["a"], r["b"]) for r in cooccurrence_pmi(docs, window=2, k=10).collect()
    }
    assert ("w", "x") in pairs and ("w", "y") in pairs
    assert ("w", "z") not in pairs


def test_pmi_no_join_in_pair_generation(spark):
    """The pair fan-out must be row-local (Generate/explode, not a
    self-join) and zero-Python. The count tables localCheckpoint inside
    the operator, so the FINAL plan only shows the checkpoint reads —
    gate the fan-out on the un-checkpointed pair aggregation instead."""
    from pyspark.sql import functions as F

    from dea_coastlines_spark.operators.text import cooccurrence_pmi

    d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    final = cooccurrence_pmi(d)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in final
    assert "MapInPandas" not in final and "ArrowEvalPython" not in final
    # rebuild the pair-generation stage exactly as the operator does
    pairs = d.select(
        F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)").alias("toks")
    ).select(
        F.explode(
            F.expr(
                """flatten(transform(toks, (t, i) ->
                     transform(slice(toks, i + 2, 3), u ->
                       struct(least(t, u) AS a, greatest(t, u) AS b))))"""
            )
        ).alias("p")
    )
    stage = pairs._jdf.queryExecution().executedPlan().toString()
    assert stage.count("Generate") >= 1
    assert "Join" not in stage
