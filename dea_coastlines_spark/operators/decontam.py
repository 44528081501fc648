"""Test-set decontamination: flag (or drop) training documents that
share word n-grams with an evaluation/benchmark set.

The standard pre-training hygiene step (GPT-3 appendix C, PaLM §7,
Gopher §A1.2 all describe n-gram–overlap decontamination): any training
document containing an n-gram that also appears in a held-out eval set
is contaminated and must be excluded before training.

Scale shape: the eval side is ALWAYS tiny relative to the corpus
(benchmarks are megabytes; the corpus is 100 TB), so its distinct
n-gram vocabulary is broadcast and the training side is scanned exactly
once. The only shuffle is the per-document hit count (groupBy doc_id),
whose input is already pruned to matching grams by the broadcast join —
at web scale that shuffle carries only the contaminated sliver, not the
corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import lower_tokens, word_ngrams_from_tokens


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_hits: int = 1,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Annotate `train` with `hits` (count of DISTINCT eval n-grams the
    document contains) and `contaminated` (hits >= min_hits).

    Documents shorter than n tokens produce no n-grams and are never
    contaminated (hits = 0) — matching the published filters, which
    skip sub-n documents. Use `.filter(~F.col("contaminated"))` to
    drop; the flag form keeps the operator composable (audit tables
    report contamination by source before dropping).

    broadcast_eval=True (default) is the web-scale plan: eval grams are
    a broadcast hash side built once per task. Set False only when the
    eval set is itself huge (cross-corpus decontamination), where a
    shuffled hash join on the gram key is correct and AQE handles skew.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    if min_hits < 1:
        raise ValueError("min_hits must be >= 1")
    # tokens materialize as a column before the n-gram lambda touches
    # them — interpreted HOFs re-derive inline subexpressions per
    # element (see text.lower_tokens)
    # explode_outer + isNotNull: a plain explode's inferred
    # size>0/isnotnull filter inlines the whole tokenize+n-gram HOF
    # twice and sinks below the exchange (see operators/lm._doc_grams);
    # gram elements are concat_ws results, never NULL
    def grams_of(df_in, *keep):
        return (
            df_in.withColumn("_dc_toks", lower_tokens(F.col(text_col)))
            .select(
                *keep,
                F.explode_outer(
                    F.array_distinct(
                        word_ngrams_from_tokens(F.col("_dc_toks"), n)
                    )
                ).alias("_g"),
            )
            .filter(F.col("_g").isNotNull())
        )

    eval_grams = grams_of(eval_df).distinct()
    if broadcast_eval:
        eval_grams = F.broadcast(eval_grams)
    train_grams = grams_of(train, id_col)
    hits = (
        train_grams.join(eval_grams, "_g")
        .groupBy(id_col)
        .agg(F.count("*").alias("hits"))
    )
    return (
        train.join(hits, id_col, "left")
        .withColumn("hits", F.coalesce(F.col("hits"), F.lit(0).cast("long")))
        .withColumn("contaminated", F.col("hits") >= min_hits)
    )
