"""N-gram language-model perplexity scoring — the CCNet-style quality
filter (Wenzek et al. 2020; used in LLaMA/RedPajama data pipelines):
train a word n-gram LM with Laplace smoothing on a high-quality
reference slice, score every corpus document by its per-token
log-perplexity, keep the low-perplexity tail.

Scale shape (100 TB corpus, reference slice anywhere from MB to TB):

- LM training is ONE map-side-combinable groupBy (n-gram counts);
  context counts are DERIVED from the gram counts (sum over grams
  sharing the (n-1)-token prefix — exact, because a context occurrence
  is by definition an n-gram occurrence), so the reference slice is
  tokenized once, not twice. Distinct-n-gram cardinality is sublinear
  in corpus bytes (Heaps' law), so the LM table is far smaller than
  the corpus.
- Scoring is a single corpus scan: explode per-position n-grams, join
  the LM counts on the gram key (shuffled hash join; broadcast when
  the LM fits — resolved by Spark's own size estimate), then ONE
  groupBy(doc_id) to fold per-gram terms back to a score.
- The gram's context is recovered from the gram STRING
  (substring_index on the first n-1 space-joined fields — tokens are
  whitespace-split so they cannot contain spaces). Carrying a per-doc
  context ARRAY through the explode instead would make Generate copy
  an O(L) array into each of its L output rows — O(L^2) bytes per
  document, measured 4x slower at sf0.1.
- Per-gram log terms are scaled to INTEGER micro-bits before the fold,
  so the per-doc aggregation is exact int64 arithmetic — commutative,
  order-independent, and bit-identical to the DuckDB oracle regardless
  of partitioning or AQE decisions. (A float sum's value would depend
  on partition-merge order; rounding after the fact cannot fully mask
  that at hash-compare precision.) It also means gram ORDER is
  irrelevant, so no position column rides the explode.

No counterpart in the reference repo (it has no text stack); the
published filter is the spec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import lower_tokens, word_ngrams_from_tokens

# one micro-bit = 1e-9 bits; per-gram terms are ~|log2 p| <= ~40 bits,
# so int64 holds ~2e8 grams per document before overflow — far beyond
# any real document.
MICRO = 1_000_000_000


def _doc_grams(df: DataFrame, text_col: str, n: int, *keep: str):
    """(keep..., gram) — one row per n-gram occurrence (multiplicity
    kept: an LM counts occurrences, not types). Docs with fewer than n
    tokens produce no rows.

    explode_OUTER + isNotNull, not explode: a plain Generate makes
    Catalyst infer `size(arr) > 0 AND isnotnull(arr)`, and predicate
    pushdown substitutes the FULL tokenize+n-gram HOF expression into
    that filter (twice) and pushes it below any exchange — measured 8.5
    s single-task vs 0.5 s at-width on sf0.1. Outer generate infers no
    filter; gram elements are concat_ws results, never NULL, so the
    post-explode null filter drops exactly the empty/NULL-array rows a
    plain explode would."""
    toks = lower_tokens(F.col(text_col))
    return (
        df.withColumn("_lm_toks", toks)
        .withColumn("_lm_grams", word_ngrams_from_tokens(F.col("_lm_toks"), n))
        .select(*keep, F.explode_outer("_lm_grams").alias("gram"))
        .filter(F.col("gram").isNotNull())
    )


def _ctx_of_gram(n: int) -> F.Column:
    """(n-1)-token prefix of a gram string; '' for unigram models
    (substring_index with count 0 returns '')."""
    return F.substring_index(F.col("gram"), " ", n - 1)


def train_ngram_lm(
    lm_df: DataFrame, text_col: str = "text", n: int = 2
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Laplace n-gram LM statistics from a reference corpus:
    (gram_counts[gram, c_gram], ctx_counts[ctx, c_ctx], vocab[v]) —
    all lazy plans (vocab is a 1-row aggregate, cross-joined broadcast
    by the scorer, never collected on the driver).

    c_ctx is the count of n-grams sharing the context (for n=2: how
    often the first word opens a bigram), so p(w_n | ctx) =
    (c_gram + 1) / (c_ctx + V) sums to 1 over the vocabulary. It is
    aggregated FROM the gram counts — distinct grams, not corpus
    occurrences — so the reference slice is scanned once for counts."""
    if n < 1:
        raise ValueError("n must be >= 1")
    # lazy localCheckpoint: gram_counts feeds both the scoring join and
    # the derived ctx aggregate — without the barrier the reference-
    # slice tokenize+explode+count subtree executes once per consumer
    gram_counts = (
        _doc_grams(lm_df, text_col, n)
        .groupBy("gram")
        .agg(F.count("*").alias("c_gram"))
        .localCheckpoint(eager=False)
    )
    ctx_counts = (
        gram_counts.groupBy(_ctx_of_gram(n).alias("ctx"))
        .agg(F.sum("c_gram").alias("c_ctx"))
    )
    vocab = (
        lm_df.withColumn("_lm_toks", lower_tokens(F.col(text_col)))
        .select(F.explode_outer("_lm_toks").alias("t"))
        .filter(F.col("t").isNotNull())
        .agg(F.countDistinct("t").alias("v"))
    )
    return gram_counts, ctx_counts, vocab


def ngram_lm_logppl(
    corpus: DataFrame,
    lm_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
) -> DataFrame:
    """Per-document log2-perplexity under a Laplace n-gram LM trained
    on `lm_df`: logppl = -(1/N) * sum_i log2 p(gram_i), N = number of
    n-gram positions. Lower = more like the reference corpus.

    Unseen grams/contexts get c = 0 (Laplace floor p = 1/(c_ctx+V) or
    1/V). Documents with fewer than n tokens have no n-grams: n_grams
    = 0, logppl NULL (published filters skip them; a NULL survives the
    usual `logppl < cutoff` keep-filter as a drop).

    Returns (id_col, n_grams, logppl) with logppl in bits/gram rounded
    to 6 dp. The per-doc sum is exact int64 micro-bit arithmetic — see
    module docstring for why that makes the value partition-invariant.
    """
    gram_counts, ctx_counts, vocab = train_ngram_lm(lm_df, text_col, n)
    doc_grams = _doc_grams(corpus, text_col, n, id_col).withColumn(
        "ctx", _ctx_of_gram(n)
    )
    scored = (
        doc_grams.join(gram_counts, "gram", "left")
        .join(ctx_counts, "ctx", "left")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "term_micro",
            F.round(
                (
                    F.log2(F.coalesce(F.col("c_gram"), F.lit(0)) + 1)
                    - F.log2(F.coalesce(F.col("c_ctx"), F.lit(0)) + F.col("v"))
                )
                * MICRO
            ).cast("long"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count("*").alias("n_grams"),
        F.sum("term_micro").alias("_sum_micro"),
    )
    return (
        corpus.select(id_col)
        .join(per_doc, id_col, "left")
        .withColumn("n_grams", F.coalesce(F.col("n_grams"), F.lit(0).cast("long")))
        .withColumn(
            "logppl",
            F.when(
                F.col("n_grams") > 0,
                F.round(
                    -F.col("_sum_micro") / MICRO / F.col("n_grams"), 6
                ),
            ),
        )
        .drop("_sum_micro")
    )
