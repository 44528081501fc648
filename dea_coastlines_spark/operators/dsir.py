"""DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
NeurIPS): score every raw-corpus document by how target-like its hashed
n-gram feature distribution is, then keep the highest-weight slice.
The standard pretraining-data targeting step (e.g. "select web pages
that look like Wikipedia + books").

Mechanics: word unigrams+bigrams are hashed into B buckets; bag-of-
bucket unigram distributions are estimated (Laplace-smoothed) for the
TARGET slice (p) and the RAW corpus (q); a document's importance
weight is sum over its features of log2(p[b]/q[b]).

Scale shape at 100 TB:
- Both distributions are ONE map-side-combinable groupBy each, output
  at most B rows (B = 4096 here) — tiny, so the per-bucket log-ratio
  table is a broadcast join against the exploded corpus features.
- Scoring is a single corpus scan + ONE groupBy(doc_id). Per-feature
  log-ratios are scaled to exact int64 micro-bits before the fold, so
  the per-doc sum is order-independent and bit-identical to the DuckDB
  oracle under any partitioning (see operators/lm.py).
- Bucket key = first `hex_chars` of md5(gram): identical bytes-in,
  hex-out on every engine (Spark, DuckDB, Python hashlib), so oracles
  replicate the bucketing exactly without a custom portable hash.
- select_target_like's exact global rank is a deliberate small-output
  convenience (selection flags, not data, cross the sort); at 100 TB
  you'd take the weight THRESHOLD from approx_percentile and filter —
  both paths are provided, `exact_rank=False` for the threshold one.

No counterpart in the reference repo (no text stack); the paper is the
spec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .lm import MICRO
from .text import lower_tokens, word_ngrams_from_tokens


def _hashed_features(
    df: DataFrame, text_col: str, hex_chars: int, *keep: str
):
    """One row per unigram+bigram occurrence (multiplicity kept — DSIR
    counts features), bucketed by an md5-prefix key."""
    toks = lower_tokens(F.col(text_col))
    out = df.withColumn("_ds_toks", toks).withColumn(
        "_ds_feats",
        F.concat(
            F.col("_ds_toks"),
            word_ngrams_from_tokens(F.col("_ds_toks"), 2),
        ),
    )
    # explode_outer + isNotNull: a plain explode's inferred
    # size>0/isnotnull filter inlines the whole tokenize+bigram HOF
    # twice and sinks below the exchange (see operators/lm._doc_grams);
    # feature elements are split/concat_ws results, never NULL
    return (
        out.select(*keep, F.explode_outer("_ds_feats").alias("feat"))
        .filter(F.col("feat").isNotNull())
        .withColumn("bucket", F.substring(F.md5(F.col("feat")), 1, hex_chars))
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    hex_chars: int = 3,
) -> DataFrame:
    """Per-document DSIR importance weight over `raw`, with `target`
    as the distribution to move toward. B = 16**hex_chars buckets.

    logw = sum_feats log2(p[b]/q[b]) with Laplace smoothing
    p[b] = (ct[b]+1)/(Nt+B), q[b] = (cr[b]+1)/(Nr+B). Positive logw =
    more target-like than the raw average. Documents with no tokens
    get n_feats = 0, logw NULL.

    Returns (id_col, n_feats, logw) with logw in bits rounded to 6 dp,
    computed via exact int64 micro-bit sums (partition-invariant)."""
    if hex_chars < 1 or hex_chars > 8:
        raise ValueError("hex_chars must be in 1..8")
    n_buckets = 16 ** hex_chars
    # lazy localCheckpoint: the tokenize+md5 feature explode feeds the
    # bucket counts, the totals AND the scoring join — without
    # truncation Catalyst re-executes it once per consumer (3x for the
    # raw side), and ReuseExchange can't help because the consumers
    # aggregate on different keys.
    # project the feature STRING away before the barrier (guide §2.3):
    # every consumer below keys on `bucket` (+ id) only, so the cached
    # rows carry 3-4 hex chars instead of the ~20-byte gram text
    tgt = (
        _hashed_features(target, text_col, hex_chars)
        .select("bucket")
        .localCheckpoint(eager=False)
    )
    rawf = (
        _hashed_features(raw, text_col, hex_chars, id_col)
        .select(id_col, "bucket")
        .localCheckpoint(eager=False)
    )
    ct = tgt.groupBy("bucket").agg(F.count("*").alias("ct"))
    cr = rawf.groupBy("bucket").agg(F.count("*").alias("cr"))
    nt = tgt.agg(F.count("*").alias("nt"))
    nr = rawf.agg(F.count("*").alias("nr"))
    # <= B rows after the outer join; totals are 1-row cross joins —
    # the whole ratio table broadcasts.
    ratios = (
        ct.join(cr, "bucket", "full")
        .crossJoin(F.broadcast(nt))
        .crossJoin(F.broadcast(nr))
        .withColumn(
            "lr_micro",
            F.round(
                (
                    F.log2(F.coalesce(F.col("ct"), F.lit(0)) + 1)
                    - F.log2(F.col("nt") + F.lit(n_buckets))
                    - F.log2(F.coalesce(F.col("cr"), F.lit(0)) + 1)
                    + F.log2(F.col("nr") + F.lit(n_buckets))
                )
                * MICRO
            ).cast("long"),
        )
        .select("bucket", "lr_micro")
    )
    per_doc = (
        rawf.join(F.broadcast(ratios), "bucket")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_feats"),
            F.sum("lr_micro").alias("_sum_micro"),
        )
    )
    return (
        raw.select(id_col)
        .join(per_doc, id_col, "left")
        .withColumn("n_feats", F.coalesce(F.col("n_feats"), F.lit(0).cast("long")))
        .withColumn(
            "logw",
            F.when(
                F.col("n_feats") > 0,
                F.round(F.col("_sum_micro") / MICRO, 6),
            ),
        )
        .drop("_sum_micro")
    )


def select_target_like(
    weights: DataFrame,
    keep_frac: float,
    id_col: str = "doc_id",
    exact_rank: bool = True,
) -> DataFrame:
    """Mark the top keep_frac of documents by DSIR weight.

    exact_rank=True ranks globally (deterministic tie-break on id) —
    correct and cheap when only flags flow through the sort, which is
    the driver-query case. exact_rank=False is the 100 TB path: cutoff
    = exact keep-count via an aggregate-free quantile over the weight
    column is NOT deterministic across engines, so it derives the
    threshold from a global sort of the (weight, id) PAIRS ONLY —
    still only 16 bytes/doc through the shuffle — then broadcasts the
    cutoff pair back. Both paths select the identical set."""
    if not 0 < keep_frac <= 1:
        raise ValueError("keep_frac must be in (0, 1]")
    n_docs = F.count("*").over(Window.partitionBy())
    order = [F.col("logw").desc_nulls_last(), F.col(id_col).asc()]
    if exact_rank:
        ranked = weights.withColumn(
            "_rk", F.row_number().over(Window.orderBy(*order))
        ).withColumn("_n", n_docs)
        return ranked.withColumn(
            "selected",
            (F.col("_rk") <= F.ceil(F.col("_n") * keep_frac))
            & F.col("logw").isNotNull(),
        ).drop("_rk", "_n")
    # threshold path: global sort over (logw, id) pairs only, take the
    # boundary pair, broadcast it back as a cutoff comparison.
    pairs = weights.select("logw", F.col(id_col).alias("_tid"))
    ranked = pairs.withColumn(
        "_rk",
        F.row_number().over(
            Window.orderBy(
                F.col("logw").desc_nulls_last(), F.col("_tid").asc()
            )
        ),
    ).withColumn("_n", F.count("*").over(Window.partitionBy()))
    cutoff = ranked.filter(
        F.col("_rk") == F.ceil(F.col("_n") * keep_frac)
    ).select(
        F.col("logw").alias("_cut_w"), F.col("_tid").alias("_cut_id")
    )
    # a NULL cutoff weight means the keep-rank reaches into the
    # NULL-weight tail: every weighted doc is selected (NULL-weight
    # docs never are, matching the exact path).
    return weights.crossJoin(F.broadcast(cutoff)).withColumn(
        "selected",
        F.col("logw").isNotNull()
        & (
            F.col("_cut_w").isNull()
            | (F.col("logw") > F.col("_cut_w"))
            | (
                (F.col("logw") == F.col("_cut_w"))
                & (F.col(id_col) <= F.col("_cut_id"))
            )
        ),
    ).drop("_cut_w", "_cut_id")
