"""Text analysis operators: language ID, quality scoring, token
counting, document fingerprinting — all JVM-side expressions except the
fingerprint (Arrow kernel), so the hot path stays in whole-stage codegen.

Every scoring formula is deliberately expressible in ANSI SQL so the
DuckDB oracle can replicate it exactly (driver correctness gate)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# small deterministic stopword sets per language (padded-contains hits)
STOPWORDS = {
    "en": ["the", "and", "of", "to", "is", "in"],
    "de": ["der", "und", "die", "ist", "nicht", "das"],
    "fr": ["le", "la", "et", "les", "est", "dans"],
    "es": ["el", "la", "los", "es", "una", "que"],
}
PUNCT = [".", ",", "!", "?", ";", ":"]

# Explicit whitespace class used EVERYWHERE we tokenize: Java \s and
# RE2 \s disagree on \x0B (Java matches it, RE2 does not), so a bare
# \s+ silently diverges from the DuckDB oracle on documents containing
# vertical tabs. Same fix as dedup.word_ngram_jaccard_pairs.
WS_CLASS = "[ \\t\\n\\r\\f\\x0B]+"


def _hits(text_col, words) -> F.Column:
    """Count of stopwords present (padded whole-word contains)."""
    padded = F.concat(F.lit(" "), F.lower(text_col), F.lit(" "))
    c = F.lit(0)
    for w in words:
        c = c + F.when(padded.contains(f" {w} "), 1).otherwise(0)
    return c


def with_language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Argmax stopword-hit language with deterministic tie-break
    (alphabetical on lang code; 'und' = undetermined when no hits)."""
    t = F.col(text_col)
    cols = {lang: _hits(t, ws) for lang, ws in STOPWORDS.items()}
    best = F.greatest(*cols.values())
    pred = F.when(best == 0, "und")
    for lang in sorted(STOPWORDS):  # alphabetical priority on ties
        pred = pred.when(cols[lang] == best, lang)
    return df.withColumn("pred_lang", pred)


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality features + label: token count, mean token length,
    punctuation ratio, stopword ratio (web-pipeline heuristics in the
    C4/Gopher style, formulated SQL-identically)."""
    t = F.col(text_col)
    trimmed = F.trim(t)
    n_tokens = F.when(F.length(trimmed) == 0, 0).otherwise(
        F.size(F.split(trimmed, WS_CLASS))
    )
    punct_list = "".join(PUNCT)
    n_punct = F.length(t) - F.length(F.translate(t, punct_list, ""))
    n_stop = _hits(t, STOPWORDS["en"])
    df = (
        df.withColumn("n_tokens", n_tokens)
        .withColumn("punct_ratio", F.round(n_punct / F.greatest(F.length(t), F.lit(1)), 6))
        .withColumn("stop_hits", n_stop)
        .withColumn(
            "mean_tok_len",
            F.round(F.length(F.regexp_replace(trimmed, WS_CLASS, "")) / F.greatest(n_tokens, F.lit(1)), 6),
        )
    )
    return df.withColumn(
        "quality",
        F.when(F.col("n_tokens") < 5, "too_short")
        .when(F.col("punct_ratio") > 0.1, "too_punct")
        .when(F.col("mean_tok_len") > 12, "gibberish")
        .otherwise("ok"),
    )


def token_stats_by(df: DataFrame, group_col: str, text_col: str = "text") -> DataFrame:
    """Aggregate token statistics per group (corpus profiling)."""
    trimmed = F.trim(F.col(text_col))
    n_tokens = F.when(F.length(trimmed) == 0, 0).otherwise(F.size(F.split(trimmed, WS_CLASS)))
    return (
        df.withColumn("n_tokens", n_tokens)
        .groupBy(group_col)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.avg("n_tokens"), 6).alias("avg_tokens"),
            F.max("n_tokens").alias("max_tokens"),
        )
        .orderBy(group_col)
    )


def with_fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", window: int = 8
) -> DataFrame:
    """Winnowing document fingerprint: min rolling hash over each window
    of token hashes -> compact int64 (robust to small edits; the
    candidate key for fuzzy dedup). Arrow kernel (not SQL-expressible).

    Vectorized: the whole batch's tokens go through ONE
    _hash_str_array call (the length-bucketed FNV fold shared with the
    minhash kernels — bit-identical to the per-byte loop it replaced),
    window mins come from np.minimum.reduce over `window` shifted
    views, and the fingerprint column is appended in the kernel itself
    (columns pass through — appending a column to every row must not
    cost an id-shuffle join at corpus scale) instead of re-joining on
    the id. Raw rows are _spread first: a one-file corpus would
    otherwise run the whole kernel in one task."""
    from .dedup import _hash_str_array, _spread

    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )

    def kernel(batches):
        _M = np.uint64(0xFFFFFFFFFFFFFFFF)
        np.seterr(over="ignore")  # intentional uint64 wraparound hashing
        for pdf in batches:
            tok_lists = [(t or "").lower().split() for t in pdf[text_col]]
            lens = np.fromiter(
                (len(t) for t in tok_lists), np.int64, len(tok_lists)
            )
            flat_hs = _hash_str_array(
                [s for toks in tok_lists for s in toks]
            )
            offs = np.concatenate([[0], np.cumsum(lens)])
            out = []
            for d in range(len(tok_lists)):
                hs = flat_hs[offs[d]:offs[d + 1]]
                if hs.size == 0:
                    out.append(0)
                    continue
                if hs.size < window:
                    mins = hs.min(keepdims=True)
                else:
                    w = hs.size - window + 1
                    mins = np.minimum.reduce(
                        [hs[i:i + w] for i in range(window)]
                    )
                fp = np.uint64(0xCBF29CE484222325)
                for m in np.unique(mins):
                    fp = ((fp ^ m) * np.uint64(0x100000001B3)) & _M
                out.append(int(np.int64(fp)))
            yield pdf.assign(fingerprint=np.array(out, np.int64))

    return _spread(df).mapInPandas(kernel, f"{out_fields}, fingerprint long")


# GPT-2-style pretokenizer, simplified to the RE2-compatible subset
# (no lookahead) so the DuckDB oracle can run the IDENTICAL pattern:
# contractions, optional-space letter runs, digit runs, punctuation
# runs, residual whitespace. \s spelled as the explicit class (see
# WS_CLASS) so Java and RE2 agree on \x0B.
BPE_TOKEN_PATTERN = (
    "'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+"
    "| ?[^A-Za-z0-9 \\t\\n\\r\\f\\x0B]+|[ \\t\\n\\r\\f\\x0B]+"
)


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace + BPE-ish token counts per doc (both JVM-side; the
    regex count is whole-stage-codegen, no Python)."""
    trimmed = F.trim(F.col(text_col))
    ws = F.when(F.length(trimmed) == 0, 0).otherwise(
        F.size(F.split(trimmed, WS_CLASS))
    )
    bpe = F.regexp_count(F.col(text_col), F.lit(BPE_TOKEN_PATTERN))
    return df.withColumn("n_tokens_ws", ws).withColumn("n_tokens_bpe", bpe)


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 128,
    overlap: int = 32,
) -> DataFrame:
    """Sliding-window document chunking (the RAG / long-context
    pretraining splitter): each document becomes ceil((n - overlap) /
    stride) chunks of up to `window` whitespace tokens, consecutive
    chunks sharing `overlap` tokens; a final fragment shorter than the
    overlap is still emitted iff it is the document's only chunk.
    Deterministic ids: (doc_id, chunk_idx).

    All JVM: tokenize once (materialized — see lower-tokens note),
    chunk starts via sequence(), slices + concat_ws rebuild the text.
    Map-side only, no shuffle; row fan-out is the output itself.
    Whitespace-normalized reconstruction: chunk text joins tokens with
    single spaces (the standard normalization; byte-exact offsets
    would come from a char-offset variant).

    Output: (id_col, chunk_idx int, n_chunk_tokens int, chunk string).
    """
    if window < 1 or overlap < 0 or overlap >= window:
        raise ValueError("need window >= 1 and 0 <= overlap < window")
    stride = window - overlap
    trimmed = F.trim(F.col(text_col))
    toks = F.when(F.length(trimmed) == 0, F.array().cast("array<string>")
                  ).otherwise(F.split(trimmed, WS_CLASS))
    out = df.withColumn("_ck_toks", toks)
    n = F.size(F.col("_ck_toks"))
    # chunk starts: 0, stride, 2*stride, ... while start < max(n - overlap, 1)
    starts = F.when(n == 0, F.array().cast("array<int>")).otherwise(
        F.sequence(
            F.lit(0),
            F.greatest(
                F.ceil((n - F.lit(overlap)) / F.lit(stride)) - 1, F.lit(0)
            ).cast("int")
            * stride,
            F.lit(stride),
        )
    )
    out = out.select(
        id_col, "_ck_toks", F.posexplode_outer(starts).alias("chunk_idx", "_ck_start")
    ).filter(F.col("_ck_start").isNotNull())
    piece = F.slice(F.col("_ck_toks"), F.col("_ck_start") + 1, window)
    return out.select(
        id_col,
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.size(piece).alias("n_chunk_tokens"),
        F.concat_ws(" ", piece).alias("chunk"),
    )


# ------------------------------------------------- corpus-level cleanup

# RE2-compatible (no lookbehind/lookahead) so the DuckDB oracle can run
# the IDENTICAL patterns; Java and RE2 agree on every construct used.
PII_PATTERNS = [
    # order matters: emails before the phone rule (an address must not
    # lose its digits first), IPv4 before phone (dotted quads satisfy
    # the digits-with-separators shape)
    ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>"),
    # international-ish phone numbers: 7+ digits with separators
    ("\\+?[0-9][0-9()\\[\\] .-]{5,}[0-9]", "<PHONE>"),
]


def scrub_pii(df: DataFrame, text_col: str = "text",
              out_col: str | None = None) -> DataFrame:
    """Redact emails / phone-like digit runs / IPv4 literals (the
    standard pre-training scrub pass). Pure JVM regexp_replace chain —
    whole-stage codegen, zero Python, zero shuffle. Patterns are
    deliberately RE2-safe so the same strings drive the SQL oracle."""
    col = F.col(text_col)
    for pat, repl in PII_PATTERNS:
        col = F.regexp_replace(col, pat, repl)
    return df.withColumn(out_col or text_col, col)


def dedup_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 1,
) -> DataFrame:
    """Cross-document line-level dedup (the C4-style boilerplate
    remover): every line that already occurred in a lower-(doc_id,
    line_no) position anywhere in the corpus is dropped; each document
    is reassembled from its surviving lines in order.

    Plan: explode to (doc, line_no, line) via posexplode -> ONE shuffle
    on the line text (first-occurrence ranking window over
    (line, doc_id, line_no)) -> re-aggregate per doc with an
    order-preserving sort inside collect_list. Skew note: pathological
    hot lines (empty string, '---') are bounded below by min_len and
    the window only RANKS (no all-pairs) — a hot key costs one
    partition's sort, the standard trade for exact global dedup.
    Probabilistic alternatives (bloom pre-pass) bolt on in front at
    100 TB."""
    # posexplode_OUTER: a plain Generate's inferred size>0/isnotnull
    # filter re-evaluates the split twice more per row (see
    # operators/lm._doc_grams); split arrays are never empty/NULL-
    # elemented, and the min_len filter below already drops any
    # outer-NULL row
    lines = df.select(
        id_col,
        F.posexplode_outer(F.split(F.col(text_col), "\n")).alias(
            "line_no", "line"
        ),
    ).filter(F.length("line") >= min_len)
    w = Window.partitionBy("line").orderBy(id_col, "line_no")
    first = lines.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") == 1
    )
    return (
        first.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("line_no", "line"))
                    ),
                    lambda s: s.line,
                ),
                "\n",
            ).alias(text_col),
            F.count("*").alias("n_lines_kept"),
        )
    )


def tfidf_topk(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Top-k most distinctive terms per document by TF-IDF — the
    standard corpus-analysis primitive behind keyword extraction,
    topic drift monitoring, and cluster labelling in training-data
    pipelines.

    Output: (id, rank, term, tf). Scoring uses the RATIONAL idf
    variant  score = tf * (N - df) / (1 + df)  instead of the ln form:
    ln is not correctly-rounded, and tf-scaled collisions (e.g.
    2*ln(8/4) == ln(8/2) exactly) could rank differently per engine
    when each side's last-ulp drift goes the other way. The rational
    score is an int64 product (exact; throws under ANSI if tf*(N-df)
    ever exceeds 2^63 — beyond any real corpus) followed by ONE
    correctly-rounded division, so both engines compute bit-identical
    doubles and mathematical ties are FP ties too. (N-df)/(1+df) =
    (N+1)/(df+1) - 1 is the classic smoothed idf sans log — strictly
    decreasing in df, zero for terms present in every document. Ties
    (equal score) break on term ascending, keeping the ranking total
    and engine-independent.

    Plan & scale: tokenize with regexp_extract_all (JVM, RE2-compatible
    pattern) -> explode -> ONE shuffle to (doc, term) tf counts -> ONE
    shuffle to per-term document frequencies (vocab-sized result,
    rejoined on term — Spark picks broadcast when the vocab fits, sort-
    merge otherwise) -> per-doc top-k window whose partitions are
    bounded by document length, never corpus size. The corpus size N
    rides in as a literal from one metadata-only count() job.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    # explode_outer + isNotNull: a plain explode's inferred filter
    # re-runs the regex extraction twice more per row (see
    # operators/lm._doc_grams); extracted terms are never NULL
    toks = df.select(
        id_col,
        F.explode_outer(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), 0)
        ).alias("term"),
    ).filter(F.col("term").isNotNull())
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df_t"))
    # corpus size as a driver-side literal: count() on a parquet scan
    # is metadata-only (row-group stats), one cheap job — and unlike a
    # 1-row crossJoin (Catalyst folds any constant-key equi join back
    # to BroadcastNestedLoopJoin) it keeps the plan BNLJ-free
    n_docs = int(df.count())
    scored = tf.join(dfreq, "term").withColumn(
        "_score",
        (F.col("tf") * (F.lit(n_docs) - F.col("df_t"))).cast("double")
        / (F.lit(1.0) + F.col("df_t")),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("_score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, F.col("rank").cast("int"), "term", "tf")
    )


def remove_duplicate_passages(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Duplicate-passage removal at token-window granularity — the
    distributed form of ExactSubstr deduplication (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better",
    arXiv:2107.06499, which removes any substring repeated elsewhere in
    the corpus; the reference implementation builds a suffix array,
    which does not distribute — fixed-stride token windows are the
    standard cluster-scale approximation, at the cost of missing
    duplicates shorter than n tokens).

    Semantics: tokenize on WS_CLASS; every length-n token window whose
    exact text occurs >= min_count times ANYWHERE in the corpus
    (cross-document or repeated within one document) marks its n token
    positions as duplicated; a document's surviving tokens are
    reassembled in order, single-space joined (text_clean is therefore
    whitespace-normalized — same contract as dedup_lines). Documents
    shorter than n tokens pass through untouched.

    Plan & scale: two shuffles total — (1) groupBy on the window text
    for the global occurrence count (map-side partial combine absorbs
    hot boilerplate windows), (2) groupBy doc_id collecting the
    duplicated window starts; span expansion, position filtering and
    reassembly are JVM higher-order functions (zero Python). Grouping
    on the window STRING keeps the count exact; at 100 TB swap the key
    for a two-seed 128-bit hash to shrink shuffle rows (collision
    probability < 1e-18 past 10^10 windows)."""
    # every array referenced inside a later lambda is MATERIALIZED as a
    # column first — interpreted HOF evaluation re-derives inline
    # subexpressions per lambda call (see lower_tokens)
    toks_of = lambda c: F.filter(F.split(c, WS_CLASS), lambda t: t != "")
    # _toksl derives from the materialized _toks (one regex split per
    # row, not two); lowercasing never changes token boundaries, so
    # positions stay aligned with the original-case tokens
    base = df.withColumn("_toks", toks_of(F.col(text_col))).withColumn(
        "_toksl", F.transform(F.col("_toks"), F.lower)
    )
    # posexplode_outer + isNotNull: a plain Generate's inferred filter
    # inlines the n-gram HOF twice more per row (see
    # operators/lm._doc_grams); grams are concat_ws results, never NULL
    wins = base.select(
        id_col,
        F.posexplode_outer(
            word_ngrams_from_tokens(F.col("_toksl"), n)
        ).alias("pos", "gram"),
    ).filter(F.col("gram").isNotNull())
    dup = (
        wins.groupBy("gram")
        .agg(F.count("*").alias("_c"))
        .filter(F.col("_c") >= min_count)
        .select("gram")
    )
    starts = (
        wins.join(dup, "gram")
        .groupBy(id_col)
        .agg(F.collect_set("pos").alias("_starts"))
    )
    ntok = F.size(F.col("_toks"))
    staged = (
        base.join(starts, id_col, "left")
        .withColumn(
            "_cov",
            F.array_distinct(
                F.flatten(
                    F.transform(
                        F.coalesce(
                            F.col("_starts"), F.array().cast("array<int>")
                        ),
                        lambda s: F.sequence(s, s + F.lit(n - 1)),
                    )
                )
            ),
        )
        .withColumn(
            "_kept",
            # array_except keeps first-array order and uses the int
            # hash-set fast path: O(ntok + |cov|), vs the O(ntok*|cov|)
            # per-index array_contains scan that goes quadratic on
            # heavily-duplicated documents
            F.array_except(
                F.when(ntok > 0, F.sequence(F.lit(0), ntok - 1)).otherwise(
                    F.array().cast("array<int>")
                ),
                F.col("_cov"),
            ),
        )
    )
    clean = F.concat_ws(
        " ",
        F.transform(
            F.col("_kept"), lambda i: F.element_at(F.col("_toks"), i + 1)
        ),
    )
    return (
        staged.withColumn("n_tokens", ntok.cast("long"))
        .withColumn(
            "n_removed", (ntok - F.size(F.col("_kept"))).cast("long")
        )
        .withColumn("text_clean", clean)
        .drop("_toks", "_toksl", "_starts", "_cov", "_kept")
    )


def lower_tokens(text_col: F.Column) -> F.Column:
    """Lowercased WS_CLASS tokens, duplicates kept. MATERIALIZE this as
    a column (withColumn) before feeding it to word_ngrams_from_tokens:
    higher-order functions evaluate interpreted, so an inline token
    expression referenced inside the n-gram lambda is re-split/
    re-lowered once PER ELEMENT (O(L^2)/row instead of O(L))."""
    return F.filter(F.split(F.lower(text_col), WS_CLASS), lambda t: t != "")


def word_ngrams_from_tokens(toks_col: F.Column, n: int) -> F.Column:
    """Word n-grams from a MATERIALIZED token column, DUPLICATES KEPT
    (repetition signals need multiplicity; dedup wants array_distinct
    on top). Per-element cost is one slice + join of n short strings."""
    return F.when(
        F.size(toks_col) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks_col) - n),
            lambda i: F.concat_ws(" ", F.slice(toks_col, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def word_ngram_list(text_col: F.Column, n: int) -> F.Column:
    """Word n-grams straight from a text column — convenience for
    single-evaluation contexts on short texts; prefer materializing
    lower_tokens + word_ngrams_from_tokens in operators (see
    lower_tokens on why)."""
    return word_ngrams_from_tokens(lower_tokens(text_col), n)


def with_repetition_signals(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021,
    "Scaling Language Models", appendix A1.1 repetition filters —
    public arXiv:2112.11446): per-document duplicate-line fraction,
    duplicate-line character fraction, most-frequent-2-gram character
    fraction, duplicate-5-gram character fraction, and a `repetitive`
    label at the published thresholds (0.30 / 0.20 / 0.20 / 0.15).

    Plan & scale: every signal is a JVM higher-order-function
    expression over per-row arrays — zero Python, zero shuffle, pure
    map-side work. The token/line/n-gram arrays are MATERIALIZED as
    intermediate columns first: higher-order functions evaluate
    interpreted (no whole-stage codegen, no common-subexpression
    elimination), so an n-gram array expression referenced inside a
    per-distinct-element lambda would otherwise be rebuilt — split,
    lower, concat_ws and all — on every lambda invocation, turning the
    intended O(distinct * list_length) row cost into O(len^3) (measured
    ~180 ms/row on 300-char docs; the materialized form is ~0.1 ms).
    CollapseProject keeps the column boundary because the producers are
    non-cheap and multiply referenced. Duplicate counting then runs as
    RUN-LENGTH aggregates over array_sort'ed arrays — one native sort
    plus one linear fold per signal instead of a per-distinct-element
    filter scan — so per-row cost is O(L log L) in document length,
    never corpus size: embarrassingly parallel at 10^12 documents. The
    integer run counts are order-independent, so results are
    bit-identical to the naive formulation the DuckDB oracle uses.

    Definitions (denominators guard zero; thresholds compare the
    UNROUNDED value, outputs are rounded to 6 dp for hash stability):
      * dup_line_frac       = 1 - distinct_lines / lines (non-empty,
                              trimmed, split on \\n)
      * dup_line_char_frac  = chars in repeat occurrences (beyond the
                              first) of each line / total line chars
      * top2gram_char_frac  = count(top 2-gram) * len(top 2-gram)
                              / len(text); ties break on gram ascending
      * dup5gram_char_frac  = sum over 5-grams occurring >1 time of
                              count * len / len(text) (overlaps counted,
                              as in the published filter)
    """
    t = F.col(text_col)

    grams_from = word_ngrams_from_tokens
    staged = (
        df.withColumn("_rs_toks", lower_tokens(t))
        .withColumn(
            "_rs_lines",
            F.filter(
                F.transform(F.split(t, "\n"), lambda l: F.trim(l)),
                lambda l: l != "",
            ),
        )
        .withColumn("_rs_g2", grams_from(F.col("_rs_toks"), 2))
        .withColumn("_rs_g5", grams_from(F.col("_rs_toks"), 5))
    )
    zero_l = F.lit(0).cast("long")
    one_l = F.lit(1).cast("long")

    def dup_chars_sorted(arr_col, beyond_first: bool):
        """Run-length fold over a sorted array: total characters in
        duplicated elements — count*len per run of length >1 (or
        (count-1)*len when beyond_first). '' is a safe run sentinel:
        both lines and grams are non-empty by construction."""
        sub = one_l if beyond_first else zero_l

        def settle(acc):
            return F.when(
                (acc["prev"] != "") & (acc["run"] > 1),
                acc["chars"] + (acc["run"] - sub) * F.length(acc["prev"]),
            ).otherwise(acc["chars"])

        return F.aggregate(
            F.array_sort(arr_col),
            F.struct(
                F.lit("").alias("prev"),
                zero_l.alias("run"),
                zero_l.alias("chars"),
            ),
            lambda acc, g: F.struct(
                g.alias("prev"),
                F.when(g == acc["prev"], acc["run"] + 1)
                .otherwise(one_l)
                .alias("run"),
                F.when(g == acc["prev"], acc["chars"])
                .otherwise(settle(acc))
                .alias("chars"),
            ),
            settle,
        )

    lines = F.col("_rs_lines")
    n_lines = F.size(lines)
    dup_line_frac = F.when(n_lines <= 0, F.lit(0.0)).otherwise(
        (n_lines - F.size(F.array_distinct(lines))) / n_lines
    )
    line_chars = F.aggregate(
        lines, zero_l, lambda acc, l: acc + F.length(l)
    )
    dup_line_chars = dup_chars_sorted(lines, beyond_first=True)
    dup_line_char_frac = F.when(line_chars <= 0, F.lit(0.0)).otherwise(
        dup_line_chars / line_chars
    )

    text_chars = F.greatest(F.length(t), F.lit(1))
    grams2 = F.col("_rs_g2")
    # argmax by (count desc, gram asc): runs of the SORTED gram array
    # are visited in ascending gram order, and only a strictly longer
    # run displaces the incumbent — so ties keep the smallest gram,
    # the same tie-break the oracle's (-count, gram) struct sort picks
    best2_settle = lambda acc: F.struct(
        F.when(
            (acc["prev"] != "") & (acc["run"] > acc["bestcnt"]), acc["run"]
        )
        .otherwise(acc["bestcnt"])
        .alias("bestcnt"),
        F.when(
            (acc["prev"] != "") & (acc["run"] > acc["bestcnt"]), acc["prev"]
        )
        .otherwise(acc["bestgram"])
        .alias("bestgram"),
    )
    best2 = F.aggregate(
        F.array_sort(grams2),
        F.struct(
            F.lit("").alias("prev"),
            zero_l.alias("run"),
            zero_l.alias("bestcnt"),
            F.lit("").alias("bestgram"),
        ),
        lambda acc, g: F.struct(
            g.alias("prev"),
            F.when(g == acc["prev"], acc["run"] + 1)
            .otherwise(one_l)
            .alias("run"),
            best2_settle(acc)["bestcnt"].alias("bestcnt"),
            best2_settle(acc)["bestgram"].alias("bestgram"),
        ),
        best2_settle,
    )
    grams5 = F.col("_rs_g5")
    dup5_chars = dup_chars_sorted(grams5, beyond_first=False)
    dup5gram_char_frac = dup5_chars / text_chars

    staged2 = staged.withColumn("_rs_best2", best2)
    top2gram_char_frac = F.when(
        F.size(grams2) <= 0, F.lit(0.0)
    ).otherwise(
        F.col("_rs_best2")["bestcnt"]
        * F.length(F.col("_rs_best2")["bestgram"])
        / text_chars
    )

    out = (
        staged2.withColumn("_dlf", dup_line_frac)
        .withColumn("_dlcf", dup_line_char_frac)
        .withColumn("_t2f", top2gram_char_frac)
        .withColumn("_d5f", dup5gram_char_frac)
    )
    return (
        out.withColumn(
            "repetitive",
            (F.col("_dlf") > 0.30)
            | (F.col("_dlcf") > 0.20)
            | (F.col("_t2f") > 0.20)
            | (F.col("_d5f") > 0.15),
        )
        .withColumn("dup_line_frac", F.round("_dlf", 6))
        .withColumn("dup_line_char_frac", F.round("_dlcf", 6))
        .withColumn("top2gram_char_frac", F.round("_t2f", 6))
        .withColumn("dup5gram_char_frac", F.round("_d5f", 6))
        .drop("_dlf", "_dlcf", "_t2f", "_d5f",
              "_rs_toks", "_rs_lines", "_rs_g2", "_rs_g5", "_rs_best2")
    )


def corpus_profile(
    df: DataFrame,
    group_cols: tuple = ("source", "lang"),
    text_col: str = "text",
) -> DataFrame:
    """Data-card profile per corpus slice — the summary table every
    dataset release publishes (docs / token totals / exact token-count
    quantiles / quality share per (source, language)).

    Plan & scale: with_quality is row-local JVM work, then ONE
    grouped aggregation (map-side partial combine; output rows =
    number of slices, tiny). F.percentile is the exact
    percentile_cont; at 100 TB swap approx_percentile in for the
    sketch path — the aggregation shape is unchanged."""
    d = with_quality(df, text_col)
    return d.groupBy(*[F.col(c) for c in group_cols]).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.sum(F.length(text_col)).cast("long").alias("total_chars"),
        F.round(F.percentile("n_tokens", 0.5), 6).alias("p50_tokens"),
        F.round(F.percentile("n_tokens", 0.9), 6).alias("p90_tokens"),
        F.round(F.percentile("n_tokens", 0.99), 6).alias("p99_tokens"),
        F.round(
            F.avg(F.when(F.col("quality") == "ok", 1.0).otherwise(0.0)), 6
        ).alias("ok_frac"),
    )


def cooccurrence_pmi(
    df: DataFrame,
    text_col: str = "text",
    window: int = 3,
    k: int = 30,
) -> DataFrame:
    """Skip-gram co-occurrence with pointwise mutual information — the
    classic corpus-analysis pass behind collocation mining and
    embedding pre-screens.  Pairs are generated ROW-LOCALLY: for each
    token position i, partners are the next `window` tokens, built with
    a nested JVM transform+flatten over the token array — no self-join,
    no shuffle until the pair groupBy, so a hub token cannot explode a
    join (the fan-out is a fixed L*window per document).

    pmi(x, y) = ln( (c_xy / P) / ((c_x / T) * (c_y / T)) )
    with P = total pairs, T = total tokens; canonical unordered pairs
    (a <= b).  Ordering and selection are integer-only (count desc,
    pair asc) — pmi is a rounded OUTPUT, never a sort key, so the 1-ulp
    libm difference between engines cannot reorder the top-k.

    Returns top-k rows (a, b, pair_count, pmi)."""
    toks = df.select(
        F.expr(f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)").alias(
            "toks"
        )
    )
    # ONE corpus pass for BOTH reduced tables: the skip-gram pair rows
    # and the single-token rows ride the same explode (token rows carry
    # b = NULL, which no pair row can), share one map-side-combinable
    # groupBy and ONE barrier, and split back out with null filters on
    # the cached ~V+P-row result. The prior shape tokenized the corpus
    # twice and materialized two checkpoints; the union costs +1/3 more
    # exploded rows through the same shuffle but one fewer full pass —
    # strictly fewer bytes at any scale. explode_OUTER + isNotNull:
    # a plain explode's inferred size>0 filter would inline the whole
    # pair-building HOF twice (see operators/lm._doc_grams); elements
    # are non-null structs, so the null filter only drops empty docs.
    both = (
        toks.select(
            F.explode_outer(
                F.expr(
                    f"""concat(
                      flatten(transform(toks, (t, i) ->
                        transform(slice(toks, i + 2, {window}), u ->
                          struct(least(t, u) AS a, greatest(t, u) AS b)))),
                      transform(toks, t ->
                        struct(t AS a, CAST(NULL AS STRING) AS b)))"""
                )
            ).alias("p")
        )
        .filter(F.col("p").isNotNull())
        .select("p.a", "p.b")
    )
    counts = (
        both.groupBy("a", "b")
        .agg(F.count("*").alias("_n"))
        .localCheckpoint(eager=False)
    )
    pair_counts = counts.filter(F.col("b").isNotNull()).select(
        "a", "b", F.col("_n").alias("pair_count")
    )
    tok_counts = counts.filter(F.col("b").isNull()).select(
        F.col("a").alias("t"), F.col("_n").alias("c")
    )
    totals = pair_counts.agg(
        F.sum("pair_count").cast("double").alias("P")
    ).crossJoin(tok_counts.agg(F.sum("c").cast("double").alias("T")))
    top = (
        pair_counts.orderBy(F.desc("pair_count"), F.asc("a"), F.asc("b"))
        .limit(k)
    )
    # broadcast the <=2k-row TOP token set into the big count table
    # (never the reverse: tok_counts is one row per distinct corpus
    # token — millions at web scale — and shipping it to every
    # executor twice to annotate k pairs would be the wrong side)
    needed = (
        top.select(F.col("a").alias("t"))
        .unionByName(top.select(F.col("b").alias("t")))
        .distinct()
    )
    counts_small = tok_counts.join(F.broadcast(needed), "t")
    scored = (
        top.join(
            F.broadcast(
                counts_small.withColumnRenamed("t", "a").withColumnRenamed(
                    "c", "ca"
                )
            ),
            "a",
        )
        .join(
            F.broadcast(
                counts_small.withColumnRenamed("t", "b").withColumnRenamed(
                    "c", "cb"
                )
            ),
            "b",
        )
        .crossJoin(F.broadcast(totals))
    )
    pmi = F.log(
        (F.col("pair_count").cast("double") / F.col("P"))
        / ((F.col("ca") / F.col("T")) * (F.col("cb") / F.col("T")))
    )
    return scored.select(
        "a", "b", "pair_count", F.round(pmi, 6).alias("pmi")
    ).orderBy(F.desc("pair_count"), F.asc("a"), F.asc("b"))


def cooccurrence_pmi_sql(
    table: str, text_col: str = "text", window: int = 3, k: int = 30
) -> str:
    """DuckDB oracle: the same tokenizer, the same row-local pair
    construction via list comprehension over positions, the same
    canonical pairs and PMI formula (ln arguments built in the same
    order; pmi rounded, never ordered on)."""
    return f"""
WITH toks AS (
  SELECT REGEXP_EXTRACT_ALL(LOWER({text_col}), '[a-z0-9]+') AS toks
  FROM {table}
), pairs AS (
  SELECT LEAST(p.t, p.u) AS a, GREATEST(p.t, p.u) AS b
  FROM toks, UNNEST(flatten(list_transform(range(1, len(toks) + 1), i ->
         list_transform(toks[i + 1 : i + {window}], u ->
           struct_pack(t := toks[i], u := u))))) AS x(p)
), pair_counts AS (
  SELECT a, b, COUNT(*) AS pair_count FROM pairs GROUP BY a, b
), tok_counts AS (
  SELECT t, COUNT(*) AS c FROM (SELECT UNNEST(toks) AS t FROM toks) GROUP BY t
), totals AS (
  SELECT (SELECT SUM(pair_count)::DOUBLE FROM pair_counts) AS P,
         (SELECT SUM(c)::DOUBLE FROM tok_counts) AS T
), top AS (
  SELECT a, b, pair_count FROM pair_counts
  ORDER BY pair_count DESC, a, b LIMIT {k}
)
SELECT t.a, t.b, t.pair_count,
       ROUND(LN((t.pair_count::DOUBLE / tt.P)
                / ((ca.c / tt.T) * (cb.c / tt.T))), 6) AS pmi
FROM top t
JOIN tok_counts ca ON ca.t = t.a
JOIN tok_counts cb ON cb.t = t.b
CROSS JOIN totals tt
ORDER BY t.pair_count DESC, t.a, t.b
"""
