"""spark-submit entrypoint: raw documents parquet -> training-ready
shards (the LLM-corpus preparation pipeline, beyond-reference surface).

Stages, in order (each an engine operator, all one job):
  0. URL screen           (--url-col: web.with_url_parts canonicalizes
                           and extracts registered domains; exact dedup
                           by canonical URL keeps the lowest doc_id;
                           --seen-urls screens against an already-
                           crawled URL list via the exact Bloom path
                           (bloom.bloom_screen); --domain-cap N keeps
                           at most N docs per registered domain)
  1. PII scrub            (text.scrub_pii — JVM regexp chain)
  2. quality filter       (text.with_quality, keep --keep-quality labels)
  2b. classifier gate     (classifier.quality_classifier — hashed
                           linear model, map-only JVM scoring;
                           --classifier-threshold T drops docs below T,
                           --classifier-weights plugs trained weights)
  3. repetition filter    (text.with_repetition_signals, drop docs over
                           the Gopher thresholds; --repetition-filter)
  4. exact dedup          (first occurrence per content hash)
  5. near-dup clustering  (MinHash LSH pairs -> connected components ->
                           keep canonical member only)
  6. cross-corpus screen  (dedup.cross_corpus_neardup vs --dedup-against
                           parquet; drop docs near-duplicating any doc
                           of an existing corpus, one-sided)
  7. passage dedup        (text.remove_duplicate_passages, replace text
                           with the deduplicated form; --dedup-passages N)
  8. decontamination      (decontam.decontaminate vs --decontaminate-eval
                           parquet; drop docs sharing eval n-grams)
  9. stratified sampling  (per-language rates, deterministic hash)
 10. shuffle + shard      (deterministic (shard, pos) training order)
 11. write                parquet partitioned by shard

    spark-submit --py-files dist/dea_coastlines_spark.zip \
        jobs/run_corpus_prep.py --documents /data/docs.parquet \
        --output /data/shards --n-shards 64 --keep-quality ok \
        --rates en=0.5,de=0.25 --default-rate 0.05
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--documents", required=True, help="input parquet")
    p.add_argument("--output", required=True)
    p.add_argument("--n-shards", type=int, default=16)
    p.add_argument("--keep-quality", default="ok",
                   help="comma list of quality labels to keep ('' = all)")
    p.add_argument("--neardup-threshold", type=float, default=0.8)
    p.add_argument("--repetition-filter", action="store_true",
                   help="drop documents over the Gopher repetition "
                        "thresholds")
    p.add_argument("--dedup-against", default="",
                   help="reference-corpus parquet (doc_id, text); drop "
                        "training docs near-duplicating any reference "
                        "doc (one-sided cross-corpus MinHash screen)")
    p.add_argument("--dedup-against-threshold", type=float, default=0.7)
    p.add_argument("--dedup-passages", type=int, default=0, metavar="N",
                   help="remove token windows of this length occurring "
                        ">=2 times corpus-wide (0 = off)")
    p.add_argument("--decontaminate-eval", default="",
                   help="eval-set parquet (doc_id, text); drop training "
                        "docs sharing n-grams with it")
    p.add_argument("--decontam-ngram", type=int, default=8)
    p.add_argument("--pack-seq-len", type=int, default=0, metavar="L",
                   help="emit concat-and-chunk packing columns (offset/"
                        "pack_id/pack_offset/n_packs) for fixed "
                        "L-token training windows (0 = plain shards)")
    p.add_argument("--url-col", default="",
                   help="URL column name; enables the URL screen stage "
                        "(canonicalize, dedup by canonical URL, domain "
                        "extraction)")
    p.add_argument("--domain-cap", type=int, default=0, metavar="N",
                   help="keep at most N docs per registered domain "
                        "(0 = off; requires --url-col)")
    p.add_argument("--seen-urls", default="",
                   help="parquet with a url column of already-crawled "
                        "URLs; drop docs whose canonical URL is seen "
                        "(exact Bloom-screened anti-join; requires "
                        "--url-col)")
    p.add_argument("--seen-bloom-bits", type=int, default=1 << 24)
    p.add_argument("--classifier-threshold", type=float, default=0.0,
                   metavar="T",
                   help="hashed linear quality-classifier gate "
                        "(operators/classifier.py): drop docs scoring "
                        "below T (0 = stage off)")
    p.add_argument("--classifier-weights", default="",
                   help="optional JSON file {\"dim\": D, \"weights\": "
                        "[..D..]} with trained bucket weights; default "
                        "is the deterministic placeholder mix")
    p.add_argument("--rates", default="",
                   help="lang=rate,... stratified sampling rates")
    p.add_argument("--default-rate", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv if argv is not None else sys.argv[1:])

    from pyspark.sql import functions as F

    from dea_coastlines_spark.session import submit_session

    spark = submit_session("dea-coastlines-spark:corpus-prep")

    from dea_coastlines_spark.operators.dedup import minhash_lsh_pairs
    from dea_coastlines_spark.operators.graph import keep_canonical
    from dea_coastlines_spark.operators.sampling import (
        shuffle_shards,
        stratified_sample,
    )
    from dea_coastlines_spark.operators.text import scrub_pii, with_quality

    docs = spark.read.parquet(args.documents)
    n_in = docs.count()

    if args.url_col:
        # URL screen first: it is the cheapest stage (pure string
        # expressions + one window) and every doc it drops skips all
        # content ops below
        from pyspark.sql.window import Window as _W

        from dea_coastlines_spark.operators.web import (
            canonical_url,
            cap_per_domain,
            with_url_parts,
        )

        docs = with_url_parts(docs, args.url_col)
        if args.seen_urls:
            from dea_coastlines_spark.operators.bloom import bloom_screen

            seen = spark.read.parquet(args.seen_urls).select(
                canonical_url(F.col(args.url_col)).alias("canon_url")
            )
            docs = bloom_screen(
                docs, seen, "canon_url", num_bits=args.seen_bloom_bits
            )
        # docs with a NULL/empty URL are never dup candidates — give
        # each its own key instead of collapsing them into one group
        ukey = F.coalesce(
            F.nullif(F.col("canon_url"), F.lit("")),
            F.concat(F.lit("\x00nourl:"), F.col("doc_id").cast("string")),
        )
        wu = _W.partitionBy(ukey).orderBy("doc_id")
        docs = (
            docs.withColumn("_urk", F.row_number().over(wu))
            .filter(F.col("_urk") == 1)
            .drop("_urk")
        )
        if args.domain_cap > 0:
            docs = cap_per_domain(docs, args.domain_cap)

    docs = scrub_pii(docs)
    docs = with_quality(docs)
    if args.keep_quality:
        keep = [x.strip() for x in args.keep_quality.split(",")]
        docs = docs.filter(F.col("quality").isin(keep))

    if args.classifier_threshold > 0:
        # model-based gate after the heuristic one: heuristics are
        # cheaper per byte, so they run first and shrink the input
        from dea_coastlines_spark.operators.classifier import (
            quality_classifier,
        )

        kw = {}
        if args.classifier_weights:
            with open(args.classifier_weights) as fh:
                spec = json.load(fh)
            kw = {"dim": int(spec["dim"]), "weights": spec["weights"]}
        docs = (
            quality_classifier(
                docs, threshold=args.classifier_threshold, **kw
            )
            .filter(F.col("keep"))
            .drop("n_feats", "score", "keep")
        )

    if args.repetition_filter:
        from dea_coastlines_spark.operators.text import (
            with_repetition_signals,
        )

        docs = (
            with_repetition_signals(docs)
            .filter(~F.col("repetitive"))
            .drop("repetitive", "dup_line_frac", "dup_line_char_frac",
                  "top2gram_char_frac", "dup5gram_char_frac")
        )

    # exact dedup: keep the lowest doc_id per exact content. 128-bit
    # key (two independent xxhash64) — a single 64-bit hash collides
    # with near-certainty at multi-billion rows and every collision
    # silently drops a distinct document.
    docs = docs.withColumn("_chash", F.xxhash64("text")).withColumn(
        "_chash2", F.xxhash64(F.lit("\x00dedup-salt-2"), "text")
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("_chash", "_chash2").orderBy("doc_id")
    docs = (
        docs.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk", "_chash", "_chash2")
    )

    pairs = minhash_lsh_pairs(
        docs, "text", "doc_id", threshold=args.neardup_threshold
    ).select("id_a", "id_b")
    docs = keep_canonical(docs, pairs)

    if args.dedup_against:
        # one-sided screening against an EXISTING corpus (prior crawl /
        # held-out set): drop every doc near-duplicating any reference
        # doc; the reference itself is never modified
        from dea_coastlines_spark.operators.dedup import cross_corpus_neardup

        ref = spark.read.parquet(args.dedup_against).select("doc_id", "text")
        flags = cross_corpus_neardup(
            docs.select("doc_id", "text"), ref, "text", "doc_id",
            threshold=args.dedup_against_threshold,
        ).select("doc_id", "kept")
        docs = (
            docs.join(flags, "doc_id")
            .filter(F.col("kept") == 1)
            .drop("kept")
        )

    if args.dedup_passages > 0:
        from dea_coastlines_spark.operators.text import (
            remove_duplicate_passages,
        )

        # quality columns were computed on the PRE-dedup text; drop
        # them with it so no stale metadata rides into the shards
        docs = (
            remove_duplicate_passages(docs, n=args.dedup_passages)
            .drop("text", "n_tokens", "n_removed", "quality",
                  "punct_ratio", "mean_tok_len", "stop_hits")
            .withColumnRenamed("text_clean", "text")
        )

    if args.decontaminate_eval:
        from dea_coastlines_spark.operators.decontam import decontaminate

        eval_df = spark.read.parquet(args.decontaminate_eval)
        docs = (
            decontaminate(docs, eval_df, n=args.decontam_ngram)
            .filter(~F.col("contaminated"))
            .drop("hits", "contaminated")
        )

    rates = {}
    if args.rates:
        for kv in args.rates.split(","):
            k, _, v = kv.partition("=")
            rates[k.strip()] = float(v)
    if rates or args.default_rate < 1.0:
        docs = stratified_sample(
            docs, "doc_id", "lang", rates,
            seed=args.seed, default_fraction=args.default_rate,
        )

    if args.pack_seq_len > 0:
        # GPT-style concat-and-chunk layout: same u01 order as
        # shuffle_shards plus token offsets / chunk assignment, so the
        # training reader can slice fixed windows straight off the shard
        from dea_coastlines_spark.operators.sampling import pack_sequences

        # filtered tokenization, same as q_pack_sequences: trim+split
        # alone would count leading/trailing whitespace as tokens and
        # shift every later offset in the shard
        docs = docs.withColumn(
            "_n_tok",
            F.size(
                F.filter(
                    F.split(F.col("text"), "[ \\t\\n\\r\\f\\x0B]+"),
                    lambda t: t != "",
                )
            ).cast("long"),
        )
        sharded = pack_sequences(
            docs, "doc_id", "_n_tok", args.pack_seq_len,
            n_shards=args.n_shards, seed=args.seed,
        ).drop("_n_tok")
    else:
        sharded = shuffle_shards(docs, "doc_id", args.n_shards,
                                 seed=args.seed)
    (
        sharded.repartition("shard")
        .sortWithinPartitions("shard", "pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(args.output)
    )
    n_out = spark.read.parquet(args.output).count()
    print(json.dumps({"job": "corpus_prep", "n_in": n_in, "n_out": n_out,
                      "n_shards": args.n_shards}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
