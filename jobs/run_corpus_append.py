"""spark-submit entrypoint: incremental corpus maintenance — the daily
append path of a large training corpus. A new increment of documents
(today's crawl) is screened against the EXISTING corpus snapshot table
and only what survives is appended in one atomic snapshot commit, so
readers see either the old corpus or old+screened-increment, never a
partial state, and `SnapshotTable.read_incremental(since_snapshot)`
exposes exactly the kept rows downstream.

Stages, in order:
  1. exact dedup WITHIN the increment   (lowest doc_id per 128-bit
                                         content hash)
  2. exact screen vs the corpus         (anti-join on the same 128-bit
                                         content hash — cheap first pass)
  3. id-collision guard                 (doc_ids already in the table
                                         are dropped and reported —
                                         append must not fork an id)
  4. near-dup screen vs the corpus      (dedup.cross_corpus_neardup:
                                         cross-table banded MinHash LSH
                                         + exact-Jaccard verify at
                                         --threshold; one-sided — the
                                         existing corpus is only read)
  5. SnapshotTable.append               (atomic; prints the new version)

First run: --create initializes the table from the (self-deduped)
increment instead of screening against an empty corpus.

    spark-submit --py-files dist/dea_coastlines_spark.zip \
        jobs/run_corpus_append.py --table /data/corpus \
        --increment /data/crawl_2026_08_19.parquet --threshold 0.8

Emits ONE JSON line: counts per stage and the committed version.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--table", required=True, help="corpus snapshot table")
    p.add_argument("--increment", required=True, help="new docs parquet")
    p.add_argument("--threshold", type=float, default=0.7,
                   help="near-dup Jaccard threshold vs the existing corpus")
    p.add_argument("--bands", type=int, default=8,
                   help="MinHash LSH bands (64 perms; 8x8 matches t~0.77)")
    p.add_argument("--create", action="store_true",
                   help="initialize the table from the increment if empty")
    p.add_argument("--compact-target-bytes", type=int, default=0,
                   help="after appending, rewrite small-file partitions "
                        "into files of ~this size (0 = off). Daily appends "
                        "add one file per partition per commit; periodic "
                        "compaction keeps scan parallelism tied to bytes, "
                        "not commit count. Old files stay time-travelable "
                        "until vacuum().")
    args = p.parse_args(argv if argv is not None else sys.argv[1:])

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from dea_coastlines_spark.session import submit_session

    spark = submit_session("dea-coastlines-spark:corpus-append")

    from dea_coastlines_spark.operators.dedup import cross_corpus_neardup
    from dea_coastlines_spark.sources.table import SnapshotTable

    inc = spark.read.parquet(args.increment)
    n_inc = inc.count()

    # 1. exact dedup within the increment (keep lowest doc_id per text)
    inc = inc.withColumn("_h1", F.xxhash64("text")).withColumn(
        "_h2", F.xxhash64(F.lit("\x00dedup-salt-2"), "text")
    )
    w = Window.partitionBy("_h1", "_h2").orderBy("doc_id")
    inc = inc.withColumn("_rk", F.row_number().over(w)).filter(
        F.col("_rk") == 1
    ).drop("_rk")
    # lazy localCheckpoint: n_self materializes it, and stages 2-5 (plus
    # their count() actions) read the materialized increment instead of
    # re-running the scan + dedup window once per action
    inc = inc.localCheckpoint(eager=False)
    n_self = inc.count()

    table = SnapshotTable(spark, args.table)
    if table.current_version() == 0:
        if not args.create:
            raise SystemExit(
                f"no snapshot at {args.table}; pass --create to initialize"
            )
        version = table.create(inc.drop("_h1", "_h2"))
        print(json.dumps({
            "n_increment": n_inc, "n_after_self_dedup": n_self,
            "n_after_exact": n_self, "n_dropped_id_collision": 0,
            "n_appended": n_self, "version": version, "created": True,
        }))
        return 0

    ref = table.read().select("doc_id", "text")

    # 2. exact screen vs the corpus (content-hash anti-join)
    ref_keys = ref.select(
        F.xxhash64("text").alias("_h1"),
        F.xxhash64(F.lit("\x00dedup-salt-2"), "text").alias("_h2"),
    ).distinct()
    inc = inc.join(ref_keys, ["_h1", "_h2"], "left_anti").drop("_h1", "_h2")
    n_exact = inc.count()

    # 3. id-collision guard: an append must never fork an existing id
    inc = inc.join(ref.select("doc_id"), "doc_id", "left_anti")
    n_ids = inc.count()

    # 4. near-dup screen vs the corpus (one-sided; ref only read)
    flags = cross_corpus_neardup(
        inc.select("doc_id", "text"), ref, "text", "doc_id",
        bands=args.bands, threshold=args.threshold,
    ).select("doc_id", "kept")
    # checkpoint before counting: without it the append would re-run
    # the whole LSH screen (the job's dominant cost) a second time
    kept = (
        inc.join(flags, "doc_id")
        .filter(F.col("kept") == 1)
        .drop("kept")
        .localCheckpoint(eager=False)
    )
    n_kept = kept.count()

    # 5. atomic snapshot append
    version = table.append(kept)
    # 6. optional small-file compaction (a separate snapshot: readers
    # see old+increment first, then the content-identical rewrite)
    if args.compact_target_bytes > 0:
        version = table.compact(target_bytes=args.compact_target_bytes)
    print(json.dumps({
        "n_increment": n_inc, "n_after_self_dedup": n_self,
        "n_after_exact": n_exact,
        "n_dropped_id_collision": n_exact - n_ids,
        "n_appended": n_kept, "version": version, "created": False,
        "compacted": args.compact_target_bytes > 0,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
