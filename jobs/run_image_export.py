"""spark-submit entrypoint: image corpus parquet -> aspect-ratio
bucketed WebDataset tar shards (the image-training export pipeline,
beyond-reference surface; consumes the input_hint table shape
image_id/bytes/w/h/fmt/caption/phash).

Stages, in order:
  0. optional alignment gate        (multimodal.caption_alignment —
                                     drop pairs whose caption↔image
                                     cosine falls below --min-alignment;
                                     hash towers, see the operator doc)
  1. optional exact near-dup drop   (phash hamming pairs -> keep-one)
  2. AR bucket + shard assignment   (bucketing.ar_bucket_shards —
                                     deterministic, partition-invariant)
  3. tar materialization            (webdataset.write_webdataset — one
                                     executor-written tar per shard)
  4. manifest parquet               (shard name, count, bytes, sha256 —
                                     the resume/verify checksums)

    spark-submit --py-files dist/dea_coastlines_spark.zip \
        jobs/run_image_export.py --images /data/tiles.parquet \
        --output /data/wds --shard-size 1000 --max-hamming 4
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--images", required=True, help="input parquet")
    p.add_argument("--output", required=True, help="tar shard directory")
    p.add_argument("--shard-size", type=int, default=1000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max-hamming", type=int, default=-1,
                   help=">=0 drops phash near-dups at this distance")
    p.add_argument("--min-alignment", type=float, default=None,
                   metavar="C",
                   help="drop image/caption pairs with alignment "
                        "cosine < C (caption_alignment hash towers; "
                        "omit to skip the gate)")
    args = p.parse_args(argv if argv is not None else sys.argv[1:])

    from dea_coastlines_spark.session import submit_session

    spark = submit_session("dea-coastlines-spark:image-export")

    from dea_coastlines_spark.operators.bucketing import ar_bucket_shards
    from dea_coastlines_spark.operators.dedup import phash_neardup_pairs
    from dea_coastlines_spark.operators.graph import keep_canonical
    from dea_coastlines_spark.sources.webdataset import write_webdataset

    imgs = spark.read.parquet(args.images)
    n_in = imgs.count()

    if args.min_alignment is not None:
        # gate BEFORE the near-dup join: alignment is map-only (one
        # slim Arrow pass, bytes never move), the pair join is not
        from dea_coastlines_spark.operators.multimodal import (
            caption_alignment,
        )

        keep_ids = (
            caption_alignment(imgs, threshold=args.min_alignment)
            .filter("keep")
            .select("image_id")
        )
        imgs = imgs.join(keep_ids, "image_id", "left_semi")

    if args.max_hamming >= 0:
        pairs = phash_neardup_pairs(
            imgs, max_hamming=args.max_hamming
        ).select("id_a", "id_b")
        imgs = keep_canonical(imgs, pairs, id_col="image_id")

    sharded = ar_bucket_shards(
        imgs, "image_id", shard_size=args.shard_size, seed=args.seed
    )
    manifest = write_webdataset(sharded, args.output)
    manifest.write.mode("overwrite").parquet(args.output + "_manifest")

    m = spark.read.parquet(args.output + "_manifest")
    n_out = int(m.agg({"n_samples": "sum"}).collect()[0][0])
    print(json.dumps({
        "job": "image_export", "n_in": n_in, "n_out": n_out,
        "n_shards": m.count(),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
