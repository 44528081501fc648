"""Corpus integrity validation for image + caption tables.

The ingest gate every web-scale image-caption corpus runs before
training: per row, verify that (a) the declared format matches the
payload's magic bytes, (b) the caption parses as JSON and carries the
required keys, (c) the bytes actually decode, (d) the decoded
dimensions match the declared w/h columns, and (e) the stored
perceptual hash matches a recompute from the decoded pixels (catches
payload/metadata swaps that every other check misses).

Plan & scale: the magic-byte sniff and caption-JSON checks are pure JVM
expressions (whole-stage codegen, zero Python); only the decode-backed
checks run in one Arrow kernel, with the JVM flags riding through as
pass-through columns — so the whole validation is a single narrow
Python stage with ZERO shuffles, embarrassingly parallel at 10^12 rows.
Invalid rows are flagged, not dropped: real pipelines audit violation
counts by source before quarantining (`integrity_summary`).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (IntegerType, StringType, StructField,
                               StructType)

from ..codecs import image as img_codec

_MASK64 = (1 << 64) - 1

# magic bytes -> canonical format name (public file-format signatures)
_CAPTION_SCHEMA = StructType([
    StructField("crs", StringType()),
    StructField("year", IntegerType()),
    StructField("tile_x", IntegerType()),
    StructField("tile_y", IntegerType()),
])


def sniff_fmt(bytes_col: F.Column) -> F.Column:
    """Container format from payload magic bytes, as a JVM expression:
    PNG 89504E47, JPEG FFD8FF, TIFF II*\\0 / MM\\0* — NULL if none
    match (unknown container)."""
    head4 = F.hex(F.substring(bytes_col, 1, 4))
    head3 = F.hex(F.substring(bytes_col, 1, 3))
    return (
        F.when(head4 == "89504E47", F.lit("png"))
        .when(head3 == "FFD8FF", F.lit("jpeg"))
        .when(head4.isin("49492A00", "4D4D002A"), F.lit("tiff"))
        .otherwise(F.lit(None).cast("string"))
    )


def validate_corpus(
    tiles: DataFrame, check_phash: bool = True, phash_tol: int = 8
) -> DataFrame:
    """Per-row integrity flags over an (image_id, bytes, w, h, fmt,
    caption, phash) table: fmt_ok, caption_ok, decode_ok, dims_ok,
    phash_ok, is_valid. See module docstring for the plan shape.

    phash_ok compares by hamming distance <= phash_tol, not equality:
    a perceptual hash legitimately drifts a few bits (measured up to 6 on 8-bit-quantized q95 JPEG tiles) when the stored
    hash was computed pre-encode and the payload is lossy (JPEG), while
    a payload/metadata swap moves tens of bits (~32 expected for
    unrelated images). tol=0 is exact-match
    for fully-lossless corpora."""
    cap = F.from_json(F.col("caption"), _CAPTION_SCHEMA)
    flagged = tiles.select(
        "image_id", "bytes", "fmt", "w", "h", "phash",
        (sniff_fmt(F.col("bytes")) == F.col("fmt")).alias("fmt_ok0"),
        (
            cap.isNotNull()
            & cap["crs"].isNotNull() & cap["year"].isNotNull()
            & cap["tile_x"].isNotNull() & cap["tile_y"].isNotNull()
        ).alias("caption_ok0"),
    )

    do_phash = check_phash

    def kernel(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                decode_ok, dims_ok, phash_ok = False, False, False
                try:
                    arr = img_codec.decode_tile(bytes(r.bytes), r.fmt)
                    decode_ok = True
                    dims_ok = arr.shape[1] == r.w and arr.shape[0] == r.h
                    if do_phash:
                        d = (img_codec.phash64(arr) ^ int(r.phash)) & _MASK64
                        phash_ok = bin(d).count("1") <= phash_tol
                except Exception:
                    pass
                fmt_ok = bool(r.fmt_ok0) if r.fmt_ok0 is not None else False
                cap_ok = bool(r.caption_ok0)
                valid = (
                    fmt_ok and cap_ok and decode_ok and dims_ok
                    and (phash_ok or not do_phash)
                )
                rows.append({
                    "image_id": r.image_id,
                    "fmt_ok": fmt_ok,
                    "caption_ok": cap_ok,
                    "decode_ok": decode_ok,
                    "dims_ok": dims_ok,
                    "phash_ok": phash_ok if do_phash else None,
                    "is_valid": valid,
                })
            yield pd.DataFrame(
                rows,
                columns=["image_id", "fmt_ok", "caption_ok", "decode_ok",
                         "dims_ok", "phash_ok", "is_valid"],
            )

    return flagged.mapInPandas(
        kernel,
        "image_id string, fmt_ok boolean, caption_ok boolean, "
        "decode_ok boolean, dims_ok boolean, phash_ok boolean, "
        "is_valid boolean",
    )


def integrity_summary(flags: DataFrame) -> DataFrame:
    """Violation counts over validate_corpus output — the audit table a
    real ingest reports before quarantining. One global aggregation
    (partial map-side combine; the shuffle carries 1 row/partition)."""
    cnt = lambda c: F.sum(F.when(~F.col(c), 1).otherwise(0)).cast("long")
    return flags.agg(
        F.count("*").alias("n_rows"),
        cnt("fmt_ok").alias("bad_fmt"),
        cnt("caption_ok").alias("bad_caption"),
        cnt("decode_ok").alias("bad_decode"),
        cnt("dims_ok").alias("bad_dims"),
        F.sum(F.when(F.col("phash_ok").isNotNull() & ~F.col("phash_ok"), 1)
              .otherwise(0)).cast("long").alias("bad_phash"),
        F.sum(F.when(F.col("is_valid"), 1).otherwise(0)).cast("long")
        .alias("n_valid"),
    )


def plant_corruptions(pdf: "pd.DataFrame") -> "pd.DataFrame":
    """Deterministically corrupt a pandas tile table by row position —
    the shared fixture for the driver query and its sequential oracle
    (both call this on the same generated corpus, so the planted truth
    is identical on both sides):
      idx % 5 == 1  -> declared w off by 3       (dims violation)
      idx % 7 == 3  -> declared fmt lies          (fmt + decode violation)
      idx % 11 == 5 -> payload truncated to 64 B  (decode violation)
      idx % 13 == 7 -> caption JSON mangled       (caption violation)
      idx % 17 == 9 -> stored phash bit-flipped   (phash violation)
    """
    pdf = pdf.copy().reset_index(drop=True)
    for i in range(len(pdf)):
        if i % 5 == 1:
            pdf.loc[i, "w"] = int(pdf.loc[i, "w"]) + 3
        if i % 7 == 3:
            pdf.loc[i, "fmt"] = "tiff" if pdf.loc[i, "fmt"] != "tiff" else "png"
        if i % 11 == 5:
            pdf.loc[i, "bytes"] = bytes(pdf.loc[i, "bytes"])[:64]
        if i % 13 == 7:
            pdf.loc[i, "caption"] = str(pdf.loc[i, "caption"])[:10]
        if i % 17 == 9:
            pdf.loc[i, "phash"] = int(pdf.loc[i, "phash"]) ^ 0xFFFF
    return pdf
