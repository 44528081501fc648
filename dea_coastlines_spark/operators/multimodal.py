"""Multimodal column operators: opaque `binary` payloads with typed
metadata, processed in Arrow-batched kernels.

Real implementations (this env has real codecs for png/tiff):
  * decode_stats   — per-image pixel statistics
  * resize         — block-mean downsample, re-encoded
  * frame_sample   — every-kth-observation sampling ("video" = the
                     per-(tile, year) observation stack) — pure
                     relational, no decode
  * audio_features — WAV/PCM decode (codecs/wav.py) + duration / RMS /
                     zero-crossing rate / spectral centroid; pinned by
                     closed-form sine tests
  * augment_images — deterministic crop/flip/brightness augmentation
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..codecs import image as img_codec


def decode_stats(tiles: DataFrame) -> DataFrame:
    """Decode each image and emit pixel stats (mean/std/nodata fraction).
    One Arrow batch in, one out; bytes never leave the executor."""

    def kernel(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                arr = img_codec.decode_tile(bytes(r.bytes), r.fmt)
                finite = np.isfinite(arr)
                # float64 accumulation: float32 pairwise summation
                # drifts ~1e-6 on 10^4-pixel tiles, visible at 6-dp
                # rounding (and vs the float64 SQL oracle)
                a64 = arr.astype(np.float64)
                out.append(
                    {
                        "image_id": r.image_id,
                        "px_mean": float(np.nanmean(a64)) if finite.any() else None,
                        "px_std": float(np.nanstd(a64)) if finite.any() else None,
                        "nodata_frac": float(1.0 - finite.mean()),
                    }
                )
            yield pd.DataFrame(out, columns=["image_id", "px_mean", "px_std", "nodata_frac"])

    return tiles.select("image_id", "bytes", "fmt").mapInPandas(
        kernel, "image_id string, px_mean double, px_std double, nodata_frac double"
    )


def image_quality(tiles: DataFrame) -> DataFrame:
    """Per-image quality signals for corpus filtering — the standard
    cheap no-reference metrics used to drop blurry / empty / low-
    information images before training:

      * laplacian_var — variance of the 4-neighbour Laplacian
        (4v - up - down - left - right) over interior pixels whose full
        neighbourhood is finite; the classic blur detector
        (Pech-Pacheco et al., ICPR 2000). NULL when no interior pixel
        has a finite neighbourhood.
      * entropy — Shannon entropy (nats) of a 256-bin histogram of the
        finite pixels, binned over the image's own [min, max] range;
        0.0 for constant images. Low entropy = near-empty content.
      * dynamic_range — max - min of finite pixels.
      * nodata_frac — fraction of non-finite pixels.
      * low_quality — laplacian_var < 1e-6 (or NULL) OR entropy < 0.5
        OR dynamic_range < 1e-3 OR nodata_frac > 0.5. Thresholds
        compare the UNROUNDED values; numeric outputs are rounded to
        6 dp for hash stability.

    Plan & scale: decode + all metrics inside ONE Arrow kernel
    (mapInPandas) — bytes never leave the executor, zero shuffle,
    embarrassingly parallel at 10^12 images. All accumulation is
    float64; the histogram entropy is summed in ascending-bin order so
    the SQL oracle (groupBy bin) agrees to well under the 6-dp
    rounding."""

    def kernel(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                try:
                    arr = img_codec.decode_tile(
                        bytes(r.bytes), r.fmt
                    ).astype(np.float64)
                except Exception:
                    # an undecodable payload is the lowest quality of
                    # all — flag it, never kill the job (the integrity
                    # gate reports it separately)
                    rows.append({
                        "image_id": r.image_id, "laplacian_var": None,
                        "entropy": None, "dynamic_range": None,
                        "nodata_frac": None, "low_quality": True,
                    })
                    continue
                finite = np.isfinite(arr)
                nodata_frac = float(1.0 - finite.mean())
                lap_var = None
                if arr.shape[0] >= 3 and arr.shape[1] >= 3:
                    c = arr[1:-1, 1:-1]
                    ok = (
                        finite[1:-1, 1:-1]
                        & finite[:-2, 1:-1] & finite[2:, 1:-1]
                        & finite[1:-1, :-2] & finite[1:-1, 2:]
                    )
                    if ok.any():
                        lap = (
                            4.0 * c - arr[:-2, 1:-1] - arr[2:, 1:-1]
                            - arr[1:-1, :-2] - arr[1:-1, 2:]
                        )[ok]
                        lap_var = float(lap.var())
                if finite.any():
                    v = arr[finite]
                    vmin, vmax = float(v.min()), float(v.max())
                    rng = vmax - vmin
                    if rng > 0:
                        bins = np.minimum(
                            np.floor((v - vmin) / rng * 256.0).astype(np.int64), 255
                        )
                        cnt = np.bincount(bins, minlength=256).astype(np.float64)
                        p = cnt[cnt > 0] / v.size
                        entropy = float(-(p * np.log(p)).sum())
                    else:
                        entropy = 0.0
                else:
                    vmin = vmax = rng = None
                    entropy = None
                low = (
                    (lap_var is None or lap_var < 1e-6)
                    or (entropy is None or entropy < 0.5)
                    or (rng is None or rng < 1e-3)
                    or nodata_frac > 0.5
                )
                rows.append(
                    {
                        "image_id": r.image_id,
                        "laplacian_var": None if lap_var is None else round(lap_var, 6),
                        "entropy": None if entropy is None else round(entropy, 6),
                        "dynamic_range": None if rng is None else round(rng, 6),
                        "nodata_frac": round(nodata_frac, 6),
                        "low_quality": bool(low),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["image_id", "laplacian_var", "entropy",
                         "dynamic_range", "nodata_frac", "low_quality"],
            )

    return tiles.select("image_id", "bytes", "fmt").mapInPandas(
        kernel,
        "image_id string, laplacian_var double, entropy double, "
        "dynamic_range double, nodata_frac double, low_quality boolean",
    )


def resize(tiles: DataFrame, factor: int = 2) -> DataFrame:
    """Block-mean downsample by `factor`, re-encoded in the same format.
    NaN-aware (a block is NaN only if fully NaN)."""

    def kernel(batches):
        import warnings

        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                arr = img_codec.decode_tile(bytes(r.bytes), r.fmt)
                h, w = arr.shape
                hh, ww = h // factor * factor, w // factor * factor
                blocks = arr[:hh, :ww].reshape(hh // factor, factor, ww // factor, factor)
                with warnings.catch_warnings():
                    warnings.simplefilter("ignore", RuntimeWarning)
                    small = np.nanmean(blocks, axis=(1, 3)).astype(np.float32)
                out.append(
                    {
                        "image_id": r.image_id,
                        "bytes": img_codec.encode_tile(small, r.fmt),
                        "w": small.shape[1], "h": small.shape[0], "fmt": r.fmt,
                    }
                )
            yield pd.DataFrame(out, columns=["image_id", "bytes", "w", "h", "fmt"])

    return tiles.select("image_id", "bytes", "fmt").mapInPandas(
        kernel, "image_id string, bytes binary, w int, h int, fmt string"
    )


def caption_alignment(
    tiles: DataFrame,
    id_col: str = "image_id",
    caption_col: str = "caption",
    phash_col: str = "phash",
    threshold: float = 0.0,
) -> DataFrame:
    """Cross-modal caption↔image alignment gate — the LAION/DataComp
    CLIP-score filtering step re-expressed over hash embeddings.

    Production pipelines embed each image and its caption with a
    two-tower encoder and drop pairs whose cosine falls below a
    threshold. No ML runtime ships in this environment, so the towers
    are the documented deterministic stand-ins: the image tower is the
    64-bit perceptual hash already computed at ingest (the input_hint
    phash column), the text tower is the caption tokens' 64-bit
    SimHash (operators/dedup.simhash64) — both read as ±1 hypercube
    vectors, where cosine(a, b) = 1 - 2·hamming(a, b)/64 exactly.
    Swapping in real encoders replaces ONE projection (the towers);
    the plan — slim column prune, one Arrow pass for the text tower,
    JVM bit_count(xor) scoring, the gate — is the production shape.

    Plan shape at 10^12 pairs: zero shuffles. Columns are pruned to
    (id, caption, phash) BEFORE the Arrow exchange so image bytes
    never cross into Python; scoring and the keep flag are
    whole-stage-codegen expressions. Alignment is an exact dyadic
    rational (k/32 - 1), so thresholds compare bit-identically on any
    engine. Empty/NULL captions embed to signature 0 and still score —
    screening them is the upstream integrity gate's job.
    """
    from .dedup import simhash64

    def kernel(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    phash_col: pdf[phash_col],
                    "caption_sig": simhash64(pdf[caption_col]),
                }
            )

    slim = tiles.select(id_col, caption_col, phash_col)
    sigs = slim.mapInPandas(
        kernel, f"{id_col} string, {phash_col} long, caption_sig long"
    )
    ham = F.bit_count(
        F.col("caption_sig").bitwiseXOR(F.col(phash_col))
    ).cast("int")
    return (
        sigs.withColumn("hamming", ham)
        .withColumn(
            "alignment",
            F.round(F.lit(1.0) - F.col("hamming") * 2.0 / 64.0, 6),
        )
        .withColumn("keep", F.col("alignment") >= float(threshold))
    )


def hard_negatives(
    tiles: DataFrame,
    k: int = 3,
    prefix_bits: int = 16,
    bucket_cap: int | None = 256,
    id_col: str = "image_id",
    caption_col: str = "caption",
    phash_col: str = "phash",
) -> DataFrame:
    """Contrastive-training hard-negative mining: for every image, the
    k WRONG captions it is most confusable with — captions of OTHER
    images in the same visual bucket, ranked by the cross-modal
    alignment of (this image's tower, that caption's tower). The
    standard CLIP-style batch-construction step, done corpus-wide and
    deterministically instead of per-minibatch.

    Towers are the caption_alignment hash stand-ins (phash image
    tower, caption-SimHash text tower; cosine = 1 - 2·hamming/64).
    Visual buckets are the top ``prefix_bits`` bits of the perceptual
    hash — images sharing them look alike, so their captions make
    HARD negatives (visually plausible, semantically wrong).

    Scale shape: the pair surface is bucket-local, never corpus-wide.
    ``bucket_cap`` bounds the candidate side per bucket (members are
    ranked by a deterministic id hash and only the first cap serve as
    negative DONORS; every image still RECEIVES its k negatives), so
    one mega-bucket of look-alike images — the skew case after a
    sloppy dedup — costs O(bucket · cap), not O(bucket²). Run
    keep_best_images first; the cap is the backstop, not the plan.
    Output: (image_id, rank, neg_image_id, neg_alignment), rank 1..k
    by descending alignment, ties broken by ascending donor id.
    """
    from .dedup import simhash64

    if k < 1:
        raise ValueError("k must be >= 1")
    if not 1 <= prefix_bits <= 63:
        raise ValueError("prefix_bits must be in 1..63")

    def kernel(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    phash_col: pdf[phash_col],
                    "caption_sig": simhash64(pdf[caption_col]),
                }
            )

    sigs = tiles.select(id_col, caption_col, phash_col).mapInPandas(
        kernel, f"{id_col} string, {phash_col} long, caption_sig long"
    )
    bucket = F.shiftright(F.col(phash_col), 64 - prefix_bits)
    sigs = sigs.withColumn("_hn_bucket", bucket)

    donors = sigs.select(
        F.col(id_col).alias("neg_image_id"),
        F.col("caption_sig").alias("neg_sig"),
        "_hn_bucket",
    )
    if bucket_cap is not None:
        # md5 order = deterministic pseudo-random donor choice that any
        # engine reproduces (same portability rationale as DSIR's
        # md5-prefix buckets); id tie-break for the (improbable) collision
        wcap = Window.partitionBy("_hn_bucket").orderBy(
            F.md5(F.col("neg_image_id")), F.col("neg_image_id")
        )
        donors = (
            donors.withColumn("_hn_rk", F.row_number().over(wcap))
            .filter(F.col("_hn_rk") <= int(bucket_cap))
            .drop("_hn_rk")
        )

    ham = F.bit_count(
        F.col(phash_col).bitwiseXOR(F.col("neg_sig"))
    ).cast("int")
    pairs = (
        sigs.join(donors, "_hn_bucket")
        .filter(F.col(id_col) != F.col("neg_image_id"))
        .withColumn(
            "neg_alignment",
            F.round(F.lit(1.0) - ham * 2.0 / 64.0, 6),
        )
    )
    wtop = Window.partitionBy(id_col).orderBy(
        F.col("neg_alignment").desc(), F.col("neg_image_id").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(wtop))
        .filter(F.col("rank") <= int(k))
        .select(id_col, "rank", "neg_image_id", "neg_alignment")
    )


def frame_sample(tiles_meta: DataFrame, every_k: int = 2) -> DataFrame:
    """Sample every k-th observation per (tile, year) 'clip' — pure
    relational (dense_rank over obs), no decode: pruning before decode is
    the point at 100 TB."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("tile_x", "tile_y", "year").orderBy("obs")
    return (
        tiles_meta.withColumn("frame_idx", F.row_number().over(w) - 1)
        .filter(F.col("frame_idx") % every_k == 0)
    )


def audio_features(
    blobs: DataFrame,
    id_col: str = "audio_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """WAV (16-bit PCM) audio feature extraction: duration, RMS level,
    zero-crossing rate, spectral centroid (rfft magnitude-weighted mean
    frequency) — the standard cheap audio-quality/energy features for
    corpus filtering. Pure numpy decode (codecs/wav.py, spec-level RIFF
    walker); one Arrow batch in, one out; bytes never leave the
    executor. Compressed formats (mp3/ogg/aac) would slot in at the
    same decode call; their DCT/MDCT codecs stay out of scope in this
    environment."""
    from ..codecs import wav as wav_codec

    def kernel(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                x, rate = wav_codec.decode_pcm16(bytes(getattr(r, bytes_col)))
                mono = x.mean(axis=1)
                n = mono.shape[0]
                rms = float(np.sqrt(np.mean(mono**2))) if n else 0.0
                zc = (
                    float(np.mean(np.diff(np.signbit(mono)) != 0)) * rate
                    if n > 1 else 0.0
                )
                if n > 1:
                    mag = np.abs(np.fft.rfft(mono))
                    freqs = np.fft.rfftfreq(n, d=1.0 / rate)
                    tot = float(mag.sum())
                    centroid = float((freqs * mag).sum() / tot) if tot > 0 else 0.0
                else:
                    centroid = 0.0
                rows.append(
                    {
                        id_col: getattr(r, id_col),
                        "sample_rate": rate,
                        "duration_s": n / rate if rate else 0.0,
                        "rms": rms,
                        "zcr_hz": zc,
                        "spectral_centroid_hz": centroid,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "sample_rate", "duration_s", "rms",
                         "zcr_hz", "spectral_centroid_hz"],
            )

    return blobs.select(id_col, bytes_col).mapInPandas(
        kernel,
        f"{id_col} string, sample_rate int, duration_s double, rms double, "
        "zcr_hz double, spectral_centroid_hz double",
    )


def augment_images(
    tiles: DataFrame,
    crop_px: int = 0,
    hflip: bool = False,
    vflip: bool = False,
    brightness: float = 0.0,
    seed: int | None = None,
) -> DataFrame:
    """Deterministic image augmentation (training-data prep): optional
    center crop by `crop_px` per side, horizontal/vertical flip,
    additive brightness shift (clipped to the [-1, 1] tile range). With
    `seed` set, each flip is applied PER IMAGE with probability 0.5,
    decided by a hash of (image_id, seed) — reproducible across
    partitionings and runs, never by a per-task RNG.

    Decode -> transform -> re-encode inside one Arrow kernel; bytes
    never leave the executor, no shuffle."""

    def kernel(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                arr = img_codec.decode_tile(bytes(r.bytes), r.fmt)
                if crop_px:
                    if 2 * crop_px >= min(arr.shape):
                        raise ValueError("crop_px exceeds image size")
                    arr = arr[crop_px:-crop_px, crop_px:-crop_px]
                if seed is None:
                    do_h, do_v = hflip, vflip
                else:
                    h = np.uint64(0)
                    for ch in f"{r.image_id}|{seed}":
                        h = (h * np.uint64(131)) + np.uint64(ord(ch))
                    do_h = hflip and bool(h & np.uint64(1))
                    do_v = vflip and bool(h & np.uint64(2))
                if do_h:
                    arr = arr[:, ::-1]
                if do_v:
                    arr = arr[::-1, :]
                if brightness:
                    arr = np.clip(arr + brightness, -1.0, 1.0).astype(np.float32)
                out.append(
                    {
                        "image_id": r.image_id,
                        "bytes": img_codec.encode_tile(np.ascontiguousarray(arr), r.fmt),
                        "w": arr.shape[1], "h": arr.shape[0], "fmt": r.fmt,
                    }
                )
            yield pd.DataFrame(out, columns=["image_id", "bytes", "w", "h", "fmt"])

    return tiles.select("image_id", "bytes", "fmt").mapInPandas(
        kernel, "image_id string, bytes binary, w int, h int, fmt string"
    )
