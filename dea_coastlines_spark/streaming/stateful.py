"""Custom stateful streaming operators (applyInPandasWithState) and
late-data watermark handling — Structured Streaming surface beyond the
reference's pure-batch model (SURVEY.md §2.10).

Two operators:

* `running_composite_stats` — per-(tile, year) RUNNING pixelwise
  composite maintained in group state as new observations stream in.
  Mean/std/count are sum-decomposable, so state is three per-pixel
  accumulator arrays (n, sum, sumsq; ~3 x 8 B/px) and each micro-batch
  folds its observations in and emits the updated provisional
  composite. The reference's MEDIAN composite (raster.py:379-384) is
  deliberately NOT maintained this way: a median is not decomposable —
  exact medians come from the batch/foreachBatch recompute path
  (streaming/incremental.py), and this operator serves the low-latency
  provisional view. This split (streaming provisional mean, batch
  exact median) is the standard lambda shape for non-decomposable aggs.

* `windowed_obs_counts` — event-time windowed counts with a watermark:
  observation timestamps derived from caption (year, obs), late rows
  beyond the watermark horizon dropped by the engine. Models the
  "acquisitions keep landing" update regime (reference README.md:27)
  with real late-data semantics instead of full recompute.

State size at scale: one (tile, year) group holds 3 float64 planes of
one tile (~1.6 MB at 256^2) — bounded per key and spillable by the
state store; keys expire via processing-time timeout once a year's
acquisitions stop arriving.
"""

from __future__ import annotations

from typing import Any, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..codecs import image as img_codec
from ..codecs import tiff
from ..operators import composite as comp_op

RUNNING_OUTPUT_SCHEMA = (
    "tile_x int, tile_y int, year int, n_obs long, "
    "mean_bytes binary, std_bytes binary, w int, h int"
)
# per-pixel accumulators packed as raw little-endian buffers
RUNNING_STATE_SCHEMA = (
    "n_obs long, w int, h int, cnt binary, s binary, s2 binary"
)


def running_composite_stats(
    obs: DataFrame,
    timeout_minutes: int | None = None,
) -> DataFrame:
    """obs: STREAMING DataFrame of raw tile rows (input_hint schema).
    Returns the update-mode stream of provisional composites."""
    meta = comp_op.with_caption(obs)

    def update(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        tile_x, tile_y, year = key
        if state.hasTimedOut:
            state.remove()
            return
        cnt = s = s2 = None
        n_obs, w, h = 0, 0, 0
        if state.exists:
            n_obs, w, h, cnt_b, s_b, s2_b = state.get
            cnt = np.frombuffer(bytes(cnt_b), np.int32).reshape(h, w).copy()
            s = np.frombuffer(bytes(s_b), np.float64).reshape(h, w).copy()
            s2 = np.frombuffer(bytes(s2_b), np.float64).reshape(h, w).copy()
        for pdf in pdfs:
            for b, fmt in zip(pdf["bytes"], pdf["fmt"]):
                img = img_codec.decode_tile(bytes(b), fmt)
                if cnt is None:
                    h, w = img.shape
                    cnt = np.zeros((h, w), np.int32)
                    s = np.zeros((h, w), np.float64)
                    s2 = np.zeros((h, w), np.float64)
                finite = np.isfinite(img)
                x = np.where(finite, img.astype(np.float64), 0.0)
                cnt += finite
                s += x
                s2 += x * x
                n_obs += 1
        if cnt is None:
            return
        state.update(
            (n_obs, w, h, cnt.tobytes(), s.tobytes(), s2.tobytes())
        )
        if timeout_minutes is not None:
            state.setTimeoutDuration(timeout_minutes * 60 * 1000)
        nf = cnt.astype(np.float64)
        with np.errstate(all="ignore"):
            mean = (s / nf).astype(np.float32)
            var = (s2 - s * s / nf) / (nf - 1)
            std = np.sqrt(np.maximum(var, 0.0)).astype(np.float32)
        mean[cnt == 0] = np.nan
        std[cnt < 2] = np.nan
        yield pd.DataFrame(
            [
                {
                    "tile_x": int(tile_x),
                    "tile_y": int(tile_y),
                    "year": int(year),
                    "n_obs": int(n_obs),
                    "mean_bytes": tiff.encode_f32(mean),
                    "std_bytes": tiff.encode_f32(std),
                    "w": int(w),
                    "h": int(h),
                }
            ]
        )

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_minutes is not None
        else GroupStateTimeout.NoTimeout
    )
    return meta.groupBy("tile_x", "tile_y", "year").applyInPandasWithState(
        update,
        outputStructType=RUNNING_OUTPUT_SCHEMA,
        stateStructType=RUNNING_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )


def windowed_obs_counts(
    obs: DataFrame, watermark: str = "30 days", window: str = "90 days"
) -> DataFrame:
    """Event-time windowed observation counts per tile with late-data
    handling: rows later than the watermark horizon are dropped by the
    engine, windows finalize (append mode capable) once the watermark
    passes their end."""
    meta = comp_op.with_caption(obs)
    # deterministic event time from the caption: Jan 1 of the capture
    # year + obs-index days (the corpus has no wall-clock timestamps)
    ts = F.to_timestamp(F.format_string("%d-01-01", F.col("year"))) + (
        F.col("obs") * F.expr("INTERVAL 1 DAY")
    )
    evts = meta.withColumn("obs_ts", ts).withWatermark("obs_ts", watermark)
    return (
        evts.groupBy(
            F.window("obs_ts", window).alias("win"),
            "tile_x", "tile_y",
        )
        .agg(F.count("*").alias("n_obs"))
        .select(
            "tile_x", "tile_y",
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "n_obs",
        )
    )
