"""Continental hotspots stage (coastlines/continental.py:262-331):
moving-window coastal-change summary points.

Reference flow per radius r in {10000, 5000, 1000}:
  centers = points_on_line(shorelines[baseline], spacing=r/2)   :265-269
  buffer(r) + sjoin(within) rate points                         :272-283
  groupby(center).median() of annual distances                  :276-287
  change_regress on the median dists -> rate/sig/se/outliers    :294-304
  n = points in buffer; n < r/30 -> 'insufficient points'       :319-323
  geohash uid precision 11                                      :326-331

Spark shape: the buffer+sjoin is the engine's radius_join (distance <=
r == containment in the disc buffer — no polygon materialization); the
median is an exact groupBy(center, year) median over the long dist
table (salt-decomposition does not apply to medians — SURVEY.md §7 hard
part #3 — so the unsalted key is used and AQE handles shuffle skew);
the regression is the same grouped-map UDAF as the rates stage.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import stats
from ..index.geohash import geohash_encode
from . import rates as rates_op
from .spatial_join import DEFAULT_RES, radius_join

HOTSPOT_SCHEMA = (
    "hotspot_id long, x double, y double, uid string, "
    "rate_time double, incpt_time double, sig_time double, se_time double, "
    "outl_time string, n int, radius_m double"
)


def hotspots(
    shorelines: DataFrame,
    rate_points: DataFrame,
    signed_dists: DataFrame,
    baseline_year: int,
    radius_m: float,
    uid_crs: str | None = None,
) -> DataFrame:
    """shorelines + rates points + long signed distances -> hotspot rows."""
    centers = rates_op.baseline_points(
        shorelines, baseline_year, spacing=radius_m / 2.0
    ).select(
        F.col("point_id").alias("hotspot_id"),
        F.col("x").alias("hx"),
        F.col("y").alias("hy"),
    )

    # centers feeds two branches (the WKB feature side of the radius
    # join and the x/y join-back); persist so baseline_points'
    # mapInPandas + shuffle executes once, not per branch. The frame is
    # bounded (~coast_km / (radius/2) rows), so the pinned cache is
    # small; it lives until the session ends or the caller clears it.
    centers = centers.persist()

    # disc containment join: rate points within radius of each center.
    # feature side = centers (smaller than the 30 m point set). WKB
    # points are built DISTRIBUTED (Arrow kernel) — no driver collect,
    # no serialization cliff at continental scale (~10^5-10^6 centers
    # at radius 1 km; reference continental.py:265-269).
    from ..geometry import wkb as _wkb

    def _to_feat(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "feat_id": pdf["hotspot_id"].astype(str),
                    "geometry": [
                        _wkb.point(x, y) for x, y in zip(pdf.hx, pdf.hy)
                    ],
                }
            )

    centers_feat = centers.mapInPandas(_to_feat, "feat_id string, geometry binary")
    # cover resolution scaled to the radius: at the fixed 512 m default
    # a 10 km-radius center's padded bbox explodes to ~1,600 covering
    # cells; cell edge ~radius/2 keeps it at ~16-25 cells per center
    # with identical results (refinement is exact distance)
    from ..index import cells as _cells

    res = DEFAULT_RES
    while res > 1 and _cells.cell_size_m(res) < radius_m / 2:
        res -= 1
    # pairs feeds BOTH the per-year median and the member-count branch;
    # unpersisted, the whole radius join (cell cover + refine kernel)
    # executes twice. Bounded size: one row per (member point, center).
    pairs = radius_join(
        rate_points.select("point_id", "x", "y"),
        centers_feat,
        radius_m=radius_m,
        res=res,
    ).select(
        "point_id", F.col("feat_id").cast("long").alias("hotspot_id")
    ).persist()

    # per (hotspot, year): exact median of member-point signed distances.
    # One explicit repartition on hotspot_id feeds BOTH aggregations
    # below shuffle-free: HashPartitioning(hotspot_id) satisfies the
    # (hotspot_id, year) grouping (subset rule) and — because the
    # center/count joins are broadcasts that preserve partitioning —
    # the final per-hotspot regression groupBy too. Three aggregation
    # exchanges collapse into this one.
    j = pairs.join(
        signed_dists.select("point_id", "year", "dist"), "point_id"
    ).repartition("hotspot_id")
    med = j.groupBy("hotspot_id", "year").agg(
        F.median("dist").alias("med_dist")
    )
    # radius_join dedups (point, feature) pairs, so plain count(*) IS
    # the distinct member count — countDistinct would add an Expand +
    # second aggregation pass for the same number
    n_points = pairs.groupBy("hotspot_id").agg(F.count("*").alias("n"))

    # join-back side reads the same persisted centers (one execution of
    # the baseline_points plan across both branches)
    center_xy = centers.select(
        "hotspot_id", F.col("hx").alias("x"), F.col("hy").alias("y")
    )
    grouped = med.join(F.broadcast(center_xy), "hotspot_id").join(
        F.broadcast(n_points), "hotspot_id"
    )

    # batched regression: one shuffle packs each hotspot's per-year
    # medians into an array; the kernel handles thousands of hotspots
    # per invocation (same batching rationale as rates_of_change —
    # years are unique per hotspot, so the in-kernel sort is exact)
    agg = grouped.groupBy("hotspot_id").agg(
        F.first("x").alias("x"),
        F.first("y").alias("y"),
        F.first("n").alias("n"),
        F.collect_list(F.struct("year", "med_dist")).alias("obs"),
    )

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            xs = pdf["x"].to_numpy(float)
            ys = pdf["y"].to_numpy(float)
            lat, lon = rates_op._uid_lonlat(xs, ys, uid_crs)
            uids = geohash_encode(lat, lon, 11)
            rows = []
            for i, obs in enumerate(pdf["obs"]):
                years = np.array([o["year"] for o in obs], np.int64)
                order = np.argsort(years, kind="stable")
                years = years[order]
                dists = np.array([o["med_dist"] for o in obs], float)[order]
                reg = stats.change_regress(dists, years, years)
                rows.append(
                    {
                        "hotspot_id": int(pdf["hotspot_id"].iloc[i]),
                        "x": float(xs[i]), "y": float(ys[i]), "uid": uids[i],
                        "rate_time": reg["slope"], "incpt_time": reg["intercept"],
                        "sig_time": reg["pvalue"], "se_time": reg["stderr"],
                        "outl_time": reg["outliers"],
                        "n": int(pdf["n"].iloc[i]),
                        "radius_m": float("nan"),
                    }
                )
            yield pd.DataFrame(rows)

    out = agg.mapInPandas(kernel, HOTSPOT_SCHEMA)
    return out.withColumn("radius_m", F.lit(radius_m)).withColumn(
        "certainty",
        F.when(F.col("n") < radius_m / 30.0, "insufficient points").otherwise("good"),
    )


def with_wms_fields(df: DataFrame) -> DataFrame:
    """Display fields for the WMS/TerriaJS visualisation
    (wms_fields, continental.py:29-54): abs rate, 1.96*se confidence,
    grew/retreated flags, significance, good-certainty flag."""
    return df.select(
        "*",
        F.abs(F.col("rate_time")).alias("wms_abs"),
        (F.col("se_time") * 1.96).alias("wms_conf"),
        # NOT inverted: reference continental.py:49-50 defines
        # wms_grew = rate_time < 0. Distances are signed relative to
        # the (recent) baseline year with positive = seaward, so past
        # shorelines seaward of the baseline (positive dist, positive
        # slope over time) mean the coast RETREATED to the baseline.
        (F.col("rate_time") < 0).alias("wms_grew"),
        (F.col("rate_time") > 0).alias("wms_retr"),
        (F.col("sig_time") <= 0.01).alias("wms_sig"),
        (F.col("certainty") == "good").alias("wms_good"),
    )


def continental_hotspots(
    shorelines: DataFrame,
    rate_points: DataFrame,
    signed_dists: DataFrame,
    baseline_year: int,
    radii_m: tuple = (10000.0, 5000.0, 1000.0),
) -> DataFrame:
    """The reference's per-radius hotspot loop (continental.py:262):
    one unioned table with a radius_m column, WMS fields attached.

    The three inputs are typically the tails of expensive pipelines
    (raster->vector shorelines, transect rates); without pinning, each
    radius re-derives all of them — 3x the upstream plan (r2 plan audit:
    30 Exchanges / 30 Python stages). Persist them once so every radius
    branch reads the materialized tables; output is byte-identical
    (pinned by tests), the plan collapses to ~1x upstream + 3 cheap
    radius branches. MEMORY_AND_DISK default keeps this spill-safe at
    continental scale."""
    shorelines = shorelines.persist()
    rate_points = rate_points.persist()
    signed_dists = signed_dists.persist()
    out = None
    for r in radii_m:
        h = with_wms_fields(
            hotspots(shorelines, rate_points, signed_dists, baseline_year, r)
        )
        out = h if out is None else out.unionByName(h)
    return out
