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
median is an exact groupBy(radius, center, year) median over the long
dist table (salt-decomposition does not apply to medians — SURVEY.md §7
hard part #3 — so the unsalted key is used and AQE handles shuffle
skew); the regression is the same grouped-map UDAF as the rates stage.

ALL radii share ONE cover join: the per-radius center sets are unioned
with a radius_m column, the radius_join pads and caps PER FEATURE
(radius_col), and every downstream aggregation keys by
(radius_m, hotspot_id) — so the reference's three-iteration loop
costs one candidate join + one median shuffle + one regression
shuffle instead of three of each (r3 plan audit: 16 Exchanges / 11
Python stages for the loop; the fused plan carries one radius_join +
3 aggregation exchanges total). The trade: cover cells are sized to
the LARGEST radius, so small-radius centers see proportionally more
candidates — a linear, vectorized-refine cost, paid once, versus two
whole extra joins over the (much larger) 30 m rate-point table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import stats
from ..index import cells as _cells
from ..index.geohash import geohash_encode
from . import rates as rates_op
from .spatial_join import DEFAULT_RES, radius_join

HOTSPOT_SCHEMA = (
    "hotspot_id long, x double, y double, uid string, "
    "rate_time double, incpt_time double, sig_time double, se_time double, "
    "outl_time string, n int, radius_m double"
)


def _hotspots_impl(
    shorelines: DataFrame,
    rate_points: DataFrame,
    signed_dists: DataFrame,
    baseline_year: int,
    radii_m: tuple,
    uid_crs: str | None = None,
) -> DataFrame:
    """Shared single-plan implementation for one or many radii; output
    carries real radius_m values and the certainty flag."""
    radii = sorted({float(r) for r in radii_m}, reverse=True)

    # per-radius center sets (reference continental.py:265-269, spacing
    # r/2), unioned with the radius as a key column. centers feeds two
    # branches (the WKB feature side of the radius join and the x/y
    # join-back); persist so baseline_points' mapInPandas + shuffle
    # executes once per radius, not per branch. Bounded size:
    # ~sum_r coast_km / (r/2) rows.
    centers = None
    for r in radii:
        c = rates_op.baseline_points(
            shorelines, baseline_year, spacing=r / 2.0
        ).select(
            F.lit(r).alias("radius_m"),
            F.col("point_id").alias("hotspot_id"),
            F.col("x").alias("hx"),
            F.col("y").alias("hy"),
        )
        centers = c if centers is None else centers.unionByName(c)
    centers = centers.persist()

    # disc containment join: rate points within EACH center's OWN
    # radius. feature side = centers (smaller than the 30 m point set).
    # WKB points are built DISTRIBUTED (Arrow kernel) — no driver
    # collect, no serialization cliff at continental scale (~10^5-10^6
    # centers at radius 1 km). feat_id is "radius:hotspot" — unique
    # across the union (the same hotspot_id recurs per radius).
    from ..geometry import wkb as _wkb

    def _to_feat(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "feat_id": pdf["radius_m"].map("{:.1f}".format)
                    + ":"
                    + pdf["hotspot_id"].astype(str),
                    "geometry": [
                        _wkb.point(x, y) for x, y in zip(pdf.hx, pdf.hy)
                    ],
                    "radius_m": pdf["radius_m"].astype(float),
                }
            )

    centers_feat = centers.mapInPandas(
        _to_feat, "feat_id string, geometry binary, radius_m double"
    )

    # cover resolution scaled to the LARGEST radius: at the fixed 512 m
    # default a 10 km-radius center's padded bbox explodes to ~1,600
    # covering cells; cell edge ~r_max/2 keeps it at ~16-25 cells per
    # center with identical results (refinement is exact per-feature
    # distance). Small-radius centers cover 1-4 coarse cells each.
    res = DEFAULT_RES
    while res > 1 and _cells.cell_size_m(res) < radii[0] / 2:
        res -= 1

    # pairs feeds BOTH the per-year median join and the member-count
    # aggregation; persist so the radius join executes once. Bounded
    # size: one row per (member point, center).
    pairs = radius_join(
        rate_points.select("point_id", "x", "y"),
        centers_feat,
        radius_m=radii[0],
        res=res,
        radius_col="radius_m",
    ).select(
        "point_id",
        "radius_m",
        F.substring_index("feat_id", ":", -1).cast("long").alias("hotspot_id"),
    ).persist()

    # radius_join dedups (point, feature) pairs, so plain count(*) IS
    # the distinct member count — countDistinct would add an Expand +
    # second aggregation pass for the same number. This aggregation
    # reads the persisted slim pairs and plans its own (hotspot-keyed)
    # exchange; the join below re-clusters on point_id regardless, so
    # sharing one repartition between the two branches is impossible.
    #
    # Evaluated and rejected (r5): folding this branch into the median
    # pipeline by LEFT-joining pairs->signed_dists and recounting
    # distinct point_ids after the (radius, hotspot) repartition. The
    # point_id equi-join needs point_id clustering on both sides no
    # matter how pairs were pre-partitioned, so the restructure can
    # only ever share THIS one exchange (-1, not the -3 that would
    # justify it), while switching the join to LEFT so zero-dist
    # members still count — a null-semantics change on the verified
    # n — and growing the persisted frame by the year multiplicity.
    # Measured: the whole query runs 1.8 s at sf0.1 and this branch
    # aggregates the already-persisted slim pairs (3 int columns), a
    # few percent of that; the re-cluster on point_id is load-bearing
    # (it is the join key), not an avoidable extra shuffle.
    n_points = pairs.groupBy("radius_m", "hotspot_id").agg(
        F.count("*").alias("n")
    )

    # per (radius, hotspot, year): exact median of member-point signed
    # distances. The join clusters on point_id; ONE explicit
    # repartition on (radius_m, hotspot_id) then feeds the median
    # aggregation shuffle-free (HashPartitioning on a SUBSET of the
    # grouping keys satisfies the (radius, hotspot, year) clustering)
    # and — because the center/count joins below are broadcasts that
    # preserve partitioning — the final per-hotspot regression groupBy
    # too.
    j = pairs.join(
        signed_dists.select("point_id", "year", "dist"), "point_id"
    ).repartition("radius_m", "hotspot_id")
    med = j.groupBy("radius_m", "hotspot_id", "year").agg(
        F.median("dist").alias("med_dist")
    )

    # join-back side reads the same persisted centers (one execution of
    # the baseline_points plans across branches)
    center_xy = centers.select(
        "radius_m", "hotspot_id", F.col("hx").alias("x"), F.col("hy").alias("y")
    )
    grouped = med.join(
        F.broadcast(center_xy), ["radius_m", "hotspot_id"]
    ).join(F.broadcast(n_points), ["radius_m", "hotspot_id"])

    # batched regression: one shuffle packs each hotspot's per-year
    # medians into an array; the kernel handles thousands of hotspots
    # per invocation (same batching rationale as rates_of_change —
    # years are unique per (radius, hotspot), so the in-kernel sort is
    # exact)
    agg = grouped.groupBy("radius_m", "hotspot_id").agg(
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
                        "radius_m": float(pdf["radius_m"].iloc[i]),
                    }
                )
            yield pd.DataFrame(rows)

    out = agg.mapInPandas(kernel, HOTSPOT_SCHEMA)
    return out.withColumn(
        "certainty",
        F.when(
            F.col("n") < F.col("radius_m") / 30.0, "insufficient points"
        ).otherwise("good"),
    )


def hotspots(
    shorelines: DataFrame,
    rate_points: DataFrame,
    signed_dists: DataFrame,
    baseline_year: int,
    radius_m: float,
    uid_crs: str | None = None,
) -> DataFrame:
    """shorelines + rates points + long signed distances -> hotspot rows
    for ONE radius (reference continental.py:262-331 loop body)."""
    return _hotspots_impl(
        shorelines, rate_points, signed_dists, baseline_year,
        (radius_m,), uid_crs,
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
    """The reference's per-radius hotspot loop (continental.py:262) as
    ONE fused plan: all radii share a single per-feature-radius cover
    join and single median/count/regression aggregations keyed by
    (radius_m, hotspot_id), with a radius_m column and WMS fields
    attached (see the module docstring for the plan accounting).

    The three inputs are typically the tails of expensive pipelines
    (raster->vector shorelines, transect rates); persist them once so
    the center-generation branches and the join read materialized
    tables. MEMORY_AND_DISK default keeps this spill-safe at
    continental scale."""
    shorelines = shorelines.persist()
    rate_points = rate_points.persist()
    signed_dists = signed_dists.persist()
    return with_wms_fields(
        _hotspots_impl(
            shorelines, rate_points, signed_dists, baseline_year, radii_m
        )
    )
