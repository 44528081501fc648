"""Validation stage: survey transects x annual shorelines -> error
stats — the engine's version of reference entry point 4
(`python -m coastlines.validation`):

    survey rows -> per-(year, id) aggregate          (validation.py:2294-2303)
    -> equi join to shorelines on year               (validation.py:2322-2324)
    -> transect ∩ shoreline intersection point       (validation.py:2327-2336)
      (drop ambiguous multi-crossings, as the reference drops
       MultiPoint intersections)
    -> error_m = surveyed chainage − engine chainage (validation.py:2367)
    -> bias / MAE / RMSE / stdev / corr / n          (validation.py:109-146)

Transects are the small side (a survey has dozens of profiles) and are
broadcast; shorelines stream. The intersection kernel is a vectorized
segment-grid test per (transect, year-shoreline) pair.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..geometry import algorithms as ga
from ..geometry import wkb


def transect_chainages(
    transects: DataFrame,
    shorelines: DataFrame,
    transect_id: str = "id",
) -> DataFrame:
    """(transect x year) -> chainage of the shoreline crossing along the
    transect. Transects: (id, geometry WKB LineString); shorelines:
    (year, geometry WKB LineString/MultiLineString, ...).

    Output: (id, year, chainage_m, n_crossings); rows with
    n_crossings != 1 are kept but flagged — callers filter exactly like
    the reference drops MultiPoint rows."""
    spark = transects.sparkSession
    t_pdf = transects.select(transect_id, "geometry").toPandas()
    t_lines = [wkb.parse(bytes(g))[1] for g in t_pdf["geometry"]]
    for g in t_pdf["geometry"]:
        if wkb.geom_type(bytes(g)) != wkb.LINESTRING:
            raise ValueError("transects must be LineStrings")
    t_ids = t_pdf[transect_id].tolist()
    # per-transect bboxes, vectorized once: each shoreline part then
    # tests ALL transects with four numpy comparisons and only the
    # overlapping few pay the segment-intersection loop. Keeps the
    # kernel near-linear for generated networks (one transect per
    # `interval` m of coastline), not just hand-digitised survey sets.
    # The transect table itself stays a driver-side broadcast — fine to
    # ~10^6 transects (a continent at 200 m spacing); beyond that, pair
    # tiles to transects with the cell-cover join in spatial_join.py
    # and run this kernel per pair group.
    if t_lines:
        _tb = np.array(
            [
                [l[:, 0].min(), l[:, 1].min(), l[:, 0].max(), l[:, 1].max()]
                for l in t_lines
            ]
        )
    else:
        _tb = np.zeros((0, 4))

    out_schema = f"{transect_id} string, year int, chainage_m double"

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            # accumulate crossings per (transect, year) across ALL
            # shoreline rows in the batch (a year's shoreline may be
            # split across tiles)
            acc: dict[tuple, list[float]] = {}
            for i in range(len(pdf)):
                year = int(pdf["year"].iloc[i])
                t, payload = wkb.parse(bytes(pdf["geometry"].iloc[i]))
                parts = payload if t == wkb.MULTILINESTRING else [payload]
                for part in parts:
                    px0, py0 = part[:, 0].min(), part[:, 1].min()
                    px1, py1 = part[:, 0].max(), part[:, 1].max()
                    cand = np.nonzero(
                        (_tb[:, 0] <= px1)
                        & (_tb[:, 2] >= px0)
                        & (_tb[:, 1] <= py1)
                        & (_tb[:, 3] >= py0)
                    )[0]
                    for k in cand:
                        tid, tline = t_ids[k], t_lines[k]
                        pts = ga.polyline_polyline_intersections(tline, part)
                        if len(pts):
                            ch = ga.chainage_along(tline, pts)
                            acc.setdefault((tid, year), []).extend(ch.tolist())
            if acc:
                rows = []
                for (tid, year), chs in sorted(acc.items()):
                    for c in sorted(set(round(c, 9) for c in chs)):
                        rows.append(
                            {transect_id: tid, "year": year, "chainage_m": c}
                        )
                yield pd.DataFrame(rows)

    partial = shorelines.select("year", "geometry").mapInPandas(kernel, out_schema)
    # Emit ONE row per distinct crossing chainage and dedupe GLOBALLY:
    # the same physical crossing can be seen by two batches (a shoreline
    # clipped at a tile seam shares the crossing point with both tiles),
    # and summing per-batch counts would double-count it — making the
    # n_crossings==1 filter drop valid rows AND vary with partitioning.
    return (
        partial.groupBy(transect_id, "year")
        .agg(
            F.min("chainage_m").alias("chainage_m"),
            F.count_distinct("chainage_m").cast("int").alias("n_crossings"),
        )
    )


def survey_yearly(survey: DataFrame, transect_id: str = "id") -> DataFrame:
    """Per-(year, id) survey aggregate: median surveyed chainage + count
    (validation.py:2294-2303: mode/median/count per group)."""
    return (
        survey.withColumn("year", F.year("date").cast("int"))
        .groupBy(transect_id, "year")
        .agg(
            F.median("distance").alias("surveyed_m"),
            F.count("*").alias("n_surveys"),
        )
    )


def validation_errors(
    survey: DataFrame,
    transects: DataFrame,
    shorelines: DataFrame,
    transect_id: str = "id",
) -> DataFrame:
    """Join surveyed chainage to engine chainage per (transect, year);
    error_m = survey − engine (validation.py:2367: `val_dist −
    deacl_dist`; positive = surveyed shoreline further along the
    transect than the engine's)."""
    engine = transect_chainages(transects, shorelines, transect_id).filter(
        F.col("n_crossings") == 1
    )
    surveyed = survey_yearly(survey, transect_id)
    return (
        surveyed.join(engine, [transect_id, "year"])
        .select(
            transect_id,
            "year",
            "surveyed_m",
            "chainage_m",
            (F.col("surveyed_m") - F.col("chainage_m")).alias("error_m"),
            "n_surveys",
        )
    )


def validation_stats(errors: DataFrame, by: list[str] | None = None) -> DataFrame:
    """deacl_val_stats (validation.py:109-146): n, bias, MAE, RMSE,
    stdev, Pearson corr — all built-in JVM aggregates."""
    g = errors.groupBy(*by) if by else errors.groupBy()
    return g.agg(
        F.count("*").alias("n"),
        F.round(F.avg("error_m"), 6).alias("bias"),
        F.round(F.avg(F.abs(F.col("error_m"))), 6).alias("mae"),
        F.round(F.sqrt(F.avg(F.pow(F.col("error_m"), 2))), 6).alias("rmse"),
        F.round(F.stddev("error_m"), 6).alias("stdev"),
        # Pearson corr as try_divide(covar, sx*sy): F.corr throws
        # DIVIDE_BY_ZERO under ANSI when either series is constant
        # (e.g. a perfectly stable shoreline); SQL corr returns NULL
        # there — match that.
        F.round(
            F.try_divide(
                F.covar_samp("surveyed_m", "chainage_m"),
                F.stddev("surveyed_m") * F.stddev("chainage_m"),
            ),
            6,
        ).alias("corr"),
    )


def transect_rates(
    transects: DataFrame,
    shorelines: DataFrame,
    initial_year: int,
    distributed: bool | str = "auto",
    cell_res: int = 12,
) -> DataFrame:
    """End-to-end validation-network rates: generated transects
    (operators/transects.py output) x annual shorelines -> one chainage
    per (transect, year) -> robust change_regress rates per transect —
    the reference's full transect workflow (validation.py:372-460
    network construction + the vector.py:967-1055 regression applied
    along it).

    Only clean single-crossing rows feed the regression
    (n_crossings == 1, the reference's MultiPoint drop). point_id for
    the rates kernel is a 64-bit hash of the transect key; the readable
    key is joined back onto the result (broadcast — the key map is one
    row per transect).

    distributed: True / False / "auto" (default). True swaps the
    broadcast chainage join for the cell-cover equi join
    (transect_chainages_dist) — same output, no driver-side transect
    collect — for networks past ~10^6 transects. "auto" probes the
    transect table's row count (bounded LIMIT scan, the same
    resolve_broadcast every other dual-path operator uses) and picks
    the path; the probe threshold is well under the broadcast form's
    ~10^6 comfort zone, so "auto" errs toward the always-safe plan.
    """
    from .rates import rates_of_change
    from .spatial_join import resolve_broadcast

    if distributed == "auto":
        distributed = not resolve_broadcast(
            transects, "auto", probe_rows=200_000
        )

    t = transects.select(
        F.concat_ws(
            "_", "line_id", F.col("transect_id").cast("string")
        ).alias("id"),
        "geometry",
        "x1",
        "y1",
        "x2",
        "y2",
    )
    # t feeds three branches (chainages, attrs, key map) and typically
    # sits on a generate/orient kernel chain; materialize it once
    # (lazy) instead of re-running those kernels per branch
    t = t.localCheckpoint(eager=False)
    chain = transect_chainages_dist if distributed else transect_chainages
    kw = {"res": cell_res} if distributed else {}
    ch = chain(t.select("id", "geometry"), shorelines, **kw)
    attrs = t.drop("geometry").withColumn("_tid", F.xxhash64("id"))
    # one 64-bit hash keys the regression; a collision would merge two
    # transects' observations into one bogus fit, so verify injectivity
    # up front (one O(n) agg over the transect dimension — cheap next
    # to the intersection pass). Expected collisions ~ n^2/2^65: none
    # below ~10^8 transects; the raise is the honest failure mode.
    dup = (
        attrs.groupBy("_tid")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") > 1)
        .limit(1)
        .count()
    )
    if dup:
        raise RuntimeError(
            "transect_rates: xxhash64 collision between transect ids; "
            "disambiguate ids (e.g. prefix by region) and rerun"
        )
    signed = (
        ch.filter(F.col("n_crossings") == 1)
        .join(attrs, "id")
        .select(
            F.col("_tid").alias("point_id"),
            "year",
            F.col("chainage_m").alias("dist"),
            F.pmod(
                F.degrees(
                    F.atan2(F.col("x2") - F.col("x1"), F.col("y2") - F.col("y1"))
                ),
                F.lit(360.0),
            ).alias("bearing"),
            F.col("x1").alias("x"),
            F.col("y1").alias("y"),
        )
    )
    rates = rates_of_change(signed, initial_year)
    key_map = attrs.select("id", F.col("_tid").alias("point_id"))
    return rates.join(F.broadcast(key_map), "point_id").drop("point_id")


def transect_chainages_dist(
    transects: DataFrame,
    shorelines: DataFrame,
    res: int = 12,
    transect_id: str = "id",
) -> DataFrame:
    """Distributed transect_chainages for networks too large to
    broadcast (the >10^6-transect continental case): both sides explode
    to covering grid cells (bbox polyfill, the spatial_join.py cell
    machinery), candidate (transect, shoreline-row) pairs come from ONE
    cell_id equi join, each pair pays a single polyline x polyline
    intersection in an Arrow kernel, and the same global (id, year)
    distinct-chainage dedupe the broadcast form already needs (tile
    seams) also collapses pairs that met in more than one cell — so
    duplicated candidates cost a little recompute, never a wrong count.

    Output contract identical to transect_chainages:
    (id, year, chainage_m, n_crossings) — with one domain note: the
    cell index covers the EPSG:3577-scale planar world frame
    (|coord| < 2^22 m); geometry outside it CLAMPS to the nearest edge
    cell on both sides of the cover join (it used to drop silently —
    wrong-empty output — until the r5 auto-probe made this path
    reachable without an explicit opt-in), so the exact crossing
    refine still decides and out-of-frame CRSs keep broadcast parity.
    """
    from .spatial_join import _rebatched, explode_polygons_to_cells

    t_cells = explode_polygons_to_cells(
        transects.select(transect_id, "geometry"), res
    ).withColumnRenamed("geometry", "_tg")
    s_cells = explode_polygons_to_cells(
        shorelines.select("year", "geometry"), res
    ).withColumnRenamed("geometry", "_sg")
    pairs = t_cells.join(s_cells, "cell_id").drop("cell_id")

    tid_type = next(
        f.dataType.simpleString()
        for f in transects.schema.fields
        if f.name == transect_id
    )
    out_schema = f"`{transect_id}` {tid_type}, year int, chainage_m double"

    def kernel(batches):
        for pdf in batches:
            rows = []
            # parse each distinct geometry ONCE per batch: a shoreline
            # row paired with hundreds of transects (and vice versa in
            # dense cells) must not re-parse per pair row — same
            # rationale as _points_in_polygons_dist's group-by-geometry
            t_cache: dict[bytes, np.ndarray] = {}
            s_cache: dict[bytes, list] = {}
            for tg, sg, tid, year in zip(
                pdf["_tg"], pdf["_sg"], pdf[transect_id], pdf["year"]
            ):
                tg, sg = bytes(tg), bytes(sg)
                tline = t_cache.get(tg)
                if tline is None:
                    t, tline = wkb.parse(tg)
                    if t != wkb.LINESTRING:
                        raise ValueError("transects must be LineStrings")
                    t_cache[tg] = tline
                parts = s_cache.get(sg)
                if parts is None:
                    t, payload = wkb.parse(sg)
                    raw = payload if t == wkb.MULTILINESTRING else [payload]
                    # per-part bbox, computed once, prunes transects
                    # that share a cell but not an extent (same filter
                    # the broadcast form applies)
                    parts = [
                        (
                            p,
                            p[:, 0].min(), p[:, 1].min(),
                            p[:, 0].max(), p[:, 1].max(),
                        )
                        for p in raw
                    ]
                    s_cache[sg] = parts
                tb = (
                    tline[:, 0].min(), tline[:, 1].min(),
                    tline[:, 0].max(), tline[:, 1].max(),
                )
                for part, px0, py0, px1, py1 in parts:
                    if px0 > tb[2] or px1 < tb[0] or py0 > tb[3] or py1 < tb[1]:
                        continue
                    pts = ga.polyline_polyline_intersections(tline, part)
                    if len(pts):
                        for c in ga.chainage_along(tline, pts):
                            rows.append(
                                {
                                    transect_id: tid,
                                    "year": int(year),
                                    "chainage_m": round(float(c), 9),
                                }
                            )
            yield pd.DataFrame(
                rows, columns=[transect_id, "year", "chainage_m"]
            )

    # rebatch to a 64k-row vectorization floor: one Python crossing per
    # 64k pair rows even when upstream hands smaller Arrow batches
    partial = pairs.mapInPandas(
        lambda it: kernel(_rebatched(it)), out_schema
    )
    return partial.groupBy(transect_id, "year").agg(
        F.min("chainage_m").alias("chainage_m"),
        F.count_distinct("chainage_m").cast("int").alias("n_crossings"),
    )
