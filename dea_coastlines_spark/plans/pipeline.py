"""End-to-end shoreline pipeline plan (the flagship query).

tiles (input_hint schema)
  -> caption parse (JVM from_json)
  -> tide-window row filter           (raster.py:330-337 semantics)
  -> per-(tile, year) composite       (raster.py:379-384; one grouped map)
  -> marching-squares vectorization   (vector.py:1450-1456; one mapInPandas)
  -> shoreline rows (cell_id, year, WKB, certainty)

Two Python stages total, everything between them is Catalyst-optimized
DataFrame ops. At 100 TB the plan shape is: parquet/Iceberg scan with
(cell, year) partition pruning -> broadcast join of tide cutoffs ->
shuffle on (tile_x, tile_y, year) -> grouped map -> narrow mapInPandas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators import composite as comp_op
from ..operators import contours as cont_op
from ..operators import masking as mask_op


def shoreline_pipeline(
    tiles: DataFrame,
    apply_tide_filter: bool = True,
    gapfill: bool = False,
    min_vertices: int = 10,
) -> DataFrame:
    comps = (
        comp_op.gapfill_composites(tiles, apply_tide_filter)
        if gapfill
        else comp_op.annual_composites(tiles, apply_tide_filter)
    )
    return cont_op.shorelines(comps, min_vertices=min_vertices)


def rates_pipeline(
    tiles: DataFrame,
    baseline_year: int,
    spacing_m: float = 30.0,
    apply_tide_filter: bool = True,
    geomorphology: DataFrame | None = None,
) -> DataFrame:
    """Full rates-of-change plan: tiles -> composites -> shorelines ->
    baseline points -> annual signed distances -> regression UDAF ->
    certainty cascade (reference entry point 2, vector.py:1369-1680)."""
    from pyspark import StorageLevel

    from ..operators import rates as rates_op

    # comps feeds both vectorization and raster sampling; sl feeds both
    # baseline points and per-year nearest. Without persist, every
    # downstream branch re-executes the full decode+composite stage —
    # at corpus scale that is the whole job several times over. (The
    # reference materializes composites to GeoTIFF between its CLIs for
    # exactly this reason; CheckpointedPipeline is the durable variant.)
    comps = comp_op.annual_composites(tiles, apply_tide_filter).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    sl = cont_op.shorelines(comps).persist(StorageLevel.MEMORY_AND_DISK)
    pts = rates_op.baseline_points(sl, baseline_year, spacing_m)
    nearest = rates_op.annual_nearest(pts, sl)
    signed = rates_op.signed_distances(nearest, comps, baseline_year)
    # year list from the caption-only tile scan (column-pruned, no
    # pixels touched) — deriving it from `sl` would execute the whole
    # raster->vector stage a second time just to enumerate years
    years = [
        r.year
        for r in comp_op.with_caption(tiles).select("year").distinct().collect()
    ]
    rates = rates_op.rates_of_change(signed, initial_year=min(years))
    return rates_op.with_certainty(
        rates, n_years=len(years), baseline_year=baseline_year,
        geomorphology=geomorphology,
    )


def masked_shoreline_pipeline(
    tiles: DataFrame,
    apply_tide_filter: bool = True,
    min_vertices: int = 10,
) -> DataFrame:
    """Full reference-parity path: annual + gapfill composites ->
    contours_preprocess masking (vector.py:476-697) -> vectorization.
    One extra shuffle vs the plain path: the per-tile grouped masking
    (cross-year steps force grouping by tile)."""
    annual = comp_op.annual_composites(tiles, apply_tide_filter)
    gapfill_df = comp_op.gapfill_composites(tiles, apply_tide_filter)
    masked = mask_op.masked_composites(annual, gapfill_df)
    return cont_op.shorelines(masked, min_vertices=min_vertices)
