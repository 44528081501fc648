"""Tile-corpus source/sink over the snapshot table.

The input table is exactly `input_hint`'s shape:
    tiles(image_id string, bytes binary, w int, h int, fmt string,
          caption string, phash bigint)

`caption` is a JSON string carrying {tile_x, tile_y, year, obs, crs,
transform, ...} — the metadata the reference recovers from GeoTIFF file
paths (coastlines/vector.py:113-132). The sink parses it ONCE with
JVM-side `from_json` and materializes `cell_id` + `year` as partition
columns, so every downstream read prunes at the manifest (the Spark
analog of the reference's per-tile CLI dispatch + filename-year parse).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..index.cells_expr import cell_id_expr
from .table import SnapshotTable

# single caption parse schema for the whole engine — a second copy here
# had already drifted (this one had `kind`, composite's did not)
from ..operators.composite import CAPTION_SCHEMA  # noqa: E402


def with_tile_meta(tiles: DataFrame, res: int = 10) -> DataFrame:
    """Parse caption (JVM from_json — no Python) and attach
    (tile_x, tile_y, year, cell_id). cell_id indexes the image's
    top-left corner (GDAL transform origin) at quadtree res `res` —
    coarse cells so one cell spans a few tiles (partition granularity,
    not join granularity)."""
    t = tiles.withColumn("_m", F.from_json("caption", CAPTION_SCHEMA))
    t = t.select(
        "*",
        F.col("_m.tile_x").alias("tile_x"),
        F.col("_m.tile_y").alias("tile_y"),
        F.col("_m.year").alias("year"),
        F.col("_m.transform").getItem(2).alias("_x0"),
        F.col("_m.transform").getItem(5).alias("_y0"),
    ).drop("_m")
    return t.withColumn(
        "cell_id", cell_id_expr(F.col("_x0"), F.col("_y0"), res)
    ).drop("_x0", "_y0")


def write_tiles(
    tiles: DataFrame, path: str, res: int = 10, mode: str = "create"
) -> SnapshotTable:
    """Sink: tiles -> snapshot table partitioned by (cell_id, year)."""
    table = SnapshotTable(tiles.sparkSession, path)
    enriched = with_tile_meta(tiles, res)
    if mode == "create":
        table.create(enriched, partition_by=["cell_id", "year"])
    elif mode == "append":
        table.append(enriched)
    elif mode == "overwrite_partitions":
        table.overwrite_partitions(enriched)
    else:
        raise ValueError(mode)
    return table


def read_tiles(
    spark: SparkSession,
    path: str,
    years: object | None = None,
    cells_filter: object | None = None,
    snapshot: int | None = None,
) -> DataFrame:
    """Source with manifest pruning: years/cells_filter accept a value,
    list, or (lo, hi) inclusive range (bbox-pushdown analog,
    coastlines/vector.py:1413)."""
    where: dict[str, object] = {}
    if years is not None:
        where["year"] = years
    if cells_filter is not None:
        where["cell_id"] = cells_filter
    return SnapshotTable(spark, path).read(
        snapshot=snapshot, where=where or None
    )
