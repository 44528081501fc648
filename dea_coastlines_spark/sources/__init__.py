"""Sources & sinks: Iceberg-style snapshot tables (manifest pruning,
time travel, partition overwrite), the tile-corpus source/sink, and
schema'd flat-file scans (SURVEY.md §2.1)."""

from .files import (  # noqa: F401
    read_csv_survey,
    read_csv_survey_dms,
    write_geojson,
)
from .table import SnapshotTable  # noqa: F401
from .tiles import read_tiles, with_tile_meta, write_tiles  # noqa: F401
