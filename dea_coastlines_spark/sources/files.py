"""Flat-file scans/sinks beyond the snapshot table (SURVEY.md §2.1).

* `read_csv_survey` — the validation-CSV scan analog
  (`pd.read_csv(val_path, parse_dates=["date"])`,
  coastlines/validation.py:2269): explicit schema + timestamp parsing,
  never schema inference (inference = an extra full scan at 100 TB).
* `write_geojson` — GeoJSON FeatureCollection export of a WKB-geometry
  DataFrame for parity checks against the reference's `gdf.to_file`
  sinks (coastlines/vector.py:1613-1626). Geometry decoding runs
  distributed (mapInPandas); only the final feature strings are
  collected, and the writer refuses tables above a row cap — GeoJSON is
  an exchange format for small outputs, not a data-plane sink (the
  data-plane sink is the snapshot table).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

SURVEY_SCHEMA = (
    "site string, date timestamp, distance double, z double, id string"
)


def read_csv_survey(
    spark: SparkSession,
    path: str,
    schema: str = SURVEY_SCHEMA,
    timestamp_format: str = "yyyy-MM-dd",
) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", "true")
        .option("timestampFormat", timestamp_format)
        .csv(path)
    )


def write_geojson(
    df: DataFrame,
    path: str,
    geometry_col: str = "geometry",
    max_rows: int = 100_000,
) -> int:
    """Write df (WKB geometry + attribute columns) as one GeoJSON
    FeatureCollection. Returns feature count."""
    import pandas as pd

    from ..geometry import wkb as _wkb

    attr_cols = [c for c in df.columns if c != geometry_col]

    def to_features(batches):
        for pdf in batches:
            feats = []
            for i in range(len(pdf)):
                geom = _wkb.to_geojson_dict(bytes(pdf[geometry_col].iloc[i]))
                props = {}
                for c in attr_cols:
                    v = pdf[c].iloc[i]
                    if hasattr(v, "item"):
                        v = v.item()
                    props[c] = v
                feats.append(
                    json.dumps(
                        {"type": "Feature", "geometry": geom, "properties": props},
                        sort_keys=True,
                    )
                )
            yield pd.DataFrame({"feature": feats})

    n = df.count()
    if n > max_rows:
        raise ValueError(
            f"GeoJSON export capped at {max_rows} rows (got {n}); "
            "use SnapshotTable for data-plane output"
        )
    feats = [r.feature for r in df.mapInPandas(to_features, "feature string").collect()]
    with open(path, "w") as f:
        f.write('{"type": "FeatureCollection", "features": [\n')
        f.write(",\n".join(feats))
        f.write("\n]}\n")
    return len(feats)
