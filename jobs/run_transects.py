"""spark-submit entrypoint: coastline layer -> validation transect
network (reference entry point `coastal_transects` /
`coastal_transects_parallel`, coastlines/validation.py:390-480:
simplify the coastline, cut a perpendicular transect every
`interval` m, orient each away from land, export the network).

The output composes with jobs/run_validation.py (--transects-geojson)
and with operators/validation.py:transect_rates.

    spark-submit --py-files dist/dea_coastlines_spark.zip \
        jobs/run_transects.py --coastline-geojson coast.json \
        [--land-geojson land.json] --output transects_dir \
        [--interval 200 --length 400 --buffer 20 --simplify 200]

Scale shape: simplification + transect cutting are per-line
mapInPandas passes (no shuffle); orientation broadcasts the small
land dimension; the export is the distributed GeoJSONSeq writer
(one part file per executor task — no driver collect).
"""

from __future__ import annotations

import argparse
import json
import sys


def _lines_df(spark, path: str):
    import numpy as np
    import pandas as pd

    from dea_coastlines_spark.geometry import wkb

    gj = json.load(open(path))
    feats = gj["features"] if gj.get("type") == "FeatureCollection" else [gj]
    ids, geoms = [], []
    for i, f in enumerate(feats):
        g = f["geometry"]
        props = f.get("properties") or {}
        lid = str(props.get("id", i))
        if g["type"] == "LineString":
            ids.append(lid)
            geoms.append(wkb.linestring(np.asarray(g["coordinates"], float)))
        elif g["type"] == "MultiLineString":
            # one row per part: transects are cut per connected line
            for j, part in enumerate(g["coordinates"]):
                ids.append(f"{lid}/{j}")
                geoms.append(wkb.linestring(np.asarray(part, float)))
        else:
            raise ValueError(f"coastline features must be lines, got {g['type']}")
    return spark.createDataFrame(pd.DataFrame({"line_id": ids, "geometry": geoms}))


def _polys_df(spark, path: str):
    import numpy as np
    import pandas as pd

    from dea_coastlines_spark.geometry import wkb

    gj = json.load(open(path))
    feats = gj["features"] if gj.get("type") == "FeatureCollection" else [gj]
    geoms = []
    for f in feats:
        g = f["geometry"]
        if g["type"] == "Polygon":
            rings = [np.asarray(r, float) for r in g["coordinates"]]
            geoms.append(wkb.polygon(rings[0], rings[1:]))
        elif g["type"] == "MultiPolygon":
            geoms.append(
                wkb.multipolygon(
                    [
                        wkb.polygon(
                            np.asarray(p[0], float),
                            [np.asarray(r, float) for r in p[1:]],
                        )
                        for p in g["coordinates"]
                    ]
                )
            )
        else:
            raise ValueError(f"land features must be polygons, got {g['type']}")
    return spark.createDataFrame(pd.DataFrame({"geometry": geoms}))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--coastline-geojson", required=True)
    p.add_argument("--land-geojson", default=None,
                   help="land polygons; when given, transects are "
                        "land/water filtered and oriented away from land")
    p.add_argument("--output", required=True, help="GeoJSONSeq directory")
    p.add_argument("--interval", type=float, default=200.0)
    p.add_argument("--length", type=float, default=400.0)
    p.add_argument("--buffer", type=float, default=20.0)
    p.add_argument("--simplify", type=float, default=200.0,
                   help="Douglas-Peucker tolerance; 0 disables")
    args = p.parse_args(argv if argv is not None else sys.argv[1:])

    from pyspark.sql import functions as F

    from dea_coastlines_spark.session import submit_session

    spark = submit_session("dea-coastlines-spark:transects")

    from dea_coastlines_spark.operators.transects import (
        generate_transects,
        orient_transects,
        simplify_lines,
    )
    from dea_coastlines_spark.sources.files import write_geojsonseq

    lines = _lines_df(spark, args.coastline_geojson)
    if args.simplify > 0:
        lines = simplify_lines(lines, args.simplify)
    t = generate_transects(
        lines,
        length=args.length,
        interval=args.interval,
        buffer=args.buffer,
    )
    if args.land_geojson:
        t = orient_transects(t, _polys_df(spark, args.land_geojson))
    t = t.withColumn(
        "id",
        F.concat_ws("_", "line_id", F.col("transect_id").cast("string")),
    ).select("id", "line_id", "transect_id", "dist_along", "geometry")
    n = write_geojsonseq(t, args.output)
    print(json.dumps({"job": "transects", "n_transects": n,
                      "output": args.output}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
