"""spark-submit entrypoint: tiles table -> continental hotspot layers
at multiple radii (reference entry point 3,
`python -m coastlines.continental`). The reference's ogrmerge
subprocess union is a plain unionByName here (continental.py:180-199).

    spark-submit --py-files dist/dea_coastlines_spark.zip \
        jobs/run_continental.py --tiles-table T --output O \
        --baseline-year 2000 --radii 1000,500
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--tiles-table", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--baseline-year", type=int, required=True)
    p.add_argument("--radii", default="10000,5000,1000")
    p.add_argument("--no-tide-filter", action="store_true")
    args = p.parse_args(argv if argv is not None else sys.argv[1:])

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("dea-coastlines-spark:continental")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from dea_coastlines_spark.operators import composite as comp_op
    from dea_coastlines_spark.operators import contours as cont_op
    from dea_coastlines_spark.operators import hotspots as hs_op
    from dea_coastlines_spark.operators import rates as rates_op
    from dea_coastlines_spark.sources import read_tiles
    from dea_coastlines_spark.sources.table import SnapshotTable

    tiles = read_tiles(spark, args.tiles_table)
    n_tiles = tiles.count()
    t0 = time.perf_counter()
    tide = not args.no_tide_filter
    comps = comp_op.annual_composites(tiles, tide).persist()
    sl = cont_op.shorelines(comps).persist()
    pts = rates_op.baseline_points(sl, args.baseline_year).persist()
    signed = rates_op.signed_distances(
        rates_op.annual_nearest(pts, sl), comps, args.baseline_year
    ).persist()
    radii = tuple(float(r) for r in args.radii.split(","))
    hs = hs_op.continental_hotspots(sl, pts, signed, args.baseline_year, radii)
    table = SnapshotTable(spark, args.output)
    if table.current_version() == 0:
        table.create(hs, partition_by=["radius_m"])
    else:
        table.overwrite_partitions(hs)
    n = table.read().count()
    dt = time.perf_counter() - t0
    print(json.dumps({
        "job": "continental", "n_tiles": n_tiles, "n_hotspots": n,
        "radii": list(radii), "sec": round(dt, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
