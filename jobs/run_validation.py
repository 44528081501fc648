"""spark-submit entrypoint: survey CSV + transects + shorelines table ->
validation error stats (reference entry point 4,
`python -m coastlines.validation`).

Transects come from a GeoJSON file of LineStrings (small, driver-read);
the survey CSV uses the schema'd scan (validation.py:2269 analog).

    spark-submit --py-files dist/dea_coastlines_spark.zip \
        jobs/run_validation.py --shorelines-table S \
        --survey-csv survey.csv --transects-geojson transects.json \
        --output stats.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--shorelines-table", required=True)
    p.add_argument("--survey-csv", required=True)
    p.add_argument(
        "--survey-format", choices=["plain", "dms"], default="plain",
        help="survey CSV layout: 'plain' = SURVEY_SCHEMA; 'dms' = "
        "offset timestamps + chainage/elevation names + DMS site "
        "coordinates (the multi-source fan-out, reference "
        "validation.py:2525 preprocessor family)",
    )
    p.add_argument(
        "--survey-tz", default=None,
        help="IANA timezone for year attribution of the dms format's "
        "offset-aware timestamps (e.g. Australia/Adelaide)",
    )
    p.add_argument("--transects-geojson", required=True)
    p.add_argument("--output", required=True, help="JSON stats file")
    args = p.parse_args(argv if argv is not None else sys.argv[1:])

    from dea_coastlines_spark.session import submit_session

    spark = submit_session("dea-coastlines-spark:validation")

    import numpy as np
    import pandas as pd

    from dea_coastlines_spark.geometry import wkb
    from dea_coastlines_spark.operators.validation import (
        validation_errors,
        validation_stats,
    )
    from dea_coastlines_spark.sources import (
        read_csv_survey,
        read_csv_survey_dms,
    )
    from dea_coastlines_spark.sources.table import SnapshotTable

    sites = None
    if args.survey_format == "dms":
        # persisted: the sites aggregation below and the validation
        # chain would otherwise each re-scan + re-parse the CSV
        survey = read_csv_survey_dms(
            spark, args.survey_csv, tz=args.survey_tz
        ).persist()
        # per-site mean position from the parsed DMS coordinates —
        # surfaces the conversion in the job output so a mis-parse is
        # visible, and gives the report a map anchor per site
        from pyspark.sql import functions as F

        sites = [
            r.asDict()
            for r in survey.groupBy("site")
            .agg(
                F.round(F.avg("lat"), 6).alias("lat"),
                F.round(F.avg("lon"), 6).alias("lon"),
            )
            .orderBy("site")
            .collect()
        ]
        survey = survey.drop("lat", "lon")
    else:
        survey = read_csv_survey(spark, args.survey_csv)
    if os.path.isdir(args.transects_geojson):
        # GeoJSONSeq directory as written by jobs/run_transects.py /
        # write_geojsonseq: newline-delimited features across part files
        feats = [
            json.loads(line)
            for r in spark.read.text(args.transects_geojson).collect()
            for line in [r[0]]
            if line.strip()
        ]
    else:
        gj = json.load(open(args.transects_geojson))
        feats = gj["features"] if gj.get("type") == "FeatureCollection" else [gj]
    transects = spark.createDataFrame(
        pd.DataFrame(
            {
                "id": [f["properties"]["id"] for f in feats],
                "geometry": [
                    wkb.linestring(np.asarray(f["geometry"]["coordinates"], float))
                    for f in feats
                ],
            }
        )
    )
    shorelines = SnapshotTable(spark, args.shorelines_table).read()
    errs = validation_errors(survey, transects, shorelines)
    overall = validation_stats(errs).collect()[0].asDict()
    per_transect = [r.asDict() for r in validation_stats(errs, by=["id"]).collect()]
    out = {"job": "validation", "overall": overall, "per_transect": per_transect}
    if sites is not None:
        out["sites"] = sites
    with open(args.output, "w") as f:
        json.dump(out, f, indent=2, default=str)
    print(json.dumps({"job": "validation", **{k: overall[k] for k in ("n", "bias", "mae", "rmse")}}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
