"""Extra profiling harness for the optimization rounds (bench.py is
FROZEN for measurement; this file exists for guide §1 isolation work).

Per query it reports, after a warmup pass:
  * build_s — wall time of fn(spark, sf_dir): driver-side DataFrame
    construction (plan building, any .count()/.rdd driver work the
    operator does at build time). bench.py times this INSIDE its
    per-run loop, so build cost is real headline cost.
  * exec_s  — wall time of the noop-sink write of a pre-built frame
    (guide §1.4), best of N.
  * total_s — build + one fresh build's noop write, best of N: the
    closest replica of what bench.py measures.

Usage:
  python bench_extra.py [query ...]        # default: all registry queries
  SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=... python bench_extra.py
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    repeats = int(os.environ.get("SPARK_GRAFT_EXTRA_REPEATS", "2"))

    from dea_coastlines_spark.session import get_spark

    spark = get_spark("bench_extra", cpus=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as _entry

    registry = _entry.queries()
    names = sys.argv[1:] or list(registry)
    unknown = [n for n in names if n not in registry]
    if unknown:
        raise SystemExit(f"unknown queries {unknown}")

    rows = []
    for name in names:
        fn = registry[name]
        spark.sparkContext.setJobDescription(f"warmup:{name}")
        fn(spark, sf_dir).count()  # warm (plan + scan caches)

        build_best = float("inf")
        exec_best = float("inf")
        total_best = float("inf")
        for _ in range(repeats):
            spark.sparkContext.setJobDescription(f"build:{name}")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            spark.sparkContext.setJobDescription(f"exec:{name}")
            df.write.mode("overwrite").format("noop").save()
            t2 = time.perf_counter()
            build_best = min(build_best, t1 - t0)
            exec_best = min(exec_best, t2 - t1)
            total_best = min(total_best, t2 - t0)
        spark.sparkContext.setJobDescription(None)
        rows.append(
            {
                "query": name,
                "build_s": round(build_best, 3),
                "exec_s": round(exec_best, 3),
                "total_s": round(total_best, 3),
            }
        )
        print(
            f"{name:32s} build={build_best:7.3f} exec={exec_best:7.3f} "
            f"total={total_best:7.3f}",
            file=sys.stderr,
        )

    rows.sort(key=lambda r: -r["total_s"])
    print(json.dumps({
        "sf": sf_dir.rstrip("/").split("sf")[-1],
        "cpus": cpus,
        "total_build_s": round(sum(r["build_s"] for r in rows), 3),
        "total_exec_s": round(sum(r["exec_s"] for r in rows), 3),
        "total_s": round(sum(r["total_s"] for r in rows), 3),
        "rows": rows,
    }, indent=1))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
