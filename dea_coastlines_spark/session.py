"""SparkSession factory with the engine's tuned defaults.

Scale notes (100 TB / 1000-executor design):
  * AQE on — runtime coalesce + skew-join splitting for shuffle-size
    skew; compute skew on dense coastal cells is handled separately by
    explicit salting (operators/spatial_join.py).
  * Arrow on — every Python kernel crosses the JVM<->Python boundary in
    columnar Arrow batches, never row-at-a-time pickling.
  * shuffle.partitions default matches local core count; on a real
    cluster this is set to 2-3x total cores by spark-submit conf.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Default local parallelism: honors the driver's $SPARK_GRAFT_CPUS.
DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "dea-coastlines-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults applied."""
    n = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{n}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
        .config("spark.sql.parquet.filterPushdown", "true")
        # small-file splits: narrow Python-kernel stages (distance
        # refine, decode) inherit scan partitioning — a single 20 MB
        # file must not serialize a 32-core kernel stage. At cluster
        # scale inputs have thousands of splits and this is a no-op.
        .config("spark.sql.files.maxPartitionBytes", str(8 * 1024 * 1024))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
