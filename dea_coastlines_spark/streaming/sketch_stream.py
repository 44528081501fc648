"""Streaming HyperLogLog: continuous distinct-count estimation over an
event stream.

The HLL register table is mergeable state (max over (group, bucket)),
which makes it the textbook streaming aggregate: each micro-batch's
registers fold into the running register table with the SAME max that
merges corpus shards in batch (tests/test_sketch.py pins shard-merge ==
union).  The stream therefore converges to the batch sketch exactly —
estimate INCLUDED, because the estimate is a pure function of the
registers — regardless of how the input is micro-batched.  State is
O(groups x 2^p) forever: no watermark needed, no unbounded keyspace.

Implementation: file-source stream -> foreachBatch { register-fold the
micro-batch (the batch kernel), merge into the running register store,
rewrite the tiny estimates table }.  foreachBatch + idempotent
overwrite of the store gives exactly-once per the same contract as
streaming/incremental.py; the store IS the checkpointable lineage
(registers are idempotent under re-merge of a replayed batch — max is
idempotent, the property that makes HLL safe under at-least-once)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sketch import hll_distinct, hll_registers


def _merge_registers(store_dir: str, new_regs: DataFrame) -> DataFrame:
    """Union the incoming micro-batch registers with the persisted
    store and re-take max(rho) — the shard-merge identity."""
    from pyspark.errors import AnalysisException

    spark = new_regs.sparkSession
    try:
        old = spark.read.parquet(store_dir)
    except AnalysisException:
        # path-not-found only (first batch). A broader except would
        # treat a CORRUPT store (crash mid-overwrite) as empty and
        # silently discard every prior micro-batch's registers.
        old = None
    merged = new_regs if old is None else old.unionByName(new_regs)
    return merged.groupBy("event_type", "bucket").agg(F.max("rho").alias("rho"))


def start_hll_stream(
    spark: SparkSession,
    events_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    p: int = 10,
    max_files_per_trigger: int = 1,
):
    """availableNow stream folding events into the HLL register store.
    Returns the StreamingQuery; read estimates with read_estimates()."""
    schema = spark.read.parquet(events_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(events_dir)
    )

    def process_batch(batch_df, batch_id: int):
        if batch_df.isEmpty():
            return
        regs = hll_registers(batch_df, "user_id", ["event_type"], p=p)
        merged = _merge_registers(store_dir, regs).localCheckpoint(eager=True)
        # registers are max-idempotent: replaying a batch after a crash
        # re-merges to the identical store (at-least-once -> exactly-once)
        merged.write.mode("overwrite").parquet(store_dir)

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_estimates(spark: SparkSession, store_dir: str, p: int = 10) -> DataFrame:
    """Distinct-count estimates from the persisted register store —
    literally the batch sketch's register->estimate function, which is
    why stream == batch holds for the estimate, not just the state."""
    from ..operators.sketch import registers_to_estimates

    return registers_to_estimates(
        spark.read.parquet(store_dir), ["event_type"], p=p
    )
