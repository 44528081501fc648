"""Aspect-ratio bucketing + fixed-size shard packing (image training
data export).

Diffusion/vision training jobs batch images of the SAME target
resolution, so web-scale image pipelines (the corpus shape in
BASELINE.json's input_hint: image_id/bytes/w/h/fmt/caption rows)
bucket every image to the nearest aspect ratio from a fixed ladder
(SDXL-style: all (w, h) pairs near a constant pixel budget), then pack
each bucket into fixed-size shards in a deterministic pseudo-random
order. The reference pipeline has no training-export stage; this is
part of the beyond-reference training-data suite, alongside
operators/sampling.py (same u01 hash chain, so shard order is a pure
function of (key, seed) — invariant to partitioning and re-runs).

Scale design (10^12 images):

- Bucket assignment is a row-local CASE chain over ~25 ratio
  thresholds — pure JVM expressions on the scan, zero shuffle.
- Shard COUNT per bucket needs the bucket sizes: ONE groupBy over
  <=len(ladder) keys, broadcast back (a <=40-row build side).
- Packing does NOT globally sort a bucket (a window partitioned by
  bucket alone would funnel ~10^10 rows of a popular ratio through one
  task). Instead shard = floor(u01 * n_shards_bucket) — near-equal
  Poisson(shard_size) shard sizes with no rank — and only the final
  in-shard position uses a window partitioned by (bucket, shard),
  whose partitions are bounded by ~shard_size regardless of corpus
  size. One hash shuffle on (bucket, shard) total.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from .sampling import u01, u01_sql


def ar_ladder(
    budget: int = 1024, step: int = 64, min_side: int = 512, max_side: int = 2048
) -> list[tuple[int, int]]:
    """Deterministic aspect-ratio ladder: (w, h) pairs on a `step` grid
    whose product stays near budget^2, one rung per distinct ratio,
    sorted by ratio ascending. Defaults give the familiar 25-rung
    SDXL-style ladder for a 1024^2 pixel budget."""
    rungs: dict[float, tuple[int, int]] = {}
    for w in range(min_side, max_side + 1, step):
        h = int(round(budget * budget / w / step)) * step
        h = max(min_side, min(max_side, h))
        r = w / h
        if r not in rungs:
            rungs[r] = (w, h)
    return [rungs[r] for r in sorted(rungs)]


def _thresholds(ladder: list[tuple[int, int]]) -> list[float]:
    """Decision boundaries between adjacent rungs: geometric midpoints
    in ratio space (equidistant in log-ratio, the perceptually right
    metric for aspect distortion). len == len(ladder) - 1."""
    ratios = [w / h for w, h in ladder]
    if ratios != sorted(ratios):
        raise ValueError("ladder must be sorted by ratio ascending")
    return [math.sqrt(a * b) for a, b in zip(ratios, ratios[1:])]


def assign_ar_bucket(
    df: DataFrame,
    w_col: str = "w",
    h_col: str = "h",
    ladder: list[tuple[int, int]] | None = None,
) -> DataFrame:
    """Adds (bucket_id, bucket_w, bucket_h): the ladder rung whose
    log-ratio is nearest to the image's. Row-local CASE chain —
    whole-stage codegen, no shuffle, pushes through any scan."""
    ladder = ladder or ar_ladder()
    ratio = F.col(w_col).cast("double") / F.col(h_col).cast("double")
    bucket = F.lit(len(ladder) - 1)
    # build the chain back-to-front so rung 0 wins the smallest ratios
    for i, t in reversed(list(enumerate(_thresholds(ladder)))):
        bucket = F.when(ratio < F.lit(t), F.lit(i)).otherwise(bucket)
    out = df.withColumn("bucket_id", bucket.cast("int"))
    w_map = F.element_at(F.array(*[F.lit(w) for w, _ in ladder]), F.col("bucket_id") + 1)
    h_map = F.element_at(F.array(*[F.lit(h) for _, h in ladder]), F.col("bucket_id") + 1)
    return out.withColumn("bucket_w", w_map).withColumn("bucket_h", h_map)


def ar_bucket_shards(
    df: DataFrame,
    key_col: str,
    w_col: str = "w",
    h_col: str = "h",
    shard_size: int = 1000,
    seed: int = 0,
    ladder: list[tuple[int, int]] | None = None,
) -> DataFrame:
    """Bucket by aspect ratio, then pack each bucket into
    ~shard_size-row shards in a deterministic pseudo-random order.

    Returns the input columns + (bucket_id, bucket_w, bucket_h, shard,
    pos). (shard, pos) is a pure function of (key, seed, bucket
    census): re-runs and re-partitionings produce byte-identical
    shards. Shard sizes are Poisson(shard_size)-distributed (floor of
    a uniform hash, not an exact rank) — the price of avoiding a
    global per-bucket sort; exact-size packing at 10^12 rows would
    serialize each bucket through one task.
    """
    if shard_size < 1:
        raise ValueError("shard_size must be >= 1")
    from pyspark.sql.types import NumericType

    ladder = ladder or ar_ladder()
    b = assign_ar_bucket(df, w_col, h_col, ladder)
    # u01 wants an integer key; string ids (e.g. the corpus image_id)
    # go through xxhash64 first (u01's reduce-first chain is ANSI-safe
    # for keys near Long.MAX). The DuckDB-oracled driver query uses
    # integer keys, where both engines share the u01 chain directly.
    key = (
        F.col(key_col)
        if isinstance(df.schema[key_col].dataType, NumericType)
        else F.xxhash64(key_col)
    )
    census = b.groupBy("bucket_id").agg(F.count("*").alias("_n_bucket"))
    # integer `div`, not double division: ceil(n/s) via FP can mis-round
    # when n is ~10^12 and s is large (quotient ulp exceeds 1/s)
    n_shards = F.expr(
        f"greatest((_n_bucket + {int(shard_size) - 1}) div {int(shard_size)}, 1L)"
    )
    census = census.select("bucket_id", n_shards.alias("_n_shards"))
    u = u01(key, seed)
    packed = (
        b.join(F.broadcast(census), "bucket_id")
        .withColumn("_u", u)
        .withColumn(
            "shard",
            F.least(
                F.floor(F.col("_u") * F.col("_n_shards")), F.col("_n_shards") - 1
            ).cast("int"),
        )
    )
    w = Window.partitionBy("bucket_id", "shard").orderBy("_u", key_col)
    return (
        packed.withColumn("pos", (F.row_number().over(w) - 1).cast("int"))
        .drop("_u", "_n_shards", "_n_bucket")
    )


def ar_bucket_sql(
    w_expr: str, h_expr: str, ladder: list[tuple[int, int]] | None = None
) -> tuple[str, str, str]:
    """The identical bucket assignment as ANSI SQL (DuckDB oracle
    half): returns (bucket_id_expr, bucket_w_expr, bucket_h_expr).
    Thresholds are emitted via repr() — the same shortest-round-trip
    double literal the Spark side binds, so comparisons agree
    bit-for-bit on both engines."""
    ladder = ladder or ar_ladder()
    ratio = f"(CAST({w_expr} AS DOUBLE) / CAST({h_expr} AS DOUBLE))"
    expr = str(len(ladder) - 1)
    for i, t in reversed(list(enumerate(_thresholds(ladder)))):
        expr = f"CASE WHEN {ratio} < {t!r} THEN {i} ELSE {expr} END"
    bucket = f"CAST({expr} AS INT)"
    ws = ", ".join(str(w) for w, _ in ladder)
    hs = ", ".join(str(h) for _, h in ladder)
    return (
        bucket,
        f"CAST(list_extract([{ws}], {bucket} + 1) AS INT)",
        f"CAST(list_extract([{hs}], {bucket} + 1) AS INT)",
    )


def shard_pack_sql(
    table_sql: str,
    key_expr: str,
    w_expr: str,
    h_expr: str,
    shard_size: int,
    seed: int,
    ladder: list[tuple[int, int]] | None = None,
) -> str:
    """Full DuckDB oracle for ar_bucket_shards over `table_sql` (a
    FROM-able subquery providing key/w/h columns)."""
    ladder = ladder or ar_ladder()
    bucket, bw, bh = ar_bucket_sql(w_expr, h_expr, ladder)
    u = u01_sql(key_expr, seed)
    return f"""
WITH b AS (
  SELECT {key_expr} AS k, {bucket} AS bucket_id, {bw} AS bucket_w,
         {bh} AS bucket_h, {u} AS u
  FROM {table_sql}),
c AS (
  SELECT *, GREATEST((cnt + {shard_size} - 1) // {shard_size}, 1) AS n_shards
  FROM (SELECT b.*, COUNT(*) OVER (PARTITION BY bucket_id) AS cnt FROM b)),
s AS (
  SELECT k, bucket_id, bucket_w, bucket_h, u,
         CAST(LEAST(CAST(FLOOR(u * n_shards) AS BIGINT), n_shards - 1)
              AS INT) AS shard
  FROM c)
SELECT k, bucket_id, bucket_w, bucket_h, shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY bucket_id, shard
                               ORDER BY u, k) - 1 AS INT) AS pos
FROM s
"""
