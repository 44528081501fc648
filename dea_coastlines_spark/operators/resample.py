"""Time-series resampling with linear interpolation: irregular
per-key observations onto a regular grid — the gap-fill every sensor /
telemetry / tide-series pipeline needs before windowed modeling (the
reference's tide attribution interpolates model points onto
acquisition times the same way, coastlines/raster.py pixel_tides).

Plan shape: grid points are generated row-locally (sequence() between
each key's floor/ceil-aligned min and max — no join against a calendar
table), unioned with the observations, and bracketed in ONE window
pass per key: last non-null observation before (running last_value
IGNORE NULLS) and first after (the same, over the reversed frame).
Interpolation is then a row-local expression.  One shuffle total (the
per-key window), linear output size, no cross join, no per-row Python.

Cross-engine float parity: the interpolated value is
v_prev + (v_next - v_prev) * ((g - t_prev) / (t_next - t_prev)) with
integer-second timestamps, evaluated in this exact order on both
engines and rounded to 6 dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_interpolate(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step_s: int = 3600,
) -> DataFrame:
    """(key, ts, value) -> (key, grid_ts, value) on a regular step_s
    grid spanning each key's observed range (grid points aligned to
    multiples of step_s; endpoints inside the observed range, so every
    grid point has both brackets and no extrapolation happens).
    Grid points coinciding with an observation take its exact value."""
    epoch = F.unix_timestamp(F.col(ts_col))
    obs = (
        df.select(
            F.col(key_col).alias("k"),
            epoch.alias("t"),
            F.col(value_col).cast("double").alias("v"),
        )
        # observations that collapse to the same (key, second) after
        # truncation must resolve deterministically: min(v) is
        # order-free, where a window tie-break would pick whichever row
        # the physical layout sorted last (confirmed divergent between
        # layouts on the shipped sf0.01 events table)
        .groupBy("k", "t")
        .agg(F.min("v").alias("v"))
    )
    # per-key aligned grid bounds; sequence() is row-local fan-out.
    # Keys whose observed range contains NO aligned point would give
    # sequence(start > stop), which Spark REJECTS (DuckDB's
    # generate_series returns empty) — filter them out first.
    g0 = (F.col("t0") + step_s - 1) - F.pmod(F.col("t0") + step_s - 1, F.lit(step_s))
    g1 = F.col("t1") - F.pmod(F.col("t1"), F.lit(step_s))
    grid = (
        obs.groupBy("k")
        .agg(F.min("t").alias("t0"), F.max("t").alias("t1"))
        .withColumn("g0", g0)
        .withColumn("g1", g1)
        .filter(F.col("g0") <= F.col("g1"))
        .select(
            "k",
            F.explode(F.sequence(F.col("g0"), F.col("g1"), F.lit(step_s))).alias(
                "t"
            ),
        )
        .withColumn("is_grid", F.lit(1))
    )
    unioned = obs.withColumn("is_grid", F.lit(0)).unionByName(
        grid.withColumn("v", F.lit(None).cast("double")),
        allowMissingColumns=False,
    )
    # observations sort BEFORE a coinciding grid point so the running
    # last_value already includes it (exact-hit semantics)
    fwd = (
        Window.partitionBy("k")
        .orderBy("t", "is_grid")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    bwd = (
        Window.partitionBy("k")
        .orderBy(F.col("t").desc(), F.col("is_grid").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    bracketed = (
        unioned.withColumn("v_prev", F.last("v", ignorenulls=True).over(fwd))
        .withColumn(
            "t_prev",
            F.last(F.when(F.col("v").isNotNull(), F.col("t")), ignorenulls=True).over(
                fwd
            ),
        )
        .withColumn("v_next", F.last("v", ignorenulls=True).over(bwd))
        .withColumn(
            "t_next",
            F.last(F.when(F.col("v").isNotNull(), F.col("t")), ignorenulls=True).over(
                bwd
            ),
        )
        .filter(F.col("is_grid") == 1)
    )
    # t_next NULL happens only when the grid point coincides with the
    # LAST observation (the reverse scan sees the grid row first) —
    # exact hit, take v_prev
    interp = F.when(
        F.col("t_next").isNull() | (F.col("t_next") == F.col("t_prev")),
        F.col("v_prev"),
    ).otherwise(
        F.col("v_prev")
        + (F.col("v_next") - F.col("v_prev"))
        * (
            (F.col("t") - F.col("t_prev")).cast("double")
            / (F.col("t_next") - F.col("t_prev")).cast("double")
        )
    )
    # floor(x*1e6 + 0.5)/1e6, NOT round(x, 6): an interpolated value
    # landing on an exact decimal half (e.g. 65.2369375 — one row in
    # 174k at sf0.1) rounds differently between Spark (HALF_UP on the
    # shortest-decimal rendering) and DuckDB (correct rounding of the
    # binary double); the floor form is pure IEEE arithmetic both
    # engines evaluate identically
    return bracketed.select(
        F.col("k").alias(key_col),
        F.to_timestamp(F.from_unixtime("t")).alias("grid_ts"),
        (F.floor(interp * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).alias(value_col),
    )


def resample_interpolate_sql(
    table: str,
    key_col: str,
    ts_col: str,
    value_col: str,
    step_s: int = 3600,
) -> str:
    """DuckDB oracle: generate_series grid, the same union + two
    IGNORE-NULLS running windows, the same interpolation expression
    order. Timestamps rendered as UTC strings to match the Spark
    session's pinned zone."""
    return f"""
WITH obs AS (
  -- FLOOR before the cast: Spark's unix_timestamp() truncates
  -- sub-second parts, DuckDB's BIGINT cast would round them.
  -- min(v) per (k, second): same-second collisions resolve
  -- deterministically on both engines
  SELECT k, t, MIN(v) AS v, 0 AS is_grid FROM (
    SELECT {key_col} AS k, CAST(FLOOR(epoch({ts_col})) AS BIGINT) AS t,
           CAST({value_col} AS DOUBLE) AS v
    FROM {table}) GROUP BY k, t
), bounds AS (
  SELECT k, MIN(t) AS t0, MAX(t) AS t1 FROM obs GROUP BY k
), grid AS (
  SELECT k, UNNEST(generate_series(
           (t0 + {step_s} - 1) - ((t0 + {step_s} - 1) % {step_s}),
           t1 - (t1 % {step_s}), {step_s})) AS t,
         NULL::DOUBLE AS v, 1 AS is_grid
  FROM bounds
), unioned AS (
  SELECT * FROM obs UNION ALL SELECT * FROM grid
), bracketed AS (
  SELECT *,
    LAST_VALUE(v IGNORE NULLS) OVER
      (PARTITION BY k ORDER BY t, is_grid ROWS UNBOUNDED PRECEDING) AS v_prev,
    LAST_VALUE(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS) OVER
      (PARTITION BY k ORDER BY t, is_grid ROWS UNBOUNDED PRECEDING) AS t_prev,
    LAST_VALUE(v IGNORE NULLS) OVER
      (PARTITION BY k ORDER BY t DESC, is_grid DESC
       ROWS UNBOUNDED PRECEDING) AS v_next,
    LAST_VALUE(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS) OVER
      (PARTITION BY k ORDER BY t DESC, is_grid DESC
       ROWS UNBOUNDED PRECEDING) AS t_next
  FROM unioned
)
SELECT k AS {key_col},
       CAST(to_timestamp(t) AT TIME ZONE 'UTC' AS TIMESTAMP) AS grid_ts,
       FLOOR((CASE WHEN t_next IS NULL OR t_next = t_prev THEN v_prev
              ELSE v_prev + (v_next - v_prev)
                   * ((t - t_prev)::DOUBLE / (t_next - t_prev)::DOUBLE)
         END) * 1e6 + 0.5) / 1e6 AS {value_col}
FROM bracketed WHERE is_grid = 1
"""
