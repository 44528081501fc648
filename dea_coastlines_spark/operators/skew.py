"""Explicit salted-key skew handling (north_rule: "explicit salted-key
skew handling on dense coastal cells").

Coastal data is pathologically skewed: most cells of the grid are open
water or inland (few rows), while dense coastal cells hold orders of
magnitude more shoreline points (the reference sidesteps this by
running one CLI per tile — coastlines/raster.py:530-536 — so a dense
tile just takes longer on its own node). In Spark the skew shows up
twice:

  1. shuffle-size skew on groupBy/join keys — AQE's skew-join split
     handles the JOIN side, but a grouped aggregation on a hot key
     still lands on one task;
  2. Python-UDF compute skew — a grouped map over a hot cell pays the
     whole cell in one Arrow batch on one core.

The cure for (1) is two-phase salted aggregation; for (2), salted
repartition before the fat UDF stage. Salting is SELECTIVE: only keys
whose row count exceeds a threshold get a salt factor > 1 (salting
every key would double the shuffle for the 99% of cells that are
cheap). The salt is a deterministic hash of a row id — N-vs-4N runs
produce identical results (SURVEY.md §7 hard part #3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def hot_keys(df: DataFrame, keys: list[str], target_rows_per_task: int) -> DataFrame:
    """Per-key salt factors: ceil(rows / target) where rows > target,
    else 1. Small (one row per distinct hot key) — always broadcast."""
    return (
        df.groupBy(*keys)
        .agg(F.count("*").alias("_n"))
        .select(
            *keys,
            F.greatest(
                F.lit(1),
                F.ceil(F.col("_n") / F.lit(target_rows_per_task)).cast("int"),
            ).alias("_salt_factor"),
        )
        .filter(F.col("_salt_factor") > 1)
    )


def with_salt(
    df: DataFrame,
    keys: list[str],
    id_col: str | Column,
    target_rows_per_task: int = 100_000,
    factors: DataFrame | None = None,
) -> DataFrame:
    """Attach a deterministic `_salt` column: 0 for cold keys, hash(id)
    mod factor for hot keys. `factors` lets callers reuse precomputed
    stats (e.g. from the lineage/metrics table) instead of an extra
    pass over df."""
    if factors is None:
        factors = hot_keys(df, keys, target_rows_per_task)
    idc = F.col(id_col) if isinstance(id_col, str) else id_col
    # null-SAFE equality on the key columns: groupBy keeps a null-key
    # group (often the hottest — e.g. points outside the grid), but a
    # plain equi join would never match its factor row, silently leaving
    # the hot null group unsalted on one task. Factor keys are renamed
    # first — factors derives from df, so unaliased references resolve
    # to a trivially-true self-comparison.
    fac = factors.select(
        *[F.col(k).alias(f"_fk_{k}") for k in keys], "_salt_factor"
    )
    cond = None
    for k in keys:
        c = df[k].eqNullSafe(F.col(f"_fk_{k}"))
        cond = c if cond is None else cond & c
    out = df.join(F.broadcast(fac), cond, "left").drop(
        *[f"_fk_{k}" for k in keys]
    )
    return out.withColumn(
        SALT_COL,
        F.when(
            F.col("_salt_factor").isNull(), F.lit(0)
        ).otherwise(F.pmod(F.xxhash64(idc), F.col("_salt_factor")).cast("int")),
    ).drop("_salt_factor")


def two_phase_agg(
    salted_df: DataFrame,
    keys: list[str],
    partial_aggs: dict[str, Column],
    final_aggs: dict[str, Column],
) -> DataFrame:
    """groupBy(keys + salt) -> partial -> groupBy(keys) -> final merge.

    partial_aggs: alias -> agg over raw columns (runs per salt bucket);
    final_aggs:   alias -> agg over the partial aliases (merges buckets).
    Only salt-decomposable aggregates belong here (count/sum/min/max and
    algebraic combos); medians stay on the unsalted key
    (SURVEY.md §7 hard part #3)."""
    partial = salted_df.groupBy(*keys, SALT_COL).agg(
        *[c.alias(a) for a, c in partial_aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[c.alias(a) for a, c in final_aggs.items()]
    )


def salted_counts_sums(
    df: DataFrame,
    keys: list[str],
    id_col: str,
    sum_cols: list[str],
    target_rows_per_task: int = 100_000,
) -> DataFrame:
    """Convenience: skew-safe count(*) + sum(cols) per key."""
    s = with_salt(df, keys, id_col, target_rows_per_task)
    partial = {"_cnt": F.count("*")}
    final = {"n": F.sum("_cnt")}
    for c in sum_cols:
        partial[f"_s_{c}"] = F.sum(c)
        final[f"sum_{c}"] = F.sum(f"_s_{c}")
    return two_phase_agg(s, keys, partial, final)


def salted_repartition(
    df: DataFrame,
    keys: list[str],
    id_col: str,
    target_rows_per_task: int = 100_000,
    num_partitions: int | None = None,
) -> DataFrame:
    """Repartition by (keys..., salt) before a fat per-row UDF stage so
    a hot cell's rows spread over `factor` tasks instead of one. Safe
    for any row-local kernel (decode, point-in-polygon refine, distance)
    — NOT for grouped-map stages that need whole-key batches."""
    s = with_salt(df, keys, id_col, target_rows_per_task)
    cols = [F.col(k) for k in keys] + [F.col(SALT_COL)]
    # drop the internal salt after the exchange: it only exists as a
    # repartition key, and leaking it breaks unionByName/schema-checked
    # sinks downstream (the Project preserves the partitioning)
    if num_partitions:
        return s.repartition(num_partitions, *cols).drop(SALT_COL)
    return s.repartition(*cols).drop(SALT_COL)
