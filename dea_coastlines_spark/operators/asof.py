"""Scalable as-of join (time-series point-in-time lookup).

For each left row, find the right row with the greatest time <= left
time (backward), smallest time >= left time (forward), or the closer
of the two (nearest), per join key — pandas.merge_asof / DuckDB
ASOF JOIN semantics.

Spark shape: NO cross/nested-loop join. Both sides are union-tagged
and sorted once by (key, time); a last(..., ignorenulls) window walks
the merged order so every left row picks up the most recent right
row's payload. ONE shuffle on the key, linear work, dense keys are
just partition-local sorts — this is the sort-merge as-of, the form
that survives 100 TB (a broadcast range join does not).

Ties (right.time == left.time): the right row is visible to the left
row at the same instant (matching merge_asof allow_exact_matches=True
and DuckDB `>=`). Multiple right rows at one instant: the maximum
right payload struct wins — an arbitrary but DETERMINISTIC choice via
a secondary sort on the right's struct payload (partitioning- and
run-invariant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | None = None,
    direction: str = "backward",
    right_cols: list[str] | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Left rows + the as-of matched right row's columns (null when no
    right row qualifies). `on` is the time/ordering column (same name
    both sides); `by` the equi keys; `right_cols` the right payload
    columns to carry (default: all except on/by)."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(direction)
    by = list(by or [])
    right_cols = list(
        right_cols
        if right_cols is not None
        else [c for c in right.columns if c != on and c not in by]
    )
    if direction == "nearest":
        # duplicate-safe: identical left rows get deterministic ordinals
        # so the backward/forward branches join row-for-row
        w_uid = Window.partitionBy(*left.columns).orderBy(F.lit(1))
        lu = left.withColumn("_uid", F.row_number().over(w_uid))
        b = asof_join(lu, right, on, by, "backward", right_cols, suffix)
        f = asof_join(lu, right, on, by, "forward", right_cols, "_fwd")
        # null-safe (<=>) equality on every left column: plain SQL
        # equality never matches NULLs, which would silently drop any
        # left row carrying a NULL from the nearest output while the
        # backward/forward legs keep it. EqualNullSafe is still an
        # equi-join predicate, so the hash/sort-merge strategy holds.
        f2 = f.select(
            *[F.col(c).alias(f"_f_{c}") for c in lu.columns],
            f"{on}_fwd",
            *[c + "_fwd" for c in right_cols],
        )
        cond = None
        for c in lu.columns:
            e = F.col(c).eqNullSafe(F.col(f"_f_{c}"))
            cond = e if cond is None else (cond & e)
        joined = b.join(f2, cond).drop(*[f"_f_{c}" for c in lu.columns])
        back_closer = F.when(
            F.col(f"{on}{suffix}").isNull(), F.lit(False)
        ).otherwise(
            F.col(f"{on}_fwd").isNull()
            | ((F.col(on) - F.col(f"{on}{suffix}"))
               <= (F.col(f"{on}_fwd") - F.col(on)))
        )
        return joined.select(
            *left.columns,
            F.when(back_closer, F.col(f"{on}{suffix}"))
            .otherwise(F.col(f"{on}_fwd")).alias(f"{on}{suffix}"),
            *[
                F.when(back_closer, F.col(c + suffix))
                .otherwise(F.col(c + "_fwd")).alias(c + suffix)
                for c in right_cols
            ],
        )

    # tag: right rows must sort BEFORE left rows at equal time so an
    # exact-time right row is visible (allow_exact_matches)
    l_tag = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("_side"),
        F.lit(None).cast("struct<" + ",".join(
            f"`{c}`:{right.schema[c].dataType.simpleString()}" for c in [on] + right_cols
        ) + ">").alias("_rpay"),
    )
    r_tag = right.select(
        *[F.col(c) for c in by],
        F.col(on),
        F.lit(0).alias("_side"),
        F.struct(F.col(on), *[F.col(c) for c in right_cols]).alias("_rpay"),
    )
    # align schemas: left columns not in right become nulls on the right
    for c in left.columns:
        if c not in by and c != on:
            r_tag = r_tag.withColumn(
                c, F.lit(None).cast(left.schema[c].dataType)
            )
    r_tag = r_tag.select(*l_tag.columns)
    merged = l_tag.unionByName(r_tag)
    # forward = walk the merged sequence from latest to earliest (desc
    # ordering works for any orderable type incl. timestamps)
    time_ord = F.col(on).asc() if direction == "backward" else F.col(on).desc()
    order = [
        time_ord,
        F.col("_side").asc(),           # right before left at equal time
        (F.col("_rpay")).asc_nulls_first(),  # deterministic multi-right
    ]
    w = (
        Window.partitionBy(*by).orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    picked = merged.withColumn(
        "_match", F.last("_rpay", ignorenulls=True).over(w)
    ).filter(F.col("_side") == 1)
    return picked.select(
        *[F.col(c) for c in left.columns],
        F.col(f"_match.{on}").alias(f"{on}{suffix}"),
        *[F.col(f"_match.`{c}`").alias(c + suffix) for c in right_cols],
    )
