"""Scalable interval (range) joins: point-in-interval and
interval-overlap, without nested-loop plans.

Spark has no native range-join optimization: a plain
``ON p.ts >= i.start AND p.ts < i.end`` plans as
BroadcastNestedLoopJoin (small side) or CartesianProduct — both
scale-killers. The classic fix (the same construction the engine's
spatial radius_join uses in 2-D, operators/spatial_join.py:131) is
1-D bucketization:

* the time axis is cut into fixed-width buckets of ``bucket_s``
  seconds;
* every interval is exploded to the buckets it covers
  (``ceil(len / bucket_s) + 1`` rows — choose ``bucket_s`` near the
  median interval length so the replication factor stays O(1));
* points carry exactly ONE bucket each, so the bucket equi-join
  (hash-partitioned, AQE-coalesced) yields each qualifying
  (point, interval) pair EXACTLY once — no distinct pass needed;
* an exact range filter refines the candidates.

Interval×interval overlap needs a dedup rule because BOTH sides
replicate: a pair overlapping k shared buckets would surface k
times. The standard dedup-free trick assigns each pair to one owner
bucket — the first bucket where both intervals are live,
``max(first_bucket_left, first_bucket_right)`` — and keeps the pair
only in that bucket. One filter, no distinct shuffle.

Degenerate long intervals (length >> bucket_s) are the 1-D analog
of a continent-sized polygon in a spatial join: they'd explode into
millions of bucket rows. ``long_interval_buckets`` routes intervals
longer than that many buckets through a separate broadcast pass —
there are, by construction, FEW such intervals (they each match a
huge fraction of all points), so the broadcast range join over just
that sliver is the cheaper plan, and the exploded path keeps its
O(1) replication bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_POINT_BUCKET = "_ij_bucket"
_START = "_ij_start_s"
_END = "_ij_end_s"


def _epoch_us(col):
    """MICROseconds-since-epoch LONG for a timestamp / numeric column.
    Full timestamp precision: a seconds truncation here would admit a
    point in the same second as — but before — an interval start that
    a raw-timestamp oracle comparison excludes (surfaced by the sf0.1
    oracle sweep: 10x event density puts events on sub-second
    boundaries the sf0.01 gate never hit)."""
    return F.unix_micros(F.col(col).cast("timestamp"))


def _prep_intervals(
    intervals: DataFrame, start_col: str, end_col: str
) -> DataFrame:
    """Attach epoch-second bounds; drop empty/NULL intervals (end <=
    start matches nothing under the half-open [start, end) contract,
    and F.sequence would raise on a descending range)."""
    out = intervals.withColumn(_START, _epoch_us(start_col)).withColumn(
        _END, _epoch_us(end_col)
    )
    return out.filter(
        F.col(_START).isNotNull()
        & F.col(_END).isNotNull()
        & (F.col(_END) > F.col(_START))
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    by: list[str] | None = None,
    bucket_s: int = 3600,
    how: str = "inner",
    long_interval_buckets: int = 4096,
) -> DataFrame:
    """Join point rows to every interval containing them:
    ``interval.start <= point.ts < interval.end`` (half-open), plus
    optional ``by`` equi keys. Returns points' columns + intervals'
    columns (overlapping names on the interval side would collide —
    rename them upstream). ``how`` is "inner" or "left" (left keeps
    unmatched points with NULL interval columns).

    Scale notes: ONE hash shuffle per side on (by..., bucket);
    replication is ceil(interval_len / bucket_s) + 1 on the interval
    side only. Pick ``bucket_s`` ≈ the median interval length.
    Intervals covering more than ``long_interval_buckets`` buckets
    take a broadcast pass instead of exploding (see module doc);
    pass None to disable the split when no such intervals exist.
    """
    if how not in ("inner", "left"):
        raise ValueError(how)
    by = list(by or [])
    if int(bucket_s) <= 0:
        raise ValueError("bucket_s must be positive")
    b = int(bucket_s) * 1_000_000  # internal arithmetic is in micros
    dup = set(points.columns) & set(intervals.columns) - set(by)
    if dup:
        raise ValueError(f"overlapping non-key columns: {sorted(dup)}")

    iv = _prep_intervals(intervals, start_col, end_col)
    n_buckets = (
        F.floor((F.col(_END) - F.lit(1)) / b) - F.floor(F.col(_START) / b)
        + F.lit(1)
    )
    if long_interval_buckets is not None:
        short = iv.filter(n_buckets <= int(long_interval_buckets))
        long_ = iv.filter(n_buckets > int(long_interval_buckets))
    else:
        short, long_ = iv, None

    pts = points.withColumn(
        _POINT_BUCKET, F.floor(_epoch_us(ts_col) / b)
    )
    # interval side: one row per covered bucket. end is exclusive, so
    # the last covered bucket is floor((end-1)/b).
    expl = short.withColumn(
        _POINT_BUCKET,
        F.explode(
            F.sequence(
                F.floor(F.col(_START) / b),
                F.floor((F.col(_END) - F.lit(1)) / b),
            )
        ),
    )
    pe = _epoch_us(ts_col)
    refine = (pe >= F.col(_START)) & (pe < F.col(_END))
    iv_payload = [c for c in intervals.columns if c not in by]
    matched = pts.join(expl, by + [_POINT_BUCKET], "inner").filter(
        refine
    ).select(*points.columns, *iv_payload)

    if long_ is not None:
        # few-row sliver: broadcast range join (the ONLY sanctioned
        # nested-loop here — the side is bounded by construction).
        plt = points.withColumn(_START + "_p", _epoch_us(ts_col))
        cond = (plt[_START + "_p"] >= long_[_START]) & (
            plt[_START + "_p"] < long_[_END]
        )
        for k in by:
            cond = cond & plt[k].eqNullSafe(long_[k])
        extra = plt.join(F.broadcast(long_), cond, "inner").select(
            *[plt[c] for c in points.columns],
            *[long_[c] for c in iv_payload],
        )
        matched = matched.unionByName(extra)

    if how == "left":
        # unmatched points re-enter with NULL interval columns.
        # Multiset arithmetic makes this exact even for duplicate
        # point rows: identical rows match identical interval sets, so
        # exceptAll leaves each row's full multiplicity iff it matched
        # nothing and zero copies otherwise.
        misses = points.exceptAll(matched.select(*points.columns))
        ivt = dict(intervals.dtypes)
        misses = misses.select(
            *points.columns,
            *[F.lit(None).cast(ivt[c]).alias(c) for c in iv_payload],
        )
        matched = matched.unionByName(misses)
    return matched


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    by: list[str] | None = None,
    bucket_s: int = 3600,
) -> DataFrame:
    """All (left, right) interval pairs with non-empty half-open
    overlap: ``l.start < r.end AND r.start < l.end`` (+ ``by`` equi
    keys). Each pair is emitted EXACTLY once via owner-bucket dedup
    (no distinct): the pair belongs to bucket
    max(first_bucket(l), first_bucket(r)) — the first bucket both
    cover — and is kept only where the join bucket equals it.

    Output: left columns + right columns + ``overlap_s`` (seconds of
    overlap). Overlapping column names must be disjoint across sides.
    """
    by = list(by or [])
    if int(bucket_s) <= 0:
        raise ValueError("bucket_s must be positive")
    b = int(bucket_s) * 1_000_000  # internal arithmetic is in micros
    dup = set(left.columns) & set(right.columns) - set(by)
    if dup:
        raise ValueError(f"overlapping non-key columns: {sorted(dup)}")

    def _explode(df, s, e, tag):
        p = _prep_intervals(df, s, e).withColumnsRenamed(
            {_START: _START + tag, _END: _END + tag}
        )
        return p.withColumn(
            _POINT_BUCKET,
            F.explode(
                F.sequence(
                    F.floor(F.col(_START + tag) / b),
                    F.floor((F.col(_END + tag) - F.lit(1)) / b),
                )
            ),
        )

    le = _explode(left, left_start, left_end, "_l")
    re = _explode(right, right_start, right_end, "_r")
    joined = le.join(re, by + [_POINT_BUCKET], "inner")
    ls, le_, rs, re_ = (
        F.col(_START + "_l"),
        F.col(_END + "_l"),
        F.col(_START + "_r"),
        F.col(_END + "_r"),
    )
    owner = F.greatest(F.floor(ls / b), F.floor(rs / b))
    out = joined.filter(
        (ls < re_) & (rs < le_) & (F.col(_POINT_BUCKET) == owner)
    )
    # floor-seconds at each endpoint THEN subtract (matches the oracle's
    # FLOOR(epoch(..)) - FLOOR(epoch(..)); != floor of the micro diff).
    # `x div 1000000` alone truncates toward zero, which disagrees with
    # FLOOR by 1 on negative (pre-1970) micros — subtract pmod first so
    # the dividend is an exact multiple and div IS floor, with no
    # double-precision detour (micros overflow 2^53 within range)
    def _floor_s(expr_sql: str) -> F.Column:
        # long-exact: pmod-adjusted dividend is a multiple of 1e6, so
        # integer `div` is floor (no double-precision `/` detour)
        return F.expr(
            f"(({expr_sql}) - pmod(({expr_sql}), 1000000)) div 1000000"
        )

    overlap = _floor_s(f"least({_END}_l, {_END}_r)") - _floor_s(
        f"greatest({_START}_l, {_START}_r)"
    )
    keep = by + [
        c
        for c in left.columns + right.columns
        if c not in by
    ]
    return out.select(*keep, overlap.alias("overlap_s"))
