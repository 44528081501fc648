"""Gap-based sessionization (event streams -> sessions).

Standard analytics/training-data op: group each user's events into
sessions split wherever the gap to the previous event exceeds
`gap_s`. One window over (user, ts): lag to flag session starts,
running sum to number them — a single shuffle on the user key, no
self-join, no explode. The streaming analog is Structured Streaming's
session_window; this is the batch/backfill form with deterministic
session ids (first event's ts identifies the session).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _epoch(c: F.Column) -> F.Column:
    """Epoch seconds for TIMESTAMP and TIMESTAMP_NTZ alike (NTZ has no
    direct long cast in ANSI Spark; routing through TIMESTAMP treats
    the naive value as session-tz = UTC, matching DuckDB's epoch())."""
    return c.cast("timestamp").cast("long")


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_s: int = 1800,
) -> DataFrame:
    """Append session_seq (1-based per user) and session_start."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap = _epoch(F.col(ts_col)) - F.lag(_epoch(F.col(ts_col))).over(w)
    new_sess = F.when(gap.isNull() | (gap > gap_s), 1).otherwise(0)
    with_seq = events.withColumn("_new", new_sess).withColumn(
        "session_seq", F.sum("_new").over(w)
    ).drop("_new")
    w_sess = Window.partitionBy(user_col, "session_seq")
    return with_seq.withColumn("session_start", F.min(ts_col).over(w_sess))


def session_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_s: int = 1800,
) -> DataFrame:
    """One row per session: bounds, event count, duration."""
    s = sessionize(events, user_col, ts_col, gap_s)
    return s.groupBy(user_col, "session_seq").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count("*").alias("n_events"),
        (F.max(_epoch(F.col(ts_col)))
         - F.min(_epoch(F.col(ts_col)))).alias("duration_s"),
    )
