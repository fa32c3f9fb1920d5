"""Event-stream sessionization via native session windows.

Two equivalent forms exist in this engine:

  - q10's relational form (lag + cumulative sum over a per-user window) —
    the oracle-checkable SQL shape;
  - this operator: Spark's native `session_window`, the form that runs
    state-backed in Structured Streaming and needs no per-user ordered
    window in batch (the aggregation is a keyed hash agg with window
    merging, not a sort).

Boundary semantics differ by one edge: session_window starts a new
session when a gap is >= the duration (an event landing exactly at
last_ts + gap falls outside the previous window), while the cumulative
form splits strictly at >. Identical on any input without exact-gap
ties; the parity test uses tie-free data and documents the edge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def user_sessions(events: DataFrame, gap: str = "30 minutes",
                  user_col: str = "user_id", ts_col: str = "ts") -> DataFrame:
    """One row per (user, session): start, end, n_events.

    Works unchanged on a streaming DataFrame (add a watermark upstream);
    in batch the plan is a keyed aggregate — no global or per-user sort.
    """
    return (
        events.groupBy(user_col, F.session_window(F.col(ts_col), gap))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            user_col,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def session_summary(events: DataFrame, gap: str = "30 minutes",
                    user_col: str = "user_id", ts_col: str = "ts") -> DataFrame:
    """Per-user rollup of user_sessions: n_sessions, n_events."""
    return (
        user_sessions(events, gap, user_col, ts_col)
        .groupBy(user_col)
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
        )
    )
