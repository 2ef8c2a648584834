"""Event-time window aggregations.

Each builder takes ANY events DataFrame — batch or streaming — because
`F.window` / `F.session_window` are engine-agnostic: the same function
backs the oracle-checked batch queries and the readStream pipelines
(tests/test_streaming.py runs them against a file source with a
watermark). That one-definition-two-runtimes property is the point of
Structured Streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame, ts: str = "ts", width: str = "1 hour"
) -> DataFrame:
    """Per (event_type, tumbling window): count + sum(value)."""
    return (
        events.groupBy(F.window(ts, width).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    ts: str = "ts",
    width: str = "1 hour",
    slide: str = "15 minutes",
) -> DataFrame:
    """Per sliding window: event count (each event lands in
    width/slide windows)."""
    return (
        events.groupBy(F.window(ts, width, slide).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


def session_stats(
    events: DataFrame, ts: str = "ts", gap: str = "30 minutes"
) -> DataFrame:
    """Per (user, session): session_window closes after `gap` of
    inactivity; end = last event + gap."""
    return (
        events.groupBy(F.session_window(ts, gap).alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )
