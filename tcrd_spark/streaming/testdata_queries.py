"""Driver-facing window queries over the `events` table (batch
execution of the same builders the streaming jobs use) with DuckDB
oracles: time_bucket for tumbling, an explicit window-enumeration for
sliding, gaps-and-islands for session windows."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from tcrd_spark.sources.lake import load_table
from tcrd_spark.streaming import windows


def q_window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return windows.tumbling_counts(ev, width="1 hour")


def q_window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return windows.sliding_counts(ev, width="1 hour", slide="15 minutes")


def q_window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return windows.session_stats(ev, gap="30 minutes")


QUERIES = {
    "window_tumbling": q_window_tumbling,
    "window_sliding": q_window_sliding,
    "window_session": q_window_session,
}

ORACLE = {
    "window_tumbling": """
        SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
               event_type,
               count(*) AS n_events,
               round(sum(value), 4) AS total_value
        FROM events GROUP BY 1, 2
    """,
    # each event belongs to the 4 sliding windows that cover it:
    # starts = bucket15(ts) - k*15min, k in 0..3 (keep start <= ts < start+1h)
    "window_sliding": """
        SELECT window_start, count(*) AS n_events FROM (
          SELECT time_bucket(INTERVAL '15 minutes', ts)
                     - k * INTERVAL '15 minutes' AS window_start,
                 ts
          FROM events, (SELECT unnest(range(4)) AS k)
        )
        WHERE ts >= window_start
          AND ts < window_start + INTERVAL '1 hour'
        GROUP BY 1
    """,
    # gaps-and-islands: a session breaks after 30 min of inactivity;
    # session_end = last event + gap (Spark session_window semantics)
    "window_session": """
        WITH flagged AS (
          SELECT user_id, ts, value,
                 CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                              ORDER BY ts, event_id)
                           > INTERVAL '30 minutes'
                      OR lag(ts) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) IS NULL
                      THEN 1 ELSE 0 END AS brk
          FROM events
        ),
        sessions AS (
          SELECT user_id, ts, value,
                 sum(brk) OVER (PARTITION BY user_id
                                ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
          FROM flagged
        )
        SELECT user_id,
               min(ts) AS session_start,
               max(ts) + INTERVAL '30 minutes' AS session_end,
               count(*) AS n_events,
               round(sum(value), 4) AS total_value
        FROM sessions GROUP BY user_id, sid
    """,
}
