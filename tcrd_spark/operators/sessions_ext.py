"""Per-session rollup over the gap-based sessionizer (round 7) — the
engagement/abandonment summary every session analysis starts from:
one row per (user, session) with event count, bounds, and duration.

Composes `operators/temporal.sessionize` (one user-partitioned
window); the rollup groupBy keys on (user, session_id) — a refinement
of the window's partitioning, so the aggregate combines map-side on
the already-shuffled partition. Duration uses fractional epoch
seconds (the sessionize gap convention) rounded to 6 for the oracle.

Reference parity: none (the reference has no event analytics) —
extension alongside funnel/cohort/sessionize in SURVEY §2.3.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tcrd_spark.operators.temporal import sessionize

GAP_SECONDS = 1800


def session_stats_batch(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    id_col: str,
    gap_seconds: int = GAP_SECONDS,
) -> DataFrame:
    """(user, session_id, n_events, start_ts, end_ts, duration_s)."""
    s = sessionize(events, user_col, ts_col, id_col, gap_seconds)
    return s.groupBy(user_col, "session_id").agg(
        F.count("*").alias("n_events"),
        F.min(ts_col).alias("start_ts"),
        F.max(ts_col).alias("end_ts"),
        F.round(
            F.max(F.col(ts_col).cast("timestamp").cast("double"))
            - F.min(F.col(ts_col).cast("timestamp").cast("double")),
            6,
        ).alias("duration_s"),
    )


def q_session_durations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-session rollup of the 30-minute-gap sessionization."""
    from tcrd_spark.sources.lake import load_table

    ev = load_table(spark, sf_dir, "events")
    return session_stats_batch(
        ev, "user_id", "ts", "event_id", gap_seconds=GAP_SECONDS
    )


QUERIES = {"session_durations": q_session_durations}

ORACLE = {
    "session_durations": """
        WITH o AS (
          SELECT user_id, event_id, ts,
                 lag(ts) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
          FROM events
        ),
        s AS (
          SELECT user_id, ts,
                 CAST(sum(CASE WHEN prev IS NULL
                               OR epoch(ts) - epoch(prev) > 1800
                               THEN 1 ELSE 0 END)
                      OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS session_id
          FROM o
        )
        SELECT user_id, session_id,
               count(*) AS n_events,
               min(ts) AS start_ts,
               max(ts) AS end_ts,
               round(epoch(max(ts)) - epoch(min(ts)), 6) AS duration_s
        FROM s GROUP BY 1, 2
    """,
}
