"""Point-in-time feature join — the feature-store composite: one
event stream as-of joined against MULTIPLE feature tables, each
stamped with its AVAILABILITY time.

The training-data correctness property this encodes: a feature
computed over day D only becomes joinable at D+1 00:00 (weekly
features a week later). Stamping feature rows with availability time
and joining backward-inclusive makes leakage structurally impossible
— no event can see a feature window that had not closed yet. This is
the feature-store point (Feast/Tecton "point-in-time correct join"),
and the temporal twin of `pipeline/splits.py`'s group-leakage rule.

Mechanics: two chained `operators/temporal.asof_join` passes (union +
ONE key-hash exchange + ordered fill window each — zero join nodes,
immune to right-side fan-out). Feature tables are unique per
(key, availability_ts) by construction, so no tie-break is needed.

The oracle uses DuckDB's NATIVE `ASOF LEFT JOIN` — a cross-engine
check that the union+window re-expression implements exactly the
textbook operator semantics, not an approximation of them.

100 TB shape: each pass is one exchange on the entity key; feature
tables are day/week rollups (events-count ÷ bucket-width rows). For
Zipfian entity keys the segmented variant
(`operators/temporal_skew.py`) drops in unchanged.

Reference parity: none (extension; the reference's expression tables
are yearly snapshots with no availability semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tcrd_spark.operators.temporal import asof_join


def daily_feature(
    events: DataFrame, key_col: str, ts_col: str, val_col: str
) -> DataFrame:
    """(key, f_ts, f_avg): per-key daily mean, AVAILABLE the next
    midnight — the leakage-safe stamp."""
    return (
        events.groupBy(
            F.col(key_col),
            F.date_trunc("day", F.col(ts_col)).alias("_day"),
        )
        .agg(F.round(F.avg(val_col), 6).alias("f_avg"))
        .select(
            key_col,
            (F.col("_day") + F.expr("INTERVAL 1 DAY")).alias("f_ts"),
            "f_avg",
        )
    )


def weekly_purchase_feature(
    events: DataFrame, key_col: str, ts_col: str, type_col: str
) -> DataFrame:
    """(key, w_ts, w_purchases): per-key weekly purchase count,
    available when the week closes."""
    return (
        events.where(F.col(type_col) == "purchase")
        .groupBy(
            F.col(key_col),
            F.date_trunc("week", F.col(ts_col)).alias("_week"),
        )
        .agg(F.count(F.lit(1)).alias("w_purchases"))
        .select(
            key_col,
            (F.col("_week") + F.expr("INTERVAL 7 DAYS")).alias("w_ts"),
            "w_purchases",
        )
    )


def pit_feature_join(
    events: DataFrame,
    features: list[tuple[DataFrame, str, list[str]]],
    key_col: str,
    ts_col: str,
) -> DataFrame:
    """Chain one backward as-of pass per feature table.
    `features`: (table, availability_ts_col, value_cols) triples."""
    out = events
    for ftab, fts, fcols in features:
        out = asof_join(
            out, ftab, [key_col], ts_col, fts, fcols, prefix=""
        )
    return out


# ------------------------------------------------- registered query


def q_pit_feature_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every event with the features that were AVAILABLE at its
    timestamp: yesterday-closing daily mean, last-closed-week purchase
    count. NULLs where no window had closed yet."""
    from tcrd_spark.sources.lake import load_table

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    daily = daily_feature(events, "user_id", "ts", "value")
    weekly = weekly_purchase_feature(events, "user_id", "ts", "event_type")
    out = pit_feature_join(
        events.select("event_id", "user_id", "ts"),
        [(daily, "f_ts", ["f_avg"]), (weekly, "w_ts", ["w_purchases"])],
        "user_id",
        "ts",
    )
    return out.select("event_id", "user_id", "ts", "f_avg", "w_purchases")


QUERIES = {"pit_feature_join": q_pit_feature_join}

# DuckDB's native ASOF JOIN — the reference semantics the
# union+window re-expression must reproduce exactly.
ORACLE = {
    "pit_feature_join": """
        WITH daily AS (
          SELECT user_id,
                 date_trunc('day', ts) + INTERVAL 1 DAY AS f_ts,
                 round(avg(value), 6) AS f_avg
          FROM events GROUP BY 1, date_trunc('day', ts)
        ), weekly AS (
          SELECT user_id,
                 date_trunc('week', ts) + INTERVAL 7 DAY AS w_ts,
                 count(*) AS w_purchases
          FROM events WHERE event_type = 'purchase'
          GROUP BY 1, date_trunc('week', ts)
        )
        SELECT e.event_id, e.user_id, e.ts, d.f_avg, w.w_purchases
        FROM events e
        ASOF LEFT JOIN daily d
          ON e.user_id = d.user_id AND e.ts >= d.f_ts
        ASOF LEFT JOIN weekly w
          ON e.user_id = w.user_id AND e.ts >= w.w_ts
    """,
}
