"""Event-sequence pattern matching — a MATCH_RECOGNIZE-lite: detect
ordered event patterns inside each key's stream with a regular
expression over the stream's symbol string.

ANSI MATCH_RECOGNIZE (and Flink CEP) compile a row-pattern like
`(VIEW NOT_PURCHASE* CLICK NOT_PURCHASE* PURCHASE)` into an NFA over
ordered partitions. Spark has no row-pattern operator; the Spark-first
re-expression collapses each key's ordered stream to ONE string of
per-event symbols and runs the pattern as a regex — non-overlapping,
leftmost matching, exactly MATCH_RECOGNIZE `AFTER MATCH SKIP PAST
LAST ROW` semantics. `funnel_stages` (operators/temporal.py) answers
"did the user EVER do A then B then C"; this operator counts every
occurrence and enforces exclusion symbols BETWEEN stages, which the
min/max-timestamp trick cannot express.

100 TB shape: one key-hash exchange into a map-side-combinable
collect_list, sorted row-locally per key (the sessionize discipline —
per-key stream length is bounded by per-key activity, never by corpus
size; symbol strings are 1 byte/event). The regex runs row-locally
inside codegen. Skewed keys cost O(their own stream), nothing
quadratic, nothing global.

Cross-engine determinism: the stream orders by (ts, id) — a total
order; the pattern uses only RE2-safe constructs (no backreferences,
no lookaround) with unambiguous greedy semantics, so Java regex and
DuckDB's RE2 find the identical non-overlapping match set.

Reference parity: none (extension; the reference has no ordered-
stream surface at all).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# view → click → purchase with NO intervening purchase: the strict
# conversion path. Symbols are event_type initials (unique here:
# signup/error/click/view/purchase → s e c v p).
CONVERSION = "v[^p]*c[^p]*p"


def symbol_streams(
    events: DataFrame, key_col: str, ts_col: str, id_col: str,
    symbol: Column,
) -> DataFrame:
    """(key, stream): each key's events as one ordered symbol string.

    `symbol` must evaluate to a single character per event. Order is
    (ts, id) — total, hence deterministic under shuffle."""
    return events.groupBy(F.col(key_col)).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col(ts_col), F.col(id_col), symbol.alias("c")
                        )
                    )
                ),
                lambda s: s["c"],
            ),
            "",
        ).alias("stream")
    )


def match_pattern(
    events: DataFrame, key_col: str, ts_col: str, id_col: str,
    symbol: Column, pattern: str,
) -> DataFrame:
    """(key, n_events, n_matches): non-overlapping leftmost pattern
    occurrences per key — AFTER MATCH SKIP PAST LAST ROW."""
    streams = symbol_streams(events, key_col, ts_col, id_col, symbol)
    return streams.select(
        key_col,
        F.length("stream").alias("n_events"),
        F.regexp_count("stream", F.lit(pattern)).alias("n_matches"),
    )


# ------------------------------------------------- registered query


def q_event_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict conversion paths (view→click→purchase, no purchase in
    between) per user, plus total purchases for the conversion ratio."""
    from tcrd_spark.sources.lake import load_table

    events = load_table(spark, sf_dir, "events")
    sym = F.substring("event_type", 1, 1)
    streams = symbol_streams(events, "user_id", "ts", "event_id", sym)
    return streams.select(
        "user_id",
        F.length("stream").alias("n_events"),
        F.regexp_count("stream", F.lit(CONVERSION)).alias("n_paths"),
        F.regexp_count("stream", F.lit("p")).alias("n_purchases"),
    )


def q_session_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion paths WITHIN a session (30-min gap sessionizer →
    per-(user, session) symbol streams → the same regex): the
    time-bounded form of MATCH_RECOGNIZE patterns — a view from last
    week can't start this week's conversion. The 30-min-gap session id
    is the `operators/temporal.sessionize` rule inlined (that function
    projects event_type away; re-deriving the 4-line window here keeps
    the symbol column without churning the adjudicated sessionizer's
    closure); one user window + one (user, session) combinable agg."""
    from tcrd_spark.sources.lake import load_table
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    secs = lambda c: F.col(c).cast("timestamp").cast("double")  # noqa: E731
    prev = F.lag("ts").over(w)
    is_start = F.when(
        prev.isNull()
        | ((secs("ts") - prev.cast("timestamp").cast("double")) > 1800),
        1,
    ).otherwise(0)
    sess = events.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.sum(is_start)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("session_id"),
    )
    sym = F.substring("event_type", 1, 1)
    streams = sess.groupBy("user_id", "session_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("ts"), F.col("event_id"), sym.alias("c")
                        )
                    )
                ),
                lambda s: s["c"],
            ),
            "",
        ).alias("stream")
    )
    return streams.select(
        "user_id",
        "session_id",
        F.length("stream").alias("n_events"),
        F.regexp_count("stream", F.lit(CONVERSION)).alias("n_paths"),
    )


QUERIES = {
    "event_pattern_match": q_event_pattern_match,
    "session_pattern_match": q_session_pattern_match,
}

ORACLE = {
    "event_pattern_match": f"""
        WITH s AS (
          SELECT user_id,
                 string_agg(substr(event_type, 1, 1), ''
                            ORDER BY ts, event_id) AS stream
          FROM events GROUP BY user_id
        )
        SELECT user_id,
               length(stream) AS n_events,
               cast(length(regexp_extract_all(stream, '{CONVERSION}'))
                    AS BIGINT) AS n_paths,
               cast(length(regexp_extract_all(stream, 'p'))
                    AS BIGINT) AS n_purchases
        FROM s
    """,
    "session_pattern_match": f"""
        WITH o AS (
          SELECT user_id, event_id, ts, event_type,
                 lag(ts) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
          FROM events
        ), sess AS (
          SELECT user_id, event_id, ts, event_type,
                 CAST(sum(CASE WHEN prev IS NULL
                               OR epoch(ts) - epoch(prev) > 1800
                               THEN 1 ELSE 0 END)
                      OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING)
                      AS BIGINT) AS session_id
          FROM o
        ), s AS (
          SELECT user_id, session_id,
                 string_agg(substr(event_type, 1, 1), ''
                            ORDER BY ts, event_id) AS stream
          FROM sess GROUP BY user_id, session_id
        )
        SELECT user_id, session_id,
               length(stream) AS n_events,
               cast(length(regexp_extract_all(stream, '{CONVERSION}'))
                    AS BIGINT) AS n_paths
        FROM s
    """,
}
