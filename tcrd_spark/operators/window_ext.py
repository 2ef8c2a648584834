"""Ranking-function family completion (SURVEY §2.5): percent_rank,
cume_dist, ntile, and nth_value in one key-partitioned pass — the
remaining ANSI window functions the reference's R scripts approximate
with manual rank arithmetic (`R/hgram.R` normalizes ranks by group
size; percent_rank IS that normalization).

One window spec (partition by order priority, order by price + key
tie-break), every function over it — a single Exchange + sort in the
plan; nothing global.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

NTILES = 4


def rank_functions(
    df: DataFrame, part_col: str, order_col: str, id_col: str,
    ntiles: int = NTILES,
) -> DataFrame:
    """(part, id, order, pct_rank, cume_dist, tile, first_in_part):
    the four ranking functions over one (partition, order, tiebreak)
    window."""
    w = Window.partitionBy(part_col).orderBy(order_col, id_col)
    return df.select(
        F.col(part_col),
        F.col(id_col),
        F.col(order_col),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume_dist"),
        F.ntile(ntiles).over(w).alias("tile"),
        F.first(id_col).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("first_in_part"),
    )


LOOKBACK_S = 3600


def range_interval_rollup(
    events: DataFrame, user_col: str, ts_col: str, id_col: str,
    val_col: str, lookback_s: int = LOOKBACK_S,
) -> DataFrame:
    """Per event: sum/count of the SAME USER's values within the
    trailing `lookback_s` seconds — a RANGE (value-based) frame, the
    window feature ROWS frames can't express when events are
    irregularly spaced (velocity checks, rate limits, trailing
    exposure). One user-keyed exchange; the frame is evaluated over
    the sorted run, never materialized. Ties share the frame by VALUE
    (RANGE semantics) so no tie-break is needed for determinism."""
    epoch = F.col(ts_col).cast("timestamp").cast("double")
    w = (
        Window.partitionBy(user_col)
        .orderBy(epoch.alias("_ep"))
        .rangeBetween(-lookback_s, 0)
    )
    return events.select(
        F.col(id_col),
        F.col(user_col),
        epoch.alias("epoch_s"),
        F.round(F.sum(val_col).over(w), 4).alias("trail_sum"),
        F.count(F.lit(1)).over(w).alias("trail_n"),
    )


# ------------------------------------------------- registered query


def q_window_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-hour per-user value rollup over the events stream —
    the RANGE-frame complement to the ROWS-frame rolling_anomaly."""
    from tcrd_spark.sources.lake import load_table

    events = load_table(spark, sf_dir, "events")
    return range_interval_rollup(
        events, "user_id", "ts", "event_id", "value", LOOKBACK_S
    )


def q_window_rank_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-family pass over orders: per order-priority partition,
    price percentile standing, cumulative share, quartile, and the
    partition's cheapest order. 2% sample bounds the compare set."""
    from tcrd_spark.sources.lake import load_table

    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 50 == 0
    ).select(
        "o_orderpriority", "o_orderkey",
        F.round("o_totalprice", 2).alias("price"),
    )
    return rank_functions(
        orders, "o_orderpriority", "price", "o_orderkey", NTILES
    )


QUERIES = {
    "window_rank_funcs": q_window_rank_funcs,
    "window_range_interval": q_window_range_interval,
}

ORACLE = {
    "window_rank_funcs": f"""
        WITH o AS (
          SELECT o_orderpriority, o_orderkey,
                 round(o_totalprice, 2) AS price
          FROM orders WHERE o_orderkey % 50 = 0
        )
        SELECT o_orderpriority, o_orderkey, price,
               round(percent_rank() OVER w, 6) AS pct_rank,
               round(cume_dist() OVER w, 6) AS cume_dist,
               ntile({NTILES}) OVER w AS tile,
               first_value(o_orderkey) OVER (
                 PARTITION BY o_orderpriority
                 ORDER BY price, o_orderkey
                 ROWS UNBOUNDED PRECEDING) AS first_in_part
        FROM o
        WINDOW w AS (PARTITION BY o_orderpriority
                     ORDER BY price, o_orderkey)
    """,
    "window_range_interval": f"""
        SELECT event_id, user_id,
               epoch(ts) AS epoch_s,
               round(sum(value) OVER w, 4) AS trail_sum,
               count(*) OVER w AS trail_n
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch(ts)
                     RANGE BETWEEN {LOOKBACK_S} PRECEDING
                     AND CURRENT ROW)
    """,
}
