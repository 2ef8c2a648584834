"""Marketing-touch attribution: first-touch and last-touch credit for
each conversion within a lookback window.

For every `purchase` event, find the FIRST and LAST `click` the same
user made in the preceding lookback period (strictly before the
purchase). The classic two-model attribution pair — last-touch is what
ad platforms bill on, first-touch is what growth teams argue for — and
the reference has no temporal-credit operator at all (its event-ish
data is load-time only).

100 TB shape: one window pass, partitioned by USER and ordered by
event time with a RANGE frame in seconds — every user's events stay in
one partition's sorted run, the frame is time-bounded so state per row
is the lookback's events, and conversions filter AFTER the window so
the same pass serves any number of conversion types. No join: the
as-of-join formulation (`operators/temporal.py`) would need two joins
(first + last); the conditional-window form does both in one pass.
`first/last(..., ignorenulls=True)` over the conditioned column picks
touches out of the mixed event stream without exploding it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

LOOKBACK_S = 7 * 24 * 3600


def touch_attribution(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    id_col: str,
    type_col: str,
    conversion: str = "purchase",
    touch: str = "click",
    lookback_s: int = LOOKBACK_S,
) -> DataFrame:
    """(user, conversion_id, ts, first_touch_id, last_touch_id,
    n_touches) for every conversion event.

    Touches strictly precede the conversion (frame ends at -1s);
    conversions with no touch in the window keep NULL touch ids —
    'organic' rows are data, not dropped rows.
    """
    # order/frame in MICROseconds (second-granularity frames would pull
    # same-second events in or out of the lookback inconsistently).
    # first/last(... IGNORE NULLS) over the frame would be
    # NONDETERMINISTIC whenever two touches share a timestamp — frame
    # peers have no order (ADVICE r6) — so the earliest/latest touch is
    # a MIN/MAX over a (time, id) struct instead: total order, id
    # tie-break, same one-pass frame. (The testdata happens to have
    # unique (user, ts), asserted in tests/test_attribution.py, but the
    # operator must not depend on that.)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = (
        Window.partitionBy(user_col)
        .orderBy(us)
        .rangeBetween(-lookback_s * 1_000_000, -1)
    )
    touch_id = F.when(F.col(type_col) == touch, F.col(id_col))
    touch_key = F.when(
        F.col(type_col) == touch,
        F.struct(us.alias("us"), F.col(id_col).alias("id")),
    )
    return (
        events.select(
            user_col,
            ts_col,
            type_col,
            F.col(id_col),
            F.min(touch_key).over(w).getField("id").alias("first_touch_id"),
            F.max(touch_key).over(w).getField("id").alias("last_touch_id"),
            F.count(touch_id).over(w).alias("n_touches"),
        )
        .filter(F.col(type_col) == conversion)
        .select(
            user_col,
            F.col(id_col).alias("conversion_id"),
            ts_col,
            "first_touch_id",
            "last_touch_id",
            "n_touches",
        )
    )


# ------------------------------------------------- registered queries


def q_attribution_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First/last click attribution for every purchase within a 7-day
    lookback, per user."""
    from tcrd_spark.sources.lake import load_table

    ev = load_table(spark, sf_dir, "events")
    return touch_attribution(
        ev, "user_id", "ts", "event_id", "event_type"
    )


QUERIES = {"attribution_touch": q_attribution_touch}

ORACLE = {
    "attribution_touch": f"""
        WITH scored AS (
            SELECT user_id, ts, event_type, event_id,
                   struct_extract(min(CASE WHEN event_type = 'click'
                         THEN struct_pack(us := epoch_us(ts),
                                          id := event_id) END)
                       OVER w, 'id') AS first_touch_id,
                   struct_extract(max(CASE WHEN event_type = 'click'
                         THEN struct_pack(us := epoch_us(ts),
                                          id := event_id) END)
                       OVER w, 'id') AS last_touch_id,
                   count(CASE WHEN event_type = 'click'
                              THEN event_id END) OVER w AS n_touches
            FROM events
            WINDOW w AS (
                PARTITION BY user_id
                ORDER BY epoch_us(ts)
                RANGE BETWEEN {LOOKBACK_S * 1_000_000} PRECEDING
                         AND 1 PRECEDING
            )
        )
        SELECT user_id, event_id AS conversion_id, ts,
               first_touch_id, last_touch_id, n_touches
        FROM scored WHERE event_type = 'purchase'
    """,
}
