"""Forward as-of join — the next-event twin of `temporal.asof_join`:
every left row picks the EARLIEST right row at or after its time,
per key (time-to-next-purchase, next-error-after-deploy, label =
outcome that FOLLOWS the feature snapshot).

Implemented by time reversal over the existing backward machinery —
negate the (fractional-epoch) timestamps and the tie-break order, run
the backward union+window sorted-merge, un-negate nothing (the
payload columns ride through untouched; the negated helper columns
are dropped). Semantics fall out exactly: backward's
"greatest ts <= t, ties to MAX order" becomes "least ts >= t, ties to
MIN order", and the tolerance window "match not older than W" becomes
"match not further ahead than W". Same plan: ONE hash exchange on the
keys + one sorted window — never a range-predicate join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tcrd_spark.operators.temporal import asof_join


def forward_asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    right_order: str | None = None,
    tolerance_seconds: float | None = None,
    prefix: str = "r_",
) -> DataFrame:
    """Every left row + `right_cols` from the right row with the
    SMALLEST `right_ts` >= the left row's `left_ts` within the same
    keys; ties on right_ts break to the smallest `right_order`; NULLs
    when no such row (or none within `tolerance_seconds` ahead)."""
    def neg(c):
        return (-F.col(c).cast("timestamp").cast("double")).alias(f"_neg_{c}")

    l2 = left.withColumn(f"_neg_{left_ts}", neg(left_ts))
    r2 = right.withColumn(f"_neg_{right_ts}", neg(right_ts))
    if right_order is not None:
        # the tie-break rides through negation, so it must be numeric —
        # a string order column would cast('double') to NULL silently,
        # making same-timestamp ties nondeterministic (r7 ADVICE)
        from pyspark.sql import types as T

        dt = right.schema[right_order].dataType
        if not isinstance(dt, T.NumericType):
            raise TypeError(
                f"forward_asof_join: right_order={right_order!r} has "
                f"non-numeric type {dt.simpleString()}; the tie-break "
                "is negated numerically — pass a numeric column or a "
                "monotone numeric surrogate (e.g. xxhash64 is NOT "
                "monotone; a row_number over the natural order is)"
            )
        r2 = r2.withColumn(
            "_neg_ord", -F.col(right_order).cast("double")
        )
    out = asof_join(
        l2,
        r2,
        on=on,
        left_ts=f"_neg_{left_ts}",
        right_ts=f"_neg_{right_ts}",
        right_cols=right_cols + [right_ts],
        right_order="_neg_ord" if right_order is not None else None,
        tolerance_seconds=tolerance_seconds,
        prefix=prefix,
    )
    return out.drop(f"_neg_{left_ts}", f"{prefix}_neg_{right_ts}")


# ------------------------------------------------- registered query


def q_asof_forward_events(spark, sf_dir):
    """Outcome-after-feature: each click joined to the SAME user's
    NEXT purchase at or after it (clicks after the user's last
    purchase exercise the NULL branch)."""
    from tcrd_spark.sources.lake import load_table

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts", "value"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value"
    )
    return forward_asof_join(
        clicks,
        purchases,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_cols=["event_id", "value"],
        right_order="event_id",
    )


QUERIES = {"asof_forward_events": q_asof_forward_events}

ORACLE = {
    "asof_forward_events": """
        WITH c AS (
          SELECT event_id, user_id, ts, value FROM events
          WHERE event_type = 'click'
        ),
        p AS (
          SELECT event_id, user_id, ts, value FROM events
          WHERE event_type = 'purchase'
        ),
        m AS (
          SELECT c.event_id,
                 p.event_id AS pid, p.value AS pval, p.ts AS pts,
                 row_number() OVER (
                   PARTITION BY c.event_id
                   ORDER BY p.ts ASC, p.event_id ASC) AS rn
          FROM c JOIN p ON p.user_id = c.user_id AND p.ts >= c.ts
        )
        SELECT c.user_id, c.event_id, c.ts, c.value,
               m.pid AS r_event_id, m.pval AS r_value, m.pts AS r_ts
        FROM c LEFT JOIN (SELECT * FROM m WHERE rn = 1) m
          USING (event_id)
    """,
}
