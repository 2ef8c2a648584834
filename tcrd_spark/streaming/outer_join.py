"""Watermarked stream-stream LEFT OUTER join.

The inner form (`jobs.stream_stream_time_join`) answers "which views
got a click within the lookback"; the outer form also answers "which
views did NOT" — the attribution/abandonment shape (view with no
click ⇒ emit once with null click columns).

Semantics Spark gives this join (and the test pins): a left row's
outer (null-matched) result is emitted only when the GLOBAL watermark
— the minimum across both sources — passes `left_ts + lookback +
watermark`, i.e. when no future right row could still match it. Until
then the row sits in the left state buffer. So outer results are
eventually-emitted, not immediate; a stalled right source stalls the
left outer emissions too. State eviction is identical to the inner
join: the two-sided range predicate bounds both buffers.

100 TB shape: state is hash-partitioned on the equi keys like any
streaming join; the lookback bounds the left buffer to
(rows/minute × lookback) per key range. Nothing new vs the inner
join but the emission rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_left_outer_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    watermark: str = "30 minutes",
    lookback: str = "10 minutes",
) -> DataFrame:
    """Left-outer within-lookback join: every left row emits exactly
    once — with its matches inside [left_ts, left_ts + lookback], or
    with nulls once the watermark proves no match can arrive. Column
    names other than `on` must be disjoint."""
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = None
    for k in on:
        c = lw[k] == rw[k]
        cond = c if cond is None else (cond & c)
    cond = (
        cond
        & (rw[right_ts] >= lw[left_ts])
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"interval {lookback}"))
    )
    out_cols = (
        [lw[k] for k in on]
        + [lw[c] for c in left.columns if c not in on]
        + [rw[c] for c in right.columns if c not in on]
    )
    return lw.join(rw, cond, "leftOuter").select(*out_cols)
