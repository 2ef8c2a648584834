"""Streaming gap-based sessionization with bounded, evictable state
(VERDICT r6 next-step #5 — completes SURVEY §2.11 against the batch
`operators/temporal.sessionize` and skew variants).

Sessions are labeled by their START TIMESTAMP, not a running index:
a session's identity must survive state eviction. State per user is
two longs (last event time, current session start); an EVENT-TIME
timeout evicts a user once the watermark passes last_ts + gap — at
that point no on-time event can extend the session, and any later
event for that user necessarily starts a NEW session (its own ts
becomes the label), so eviction never changes the output. That is the
bound a 100 TB deployment needs: state ∝ concurrently-active users,
never ∝ users-ever-seen.

Batch equivalence (pytest-replayed): per-event (user_id, event_id, ts,
session_start) equals the batch `sessionize` output with session_id
mapped to its session's min ts. Contract: per-user event-time order
across micro-batches (the replay fixture stages chunks in ts order;
a Kafka deployment gets this from per-key partition ordering) — a
same-user out-of-order pair WITHIN one micro-batch is fine (sorted
locally), across batches it is the usual watermark-late story.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

GAP_SECONDS = 1800

SESS_OUT_SCHEMA = (
    "user_id long, event_id long, ts timestamp, session_start timestamp"
)
SESS_STATE_SCHEMA = "last_us long, start_us long"


def _gap_fn(gap_seconds: int):
    gap_us = gap_seconds * 1_000_000

    def fn(
        key, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            # watermark passed last_ts + gap: the open session can no
            # longer be extended by an on-time event — drop the state
            state.remove()
            return
        (user_id,) = key
        last_us, start_us = state.get if state.exists else (None, None)
        pdf = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        out_uid, out_eid, out_ts, out_start = [], [], [], []
        for ts, eid in zip(pdf["ts"], pdf["event_id"]):
            us = ts.value // 1000  # ns -> µs
            if last_us is None or us - last_us > gap_us:
                start_us = us
            last_us = us
            out_uid.append(user_id)
            out_eid.append(int(eid))
            out_ts.append(ts)
            out_start.append(pd.Timestamp(start_us * 1000))
        state.update((int(last_us), int(start_us)))
        # evict once the watermark passes the last possible extension
        state.setTimeoutTimestamp(last_us // 1000 + gap_seconds * 1000 + 1)
        yield pd.DataFrame(
            {
                "user_id": out_uid,
                "event_id": out_eid,
                "ts": out_ts,
                "session_start": out_start,
            }
        )

    return fn


def streaming_sessionize(
    events: DataFrame,
    gap_seconds: int = GAP_SECONDS,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Per-event session labels over an event stream; state store holds
    (last_us, start_us) per ACTIVE user only (event-time eviction)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _gap_fn(gap_seconds),
            outputStructType=SESS_OUT_SCHEMA,
            stateStructType=SESS_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def batch_session_starts(
    events: DataFrame, gap_seconds: int = GAP_SECONDS
) -> DataFrame:
    """The batch twin: `temporal.sessionize` with the running session
    index mapped to the session's start (min ts) — the eviction-stable
    label the streaming operator emits."""
    from pyspark.sql import functions as F

    from tcrd_spark.operators.temporal import sessionize

    s = sessionize(events, "user_id", "ts", "event_id", gap_seconds)
    starts = s.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start")
    )
    return s.join(starts, ["user_id", "session_id"]).select(
        "user_id", "event_id", "ts", "session_start"
    )
