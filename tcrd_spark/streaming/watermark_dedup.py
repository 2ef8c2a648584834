"""Watermarked streaming deduplication — bounded-state exactly-once-
per-key emission within an event-time horizon.

Two standard shapes over an event stream:

- ``dedup_within_watermark``: Spark's ``dropDuplicatesWithinWatermark``
  — each key is emitted once; its state entry is EVICTED when the
  watermark passes ``first_seen_ts + delay``. Bounded state (keys seen
  within the horizon), the production default for at-scale streams
  where keys don't recur forever. Contrast with
  ``streaming/jobs.streaming_exact_dedup`` (applyInPandasWithState
  first-seen): that keeps state for the stream's lifetime — global
  uniqueness, unbounded state. This operator is the horizon-bounded
  member of the family.

- ``dedup_events_exact``: the same call keyed on the natural event id.

State is hash-partitioned by key like any streaming aggregate; at
100 TB/day the horizon bounds state to (keys/hour × horizon), and
eviction is watermark-driven — no TTL scan, no external store.

No SQL oracle (streaming-runtime semantics — eviction and lateness
have no DuckDB twin); verified by replay tests in
tests/test_watermark_dedup.py: in-horizon duplicates collapse to the
batch-distinct result, and a duplicate arriving after its key's state
eviction is re-emitted (the documented, bounded-state trade).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_within_watermark(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str,
    delay: str = "30 minutes",
) -> DataFrame:
    """Emit the first row per key; forget keys once the event-time
    watermark passes their arrival + delay."""
    return stream.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        key_cols
    )


def dedup_events_exact(
    stream: DataFrame, delay: str = "30 minutes"
) -> DataFrame:
    """Event-stream dedup on the natural key within the horizon."""
    return dedup_within_watermark(stream, ["event_id"], "ts", delay)
