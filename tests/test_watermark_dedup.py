"""dropDuplicatesWithinWatermark semantics under replay: in-horizon
duplicates collapse to batch-distinct; state eviction re-admits a key
after the watermark passes (the bounded-state trade, asserted so the
docstring's claim stays honest)."""

from __future__ import annotations

import json
import os

import pytest


def _write_batch(src_dir: str, rows: list[dict], name: str) -> None:
    path = os.path.join(src_dir, f"{name}.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.rename(tmp, path)


def _ev(eid: int, ts: str, user: int = 1):
    return {
        "event_id": eid,
        "ts": ts,
        "user_id": user,
        "event_type": "click",
        "value": 1.0,
    }


@pytest.fixture()
def stream_dirs(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    return str(src), str(tmp_path / "ckpt")


def test_in_horizon_duplicates_collapse(spark, stream_dirs):
    from tcrd_spark.streaming.jobs import (
        read_event_stream,
        run_to_memory_sink,
    )
    from tcrd_spark.streaming.watermark_dedup import dedup_events_exact

    src, ckpt = stream_dirs
    stream = read_event_stream(spark, src)
    q = run_to_memory_sink(
        dedup_events_exact(stream, "30 minutes"),
        "wmdedup1", "append", ckpt,
    )
    try:
        # duplicate inside one batch AND across batches, all within
        # the 30-minute horizon
        _write_batch(src, [
            _ev(1, "2024-01-01T10:00:00"),
            _ev(1, "2024-01-01T10:00:05"),
            _ev(2, "2024-01-01T10:01:00"),
        ], "b0")
        q.processAllAvailable()
        _write_batch(src, [
            _ev(2, "2024-01-01T10:02:00"),
            _ev(3, "2024-01-01T10:03:00"),
        ], "b1")
        q.processAllAvailable()
        got = spark.sql(
            "SELECT event_id FROM wmdedup1 ORDER BY event_id"
        ).collect()
        assert [r.event_id for r in got] == [1, 2, 3]
    finally:
        q.stop()


def test_eviction_readmits_key_past_horizon(spark, stream_dirs):
    from tcrd_spark.streaming.jobs import (
        read_event_stream,
        run_to_memory_sink,
    )
    from tcrd_spark.streaming.watermark_dedup import dedup_events_exact

    src, ckpt = stream_dirs
    stream = read_event_stream(spark, src)
    q = run_to_memory_sink(
        dedup_events_exact(stream, "10 minutes"),
        "wmdedup2", "append", ckpt,
    )
    try:
        _write_batch(src, [_ev(1, "2024-01-01T10:00:00")], "b0")
        q.processAllAvailable()
        # push the watermark far past 10:10 → key 1's state evicts
        _write_batch(src, [_ev(99, "2024-01-01T12:00:00")], "b1")
        q.processAllAvailable()
        # key 1 recurs with a CURRENT timestamp: state is gone, so it
        # is emitted again — bounded state, not global uniqueness
        _write_batch(src, [_ev(1, "2024-01-01T12:01:00")], "b2")
        q.processAllAvailable()
        got = [
            r.event_id
            for r in spark.sql(
                "SELECT event_id FROM wmdedup2 ORDER BY event_id"
            ).collect()
        ]
        assert got == [1, 1, 99]
    finally:
        q.stop()
