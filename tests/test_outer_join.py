"""Stream-stream LEFT OUTER watermarked join (streaming/outer_join.py):
matches emit immediately; unmatched left rows emit with nulls only
after the global watermark proves no match can arrive; a click outside
the lookback does not count as a match."""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

V_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("v_id", LongType()),
        StructField("v_ts", TimestampType()),
    ]
)
C_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("c_id", LongType()),
        StructField("c_ts", TimestampType()),
    ]
)


def _write(src, rows, name):
    path = os.path.join(src, f"{name}.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.rename(tmp, path)


def test_left_outer_emits_unmatched_after_watermark(spark, tmp_path):
    from tcrd_spark.streaming.jobs import run_to_memory_sink
    from tcrd_spark.streaming.outer_join import (
        stream_stream_left_outer_join,
    )

    v_src = str(tmp_path / "v")
    c_src = str(tmp_path / "c")
    os.makedirs(v_src)
    os.makedirs(c_src)

    views = (
        spark.readStream.schema(V_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(v_src)
    )
    clicks = (
        spark.readStream.schema(C_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(c_src)
    )
    joined = stream_stream_left_outer_join(
        views, clicks, on=["user_id"], left_ts="v_ts", right_ts="c_ts",
        watermark="1 minute", lookback="10 minutes",
    )
    name = f"ssoj_{uuid.uuid4().hex[:8]}"
    q = run_to_memory_sink(joined, name, "append", str(tmp_path / "ckpt"))
    try:
        # user 1: click inside the lookback → match
        # user 2: no click at all → outer
        # user 3: click 18 min later (outside lookback) → outer
        _write(v_src, [
            {"user_id": 1, "v_id": 11, "v_ts": "2024-01-01T10:00:00"},
            {"user_id": 2, "v_id": 22, "v_ts": "2024-01-01T10:01:00"},
            {"user_id": 3, "v_id": 33, "v_ts": "2024-01-01T10:02:00"},
        ], "b0")
        _write(c_src, [
            {"user_id": 1, "c_id": 101, "c_ts": "2024-01-01T10:05:00"},
            {"user_id": 3, "c_id": 303, "c_ts": "2024-01-01T10:20:00"},
        ], "b0")
        q.processAllAvailable()
        # only the in-lookback match is out so far — outer rows must
        # wait for the watermark, which needs BOTH sources to advance
        sofar = {
            r["v_id"]
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        }
        assert sofar == {11}

        # sentinels on both streams push the global watermark far past
        # every horizon (v_ts + lookback + delay); one more trigger
        # then flushes the expired left state
        _write(v_src, [
            {"user_id": 999, "v_id": 999, "v_ts": "2024-01-01T12:00:00"}
        ], "b1")
        _write(c_src, [
            {"user_id": 999, "c_id": 999, "c_ts": "2024-01-01T12:00:00"}
        ], "b1")
        q.processAllAvailable()
        _write(v_src, [
            {"user_id": 998, "v_id": 998, "v_ts": "2024-01-01T13:00:00"}
        ], "b2")
        _write(c_src, [
            {"user_id": 998, "c_id": 998, "c_ts": "2024-01-01T13:00:00"}
        ], "b2")
        q.processAllAvailable()

        rows = {
            (r["user_id"], r["v_id"], r["c_id"])
            for r in spark.sql(f"SELECT * FROM {name}").collect()
            if r["user_id"] < 900
        }
        assert rows == {
            (1, 11, 101),   # matched, click inside lookback
            (2, 22, None),  # never clicked
            (3, 33, None),  # clicked too late to attribute
        }
    finally:
        q.stop()
