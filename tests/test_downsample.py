"""LTTB-lite pins (operators/downsample.py): one representative per
(key, bucket), spikes survive where bucket-averaging would erase them,
ties break to the earliest point, and edge buckets degrade gracefully
(self-anchored)."""

from __future__ import annotations

import datetime as dt

from tcrd_spark.operators.downsample import lttb_downsample


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def test_spike_survives_downsampling(spark):
    """Hour 1 holds a flat series plus one spike; the average would
    report ~12, LTTB-lite keeps the spike point itself."""
    rows = (
        [("a", _ts(0, 30), 10.0)]
        + [("a", _ts(1, m), 10.0) for m in (0, 10, 20, 40, 50)]
        + [("a", _ts(1, 30), 100.0)]  # the spike
        + [("a", _ts(2, 30), 10.0)]
    )
    df = spark.createDataFrame(rows, "key string, ts timestamp, v double")
    out = {
        (r.key, r.bucket.hour): r
        for r in lttb_downsample(df, "key", "ts", "v", "hour").collect()
    }
    assert len(out) == 3  # one representative per bucket
    assert out[("a", 1)].v == 100.0
    assert out[("a", 1)].ts == _ts(1, 30)


def test_tie_breaks_to_earliest(spark):
    rows = [
        ("a", _ts(0, 10), 5.0),
        ("a", _ts(0, 40), 5.0),  # identical geometry, later
    ]
    df = spark.createDataFrame(rows, "key string, ts timestamp, v double")
    out = lttb_downsample(df, "key", "ts", "v", "hour").collect()
    assert len(out) == 1 and out[0].ts == _ts(0, 10)


def test_keys_are_isolated(spark):
    rows = [
        ("a", _ts(0, 10), 1.0), ("a", _ts(1, 10), 2.0),
        ("b", _ts(0, 20), 9.0),
    ]
    df = spark.createDataFrame(rows, "key string, ts timestamp, v double")
    out = lttb_downsample(df, "key", "ts", "v", "hour").collect()
    assert {(r.key, r.bucket.hour) for r in out} == {
        ("a", 0), ("a", 1), ("b", 0)
    }
