"""Pattern-match pins (operators/patterns.py): stream ordering is
(ts, id)-total, matching is non-overlapping leftmost (SKIP PAST LAST
ROW), and the exclusion class actually excludes."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from tcrd_spark.operators.patterns import match_pattern, symbol_streams


def _events(spark, seq):
    """seq: list of (key, symbol) in intended time order."""
    rows = [
        (k, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i), i, c)
        for i, (k, c) in enumerate(seq)
    ]
    return spark.createDataFrame(
        rows, "key string, ts timestamp, id long, etype string"
    )


def _streams(spark, seq):
    ev = _events(spark, seq)
    out = symbol_streams(ev, "key", "ts", "id", F.col("etype"))
    return {r.key: r.stream for r in out.collect()}


def test_stream_orders_by_ts_then_id(spark):
    got = _streams(spark, [("a", "v"), ("a", "c"), ("a", "p"), ("b", "x")])
    assert got == {"a": "vcp", "b": "x"}


def test_ties_break_on_id(spark):
    ts = dt.datetime(2024, 1, 1)
    rows = [("a", ts, 2, "c"), ("a", ts, 1, "v"), ("a", ts, 3, "p")]
    ev = spark.createDataFrame(
        rows, "key string, ts timestamp, id long, etype string"
    )
    out = symbol_streams(ev, "key", "ts", "id", F.col("etype")).collect()
    assert out[0].stream == "vcp"


def test_non_overlapping_skip_past_last_row(spark):
    # vcpvcp → two disjoint matches; vcvcp → ONE (leftmost v, greedy
    # middle), the second v is inside the first match
    seq = [("a", c) for c in "vcpvcp"] + [("b", c) for c in "vcvcp"]
    ev = _events(spark, seq)
    out = {
        r.key: r.n_matches
        for r in match_pattern(
            ev, "key", "ts", "id", F.col("etype"), "v[^p]*c[^p]*p"
        ).collect()
    }
    assert out == {"a": 2, "b": 1}


def test_exclusion_class_blocks_cross_purchase_paths(spark):
    # v..p..c..p: the only click comes AFTER a purchase — no strict
    # path (funnel_stages' min/max trick would count this one)
    seq = [("a", c) for c in "vpcp"]
    ev = _events(spark, seq)
    out = match_pattern(
        ev, "key", "ts", "id", F.col("etype"), "v[^p]*c[^p]*p"
    ).collect()
    assert out[0].n_matches == 0
