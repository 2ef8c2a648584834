"""Analytic-extension axioms on constructed data (values vs DuckDB
ride the registry sweep)."""

from __future__ import annotations

from datetime import date

from tcrd_spark.operators.analytic_ext import (
    merge_intervals,
    rolling_anomaly,
    winsorize,
)


def test_anomaly_flags_spike_not_history(spark):
    rows = [(1, i, 10.0 + (i % 3) * 0.1, i) for i in range(1, 21)]
    rows.append((1, 21, 500.0, 21))  # the spike
    df = spark.createDataFrame(rows, "k long, ts long, value double, seq long")
    got = {r.ts: r for r in rolling_anomaly(df, "k", "ts", "value", 20, "seq").collect()}
    assert got[21].z is not None and got[21].z > 10
    # spike never contaminates its own window: its mu is pre-spike
    assert got[21].mu < 11
    # first row has no history -> NULL z
    assert got[1].z is None


def test_anomaly_constant_history_null_z(spark):
    rows = [(1, i, 5.0, i) for i in range(1, 10)]
    df = spark.createDataFrame(rows, "k long, ts long, value double, seq long")
    assert all(
        r.z is None
        for r in rolling_anomaly(df, "k", "ts", "value", 20, "seq").collect()
    )


def _iv(spark, rows):
    df = spark.createDataFrame(rows, "k long, s date, e date")
    return sorted(
        (r.start, r.end, r.n_merged)
        for r in merge_intervals(df, "k", "s", "e").collect()
    )


def test_intervals_overlap_touch_and_gap(spark):
    rows = [
        (1, date(2024, 1, 1), date(2024, 1, 5)),
        (1, date(2024, 1, 4), date(2024, 1, 8)),   # overlaps
        (1, date(2024, 1, 8), date(2024, 1, 10)),  # touches -> same island
        (1, date(2024, 1, 12), date(2024, 1, 13)), # gap -> new island
    ]
    got = _iv(spark, rows)
    assert got == [
        (date(2024, 1, 1), date(2024, 1, 10), 3),
        (date(2024, 1, 12), date(2024, 1, 13), 1),
    ]


def test_intervals_contained_span(spark):
    # an interval fully inside an earlier one must not split the island
    rows = [
        (1, date(2024, 1, 1), date(2024, 1, 20)),
        (1, date(2024, 1, 2), date(2024, 1, 3)),
        (1, date(2024, 1, 5), date(2024, 1, 25)),
    ]
    got = _iv(spark, rows)
    assert got == [(date(2024, 1, 1), date(2024, 1, 25), 3)]


def test_winsorize_clips_only_tails(spark):
    rows = [("g", float(v)) for v in range(1, 101)]
    df = spark.createDataFrame(rows, "g string, value double")
    got = {r.value: r.clipped for r in winsorize(df, ["g"], "value").collect()}
    assert got[1.0] > 1.0 and got[100.0] < 100.0  # tails clipped
    assert got[50.0] == 50.0  # interior untouched
    assert min(got.values()) == got[1.0] == got[5.0] or got[1.0] >= 5.0


def test_transition_probabilities_sum_to_one(spark, sf_dir):
    from pyspark.sql import functions as F

    from tcrd_spark.operators.analytic_ext import q_event_transitions

    df = q_event_transitions(spark, sf_dir)
    sums = df.groupBy("state_from").agg(F.sum("p").alias("s")).collect()
    assert all(abs(r.s - 1.0) < 1e-4 for r in sums)


def test_transition_known_chain(spark):
    from datetime import datetime

    from tcrd_spark.operators.analytic_ext import transition_matrix

    t0 = datetime(2024, 1, 1)
    rows = [
        (1, t0.replace(hour=h), s, h)
        for h, s in enumerate(["a", "b", "a", "b", "a", "c"])
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp, s string, e long")
    got = {
        (r.state_from, r.state_to): (r.n, r.p)
        for r in transition_matrix(df, "k", "ts", "s", "e").collect()
    }
    # a -> b twice, a -> c once; b -> a twice
    assert got[("a", "b")] == (2, round(2 / 3, 6))
    assert got[("a", "c")] == (1, round(1 / 3, 6))
    assert got[("b", "a")] == (2, 1.0)
