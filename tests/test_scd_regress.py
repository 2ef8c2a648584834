"""SCD2 and grouped-OLS axioms on constructed data (values vs DuckDB
ride the registry sweep)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from tcrd_spark.operators.regress import group_ols
from tcrd_spark.operators.scd import as_of, scd2_history


def _hist(spark, rows):
    df = spark.createDataFrame(
        rows, "key long, ts timestamp, attr string, seq long"
    )
    return scd2_history(df, "key", "ts", "attr", "seq")


def _t(s):
    return datetime.fromisoformat(s)


def test_scd2_collapses_unchanged_runs(spark):
    rows = [
        (1, _t("2024-01-01"), "a", 1),
        (1, _t("2024-01-02"), "a", 2),  # no change -> collapsed
        (1, _t("2024-01-03"), "b", 3),
        (1, _t("2024-01-04"), "b", 4),  # no change
        (1, _t("2024-01-05"), "a", 5),  # back to a -> NEW version
    ]
    got = sorted(
        _hist(spark, rows).collect(), key=lambda r: r.version
    )
    assert [(r.attr, r.version, r.is_current) for r in got] == [
        ("a", 1, False), ("b", 2, False), ("a", 3, True)
    ]
    # intervals chain: valid_to of v1 == valid_from of v2, open tail
    assert got[0].valid_to == got[1].valid_from
    assert got[2].valid_to is None


def test_scd2_point_in_time(spark):
    rows = [
        (1, _t("2024-01-01"), "a", 1),
        (1, _t("2024-01-10"), "b", 2),
    ]
    h = _hist(spark, rows)
    at = as_of(h, F.lit(_t("2024-01-05"))).collect()
    assert len(at) == 1 and at[0].attr == "a"
    now = as_of(h, F.lit(_t("2024-02-01"))).collect()
    assert len(now) == 1 and now[0].attr == "b"


def test_scd2_same_ts_tiebreak(spark):
    rows = [
        (1, _t("2024-01-01"), "a", 1),
        (1, _t("2024-01-01"), "b", 2),  # same ts: seq orders versions
    ]
    got = sorted(_hist(spark, rows).collect(), key=lambda r: r.version)
    assert [r.attr for r in got] == ["a", "b"]
    assert got[1].is_current


def test_ols_recovers_exact_line(spark):
    rows = [("g", float(x), 3.0 * x + 7.0) for x in range(1, 50)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    r = group_ols(df, ["g"], "x", "y").collect()[0]
    assert abs(r.slope - 3.0) < 1e-3
    assert abs(r.intercept - 7.0) < 1e-2
    assert abs(r.r - 1.0) < 1e-6 and abs(r.r2 - 1.0) < 1e-6


def test_ols_negative_correlation(spark):
    rows = [("g", float(x), -2.0 * x + 100.0 + (x % 3)) for x in range(1, 60)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    r = group_ols(df, ["g"], "x", "y").collect()[0]
    assert r.slope < 0 and r.r < -0.99
