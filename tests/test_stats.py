"""Hypothesis-test axioms on constructed data (values vs DuckDB ride
the registry sweep)."""

from __future__ import annotations

from tcrd_spark.operators.stats import chi2_independence, welch_ttest


def test_welch_identical_slices_t_zero(spark):
    rows = [("a", float(v)) for v in range(10)] + [
        ("b", float(v)) for v in range(10)
    ]
    df = spark.createDataFrame(rows, "s string, value double")
    r = welch_ttest(df, "s", "value", "a", "b").collect()[0]
    assert r.t_stat == 0.0 and r.n_a == r.n_b == 10


def test_welch_shifted_slices_strong_t(spark):
    rows = [("a", float(v)) for v in range(20)] + [
        ("b", float(v) + 100.0) for v in range(20)
    ]
    df = spark.createDataFrame(rows, "s string, value double")
    r = welch_ttest(df, "s", "value", "a", "b").collect()[0]
    assert r.t_stat < -20  # b is far larger
    assert 1 < r.welch_df <= 38  # bounded by n_a + n_b - 2


def test_chi2_independent_table_near_zero(spark):
    # perfectly proportional table -> chi2 == 0
    rows = [("x", c) for c in (1, 1, 2) for _ in range(10)] + [
        ("y", c) for c in (1, 1, 2) for _ in range(20)
    ]
    df = spark.createDataFrame(rows, "r string, c long")
    got = chi2_independence(df, "r", "c").collect()[0]
    assert abs(got.chi2) < 1e-9 and got.dof == 1 and got.n_cells == 4


def test_chi2_dependent_table_positive(spark):
    rows = [("x", 1)] * 30 + [("y", 2)] * 30 + [("x", 2)] * 2 + [("y", 1)] * 2
    df = spark.createDataFrame(rows, "r string, c long")
    got = chi2_independence(df, "r", "c").collect()[0]
    assert got.chi2 > 30 and got.dof == 1
