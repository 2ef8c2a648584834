"""Decorrelation pins for the Q21/Q15 shapes: the nested EXISTS /
NOT EXISTS pair becomes semi + anti joins (no per-row subquery), and
the Q15 argmax equality joins on ROUNDED totals."""

from __future__ import annotations

from tcrd_spark.operators.subqueries import (
    q_blamed_suppliers, q_top_revenue_supplier,
)


def _plan(df):
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_q21_decorrelates_to_semi_and_anti(spark, sf_dir):
    df = q_blamed_suppliers(spark, sf_dir)
    plan = _plan(df)
    assert "LeftSemi" in plan and "LeftAnti" in plan
    assert "ScalarSubquery" not in plan
    rows = df.collect()
    assert len(rows) > 0
    assert all(r.n_blamed_lines >= 1 for r in rows)


def test_q15_argmax_is_singletonish_and_maximal(spark, sf_dir):
    df = q_top_revenue_supplier(spark, sf_dir)
    rows = df.collect()
    assert len(rows) >= 1
    top = rows[0].total_revenue
    assert all(r.total_revenue == top for r in rows)  # ties only
    # nobody in the underlying view beats the reported max
    from tcrd_spark.operators.subqueries import Q15_SQL, run_sql

    inner = run_sql(
        spark, sf_dir,
        Q15_SQL.split("SELECT s_suppkey")[0] +
        "SELECT max(total_revenue) AS m FROM revenue",
    ).head()
    # the CTE accumulates in exact DECIMAL space since r11 (the money
    # -sum discipline); the report column is the DOUBLE cast of it
    assert float(inner.m) == top
