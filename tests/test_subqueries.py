"""Decorrelation pins (operators/subqueries.py): Catalyst must turn
the correlated forms into joins — no per-row subquery execution
survives into the physical plan."""

from __future__ import annotations

from tcrd_spark.operators.subqueries import (
    q_corr_not_exists_idle, q_corr_scalar_below_avg,
)


def _plan(df):
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_scalar_subquery_decorrelates_to_join(spark, sf_dir):
    df = q_corr_scalar_below_avg(spark, sf_dir)
    plan = _plan(df)
    # the correlated scalar became an aggregate JOINED back — a
    # correlated subquery left in place would show a ScalarSubquery
    # (per-row re-execution) in the physical plan
    assert "ScalarSubquery" not in plan
    assert plan.count("Scan parquet") >= 3  # lineitem ×2 + part
    rows = df.collect()
    assert len(rows) > 0
    assert all(r.lost_revenue > 0 for r in rows)


def test_not_exists_becomes_left_anti(spark, sf_dir):
    df = q_corr_not_exists_idle(spark, sf_dir)
    plan = _plan(df)
    assert "LeftAnti" in plan
    # the inner o_totalprice predicate is pushed into the orders scan,
    # not evaluated post-join
    assert "PushedFilters" in plan and "300000" in plan
    assert df.count() >= 0  # non-empty at sf>=0.01; 0 rows legal at tiny sf


def test_q20_having_correlation_decorrelates(spark, sf_dir):
    """The Q20 shape's correlated scalar lives in HAVING and
    correlates on a GROUPING column; Catalyst must still rewrite it
    to a per-part aggregate joined back (no per-row ScalarSubquery)
    under a left-semi for the IN."""
    from tcrd_spark.operators.subqueries import q_excess_share_suppliers

    df = q_excess_share_suppliers(spark, sf_dir)
    plan = _plan(df)
    assert "ScalarSubquery" not in plan
    assert "LeftSemi" in plan
    # the date window is pushed into both lineitem scans
    assert plan.count("Scan parquet") >= 3  # supplier + lineitem x2
    assert df.count() >= 0


def test_q2_min_over_multijoin_decorrelates(spark, sf_dir):
    """The Q2 shape: a scalar MIN over a 4-way join in WHERE,
    correlated on the outer part — must decorrelate to a per-part min
    joined back, never a per-row ScalarSubquery over the join tree."""
    from tcrd_spark.operators.subqueries import q_min_cost_supplier

    df = q_min_cost_supplier(spark, sf_dir)
    plan = _plan(df)
    assert "ScalarSubquery" not in plan
    # the region filter pushes into BOTH region scans
    assert plan.count("EUROPE") >= 2
    rows = df.collect()
    assert rows
    # every reported row carries its part's true minimum price
    import collections

    best = collections.defaultdict(set)
    for r in rows:
        best[r.p_partkey].add(r.best_price)
    assert all(len(v) == 1 for v in best.values())


def test_q11_global_scalar_having(spark, sf_dir):
    """The Q11 shape: group HAVING vs an UNCORRELATED global scalar —
    the scalar computes once (a ScalarSubquery over a 1-row aggregate
    is the CORRECT plan here, not per-row re-execution) and filters
    the grouped output; both sides' joins stay broadcast."""
    from tcrd_spark.operators.subqueries import q_big_share_parts

    df = q_big_share_parts(spark, sf_dir)
    plan = _plan(df)
    # uncorrelated: exactly ONE scalar subquery, hosted once in the
    # HAVING condition and defined once in the plan's subquery
    # section — never per-group re-execution
    assert plan.count("Subquery:1") == 1 and "Subquery:2" not in plan
    rows = df.collect()
    assert rows and all(r.part_qty > 0 for r in rows)
