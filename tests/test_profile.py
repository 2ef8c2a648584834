"""Profiler pins (pipeline/profile.py): values match a hand computed
reference, non-numeric mean is NULL, and the whole profile is ONE
aggregation pass over ONE scan however many columns are profiled."""

from __future__ import annotations

from pyspark.sql import functions as F

from tcrd_spark.pipeline.profile import profile_table
from tests.test_plans import plan_of


def test_profile_values(spark):
    df = spark.createDataFrame(
        [(1, "a", 2.0), (2, "b", 4.0), (3, None, None), (3, "a", 6.0)],
        "k long, s string, v double",
    )
    rows = {r.col_name: r for r in profile_table(df).collect()}
    assert set(rows) == {"k", "s", "v"}
    assert all(r.n_rows == 4 for r in rows.values())
    k, s, v = rows["k"], rows["s"], rows["v"]
    assert (k.n_null, k.n_distinct, k.min_v, k.max_v, k.mean_v) == (
        0, 3, "1", "3", 2.25
    )
    assert (s.n_null, s.n_distinct, s.min_v, s.max_v, s.mean_v) == (
        1, 2, "a", "b", None
    )
    assert (v.n_null, v.n_distinct, v.mean_v) == (1, 3, 4.0)


def test_profile_is_two_sortfree_scans(spark, sf_dir):
    """r11 optimization pin: the exact profile is TWO scans — a
    stats pass (min/max/null/mean; its string agg buffers force
    SortAggregate, but with no grouping keys it needs NO Sort node)
    cross-joined with the multi-distinct Expand pass (count-only
    buffers → HashAggregate). The old single-aggregate form put the
    string min/max buffers INSIDE the Expand aggregate, so the
    (n_cols+1)×N Expand was fully sorted twice — the dominant cost at
    any scale (3.5s → 1.7s at sf0.1). Never one job per statistic."""
    from tcrd_spark.pipeline.profile import q_table_profile

    plan = plan_of(q_table_profile(spark, sf_dir))
    # two scans, not one per statistic (the node name repeats in the
    # plan's detail section, so count the Location lines instead)
    assert plan.count("Location: InMemoryFileIndex") == 2, plan
    # the multi-distinct rewrite keeps the Expand shape...
    assert "Expand" in plan
    # ...but NO Sort touches the expanded rows (SortAggregate may
    # appear for the keyless stats pass — sortless by construction)
    import re

    assert not re.search(r"\bSort \(\d+\)", plan), plan


def test_profile_approx_switch(spark, sf_dir):
    """exact_distinct=False (the 100 TB path): still ONE scan, but the
    (n_cols+1)× Expand rewrite is GONE (approx_count_distinct is a
    plain partial-mergeable aggregate), and every other statistic is
    bit-identical to the exact profile while cardinalities stay within
    the configured rsd (2%; assert ±6% = 3σ — deterministic for fixed
    input, the bound is slack not luck)."""
    from tcrd_spark.pipeline.profile import _COLS, profile_table
    from tcrd_spark.sources.lake import load_table

    orders = load_table(spark, sf_dir, "orders")
    approx_df = profile_table(orders, _COLS, exact_distinct=False)
    plan = plan_of(approx_df)
    assert plan.count("Location: InMemoryFileIndex") == 1, plan
    assert "Expand" not in plan, plan

    exact = {r.col_name: r for r in profile_table(orders, _COLS).collect()}
    approx = {r.col_name: r for r in approx_df.collect()}
    assert set(exact) == set(approx)
    for c, e in exact.items():
        a = approx[c]
        # non-cardinality stats are computed identically — bit-equal
        assert (a.n_rows, a.n_null, a.min_v, a.max_v, a.mean_v) == (
            e.n_rows, e.n_null, e.min_v, e.max_v, e.mean_v
        ), c
        assert abs(a.n_distinct - e.n_distinct) <= max(
            1, 0.06 * e.n_distinct
        ), (c, a.n_distinct, e.n_distinct)
