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


def test_profile_is_one_scan(spark, sf_dir):
    from tcrd_spark.pipeline.profile import q_table_profile

    plan = plan_of(q_table_profile(spark, sf_dir))
    # one file index = one scan (the node name repeats in the plan's
    # detail section, so count the Location lines instead)
    assert plan.count("Location: InMemoryFileIndex") == 1, plan
    # the multi-distinct rewrite is the expected shape: Expand over
    # the SAME scan, never one job per statistic
    assert "Expand" in plan
