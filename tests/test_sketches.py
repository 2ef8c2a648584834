"""Sketch-operator properties: estimator accuracy bounds, the CMS
over-estimate invariant, and the bounded-top-k plan shapes (the DuckDB
value-hash adjudication itself rides the registry sweep)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tcrd_spark.pipeline import sketches
from tcrd_spark.sources.lake import load_table
from tests.test_plans import plan_of


def test_kmv_estimate_within_relative_error(spark, sf_dir):
    rows = sketches.q_kmv_distinct(spark, sf_dir).collect()
    assert len(rows) == 3
    for r in rows:
        # k=64 → stderr ~ 1/sqrt(62) ≈ 12.7%; allow 4 sigma
        assert r.est_distinct > 0
        rel = abs(r.est_distinct - r.exact_distinct) / r.exact_distinct
        assert rel < 0.51, (r, rel)


def test_kmv_exact_below_k(spark):
    # fewer than k distinct items → the sketch IS the set, estimate exact
    df = spark.range(10).select(
        F.lit("g").alias("g"), F.col("id").cast("string").alias("item")
    )
    sk = sketches.kmv_sketch(df, ["g"], F.col("item"), k=64)
    est = sketches.kmv_estimate(sk, ["g"], k=64).collect()[0]
    assert est.k_eff == 10 and est.est_distinct == 10


def test_theta_bounds_and_jaccard(spark, sf_dir):
    r = sketches.q_theta_sketch_ops(spark, sf_dir).collect()[0]
    assert 0 < r.c_inter <= r.c_union
    assert r.est_inter <= r.est_union
    assert abs(r.est_union - r.exact_union) / r.exact_union < 0.51
    assert 0.0 <= r.est_jaccard <= 1.0


def test_cms_never_underestimates(spark, sf_dir):
    rows = sketches.q_cms_heavy_hitters(spark, sf_dir).collect()
    assert len(rows) == sketches.CMS_TOPN
    assert all(r.cms_est >= r.exact_cnt for r in rows)


def test_cms_grid_is_bounded(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    grid = sketches.cms_build(li, F.col("l_partkey").cast("string"))
    assert grid.count() <= sketches.CMS_DEPTH * sketches.CMS_WIDTH


def test_kmv_grouped_plans_window_group_limit(spark, sf_dir):
    plan = plan_of(sketches.q_kmv_distinct(spark, sf_dir))
    assert "WindowGroupLimit" in plan, plan


def test_kmv_ungrouped_avoids_global_window(spark, sf_dir):
    # global top-k must be TakeOrdered (per-partition heaps), never a
    # partition-less window funneling all hashes through one task
    plan = plan_of(sketches.q_theta_sketch_ops(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan
    assert "WindowGroupLimit" not in plan
    assert "windowspecdefinition" not in plan, plan
