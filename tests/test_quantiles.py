"""Quantile-sketch pins (pipeline/quantiles.py): estimates land
within the sample's rank-error bound of the exact percentiles,
shard-wise sketches MERGE exactly into the whole-set sketch, a group
smaller than k is estimated exactly, and the rank filter plans as
WindowGroupLimit (per-task k-heaps, never a full per-group sort)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tcrd_spark.pipeline import quantiles as qs
from tcrd_spark.sources.lake import load_table
from tests.test_plans import plan_of


def test_estimates_within_rank_error_bound(spark, sf_dir):
    """Bottom-k hash sampling is uniform, so the q-quantile estimate's
    RANK in the population is within 4·√(q(1-q)/k) of q (4 sigma of
    the binomial rank distribution) — checked by locating each
    estimate's exact population rank."""
    orders = load_table(spark, sf_dir, "orders")
    est = {
        r.o_orderpriority: r
        for r in qs.q_quantile_sketch(spark, sf_dir).collect()
    }
    for grp, row in est.items():
        vals = sorted(
            r.o_totalprice
            for r in orders.where(
                F.col("o_orderpriority") == grp
            ).collect()
        )
        n = len(vals)
        assert row.n_rows == n
        for q in qs.QUANTS:
            v = getattr(row, f"q{int(q * 100)}")
            # population rank of the estimate (right edge of ties)
            rank = sum(1 for x in vals if x <= v) / n
            tol = 4 * math.sqrt(q * (1 - q) / row.k_eff) + 1 / n
            assert abs(rank - q) <= tol, (grp, q, v, rank, tol)


def test_merge_equals_whole_set_sketch(spark, sf_dir):
    """bottom-k(A ∪ B) == merge(bottom-k(A), bottom-k(B)) — the
    mergeability contract, exact (not approximate)."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.where("o_orderkey % 2 = 0")
    b = orders.where("o_orderkey % 2 = 1")
    g = ["o_orderpriority"]
    sk_a = qs.quantile_sketch(a, g, "o_totalprice", "o_orderkey")
    sk_b = qs.quantile_sketch(b, g, "o_totalprice", "o_orderkey")
    merged = qs.merge_quantile_sketches(sk_a, sk_b, g)
    whole = qs.quantile_sketch(orders, g, "o_totalprice", "o_orderkey")
    key = lambda r: (r.o_orderpriority, r.h, r.v)  # noqa: E731
    assert sorted(map(key, merged.collect())) == sorted(
        map(key, whole.collect())
    )
    # and the estimates off the merged sketch equal the whole-set ones
    ea = qs.quantile_estimates(merged, g).collect()
    ew = qs.quantile_estimates(whole, g).collect()
    assert sorted(map(tuple, ea)) == sorted(map(tuple, ew))


def test_small_group_is_exact(spark):
    """A group with fewer than k rows: the sample IS the group, so the
    discrete-rank estimate equals the exact discrete percentile."""
    rows = [("g", float(i), i) for i in range(1, 11)]  # 1..10
    df = spark.createDataFrame(rows, "grp string, v double, k long")
    sk = qs.quantile_sketch(df, ["grp"], "v", "k")
    est = qs.quantile_estimates(sk, ["grp"], (0.5, 0.9)).head()
    assert est.k_eff == 10
    assert est.q50 == 5.0  # rank ceil(0.5*10) = 5
    assert est.q90 == 9.0  # rank ceil(0.9*10) = 9


def test_rank_filter_plans_window_group_limit(spark, sf_dir):
    plan = plan_of(qs.q_quantile_sketch(spark, sf_dir))
    assert "WindowGroupLimit" in plan, plan
