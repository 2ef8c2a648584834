"""TPC-H family plan pins (operators/tpch.py): the shapes Catalyst
must get right — predicate pushdown through the disjunctive Q19,
broadcast dims everywhere, semi/anti rewrites for EXISTS/IN/NOT IN,
and the left-outer count-distribution double aggregate. Value
correctness is the DuckDB oracle's job (same SQL text, two engines);
these tests pin the PLANS and a few hand-checkable invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from tcrd_spark.operators import tpch


def _plan(df):
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_q19_disjunction_pushes_brand_superset(spark, sf_dir):
    """The classic can't-push-naively shape: the OR of brand/size/qty
    conjuncts must still push a usable superset filter into BOTH
    scans (Catalyst extracts common disjunct predicates per side) and
    broadcast the part side."""
    df = tpch.QUERIES["tpch_q19_disjunctive"](spark, sf_dir)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    # each side's scan carries pushed filters derived from the OR
    assert plan.count("PushedFilters: [") >= 2
    assert "Brand#12" in plan  # the brand disjuncts reached a scan


def test_q4_exists_becomes_semi_join(spark, sf_dir):
    plan = _plan(tpch.QUERIES["tpch_q4_priority"](spark, sf_dir))
    assert "LeftSemi" in plan
    # the date window pushes into the orders scan
    assert "1996-01-01" in plan


def test_q16_not_in_becomes_anti_join(spark, sf_dir):
    plan = _plan(tpch.QUERIES["tpch_q16_supplier_cnt"](spark, sf_dir))
    # NOT IN over a non-nullable key side → null-aware anti join
    assert "LeftAnti" in plan or "NullAwareAntiJoin" in plan, plan


def test_q5_dims_broadcast(spark, sf_dir):
    plan = _plan(tpch.QUERIES["tpch_q5_local_supplier"](spark, sf_dir))
    # supplier/nation/region must all broadcast — a shuffle to join a
    # dim is a bug at any scale
    assert plan.count("BroadcastHashJoin") >= 3


def test_q13_left_outer_counts_zero_order_customers(spark, sf_dir):
    """The custdist invariant: every customer appears in exactly one
    bucket and the buckets sum to |customer| — the LEFT OUTER join
    keeps order-less customers as c_count = 0."""
    from tcrd_spark.sources.lake import load_table

    df = tpch.QUERIES["tpch_q13_custdist"](spark, sf_dir)
    rows = df.collect()
    n_cust = load_table(spark, sf_dir, "customer").count()
    assert sum(r.custdist for r in rows) == n_cust


def test_q6_single_scan_no_join_no_shuffle_agg_only(spark, sf_dir):
    df = tpch.QUERIES["tpch_q6_forecast"](spark, sf_dir)
    plan = _plan(df)
    assert "Join" not in plan
    assert plan.count("Location: InMemoryFileIndex") == 1
    # every predicate reached the scan
    for frag in ("GreaterThanOrEqual(l_discount", "LessThan(l_quantity"):
        assert frag in plan, plan
    r = df.collect()[0]
    assert r.n_lines >= 0


def test_q18_in_group_having_semi(spark, sf_dir):
    df = tpch.QUERIES["tpch_q18_large_orders"](spark, sf_dir)
    plan = _plan(df)
    assert "LeftSemi" in plan
    rows = df.collect()
    # every surfaced order genuinely clears the quantity bar
    assert all(r.total_qty > 150 for r in rows)


def test_q10_top20_deterministic_cut(spark, sf_dir):
    df = tpch.QUERIES["tpch_q10_returned"](spark, sf_dir)
    rows = df.collect()
    assert len(rows) <= 20
    # the ordering key (rounded revenue desc, custkey) is total
    keys = [(-r.revenue, r.c_custkey) for r in rows]
    assert keys == sorted(keys)
