"""Deequ-style one-pass expectations (quality/expectations.py):
verdict semantics on clean and dirtied frames, and the single-scan
plan contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from tcrd_spark.quality import expectations as dq


def _suite():
    return [
        dq.row_count_min(1),
        dq.completeness("o_custkey"),
        dq.uniqueness("o_orderkey"),
        dq.accepted_values("o_orderstatus", ["O", "F", "P"]),
        dq.min_value("o_totalprice", 0.0),
        dq.pattern("o_orderpriority", "^[1-5]-[A-Z ]+$"),
    ]


def _verdicts(df):
    out = dq.run_expectations(df, _suite())
    return {r["check_name"]: r for r in out.collect()}


def test_clean_table_passes_every_check(spark, sf_dir):
    from tcrd_spark.sources.lake import load_table

    v = _verdicts(load_table(spark, sf_dir, "orders"))
    assert all(r["passed"] == 1 for r in v.values()), v
    assert v["completeness_o_custkey"]["metric"] == 1.0
    assert v["uniqueness_o_orderkey"]["metric"] == 1.0


def test_dirt_flips_exactly_the_right_checks(spark, sf_dir):
    from tcrd_spark.sources.lake import load_table

    orders = load_table(spark, sf_dir, "orders")
    n = orders.count()
    dirty = orders.unionByName(
        orders.limit(10).select(  # duplicate keys + null custkey + bad status
            "o_orderkey",
            F.lit(None).cast("long").alias("o_custkey"),
            F.lit("X").alias("o_orderstatus"),
            F.lit(-5.0).alias("o_totalprice"),
            "o_orderdate",
            F.lit("9-BOGUS").alias("o_orderpriority"),
        )
    )
    v = _verdicts(dirty)
    assert v["row_count"]["passed"] == 1
    assert v["completeness_o_custkey"]["passed"] == 0
    assert abs(v["completeness_o_custkey"]["metric"] - n / (n + 10)) < 1e-6
    assert v["uniqueness_o_orderkey"]["passed"] == 0
    assert v["accepted_values_o_orderstatus"]["passed"] == 0
    assert v["min_o_totalprice"]["passed"] == 0
    assert v["min_o_totalprice"]["metric"] == -5.0
    assert v["pattern_o_orderpriority"]["passed"] == 0


def test_suite_is_one_scan(spark, sf_dir):
    """N checks must not become N jobs: the compiled plan reads the
    table exactly once."""
    from tcrd_spark.sources.lake import load_table

    out = dq.run_expectations(load_table(spark, sf_dir, "orders"), _suite())
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan


def test_group_expectations_catch_a_single_bad_slice(spark, sf_dir):
    from tcrd_spark.sources.lake import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "n_chars"
    )
    # break ONE language: null texts appended only for 'de'
    bad = docs.where("lang = 'de'").limit(5).select(
        (F.col("doc_id") + 10**9).alias("doc_id"),
        F.lit(None).cast("string").alias("text"),
        "lang", "n_chars",
    )
    dirty = docs.unionByName(bad)
    out = dq.run_group_expectations(
        dirty, "lang",
        [dq.completeness("text"), dq.uniqueness("doc_id")],
    )
    v = {
        (r["slice"], r["check_name"]): r["passed"]
        for r in out.collect()
    }
    assert v[("de", "completeness_text")] == 0
    for (slc, chk), p in v.items():
        if slc != "de":
            assert p == 1, (slc, chk)


def test_group_suite_is_one_scan(spark, sf_dir):
    from tcrd_spark.sources.lake import load_table

    out = dq.run_group_expectations(
        load_table(spark, sf_dir, "documents"), "lang",
        [dq.completeness("text"), dq.min_value("n_chars", 0.0)],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan
