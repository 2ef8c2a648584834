"""Physical-plan audits: assert the *plans*, not just the results —
filters reach the parquet scan, dimension joins broadcast, top-k
windows pre-filter below the exchange, hot-path queries stay JVM-side
(no row-at-a-time Python), aggregations combine map-side.

These are the properties that decide 100 TB behavior; a regression
here is a performance bug even while results stay correct.
"""

from __future__ import annotations

import pytest


def plan_of(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


@pytest.fixture(scope="module")
def queries():
    import __spark_entry__ as e

    return e.queries()


def test_filter_and_projection_pushdown(spark, sf_dir, queries):
    plan = plan_of(queries["scan_project_filter"](spark, sf_dir))
    assert "PushedFilters: [" in plan
    # a real predicate made it into the scan, not just IsNotNull
    assert any(
        tok in plan for tok in ("GreaterThan", "LessThan", "EqualTo", "In(")
    ), plan
    # column pruning: lineitem has 11 columns; the scan must read fewer
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schema and read_schema[0].count(":") < 12, read_schema


def test_dim_join_broadcasts(spark, sf_dir, queries):
    plan = plan_of(queries["three_way_entity_join"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, (
        "dimension join fell back to sort-merge:\n" + plan
    )


def test_topk_uses_window_group_limit(spark, sf_dir, queries):
    plan = plan_of(queries["topk_per_group"](spark, sf_dir))
    # Spark 3.5+: rank<=k is pre-filtered below the shuffle
    assert "WindowGroupLimit" in plan, plan


def test_no_python_udf_in_relational_paths(spark, sf_dir, queries):
    """Everything except the declared pandas/arrow paths must compile
    to JVM expressions — BatchEvalPython in a plan means a Python
    row-loop snuck into the hot path."""
    python_ok = {
        "apsp_min_merge", "nearest_flagged",      # applyInPandas BFS
        "multimodal_features",                    # mapInPandas decode
        "dedup_embedding_cosine",                 # mapInPandas block matmul
    }
    for name, q in queries.items():
        if name in python_ok:
            continue
        plan = plan_of(q(spark, sf_dir))
        assert "BatchEvalPython" not in plan, f"{name} uses Python UDF"
        assert "ArrowEvalPython" not in plan, f"{name} uses pandas UDF"
        assert "FlatMapGroupsInPandas" not in plan, f"{name} uses applyInPandas"
        assert "MapInPandas" not in plan, f"{name} uses mapInPandas"


def test_partial_aggregation(spark, sf_dir, queries):
    """group_sum must combine map-side: two HashAggregate nodes
    (partial + final) around the exchange."""
    plan = plan_of(queries["group_sum"](spark, sf_dir))
    assert plan.count("HashAggregate") >= 2, plan


def test_whole_stage_codegen_active(spark, sf_dir, queries):
    df = queries["pricing_summary"](spark, sf_dir)
    # AQE only finalizes (and assigns codegen stages) at execution —
    # collect() drives THIS QueryExecution to its final plan
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # codegen'd operators render as *(stageId) Node in the final plan
    assert "*(" in plan, plan
