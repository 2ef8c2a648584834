"""Every registered query hash-matches its DuckDB oracle at sf0.001 —
the same comparison the driver's t2 gate performs at sf0.01."""

from __future__ import annotations

import pytest

from tcrd_spark.registry import all_oracle_sql, all_queries
from tools.check import compare

QUERIES = all_queries()
ORACLE = all_oracle_sql()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    spark_rows = df.collect()
    if name not in ORACLE:
        # non-SQL-expressible op: rows-only smoke (the driver's weak check)
        assert spark_rows is not None
        return
    res = duck.execute(ORACLE[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    problems = compare(spark_rows, df.columns, duck_rows, duck_cols)
    assert not problems, f"{name}: {problems}"


def test_salted_join_equivalence(spark, sf_dir):
    """salted_join ≡ plain equi join on a skewed fact table (one hot
    key holding most rows)."""
    from pyspark.sql import functions as F

    from tcrd_spark.operators.joins import salted_join
    from tcrd_spark.sources.lake import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    # skew: collapse 90% of rows onto one hot part key
    skewed = li.withColumn(
        "l_partkey",
        F.when(F.col("l_orderkey") % 10 != 0, F.lit(1)).otherwise(
            F.col("l_partkey")
        ),
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    plain = skewed.join(
        part, skewed.l_partkey == part.p_partkey
    ).select("l_orderkey", "l_suppkey", "p_partkey", "p_brand")
    salted = salted_join(
        skewed.withColumnRenamed("l_partkey", "p_partkey"), part, "p_partkey"
    ).select("l_orderkey", "l_suppkey", "p_partkey", "p_brand")
    assert plain.count() == salted.count()
    assert plain.exceptAll(salted).isEmpty()
    assert salted.exceptAll(plain).isEmpty()
