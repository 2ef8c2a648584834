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
