"""Column-level table profiling — the generalization of the
reference's count dashboards (`loaders/TCRD.py:1686-1811` get_beans /
get_count_typecount print table-level counts; a warehouse at 100 TB
also needs per-column null/distinct/range profiles to validate loads
and plan partitioning).

One row per column: (column, n_rows, n_nulls, n_distinct, min_value,
max_value). Exact COUNT(DISTINCT) here for oracle parity — at extreme
scale swap `exact_distinct=False` for approx_count_distinct (HLL,
documented ±2% default error) and the plan becomes a single pass with
no expand.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, exact_distinct: bool = True) -> DataFrame:
    """Per-column profile as a union of per-column aggregates — each
    branch's scan prunes to its single column (ReadSchema shows one
    field), so total IO equals one full-table read; Catalyst shares
    nothing across branches but each branch is map-side partial +
    1-row final. min/max aggregate in the column's native type, then
    cast to string (numeric semantics, not lexicographic)."""
    distinct = F.countDistinct if exact_distinct else F.approx_count_distinct
    parts = []
    for c in df.columns:
        parts.append(
            df.agg(
                F.count(F.lit(1)).alias("n_rows"),
                (F.count(F.lit(1)) - F.count(c)).alias("n_nulls"),
                distinct(c).alias("n_distinct"),
                F.min(c).cast("string").alias("min_value"),
                F.max(c).cast("string").alias("max_value"),
            ).select(
                F.lit(c).alias("column"),
                "n_rows",
                "n_nulls",
                "n_distinct",
                "min_value",
                "max_value",
            )
        )
    return reduce(DataFrame.unionByName, parts)
