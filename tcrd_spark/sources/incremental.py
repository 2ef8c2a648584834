"""Incremental aggregate maintenance from the CDC feed.

The reason a lake grows CDC (sources/snapshots.py read_changes) is so
DOWNSTREAM state never recomputes from scratch: a grouped aggregate
over a 100 TB table is maintained version-to-version by folding in
the change feed — work ∝ change, not table.

`delta_group_agg` turns a change feed into signed per-group deltas
(insert/update_post add, delete/update_pre subtract — count columns
cancel across an update pair, sum columns move by the value change);
`apply_delta` merges them into the standing aggregate state with one
small full-outer join, dropping groups whose count reaches zero.
The invariant (pytest-pinned, and the adjudicated query's oracle):

    apply_delta(agg(v_from), delta(changes(v_from, v_to)))
        == agg(read_version(v_to))

for count + sum aggregates (the self-maintainable class; min/max are
NOT incrementally maintainable under deletes without per-group
history — that restriction is the textbook materialized-view one).

Reference parity: none (extension; the engine-level analogue of the
reference's periodic full-refresh analytics, e.g. tdl_refresh, made
incremental).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def group_agg(df: DataFrame, group_col: str, sum_col: str) -> DataFrame:
    """The maintained aggregate: per-group row count and sum."""
    return df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(sum_col).alias("s"),
    )


def delta_group_agg(
    changes: DataFrame, group_col: str, sum_col: str
) -> DataFrame:
    """Signed per-group deltas from a read_changes feed."""
    sign = F.when(
        F.col("change_type").isin("insert", "update_post"), F.lit(1)
    ).otherwise(F.lit(-1))
    return changes.groupBy(group_col).agg(
        F.sum(sign).alias("dn"),
        F.sum(sign.cast("double") * F.col(sum_col)).alias("ds"),
    )


def apply_delta(state: DataFrame, delta: DataFrame, group_col: str) -> DataFrame:
    """Fold deltas into the standing aggregate: one full-outer join on
    the group key (both sides are |groups|-sized — tiny next to the
    table), zero-count groups dropped."""
    s = state.alias("st")
    d = delta.alias("dl")
    j = s.join(d, F.col(f"st.{group_col}").eqNullSafe(
        F.col(f"dl.{group_col}")), "full_outer")
    return (
        j.select(
            F.coalesce(
                F.col(f"st.{group_col}"), F.col(f"dl.{group_col}")
            ).alias(group_col),
            (
                F.coalesce(F.col("st.n"), F.lit(0))
                + F.coalesce(F.col("dl.dn"), F.lit(0))
            ).alias("n"),
            (
                F.coalesce(F.col("st.s"), F.lit(0.0))
                + F.coalesce(F.col("dl.ds"), F.lit(0.0))
            ).alias("s"),
        )
        .where(F.col("n") > 0)
    )


def incremental_group_agg(
    spark: SparkSession,
    table_dir: str,
    v_from: int,
    v_to: int,
    key_cols: list[str],
    group_col: str,
    sum_col: str,
) -> DataFrame:
    """The maintained aggregate at v_to, computed as agg(v_from) +
    fold(changes) — never scanning v_to's full snapshot. `key_cols`
    is the TABLE's row identity (what read_changes classifies on);
    `group_col` is the aggregate's dimension — the feed carries every
    column, so any grouping works off one feed."""
    from tcrd_spark.sources.snapshots import read_changes, read_version

    state = group_agg(
        read_version(spark, table_dir, v_from), group_col, sum_col
    )
    delta = delta_group_agg(
        read_changes(spark, table_dir, v_from, v_to, key_cols),
        group_col,
        sum_col,
    )
    return apply_delta(state, delta, group_col)


# ------------------------------------------------- registered query


def q_incremental_orders_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority (count, sum) of the deterministic CDC lake's v2,
    maintained incrementally from v1 + the change feed. The oracle
    recomputes v2 directly from the base table — matching it proves
    the fold reconstructs the full-refresh answer."""
    from tcrd_spark.sources.snapshots import _changes_lake, read_changes

    path = _changes_lake(spark, sf_dir)
    # NOTE: read_changes keys on o_orderkey (the table key), while the
    # maintained aggregate groups by priority — the feed carries every
    # column, so any downstream grouping works off one feed.
    from tcrd_spark.sources.snapshots import read_version

    state = group_agg(
        read_version(spark, path, 1), "o_orderpriority", "o_totalprice"
    )
    delta = delta_group_agg(
        read_changes(spark, path, 1, 2, ["o_orderkey"]),
        "o_orderpriority",
        "o_totalprice",
    )
    out = apply_delta(state, delta, "o_orderpriority")
    return out.select(
        "o_orderpriority",
        F.col("n").cast("long").alias("n_orders"),
        F.round("s", 2).alias("sum_price"),
    )


QUERIES = {"incremental_orders_agg": q_incremental_orders_agg}

# v2 of the CDC lake, recomputed logically from `orders` (same commit
# history as snapshots.ORACLE['snapshot_changes']), aggregated directly
# — the full-refresh answer the incremental fold must reproduce.
ORACLE = {
    "incremental_orders_agg": """
        WITH v1 AS (
          SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
          FROM orders WHERE o_orderkey % 7 <> 0
        ),
        src AS (
          SELECT o_orderkey, o_orderstatus,
                 o_totalprice + 100.0 AS o_totalprice,
                 o_orderpriority
          FROM orders WHERE o_orderkey % 3 = 0
        ),
        v2 AS (
          SELECT * FROM src WHERE o_orderstatus <> 'F'
             OR o_orderkey NOT IN (SELECT o_orderkey FROM v1)
          UNION ALL
          SELECT * FROM v1
          WHERE o_orderkey NOT IN (SELECT o_orderkey FROM src)
        )
        SELECT o_orderpriority,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS sum_price
        FROM v2 GROUP BY o_orderpriority
    """,
}
