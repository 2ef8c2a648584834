"""Skyline (Pareto-front) operator: the maximal points under
(minimize x, maximize y) dominance.

A classic OLAP extension (Börzsönyi et al., ICDE 2001 "The Skyline
Operator") the reference's SQL surface cannot express without a
quadratic self-join. Point j dominates i iff x_j ≤ x_i AND y_j ≥ y_i,
strictly better in at least one.

100 TB shape — never all-pairs:
1. Bucket on x by (broadcast) quantile edges; bucket order implies
   STRICT x order across buckets (equal x always shares a bucket).
2. One tiny per-bucket aggregate (max y) + its running prefix max give
   a COMPLETE cross-bucket dominance test: i is dominated by an
   earlier bucket iff prefix_max_y ≥ y_i (x is strictly smaller there,
   so no strictness bookkeeping is needed). This broadcast prune
   eliminates everything but the staircase neighborhood.
3. Survivors take an exact WITHIN-bucket anti-join — bounded at
   (n/B)² per bucket, in practice the skyline candidates per bucket.
The buckets affect only the PLAN (pruning); the result is pure
dominance semantics, which is exactly what the DuckDB oracle computes
with a plain NOT EXISTS.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_BUCKETS = 32


def skyline_2d(
    df: DataFrame, x_col: str, y_col: str, n_buckets: int = N_BUCKETS
) -> DataFrame:
    """Rows of df on the (min x, max y) Pareto front, all columns kept.

    Duplicated points (equal x AND y) are both kept — neither strictly
    improves on the other.
    """
    probs = [i / n_buckets for i in range(1, n_buckets)]
    if not probs:  # n_buckets <= 1: degenerate single bucket
        b = df.withColumn("_bk", F.lit(1))
    else:
        edges = df.agg(
            F.percentile_approx(x_col, probs, 10_000).alias("es")
        )
        b = (
            df.crossJoin(F.broadcast(edges))
            .withColumn(
                "_bk",
                F.aggregate(
                    "es",
                    F.lit(1),
                    lambda acc, e: acc
                    + F.when(e <= F.col(x_col), 1).otherwise(0),
                ),
            )
            .drop("es")
        )
    stats = b.groupBy("_bk").agg(F.max(y_col).alias("_max_y"))
    # running prefix max of earlier buckets: |B| rows, window over the
    # tiny stats frame only (partitioned trivially by a constant is
    # still |B| rows — use a self-join prefix instead to stay windowless)
    prev = (
        stats.alias("s")
        .join(stats.alias("t"), F.col("t._bk") < F.col("s._bk"), "left")
        .groupBy(F.col("s._bk").alias("_bk"))
        .agg(F.max(F.col("t._max_y")).alias("_prev_y"))
    )
    pruned = b.join(F.broadcast(prev), "_bk").filter(
        F.col("_prev_y").isNull() | (F.col(y_col) > F.col("_prev_y"))
    )
    # exact within-bucket dominance (cross-bucket already complete):
    l, r = pruned.alias("l"), pruned.alias("r")
    dominated = (
        (F.col("r._bk") == F.col("l._bk"))
        & (F.col(f"r.{x_col}") <= F.col(f"l.{x_col}"))
        & (F.col(f"r.{y_col}") >= F.col(f"l.{y_col}"))
        & (
            (F.col(f"r.{x_col}") < F.col(f"l.{x_col}"))
            | (F.col(f"r.{y_col}") > F.col(f"l.{y_col}"))
        )
    )
    return l.join(r, dominated, "left_anti").drop("_bk", "_prev_y")


# ------------------------------------------------- registered queries


def q_skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto-optimal parts: minimize average extended price, maximize
    total quantity shipped."""
    from tcrd_spark.sources.lake import load_table

    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.sum("l_quantity"), 4).alias("total_qty"),
    )
    return skyline_2d(per_part, "avg_price", "total_qty")


QUERIES = {"skyline_parts": q_skyline_parts}

ORACLE = {
    "skyline_parts": """
        WITH p AS (
            SELECT l_partkey,
                   round(avg(l_extendedprice), 4) AS avg_price,
                   round(sum(l_quantity), 4) AS total_qty
            FROM lineitem GROUP BY 1
        )
        SELECT a.l_partkey, a.avg_price, a.total_qty
        FROM p a
        WHERE NOT EXISTS (
            SELECT 1 FROM p b
            WHERE b.avg_price <= a.avg_price
              AND b.total_qty >= a.total_qty
              AND (b.avg_price < a.avg_price OR b.total_qty > a.total_qty)
        )
    """,
}
