"""Window / ranking operators (SURVEY.md §2.5).

The reference computes ranks either in R (`frank`, `cut2` deciles) or in
Python sort loops (TIN-X article ranking); all become Spark window
functions. A window over partitionBy(k) shuffles once on k and then
streams — at 100 TB that single shuffle replaces the reference's
2×N-query MIN-then-requery pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tcrd_spark.sources.lake import load_table


def q_min_tie_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIN with tie expansion — nearest-Tclin pattern
    (`loaders/TCRD.py:2800-2869`: MIN(distance) then re-query all rows at
    that min). One rank() window pass keeps ties and replaces 2×N queries.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.asc("o_totalprice"))
    return (
        orders.withColumn("rk", F.rank().over(w))
        .filter(F.col("rk") == 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


def q_frank_level_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GTEx qualitative expression level (`R/gtex_process.R:50,53,57`):
    RANK := frank(x)/.N per group, bucketed (0,.25)→Low, [.25,.75)→Medium,
    ≥.75→High. Note the denominator: frank/.N = rank/count, NOT
    percent_rank (which is (rank−1)/(n−1)) — so rank().over(w)/count()
    .over(partition-only w), exactly as SURVEY §2.5 flags.
    """
    part = load_table(spark, sf_dir, "part")
    wo = Window.partitionBy("p_brand").orderBy(F.asc("p_retailprice"))
    wp = Window.partitionBy("p_brand")
    r = (F.rank().over(wo) / F.count("*").over(wp)).alias("frac_rank")
    return part.select(
        "p_brand",
        "p_partkey",
        F.round(r, 6).alias("frac_rank"),
    ).withColumn(
        "level",
        F.when(F.col("frac_rank") < 0.25, "Low")
        .when(F.col("frac_rank") < 0.75, "Medium")
        .otherwise("High"),
    )


def q_rank_compound_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIN-X article rank (`python/TIN-X.py:263-283`, comparator
    `:285-299`): per (disease,protein) order by score ASC then pmid DESC,
    emit 0-based rank. Here: per event_type by value ASC, event_id DESC."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.asc("value"), F.desc("event_id"))
    return events.select(
        "event_type",
        "event_id",
        (F.row_number().over(w) - 1).alias("article_rank"),
    )


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per entity (`python/tcrd2csv.py:216,267`: top-5 text-mining
    diseases / TIN-X importances per target)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("o_custkey", "o_orderkey", "o_totalprice", F.col("rn").alias("rank_n"))
    )


def q_decile_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global decile assignment — the tau pipeline's cut2(x, g=10) step
    (`R/gtex_process.R:9-16`, `R/hpm_tau.R:1-26`) as value-quantile
    edges: exact interior percentiles [0.1..0.9] of the distribution,
    bin = 1 + #edges ≤ value. Like Hmisc::cut2 (and unlike ntile),
    equal values always share a bin.

    Scale note: a global `ntile` is a single-task sort (every row
    through ONE window partition — a 100 TB killer). Here the edges
    reduce to one 9-float row, broadcast back over the corpus: one
    shuffle for the groupBy, zero for the binning. Edges rounded to
    9 dp so Spark and DuckDB make identical binary decisions on
    interpolated quantiles."""
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.round(F.sum("l_quantity"), 4).alias("total_qty")
    )
    probs = [i / 10 for i in range(1, 10)]
    edges = per_part.agg(
        F.array_distinct(
            F.transform(
                F.percentile("total_qty", F.array(*[F.lit(p) for p in probs])),
                lambda e: F.round(e, 9),
            )
        ).alias("edges")
    )
    return (
        per_part.crossJoin(F.broadcast(edges))
        .select(
            "l_partkey",
            "total_qty",
            (
                1
                + F.size(
                    F.filter(
                        F.col("edges"),
                        lambda e: F.round(F.col("total_qty"), 9) >= e,
                    )
                )
            ).alias("decile"),
        )
    )


QUERIES = {
    "min_tie_expansion": q_min_tie_expansion,
    "frank_level_buckets": q_frank_level_buckets,
    "rank_compound_order": q_rank_compound_order,
    "topk_per_group": q_topk_per_group,
    "decile_bucketing": q_decile_bucketing,
}

ORACLE = {
    "min_tie_expansion": """
        SELECT o_custkey, o_orderkey, o_totalprice FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice ASC) AS rk
            FROM orders
        ) t WHERE rk = 1
    """,
    "frank_level_buckets": """
        SELECT p_brand, p_partkey, frac_rank,
               CASE WHEN frac_rank < 0.25 THEN 'Low'
                    WHEN frac_rank < 0.75 THEN 'Medium'
                    ELSE 'High' END AS level
        FROM (
            SELECT p_brand, p_partkey,
                   round(
                     CAST(rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice ASC) AS DOUBLE)
                     / count(*) OVER (PARTITION BY p_brand), 6) AS frac_rank
            FROM part
        ) t
    """,
    "rank_compound_order": """
        SELECT event_type, event_id,
               row_number() OVER (
                   PARTITION BY event_type ORDER BY value ASC, event_id DESC
               ) - 1 AS article_rank
        FROM events
    """,
    "topk_per_group": """
        SELECT o_custkey, o_orderkey, o_totalprice, rn AS rank_n FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey ASC
                   ) AS rn
            FROM orders
        ) t WHERE rn <= 5
    """,
    "decile_bucketing": """
        WITH t AS (
            SELECT l_partkey, round(sum(l_quantity), 4) AS total_qty
            FROM lineitem GROUP BY l_partkey
        ),
        edges AS (
            SELECT list_distinct(list_transform(
                quantile_cont(total_qty,
                    [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]),
                e -> round(e, 9))) AS es
            FROM t
        )
        SELECT l_partkey, total_qty,
               1 + len(list_filter(es, e -> round(total_qty, 9) >= e))
                   AS decile
        FROM t, edges
    """,
}
