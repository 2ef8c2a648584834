"""Aggregation operators (SURVEY.md §2.4).

Patterns from the reference re-expressed as single groupBy/agg passes —
the reference's N+1 per-entity fan-out (`loaders/TCRD.py:1857-2125`,
~40 queries × 20,412 targets) collapses into one shuffle per grouping.
Partial (map-side) aggregation is automatic for all of these, so at
100 TB each agg shuffles only the grouped partials, never raw rows.

Float policy: every aggregated double is rounded (4-6 dp) IN BOTH the
Spark plan and the oracle SQL so cross-engine summation order cannot
flip the correctness hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tcrd_spark.sources.lake import load_table


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H Q1-style pricing summary.

    Exercises conditional/compound aggregation like `get_beans`
    (`loaders/TCRD.py:1711-1811`) and the group-sum loaders
    (`loaders/load-JensenLabPubMedScores.py:104-131`) in one pass.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q_beans_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_beans-style dashboard: COUNT(*), COUNT(DISTINCT), conditional
    counts in one row (`loaders/TCRD.py:1711-1733`, `:1686-1693`)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.agg(
        F.count("*").alias("total_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        F.sum(F.when(F.col("n_chars") > 500, 1).otherwise(0)).alias("long_docs"),
    )


def q_type_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY type histogram (`loaders/TCRD.py:1736-1809`)."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(F.count("*").alias("ct"))


def q_rollup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-key rollup with COUNT(DISTINCT)
    (`examples/SQL/disease_protein_counts.sql:1-9`)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("cust_ct")
    )


def q_group_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key running SUM over the whole history
    (`loaders/load-JensenLabPubMedScores.py:104-131`: Σ score over years
    per protein → one tdl_info row)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_suppkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
            "revenue"
        ),
        F.count("*").alias("n_items"),
    )


def q_median_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median per group (`R/gtex_process.R:36,39` median RPKM per
    (ENSG,SMTSD); `R/hpa_tau.R:8`). Spark 3.4+ `median` = interpolated
    percentile(0.5), matching R/DuckDB median semantics."""
    part = load_table(spark, sf_dir, "part")
    return part.groupBy("p_brand").agg(
        F.round(F.median("p_retailprice"), 4).alias("med_price"),
        F.count("*").alias("n_parts"),
    )


def q_mode_consensus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mode per group with deterministic tie-break — the consensus-
    expression histogram→mode pattern (`loaders/load-ConsensusExpressions.
    py:132-163`): count per (group, level), keep the level with max count
    (ties → lexicographically first), plus depth for the confidence calc."""
    orders = load_table(spark, sf_dir, "orders")
    counts = orders.groupBy("o_custkey", "o_orderpriority").agg(
        F.count("*").alias("ct")
    )
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("ct"), F.asc("o_orderpriority")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderpriority").alias("mode_priority"),
            F.col("ct").alias("mode_ct"),
        )
    )


def q_mean_std_population(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population mean/σ per type — HGram stats
    (`loaders/load-HGramCDFs.py:84-108`; numpy std is population σ, so
    `stddev_pop`, not sample stddev)."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.round(F.avg("value"), 4).alias("mu"),
        F.round(F.stddev_pop("value"), 4).alias("sigma"),
        F.count("*").alias("n"),
    )


def q_pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy().pivot() to a wide matrix — TDLevol uniprot × version
    (`python/mk-TDLevol.py:14-50`) and the tdl_info pivot every consumer
    hand-rolls (`python/tcrd2csv.py:90-270`)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_custkey",
            F.coalesce("O", F.lit(0)).alias("open_ct"),
            F.coalesce("F", F.lit(0)).alias("finished_ct"),
            F.coalesce("P", F.lit(0)).alias("pending_ct"),
        )
    )


def q_grouped_set_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped set-union → sorted pipe-join (`python/TIN-X.py:144-155`
    pid→set(pmids); pipe-joined lists `python/tcrd2csv.py:105,151`)."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("user_id").agg(
        F.array_join(F.array_sort(F.collect_set("event_type")), "|").alias(
            "event_types"
        ),
        F.countDistinct("event_type").alias("n_types"),
    )


def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped 3-way join + revenue agg + compound-sorted
    top-10: segment-filtered customers ⋈ pre-cutoff orders ⋈
    post-cutoff lineitems. The customer dim broadcasts; lineitem's
    date filter pushes into the parquet scan."""
    cutoff = "1998-07-01 00:00:00"
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < cutoff
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > cutoff
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey"))
        .limit(10)
    )


QUERIES = {
    "shipping_priority": q_shipping_priority,
    "pricing_summary": q_pricing_summary,
    "beans_counts": q_beans_counts,
    "type_histogram": q_type_histogram,
    "rollup_counts": q_rollup_counts,
    "group_sum": q_group_sum,
    "median_per_group": q_median_per_group,
    "mode_consensus": q_mode_consensus,
    "mean_std_population": q_mean_std_population,
    "pivot_wide": q_pivot_wide,
    "grouped_set_agg": q_grouped_set_agg,
}

ORACLE = {
    "shipping_priority": """
        SELECT l_orderkey, o_orderdate, o_orderpriority,
               round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-07-01 00:00:00'
          AND l_shipdate > TIMESTAMP '1998-07-01 00:00:00'
        GROUP BY 1, 2, 3
        ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
        LIMIT 10
    """,
    "pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 4) AS sum_qty,
               round(sum(l_extendedprice), 4) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
               round(avg(l_quantity), 4) AS avg_qty,
               round(avg(l_discount), 4) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "beans_counts": """
        SELECT count(*) AS total_docs,
               count(DISTINCT lang) AS n_langs,
               count(DISTINCT source) AS n_sources,
               CAST(sum(CASE WHEN n_chars > 500 THEN 1 ELSE 0 END) AS BIGINT) AS long_docs
        FROM documents
    """,
    "type_histogram": """
        SELECT event_type, count(*) AS ct FROM events GROUP BY event_type
    """,
    "rollup_counts": """
        SELECT o_orderstatus, o_orderpriority,
               count(DISTINCT o_custkey) AS cust_ct
        FROM orders GROUP BY o_orderstatus, o_orderpriority
    """,
    "group_sum": """
        SELECT l_suppkey,
               round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
               count(*) AS n_items
        FROM lineitem GROUP BY l_suppkey
    """,
    "median_per_group": """
        SELECT p_brand,
               round(median(p_retailprice), 4) AS med_price,
               count(*) AS n_parts
        FROM part GROUP BY p_brand
    """,
    "mode_consensus": """
        SELECT o_custkey, o_orderpriority AS mode_priority, ct AS mode_ct
        FROM (
            SELECT o_custkey, o_orderpriority, count(*) AS ct,
                   row_number() OVER (
                       PARTITION BY o_custkey
                       ORDER BY count(*) DESC, o_orderpriority ASC
                   ) AS rn
            FROM orders GROUP BY o_custkey, o_orderpriority
        ) t WHERE rn = 1
    """,
    "mean_std_population": """
        SELECT event_type,
               round(avg(value), 4) AS mu,
               round(stddev_pop(value), 4) AS sigma,
               count(*) AS n
        FROM events GROUP BY event_type
    """,
    "pivot_wide": """
        SELECT o_custkey,
               CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS open_ct,
               CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS finished_ct,
               CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS pending_ct
        FROM orders GROUP BY o_custkey
    """,
    "grouped_set_agg": """
        SELECT user_id,
               string_agg(DISTINCT event_type, '|' ORDER BY event_type) AS event_types,
               count(DISTINCT event_type) AS n_types
        FROM events GROUP BY user_id
    """,
}
