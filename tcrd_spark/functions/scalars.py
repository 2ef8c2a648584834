"""Scalar function surface (SURVEY.md §2.7): string / math / date /
array / JSON / conditional — all JVM-side built-ins (whole-stage
codegen), zero Python UDFs in this module.

The string+math and json+conditional families are exercised by merged
driver queries (one scan each) so the whole §2.7 surface fits inside
the driver's 50-query correctness window; the per-family builders
remain importable for tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tcrd_spark.sources.lake import load_table


def q_string_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family (`loaders/TCRDMP.py:2507-2508` LOWER match;
    `loaders/load-KEGGDistances.py:132-133` strip prefixes;
    `python/TIN-X.py:146` concat keys) + math family (`R/gtex_process
    .R:36` log2foldchange; `python/TIN-X.py:216-221` reciprocal sums;
    the ifelse(x>0, log10, NULL) guard appears verbatim in
    gtex_process) in one per-row projection over `part`."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        # string family
        F.lower("p_name").alias("lname"),
        F.regexp_replace("p_name", " ", "_").alias("underscored"),
        F.regexp_extract("p_brand", r"#(\d+)", 1).cast("int").alias("brand_num"),
        F.concat_ws(",", "p_brand", "p_type").alias("compound_key"),
        F.split("p_name", " ").getItem(0).alias("first_word"),
        # math family
        F.round(F.log10("p_retailprice"), 6).alias("lg10"),
        F.round(F.log2("p_retailprice"), 6).alias("lg2"),
        F.round(F.lit(1.0) / F.col("p_retailprice"), 6).alias("recip"),
        F.when(F.col("p_size") > 10, F.round(F.log10(F.col("p_size")), 6)).alias(
            "guarded_log"
        ),
    )


def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year/month extraction + aggregation over time-series keys
    (pmscore/ptscore/patent_count year columns, SURVEY §1.1)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").alias("yr"), F.month("o_orderdate").alias("mo")
        )
        .agg(
            F.count("*").alias("ct"),
            F.round(F.sum("o_totalprice"), 4).alias("total"),
        )
    )


def q_json_case_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedded-JSON extraction (`drgc_resource.json` TEXT col, schema
    :500; `loaders/load-DRGC_Resources.py`) + 4-level bucket CASE and
    recode (`R/gtex_process.R:50` level buckets, `:21` gender 1→M/2→F)
    in one per-row projection over `events`."""
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_value"),
        F.when(F.col("value") < 25, "Not detected")
        .when(F.col("value") < 50, "Low")
        .when(F.col("value") < 75, "Medium")
        .otherwise("High")
        .alias("qual_value"),
        F.when(F.col("user_id") % 2 == 1, "M").otherwise("F").alias("recode"),
    )


QUERIES = {
    "string_math_funcs": q_string_math_funcs,
    "date_funcs": q_date_funcs,
    "json_case_funcs": q_json_case_funcs,
}

ORACLE = {
    "string_math_funcs": """
        SELECT p_partkey,
               lower(p_name) AS lname,
               replace(p_name, ' ', '_') AS underscored,
               CAST(regexp_extract(p_brand, '#(\\d+)', 1) AS INTEGER) AS brand_num,
               p_brand || ',' || p_type AS compound_key,
               string_split(p_name, ' ')[1] AS first_word,
               round(log10(p_retailprice), 6) AS lg10,
               round(log2(p_retailprice), 6) AS lg2,
               round(1.0 / p_retailprice, 6) AS recip,
               CASE WHEN p_size > 10 THEN round(log10(CAST(p_size AS DOUBLE)), 6) END
                   AS guarded_log
        FROM part
    """,
    "date_funcs": """
        SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
               CAST(month(o_orderdate) AS INTEGER) AS mo,
               count(*) AS ct,
               round(sum(o_totalprice), 4) AS total
        FROM orders GROUP BY 1, 2
    """,
    "json_case_funcs": """
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_value,
               CASE WHEN value < 25 THEN 'Not detected'
                    WHEN value < 50 THEN 'Low'
                    WHEN value < 75 THEN 'Medium'
                    ELSE 'High' END AS qual_value,
               CASE WHEN user_id % 2 = 1 THEN 'M' ELSE 'F' END AS recode
        FROM events
    """,
}
