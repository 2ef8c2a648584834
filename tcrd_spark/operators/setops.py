"""Distinct / set operations / sorts / limits (SURVEY.md §2.6)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tcrd_spark.sources.lake import load_table


def q_distinct_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT projection (`loaders/TCRD.py:2394-2420` distinct tissues,
    pathway names, dids...)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()


def q_intersect_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set intersection (`python/TIN-X.py:252` pmid-set ∩): users who
    both purchased and hit an error."""
    events = load_table(spark, sf_dir, "events")
    a = events.filter(F.col("event_type") == "purchase").select("user_id")
    b = events.filter(F.col("event_type") == "error").select("user_id")
    return a.intersect(b)


def q_except_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference: English docs that did not come from source src0."""
    docs = load_table(spark, sf_dir, "documents")
    a = docs.filter(F.col("lang") == "en").select("doc_id")
    b = docs.filter(F.col("source") == "src0").select("doc_id")
    return a.subtract(b)  # EXCEPT (distinct) semantics, matching the SQL oracle


def q_dedup_composite_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup by composite key (`R/exp-atlas_process.R:47` unique by
    (Gene ID, DOID); `R/process-CCLE.R:44`)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_partkey", "l_suppkey").dropDuplicates()


QUERIES = {
    "distinct_projection": q_distinct_projection,
    "intersect_sets": q_intersect_sets,
    "except_sets": q_except_sets,
    "dedup_composite_key": q_dedup_composite_key,
}

ORACLE = {
    "distinct_projection": """
        SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
    "intersect_sets": """
        SELECT user_id FROM events WHERE event_type = 'purchase'
        INTERSECT
        SELECT user_id FROM events WHERE event_type = 'error'
    """,
    "except_sets": """
        SELECT doc_id FROM documents WHERE lang = 'en'
        EXCEPT
        SELECT doc_id FROM documents WHERE source = 'src0'
    """,
    "dedup_composite_key": """
        SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    """,
}
