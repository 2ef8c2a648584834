"""Scans, projections, filters, predicates (SURVEY.md §2.1-2.2).

Reference semantics re-expressed on the driver star schema:
- explicit column projection (`examples/SQL/target_list.sql:1-24`)
- equality / threshold filters (`loaders/TCRD.py:1870`, `:2214`;
  COMPARTMENTS conf>=3 threshold `loaders/load-JensenLab-COMPARTMENTS.py:116`)
- null/empty predicates (`loaders/TCRD.py:2732`)
- LIKE prefix (`loaders/TCRD.py:2647` etype LIKE 'JensenLab Experiment%')
- regex cleanup (`loaders/load-KEGGDistances.py:132-133`, `R/gtex_process.R:34`)
- keyset pagination WHERE id > past_id (`loaders/TCRD.py:2152-2162`)

All filters/projections are plain Catalyst expressions so they push down
to the parquet scan (verify via `.explain`: PushedFilters / ReadSchema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tcrd_spark.sources.lake import load_table


def q_scan_project_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + equality + threshold filter, pushdown-eligible."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.filter((F.col("p_type") == "ECONOMY") & (F.col("p_size") >= 20))
        .select("p_partkey", "p_name", "p_retailprice")
    )


def q_filter_like_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE prefix + IS NOT NULL + non-empty predicate."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(
            F.col("lang").startswith("e")
            & F.col("text").isNotNull()
            & (F.col("text") != "")
        )
        .select("doc_id", "lang", "n_chars")
    )


def q_keyset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resumable keyset scan: WHERE id > past_id ORDER BY id LIMIT n.

    Kept as an API pattern (`loaders/TCRD.py:2152-2162`); on Spark the
    range predicate still prunes at the scan.
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderkey") > 500)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
        .limit(100)
    )


QUERIES = {
    "scan_project_filter": q_scan_project_filter,
    "filter_like_null": q_filter_like_null,
    "keyset_pagination": q_keyset_pagination,
}

ORACLE = {
    "scan_project_filter": """
        SELECT p_partkey, p_name, p_retailprice
        FROM part WHERE p_type = 'ECONOMY' AND p_size >= 20
    """,
    "filter_like_null": """
        SELECT doc_id, lang, n_chars
        FROM documents
        WHERE lang LIKE 'e%' AND text IS NOT NULL AND text <> ''
    """,
    "keyset_pagination": """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders WHERE o_orderkey > 500
        ORDER BY o_orderkey LIMIT 100
    """,
}
