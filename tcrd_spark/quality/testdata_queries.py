"""Driver-facing quality/profiling queries with DuckDB oracles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from tcrd_spark.quality.profile import profile_table
from tcrd_spark.sources.lake import load_table


def q_profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile of the documents table (nulls, distincts,
    min/max) — the load-validation dashboard."""
    return profile_table(load_table(spark, sf_dir, "documents"))


QUERIES = {"profile_documents": q_profile_documents}


def _col_profile(c: str) -> str:
    return f"""
      SELECT '{c}' AS "column",
             count(*) AS n_rows,
             count(*) - count({c}) AS n_nulls,
             count(DISTINCT {c}) AS n_distinct,
             CAST(min({c}) AS VARCHAR) AS min_value,
             CAST(max({c}) AS VARCHAR) AS max_value
      FROM documents
    """


ORACLE = {
    "profile_documents": " UNION ALL ".join(
        _col_profile(c)
        for c in ("doc_id", "text", "lang", "source", "n_chars")
    )
}
