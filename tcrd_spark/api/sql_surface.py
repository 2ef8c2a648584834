"""SQL surface: temp views per lake table + registered SQL functions.

The reference exposes everything through hand-written SQL; parity+
here (SURVEY §2.10: 'expose spark.udf.register') is a real SQL
surface: `register_all(spark, sf_dir)` installs the lake tables as
views and the engine's scalar functions as SQL temp functions, so

    spark.sql("SELECT doc_id, tcrd_token_count(text) FROM documents")

works for a SQL-only consumer. Each function is declared as a SQL
macro (CREATE TEMPORARY FUNCTION ... RETURN <expr>) — pure Catalyst
expressions, no Python round-trip, mirroring the DataFrame-side
implementations (kept in sync by tests/test_sql_surface.py).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from tcrd_spark.sources.lake import register_views

# (name, typed args, return type, body)
_SQL_MACROS: list[tuple[str, str, str, str]] = [
    (
        "tcrd_hash60",
        "x STRING",
        "BIGINT",
        "CAST(conv(substring(md5(x), 1, 15), 16, 10) AS BIGINT)",
    ),
    (
        "tcrd_token_count",
        "x STRING",
        "INT",
        r"size(split(x, '\\s+'))",
    ),
    (
        "tcrd_stopword_hits",
        "x STRING",
        "INT",
        r"size(array_intersect(array_distinct(split(x, '\\s+')), "
        "array('the','a','and','of','to','is')))",
    ),
    (
        "tcrd_logistic_cdf",
        "x DOUBLE, mu DOUBLE, sigma DOUBLE",
        "DOUBLE",
        "1.0 / (1.0 + exp(-1.702 * ((x - mu) / sigma)))",
    ),
    (
        "tcrd_level_bucket",
        "v DOUBLE",
        "INT",
        "CASE WHEN v < 25 THEN 0 WHEN v < 50 THEN 1 "
        "WHEN v < 75 THEN 2 ELSE 3 END",
    ),
]


def register_functions(spark: SparkSession) -> list[str]:
    """Install the SQL function surface; returns registered names."""
    names = []
    for name, args, rtype, body in _SQL_MACROS:
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({args}) "
            f"RETURNS {rtype} RETURN {body}"
        )
        names.append(name)
    return names


def register_all(spark: SparkSession, sf_dir: str) -> list[str]:
    """Views for every lake table + the SQL function surface."""
    register_views(spark, sf_dir)
    return register_functions(spark)


# the canonical 3-way entity view, verbatim semantics from
# `SQL/create-TCRDv7.sql:2352`: targets joined to their proteins,
# restricted to proteins with TIN-X novelty rows
TINX_TARGET_VIEW_SQL = """
    SELECT t.id AS target_id, p.id AS protein_id, p.uniprot, p.sym,
           t.tdl, t.fam, p.family
    FROM target t
    JOIN t2tc ON t.id = t2tc.target_id
    JOIN protein p ON t2tc.protein_id = p.id
    WHERE p.id IN (SELECT DISTINCT protein_id FROM tinx_novelty)
"""


def register_domain_views(spark: SparkSession, lake) -> list[str]:
    """Install a TCRD lake (dict[str, DataFrame]) as temp views plus
    the `tinx_target` SQL view, so a SQL-only consumer can run the
    reference's canonical access path:

        spark.sql("SELECT * FROM tinx_target WHERE tdl = 'Tclin'")

    Returns the registered view names."""
    names = []
    for name, df in lake.items():
        df.createOrReplaceTempView(name)
        names.append(name)
    if {"target", "t2tc", "protein", "tinx_novelty"} <= set(lake):
        spark.sql(
            "CREATE OR REPLACE TEMPORARY VIEW tinx_target AS "
            + TINX_TARGET_VIEW_SQL
        )
        names.append("tinx_target")
    return names
