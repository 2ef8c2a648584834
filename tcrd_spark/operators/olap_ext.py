"""Multi-level OLAP aggregation (CUBE / GROUPING SETS) and UNPIVOT.

The reference computes its per-dimension summary counts with a family
of hand-written GROUP BY queries fanned over each dimension combination
(`examples/SQL/tdl_counts.sql`, `loaders/TCRD.py` dba_info rollups) and
reshapes wide attribute rows to long triples in export scripts
(`python/tcrd2csv.py:105-151` column-wise loops). Spark expresses both
declaratively:

* ``df.cube(a, b).agg(...)`` / ``GROUP BY GROUPING SETS`` computes every
  subtotal level in ONE pass — Catalyst plans an Expand (one row copy
  per grouping set) feeding a single hash aggregate, so a 100 TB fact
  table is scanned once instead of 2^k times. Partial (map-side)
  aggregation still applies after the Expand, so the shuffle carries
  pre-combined partials, not raw rows.
* ``df.unpivot`` (Spark 3.4+, the built-in melt) turns k value columns
  into k rows per id JVM-side — an Expand node again, no Python, no
  explode of hand-built structs.

`grouping_id()` disambiguates a genuine NULL key from a subtotal row —
the exported column is the bitmask, exactly DuckDB's GROUPING() pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tcrd_spark.sources.lake import load_table


def cube_agg(df: DataFrame, keys: list[str], aggs: list) -> DataFrame:
    """All 2^k subtotal levels in one scan, tagged with grouping_id.
    grouping_id is only defined INSIDE the grouping aggregate (it reads
    the Expand node's spark_grouping_id), so it rides the agg list."""
    gid = F.grouping_id(*[F.col(k) for k in keys]).alias("gid")
    return df.cube(*keys).agg(gid, *aggs)


def unpivot_long(
    df: DataFrame, ids: list[str], values: list[str],
    var_col: str = "metric", val_col: str = "value",
) -> DataFrame:
    """Wide → long melt of `values` columns, JVM-side Expand."""
    return df.unpivot(ids, values, var_col, val_col)


# ------------------------------------------------- registered queries


def q_cube_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (orderstatus, orderpriority): per-cell, per-status,
    per-priority, and grand-total order counts + revenue in one scan."""
    orders = load_table(spark, sf_dir, "orders")
    out = cube_agg(
        orders,
        ["o_orderstatus", "o_orderpriority"],
        [
            F.count("*").alias("n_orders"),
            # money sums over CUBE grand-total cells aggregate the whole
            # table: double sums drift ~1e-4 at sf1 (order-dependent),
            # past any rounding. Sum exact integer-cents DECIMALs — both
            # engines are then bit-identical at every scale.
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        ],
    )
    return out.select(
        "o_orderstatus", "o_orderpriority", "gid", "n_orders", "revenue"
    )


def q_grouping_sets_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the reference's separate per-dimension
    count queries as ONE pass: (status), (priority), and () only (no
    full cross cell, unlike CUBE)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "_gs_orders"
    )
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               grouping_id(o_orderstatus, o_orderpriority) AS gid,
               count(*) AS n_orders,
               round(avg(o_totalprice), 4) AS avg_price
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


def q_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Melt per-document numeric quality metrics to long (doc_id,
    metric, value) rows — the export-reshape pattern, Expand-planned."""
    docs = load_table(spark, sf_dir, "documents")
    wide = docs.select(
        "doc_id",
        F.col("n_chars").cast("double").alias("n_chars"),
        F.size(F.split(F.col("text"), r"\s+")).cast("double").alias(
            "n_ws_tokens"
        ),
        F.length(F.regexp_replace(F.col("text"), r"[^.!?]", "")).cast(
            "double"
        ).alias("n_sentences_approx"),
    )
    return unpivot_long(
        wide, ["doc_id"], ["n_chars", "n_ws_tokens", "n_sentences_approx"]
    )


QUERIES = {
    "cube_counts": q_cube_counts,
    "grouping_sets_mix": q_grouping_sets_mix,
    "unpivot_metrics": q_unpivot_metrics,
}

ORACLE = {
    "cube_counts": """
        SELECT o_orderstatus, o_orderpriority,
               GROUPING(o_orderstatus, o_orderpriority) AS gid,
               count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS revenue
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    "grouping_sets_mix": """
        SELECT o_orderstatus, o_orderpriority,
               GROUPING(o_orderstatus, o_orderpriority) AS gid,
               count(*) AS n_orders,
               round(avg(o_totalprice), 4) AS avg_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    "unpivot_metrics": """
        WITH wide AS (
            SELECT doc_id,
                   CAST(n_chars AS DOUBLE) AS n_chars,
                   CAST(len(string_split_regex(text, '\\s+')) AS DOUBLE)
                       AS n_ws_tokens,
                   CAST(length(regexp_replace(text, '[^.!?]', '', 'g'))
                        AS DOUBLE) AS n_sentences_approx
            FROM documents
        )
        SELECT doc_id, 'n_chars' AS metric, n_chars AS value FROM wide
        UNION ALL
        SELECT doc_id, 'n_ws_tokens', n_ws_tokens FROM wide
        UNION ALL
        SELECT doc_id, 'n_sentences_approx', n_sentences_approx FROM wide
    """,
}
