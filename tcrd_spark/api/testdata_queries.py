"""Driver-facing queries for the two API lifecycles of SURVEY.md §3,
bound to the TESTDATA star schema so the DuckDB oracle can hash-check
them:

- §3-A (get_target nested document, `loaders/TCRD.py:1857-2125`):
  assemble a nested per-customer document — orders as a sorted
  array<struct> with per-order lineitem counts — then project
  deterministic scalars THROUGH the nested value (sizes, row-local
  folds over the array, element_at of the sorted head). The oracle
  computes the same scalars relationally, so a hash match proves the
  collect_list(struct) assembly, its ordering, and the fold semantics.

- §3-B (tcrd2csv wide export, `python/tcrd2csv.py:45-270`): the flat
  wide row — scalar cols + counts + pipe-joined top-5 slice — as one
  SELECT over the nested document.

Scale notes: the document build is ONE shuffle per annotation table
(groupBy the entity key) + left joins on that key; the reference's
~40 point-queries × N entities pattern never appears. Sorting inside
the array (array_sort + reverse) is row-local, not a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tcrd_spark.sources.lake import load_table


def _customer_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(customer scalars, orders: array<struct<o_totalprice,
    o_orderkey, n_lines>> sorted by (totalprice, orderkey) DESC)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cust = load_table(spark, sf_dir, "customer")
    per_order = (
        orders.join(
            li.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
                F.count("*").alias("n_lines")
            ),
            "o_orderkey",
            "left",
        )
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
        )
    )
    docs = per_order.groupBy("o_custkey").agg(
        F.reverse(
            F.array_sort(
                F.collect_list(
                    F.struct("o_totalprice", "o_orderkey", "n_lines")
                )
            )
        ).alias("orders")
    )
    return cust.join(docs, cust.c_custkey == docs.o_custkey, "left").drop(
        "o_custkey"
    )


def q_nested_document(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lifecycle-A analogue: scalars projected through the nested doc."""
    doc = _customer_documents(spark, sf_dir)
    orders = F.coalesce(F.col("orders"), F.array())
    return doc.select(
        "c_custkey",
        F.col("c_name").alias("name"),
        F.size(orders).cast("long").alias("n_orders"),
        F.aggregate(
            orders, F.lit(0).cast("long"), lambda acc, o: acc + o["n_lines"]
        ).alias("n_lines"),
        F.round(
            F.aggregate(
                orders,
                F.lit(0.0),
                lambda acc, o: acc + o["o_totalprice"],
            ),
            2,
        ).alias("total_spent"),
        F.element_at(F.col("orders"), 1)["o_orderkey"].alias("top_orderkey"),
    )


def q_wide_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lifecycle-B analogue: the tcrd2csv-style wide flat row."""
    doc = _customer_documents(spark, sf_dir)
    orders = F.coalesce(F.col("orders"), F.array())
    return doc.select(
        "c_custkey",
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("mktsegment"),
        F.size(orders).cast("long").alias("order_count"),
        F.round(
            F.aggregate(
                orders, F.lit(0.0), lambda acc, o: acc + o["o_totalprice"]
            ),
            2,
        ).alias("total_spent"),
        F.array_join(
            F.transform(
                F.slice(orders, 1, 5),
                lambda o: o["o_orderkey"].cast("string"),
            ),
            "|",
        ).alias("top5_orders"),
    )


QUERIES = {
    "nested_document": q_nested_document,
    "wide_export": q_wide_export,
}

_DOC_SQL = """
    WITH ol AS (
      SELECT l_orderkey AS o_orderkey, count(*) AS n_lines
      FROM lineitem GROUP BY 1
    ),
    o AS (
      SELECT o_custkey, o_orderkey, o_totalprice,
             coalesce(n_lines, 0) AS n_lines
      FROM orders LEFT JOIN ol USING (o_orderkey)
    ),
    d AS (
      SELECT o_custkey,
             count(*) AS n_orders,
             CAST(sum(n_lines) AS BIGINT) AS n_lines,
             round(sum(o_totalprice), 2) AS total_spent,
             first(o_orderkey ORDER BY o_totalprice DESC, o_orderkey DESC)
               AS top_orderkey,
             string_agg(o_orderkey, '|'
                        ORDER BY o_totalprice DESC, o_orderkey DESC)
               FILTER (WHERE rn <= 5) AS top5_orders
      FROM (
        SELECT *,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC,
                                           o_orderkey DESC) AS rn
        FROM o
      )
      GROUP BY 1
    )
"""

ORACLE = {
    "nested_document": _DOC_SQL
    + """
    SELECT c_custkey,
           c_name AS name,
           coalesce(n_orders, 0) AS n_orders,
           coalesce(d.n_lines, 0) AS n_lines,
           coalesce(total_spent, 0.0) AS total_spent,
           top_orderkey
    FROM customer LEFT JOIN d ON c_custkey = o_custkey
    """,
    "wide_export": _DOC_SQL
    + """
    SELECT c_custkey,
           c_name AS name,
           c_mktsegment AS mktsegment,
           coalesce(n_orders, 0) AS order_count,
           coalesce(total_spent, 0.0) AS total_spent,
           coalesce(top5_orders, '') AS top5_orders
    FROM customer LEFT JOIN d ON c_custkey = o_custkey
    """,
}
