"""Dataset/provenance lineage + the printed-count oracle.

The reference records every load in `dataset` + `provenance` rows
(`loaders/TCRD.py:412-438`; schema `SQL/create-TCRDv7.sql:297,1693`)
and its de-facto regression oracle is the loader's printed counts
(`doc/README_v6.txt` throughout — SURVEY §5). Both patterns kept as
first-class: `record_load` appends the lineage rows; `count_report`
regenerates the per-table/type counts a build log would print, as a
DataFrame you can diff between runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tcrd_spark.schema.tables import surrogate_id


def record_load(
    spark: SparkSession,
    name: str,
    source: str,
    targets: list[tuple[str, str | None, str | None]],
    app: str = "tcrd_spark",
    comments: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Build (dataset_row, provenance_rows) for a load.

    targets: [(table_name, column_name, where_clause), ...] — one
    provenance row per written slice, exactly the reference's shape.
    Dataset id is the deterministic surrogate of (name, source) so
    re-runs are idempotent."""
    ds = spark.createDataFrame(
        [(name, source, app, comments)],
        "name string, source string, app string, comments string",
    ).select(
        surrogate_id(F.concat_ws("|", "name", "source")).alias("id"),
        "name",
        "source",
        "app",
        F.lit(None).cast("string").alias("app_version"),
        F.date_format(F.current_timestamp(), "yyyy-MM-dd HH:mm:ss").alias(
            "datetime"
        ),
        F.lit(None).cast("string").alias("url"),
        "comments",
    )
    prov = spark.createDataFrame(
        [
            (name, source, t, c, w)
            for (t, c, w) in targets
        ],
        "name string, source string, table_name string, "
        "column_name string, where_clause string",
    ).select(
        surrogate_id(
            F.concat_ws("|", "name", "source", "table_name",
                        F.coalesce("column_name", F.lit("")),
                        F.coalesce("where_clause", F.lit("")))
        ).alias("id"),
        surrogate_id(F.concat_ws("|", "name", "source")).alias("dataset_id"),
        "table_name",
        "column_name",
        "where_clause",
        F.lit(None).cast("string").alias("comment"),
    )
    return ds, prov


def count_report(lake: dict[str, DataFrame]) -> DataFrame:
    """One row per (table, type-ish breakdown) — the count dashboard
    the reference prints after every load. Diff two reports to get the
    'Inserted N rows' regression signal."""
    from tcrd_spark.api.adaptor import get_beans

    return get_beans(lake).orderBy("table_name", "type")


def diff_reports(before: DataFrame, after: DataFrame) -> DataFrame:
    """The 'Inserted N rows' line of every reference build log
    (`doc/README_v6.txt` throughout), computed as a report diff:
    per (table, type), the count delta between two count_report
    snapshots. Full-outer join so tables appearing or vanishing show
    as pure inserts/deletes; unchanged rows are dropped."""
    b = before.select(
        F.col("table_name").alias("tb"),
        F.col("type").alias("yb"),
        F.col("ct").alias("ct_before"),
    )
    a = after.select(
        F.col("table_name").alias("ta"),
        F.col("type").alias("ya"),
        F.col("ct").alias("ct_after"),
    )
    return (
        # eqNullSafe: a NULL type key must match itself, or every
        # unchanged untyped row shows as a spurious +N/-N pair
        b.join(
            a,
            (F.col("tb") == F.col("ta"))
            & F.col("yb").eqNullSafe(F.col("ya")),
            "full_outer",
        )
        .select(
            F.coalesce("tb", "ta").alias("table_name"),
            F.coalesce("yb", "ya").alias("type"),
            F.coalesce("ct_before", F.lit(0)).alias("ct_before"),
            F.coalesce("ct_after", F.lit(0)).alias("ct_after"),
            (
                F.coalesce("ct_after", F.lit(0))
                - F.coalesce("ct_before", F.lit(0))
            ).alias("delta"),
        )
        .filter(F.col("delta") != 0)
        .orderBy("table_name", "type")
    )
