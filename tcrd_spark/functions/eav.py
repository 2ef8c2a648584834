"""Typed-EAV helpers (SURVEY.md §1.1 'typed annotation' shape).

tdl_info / expression store one live value column per row, dictated by
the type dictionary (`info_type.data_type` ∈ Boolean/Date/Integer/
Number/String; the adaptor dereferences per row at `loaders/TCRD.py:
1886-1887, 2020-2022`). Here the dictionary joins in ONCE (broadcast —
it is tiny) and the dereference is a single when-chain; `pivot_infos`
additionally offers the wide view every consumer hand-rolls
(`python/tcrd2csv.py:90-270`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def eav_value_col(data_type: Column) -> Column:
    """The live value as a string, per the row's data_type."""
    return (
        F.when(data_type == "String", F.col("string_value"))
        .when(data_type == "Number", F.col("number_value").cast("string"))
        .when(data_type == "Integer", F.col("integer_value").cast("string"))
        .when(data_type == "Boolean", F.col("boolean_value").cast("string"))
        .when(data_type == "Date", F.col("date_value").cast("string"))
    )


def dereference(tdl_info: DataFrame, info_type: DataFrame) -> DataFrame:
    """tdl_info rows + (itype → value) with the typed column resolved.

    The reference caches the itype→column map per connection
    (`loaders/TCRD.py:3373-3394`); the Spark equivalent is this
    broadcast dimension join."""
    it = F.broadcast(info_type.select(F.col("name").alias("itype"), "data_type"))
    return tdl_info.join(it, "itype", "left").withColumn(
        "value", eav_value_col(F.col("data_type"))
    )


def pivot_infos(
    tdl_info: DataFrame,
    info_type: DataFrame,
    itypes: list[str],
    key: str = "protein_id",
) -> DataFrame:
    """Wide view: one column per requested itype (first value wins,
    matching the reference's dict semantics)."""
    d = dereference(tdl_info, info_type).filter(F.col("itype").isin(*itypes))
    return (
        d.groupBy(key)
        .pivot("itype", itypes)
        .agg(F.first("value", ignorenulls=True))
    )
