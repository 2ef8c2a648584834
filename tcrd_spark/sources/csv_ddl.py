"""CSV → schema inference → DDL codegen.

Reference: `python/csv2sql.py:26-120` (CsvCheck) scans a CSV twice to
guess per-column types, then prints CREATE TABLE + INSERTs. Spark has
the inference built in (`inferSchema`, one distributed pass); the
codegen shrinks to formatting the inferred StructType as ANSI DDL.
The INSERT emission disappears — data loads as
`read.csv(...).write.saveAsTable(...)`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BooleanType,
    DateType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructType,
    TimestampType,
)

_SQL_TYPES = {
    BooleanType(): "BOOLEAN",
    IntegerType(): "INTEGER",
    LongType(): "BIGINT",
    DoubleType(): "DOUBLE",
    StringType(): "VARCHAR",
    DateType(): "DATE",
    TimestampType(): "TIMESTAMP",
}


def infer_csv(
    spark: SparkSession, path: str, sep: str = ",", header: bool = True
) -> DataFrame:
    """One distributed inference pass (the reference's two
    driver-side scans)."""
    return spark.read.csv(
        path, sep=sep, header=header, inferSchema=True, nullValue=""
    )


def create_table_sql(table: str, schema: StructType) -> str:
    """StructType → ANSI CREATE TABLE (the csv2sql output format)."""
    cols = ",\n".join(
        f"  {f.name} {_SQL_TYPES.get(f.dataType, f.dataType.simpleString().upper())}"
        f"{'' if f.nullable else ' NOT NULL'}"
        for f in schema.fields
    )
    return f"CREATE TABLE {table} (\n{cols}\n);"


def csv_to_ddl(
    spark: SparkSession,
    path: str,
    table: str,
    sep: str = ",",
    header: bool = True,
) -> str:
    return create_table_sql(table, infer_csv(spark, path, sep, header).schema)
