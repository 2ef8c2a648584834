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


def export_sql_dump(
    lake: dict[str, DataFrame],
    out_dir: str,
    tables: list[str] | None = None,
) -> list[str]:
    """SQL-dump subset export — the reference ships mysqldump subsets
    (`doc/TCRD*.sql.gz` releases; SURVEY §2.1 'SQL dump subset
    export'). Spark-first that's one DDL file (CREATE TABLE per table,
    from the live schema) plus one CSV directory per table, written in
    parallel — a `CREATE TABLE` + `COPY FROM` pair any warehouse can
    ingest, replacing row-at-a-time INSERT emission.

    Returns the written table names; `<out_dir>/schema.sql` carries
    the DDL."""
    import os

    names = sorted(tables if tables is not None else lake.keys())
    ddl = "\n\n".join(
        create_table_sql(t, lake[t].schema) for t in names
    )
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "schema.sql"), "w") as fh:
        fh.write(ddl + "\n")
    for t in names:
        lake[t].write.mode("overwrite").option("header", True).csv(
            os.path.join(out_dir, t)
        )
    return names
