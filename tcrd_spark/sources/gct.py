"""GCT expression-matrix source (GTEx / CCLE).

Reference: R reads the .gct with skip=2, drops Description, melts the
wide sample columns to long (`R/gtex_process.R:29-32`,
`R/process-CCLE.R:22-27`). Spark-first: zipWithIndex to shed the two
header lines deterministically (no order assumptions on the reader),
csv-parse against the line-3 header, then `unpivot` (Spark ≥3.4 melt)
to (gene, sample, value) long form — the shape every downstream
median/tau aggregation wants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_gct(
    spark: SparkSession, path: str, value_name: str = "value"
) -> DataFrame:
    sc = spark.sparkContext
    indexed = sc.textFile(path).zipWithIndex()
    header = indexed.filter(lambda t: t[1] == 2).map(lambda t: t[0]).collect()
    if not header:
        raise ValueError(f"{path}: no header line (line 3) — not a GCT?")
    cols = header[0].split("\t")
    body = indexed.filter(lambda t: t[1] > 2).map(lambda t: t[0].split("\t"))
    df = spark.createDataFrame(body, schema=cols)
    # Name -> gene id; Description dropped (gtex_process.R:31)
    sample_cols = [c for c in cols if c not in ("Name", "Description")]
    long = (
        df.withColumnRenamed("Name", "gene")
        .drop("Description")
        .unpivot(
            ids=["gene"],
            values=sample_cols,
            variableColumnName="sample_id",
            valueColumnName=value_name,
        )
        .withColumn(value_name, F.col(value_name).cast("double"))
    )
    return long


def sample_to_subject(sample_id: F.Column) -> F.Column:
    """GTEx SAMPID → SUBJID: first two dash-separated components
    (`R/gtex_process.R:23` separate + unite)."""
    parts = F.split(sample_id, "-")
    return F.concat_ws("-", parts.getItem(0), parts.getItem(1))
