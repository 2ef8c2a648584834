"""Cell-line / proteome expression loader families: CCLE and HPM
(SURVEY.md §7 step 6, fifth batch).

- CCLE (`R/process-CCLE.R:22-47` + `loaders/load-CCLE.py:85-96`): GCT
  melt, cell-line id split into (cell_id, tissue), ENSG version-suffix
  strip, left merge onto the ENSG xref with cartesian fan-out, NA drop
  + dedup, landing as etype='CCLE' expression rows.
- HPM (`loaders/load-HPM.py:100-150` + `R/hpm_tau.R:1-26`): RefSeq-
  resolved qualitative rows ('NA' number handling), Uberon name
  resolution, and the value-quantile tau → 'HPM Protein Tissue
  Specificity Index' tdl_info.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tcrd_spark.analytics.tau import tau_continuous_cut2
from tcrd_spark.sources.gct import read_gct


@dataclass
class CcleLoad:
    expression: DataFrame    # (protein_id, etype, tissue, cell_id, number_value)
    unresolved_genes: DataFrame   # distinct ENSGs with no xref match


def load_ccle(
    spark: SparkSession, gct_path: str, xref: DataFrame
) -> CcleLoad:
    """CCLE RNAseq GCT → etype='CCLE' expression rows.

    Mirrors `R/process-CCLE.R`: melt (`:24`), split the sample column
    on the FIRST '_' into cell_id + tissue (`:25-27`; samples without
    a '_' get a NULL tissue), strip the ENSG version suffix (`:29`),
    left-merge on the ENSG xref with fan-out (`allow.cartesian=T`,
    `:40`), drop unmatched and dedup (`:41-45`). The insert shape is
    `loaders/load-CCLE.py:95-96`."""
    long = read_gct(spark, gct_path, value_name="expression")
    shaped = long.select(
        F.regexp_replace("gene", r"\.\d+$", "").alias("ensg"),
        F.split("sample_id", "_", 2).getItem(0).alias("cell_id"),
        F.when(
            F.instr("sample_id", "_") > 0,
            F.expr("substring(sample_id, instr(sample_id, '_') + 1)"),
        ).alias("tissue"),
        "expression",
    )
    ensg = F.broadcast(
        xref.filter(F.col("xtype") == "ENSG").select(
            F.col("value").alias("_ensg"),
            F.col("protein_id").alias("protein_id"),
        )
    )
    joined = shaped.join(ensg, shaped["ensg"] == ensg["_ensg"], "left")
    expr = (
        joined.filter(F.col("protein_id").isNotNull())
        .select("protein_id", F.lit("CCLE").alias("etype"),
                "tissue", "cell_id",
                F.col("expression").alias("number_value"))
        .dropDuplicates()
    )
    unresolved = (
        joined.filter(F.col("protein_id").isNull())
        .select("ensg").distinct()
    )
    return CcleLoad(expression=expr, unresolved_genes=unresolved)


HPM_TAU_ITYPE = "HPM Protein Tissue Specificity Index"


@dataclass
class HpmLoad:
    expression: DataFrame    # (protein_id, etype, tissue, qual_value,
                             #  number_value, uberon_id)
    tau_tdl_info: DataFrame  # (protein_id, itype, number_value)
    notfnd: DataFrame        # RefSeq accessions with no xref match
    no_uberon: DataFrame     # distinct tissues with no uberon id


def load_hpm(
    spark: SparkSession,
    qual_path: str,
    xref: DataFrame,
    lake: dict[str, DataFrame],
    etype: str = "HPM Protein",
) -> HpmLoad:
    """HPM qualitative-expression TSV (`refseq, tissue, _, number,
    qual` after header) → expression rows + per-protein tau tdl_info
    (`loaders/load-HPM.py:100-150`).

    RefSeq accessions resolve through the RefSeq xref with fan-out to
    every matching protein (`:121-130` rs2pids); 'NA' numbers load as
    NULL keeping the qual_value (`:134-138`); tissues resolve to
    Uberon by name (`:140-147`). Tau comes from the value-quantile
    binning (`R/hpm_tau.R:1-26`) — the cut2-style edges of
    analytics.tau.tau_continuous_cut2 (equal values share a bin)."""
    from tcrd_spark.api.adaptor_mp import resolve_uberon_ids

    raw = spark.read.csv(
        qual_path, sep="\t", header=True,
        schema=("rs string, tissue string, c2 string, number string, "
                "qual string"),
    )
    rsx = F.broadcast(
        xref.filter(F.col("xtype") == "RefSeq").select(
            F.col("value").alias("_rs"),
            F.col("protein_id").alias("protein_id"),
        )
    )
    joined = raw.join(rsx, raw["rs"] == rsx["_rs"], "left")
    notfnd = joined.filter(F.col("protein_id").isNull()).select("rs").distinct()
    rows = joined.filter(F.col("protein_id").isNotNull()).select(
        "protein_id", "tissue",
        F.when(F.col("number") != "NA", F.col("number"))
        .cast("double").alias("number_value"),
        F.col("qual").alias("qual_value"),
    )
    rows = resolve_uberon_ids(lake, rows, name_col="tissue")
    expression = rows.select(
        "protein_id", F.lit(etype).alias("etype"), "tissue",
        "qual_value", "number_value",
        F.col("uid").alias("uberon_id"),
    )
    no_uberon = (
        expression.filter(F.col("uberon_id").isNull())
        .select("tissue").distinct()
    )
    tau = tau_continuous_cut2(
        rows.withColumn(
            "raw", F.coalesce(F.pow(F.lit(10.0), "number_value"), F.lit(0.0))
        ),
        "protein_id", "tissue", "raw",
    ).select(
        "protein_id", F.lit(HPM_TAU_ITYPE).alias("itype"),
        F.col("tau").alias("number_value"),
    )
    return HpmLoad(expression=expression, tau_tdl_info=tau,
                   notfnd=notfnd, no_uberon=no_uberon)
