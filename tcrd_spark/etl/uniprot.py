"""UniProt core-slice transform: parsed <entry> rows → the normalized
core entity tables (SURVEY.md §7 step 2 — "this unlocks every
downstream join").

Reference: `loaders/load-UniProt.py` builds one nested target dict per
entry (entry2target, :224-375) and row-inserts it across
target/protein/t2tc/alias/xref/goa/feature/expression. Here the nested
entries DataFrame (sources/uniprot_xml.py) explodes into each table in
one pass; ids are deterministic surrogates of the natural keys
(uniprot accession; child rows key on their content) so re-runs and
child-table FKs are stable without AUTO_INCREMENT (SURVEY §1.2 /
§7 hard part b).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tcrd_spark.schema.tables import surrogate_id


def core_slice(entries: DataFrame, dataset_id: int = 1) -> dict[str, DataFrame]:
    """entries (ENTRY_SCHEMA of sources/uniprot_xml.py) → dict of
    target / protein / t2tc / alias / xref / goa / feature /
    expression DataFrames shaped per schema/tables.py."""
    pid = surrogate_id(F.col("uniprot"))
    protein = entries.select(
        pid.alias("id"),
        F.col("name"),
        F.col("description"),
        F.col("uniprot"),
        F.col("sym"),
    )
    target = entries.select(
        pid.alias("id"),
        F.coalesce(F.col("description"), F.col("name")).alias("name"),
        F.lit("Single Protein").alias("ttype"),
    )
    t2tc = entries.select(
        pid.alias("target_id"), pid.alias("protein_id")
    )
    # accession + symbol-synonym aliases (entry2target keeps secondary
    # accessions as 'uniprot' aliases, gene synonyms as 'symbol')
    alias = (
        entries.select(
            pid.alias("protein_id"), F.explode("aliases").alias("a")
        )
        .select(
            surrogate_id(
                F.concat_ws("|", F.col("protein_id"), "a.type", "a.value")
            ).alias("id"),
            "protein_id",
            F.col("a.type").alias("type"),
            F.col("a.value").alias("value"),
            F.lit(dataset_id).alias("dataset_id"),
        )
    )
    xref = (
        entries.select(
            pid.alias("protein_id"), F.explode("xrefs").alias("x")
        )
        .select(
            surrogate_id(
                F.concat_ws("|", F.col("protein_id"), "x.xtype", "x.value")
            ).alias("id"),
            F.col("x.xtype").alias("xtype"),
            F.lit(None).cast("long").alias("target_id"),
            "protein_id",
            F.col("x.value").alias("value"),
            F.lit(None).cast("string").alias("xtra"),
            F.lit(dataset_id).alias("dataset_id"),
        )
    )
    goa = (
        entries.select(pid.alias("protein_id"), F.explode("goas").alias("g"))
        .select(
            surrogate_id(
                F.concat_ws("|", F.col("protein_id"), "g.go_id")
            ).alias("id"),
            "protein_id",
            F.col("g.go_id").alias("go_id"),
            F.col("g.go_term").alias("go_term"),
            F.col("g.evidence").alias("evidence"),
        )
    )
    feature = (
        entries.select(
            pid.alias("protein_id"), F.explode("features").alias("f")
        )
        .select(
            surrogate_id(
                F.concat_ws(
                    "|", F.col("protein_id"), "f.ftype", "f.description",
                    F.coalesce(F.col("f.begin"), F.lit(-1)),
                    F.coalesce(F.col("f.end"), F.lit(-1)),
                )
            ).alias("id"),
            "protein_id",
            F.col("f.ftype").alias("type"),
            F.col("f.description").alias("description"),
            F.col("f.begin").alias("begin"),
            F.col("f.end").alias("end"),
        )
    )
    expression = (
        entries.select(
            pid.alias("protein_id"), F.explode("expressions").alias("e")
        )
        .select(
            surrogate_id(
                F.concat_ws("|", F.col("protein_id"), "e.etype", "e.tissue")
            ).alias("id"),
            F.col("e.etype").alias("etype"),
            "protein_id",
            F.col("e.tissue").alias("tissue"),
            F.lit(True).alias("boolean_value"),
        )
    )
    return {
        "target": target,
        "protein": protein,
        "t2tc": t2tc,
        "alias": alias,
        "xref": xref,
        "goa": goa,
        "feature": feature,
        "expression": expression,
    }
