"""StructType declarations for the TCRD core tables.

Mirrors `SQL/create-TCRDv7.sql` (reference) with the §1.2 type mapping:
enums → string + validation domain, tinyint(1) → boolean, decimal kept
as DecimalType where the reference stores high-scale scores (TIN-X
decimal(34,16) at :2135, clinvar), AUTO_INCREMENT ids → deterministic
surrogate ids (see surrogate_id) because child tables FK by id and ids
must be stable across runs.

Only the core entity slice + the highest-traffic annotation tables are
declared explicitly; they establish the pattern (name-keyed dimension
dictionaries, typed-EAV annotation tables, M:N bridges) that the
remaining ~50 follow.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DateType,
    DecimalType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# enum domains (`SQL/create-TCRDv7.sql:1923,1925,592`)
TDL_VALUES = ("Tclin+", "Tclin", "Tchem+", "Tchem", "Tbio", "Tgray", "Tdark")
FAM_VALUES = (
    "Enzyme", "Epigenetic", "GPCR", "IC", "Kinase", "NR", "oGPCR",
    "TF", "TF; Epigenetic", "Transporter",
)
QUAL_VALUES = ("Not detected", "Low", "Medium", "High")
# `data_type` domain (create-TCRDv7.sql:286)
DATA_TYPES = ("Boolean", "Date", "Integer", "Number", "String")


def _s(*fields) -> StructType:
    return StructType([StructField(n, t, nullable) for n, t, nullable in fields])


TABLE_SCHEMAS: dict[str, StructType] = {
    # --- core entity triple (create-TCRDv7.sql:1918,1891,1631)
    "target": _s(
        ("id", LongType(), False),
        ("name", StringType(), False),
        ("ttype", StringType(), False),
        ("description", StringType(), True),
        ("comment", StringType(), True),
        ("tdl", StringType(), True),          # enum TDL_VALUES
        ("idg", BooleanType(), True),
        ("fam", StringType(), True),          # enum FAM_VALUES
        ("famext", StringType(), True),
    ),
    "protein": _s(
        ("id", LongType(), False),
        ("name", StringType(), False),
        ("description", StringType(), True),
        ("uniprot", StringType(), False),
        ("up_version", IntegerType(), True),
        ("geneid", LongType(), True),
        ("sym", StringType(), True),
        ("family", StringType(), True),
        ("chr", StringType(), True),
        ("seq", StringType(), True),
        ("dtoid", StringType(), True),
        ("stringid", StringType(), True),
    ),
    "t2tc": _s(
        ("target_id", LongType(), False),
        ("protein_id", LongType(), False),
    ),
    # --- typed-EAV annotations (tdl_info :1948; value cols :1954-1958)
    "tdl_info": _s(
        ("id", LongType(), False),
        ("itype", StringType(), False),
        ("target_id", LongType(), True),
        ("protein_id", LongType(), True),
        ("string_value", StringType(), True),
        ("number_value", DoubleType(), True),
        ("integer_value", IntegerType(), True),
        ("date_value", DateType(), True),
        ("boolean_value", BooleanType(), True),
        ("curration_level", StringType(), True),
    ),
    "info_type": _s(
        ("name", StringType(), False),
        ("data_type", StringType(), False),   # enum DATA_TYPES
        ("unit", StringType(), True),
        ("description", StringType(), True),
    ),
    "expression": _s(
        ("id", LongType(), False),
        ("etype", StringType(), False),
        ("target_id", LongType(), True),
        ("protein_id", LongType(), True),
        ("tissue", StringType(), False),
        ("qual_value", StringType(), True),   # enum QUAL_VALUES
        ("number_value", DoubleType(), True),
        ("boolean_value", BooleanType(), True),
        ("string_value", StringType(), True),
        ("pubmed_id", LongType(), True),
        ("evidence", StringType(), True),
        ("zscore", DecimalType(8, 6), True),
        ("conf", DecimalType(2, 1), True),
        ("oid", StringType(), True),
        ("confidence", BooleanType(), True),
        ("url", StringType(), True),
        ("cell_id", StringType(), True),
        ("uberon_id", StringType(), True),
    ),
    # --- common annotation tables
    "xref": _s(
        ("id", LongType(), False),
        ("xtype", StringType(), False),
        ("target_id", LongType(), True),
        ("protein_id", LongType(), True),
        ("value", StringType(), False),
        ("xtra", StringType(), True),
        ("dataset_id", LongType(), False),
    ),
    "alias": _s(
        ("id", LongType(), False),
        ("protein_id", LongType(), False),
        ("type", StringType(), False),        # enum ('symbol','uniprot')
        ("value", StringType(), False),
        ("dataset_id", LongType(), False),
    ),
    "generif": _s(
        ("id", LongType(), False),
        ("protein_id", LongType(), False),
        ("pubmed_ids", StringType(), True),
        ("text", StringType(), False),
        ("years", StringType(), True),
    ),
    "goa": _s(
        ("id", LongType(), False),
        ("protein_id", LongType(), False),
        ("go_id", StringType(), False),
        ("go_term", StringType(), True),
        ("evidence", StringType(), True),
        ("goeco", StringType(), True),
        ("assigned_by", StringType(), True),
    ),
    "disease": _s(
        ("id", LongType(), False),
        ("dtype", StringType(), False),
        ("target_id", LongType(), True),
        ("protein_id", LongType(), True),
        ("name", StringType(), False),
        ("did", StringType(), True),
        ("evidence", StringType(), True),
        ("zscore", DoubleType(), True),
        ("conf", DoubleType(), True),
        ("description", StringType(), True),
        ("reference", StringType(), True),
        ("drug_name", StringType(), True),
        ("log2foldchange", DoubleType(), True),
        ("pvalue", StringType(), True),
        ("score", DoubleType(), True),
        ("source", StringType(), True),
    ),
    "pathway": _s(
        ("id", LongType(), False),
        ("target_id", LongType(), True),
        ("protein_id", LongType(), True),
        ("pwtype", StringType(), False),
        ("name", StringType(), False),
        ("id_in_source", StringType(), True),
        ("description", StringType(), True),
        ("url", StringType(), True),
    ),
    "ppi": _s(
        ("id", LongType(), False),
        ("ppitype", StringType(), False),
        ("protein1_id", LongType(), False),
        ("protein1_str", StringType(), True),
        ("protein2_id", LongType(), False),
        ("protein2_str", StringType(), True),
        ("p_int", DecimalType(10, 9), True),
        ("p_ni", DecimalType(10, 9), True),
        ("p_wrong", DecimalType(10, 9), True),
        ("evidence", StringType(), True),
        ("interaction_type", StringType(), True),
    ),
    "pmscore": _s(
        ("id", LongType(), False),
        ("protein_id", LongType(), False),
        ("year", IntegerType(), False),
        ("score", DecimalType(12, 6), False),
    ),
    "drug_activity": _s(
        ("id", LongType(), False),
        ("target_id", LongType(), False),
        ("drug", StringType(), False),
        ("act_value", DecimalType(10, 8), True),
        ("act_type", StringType(), True),
        ("action_type", StringType(), True),
        ("has_moa", BooleanType(), False),
        ("source", StringType(), True),
        ("reference", StringType(), True),
        ("smiles", StringType(), True),
        ("cmpd_chemblid", StringType(), True),
        ("nlm_drug_info", StringType(), True),
    ),
    "cmpd_activity": _s(
        ("id", LongType(), False),
        ("target_id", LongType(), False),
        ("catype", StringType(), False),
        ("cmpd_id_in_src", StringType(), False),
        ("cmpd_name_in_src", StringType(), True),
        ("smiles", StringType(), True),
        ("act_value", DecimalType(10, 8), True),
        ("act_type", StringType(), True),
        ("reference", StringType(), True),
        ("pubmed_ids", StringType(), True),
        ("cmpd_pubchem_cid", LongType(), True),
    ),
    # --- provenance/lineage (dataset :297, provenance :1693)
    "dataset": _s(
        ("id", LongType(), False),
        ("name", StringType(), False),
        ("source", StringType(), False),
        ("app", StringType(), True),
        ("app_version", StringType(), True),
        ("datetime", StringType(), True),
        ("url", StringType(), True),
        ("comments", StringType(), True),
    ),
    "provenance": _s(
        ("id", LongType(), False),
        ("dataset_id", LongType(), False),
        ("table_name", StringType(), False),
        ("column_name", StringType(), True),
        ("where_clause", StringType(), True),
        ("comment", StringType(), True),
    ),
}


def surrogate_id(natural_key: Column) -> Column:
    """Deterministic surrogate id from a natural key — stable across
    runs (FK integrity without AUTO_INCREMENT, SURVEY §1.2): 60-bit
    md5 prefix of the key."""
    return F.conv(F.substring(F.md5(natural_key), 1, 15), 16, 10).cast("long")


def validate_enum(df: DataFrame, col: str, domain: tuple[str, ...]) -> DataFrame:
    """Loader-side CHECK for enum columns: any out-of-domain value
    raises at action time (the reference relied on MySQL enum)."""
    bad = F.when(
        F.col(col).isNotNull() & ~F.col(col).isin(*domain), F.col(col)
    )
    return df.withColumn(
        col,
        F.when(
            bad.isNotNull(),
            F.raise_error(
                F.concat(F.lit(f"enum violation in {col}: "), F.col(col))
            ),
        ).otherwise(F.col(col)),
    )
