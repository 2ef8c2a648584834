"""Compound-activity, antibody, GO-leaf, and rat loader families
(SURVEY.md §7 step 6, fourth batch).

- GO experimental leaf-term flags
  (`loaders/load-GOExptFuncLeafTDLIs.py:70-95`): the TDL input that
  rescues 2-dark-point targets to Tbio (`loaders/load-TDLs.py:
  120-126`). Leaf = a term no other term is_a-points to; computed
  set-wise from the OBO edge table instead of goatools' per-term
  children query.
- Antibodypedia counts (`loaders/load-Antibodypedia.py:84-110`): the
  web API's per-protein counts land as Ab Count / MAb Count /
  Antibodypedia.com URL tdl_infos (API fetch is an ingest shim; the
  transform is engine work).
- Guide to Pharmacology (`loaders/load-GuideToPharmacology.py:
  79-230`): ligand dim (antibody/peptide rows dropped) joined to
  interactions; no-activity and multi-uniprot rows skipped; activity
  value normalized to 8dp; uniprot→sym resolution.
- PubChem CIDs (`loaders/load-PubChemCIDs.py:92-129`): UniChem
  ChEMBL→PubChem map fills cmpd_activity.cmpd_pubchem_cid for ChEMBL
  activities — a broadcast-join column update, not 485k point UPDATEs.
- RGD rat QTLs/terms (`loaders/load-RGD.py:87-128`): 'None'-string
  scrubbing + typed columns keyed by nhprotein.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tcrd_spark.etl.resolve import resolve

# ------------------------------------------------------- GO leaf flags

GO_EXP_CODES = ("EXP", "IDA", "IPI", "IMP", "IGI", "IEP")
GO_LEAF_ITYPE = "Experimental MF/BP Leaf Term GOA"


def go_leaf_flags(goa: DataFrame, go_terms: DataFrame) -> DataFrame:
    """Per-protein 'Experimental MF/BP Leaf Term GOA' tdl_info
    (`loaders/load-GOExptFuncLeafTDLIs.py:70-95`).

    Keep GOAs whose go_term is NOT the cellular-component branch
    ('C:...' prefixed, `:81`) and whose evidence is an experimental
    code (`:74,83`); keep only terms that are LEAVES of the GO DAG —
    set-wise: a leaf is a term that never appears as an is_a parent
    (the goatools `len(gt.children) == 0` check `:90`). Matching GOAs
    pipe-format and '; '-join per protein in go_id order (the
    reference joins in its per-target query order; we pin go_id order
    so output is deterministic)."""
    parents = go_terms.select(
        F.explode("is_a").alias("term_id")
    ).distinct()
    leaves = go_terms.select("term_id").join(parents, "term_id", "left_anti")
    lv = F.broadcast(leaves)
    kept = goa.filter(
        ~F.col("go_term").startswith("C")
        & F.col("evidence").isin(*GO_EXP_CODES)
    )
    kept = kept.join(lv, kept["go_id"] == lv["term_id"], "left_semi")
    return (
        kept.select(
            "protein_id",
            F.concat_ws("|", "go_id", "go_term", "evidence").alias("s"),
            "go_id",
        )
        .groupBy("protein_id")
        .agg(
            F.concat_ws(
                "; ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("go_id", "s"))),
                    lambda x: x["s"],
                ),
            ).alias("string_value")
        )
        .select("protein_id", F.lit(GO_LEAF_ITYPE).alias("itype"),
                "string_value")
    )


# -------------------------------------------------------- Antibodypedia

AB_ITYPE, MAB_ITYPE, ABURL_ITYPE = (
    "Ab Count", "MAb Count", "Antibodypedia.com URL"
)


def load_antibodypedia(
    spark: SparkSession, tsv_path: str, protein: DataFrame
) -> DataFrame:
    """Antibodypedia per-protein counts (ingest-shim TSV
    `uniprot<TAB>ab_count<TAB>mab_count<TAB>url` of the web API the
    reference polls for 13h, `doc/README_v6.txt:334`) → three tdl_info
    rows per protein (`loaders/load-Antibodypedia.py:84-110`).
    Returns a long EAV frame: (protein_id, itype, integer_value,
    string_value)."""
    raw = spark.read.csv(
        tsv_path, sep="\t",
        schema="uniprot string, ab_count int, mab_count int, url string",
    )
    res = resolve(raw, protein.select("id", "uniprot"),
                  [("uniprot", "uniprot")], id_col="id", out_col="protein_id")
    r = res.resolved
    ints = r.select(
        "protein_id", F.lit(AB_ITYPE).alias("itype"),
        F.col("ab_count").alias("integer_value"),
        F.lit(None).cast("string").alias("string_value"),
    ).unionByName(
        r.select("protein_id", F.lit(MAB_ITYPE).alias("itype"),
                 F.col("mab_count").alias("integer_value"),
                 F.lit(None).cast("string").alias("string_value"))
    )
    urls = r.filter(F.col("url").isNotNull()).select(
        "protein_id", F.lit(ABURL_ITYPE).alias("itype"),
        F.lit(None).cast("int").alias("integer_value"),
        F.col("url").alias("string_value"),
    )
    return ints.unionByName(urls)


# ----------------------------------------------- Guide to Pharmacology


@dataclass
class GtoPdbLoad:
    cmpd_activity: DataFrame
    notfnd: DataFrame
    skipped_ligands: int     # antibody/peptide ligand rows
    skipped_rows: int        # no-activity or multi-uniprot interactions


def load_gtopdb(
    spark: SparkSession,
    ligands_path: str,
    interactions_path: str,
    protein: DataFrame,
    t2tc: DataFrame,
) -> GtoPdbLoad:
    """Guide to Pharmacology ligands + interactions CSVs →
    catype='Guide to Pharmacology' cmpd_activity rows
    (`loaders/load-GuideToPharmacology.py:79-230`).

    Ligand dim: antibody/peptide rows dropped (`:96-98`); kept columns
    name / pubchem_cid / smiles (`:99`). Interactions: rows with no
    activity value or a multi-uniprot ('|') target cell are skipped
    (`:168-173`), activity formatted to 8 decimal places (`:174`),
    resolution uniprot→sym (`:190-192`)."""
    lig_raw = spark.read.csv(
        ligands_path, header=True,
        schema=("ligand_id int, name string, c2 string, type string, "
                "c4 string, c5 string, c6 string, c7 string, c8 string, "
                "pubchem_cid string, c10 string, c11 string, c12 string, "
                "c13 string, smiles string"),
    )
    skipped_ligands = lig_raw.filter(
        F.col("type").isin("Antibody", "Peptide")
    ).count()
    ligands = lig_raw.filter(
        ~F.col("type").isin("Antibody", "Peptide")
    ).select("ligand_id", F.col("name").alias("cmpd_name_in_src"),
             "pubchem_cid", "smiles")

    inter = spark.read.csv(
        interactions_path, header=True,
        schema=("c0 string, c1 string, sym string, uniprot string, "
                "c4 string, c5 string, c6 string, c7 string, c8 string, "
                "c9 string, c10 string, c11 string, c12 string, "
                "ligand_id int, c14 string, c15 string, c16 string, "
                "c17 string, c18 string, c19 string, c20 string, "
                "c21 string, c22 string, c23 string, c24 string, "
                "c25 string, act_value string, c27 string, act_type string, "
                "c29 string, c30 string, c31 string, c32 string, "
                "c33 string, c34 string, c35 string, pmids string"),
    ).select("sym", "uniprot", "ligand_id", "act_value", "act_type", "pmids")
    bad = (
        F.col("act_value").isNull() | (F.col("act_value") == "")
        | F.col("uniprot").contains("|")
    )
    skipped_rows = inter.filter(bad).count()
    kept = inter.filter(~bad).join(
        F.broadcast(ligands), "ligand_id", "inner"
    )
    lookup = protein.join(t2tc, protein["id"] == t2tc["protein_id"]).select(
        "target_id", F.col("uniprot").alias("pup"), F.col("sym").alias("psym")
    )
    res = resolve(kept, lookup, [("uniprot", "pup"), ("sym", "psym")],
                  id_col="target_id", out_col="target_id")
    acts = res.resolved.select(
        "target_id", F.lit("Guide to Pharmacology").alias("catype"),
        F.col("ligand_id").cast("string").alias("cmpd_id_in_src"),
        "cmpd_name_in_src", "smiles",
        # the reference stores "%.8f" % float(value); round(…, 8) makes
        # the same binary decision without a string round-trip
        F.round(F.col("act_value").cast("double"), 8).alias("act_value"),
        "act_type",
        F.when(F.col("pmids") != "", F.col("pmids")).alias("pubmed_ids"),
        F.when(F.col("pubchem_cid") != "",
               F.col("pubchem_cid").cast("int")).alias("cmpd_pubchem_cid"),
    )
    return GtoPdbLoad(
        cmpd_activity=acts, notfnd=res.unresolved,
        skipped_ligands=skipped_ligands, skipped_rows=skipped_rows,
    )


# --------------------------------------------------------- PubChem CIDs


def fill_pubchem_cids(
    spark: SparkSession,
    unichem_path: str,
    cmpd_activity: DataFrame,
) -> DataFrame:
    """Fill cmpd_activity.cmpd_pubchem_cid for ChEMBL activities from
    the UniChem src1→src22 mapping TSV (`chembl_id<TAB>pubchem_cid`
    after header, `loaders/load-PubChemCIDs.py:92-129`). The
    reference's 485k-row point-UPDATE loop is one broadcast left join;
    non-ChEMBL rows and already-filled cids pass through untouched."""
    m = F.broadcast(
        spark.read.csv(unichem_path, sep="\t", header=True,
                       schema="chembl_id string, pubchem_cid int")
        .withColumnRenamed("chembl_id", "_chembl")
    )
    out = cmpd_activity.join(
        m,
        (cmpd_activity["catype"] == "ChEMBL")
        & (cmpd_activity["cmpd_id_in_src"] == m["_chembl"]),
        "left",
    )
    return out.withColumn(
        "cmpd_pubchem_cid", F.coalesce("cmpd_pubchem_cid", "pubchem_cid")
    ).drop("_chembl", "pubchem_cid")


# ----------------------------------------------------------------- RGD


@dataclass
class RgdLoad:
    rat_qtl: DataFrame
    rat_term: DataFrame


def load_rgd(
    spark: SparkSession, qtl_path: str, terms_path: str
) -> RgdLoad:
    """RGD rat QTL + term TSVs → rat_qtl / rat_term rows
    (`loaders/load-RGD.py:87-160`). The files are pre-joined by the
    KMC group, so no resolution pass — just the literal-'None' → NULL
    scrub the reference does field-by-field (`:107-118`)."""
    def scrub(c):
        return F.when(
            (F.col(c) != "None") & (F.col(c) != ""), F.col(c)
        ).alias(c)

    qtl = spark.read.csv(
        qtl_path, sep="\t", header=True,
        schema=("rgdid int, nhprotein_id int, qtl_rgdid int, "
                "qtl_symbol string, qtl_name string, lod string, "
                "p_value string, trait_name string, "
                "measurement_type string, associated_disease string, "
                "phenotype string"),
    ).select(
        "nhprotein_id", "rgdid", "qtl_rgdid", "qtl_symbol", "qtl_name",
        scrub("lod").cast("double").alias("lod"),
        scrub("p_value").cast("decimal(20,19)").alias("p_value"),
        scrub("trait_name"), scrub("measurement_type"),
        scrub("associated_disease"), scrub("phenotype"),
    )
    term = spark.read.csv(
        terms_path, sep="\t", header=True,
        schema=("rgdid int, term_id string, obj_symbol string, "
                "term_name string, qualifier string, evidence string, "
                "ontology string"),
    ).select("rgdid", "term_id", "obj_symbol", "term_name",
             scrub("qualifier"), scrub("evidence"), "ontology")
    return RgdLoad(rat_qtl=qtl, rat_term=term)
