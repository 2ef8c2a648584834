"""Atlas / xref-fill / worklist loader families (SURVEY.md §7 step 6,
seventh batch).

- Generic id-xref fill (`loaders/load-L1000XRefs.py:90-101`,
  `load-GIs.py`, `load-ENSGs.py:181`, `load-UniProtXRefs.py` — four
  loaders, one shape): (value, sym, geneid) rows resolve sym→geneid
  and land as typed xrefs.
- CSPA (`loaders/load-CSPA.py:94-128`): high-confidence rows only,
  uniprot→geneid resolution, per-cell-line wide columns melting to
  boolean 'Cell Surface Protein Atlas' expressions.
- Human Cell Atlas (`loaders/load-HumanCellAtlas.py:114-258`): RNA
  TPM matrix → per-cell-line nonzero 33rd/66th percentiles → 4-level
  qual bucket + 'HCA RNA' expressions; S6 localization matrix →
  'Human Cell Atlas' compartments (zero votes and 'Uncertain'
  reliability dropped).
- eRAM (`loaders/load-eRAM.py:95-125`): per-disease curated-gene
  records fan out over genes × doids as dtype='eRAM' disease rows.
- TechDev worklists (`loaders/load-TechDevInfo.py:110-165`):
  key-value preamble → techdev_contact; target rows (skipped unless
  flagged in col 6, comment required) → techdev_info.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tcrd_spark.etl.resolve import Resolution, resolve

# --------------------------------------------------------- xref fills


def load_id_xrefs(
    spark: SparkSession, tsv_path: str, protein: DataFrame, xtype: str
) -> Resolution:
    """The 4-loader xref-fill family in one function: a TSV of
    `value<TAB>sym<TAB>geneid` resolves sym-first then geneid
    (`loaders/load-L1000XRefs.py:90-101`) and lands as (protein_id,
    xtype, value) xref rows in `resolved`; `unresolved` is the notfnd
    report. xtype ∈ {'L1000 ID', 'NCBI GI', 'ENSG', ...}."""
    raw = spark.read.csv(
        tsv_path, sep="\t", header=True,
        schema="value string, sym string, geneid int",
    )
    res = resolve(
        raw,
        protein.select("id", F.col("sym").alias("_sym"),
                       F.col("geneid").alias("_geneid")),
        [("sym", "_sym"), ("geneid", "_geneid")],
        id_col="id", out_col="protein_id",
    )
    return Resolution(
        resolved=res.resolved.select(
            "protein_id", F.lit(xtype).alias("xtype"), "value"
        ),
        unresolved=res.unresolved,
    )


# --------------------------------------------------------------- CSPA

CSPA_ETYPE = "Cell Surface Protein Atlas"


@dataclass
class CspaLoad:
    expression: DataFrame
    notfnd: DataFrame
    skipped: int             # non-high-confidence rows


def load_cspa(
    spark: SparkSession, csv_path: str, protein: DataFrame
) -> CspaLoad:
    """CSPA worksheet-B CSV: fixed cols (0-5, incl. confidence at 2,
    uniprot at 1, geneid at 4) then one column per cell line
    (`loaders/load-CSPA.py:94-128`). Only '1 - high confidence' rows
    load; every non-empty cell-line cell becomes one boolean
    expression row with tissue 'Cell Line <name>'."""
    raw = spark.read.csv(csv_path, header=True)
    cols = raw.columns
    fixed, cell_lines = cols[:6], [c for c in cols[6:] if c]
    conf_col, up_col, gid_col = cols[2], cols[1], cols[4]
    skipped = raw.filter(F.col(conf_col) != "1 - high confidence").count()
    kept = (
        raw.filter(F.col(conf_col) == "1 - high confidence")
        .select(
            F.col(up_col).alias("uniprot"),
            F.col(gid_col).cast("int").alias("geneid"),
            *[F.col(c).alias(c) for c in cell_lines],
        )
    )
    res = resolve(
        kept,
        protein.select("id", F.col("uniprot").alias("_up"),
                       F.col("geneid").alias("_geneid")),
        [("uniprot", "_up"), ("geneid", "_geneid")],
        id_col="id", out_col="protein_id",
    )
    expr = (
        res.resolved.unpivot(
            ids=["protein_id"], values=cell_lines,
            variableColumnName="cell_line", valueColumnName="val",
        )
        .filter(F.col("val").isNotNull() & (F.col("val") != ""))
        .select(
            "protein_id", F.lit(CSPA_ETYPE).alias("etype"),
            F.concat(F.lit("Cell Line "), "cell_line").alias("tissue"),
            F.lit(True).alias("boolean_value"),
        )
    )
    return CspaLoad(expression=expr, notfnd=res.unresolved, skipped=skipped)


# ----------------------------------------------------- Human Cell Atlas

HCA_ETYPE = "HCA RNA"
HCA_CTYPE = "Human Cell Atlas"


@dataclass
class HcaLoad:
    expression: DataFrame
    compartment: DataFrame
    notfnd: DataFrame


def load_hca(
    spark: SparkSession,
    rna_path: str,
    loc_path: str,
    protein: DataFrame,
    xref: DataFrame,
    compartment_go: dict[str, tuple[str, str]] | None = None,
) -> HcaLoad:
    """Human Cell Atlas Table S1 (RNA TPM matrix: ENSG, Gene, then
    '<cell line> (TPM)' columns) + Table S6 (localization: ENSG, Gene,
    Uniprot, compartment votes..., Reliability 5th-from-last) →
    expressions + compartments (`loaders/load-HumanCellAtlas.py`).

    Per cell line the qual bucket uses the 33rd/66th percentiles of
    the NONZERO tpms (`calc_pctiles` `:261-270`, linear interpolation
    like numpy == Spark `percentile`): 0 → 'Not detected', ≤p33 →
    'Low', ≤p66 → 'Medium', else 'High' (`:249-259`). RNA rows resolve
    sym → Ensembl xref (`:149-151`); localization rows resolve
    uniprot → sym (`:213-215`); zero votes and 'Uncertain' reliability
    are dropped (`:228-232`). compartment_go maps compartment column →
    (go_term, go_id) like the reference's COMPARTMENTS dict."""
    rna = spark.read.csv(rna_path, header=True)
    cl_cols = [c for c in rna.columns[2:]]
    long = (
        rna.select(
            F.col(rna.columns[0]).alias("ensg"),
            F.col(rna.columns[1]).alias("sym"),
            *[F.col(c).cast("double").alias(c) for c in cl_cols],
        )
        .unpivot(ids=["ensg", "sym"], values=cl_cols,
                 variableColumnName="cl", valueColumnName="tpm")
        .withColumn("cl", F.regexp_replace("cl", r" \(TPM\)$", ""))
    )
    pct = (
        long.filter(F.col("tpm") > 0)
        .groupBy("cl")
        .agg(
            F.percentile("tpm", F.lit(0.33)).alias("p33"),
            F.percentile("tpm", F.lit(0.66)).alias("p66"),
        )
    )
    lookup = protein.select(
        "id", F.col("sym").alias("_sym"),
        F.lit(None).cast("string").alias("_ensg"),
    ).unionByName(
        # protein-attached Ensembl xrefs only — target-attached rows
        # carry a NULL protein_id and must not resolve to one
        xref.filter(
            (F.col("xtype") == "Ensembl") & F.col("protein_id").isNotNull()
        ).select(
            F.col("protein_id").alias("id"),
            F.lit(None).cast("string").alias("_sym"),
            F.col("value").alias("_ensg"),
        )
    )
    res = resolve(long, lookup, [("sym", "_sym"), ("ensg", "_ensg")],
                  id_col="id", out_col="protein_id")
    qual = (
        F.when(F.col("tpm") == 0, "Not detected")
        .when(F.col("tpm") <= F.col("p33"), "Low")
        .when(F.col("tpm") <= F.col("p66"), "Medium")
        .otherwise("High")
    )
    expression = (
        res.resolved.join(F.broadcast(pct), "cl")
        .select(
            "protein_id", F.lit(HCA_ETYPE).alias("etype"),
            F.concat(F.lit("Cell Line "), "cl").alias("tissue"),
            qual.alias("qual_value"),
            F.col("tpm").alias("number_value"),
        )
    )

    loc = spark.read.csv(loc_path, header=True)
    comp_cols = loc.columns[3:-5]
    rel_col = loc.columns[-5]
    loc_long = (
        loc.select(
            F.col(loc.columns[1]).alias("sym"),
            F.col(loc.columns[2]).alias("uniprot"),
            F.col(rel_col).alias("reliability"),
            *[F.col(c).cast("int").alias(c) for c in comp_cols],
        )
        .unpivot(ids=["sym", "uniprot", "reliability"], values=comp_cols,
                 variableColumnName="compartment", valueColumnName="vote")
        .filter((F.col("vote") != 0) & (F.col("reliability") != "Uncertain"))
    )
    res_l = resolve(
        loc_long,
        protein.select("id", F.col("uniprot").alias("_up"),
                       F.col("sym").alias("_psym")),
        [("uniprot", "_up"), ("sym", "_psym")],
        id_col="id", out_col="protein_id",
    )
    go = compartment_go or {}
    if go:
        term_map = F.create_map(
            *[F.lit(v) for c, (term, _) in go.items() for v in (c, term)]
        )
        gid_map = F.create_map(
            *[F.lit(v) for c, (_, gid) in go.items() for v in (c, gid)]
        )
        go_id = gid_map[F.col("compartment")]
        go_term = term_map[F.col("compartment")]
    else:
        go_id = F.lit(None).cast("string")
        go_term = F.col("compartment")
    compartment = res_l.resolved.select(
        "protein_id", F.lit(HCA_CTYPE).alias("ctype"),
        go_id.alias("go_id"), go_term.alias("go_term"), "reliability",
    )
    notfnd = res.unresolved.select("sym", "ensg").unionByName(
        res_l.unresolved.select(
            "sym", F.col("uniprot").alias("ensg")
        )
    ).distinct()
    return HcaLoad(expression=expression, compartment=compartment,
                   notfnd=notfnd)


# ---------------------------------------------------------------- eRAM


@dataclass
class EramLoad:
    disease: DataFrame
    notfnd: DataFrame
    skipped: int             # diseases with no curated genes


def load_eram(
    spark: SparkSession, jsonl_path: str, protein: DataFrame
) -> EramLoad:
    """eRAM scrape records (ingest-shim JSONL: one per disease with
    `name, doids[], currated_genes[{sym, geneid, sources}]` — the
    reference's shelve `:95-125`) → dtype='eRAM' disease rows:
    genes × doids fan-out, sym→geneid resolution, per-gene sources
    kept."""
    raw = spark.read.json(
        jsonl_path,
        schema=("name string, doids array<string>, "
                "currated_genes array<struct<sym:string, geneid:int, "
                "sources:string>>"),
    )
    skipped = raw.filter(
        F.col("currated_genes").isNull() | (F.size("currated_genes") == 0)
    ).count()
    genes = (
        raw.filter(F.size("currated_genes") > 0)
        .select("name", "doids", F.explode("currated_genes").alias("g"))
        .select("name", "doids", F.col("g.sym").alias("sym"),
                F.col("g.geneid").alias("geneid"),
                F.col("g.sources").alias("source"))
    )
    res = resolve(
        genes,
        protein.select("id", F.col("sym").alias("_sym"),
                       F.col("geneid").alias("_geneid")),
        [("sym", "_sym"), ("geneid", "_geneid")],
        id_col="id", out_col="protein_id",
    )
    disease = res.resolved.select(
        "protein_id", F.lit("eRAM").alias("dtype"), "name",
        F.explode("doids").alias("did"), "source",
    )
    return EramLoad(disease=disease, notfnd=res.unresolved, skipped=skipped)


# ------------------------------------------------------------- TechDev


@dataclass
class TechdevLoad:
    techdev_contact: DataFrame
    techdev_info: DataFrame
    notfnd: DataFrame
    skipped: int             # unflagged or comment-less rows


def load_techdev_info(
    spark: SparkSession,
    contact_json_path: str,
    worklist_path: str,
    protein: DataFrame,
) -> TechdevLoad:
    """TechDev worklist → techdev_contact + techdev_info
    (`loaders/load-TechDevInfo.py:110-165`). The spreadsheet preamble
    (TechDev ID / grant / submitter rows) arrives as one JSON record;
    worklist rows load only when flagged in col 6 AND commented in
    col 7 (`:138-151`), resolving by symbol."""
    contact = spark.read.json(
        contact_json_path,
        schema=("id int, contact_name string, contact_email string, "
                "grant_number string, pi string, date string"),
    )
    raw = spark.read.csv(
        worklist_path, header=True,
        schema=("c0 string, sym string, c2 string, c3 string, c4 string, "
                "c5 string, flag int, comment string, pcmid string, "
                "pmid int, data_url string, resource_url string"),
    )
    skipped = raw.filter(
        F.col("flag").isNull() | (F.col("flag") == 0)
        | F.col("comment").isNull() | (F.col("comment") == "")
    ).count()
    kept = raw.filter(
        (F.col("flag") == 1)
        & F.col("comment").isNotNull() & (F.col("comment") != "")
    )
    res = resolve(kept, protein.select("id", F.col("sym").alias("_sym")),
                  [("sym", "_sym")], id_col="id", out_col="protein_id")
    cid = contact.select("id").first()
    info = res.resolved.select(
        F.lit(cid.id if cid else None).alias("contact_id"),
        "protein_id", "comment",
        F.when(F.col("pcmid") != "", F.col("pcmid")).alias("publication_pcmid"),
        F.col("pmid").alias("publication_pmid"),
        F.when(F.col("resource_url") != "", F.col("resource_url"))
        .alias("resource_url"),
        F.when(F.col("data_url") != "", F.col("data_url")).alias("data_url"),
    )
    return TechdevLoad(techdev_contact=contact, techdev_info=info,
                       notfnd=res.unresolved, skipped=skipped)
