"""Disease / pathway / variant loader families (SURVEY.md §7 step 6,
eighth batch) — the last uncovered sub-loaders of the reference's
disease+pathway fleet.

- ClinVar (`loaders/load-ClinVar.py:75-260`): the two-phase
  variant_summary.txt load — distinct phenotype dictionary (+ xrefs,
  'Human Phenotype Ontology:HP:'→'HPO:' rewrite) then review-status-
  gated association rows resolved sym→geneid.
- WikiPathways (`loaders/load-WikiPathways.py:85-140`): GMT-ish rows
  'name%db%wpid%species<TAB>url<TAB>geneid...' exploded per geneid.
- Pathway Commons (`loaders/load-PathwayCommons.py:96-160`): url +
  'name: X; datasource: Y' metadata + uniprot list; kegg/wikipathways/
  reactome datasources skipped (loaded by their own loaders).
- TIGA (`loaders/load-TIGA.py:95-190`): GWAS gene-trait aggregate
  rows (sym → Ensembl-xref resolution) + provenance file.
- Monarch diseases (`loaders/load-MonarchDiseases.py:95-140`,
  also `load-Diseases.py:438-470` load_Monarch): direct gene-disease
  rows with O2S/S2O scores, uniprot→sym resolution.
- Expression Atlas diseases
  (`loaders/load-ExpressionAtlas-Diseases.py:85-135`, also
  `load-Diseases.py:345-400`): log2foldchange-carrying disease rows,
  sym → ENSG-xref resolution.

With these, every sub-source of the composite `load-Diseases.py`
(DISEASES/DisGeNET/ExpressionAtlas/Monarch/CTD/eRAM) has a loader.

Scale posture: every lookup side (protein ~20k rows, xref slices,
the ClinVar phenotype dictionary) broadcasts; the fact stream —
variant_summary is ~2M lines at reference scale, Pathway Commons
explodes to ~1M (pathway, uniprot) pairs — is never collected and
never the build side of a join. No windows, no driver loops.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tcrd_spark.etl.resolve import resolve
from tcrd_spark.schema.tables import surrogate_id

# ------------------------------------------------------------ ClinVar

# `loaders/load-ClinVar.py:196-197` — only these two review statuses
# produce association rows.
CLINVAR_WANT_STATUS = (
    "reviewed by expert panel",
    "criteria provided, multiple submitters, no conflicts",
)


@dataclass
class ClinvarLoad:
    phenotype: DataFrame       # clinvar_phenotype rows
    phenotype_xref: DataFrame  # clinvar_phenotype_xref rows
    clinvar: DataFrame         # association rows
    notfnd: DataFrame          # sym|geneid misses
    mismatch_ct: int           # PhenotypeIDS vs PhenotypeList skips


def load_clinvar(
    spark: SparkSession, tsv_path: str, protein: DataFrame
) -> ClinvarLoad:
    """NCBI variant_summary.txt → clinvar_phenotype(+xref) + clinvar
    association rows (`loaders/load-ClinVar.py:75-260`).

    Phase 1 (`:86-140`): PhenotypeList/PhenotypeIDS are parallel
    ';'-separated lists (rows where the lengths disagree are skipped
    and counted, `:128-131`); each IDS element is a ','-separated
    xref list. Phase 2 (`:183-250`): rows gated on review status,
    targets resolved sym→geneid, one clinvar row per (protein,
    phenotype).
    """
    raw = spark.read.csv(tsv_path, sep="\t", header=True)
    cols = raw.columns
    # header names as in the file: '#AlleleID', 'RS# (dbSNP)', ...
    alleleid = cols[0]
    raw = raw.withColumn("_pts", F.split(F.col("PhenotypeList"), ";")) \
             .withColumn("_ids", F.split(F.col("PhenotypeIDS"), ";"))
    ok = raw.filter(F.size("_pts") == F.size("_ids")).cache()
    mismatch_ct = raw.filter(F.size("_pts") != F.size("_ids")).count()

    # ---- phase 1: phenotype dictionary + xrefs
    pairs = ok.select(
        F.explode(F.arrays_zip("_pts", "_ids")).alias("z")
    ).select(
        F.col("z._pts").alias("pt_name"), F.col("z._ids").alias("ids")
    )
    phenotype = (
        pairs.select("pt_name").distinct()
        .select(
            surrogate_id(F.col("pt_name")).alias("id"),
            F.col("pt_name").alias("name"),
        )
    )
    xr = (
        pairs.select(
            "pt_name", F.explode(F.split("ids", ",")).alias("xr")
        )
        .withColumn(
            "xr",
            F.regexp_replace("xr", "^Human Phenotype Ontology:HP:", "HPO:"),
        )
        .filter(F.col("xr").contains(":"))
        .select(
            "pt_name",
            F.substring_index("xr", ":", 1).alias("source"),
            # everything after the first ':' (`:161` [src,val] split)
            F.expr("substring(xr, instr(xr, ':') + 1)").alias("value"),
        )
        .distinct()
    )
    phenotype_xref = xr.select(
        surrogate_id(F.concat_ws("|", "pt_name", "source", "value")).alias("id"),
        surrogate_id(F.col("pt_name")).alias("clinvar_phenotype_id"),
        "source", "value",
    )

    # ---- phase 2: association rows
    gated = ok.filter(F.col("ReviewStatus").isin(*CLINVAR_WANT_STATUS))
    res = resolve(
        gated,
        protein.select("id", "sym", F.col("geneid").cast("string").alias("geneid")),
        [("GeneSymbol", "sym"), ("GeneID", "geneid")],
        id_col="id",
        out_col="protein_id",
    )
    assoc = (
        res.resolved
        .select(
            "protein_id",
            F.col(alleleid).cast("long").alias("alleleid"),
            F.col("Type").alias("type"),
            F.col("Name").alias("name"),
            F.col("ReviewStatus").alias("review_status"),
            F.col("ClinicalSignificance").alias("clinical_significance"),
            F.col("ClinSigSimple").cast("int").alias("clin_sig_simple"),
            # LastEvaluated is 'Mon dd, yyyy' ('-' rows → null; the
            # reference's parse_date would raise there, `:245`)
            F.coalesce(
                F.try_to_timestamp(
                    F.col("LastEvaluated"), F.lit("MMM d, yyyy")
                ).cast("date"),
                F.try_to_timestamp(
                    F.col("LastEvaluated"), F.lit("yyyy-MM-dd")
                ).cast("date"),
            ).alias("last_evaluated"),
            F.col("`RS# (dbSNP)`").cast("long").alias("dbsnp_rs"),
            F.col("`nsv/esv (dbVar)`").alias("dbvarid"),
            F.col("Origin").alias("origin"),
            F.col("OriginSimple").alias("origin_simple"),
            F.col("Assembly").alias("assembly"),
            F.col("Chromosome").alias("chr"),
            F.col("ChromosomeAccession").alias("chr_acc"),
            F.col("Start").cast("long").alias("start"),
            F.col("Stop").cast("long").alias("stop"),
            F.col("NumberSubmitters").cast("int").alias("number_submitters"),
            (F.col("TestedInGTR") == "Y").alias("tested_in_gtr"),
            F.col("SubmitterCategories").cast("int")
             .alias("submitter_categories"),
            F.explode("_pts").alias("pt_name"),
        )
        # only phenotypes that made the dictionary (`:251-252` the
        # ptname2id gate)
        .join(F.broadcast(phenotype.withColumnRenamed("name", "pt_name")),
              "pt_name")
        .withColumnRenamed("id", "clinvar_phenotype_id")
        .drop("pt_name")
    )
    clinvar = assoc.select(
        surrogate_id(
            F.concat_ws("|", "protein_id", "clinvar_phenotype_id", "alleleid")
        ).alias("id"),
        *[c for c in assoc.columns],
    )
    notfnd = res.unresolved.select("GeneSymbol", "GeneID").distinct()
    return ClinvarLoad(
        phenotype=phenotype, phenotype_xref=phenotype_xref,
        clinvar=clinvar, notfnd=notfnd, mismatch_ct=mismatch_ct,
    )


# ----------------------------------------------------------- pathways


@dataclass
class PathwayLoad:
    pathway: DataFrame
    notfnd: DataFrame
    skipped: int = 0


def load_wikipathways(
    spark: SparkSession, tsv_path: str, protein: DataFrame
) -> PathwayLoad:
    """WikiPathways GMT ('name%db%wpid%species', url, geneid...) →
    pwtype='WikiPathways' pathway rows, geneid-resolved
    (`loaders/load-WikiPathways.py:90-128`)."""
    lines = spark.read.text(tsv_path).withColumn(
        "f", F.split(F.col("value"), "\t")
    )
    rows = lines.select(
        F.substring_index(F.element_at("f", 1), "%", 1).alias("name"),
        F.element_at("f", 2).alias("url"),
        F.element_at(F.split(F.element_at("f", 2), "/"), -1)
         .alias("id_in_source"),
        F.explode(F.slice("f", 3, F.size("f") - 2)).alias("geneid"),
    ).filter(F.col("geneid") != "")
    res = resolve(
        rows,
        protein.select("id", F.col("geneid").cast("string").alias("gid")),
        [("geneid", "gid")],
        id_col="id",
        out_col="protein_id",
    )
    pathway = res.resolved.select(
        surrogate_id(F.concat_ws("|", "protein_id", "id_in_source"))
            .alias("id"),
        "protein_id",
        F.lit("WikiPathways").alias("pwtype"),
        "name", "id_in_source", "url",
    )
    return PathwayLoad(
        pathway=pathway, notfnd=res.unresolved.select("geneid").distinct()
    )


# `loaders/load-PathwayCommons.py:38` — the app URL the reference
# rewrites file URIs into.
PCAPP_BASE_URL = "http://apps.pathwaycommons.org/pathways?uri="
# `:113-115` — sources with dedicated loaders are skipped here.
PC_SKIP_SOURCES = ("kegg", "wikipathways", "reactome")


def load_pathway_commons(
    spark: SparkSession, tsv_path: str, protein: DataFrame
) -> PathwayLoad:
    """Pathway Commons GMT (uri, 'name: N; datasource: D; ...',
    uniprot...) → pwtype='PathwayCommons: <src>' rows
    (`loaders/load-PathwayCommons.py:96-160`)."""
    lines = spark.read.text(tsv_path).withColumn(
        "f", F.split(F.col("value"), "\t")
    )
    rows = lines.select(
        F.element_at("f", 1).alias("uri"),
        F.regexp_extract(F.element_at("f", 2), r"datasource: (\w+)", 1)
         .alias("src"),
        F.regexp_extract(F.element_at("f", 2), r"name: (.+?);", 1)
         .alias("name"),
        F.slice("f", 3, F.size("f") - 2).alias("ups"),
    )
    kept = rows.filter(~F.col("src").isin(*PC_SKIP_SOURCES))
    skipped = rows.filter(F.col("src").isin(*PC_SKIP_SOURCES)).count()
    exploded = kept.select(
        "uri", "src", "name", F.explode("ups").alias("uniprot")
    ).filter(F.col("uniprot") != "")
    res = resolve(
        exploded, protein.select("id", "uniprot"),
        [("uniprot", "uniprot")], id_col="id", out_col="protein_id",
    )
    pathway = res.resolved.select(
        surrogate_id(F.concat_ws("|", "protein_id", "uri")).alias("id"),
        "protein_id",
        F.concat(F.lit("PathwayCommons: "), F.col("src")).alias("pwtype"),
        "name",
        F.concat(F.lit(PCAPP_BASE_URL), F.url_encode("uri")).alias("url"),
    )
    return PathwayLoad(
        pathway=pathway,
        notfnd=res.unresolved.select("uniprot").distinct(),
        skipped=skipped,
    )


# --------------------------------------------------------------- TIGA


@dataclass
class TigaLoad:
    tiga: DataFrame
    provenance: DataFrame
    notfnd: DataFrame


def load_tiga(
    spark: SparkSession,
    tiga_path: str,
    prov_path: str,
    protein: DataFrame,
    xref: DataFrame,
) -> TigaLoad:
    """TIGA gene-trait stats TSV + provenance TSV → tiga /
    tiga_provenance rows (`loaders/load-TIGA.py:95-190`).

    Resolution is sym first, then Ensembl xref on the ENSG. The
    reference's code (`:125-133`) discards the xref lookup's result
    and marks the row notfnd unconditionally — an evident bug (its
    memo dict is also keyed inconsistently, `:134` k vs ensg); we
    implement the intended fallback chain.
    """
    raw = spark.read.csv(tiga_path, sep="\t", header=True)
    xr_ens = xref.filter(F.col("xtype") == "Ensembl").select(
        F.col("protein_id").alias("id"), F.col("value").alias("ensg_x")
    ).filter(F.col("id").isNotNull())
    lookup = protein.select("id", "sym").join(
        xr_ens, "id", "full"
    ).select("id", "sym", "ensg_x")
    res = resolve(
        raw, lookup,
        [("geneSymbol", "sym"), ("ensg", "ensg_x")],
        id_col="id", out_col="protein_id",
    )
    tiga = res.resolved.select(
        surrogate_id(F.concat_ws("|", "protein_id", "ensg", "efoId"))
            .alias("id"),
        "protein_id",
        "ensg",
        F.col("efoId").alias("efoid"),
        "trait",
        F.col("n_study").cast("int").alias("n_study"),
        F.col("n_snp").cast("int").alias("n_snp"),
        F.col("n_snpw").cast("double").alias("n_snpw"),
        F.col("geneNtrait").cast("int").alias("geneNtrait"),
        F.col("geneNstudy").cast("int").alias("geneNstudy"),
        F.col("traitNgene").cast("int").alias("traitNgene"),
        F.col("traitNstudy").cast("int").alias("traitNstudy"),
        F.col("pvalue_mlog_median").cast("double")
         .alias("pvalue_mlog_median"),
        # 'NA' → null (`:135-137`); try_cast nulls the sentinel
        F.col("or_median").try_cast("double").alias("or_median"),
        F.col("n_beta").cast("int").alias("n_beta"),
        F.col("study_N_mean").cast("double").alias("study_N_mean"),
        F.col("rcras").cast("double").alias("rcras"),
        F.col("meanRank").cast("double").alias("meanRank"),
        F.col("meanRankScore").cast("double").alias("meanRankScore"),
    )
    prov_raw = spark.read.csv(prov_path, sep="\t", header=True)
    provenance = prov_raw.select(
        surrogate_id(
            F.concat_ws("|", "ensemblId", "efoId", "STUDY_ACCESSION",
                        "PUBMEDID")
        ).alias("id"),
        F.col("ensemblId").alias("ensg"),
        F.col("efoId").alias("efoid"),
        F.col("STUDY_ACCESSION").alias("study_acc"),
        F.col("PUBMEDID").cast("long").alias("pubmedid"),
    )
    notfnd = res.unresolved.select("geneSymbol", "ensg").distinct()
    return TigaLoad(tiga=tiga, provenance=provenance, notfnd=notfnd)


# ----------------------------------------------------- disease batches


@dataclass
class DiseaseLoad:
    disease: DataFrame
    notfnd: DataFrame


def load_monarch_diseases(
    spark: SparkSession, csv_path: str, protein: DataFrame
) -> DiseaseLoad:
    """Monarch direct gene-disease CSV (sym, uniprot, name, did,
    evidence, description, O2S, S2O) → dtype='Monarch' rows
    (`loaders/load-MonarchDiseases.py:104-140`).

    Resolution is uniprot→sym. Empty-string scores → null; the
    reference's S2O branch assigns a lowercase `s2o` it then reads
    back even when unset (`:127-130`) — we null both consistently.
    """
    raw = spark.read.csv(
        csv_path, header=False,
        schema=("sym string, uniprot string, name string, did string, "
                "evidence string, description string, o2s string, "
                "s2o string"),
    )
    res = resolve(
        raw, protein.select("id", "uniprot", "sym"),
        [("uniprot", "uniprot"), ("sym", "sym")],
        id_col="id", out_col="protein_id",
    )
    disease = res.resolved.select(
        surrogate_id(
            F.concat_ws("|", "protein_id", F.lit("Monarch"), "did",
                        "evidence")
        ).alias("id"),
        F.lit("Monarch").alias("dtype"),
        "protein_id", "name", "did", "evidence", "description",
        F.nullif("o2s", F.lit("")).try_cast("double").alias("O2S"),
        F.nullif("s2o", F.lit("")).try_cast("double").alias("S2O"),
    )
    return DiseaseLoad(
        disease=disease,
        notfnd=res.unresolved.select("uniprot", "sym").distinct(),
    )


def load_expression_atlas_diseases(
    spark: SparkSession, tsv_path: str, protein: DataFrame, xref: DataFrame
) -> DiseaseLoad:
    """Expression Atlas gene-disease TSV ('Gene ID', DOID, 'Gene Name',
    log2foldchange, p-value, disease, experiment_id, contrast_id) →
    dtype='Expression Atlas' rows
    (`loaders/load-ExpressionAtlas-Diseases.py:92-135`).

    Resolution is sym → ENSG xref; log2foldchange is stored at 3
    decimals (`:127` the "%.3f" format).
    """
    raw = spark.read.csv(tsv_path, sep="\t", header=True)
    xr_ensg = xref.filter(F.col("xtype") == "ENSG").select(
        F.col("protein_id").alias("id"), F.col("value").alias("ensg_x")
    ).filter(F.col("id").isNotNull())
    lookup = protein.select("id", "sym").join(
        xr_ensg, "id", "full"
    ).select("id", "sym", "ensg_x")
    res = resolve(
        raw, lookup,
        [("Gene Name", "sym"), ("Gene ID", "ensg_x")],
        id_col="id", out_col="protein_id",
    )
    disease = res.resolved.select(
        surrogate_id(
            F.concat_ws("|", "protein_id", F.lit("Expression Atlas"),
                        "DOID", "experiment_id", "contrast_id")
        ).alias("id"),
        F.lit("Expression Atlas").alias("dtype"),
        "protein_id",
        F.col("disease").alias("name"),
        F.col("DOID").alias("did"),
        F.round(F.col("log2foldchange").cast("double"), 3)
            .alias("log2foldchange"),
        F.col("`p-value`").alias("pvalue"),
    )
    return DiseaseLoad(
        disease=disease,
        notfnd=res.unresolved.select("Gene Name", "Gene ID").distinct(),
    )
