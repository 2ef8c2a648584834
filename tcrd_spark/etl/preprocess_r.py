"""Spark compositions of the reference's standalone R preprocess
scripts (`R/hpm_gene.R`, `R/hpm_protein.R`, `R/hpm_level.R`,
`R/process-HPA.R`, `R/process-RGD.R`, `R/processCTD.R`) and the
`loaders/load-Phenotypes.py` orchestrator.

Every step here is a thin composition of operators that already exist
(unpivot, quantile stats, ordered dedup windows, explode-split
separate_rows, broadcast resolve joins, tau) — the value is spelling
out the reference pipelines end-to-end so a user can run them, with
golden-count tests mirroring each script's row accounting.

Determinism deviations (documented per function): where the R code
relies on data.table's stable file order for `unique(by=...)` /
`head(.SD[order(...)], 1)`, we add an explicit final tie-break column
so results are reproducible under any partitioning.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


# --------------------------------------------------------- HPM matrices

def melt_matrix(
    df: DataFrame, key_col: str, var_name: str = "tissue",
    value_name: str = "expression",
) -> DataFrame:
    """tidyr::gather over every non-key column (`R/hpm_gene.R:10`,
    `R/hpm_protein.R:11`) — Spark's native unpivot (no shuffle; the
    melt is a row-local generate)."""
    vals = [c for c in df.columns if c != key_col]
    return df.unpivot(
        ids=[key_col], values=vals,
        variableColumnName=var_name, valueColumnName=value_name,
    )


def hpm_quartile_levels(
    long: DataFrame, key: str, tissue: str = "tissue",
    value: str = "expression",
) -> DataFrame:
    """`R/hpm_level.R:1-31` level(): per key, quartiles of
    log10(positive expressions); Low = [q0, q25), Medium = [q25, q75],
    High = (q75, ∞); non-positive rows are 'Not detected'. The R
    all-equal guard (every quantile identical → shift down 1e-4, which
    routes every positive row to High) is reproduced exactly."""
    lg = long.withColumn(
        "_lx", F.when(F.col(value) > 0, F.log10(value))
    )
    stats = (
        lg.filter(F.col("_lx").isNotNull())
        .groupBy(key)
        .agg(
            F.percentile("_lx", F.lit(0.0)).alias("_q0"),
            F.percentile("_lx", F.lit(0.25)).alias("_q25"),
            F.percentile("_lx", F.lit(0.75)).alias("_q75"),
            F.percentile("_lx", F.lit(1.0)).alias("_q100"),
        )
        .withColumn("_allq", F.col("_q0") == F.col("_q100"))
        .select(
            key,
            *[
                F.when(F.col("_allq"), F.col(c) - 0.0001)
                .otherwise(F.col(c))
                .alias(c)
                for c in ("_q0", "_q25", "_q75")
            ],
        )
    )
    return (
        lg.join(stats, key, "left")
        .select(
            key,
            tissue,
            F.col(value),
            F.when(F.col("_lx").isNull(), "Not detected")
            .when(
                (F.col("_lx") >= F.col("_q0")) & (F.col("_lx") < F.col("_q25")),
                "Low",
            )
            .when(
                (F.col("_lx") >= F.col("_q25")) & (F.col("_lx") <= F.col("_q75")),
                "Medium",
            )
            .when(F.col("_lx") > F.col("_q75"), "High")
            .otherwise("Not detected")
            .alias("level"),
        )
    )


@dataclass
class HpmMatrixResult:
    tau: DataFrame     # (key, n_tissues, tau)
    levels: DataFrame  # (key, tissue, expression, level)


def hpm_matrix_pipeline(matrix: DataFrame, key: str) -> HpmMatrixResult:
    """`R/hpm_gene.R` / `R/hpm_protein.R` end-to-end: gather the
    expression matrix, per-key tau (value-quantile bins — the
    `R/hpm_tau.R` decile rule via analytics.tau.tau_continuous_cut2,
    same deviation note as etl/loaders_expr.load_hpm), drop NA taus
    (`hpm_gene.R:12`), and the quartile qualitative levels with empty
    keys dropped (`hpm_gene.R:15`)."""
    from tcrd_spark.analytics.tau import tau_continuous_cut2

    long = melt_matrix(matrix, key)
    tau = tau_continuous_cut2(long, key, "tissue", "expression").filter(
        F.col("tau").isNotNull()
    )
    levels = hpm_quartile_levels(
        long.filter(F.col(key) != ""), key
    )
    return HpmMatrixResult(tau=tau, levels=levels)


# ----------------------------------------------------------- HPA normal

HPA_RELIABILITY_ORD = {"Enhanced": 1, "Supported": 2, "Approved": 3}
HPA_LEVEL_ORD = {"Not detected": 0, "Low": 1, "Medium": 2, "High": 3}


def _ord_col(col: str, mapping: dict[str, int]) -> F.Column:
    c = F.lit(None).cast("int")
    expr = c
    for k, v in mapping.items():
        expr = F.when(F.col(col) == k, v).otherwise(expr)
    return expr


@dataclass
class HpaResult:
    rows: DataFrame  # deduped (gene, protein_id, tissue, level,
                     #          reliability, tau)
    # per-gene tau is joined onto every row, as process-HPA.R merges


def hpa_normal_tissue(
    hpa: DataFrame, ensg_xref: DataFrame
) -> DataFrame:
    """`R/process-HPA.R:37-51`: resolve Gene through the ENSG xref,
    strip trailing ' <digits>' from Tissue and suffix the cell type
    (`:39-40`), drop Uncertain reliability (`:42`), keep ONE row per
    (protein_id, tissue) by highest ordered Reliability then Level
    (`:44-46` — R's ordered factors rank Approved and High highest),
    then per-gene ordinal tau over the kept rows' level medians
    (hpa_tau, `:13-24` = analytics.tau.tau_ordinal) merged back on.

    hpa: (gene, tissue, cell_type, level, reliability);
    ensg_xref: (ensg, protein_id). Deviation: the R head-1 relies on
    data.table order stability; we break remaining ties on level then
    tissue text for reproducibility."""
    from tcrd_spark.analytics.tau import tau_ordinal

    resolved = hpa.join(
        F.broadcast(ensg_xref.withColumnRenamed("ensg", "gene")), "gene"
    )
    shaped = (
        resolved.withColumn(
            "tissue", F.regexp_replace("tissue", r"\s\d+$", "")
        )
        .withColumn(
            "tissue", F.concat_ws(" - ", "tissue", "cell_type")
        )
        .drop("cell_type")
        .filter(F.col("reliability") != "Uncertain")
        .withColumn("_rel", _ord_col("reliability", HPA_RELIABILITY_ORD))
        .withColumn("_lvl", _ord_col("level", HPA_LEVEL_ORD))
    )
    w = Window.partitionBy("protein_id", "tissue").orderBy(
        F.desc("_rel"), F.desc("_lvl"), F.asc("level"), F.asc("reliability")
    )
    best = (
        shaped.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    tau = tau_ordinal(best, "gene", "tissue", "_lvl").select(
        "gene", F.col("tau").alias("tau")
    )
    return best.drop("_rel", "_lvl").join(tau, "gene")


HPA_RNA_TISSUES = (
    "adipose tissue", "adrenal gland", "appendix", "bone marrow",
    "cerebral cortex", "colon", "duodenum", "endometrium", "esophagus",
    "fallopian tube", "gallbladder", "heart muscle", "kidney", "liver",
    "lung", "lymph node", "ovary", "pancreas", "placenta", "prostate",
    "rectum", "salivary gland", "skeletal muscle", "skin",
    "small intestine", "smooth muscle", "spleen", "stomach", "testis",
    "thyroid gland", "tonsil", "urinary bladder",
)


def hpa_tau_protein(data: DataFrame) -> DataFrame:
    """`R/hpa_tau_prot.R:1-22`: Supportive-reliability rows only,
    numbered tissue variants collapsed (the script's enumerated
    'endometrium 1/2' → 'endometrium' renames ARE the trailing-digit
    strip), cell type suffixed, per-gene ordinal tau over the
    qualitative levels (hpa_tau.R = analytics.tau.tau_ordinal), NA
    taus dropped. data: (gene, tissue, cell_type, level,
    reliability)."""
    from tcrd_spark.analytics.tau import tau_ordinal

    shaped = (
        data.filter(F.col("reliability") == "Supportive")
        .withColumn("tissue", F.regexp_replace("tissue", r"\s\d+$", ""))
        .withColumn("tissue", F.concat_ws(" - ", "tissue", "cell_type"))
        .withColumn("_lvl", _ord_col("level", HPA_LEVEL_ORD))
    )
    return tau_ordinal(shaped, "gene", "tissue", "_lvl").filter(
        F.col("tau").isNotNull()
    )


def hpa_tau_rna(
    data: DataFrame, tissues: tuple[str, ...] = HPA_RNA_TISSUES
) -> DataFrame:
    """`R/hpa_tau_rna.R:1-16`: keep whitelisted sample tissues, rename
    (Sample → tissue, Abundance → level), per-gene ordinal tau, NA
    dropped. data: (gene, sample, abundance) with ordinal abundance."""
    from tcrd_spark.analytics.tau import tau_ordinal

    shaped = data.filter(F.col("sample").isin(*tissues)).select(
        "gene",
        F.col("sample").alias("tissue"),
        _ord_col("abundance", HPA_LEVEL_ORD).alias("_lvl"),
    )
    return tau_ordinal(shaped, "gene", "tissue", "_lvl").filter(
        F.col("tau").isNotNull()
    )


# ------------------------------------------------------------------ CTD

def ctd_direct_evidence(
    ctd: DataFrame, mesh_doid: DataFrame, omim_doid: DataFrame
) -> DataFrame:
    """`R/processCTD.R:6-23`: keep rows with DirectEvidence (`:7`),
    split DiseaseID on the first ':' into source + id (`:13`), map
    MESH and OMIM ids to DOIDs through their xref maps (left joins,
    `:19-20`), union, and blank PubMedIDs → NULL (`:23`).

    ctd: (gene_symbol, gene_id, disease_name, disease_id,
    direct_evidence, pubmed_ids); maps: (xref, doid). Deviation: the
    R `unique(by='XREF')` keeps file order — we keep min(doid) per
    xref for engine-independent determinism."""
    kept = ctd.filter(
        F.col("direct_evidence").isNotNull()
        & (F.length("direct_evidence") > 0)
    ).select(
        "gene_symbol",
        "gene_id",
        "disease_name",
        # unlimited split, fields 0 and 1 ONLY: R's tstrsplit assigns
        # field-wise and DISCARDS anything after a second ':' — a
        # limit-2 split would keep it glued to the id ('OMIM:1:x' →
        # '1:x' instead of '1') and break the xref join (ADVICE r5 #4)
        F.split("disease_id", ":").getItem(0).alias("disease_id_source"),
        F.split("disease_id", ":").getItem(1).alias("disease_id"),
        "direct_evidence",
        F.when(F.length("pubmed_ids") > 0, F.col("pubmed_ids")).alias(
            "pubmed_ids"
        ),
    )

    def _uniq(m: DataFrame) -> DataFrame:
        return m.groupBy("xref").agg(F.min("doid").alias("doid"))

    mesh = kept.filter(F.col("disease_id_source") == "MESH").join(
        F.broadcast(_uniq(mesh_doid).withColumnRenamed("xref", "disease_id")),
        "disease_id",
        "left",
    )
    omim = kept.filter(F.col("disease_id_source") == "OMIM").join(
        F.broadcast(_uniq(omim_doid).withColumnRenamed("xref", "disease_id")),
        "disease_id",
        "left",
    )
    # the R rbindlist(dt.mesh, dt.omim) silently DROPS any other
    # DiseaseID source; mirrored here
    return mesh.unionByName(omim)


# ------------------------------------------------------------------ RGD

def rgd_rat_genes(genes: DataFrame) -> DataFrame:
    """`R/process-RGD.R:16-19`: keep UNIPROT_ID rows, project
    (gene_rgd_id, uniprot_id), separate_rows on ';'."""
    return (
        genes.filter(F.col("uniprot_id").isNotNull())
        .select(
            "gene_rgd_id",
            F.explode(F.split("uniprot_id", ";")).alias("uniprot_id"),
        )
    )


def rgd_rat_qtls(
    genes: DataFrame, qtls: DataFrame, nhprotein: DataFrame
) -> DataFrame:
    """`R/process-RGD.R:21-52`: explode candidate gene ids/symbols in
    LOCKSTEP (separate_rows on two columns, `:23` — arrays_zip keeps
    them paired), explode phenotypes (`:24`), keep candidates present
    in the uniprot-bearing gene set (`:26`), resolve rat (taxid 10116)
    nhproteins through the uniprot map (`:35-40`), and join QTLs on
    the candidate gene (`:42`)."""
    exploded = (
        qtls.filter(F.col("candidate_gene_rgd_ids").isNotNull())
        .withColumn(
            "_z",
            F.explode(
                F.arrays_zip(
                    F.split("candidate_gene_rgd_ids", ";").alias("gid"),
                    F.split("candidate_gene_symbols", ";").alias("gsym"),
                )
            ),
        )
        .withColumn("gene_rgd_id", F.col("_z.gid").cast("long"))
        .withColumn("candidate_gene_symbol", F.col("_z.gsym"))
        .drop("_z", "candidate_gene_rgd_ids", "candidate_gene_symbols")
        .withColumn("phenotype", F.explode(F.split("phenotypes", ";")))
        .drop("phenotypes")
    )
    rg = rgd_rat_genes(genes)
    filtered = exploded.join(
        rg.select("gene_rgd_id").distinct(), "gene_rgd_id", "left_semi"
    )
    rat_prot = nhprotein.filter(F.col("taxid") == 10116).select(
        F.col("id").alias("nhprotein_id"), F.col("uniprot").alias("uniprot_id")
    )
    nhprot2rgd = rg.join(F.broadcast(rat_prot), "uniprot_id").drop(
        "uniprot_id"
    )
    return nhprot2rgd.join(filtered, "gene_rgd_id")


def rgd_rat_terms(
    terms: DataFrame, ontology: str, genes: DataFrame
) -> DataFrame:
    """`R/process-RGD.R:56-75` (one of the do/mp/rdo blocks): keep
    gene objects, project the six term columns, stamp the ontology
    name, keep genes in the uniprot-bearing set, and dedup by
    (rgd_id, term_acc_id). Deviation: dedup keeps the min remaining
    tuple instead of file order."""
    kept = (
        terms.filter(F.col("object_type") == "gene")
        .select(
            "rgd_id", "object_symbol", "term_acc_id", "term_name",
            "qualifier", "evidence",
        )
        .withColumn("ontology", F.lit(ontology))
        .join(
            rgd_rat_genes(genes)
            .select(F.col("gene_rgd_id").alias("rgd_id"))
            .distinct(),
            "rgd_id",
            "left_semi",
        )
    )
    w = Window.partitionBy("rgd_id", "term_acc_id").orderBy(
        "object_symbol", "term_name", "qualifier", "evidence"
    )
    return (
        kept.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


# ------------------------------------------- load-Phenotypes orchestrator

def load_rgd_rows(
    rat_qtls: DataFrame, rat_terms: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """`loaders/load-Phenotypes.py:719-820` load_RGD: map the
    processed R outputs onto the rat_qtl / rat_term schemas ('None'
    strings → NULL, numeric casts null-safe like the reference's
    conditional init keys)."""
    def _nn(c: str) -> F.Column:
        return F.when(
            F.col(c).isNotNull() & (F.col(c) != "None"), F.col(c)
        )

    qtl_rows = rat_qtls.select(
        F.col("nhprotein_id").cast("long"),
        F.col("gene_rgd_id").cast("long").alias("rgdid"),
        F.col("qtl_rgd_id").cast("long").alias("qtl_rgdid"),
        _nn("qtl_symbol").alias("qtl_symbol"),
        _nn("qtl_name").alias("qtl_name"),
        _nn("trait_name").alias("trait_name"),
        _nn("measurement_type").alias("measurement_type"),
        _nn("associated_diseases").alias("associated_disease"),
        _nn("phenotype").alias("phenotype"),
        _nn("p_value").cast("decimal(20,19)").alias("p_value"),
        _nn("lod").cast("double").alias("lod"),
    )
    term_rows = rat_terms.select(
        F.col("rgd_id").cast("long").alias("rgdid"),
        F.col("term_acc_id").alias("term_id"),
        F.col("object_symbol").alias("obj_symbol"),
        "term_name", "qualifier", "evidence", "ontology",
    )
    return qtl_rows, term_rows


@dataclass
class PhenotypesRun:
    omim: object            # etl.loaders.OmimLoad
    gwas: DataFrame
    gwas_notfnd: DataFrame
    impc: DataFrame
    impc_notfnd: DataFrame
    jax: object             # etl.loaders_ids.JaxPhenotypeLoad
    rat_qtl: DataFrame
    rat_term: DataFrame


def run_phenotypes(
    spark,
    omim_inputs: tuple[DataFrame, DataFrame, DataFrame],
    gwas_rows: DataFrame,
    impc_rows: DataFrame,
    jax_tsv_path: str,
    mpo: DataFrame,
    rgd_inputs: tuple[DataFrame, DataFrame, list[tuple[DataFrame, str]]],
    protein: DataFrame,
    nhprotein: DataFrame,
) -> PhenotypesRun:
    """The `loaders/load-Phenotypes.py` orchestrator (`:92` OMIM,
    `:268` GWAS, `:375` IMPC, `:653` JAX, `:719` RGD) as one
    composition of the existing loader families — each sub-load is
    the already-tested operator; this spells out the combined run the
    reference script performs with five sequential main() phases."""
    from tcrd_spark.etl.loaders import (
        load_gwas_catalog,
        load_impc_phenotypes,
        load_omim,
    )
    from tcrd_spark.etl.loaders_ids import load_jax_phenotypes

    titles, ps, genemap = omim_inputs
    omim = load_omim(titles, ps, genemap, protein)
    gwas, gwas_notfnd = load_gwas_catalog(gwas_rows, protein)
    impc, impc_notfnd = load_impc_phenotypes(impc_rows, nhprotein)
    jax = load_jax_phenotypes(spark, jax_tsv_path, protein, mpo)
    genes, qtls, term_files = rgd_inputs
    rat_qtls = rgd_rat_qtls(genes, qtls, nhprotein)
    terms = None
    for tdf, onto in term_files:
        t = rgd_rat_terms(tdf, onto, genes)
        terms = t if terms is None else terms.unionByName(t)
    qtl_rows, term_rows = load_rgd_rows(rat_qtls, terms)
    return PhenotypesRun(
        omim=omim, gwas=gwas, gwas_notfnd=gwas_notfnd, impc=impc,
        impc_notfnd=impc_notfnd, jax=jax, rat_qtl=qtl_rows,
        rat_term=term_rows,
    )
