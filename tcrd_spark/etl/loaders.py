"""Representative end-to-end loader pipelines (SURVEY.md §7 step 4).

The reference ships ~85 `loaders/load-*.py` scripts that all follow one
lifecycle: file scan → per-line memoized lookup join → per-row INSERT →
printed counts (SURVEY §3, generic loader lifecycle). These three
pipelines are that lifecycle Spark-first — file scan as `spark.read`,
the lookup dict as `etl.resolve` broadcast-join cascade, the INSERT
loop as one `DataFrame` per output table, the printed counts as the
`Resolution` report — and stand in for the whole family:

- STRINGDB PPIs (`loaders/load-STRINGDB.py:90-139`): prefix-filtered
  TSV scan + double entity resolution (11.6M rows, 1h44m in the
  reference build — `doc/README_v6.txt:1510-1513`).
- JensenLab PubMed scores (`loaders/load-JensenLabPubMedScores.py:
  63-131`): yearly score file → pmscore rows + per-protein running sum
  → tdl_info rows, with the InsZeroJLPMSs zero-fill fixup
  (`SQL/InsZeroJLPMSs_TCRDv7.sql:1-10`) folded in.
- GTEx (`R/gtex_process.R` + `loaders/load-GTEx.py:100-147`): GCT
  matrix unpivot → sample/subject joins → per-(gene,tissue,sex)
  medians → frank/.N qualitative levels + decile tau → expression
  rows keyed by resolved protein.
- ChEMBL cmpd activities (`loaders/load-ChEMBL.py`): family-dependent
  pchembl cutoffs, first-reference-year infos, and the selective-
  compound sweep as window functions.
- DrugCentral Tclin drug activities (`loaders/load-DrugCentral.py`).
- IMPC mouse phenotypes (`loaders/load-IMPC-Phenotypes.py`) and the
  GWAS catalog (`loaders/load-GWASCatalog.py`) with its multi-symbol
  explode.
- KEGG pathways (`loaders/load-KEGGPathways.py`) from the link +
  KGML-title tables.
- DO / Uberon ontologies (`loaders/load-Ontologies.py`,
  `load-Uberon-IDs.py`) wired from OBO stanzas into the lake's
  node/parent/xref tables.

Scale: each pipeline is shuffle-minimal — the fact stream shuffles only
for its own aggregations; every lookup side is a broadcast. No
per-row anything.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tcrd_spark.analytics.tau import qualitative_levels, tau_continuous
from tcrd_spark.etl.resolve import resolve, zero_fill

STRING_TAXON_PREFIX = "9606."


@dataclass
class StringDbLoad:
    ppi: DataFrame           # (ppitype, protein1_id, protein2_id, score)
    notfnd: DataFrame        # raw rows with ≥1 unresolvable endpoint


def load_stringdb_ppi(
    spark: SparkSession, links_path: str, protein: DataFrame
) -> StringDbLoad:
    """STRING links file → ppi edge rows.

    File format: space-separated `protein1 protein2 combined_score`
    with a header line; ids like `9606.ENSP00000000233`
    (`loaders/load-STRINGDB.py:92-139`). Non-9606 rows are skipped and
    both endpoints resolved through protein.stringid (which stores the
    taxon-prefixed STRING id) — the reference's ensp2pid dict; the
    unresolved remainder is its notfnd set."""
    raw = (
        spark.read.csv(links_path, sep=" ", header=True)
        .filter(
            F.col("protein1").startswith(STRING_TAXON_PREFIX)
            & F.col("protein2").startswith(STRING_TAXON_PREFIX)
        )
        .select(
            "protein1",
            "protein2",
            F.col("combined_score").cast("double").alias("score"),
        )
    )
    r1 = resolve(
        raw, protein, [("protein1", "stringid")],
        id_col="id", out_col="protein1_id",
    )
    r2 = resolve(
        r1.resolved, protein, [("protein2", "stringid")],
        id_col="id", out_col="protein2_id",
    )
    ppi = r2.resolved.select(
        F.lit("STRINGDB").alias("ppitype"),
        "protein1_id",
        "protein2_id",
        "score",
    )
    notfnd = r1.unresolved.unionByName(
        r2.unresolved.drop("protein1_id"), allowMissingColumns=True
    )
    return StringDbLoad(ppi=ppi, notfnd=notfnd)


@dataclass
class PmScoreLoad:
    pmscore: DataFrame       # (protein_id, year, score)
    tdl_info: DataFrame      # (protein_id, itype, number_value) — summed,
                             # zero-filled over ALL proteins
    notfnd: DataFrame


PMSCORE_ITYPE = "JensenLab PubMed Score"


def load_jensenlab_pmscores(
    spark: SparkSession, tsv_path: str, protein: DataFrame
) -> PmScoreLoad:
    """protein_counts.tsv (`ENSP<TAB>year<TAB>score`, no header) →
    yearly pmscore rows + the per-protein all-years sum as one
    tdl_info row (`loaders/load-JensenLabPubMedScores.py:104-131`),
    with proteins lacking any score zero-filled like
    `SQL/InsZeroJLPMSs_TCRDv7.sql` instead of a post-load fixup.
    The bare ENSP is taxon-prefixed before the stringid lookup, the
    reference's `'9606.'+ensp` key construction."""
    raw = spark.read.csv(
        tsv_path,
        sep="\t",
        schema="ensp string, year int, score double",
    ).withColumn("string_key", F.concat(F.lit(STRING_TAXON_PREFIX), "ensp"))
    res = resolve(
        raw, protein, [("string_key", "stringid")],
        id_col="id", out_col="protein_id",
    )
    pmscore = res.resolved.select("protein_id", "year", "score")
    sums = pmscore.groupBy("protein_id").agg(
        F.round(F.sum("score"), 6).alias("number_value")
    )
    tdl_info = zero_fill(
        protein.select(F.col("id").alias("protein_id")),
        sums,
        "protein_id",
        "number_value",
    ).select(
        "protein_id",
        F.lit(PMSCORE_ITYPE).alias("itype"),
        "number_value",
    )
    return PmScoreLoad(pmscore=pmscore, tdl_info=tdl_info, notfnd=res.unresolved)


CONSENSUS_ETYPES = ("HPA", "HPM Gene", "HPM Protein")
ORDINAL_LEVELS = {"Not detected": 0, "Low": 1, "Medium": 2, "High": 3}


def load_consensus_expressions(
    spark: SparkSession,
    expression: DataFrame,
    tissue_map_csv: str,
    etypes: tuple[str, ...] = CONSENSUS_ETYPES,
) -> DataFrame:
    """Consensus expression lifecycle (`loaders/load-
    ConsensusExpressions.py:68-156`): qualitative expression rows from
    the contributing etypes, tissues lower-cased and mapped through the
    Tissues_Typed CSV (cols tissue,_,TissueType — `data/
    Tissues_Typed_v2.1.csv:1`; unmapped tissues are skipped like the
    reference's `if tissue not in tmap: continue`), ordinal-encoded,
    then the mode+confidence decision table per (protein, mapped
    tissue). Returns (protein_id, tissue, n0..n3, consensus_level,
    consensus_name, confidence)."""
    from tcrd_spark.analytics.consensus import consensus

    raw_map = spark.read.csv(tissue_map_csv, header=True)
    c = raw_map.columns
    tmap = F.broadcast(
        raw_map.select(
            F.lower(F.col(c[0])).alias("tissue_lc"),
            F.col(c[2]).alias("tissue"),
        ).dropDuplicates(["tissue_lc"])
    )
    lvl = F.col("qual_value")
    ordinal = F.when(lvl == "Not detected", 0)
    for name, i in list(ORDINAL_LEVELS.items())[1:]:
        ordinal = ordinal.when(lvl == name, i)
    rows = (
        expression.filter(F.col("etype").isin(*etypes))
        .withColumn("tissue_lc", F.lower("tissue"))
        .drop("tissue")
        .join(tmap, "tissue_lc")
        .select("protein_id", "tissue", ordinal.alias("lv"))
        .filter(F.col("lv").isNotNull())
    )
    return consensus(rows, ["protein_id", "tissue"], "lv")


def load_hgram_cdfs(
    gene_attribute: DataFrame, gene_attribute_type: DataFrame
) -> DataFrame:
    """HGram lifecycle (`loaders/load-HGramCDFs.py:75-127`): count
    gene_attribute rows per (protein, attribute type), then the
    per-type population stats + Gaussian CDF (logistic fallback at
    σ=0). The reference's two full N+1 passes (2h13m, `doc/
    README_v6.txt:2023-2026`) are one aggregation + one broadcast
    join + one scoring pass. Returns (protein_id, type, attr_count,
    mu, sigma, attr_cdf)."""
    from tcrd_spark.analytics.hgram import hgram_cdfs

    counts = (
        gene_attribute.groupBy("protein_id", "gat_id")
        .agg(F.count("*").alias("attr_count"))
        .join(
            F.broadcast(
                gene_attribute_type.select(
                    F.col("id").alias("gat_id"), F.col("name").alias("type")
                )
            ),
            "gat_id",
        )
    )
    return hgram_cdfs(
        counts, "protein_id", "type", "attr_count"
    ).select("protein_id", "type", "attr_count", "mu", "sigma", "attr_cdf")


def load_expression_atlas(
    spark: SparkSession,
    analytics_tsv: str,
    contrast_diseases: DataFrame,
    p_max: float = 0.05,
    min_abs_lfc: float = 1.0,
) -> DataFrame:
    """Expression Atlas differential-expression loader
    (`R/exp-atlas_process.R`): one analytics TSV of (Gene ID, Gene
    Name, contrast, p-value, log2foldchange); keep p ≤ 0.05 AND
    |log2fc| > 1 (:26), map contrast → disease (left join; unmatched
    dropped like the dt merge), dedup by (Gene ID, DOID) (:47).
    contrast_diseases: (contrast, doid, disease)."""
    raw = spark.read.csv(
        analytics_tsv,
        sep="\t",
        header=True,
        schema=(
            "gene_id string, gene_name string, contrast string, "
            "p_value double, log2foldchange double"
        ),
    )
    kept = raw.filter(
        (F.col("p_value") <= p_max)
        & (F.abs(F.col("log2foldchange")) > min_abs_lfc)
    )
    mapped = (
        kept.join(F.broadcast(contrast_diseases), "contrast", "left")
        .filter(F.col("doid").isNotNull())
        .dropDuplicates(["gene_id", "doid"])
    )
    return mapped.select(
        F.lit("Expression Atlas").alias("dtype"),
        "gene_id",
        "doid",
        F.col("disease").alias("name"),
        "log2foldchange",
        "p_value",
    )


@dataclass
class GtexLoad:
    expression: DataFrame    # (etype, protein_id, tissue, sex,
                             #  qual_value, number_value)
    tau: DataFrame           # (protein_id, sex, n_tissues, tau)
    notfnd: DataFrame


def load_gtex(
    spark: SparkSession,
    gct_path: str,
    sample_attrs: DataFrame,
    subject_phenos: DataFrame,
    protein_xref: DataFrame,
) -> GtexLoad:
    """GTEx RPKM GCT → per-(protein, tissue, sex) expression levels.

    Pipeline per `R/gtex_process.R`: unpivot the matrix (:29-32), drop
    `ENSGR` genes and the ENSG version suffix (:34; `loaders/
    load-GTEx.py:108`), SAMPID→SMTSD and SAMPID→SUBJID→sex joins
    (:21-26, gender 1→M 2→F), median RPKM per (gene, tissue, sex)
    (:39-43), frank/.N qualitative level (:50-57) and decile tau
    (:9-16) per (gene, sex), then ENSG→protein_id resolution
    (`loaders/load-GTEx.py:100-147`).

    sample_attrs: (SAMPID, SMTSD); subject_phenos: (SUBJID, GENDER
    1/2); protein_xref: (protein_id, value) for xtype='ENSG' rows."""
    from tcrd_spark.sources.gct import read_gct, sample_to_subject

    long = read_gct(spark, gct_path, value_name="rpkm")
    cleaned = (
        long.filter(~F.col("gene").startswith("ENSGR"))
        .withColumn("ensg", F.regexp_replace("gene", r"\.\d+$", ""))
    )
    attrs = F.broadcast(
        sample_attrs.select(
            F.col("SAMPID").alias("sample_id"), F.col("SMTSD").alias("tissue")
        )
    )
    subjects = F.broadcast(
        subject_phenos.select(
            F.col("SUBJID").alias("subject_id"),
            F.when(F.col("GENDER") == 1, "M")
            .when(F.col("GENDER") == 2, "F")
            .alias("sex"),
        )
    )
    joined = (
        cleaned.join(attrs, "sample_id")
        .withColumn("subject_id", sample_to_subject(F.col("sample_id")))
        .join(subjects, "subject_id")
    )
    med = joined.groupBy("ensg", "tissue", "sex").agg(
        F.round(F.median("rpkm"), 6).alias("median_rpkm")
    )
    per_sex = med.withColumn("gkey", F.concat_ws("|", "ensg", "sex"))
    levels = qualitative_levels(per_sex, "gkey", "tissue", "median_rpkm")
    lv = per_sex.join(
        levels.select("gkey", "tissue", "level"), ["gkey", "tissue"]
    )
    taus = tau_continuous(per_sex, "gkey", "tissue", "median_rpkm")
    xref = protein_xref.select(F.col("value").alias("ensg_key"), "protein_id")
    res = resolve(
        lv, xref, [("ensg", "ensg_key")],
        id_col="protein_id", out_col="protein_id",
    )
    expression = res.resolved.select(
        F.lit("GTEx").alias("etype"),
        "protein_id",
        "tissue",
        "sex",
        F.col("level").alias("qual_value"),
        F.col("median_rpkm").alias("number_value"),
    )
    tau_resolved = (
        taus.withColumn("ensg", F.split("gkey", r"\|").getItem(0))
        .withColumn("sex", F.split("gkey", r"\|").getItem(1))
        .join(F.broadcast(xref), F.col("ensg") == F.col("ensg_key"))
        .select("protein_id", "sex", "n_tissues", "tau")
    )
    return GtexLoad(
        expression=expression, tau=tau_resolved, notfnd=res.unresolved
    )


# ---------------------------------------------------------------- ChEMBL

# IDG-family pchembl cutoffs (`loaders/load-ChEMBL.py:146-155`):
# GPCR 100nM, IC 10uM, Kinase 30nM, NR 100nM, else 1uM.
CHEMBL_FAM_CUTOFFS = (
    ("GPCR", 7.0), ("IC", 5.0), ("Kinase", 7.52288), ("NR", 7.0),
)
CHEMBL_DEFAULT_CUTOFF = 6.0


@dataclass
class ChemblLoad:
    cmpd_activity: DataFrame     # qualifying activities per target
    first_year: DataFrame        # 'ChEMBL First Reference Year' infos
    selective: DataFrame         # 'ChEMBL Selective Compound' infos
    notfnd: DataFrame            # activities whose uniprot resolves to no target


def load_chembl_activities(acts: DataFrame, targets: DataFrame) -> ChemblLoad:
    """ChEMBL activity load (`loaders/load-ChEMBL.py:116-280`).

    acts: the rows SQLq1/SQLq2 (`:54-56`) extract per target —
    (uniprot, chembl_id, cmpd_name, smiles, pchembl_value, act_type,
    year, reference). targets: (target_id, uniprot, fam).

    Per reference semantics:
    - family-dependent pchembl cutoff filters activities (`:146-157`);
    - 'ChEMBL First Reference Year' = earliest year among qualifying
      activities (`:193-199`);
    - selective compounds (`:236-262`): order each compound's
      activities by pchembl; any adjacent pair on DIFFERENT targets
      ≥2 log units apart marks the compound selective; each target's
      strongest qualifying activity on a selective compound becomes
      one 'ChEMBL Selective Compound' info (`:263-271`).
    The reference's per-compound Python sort loop is one lag() window;
    the per-target pick is one row_number() window — both shuffle the
    activity stream exactly once on their respective keys."""
    t = F.broadcast(targets.select("target_id", "uniprot", "fam"))
    joined = acts.join(t, "uniprot", "left")
    notfnd = joined.filter(F.col("target_id").isNull()).drop("target_id", "fam")
    fnd = joined.filter(F.col("target_id").isNotNull())

    cutoff = F.lit(CHEMBL_DEFAULT_CUTOFF)
    expr = F.when(F.lit(False), 0.0)
    for fam, cut in CHEMBL_FAM_CUTOFFS:
        expr = expr.when(F.col("fam") == fam, cut)
    cutoff = expr.otherwise(cutoff)
    qualifying = fnd.filter(F.col("pchembl_value") >= cutoff)

    cmpd_activity = qualifying.select(
        "target_id",
        F.lit("ChEMBL").alias("catype"),
        F.col("chembl_id").alias("cmpd_id_in_src"),
        F.col("cmpd_name").alias("cmpd_name_in_src"),
        "smiles",
        F.col("pchembl_value").alias("act_value"),
        "act_type",
        "reference",
    )
    first_year = (
        qualifying.filter(F.col("year").isNotNull())
        .groupBy("target_id")
        .agg(F.min("year").alias("integer_value"))
        .select(
            "target_id",
            F.lit("ChEMBL First Reference Year").alias("itype"),
            "integer_value",
        )
    )
    # selectivity detection runs over ALL resolved activities (the
    # reference's c2acts), not only the qualifying ones
    w = Window.partitionBy("smiles").orderBy("pchembl_value", "chembl_id")
    pairs = fnd.select(
        "smiles", "target_id", "pchembl_value", "chembl_id"
    ).withColumn("prev_tid", F.lag("target_id").over(w)).withColumn(
        "prev_val", F.lag("pchembl_value").over(w)
    )
    selective_smiles = (
        pairs.filter(
            F.col("prev_tid").isNotNull()
            & (F.col("prev_tid") != F.col("target_id"))
            & (F.col("pchembl_value") - F.col("prev_val") >= 2)
        )
        .select("smiles")
        .distinct()
    )
    w2 = Window.partitionBy("target_id").orderBy(
        F.desc("pchembl_value"), "chembl_id"
    )
    selective = (
        qualifying.join(F.broadcast(selective_smiles), "smiles")
        .withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") == 1)
        .select(
            "target_id",
            F.lit("ChEMBL Selective Compound").alias("itype"),
            F.concat_ws("|", "chembl_id", "smiles").alias("string_value"),
        )
    )
    return ChemblLoad(
        cmpd_activity=cmpd_activity, first_year=first_year,
        selective=selective, notfnd=notfnd,
    )


# ------------------------------------------------------------ DrugCentral

@dataclass
class DrugCentralLoad:
    drug_activity: DataFrame
    notfnd: DataFrame


def load_drugcentral(
    acts: DataFrame,
    name2id: DataFrame,
    druginfo: DataFrame,
    targets: DataFrame,
) -> DrugCentralLoad:
    """DrugCentral Tclin activity load (`loaders/load-DrugCentral.py:
    95-150`). acts: (uniprot, swissprot, drug, act_value, act_type,
    action_type, source, reference, smiles, cmpd_chemblid) — the tclin
    TSV columns; name2id: (drug, dcid) from the name→id TSV (`:62-67`);
    druginfo: (drug, nlm_drug_info) (`:77-82`); targets: (target_id,
    uniprot, protein_name).

    Resolution cascade exactly like the reference: uniprot first,
    swissprot name fallback (`:113-115`); every resolved row becomes a
    drug_activity with has_moa=1 (DrugCentral rows are MoA by
    definition, `:121`)."""
    res = resolve(
        acts, targets,
        [("uniprot", "uniprot"), ("swissprot", "protein_name")],
        id_col="target_id", out_col="target_id",
    )
    out = (
        res.resolved
        .join(F.broadcast(name2id), "drug", "left")
        .join(F.broadcast(druginfo), "drug", "left")
        .select(
            "target_id", "drug",
            F.lit(True).alias("has_moa"),
            "act_value", "act_type", "action_type", "source",
            "reference", "smiles", "cmpd_chemblid", "nlm_drug_info",
            "dcid",
        )
    )
    return DrugCentralLoad(drug_activity=out, notfnd=res.unresolved)


# ------------------------------------------------------- IMPC phenotypes

def load_impc_phenotypes(
    rows: DataFrame, nhprotein: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """IMPC mouse phenotype load (`loaders/load-IMPC-Phenotypes.py:
    127-157`): skip rows lacking BOTH mp_term_id and mp_term_name
    (`:130`), resolve marker_symbol against mouse nhprotein.sym, emit
    ptype='IMPC' phenotype rows with gp_assoc=1. p_value parses
    null-safely (cast, like the reference's try/float).

    rows: (marker_symbol, procedure_name, parameter_name,
    top_level_mp_term_id, top_level_mp_term_name, mp_term_id,
    mp_term_name, p_value, percentage_change, effect_size,
    statistical_method, sex). Returns (phenotypes, notfnd)."""
    kept = rows.filter(
        (F.coalesce(F.col("mp_term_id"), F.lit("")) != "")
        | (F.coalesce(F.col("mp_term_name"), F.lit("")) != "")
    )
    nh = F.broadcast(
        nhprotein.filter(F.col("species") == "Mus musculus").select(
            F.col("id").alias("nhprotein_id"), F.col("sym").alias("marker_symbol")
        )
    )
    joined = kept.join(nh, "marker_symbol", "left")
    notfnd = joined.filter(F.col("nhprotein_id").isNull()).drop("nhprotein_id")
    out = joined.filter(F.col("nhprotein_id").isNotNull()).select(
        "nhprotein_id",
        F.lit("IMPC").alias("ptype"),
        F.col("top_level_mp_term_id").alias("top_level_term_id"),
        F.col("top_level_mp_term_name").alias("top_level_term_name"),
        F.col("mp_term_id").alias("term_id"),
        F.col("mp_term_name").alias("term_name"),
        F.col("p_value").cast("double").alias("p_value"),
        "percentage_change",
        F.col("effect_size").cast("string").alias("effect_size"),
        "procedure_name", "parameter_name", "statistical_method", "sex",
        F.lit(True).alias("gp_assoc"),
    )
    return out, notfnd


# ------------------------------------------------------------ GWAS catalog

GWAS_SYM_SPLIT = r" ?[-,;] ?"   # load-GWASCatalog.py:132 symregex


def load_gwas_catalog(
    rows: DataFrame, protein: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """GWAS catalog association load (`loaders/load-GWASCatalog.py:
    128-164`): split MAPPED_GENE on the reference's symregex and emit
    one gwas row per (resolved symbol, association). 'NR' symbol rows
    are skipped (`:137`); numeric fields cast null-safely like the
    try/float blocks (`:149-159`).

    rows carries the catalog's header names lower-snaked:
    (mapped_gene, disease_trait, snps, pubmedid, study, context,
    intergenic, p_value, or_beta, cnv, mapped_trait,
    mapped_trait_uri). Returns (gwas_rows, notfnd_syms)."""
    syms = (
        rows.filter(F.col("mapped_gene") != "NR")
        .withColumn(
            "sym", F.explode(F.split(F.col("mapped_gene"), GWAS_SYM_SPLIT))
        )
        .filter(F.col("sym") != "")
    )
    p = F.broadcast(
        protein.select(F.col("id").alias("protein_id"), "sym")
    )
    joined = syms.join(p, "sym", "left")
    notfnd = (
        joined.filter(F.col("protein_id").isNull()).select("sym").distinct()
    )
    out = joined.filter(F.col("protein_id").isNotNull()).select(
        "protein_id",
        "disease_trait",
        "snps",
        F.col("pubmedid").cast("long").alias("pmid"),
        "study",
        "context",
        F.col("intergenic").cast("boolean").alias("intergenic"),
        F.col("p_value").cast("double").alias("p_value"),
        F.col("or_beta").cast("double").alias("or_beta"),
        "cnv", "mapped_trait", "mapped_trait_uri",
    )
    return out, notfnd


# ------------------------------------------------------------- KEGG pathways

def load_kegg_pathways(
    link: DataFrame, meta: DataFrame, protein: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """KEGG pathway load (`loaders/load-KEGGPathways.py:75-160`): the
    /link/hsa/pathway table maps pathway → geneids (`:76-92`), each
    pathway's KGML title/link give name and url, geneids resolve
    through protein.geneid. link: (kpw, geneid); meta: (kpw, name,
    url); protein: (id, geneid). Returns (pathway_rows, notfnd)."""
    p = F.broadcast(
        protein.select(F.col("id").alias("protein_id"), "geneid")
    )
    joined = (
        link.join(F.broadcast(meta), "kpw")
        .join(p, "geneid", "left")
    )
    notfnd = (
        joined.filter(F.col("protein_id").isNull()).select("geneid").distinct()
    )
    out = joined.filter(F.col("protein_id").isNotNull()).select(
        "protein_id",
        F.lit("KEGG").alias("pwtype"),
        "name",
        F.col("kpw").alias("id_in_source"),
        "url",
    )
    return out, notfnd


# --------------------------------------------------------- DO / Uberon OBO

def load_do_ontology(spark: SparkSession, obo_path: str) -> dict[str, DataFrame]:
    """Disease Ontology OBO → the lake's do/do_parent/do_xref tables
    (`loaders/load-Ontologies.py` DO section; schema
    `SQL/create-TCRDv7.sql` do tables). Obsolete terms are skipped
    like the reference parser."""
    from tcrd_spark.sources.obo import read_obo

    terms = read_obo(spark, obo_path).filter(~F.col("is_obsolete"))
    do = terms.select(
        F.col("term_id").alias("doid"),
        "name",
        F.col("definition").alias("def"),
    )
    do_parent = terms.select(
        F.col("term_id").alias("doid"),
        F.explode("is_a").alias("parent_id"),
    )
    do_xref = terms.select(
        F.col("term_id").alias("doid"), F.explode("xrefs").alias("x")
    ).select(
        "doid",
        F.split("x", ":").getItem(0).alias("db"),
        F.regexp_replace("x", r"^[^:]*:", "").alias("value"),
    )
    return {"do": do, "do_parent": do_parent, "do_xref": do_xref}


def load_uberon_ontology(
    spark: SparkSession, obo_path: str
) -> dict[str, DataFrame]:
    """Uberon OBO → uberon/uberon_parent/uberon_xref
    (`loaders/load-Uberon-IDs.py`; expression.oid consumers)."""
    from tcrd_spark.sources.obo import read_obo

    terms = read_obo(spark, obo_path).filter(~F.col("is_obsolete"))
    uberon = terms.select(
        F.col("term_id").alias("uid"),
        "name",
        F.col("definition").alias("def"),
        F.lit(None).cast("string").alias("comment"),
    )
    uberon_parent = terms.select(
        F.col("term_id").alias("uid"),
        F.explode("is_a").alias("parent_id"),
    )
    uberon_xref = terms.select(
        F.col("term_id").alias("uid"), F.explode("xrefs").alias("x")
    ).select(
        "uid",
        F.split("x", ":").getItem(0).alias("db"),
        F.regexp_replace("x", r"^[^:]*:", "").alias("value"),
    )
    return {
        "uberon": uberon,
        "uberon_parent": uberon_parent,
        "uberon_xref": uberon_xref,
    }


# --------------------------------------------------------------- HPA / OMIM

def load_hpa_expression(
    normal_tissue: DataFrame, tau_scores: DataFrame | None = None
) -> tuple[DataFrame, DataFrame | None]:
    """HPA load (`loaders/load-HPA.py:100-157`): the pre-processed
    normal-tissue TSV (protein_id, tissue, gene, gene_name, level,
    reliability) → etype='HPA' expression rows; the tau TSV
    (gene, tau, protein_id) → 'HPA Tissue Specificity Index' infos,
    skipping 'None' scores (`:149-153`)."""
    expression = normal_tissue.select(
        F.col("protein_id").cast("long").alias("protein_id"),
        F.lit("HPA").alias("etype"),
        "tissue",
        F.col("level").alias("qual_value"),
        F.col("reliability").alias("evidence"),
    )
    infos = None
    if tau_scores is not None:
        infos = (
            tau_scores.filter(F.col("tau") != "None")
            .select(
                F.col("protein_id").cast("long").alias("protein_id"),
                F.lit("HPA Tissue Specificity Index").alias("itype"),
                F.col("tau").cast("double").alias("number_value"),
            )
        )
    return expression, infos


@dataclass
class OmimLoad:
    omim: DataFrame            # (mim, title)
    omim_ps: DataFrame         # (omim_ps_id, mim, title)
    phenotype: DataFrame       # ptype='OMIM' rows
    notfnd: DataFrame          # genemap rows resolving to no protein


def load_omim(
    titles: DataFrame,
    phenotypic_series: DataFrame,
    genemap: DataFrame,
    protein: DataFrame,
) -> OmimLoad:
    """OMIM load (`loaders/load-OMIM.py:107-245`).

    titles: (prefix, mim, title_raw) from mimTitles — title truncates
    at the first ';' (`:120`). phenotypic_series: (omim_ps_id, mim,
    title). genemap: (gene_symbols, mim, phenotypes) — provisional
    phenotype rows ('?' prefix) are skipped (`:218-220`), the trait
    string is 'MIM Number: N[; Phenotype: P]' (`:223-225`), and the
    comma-separated symbol list explodes against protein.sym
    (`:227-236`)."""
    omim = titles.filter(~F.col("prefix").startswith("#")).select(
        F.col("mim").cast("long").alias("mim"),
        F.split(F.col("title_raw"), ";").getItem(0).alias("title"),
    )
    ps = phenotypic_series.select(
        "omim_ps_id", F.col("mim").cast("long").alias("mim"), "title"
    )
    gm = genemap.filter(
        ~F.coalesce(F.col("phenotypes"), F.lit("")).startswith("?")
    ).withColumn(
        "trait",
        F.concat(
            F.lit("MIM Number: "), F.col("mim").cast("string"),
            F.when(
                F.coalesce(F.col("phenotypes"), F.lit("")) != "",
                F.concat(F.lit("; Phenotype: "), F.col("phenotypes")),
            ).otherwise(F.lit("")),
        ),
    ).withColumn("sym", F.explode(F.split(F.col("gene_symbols"), ", ")))
    p = F.broadcast(protein.select(F.col("id").alias("protein_id"), "sym"))
    joined = gm.join(p, "sym", "left")
    notfnd = joined.filter(F.col("protein_id").isNull()).drop("protein_id")
    phenotype = joined.filter(F.col("protein_id").isNotNull()).select(
        "protein_id", F.lit("OMIM").alias("ptype"), "trait"
    )
    return OmimLoad(omim=omim, omim_ps=ps, phenotype=phenotype, notfnd=notfnd)


# ----------------------------------------------------------------- orthologs

# taxid → species for the wanted ortholog set (`load-Orthologs.py:48-66`)
ORTHOLOG_TAXID2SP = {
    "9598": "Chimp", "9544": "Macaque", "10090": "Mouse", "10116": "Rat",
    "9615": "Dog", "9796": "Horse", "9913": "Cow", "9823": "Pig",
    "13616": "Opossum", "9258": "Platypus", "9031": "Chicken",
    "28377": "Anole lizard", "8364": "Xenopus", "7955": "Zebrafish",
    "6239": "C. elegans", "7227": "Fruitfly", "4932": "S.cerevisiae",
}


def load_orthologs(
    rows: DataFrame, protein: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Ortholog load (`loaders/load-Orthologs.py:140-199`): keep rows
    whose taxid is a wanted species, drop rows whose symbol AND name
    are both '-' (`:163`), resolve the human side by symbol first then
    geneid (`:153-156`), normalize '-' sentinels to NULL, and build
    the per-MOD URL exactly per the reference's elif chain
    (`:180-192`). Returns (ortholog_rows, notfnd)."""
    sp_map = F.create_map(
        *[F.lit(x) for kv in ORTHOLOG_TAXID2SP.items() for x in kv]
    )
    kept = (
        rows.withColumn(
            "species", sp_map[F.col("ortholog_species").cast("string")]
        )
        .filter(F.col("species").isNotNull())
        .filter(
            ~(
                (F.col("ortholog_species_symbol") == "-")
                & (F.col("ortholog_species_name") == "-")
            )
        )
    )
    res = resolve(
        kept, protein,
        [("human_symbol", "sym"), ("human_entrez_gene", "geneid")],
        id_col="id", out_col="protein_id",
    )
    dash_null = lambda c: F.nullif(F.col(c), F.lit("-"))  # noqa: E731
    db_id = dash_null("ortholog_species_db_id")
    sym = F.col("ortholog_species_symbol")
    mod_url = (
        F.when(F.col("species") == "Mouse",
               F.concat(F.lit("http://www.informatics.jax.org/marker/"), db_id))
        .when(F.col("species") == "Rat",
              F.concat(
                  F.lit("http://rgd.mcw.edu/rgdweb/report/gene/main.html?id="),
                  F.regexp_replace(db_id, "^RGD:", "")))
        .when(F.col("species") == "Zebrafish",
              F.concat(F.lit("http://zfin.org/"), db_id))
        .when(F.col("species") == "Fruitfly",
              F.concat(F.lit("http://flybase.org/reports/"), db_id,
                       F.lit(".html")))
        .when(F.col("species") == "C. elegans",
              F.concat(F.lit("http://www.wormbase.org/search/gene/"), sym))
        .when(F.col("species") == "S.cerevisiae",
              F.concat(F.lit("https://www.yeastgenome.org/locus/"), db_id))
    )
    out = res.resolved.select(
        "protein_id",
        F.col("ortholog_species").cast("long").alias("taxid"),
        "species",
        db_id.alias("db_id"),
        dash_null("ortholog_species_entrez_gene").cast("long").alias("geneid"),
        sym.alias("symbol"),
        F.col("ortholog_species_name").alias("name"),
        mod_url.alias("mod_url"),
        "sources",
    )
    return out, res.unresolved
