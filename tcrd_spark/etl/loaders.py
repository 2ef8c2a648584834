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

Scale: each pipeline is shuffle-minimal — the fact stream shuffles only
for its own aggregations; every lookup side is a broadcast. No
per-row anything.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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
