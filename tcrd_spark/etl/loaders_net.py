"""Network / pathway / assay loader families (SURVEY.md §7 step 6,
sixth batch).

- BioPlex PPIs (`loaders/load-BioPlexPPIs.py:103-150`): probability-
  carrying edges (p_int/p_ni/p_wrong), endpoints resolved
  uniprot→sym→geneid.
- Reactome PPIs (`loaders/load-ReactomePPIs.py:121-165`):
  'uniprotkb:'-prefixed endpoints only, interaction_type kept.
- Reactome pathways (`loaders/load-ReactomePathways.py:95-140`): GMT
  lines (name, id, type, syms...) exploded per symbol.
- LocSigDB (`loaders/load-LocSigDB.py:95-125`): human-only rows,
  ';'-separated uniprot list exploded, (signal, location, pmids).
- MLP assay info (`loaders/load-MLPAssayInfo.py:80-135`): human rows,
  NCBI GI xref → sym resolution, joined to per-AID assay details.
- Monarch ortholog diseases
  (`loaders/load-MonarchOrthologDiseases.py:118-145`): protein via
  uniprot→sym, ortholog via (symbol,taxid)→(geneid,taxid) cascade.
- NCBI Gene annotations (`loaders/load-NCBIGene.py:237-310`): the
  E-utils payload (ingest-shimmed JSONL) fans out into symbol aliases,
  summary + PubMed-count tdl_infos, generifs, and PubMed xrefs.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tcrd_spark.etl.resolve import resolve

# ------------------------------------------------------------- PPIs


@dataclass
class PpiLoad:
    ppi: DataFrame
    notfnd: DataFrame


def _resolve_endpoint(
    df: DataFrame, protein: DataFrame, n: int,
    up_col: str, sym_col: str | None = None, geneid_col: str | None = None,
):
    lookup = protein.select(
        "id", F.col("uniprot").alias("_up"), F.col("sym").alias("_sym"),
        F.col("geneid").alias("_geneid"),
    )
    keys = [(up_col, "_up")]
    if sym_col:
        keys.append((sym_col, "_sym"))
    if geneid_col:
        keys.append((geneid_col, "_geneid"))
    return resolve(df, lookup, keys, id_col="id", out_col=f"protein{n}_id")


def load_bioplex_ppis(
    spark: SparkSession, tsv_path: str, protein: DataFrame
) -> PpiLoad:
    """BioPlex interactions TSV (`geneid1 geneid2 up1 up2 sym1 sym2
    p_wrong p_ni p_int` after header) → ppitype='BioPlex' edges with
    the three posterior probabilities
    (`loaders/load-BioPlexPPIs.py:103-150`); each endpoint resolves
    uniprot → sym → geneid."""
    raw = spark.read.csv(
        tsv_path, sep="\t", header=True,
        schema=("geneid1 int, geneid2 int, up1 string, up2 string, "
                "sym1 string, sym2 string, "
                "p_wrong double, p_ni double, p_int double"),
    )
    r1 = _resolve_endpoint(raw, protein, 1, "up1", "sym1", "geneid1")
    r2 = _resolve_endpoint(r1.resolved, protein, 2, "up2", "sym2", "geneid2")
    ppi = r2.resolved.select(
        F.lit("BioPlex").alias("ppitype"),
        "protein1_id", "protein2_id", "p_int", "p_ni", "p_wrong",
    )
    notfnd = r1.unresolved.unionByName(
        r2.unresolved.drop("protein1_id"), allowMissingColumns=True
    )
    return PpiLoad(ppi=ppi, notfnd=notfnd)


def load_reactome_ppis(
    spark: SparkSession, tsv_path: str, protein: DataFrame
) -> PpiLoad:
    """Reactome interactions PSI-MITAB-ish TSV → ppitype='Reactome'
    edges (`loaders/load-ReactomePPIs.py:121-165`): only rows where
    BOTH endpoints are 'uniprotkb:'-prefixed load; the prefix strips
    off; interaction_type is kept; self-loops and duplicate unordered
    pairs dedup (`:130-134` ppis-seen set)."""
    raw = (
        spark.read.csv(
            tsv_path, sep="\t", header=True,
            schema=("a string, c1 string, c2 string, b string, c4 string, "
                    "c5 string, int_type string"),
        )
        .filter(
            F.col("a").startswith("uniprotkb:")
            & F.col("b").startswith("uniprotkb:")
        )
        .select(
            F.regexp_replace("a", "^uniprotkb:", "").alias("up1"),
            F.regexp_replace("b", "^uniprotkb:", "").alias("up2"),
            "int_type",
        )
        .filter(F.col("up1") != F.col("up2"))
        .dropDuplicates(["up1", "up2"])
    )
    r1 = _resolve_endpoint(raw, protein, 1, "up1")
    r2 = _resolve_endpoint(r1.resolved, protein, 2, "up2")
    ppi = r2.resolved.select(
        F.lit("Reactome").alias("ppitype"),
        "protein1_id", "protein2_id",
        F.col("int_type").alias("interaction_type"),
    )
    notfnd = r1.unresolved.unionByName(
        r2.unresolved.drop("protein1_id"), allowMissingColumns=True
    )
    return PpiLoad(ppi=ppi, notfnd=notfnd)


# ---------------------------------------------------------- pathways


@dataclass
class PathwayLoad:
    pathway: DataFrame
    notfnd: DataFrame


def load_reactome_pathways(
    spark: SparkSession, gmt_path: str, protein: DataFrame
) -> PathwayLoad:
    """ReactomePathways.gmt (`name<TAB>R-HSA-id<TAB>type<TAB>sym...`)
    → pwtype='Reactome' pathway rows, one per (protein, pathway)
    (`loaders/load-ReactomePathways.py:95-140`): symbols explode and
    resolve with fan-out; the url derives from the stable id."""
    lines = spark.read.text(gmt_path)
    raw = lines.select(
        F.split("value", "\t").alias("parts")
    ).select(
        F.element_at("parts", 1).alias("name"),
        F.element_at("parts", 2).alias("id_in_source"),
        F.explode(F.slice("parts", 4, 100000)).alias("sym"),
    ).filter(F.col("sym") != "")
    res = resolve(
        raw, protein.select("id", F.col("sym").alias("_sym")),
        [("sym", "_sym")], id_col="id", out_col="protein_id",
    )
    pathway = res.resolved.select(
        "protein_id", F.lit("Reactome").alias("pwtype"), "name",
        "id_in_source",
        F.concat(F.lit("http://www.reactome.org/content/detail/"),
                 "id_in_source").alias("url"),
    )
    notfnd = res.unresolved.select("sym").distinct()
    return PathwayLoad(pathway=pathway, notfnd=notfnd)


# ----------------------------------------------------------- LocSigDB


@dataclass
class LocsigLoad:
    locsig: DataFrame
    notfnd: DataFrame
    skipped: int             # non-human rows


def load_locsig(
    spark: SparkSession, csv_path: str, protein: DataFrame
) -> LocsigLoad:
    """LocSigDB CSV (`signal,?,location,pmids,uniprots,species`) →
    locsig rows (`loaders/load-LocSigDB.py:95-125`): human rows only,
    the ';'-separated uniprot list explodes, each id resolves
    independently."""
    raw = spark.read.csv(
        csv_path,
        schema=("signal string, c1 string, location string, pmids string, "
                "uniprots string, species string"),
    )
    skipped = raw.filter(~F.col("species").contains("Homo sapiens")).count()
    kept = (
        raw.filter(F.col("species").contains("Homo sapiens"))
        .withColumn("uniprot", F.explode(F.split("uniprots", ";")))
        .filter(F.col("uniprot") != "")
    )
    res = resolve(kept, protein.select("id", "uniprot"),
                  [("uniprot", "uniprot")], id_col="id", out_col="protein_id")
    locsig = res.resolved.select("protein_id", "location", "signal", "pmids")
    return LocsigLoad(locsig=locsig, notfnd=res.unresolved.select("uniprot"),
                      skipped=skipped)


# ------------------------------------------------------ MLP assay info


@dataclass
class MlpLoad:
    mlp_assay_info: DataFrame
    notfnd: DataFrame
    skipped: int             # non-human target rows


def load_mlp_assay_info(
    spark: SparkSession,
    target_assay_path: str,
    assay_details_path: str,
    protein: DataFrame,
    xref: DataFrame,
) -> MlpLoad:
    """MLP assay links (`aid,gi,species,name,sym`) + per-AID details
    (`aid,assay_name,method,active_sids,inactive_sids,iconclusive_sids,
    total_sids`) → mlp_assay_info rows
    (`loaders/load-MLPAssayInfo.py:80-170`): human rows only, target
    resolution NCBI-GI-xref first then symbol (`:111-122`)."""
    raw = spark.read.csv(
        target_assay_path, header=True,
        schema="aid int, gi string, species string, name string, sym string",
    )
    skipped = raw.filter(F.col("species") != "Homo sapiens").count()
    kept = raw.filter(F.col("species") == "Homo sapiens")
    gi_lookup = xref.filter(F.col("xtype") == "NCBI GI").select(
        F.col("protein_id").alias("id"), F.col("value").alias("_gi"),
        F.lit(None).cast("string").alias("_sym"),
    )
    sym_lookup = protein.select(
        "id", F.lit(None).cast("string").alias("_gi"),
        F.col("sym").alias("_sym"),
    )
    res = resolve(
        kept, gi_lookup.unionByName(sym_lookup),
        [("gi", "_gi"), ("sym", "_sym")],
        id_col="id", out_col="protein_id",
    )
    details = F.broadcast(
        spark.read.csv(
            assay_details_path, header=True,
            schema=("aid int, assay_name string, method string, "
                    "active_sids int, inactive_sids int, "
                    "iconclusive_sids int, total_sids int"),
        )
    )
    mlp = res.resolved.join(details, "aid").select(
        "protein_id", "assay_name", "method", "active_sids",
        "inactive_sids", "iconclusive_sids", "total_sids", "aid",
    )
    return MlpLoad(mlp_assay_info=mlp, notfnd=res.unresolved, skipped=skipped)


# ------------------------------------------- Monarch ortholog diseases


@dataclass
class MonarchLoad:
    ortholog_disease: DataFrame
    notfnd: DataFrame        # unresolvable protein OR ortholog rows


def load_monarch_ortholog_diseases(
    spark: SparkSession,
    tsv_path: str,
    protein: DataFrame,
    ortholog: DataFrame,
) -> MonarchLoad:
    """Monarch ortholog-disease TSV (`sym, uniprot, name, did, score,
    taxid, species, dbid, o_geneid, o_symbol`) → ortholog_disease rows
    (`loaders/load-MonarchOrthologDiseases.py:118-145`): protein
    resolves uniprot→sym; the ortholog row resolves (symbol, taxid)
    then (geneid, taxid) (`:130-132`)."""
    raw = spark.read.csv(
        tsv_path, sep="\t", header=True,
        schema=("sym string, uniprot string, name string, did string, "
                "score double, taxid int, species string, dbid string, "
                "o_geneid int, o_symbol string"),
    )
    res_p = resolve(
        raw,
        protein.select("id", F.col("uniprot").alias("_up"),
                       F.col("sym").alias("_sym")),
        [("uniprot", "_up"), ("sym", "_sym")],
        id_col="id", out_col="protein_id",
    )
    o_lookup = ortholog.select(
        F.col("id").alias("oid"),
        F.concat_ws("|", "symbol", "taxid").alias("_symtax"),
        F.concat_ws("|", "geneid", "taxid").alias("_gidtax"),
    )
    with_keys = res_p.resolved.withColumn(
        "symtax", F.concat_ws("|", "o_symbol", "taxid")
    ).withColumn("gidtax", F.concat_ws("|", "o_geneid", "taxid"))
    res_o = resolve(
        with_keys, o_lookup,
        [("symtax", "_symtax"), ("gidtax", "_gidtax")],
        id_col="oid", out_col="ortholog_id",
    )
    rows = res_o.resolved.select(
        "protein_id", "did", "name", "ortholog_id", "score"
    )
    notfnd = res_p.unresolved.unionByName(
        res_o.unresolved.drop("protein_id", "symtax", "gidtax"),
        allowMissingColumns=True,
    )
    return MonarchLoad(ortholog_disease=rows, notfnd=notfnd)


# ------------------------------------------------- NCBI Gene payloads


@dataclass
class NcbiGeneLoad:
    alias: DataFrame         # symbol aliases
    tdl_info: DataFrame      # summary (string) + pubmed count (int)
    generif: DataFrame
    xref: DataFrame          # PubMed xrefs
    notfnd: DataFrame


NCBI_SUMMARY_ITYPE = "NCBI Gene Summary"
NCBI_PMC_ITYPE = "NCBI Gene PubMed Count"


def load_ncbi_gene(
    spark: SparkSession, jsonl_path: str, protein: DataFrame
) -> NcbiGeneLoad:
    """NCBI Gene E-utils payloads (ingest-shim JSONL: one record per
    gene with `geneid, summary, aliases[], pmids[], generifs[{
    pubmed_ids, text}]`) → the four annotation tables the reference
    writes per gene (`loaders/load-NCBIGene.py:237-310`): symbol
    aliases (`:283`), 'NCBI Gene Summary' string tdl_info (`:288-290`),
    'NCBI Gene PubMed Count' integer tdl_info over the pmid list
    (`:299`), one generif per rif (`:253`), one PubMed xref per pmid
    (`:306`). The reference's 8h20m per-gene fetch loop
    (`doc/README_v6.txt:178`) is ingest; this transform is one pass."""
    raw = spark.read.json(
        jsonl_path,
        schema=("geneid int, summary string, aliases array<string>, "
                "pmids array<string>, "
                "generifs array<struct<pubmed_ids:string, text:string>>"),
    )
    res = resolve(raw, protein.select("id", "geneid"),
                  [("geneid", "geneid")], id_col="id", out_col="protein_id")
    r = res.resolved
    alias = r.select(
        "protein_id", F.lit("symbol").alias("type"),
        F.explode("aliases").alias("value"),
    )
    tdl_info = r.filter(
        F.col("summary").isNotNull() & (F.col("summary") != "")
    ).select(
        "protein_id", F.lit(NCBI_SUMMARY_ITYPE).alias("itype"),
        F.col("summary").alias("string_value"),
        F.lit(None).cast("int").alias("integer_value"),
    ).unionByName(
        r.select(
            "protein_id", F.lit(NCBI_PMC_ITYPE).alias("itype"),
            F.lit(None).cast("string").alias("string_value"),
            F.coalesce(F.size("pmids"), F.lit(0)).alias("integer_value"),
        )
    )
    generif = r.select(
        "protein_id", F.explode("generifs").alias("_g")
    ).select(
        "protein_id", F.col("_g.pubmed_ids").alias("pubmed_ids"),
        F.col("_g.text").alias("text"),
    )
    xref = r.select(
        "protein_id", F.lit("PubMed").alias("xtype"),
        F.explode("pmids").alias("value"),
    )
    return NcbiGeneLoad(alias=alias, tdl_info=tdl_info, generif=generif,
                        xref=xref, notfnd=res.unresolved)
