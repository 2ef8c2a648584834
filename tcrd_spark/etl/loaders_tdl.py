"""TDL-info worklist and IDG-housekeeping loader families — the last
eight reference loaders without a counterpart (SURVEY.md §7 step 6,
final batch).

- AnimalTFDB TF flags (`loaders/load-AnimalTFDB.py:88-118`):
  sym → geneid → Ensembl-xref fallback chain, one boolean
  'Is Transcription Factor' tdl_info per hit, plus the per-TDL tally
  the loader prints as its oracle.
- Antibodypedia by id-list (`loaders/load-AntibodypediaList.py:
  68-140`): the list-file variant of load-Antibodypedia — protein ids
  come straight from the `uniprot<SP>tid` worklist, counts from the
  (ingest-shimmed) per-accession API payload.
- Drug Target Ontology (`loaders/load-DTO.py:50-66,69-155,156-170`):
  OWL classes → dto rows; mapping CSV → protein.dtoid; classification
  CSV → protein.dtoclass, gated on the mapping like the reference's
  up2pid dict.
- Drugable Epigenome classes
  (`loaders/load-DrugableEpigenomeTDLInfos.py:43-53,98-140`): ten
  Nature-RDD supplement CSVs keyed by (class, domain) → one
  'Drugable Epigenome Class' string tdl_info per resolved row.
- IDG families (`loaders/load-IDGFams.py:65-99`): fam/famext updates
  restricted to targets whose fam is NULL (IDG targets keep the
  load-IDGList value).
- IDG eligibility evolution (`loaders/load-IDGevol.py:43-84`):
  six per-version CSV exports unioned into idg_evol with '\\N'
  geneid scrubbing.
- IMPC mouse clones (`loaders/load-IMPCMiceTDLInfos.py:88-131`):
  sym → MGI-xref fallback, 'IMPC Status' (default '?') + 'IMPC
  Clones' string tdl_infos, rows with neither skipped.
- TMHMM predictions (`loaders/load-TMHMM_Predictions.py:79-108`):
  the engine half — fasta prep per protein and the PredHel>0 filter
  over the tool's short-format output; running the external binary
  itself is tool orchestration, not engine work.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tcrd_spark.etl.resolve import Resolution, resolve

# ----------------------------------------------------------- AnimalTFDB

TF_ITYPE = "Is Transcription Factor"


@dataclass
class AnimalTfdbLoad:
    tdl_info: DataFrame      # (protein_id, itype, boolean_value)
    tdl_counts: DataFrame    # (tdl, ct) — the loader's printed tally
    notfnd: DataFrame


def xref_protein_lookup(
    xref: DataFrame, t2tc: DataFrame, xtype: str
) -> DataFrame:
    """(value, protein_id) lookup over BOTH xref branches — protein-
    attached rows directly, target-attached rows through t2tc — the
    two-branch union of find_targets_by_xref (`loaders/TCRD.py:
    2300-2353`)."""
    xr = xref.filter(F.col("xtype") == xtype)
    via_protein = xr.filter(F.col("protein_id").isNotNull()).select(
        "value", "protein_id"
    )
    via_target = (
        xr.filter(F.col("target_id").isNotNull())
        .select("value", "target_id")          # drop xref's own protein_id
        .join(t2tc, "target_id")
        .select("value", "protein_id")
    )
    return via_protein.unionByName(via_target).distinct()


def load_animal_tfdb(
    spark: SparkSession,
    tsv_path: str,
    protein: DataFrame,
    xref: DataFrame,
    t2tc: DataFrame,
    target: DataFrame,
) -> AnimalTfdbLoad:
    """AnimalTFDB HsTFList TSV → boolean 'Is Transcription Factor'
    tdl_infos (`loaders/load-AnimalTFDB.py:88-118`).

    Row layout (family, ensg, geneid, sym); resolution chain
    sym → geneid → Ensembl xref (`:94-100`). All matches kept (the
    reference takes targets[0] per line; at set level every resolved
    protein gets exactly one distinct flag row). The per-TDL tally the
    loader prints (`:129-130`) comes back as a DataFrame."""
    raw = spark.read.csv(
        tsv_path, sep="\t",
        schema="family string, ensg string, geneid string, sym string",
    )
    plook = protein.select(
        "id", "sym", F.col("geneid").cast("string").alias("geneid"),
    )
    r1 = resolve(raw, plook, [("sym", "sym"), ("geneid", "geneid")],
                 id_col="id", out_col="protein_id")
    xlook = xref_protein_lookup(xref, t2tc, "Ensembl")
    r2 = resolve(r1.unresolved, xlook, [("ensg", "value")],
                 id_col="protein_id", out_col="protein_id")
    hits = r1.resolved.select("protein_id").unionByName(
        r2.resolved.select("protein_id")
    ).distinct()
    infos = hits.select(
        "protein_id", F.lit(TF_ITYPE).alias("itype"),
        F.lit(True).alias("boolean_value"),
    )
    tally = (
        hits.join(t2tc, "protein_id")
        .join(target.select(F.col("id").alias("target_id"), "tdl"),
              "target_id")
        .groupBy("tdl").agg(F.count("*").alias("ct"))
    )
    return AnimalTfdbLoad(tdl_info=infos, tdl_counts=tally,
                          notfnd=r2.unresolved)


# --------------------------------------------------- Antibodypedia list

AB_ITYPE, MAB_ITYPE, ABURL_ITYPE = (
    "Ab Count", "MAb Count", "Antibodypedia.com URL"
)


def load_antibodypedia_list(
    spark: SparkSession, list_path: str, payload: DataFrame
) -> DataFrame:
    """Antibodypedia counts keyed by an explicit `uniprot<SP>tid`
    worklist (`loaders/load-AntibodypediaList.py:68-83`): the protein
    id comes from the list file, not a lookup. `payload` is the
    ingest-shimmed API response frame (uniprot, num_antibodies,
    ab_type_monoclonal, url); a missing monoclonal field counts as 0
    (`:122-125`). Emits the same three tdl_info rows per protein as
    load-Antibodypedia (`:114-132`)."""
    wl = spark.read.csv(
        list_path, sep=" ",
        schema="uniprot string, protein_id long",
    )
    j = wl.join(F.broadcast(payload), "uniprot", "inner")
    ab = j.select(
        "protein_id", F.lit(AB_ITYPE).alias("itype"),
        F.col("num_antibodies").cast("int").alias("integer_value"),
        F.lit(None).cast("string").alias("string_value"),
    )
    mab = j.select(
        "protein_id", F.lit(MAB_ITYPE).alias("itype"),
        F.coalesce(F.col("ab_type_monoclonal").cast("int"), F.lit(0))
        .alias("integer_value"),
        F.lit(None).cast("string").alias("string_value"),
    )
    url = j.filter(F.col("url").isNotNull()).select(
        "protein_id", F.lit(ABURL_ITYPE).alias("itype"),
        F.lit(None).cast("int").alias("integer_value"),
        F.col("url").alias("string_value"),
    )
    return ab.unionByName(mab).unionByName(url)


# -------------------------------------------------- Drug Target Ontology

_OWL_NS = {
    "owl": "http://www.w3.org/2002/07/owl#",
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "obo": "http://purl.obolibrary.org/obo/",
}


def _uri_to_id(uri: str | None) -> str | None:
    if not uri:
        return None
    tail = uri.rsplit("/", 1)[-1].rsplit("#", 1)[-1]
    return tail.replace("_", ":", 1)


def parse_dto_owl(owl_xml: str) -> list[dict]:
    """OWL/RDF-XML → [{dtoid, name, parent_id, def}] — what pronto
    hands the reference per term (`loaders/load-DTO.py:50-66`): id,
    name, FIRST parent, and the []-stripped definition."""
    root = ET.fromstring(owl_xml)
    out: list[dict] = []
    for cls in root.iter(f"{{{_OWL_NS['owl']}}}Class"):
        dtoid = _uri_to_id(cls.get(f"{{{_OWL_NS['rdf']}}}about"))
        if not dtoid:
            continue
        label = cls.find("rdfs:label", _OWL_NS)
        parent = None
        for sub in cls.findall("rdfs:subClassOf", _OWL_NS):
            res = sub.get(f"{{{_OWL_NS['rdf']}}}resource")
            if res:
                parent = _uri_to_id(res)
                break
        defn = cls.find("obo:IAO_0000115", _OWL_NS)
        out.append({
            "dtoid": dtoid,
            "name": label.text if label is not None else None,
            "parent_id": parent,
            "def": (defn.text.lstrip("[").rstrip("]")
                    if defn is not None and defn.text else None),
        })
    return out


def dto_terms(spark: SparkSession, owl_xml: str) -> DataFrame:
    """DTO OWL document → dto table rows (`loaders/load-DTO.py:
    156-170` ins_dto loop). Ontology documents are single small XML
    files (~17k classes); the parse happens once, not per row."""
    return spark.createDataFrame(
        parse_dto_owl(owl_xml),
        "dtoid string, name string, parent_id string, def string",
    )


@dataclass
class DtoApply:
    protein: DataFrame       # with dtoid/dtoclass filled
    notfnd_ids: DataFrame    # mapping uniprots with no protein
    notfnd_class: DataFrame  # classification uniprots outside the map


def apply_dto_classifications(
    spark: SparkSession,
    mapping_path: str,
    class_path: str,
    protein: DataFrame,
) -> DtoApply:
    """DTO mapping CSV (dtoid, uniprot) → protein.dtoid; classification
    CSV (uniprot, dto_class) → protein.dtoclass
    (`loaders/load-DTO.py:69-155`). The classification pass only
    applies to uniprots that resolved in the mapping pass — the
    reference's up2pid dict (`:137-140`) — so an unmapped uniprot in
    the class file lands in notfnd_class even if the protein exists."""
    mapping = spark.read.csv(
        mapping_path, header=True, schema="dtoid string, uniprot string"
    )
    classes = spark.read.csv(
        class_path, header=True, schema="uniprot string, dto_class string"
    )
    known = protein.select(F.col("uniprot").alias("_up"))
    notfnd_ids = mapping.join(
        known, mapping["uniprot"] == known["_up"], "left_anti"
    )
    mapped = F.broadcast(
        mapping.join(known, mapping["uniprot"] == known["_up"], "left_semi")
    )
    notfnd_class = classes.join(
        mapped.select("uniprot"), "uniprot", "left_anti"
    )
    cls_mapped = F.broadcast(
        classes.join(mapped.select("uniprot"), "uniprot", "left_semi")
    )
    m = mapped.select(F.col("uniprot").alias("_mu"),
                      F.col("dtoid").alias("_dtoid"))
    c = cls_mapped.select(F.col("uniprot").alias("_cu"),
                          F.col("dto_class").alias("_dtoclass"))
    out = (
        protein.join(m, protein["uniprot"] == m["_mu"], "left")
        .join(c, protein["uniprot"] == c["_cu"], "left")
        .withColumn("dtoid", F.coalesce("_dtoid", "dtoid"))
        .withColumn("dtoclass", F.coalesce("_dtoclass", "dtoclass"))
        .drop("_mu", "_dtoid", "_cu", "_dtoclass")
    )
    return DtoApply(protein=out, notfnd_ids=notfnd_ids,
                    notfnd_class=notfnd_class)


# ---------------------------------------------------- Drugable Epigenome

EPI_ITYPE = "Drugable Epigenome Class"


@dataclass
class EpigenomeLoad:
    tdl_info: DataFrame
    notfnd: DataFrame


def load_druggable_epigenome(
    spark: SparkSession,
    files: dict[tuple[str, str], str],
    protein: DataFrame,
) -> EpigenomeLoad:
    """Nature-RDD druggable-epigenome supplement CSVs → string
    'Drugable Epigenome Class' tdl_infos
    (`loaders/load-DrugableEpigenomeTDLInfos.py:98-140`).

    `files` maps (class, domain) — the reference's FILE_LIST nesting
    (`:43-53`) — to a CSV path. Row layout sym,?,uniprot,geneid[,dom4,
    dom5]; resolution chain sym → geneid → uniprot (`:116-121`).
    5-column files annotate "Epigenetic <class> - <domain>"; 6-column
    files append " <col4>: <col5>" (`:129-132`)."""
    plook = protein.select(
        "id", "sym", F.col("geneid").cast("string").alias("geneid"),
        "uniprot",
    )
    infos = None
    notfnd = None
    for (klass, domain), path in sorted(files.items()):
        raw = spark.read.csv(path, header=True)
        cols = raw.columns
        df = raw.select(
            F.col(cols[0]).alias("sym"),
            F.col(cols[2]).alias("uniprot"),
            F.col(cols[3]).alias("geneid"),
            *([
                F.col(cols[4]).alias("c4"), F.col(cols[5]).alias("c5"),
            ] if len(cols) >= 6 else []),
        )
        res = resolve(
            df, plook,
            [("sym", "sym"), ("geneid", "geneid"), ("uniprot", "uniprot")],
            id_col="id", out_col="protein_id",
        )
        base = F.lit(f"Epigenetic {klass} - {domain}")
        val = (
            F.concat(base, F.lit(" "), F.col("c4"), F.lit(": "), F.col("c5"))
            if len(cols) >= 6 else base
        )
        part = res.resolved.select(
            "protein_id", F.lit(EPI_ITYPE).alias("itype"),
            val.alias("string_value"),
        )
        nf = res.unresolved.select("sym", "uniprot", "geneid")
        infos = part if infos is None else infos.unionByName(part)
        notfnd = nf if notfnd is None else notfnd.unionByName(nf)
    return EpigenomeLoad(tdl_info=infos, notfnd=notfnd)


# ----------------------------------------------------------- IDG families


def load_idg_fams(
    spark: SparkSession,
    csv_path: str,
    target: DataFrame,
    protein: DataFrame,
    t2tc: DataFrame,
) -> DataFrame:
    """IDG family/extended-family designations → target.fam/famext
    (`loaders/load-IDGFams.py:65-99`). Rows with an empty fam are
    skipped (`:75-76`); targets whose fam is already set keep it —
    load-IDGList owns IDG-target fams (`:86-89`) — and famext is only
    written for those same updated targets (`:96-98`)."""
    raw = spark.read.csv(
        csv_path, header=True,
        schema="c0 string, c1 string, uniprot string, fam string, "
               "famext string",
    ).filter(F.col("fam").isNotNull() & (F.trim("fam") != ""))
    lk = F.broadcast(
        protein.join(t2tc, protein["id"] == t2tc["protein_id"])
        .select("target_id", F.col("uniprot").alias("_up"))
    )
    upd = raw.join(lk, raw["uniprot"] == lk["_up"], "inner").select(
        "target_id",
        F.trim("fam").alias("_fam"),
        F.when(F.trim("famext") != "", F.trim("famext")).alias("_famext"),
    )
    t = target.join(
        F.broadcast(upd), target["id"] == upd["target_id"], "left"
    )
    # IDG targets (fam already set) keep both values; evaluate the
    # guard BEFORE the fam column is rewritten
    t = t.withColumn("_keep", F.col("fam").isNotNull())
    return (
        t.withColumn(
            "fam", F.when(F.col("_keep"), F.col("fam")).otherwise(F.col("_fam"))
        )
        .withColumn(
            "famext",
            F.when(F.col("_keep"), F.col("famext")).otherwise(
                F.coalesce("_famext", "famext")
            ),
        )
        .drop("target_id", "_fam", "_famext", "_keep")
    )


# ---------------------------------------------------------------- IDGevol


def load_idg_evol(
    spark: SparkSession, files: list[tuple[int, str]]
) -> DataFrame:
    """Per-version IDG eligibility CSV exports → idg_evol rows
    (`loaders/load-IDGevol.py:43-84`). Each file carries one TCRD
    version tag; MySQL-export '\\N' geneids become NULL (`:72-73`)."""
    out = None
    for ver, path in files:
        df = spark.read.csv(
            path,
            schema="tcrd_dbid long, name string, description string, "
                   "uniprot string, sym string, geneid string, "
                   "tdl string, fam string",
        ).select(
            F.lit(ver).cast("int").alias("tcrd_ver"),
            "tcrd_dbid", "name", "description", "uniprot", "sym",
            F.when(F.col("geneid") != "\\N", F.col("geneid"))
            .cast("long").alias("geneid"),
            "tdl", "fam",
        )
        out = df if out is None else out.unionByName(df)
    return out


# -------------------------------------------------------- IMPC mouse data

IMPC_STATUS_ITYPE, IMPC_CLONES_ITYPE = "IMPC Status", "IMPC Clones"


@dataclass
class ImpcMiceLoad:
    tdl_info: DataFrame
    notfnd: DataFrame
    skipped: int             # resolved rows with neither status nor clones


def load_impc_mice(
    spark: SparkSession,
    csv_path: str,
    protein: DataFrame,
    xref: DataFrame,
    t2tc: DataFrame,
) -> ImpcMiceLoad:
    """IMPC mouse-clone worklist CSV → 'IMPC Status' / 'IMPC Clones'
    string tdl_infos (`loaders/load-IMPCMiceTDLInfos.py:88-131`).

    Gene symbols are upper-cased before the sym lookup (`:94`), with
    an 'MGI ID' xref fallback (`:96-97`); rows carrying neither a
    status nor a clone count are skipped (`:101-103`); a missing
    status with clones present becomes '?' (`:106-109`); clones emit
    only when non-empty (`:118-121`). All matching targets receive
    rows (`:104-125` loops over targets), which resolve()'s fan-out
    reproduces."""
    raw = spark.read.csv(csv_path, header=True).select(
        F.upper(F.col("Gene")).alias("sym"),
        F.col("MGI Accession").alias("mgi"),
        F.col("Status").alias("status"),
        F.col("`# Clones`").alias("clones"),
    )
    r1 = resolve(raw, protein.select("id", "sym"), [("sym", "sym")],
                 id_col="id", out_col="protein_id")
    xlook = xref_protein_lookup(xref, t2tc, "MGI ID")
    r2 = resolve(r1.unresolved, xlook, [("mgi", "value")],
                 id_col="protein_id", out_col="protein_id")
    hits = r1.resolved.select("protein_id", "status", "clones").unionByName(
        r2.resolved.select("protein_id", "status", "clones")
    )
    empty = (F.col("status").isNull() | (F.col("status") == "")) & (
        F.col("clones").isNull() | (F.col("clones") == "")
    )
    skipped = hits.filter(empty).count()
    kept = hits.filter(~empty)
    status = kept.select(
        "protein_id", F.lit(IMPC_STATUS_ITYPE).alias("itype"),
        F.when(
            F.col("status").isNull() | (F.col("status") == ""), "?"
        ).otherwise(F.col("status")).alias("string_value"),
    )
    clones = kept.filter(
        F.col("clones").isNotNull() & (F.col("clones") != "")
    ).select(
        "protein_id", F.lit(IMPC_CLONES_ITYPE).alias("itype"),
        F.col("clones").alias("string_value"),
    )
    return ImpcMiceLoad(
        tdl_info=status.unionByName(clones),
        notfnd=r2.unresolved, skipped=skipped,
    )


# ------------------------------------------------------------------ TMHMM

TMHMM_ITYPE = "TMHMM Prediction"


def tmhmm_fasta(protein: DataFrame, t2tc: DataFrame) -> DataFrame:
    """Per-target fasta text for the external TMHMM binary
    (`loaders/load-TMHMM_Predictions.py:86-89` builds
    '>tid|name description\\nseq\\n' per target). Running the binary is
    tool orchestration (ingest shim), not engine work; this is the
    prep half."""
    return protein.join(t2tc, protein["id"] == t2tc["protein_id"]).select(
        "protein_id",
        F.concat(
            F.lit(">"), F.col("target_id").cast("string"), F.lit("|"),
            F.col("name"), F.lit(" "), F.col("description"),
            F.lit("\n"), F.col("seq"), F.lit("\n"),
        ).alias("fasta"),
    )


def tmhmm_tdl_infos(predictions: DataFrame) -> DataFrame:
    """TMHMM short-format outputs → 'TMHMM Prediction' tdl_infos
    (`loaders/load-TMHMM_Predictions.py:79,99-104`): extract
    PredHel=<n>, keep only proteins with at least one predicted helix,
    store the full short output as the string value."""
    pred = predictions.withColumn(
        "_predhel", F.regexp_extract("output", r"PredHel=(\d+)", 1)
    )
    return pred.filter(
        (F.col("_predhel") != "") & (F.col("_predhel") != "0")
    ).select(
        "protein_id", F.lit(TMHMM_ITYPE).alias("itype"),
        F.col("output").alias("string_value"),
    )
