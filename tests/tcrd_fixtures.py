"""Small deterministic TCRD-shaped lake for API/analytics tests
(SURVEY.md §5: the rebuild authors its own correctness harness)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from tcrd_spark.schema.tables import TABLE_SCHEMAS


def _df(spark: SparkSession, table: str, rows: list[dict]) -> DataFrame:
    from decimal import Decimal

    from pyspark.sql.types import DecimalType

    schema = TABLE_SCHEMAS[table]
    dec_cols = {f.name for f in schema.fields if isinstance(f.dataType, DecimalType)}

    def conv(c, v):
        if c in dec_cols and v is not None:
            return Decimal(str(v))
        return v

    cols = [f.name for f in schema.fields]
    data = [tuple(conv(c, r.get(c)) for c in cols) for r in rows]
    return spark.createDataFrame(data, schema)


_LAKE_CACHE: dict[int, dict[str, DataFrame]] = {}


def build_lake(spark: SparkSession) -> dict[str, DataFrame]:
    """6 targets exercising every TDL branch and both xref branches.

    Memoized per session (the ~80 createDataFrame calls dominate
    several test modules' setup); callers receive a shallow copy so
    reassigning keys never leaks across tests — the DataFrames
    themselves are immutable."""
    key = id(spark)
    if key not in _LAKE_CACHE:
        _LAKE_CACHE[key] = _build_lake(spark)
    return dict(_LAKE_CACHE[key])


def _build_lake(spark: SparkSession) -> dict[str, DataFrame]:
    targets = [
        dict(id=i, name=f"T{i}", ttype="Single Protein", idg=False)
        for i in range(1, 7)
    ]
    proteins = [
        dict(id=10 + i, name=f"P{i}", description=f"protein {i}",
             uniprot=f"U{i:05d}", sym=f"SYM{i}",
             geneid=100 + i, stringid=f"9606.ENSP{i:08d}")
        for i in range(1, 7)
    ]
    proteins[0]["dtoid"] = "DTO:101"
    proteins[0]["dtoclass"] = "Kinase"
    t2tc = [dict(target_id=i, protein_id=10 + i) for i in range(1, 7)]

    # T1: MoA drug -> Tclin ; T2: non-MoA drug -> Tchem ;
    # T3: cmpd activity -> Tchem ; T4: 2 dark points -> Tdark ;
    # T5: dark + efl goa -> Tbio bumped ; T6: rich -> Tbio
    drug_activity = [
        dict(id=1, target_id=1, drug="moadrug", has_moa=True),
        dict(id=2, target_id=2, drug="plaindrug", has_moa=False),
    ]
    cmpd_activity = [
        dict(id=1, target_id=3, catype="ChEMBL", cmpd_id_in_src="C1"),
    ]
    info_type = [
        dict(name="JensenLab PubMed Score", data_type="Number"),
        dict(name="Ab Count", data_type="Integer"),
        dict(name="Experimental MF/BP Leaf Term GOA", data_type="Boolean"),
        dict(name="UniProt Function", data_type="String"),
        dict(name="MAb Count", data_type="Integer"),
        dict(name="NCBI Gene PubMed Count", data_type="Integer"),
        dict(name="Is Transcription Factor", data_type="Boolean"),
        dict(name="TMHMM Prediction", data_type="String"),
        dict(name="HPA Tissue Specificity Index", data_type="Number"),
        dict(name="EBI Total Patent Count", data_type="Integer"),
        dict(name="ChEMBL Selective Compound", data_type="String"),
        dict(name="ChEMBL First Reference Year", data_type="Integer"),
    ]
    tdl_info = []
    iid = 0
    for i in range(1, 7):
        pid = 10 + i
        pms = 2.0 if i in (4, 5) else 99.0
        ab = 10 if i in (4, 5) else 300
        iid += 1
        tdl_info.append(
            dict(id=iid, itype="JensenLab PubMed Score", protein_id=pid,
                 number_value=pms)
        )
        iid += 1
        tdl_info.append(
            dict(id=iid, itype="Ab Count", protein_id=pid, integer_value=ab)
        )
    tdl_info.append(
        dict(id=98, itype="Experimental MF/BP Leaf Term GOA",
             protein_id=15, boolean_value=True)
    )
    tdl_info.append(
        dict(id=99, itype="UniProt Function", protein_id=16,
             string_value="does things")
    )
    # annotation infos for the expanded export (P11 / target 1 rich)
    tdl_info += [
        dict(id=200, itype="MAb Count", protein_id=11, integer_value=7),
        dict(id=201, itype="NCBI Gene PubMed Count", protein_id=11,
             integer_value=42),
        dict(id=202, itype="Is Transcription Factor", protein_id=11,
             boolean_value=True),
        dict(id=203, itype="TMHMM Prediction", protein_id=11,
             string_value="len=500 ExpAA=44 First60=0.1 PredHel=2 Topology=i"),
        dict(id=204, itype="HPA Tissue Specificity Index", protein_id=11,
             number_value=0.82),
        dict(id=205, itype="EBI Total Patent Count", protein_id=11,
             integer_value=13),
        # target-attached EAV rows (get_target :1890-1900)
        dict(id=206, itype="ChEMBL Selective Compound", target_id=1,
             string_value="CHEMBL123:9.1"),
        dict(id=207, itype="ChEMBL First Reference Year", target_id=1,
             integer_value=1999),
    ]
    generif = [
        dict(id=i, protein_id=10 + i, text=f"rif {i}")
        for i in range(1, 7)
        for _ in range(1)
    ]
    # give T6 many generifs so it has > 3
    generif += [
        dict(id=100 + k, protein_id=16, text=f"extra {k}") for k in range(5)
    ]
    xref = [
        dict(id=1, xtype="Ensembl", target_id=1, value="ENSG000001",
             dataset_id=1),
        dict(id=2, xtype="Ensembl", protein_id=11, value="ENSG000001",
             dataset_id=1),  # same value through the protein branch
        dict(id=3, xtype="Ensembl", protein_id=12, value="ENSG000002",
             dataset_id=1),
        dict(id=4, xtype="HGNC", protein_id=13, value="HGNC:3", dataset_id=1),
        dict(id=5, xtype="PDB", protein_id=11, value="1ABC", dataset_id=1),
        dict(id=6, xtype="PDB", protein_id=11, value="2XYZ", dataset_id=1),
    ]
    alias = [
        dict(id=1, protein_id=11, type="symbol", value="ALIAS1", dataset_id=1),
        dict(id=2, protein_id=12, type="uniprot", value="U-OLD-2", dataset_id=1),
    ]
    goa = [
        dict(id=1, protein_id=11, go_id="GO:1", go_term="F:kinase"),
        dict(id=2, protein_id=11, go_id="GO:2", go_term="P:signaling"),
    ]
    expression = [
        dict(id=1, etype="HPA", protein_id=11, tissue="liver",
             qual_value="High"),
        dict(id=2, etype="HPA", protein_id=11, tissue="brain",
             qual_value="Low"),
    ]
    disease = [
        dict(id=1, dtype="JensenLab Knowledge", target_id=1, name="dz-low",
             zscore=1.0),
        dict(id=2, dtype="JensenLab Knowledge", target_id=1, name="dz-high",
             zscore=5.0),
        dict(id=3, dtype="JensenLab Knowledge", target_id=1, name="dz-mid",
             zscore=3.0),
    ]
    pathway = [
        dict(id=1, protein_id=11, pwtype="KEGG", name="pw1"),
    ]
    ppi = []
    pmscore = [
        dict(id=1, protein_id=11, year=2019, score=1.5),
        dict(id=2, protein_id=11, year=2020, score=2.5),
    ]
    dataset = [dict(id=1, name="fixture", source="synthetic")]
    provenance = [
        dict(id=1, dataset_id=1, table_name="xref", column_name=None)
    ]

    # annotation families feeding the widened target document / export
    phenotype = [
        dict(id=1, ptype="OMIM", protein_id=11, trait="trait-A"),
        dict(id=2, ptype="OMIM", protein_id=11, trait="trait-B"),
        dict(id=3, ptype="JAX/MGI Human Ortholog Phenotype",
             protein_id=11, term_id="MP:1", term_name="odd gait"),
        dict(id=4, ptype="IMPC", protein_id=11, term_id="MP:2",
             term_name="short tail"),
    ]
    ortholog = [
        dict(id=1, protein_id=11, taxid=10090, species="Mouse",
             geneid=55, symbol="Sym1", name="p one",
             sources="MGI"),
    ]
    gwas = [
        dict(id=1, protein_id=11, disease_trait="Height", pmid=123,
             p_value=5e-8, mapped_trait_uri="EFO:1"),
    ]
    feature = [
        dict(id=1, protein_id=11, type="DOMAIN",
             description="kinase dom", begin=10, end=120),
        dict(id=2, protein_id=11, type="ACT_SITE", position=57),
    ]
    panther_class = [
        dict(id=1, pcid="PC00001", name="kinase"),
        dict(id=2, pcid="PC00002", name="receptor"),
    ]
    p2pc = [
        dict(protein_id=11, panther_class_id=1),
        dict(protein_id=11, panther_class_id=2),
    ]
    patent_count = [
        dict(id=1, protein_id=11, year=2019, count=3),
        dict(id=2, protein_id=11, year=2020, count=4),
    ]
    compartment = [
        dict(id=1, ctype="JensenLab Knowledge", protein_id=11,
             go_id="GO:5", go_term="C:nucleus"),
    ]
    mlp_assay_info = [
        dict(id=1, protein_id=11, assay_name="assay one", method="summary",
             total_sids=100),
    ]
    protein2pubmed = [
        dict(protein_id=11, pubmed_id=1),
        dict(protein_id=11, pubmed_id=2),
    ]
    pubmed = [
        dict(id=1, title="paper one"),
        dict(id=2, title="paper two"),
    ]
    gene_attribute_type = [
        dict(id=1, name="CCLE Cell Line Gene Expression Profiles",
             association="gene-cell line associations"),
    ]
    gene_attribute = [
        dict(id=k, protein_id=11, gat_id=1, name=f"attr{k}", value=1)
        for k in range(1, 4)
    ]
    tinx_novelty_rows = [dict(id=1, protein_id=11, score=0.123456)]
    tinx_disease = [
        dict(id=1, doid="DOID:1", name="lung cancer", score=1.0),
        dict(id=2, doid="DOID:2", name="asthma", score=2.0),
        dict(id=3, doid="DOID:3", name="cancer", score=3.0),  # bad_diseases
    ]
    tinx_importance = [
        dict(id=1, protein_id=11, disease_id=1, score=5.5),
        dict(id=2, protein_id=11, disease_id=2, score=9.5),
        dict(id=3, protein_id=11, disease_id=3, score=99.0),  # filtered
    ]
    kegg_nearest_tclin = [
        dict(id=1, protein_id=11, tclin_id=12, direction="downstream",
             distance=2),
        # protein 12 survives del_target(1) but its nearest Tclin is
        # protein 11 — exercises the tclin_id cascade edge
        dict(id=2, protein_id=12, tclin_id=11, direction="upstream",
             distance=3),
        dict(id=3, protein_id=13, tclin_id=12, direction="upstream",
             distance=1),
    ]
    kegg_distance = [
        dict(id=1, pid1=11, pid2=12, distance=2),
        dict(id=2, pid1=12, pid2=13, distance=1),
        dict(id=3, pid1=13, pid2=11, distance=3),
    ]
    tdl_update_log = [
        dict(id=1, target_id=1, old_tdl="Tbio", new_tdl="Tchem",
             person="loader", datetime="2019-08-27 10:00:00",
             explanation="drug gained", application="load-TDLs.py",
             app_version="3.0.0"),
        dict(id=2, target_id=1, old_tdl="Tchem", new_tdl="Tclin",
             person="loader", datetime="2020-08-27 10:00:00",
             explanation="MoA drug approved", application="load-TDLs.py",
             app_version="4.0.0"),
        dict(id=3, target_id=2, old_tdl="Tdark", new_tdl="Tbio",
             person="loader", datetime="2020-08-27 10:00:00",
             explanation=None, application="load-TDLs.py",
             app_version="4.0.0"),
    ]
    # TCRDMP read-surface tables
    nhprotein = [
        dict(id=1, uniprot="QM1", name="TRP53_MOUSE", sym="Trp53",
             species="Mus musculus", taxid=10090, geneid=22059),
        dict(id=2, uniprot="QR1", name="KIT_RAT", sym="Kit",
             species="Rattus norvegicus", taxid=10116, geneid=64030),
    ]
    gtex = [
        dict(id=1, protein_id=11, tissue="Liver", tpm=12.5,
             tpm_level="High", uberon_id="UBERON:0002107"),
        dict(id=2, protein_id=12, tissue="Brain", tpm=1.5,
             tpm_level="Low", uberon_id="UBERON:0000955"),
    ]
    clinvar_phenotype = [dict(id=1, name="Lynch syndrome")]
    clinvar = [
        dict(id=1, protein_id=11, clinvar_phenotype_id=1, alleleid=15041,
             type="single nucleotide variant",
             clinical_significance="Pathogenic"),
    ]
    uberon = [
        dict(uid="UBERON:0002107", name="liver"),
        dict(uid="UBERON:0000955", name="brain"),
    ]
    uberon_xref = [
        dict(uid="UBERON:0002107", db="BTO", value="0000759"),
        dict(uid="UBERON:0000955", db="BTO", value="0000142"),
    ]
    # eRAM + text-mining diseases for the export slices
    disease = disease + [
        dict(id=4, dtype="JensenLab Text Mining", target_id=1,
             name="tm-dz", zscore=4.5),
        dict(id=5, dtype="eRAM", target_id=1, name="eram-dz",
             did="DOID:9", zscore=0.5),
    ]

    rows = dict(
        target=targets, protein=proteins, t2tc=t2tc,
        drug_activity=drug_activity, cmpd_activity=cmpd_activity,
        info_type=info_type, tdl_info=tdl_info, generif=generif,
        xref=xref, alias=alias, goa=goa, expression=expression,
        disease=disease, pathway=pathway, ppi=ppi, pmscore=pmscore,
        dataset=dataset, provenance=provenance,
        phenotype=phenotype, ortholog=ortholog, gwas=gwas,
        feature=feature, panther_class=panther_class, p2pc=p2pc,
        patent_count=patent_count, compartment=compartment,
        mlp_assay_info=mlp_assay_info, protein2pubmed=protein2pubmed,
        pubmed=pubmed, gene_attribute_type=gene_attribute_type,
        gene_attribute=gene_attribute, tinx_novelty=tinx_novelty_rows,
        tinx_disease=tinx_disease, tinx_importance=tinx_importance,
        kegg_nearest_tclin=kegg_nearest_tclin,
        kegg_distance=kegg_distance,
        tdl_update_log=tdl_update_log,
        nhprotein=nhprotein, gtex=gtex, clinvar=clinvar,
        clinvar_phenotype=clinvar_phenotype, uberon=uberon,
        uberon_xref=uberon_xref,
    )
    return {t: _df(spark, t, r) for t, r in rows.items()}
