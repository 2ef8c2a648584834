"""R-preprocess compositions (etl/preprocess_r.py) and the MLP assay
XML source: golden semantics for each reference script's row
accounting."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tcrd_spark.etl.preprocess_r import (
    ctd_direct_evidence,
    hpa_normal_tissue,
    hpm_matrix_pipeline,
    hpm_quartile_levels,
    load_rgd_rows,
    melt_matrix,
    rgd_rat_genes,
    rgd_rat_qtls,
    rgd_rat_terms,
    run_phenotypes,
)


def test_hpm_quartile_levels_golden(spark):
    """R/hpm_level.R quartile rules: logExp quartiles of [0,1,2,3] are
    (q0=0, q25=.75, q75=2.25): 1→Low, 10/100→Medium, 1000→High, 0→Not
    detected; an all-equal key routes positives to High (the 1e-4
    shift)."""
    rows = [("g1", t, v) for t, v in
            [("t1", 0.0), ("t2", 1.0), ("t3", 10.0), ("t4", 100.0),
             ("t5", 1000.0)]] + [("g2", "t1", 10.0), ("g2", "t2", 10.0)]
    long = spark.createDataFrame(
        rows, "gene string, tissue string, expression double"
    )
    got = {
        (r["gene"], r["tissue"]): r["level"]
        for r in hpm_quartile_levels(long, "gene").collect()
    }
    assert got == {
        ("g1", "t1"): "Not detected",
        ("g1", "t2"): "Low",
        ("g1", "t3"): "Medium",
        ("g1", "t4"): "Medium",
        ("g1", "t5"): "High",
        ("g2", "t1"): "High",
        ("g2", "t2"): "High",
    }


def test_hpm_matrix_pipeline(spark):
    """R/hpm_gene.R end-to-end: gather 3 tissue columns, tau per key
    (NA taus dropped), levels drop the empty-key row."""
    m = spark.createDataFrame(
        [("G1", 1.0, 10.0, 100.0), ("", 5.0, 5.0, 5.0),
         ("G2", 0.0, 0.0, 0.0)],
        "gene string, liver double, brain double, heart double",
    )
    assert melt_matrix(m, "gene").count() == 9
    out = hpm_matrix_pipeline(m, "gene")
    taus = {r["gene"]: r["tau"] for r in out.tau.collect()}
    assert "G1" in taus and taus["G1"] > 0
    levels = out.levels
    assert levels.filter(F.col("gene") == "").count() == 0
    assert (
        levels.filter(F.col("gene") == "G2")
        .filter(F.col("level") == "Not detected")
        .count()
        == 3
    )


def test_hpa_normal_tissue_golden(spark):
    """process-HPA.R: tissue digit-strip + cell-type suffix, Uncertain
    dropped, best row per (protein, tissue) by the R ordered factors
    (Approved ranks above Enhanced, High above Low), tau merged on."""
    hpa = spark.createDataFrame(
        [
            # same (protein, tissue) after digit strip — Approved+Low
            # must beat Enhanced+High (R factor order!)
            ("ENSG1", "cortex 1", "neurons", "High", "Enhanced"),
            ("ENSG1", "cortex 2", "neurons", "Low", "Approved"),
            ("ENSG1", "liver", "hepatocytes", "Medium", "Supported"),
            ("ENSG1", "skin", "keratinocytes", "High", "Uncertain"),
            ("ENSGX", "liver", "hepatocytes", "High", "Approved"),
        ],
        "gene string, tissue string, cell_type string, level string,"
        " reliability string",
    )
    xref = spark.createDataFrame([("ENSG1", 7)], "ensg string, protein_id int")
    got = hpa_normal_tissue(hpa, xref)
    rows = {
        (r["tissue"]): (r["level"], r["reliability"])
        for r in got.collect()
    }
    # Uncertain skin row dropped; unresolved ENSGX dropped
    assert rows == {
        "cortex - neurons": ("Low", "Approved"),
        "liver - hepatocytes": ("Medium", "Supported"),
    }
    # tau over level medians {cortex:1, liver:2}: (1-1/2 + 1-2/2)/(2-1)
    taus = {r["gene"]: r["tau"] for r in got.collect()}
    assert taus["ENSG1"] == pytest.approx(0.5)


def test_hpa_tau_variants(spark):
    """hpa_tau_prot.R / hpa_tau_rna.R thin variants: Supportive filter
    + digit collapse; RNA tissue whitelist; ordinal tau math shared
    with hpa_tau.R."""
    from tcrd_spark.etl.preprocess_r import hpa_tau_protein, hpa_tau_rna

    prot = spark.createDataFrame(
        [
            ("G1", "stomach 1", "cells", "High", "Supportive"),
            ("G1", "stomach 2", "cells", "High", "Supportive"),  # same tissue
            ("G1", "liver", "hepatocytes", "Not detected", "Supportive"),
            ("G1", "skin", "cells", "High", "Uncertain"),  # dropped
        ],
        "gene string, tissue string, cell_type string, level string,"
        " reliability string",
    )
    got = {r["gene"]: (r["n_tissues"], r["tau"])
           for r in hpa_tau_protein(prot).collect()}
    # two tissues after collapse: levels {stomach-cells: 3, liver-hep: 0}
    # tau = (1-3/3 + 1-0/3)/(2-1) = 1.0
    assert got == {"G1": (2, 1.0)}

    rna = spark.createDataFrame(
        [
            ("G1", "liver", "High"),
            ("G1", "kidney", "Low"),
            ("G1", "not a tissue", "High"),  # outside whitelist
        ],
        "gene string, sample string, abundance string",
    )
    got = {r["gene"]: (r["n_tissues"], round(r["tau"], 4))
           for r in hpa_tau_rna(rna).collect()}
    # levels {liver:3, kidney:1}: tau = (1-3/3 + 1-1/3)/(2-1) = 2/3
    assert got == {"G1": (2, round(2 / 3, 4))}


def test_ctd_direct_evidence(spark):
    ctd = spark.createDataFrame(
        [
            ("BRCA1", 672, "Breast cancer", "MESH:D001943", "marker", "1,2"),
            ("TP53", 7157, "LFS", "OMIM:151623", "marker", ""),
            # a second ':' in the id — tstrsplit keeps only the first
            # two fields, so the id must be '151623', not '151623:x'
            # (ADVICE r5 #4 regression)
            ("MYC", 4609, "Tail id", "OMIM:190080:x", "marker", "4"),
            ("KRAS", 3845, "Inferred only", "MESH:D002277", None, "9"),
            ("EGFR", 1956, "Odd source", "DOID:42", "marker", "3"),
        ],
        "gene_symbol string, gene_id long, disease_name string,"
        " disease_id string, direct_evidence string, pubmed_ids string",
    )
    mesh = spark.createDataFrame(
        [("D001943", "DOID:1612"), ("D001943", "DOID:0001")],
        "xref string, doid string",
    )
    omim = spark.createDataFrame([], "xref string, doid string")
    got = {
        r["gene_symbol"]: (r["disease_id_source"], r["disease_id"],
                           r["doid"], r["pubmed_ids"])
        for r in ctd_direct_evidence(ctd, mesh, omim).collect()
    }
    # KRAS (no direct evidence) and EGFR (non-MESH/OMIM source) dropped;
    # duplicate map rows dedup to min doid; empty pubmed → NULL
    assert got == {
        "BRCA1": ("MESH", "D001943", "DOID:0001", "1,2"),
        "TP53": ("OMIM", "151623", None, None),
        "MYC": ("OMIM", "190080", None, "4"),
    }


@pytest.fixture()
def rgd_frames(spark):
    genes = spark.createDataFrame(
        [(100, "P1;P2"), (200, "P3"), (300, None)],
        "gene_rgd_id long, uniprot_id string",
    )
    qtls = spark.createDataFrame(
        [
            (1, "Q1", "QTL one", "2.5", "0.001", "trait A", "mt",
             "disease X", "100;200", "SymA;SymB", "pheno1;pheno2"),
            (2, "Q2", "QTL two", "None", "None", None, None,
             None, "999", "SymZ", "p"),  # candidate not in gene set
            (3, "Q3", "QTL three", None, None, None, None,
             None, None, None, "p"),     # no candidates: dropped
        ],
        "qtl_rgd_id long, qtl_symbol string, qtl_name string, lod string,"
        " p_value string, trait_name string, measurement_type string,"
        " associated_diseases string, candidate_gene_rgd_ids string,"
        " candidate_gene_symbols string, phenotypes string",
    )
    nh = spark.createDataFrame(
        [(11, "P1", 10116), (12, "P3", 10116), (13, "P1", 9606)],
        "id long, uniprot string, taxid long",
    )
    return genes, qtls, nh


def test_rgd_rat_qtls(spark, rgd_frames):
    genes, qtls, nh = rgd_frames
    assert rgd_rat_genes(genes).count() == 3  # P1, P2, P3
    got = rgd_rat_qtls(genes, qtls, nh)
    rows = {
        (r["nhprotein_id"], r["gene_rgd_id"], r["phenotype"])
        for r in got.collect()
    }
    # QTL1 candidates 100 (→P1,P2: only P1 is a rat nhprotein → 11)
    # and 200 (→P3 → 12), each × 2 phenotypes; taxid 9606 excluded
    assert rows == {
        (11, 100, "pheno1"), (11, 100, "pheno2"),
        (12, 200, "pheno1"), (12, 200, "pheno2"),
    }
    # lockstep candidate/symbol split
    syms = {r["gene_rgd_id"]: r["candidate_gene_symbol"]
            for r in got.collect()}
    assert syms == {100: "SymA", 200: "SymB"}


def test_rgd_rat_terms_and_load_rows(spark, rgd_frames):
    genes, qtls, nh = rgd_frames
    terms = spark.createDataFrame(
        [
            (100, "gene", "Abc", "DOID:1", "t1", None, "IEA"),
            (100, "gene", "Abc", "DOID:1", "t1-dup", None, "ISS"),  # dedup
            (100, "qtl", "Q", "DOID:2", "t2", None, "IEA"),   # not a gene
            (999, "gene", "Zzz", "DOID:3", "t3", None, "IEA"),  # not in set
        ],
        "rgd_id long, object_type string, object_symbol string,"
        " term_acc_id string, term_name string, qualifier string,"
        " evidence string",
    )
    got = rgd_rat_terms(terms, "Disease Ontology", genes).collect()
    assert len(got) == 1
    assert got[0]["term_name"] == "t1" and got[0]["ontology"] == (
        "Disease Ontology"
    )
    qtl_rows, term_rows = load_rgd_rows(
        rgd_rat_qtls(genes, qtls, nh),
        rgd_rat_terms(terms, "Disease Ontology", genes),
    )
    r = qtl_rows.filter(F.col("rgdid") == 100).first()
    assert r["lod"] == 2.5 and float(r["p_value"]) == pytest.approx(0.001)
    assert term_rows.first()["term_id"] == "DOID:1"
    # 'None' strings null out
    assert qtl_rows.schema["p_value"].dataType.simpleString().startswith(
        "decimal"
    )


def test_run_phenotypes_orchestrator(spark, tmp_path):
    """The five-phase load-Phenotypes.py run as one composition —
    every sub-frame lands with the expected golden counts."""
    protein = spark.createDataFrame(
        [(11, "BRCA1", 101), (12, "TP53", 102)],
        "id int, sym string, geneid int",
    )
    nh = spark.createDataFrame(
        [(1, "Trp53", "Mus musculus", "P1", 10116)],
        "id int, sym string, species string, uniprot string, taxid long",
    ).withColumn("species", F.lit("Mus musculus"))
    titles = spark.createDataFrame(
        [("Asterisk", "100100", "ABC; ALPHA")],
        "prefix string, mim string, title_raw string",
    )
    ps = spark.createDataFrame(
        [("PS100", "100100", "series one")],
        "omim_ps_id string, mim string, title string",
    )
    genemap = spark.createDataFrame(
        [("BRCA1", 100100, "Some phenotype (3)")],
        "gene_symbols string, mim long, phenotypes string",
    )
    gwas_rows = spark.createDataFrame(
        [("BRCA1", "Height", "rs1", "123", "s", None, "0", "5e-8",
          "1.1", None, "height", "EFO:1")],
        "mapped_gene string, disease_trait string, snps string,"
        " pubmedid string, study string, context string,"
        " intergenic string, p_value string, or_beta string, cnv string,"
        " mapped_trait string, mapped_trait_uri string",
    )
    impc_rows = spark.createDataFrame(
        [("Trp53", "proc", "param", "MP:0", "top", "MP:1", "short tail",
          "0.001", None, "1.2", "m", "female")],
        "marker_symbol string, procedure_name string, parameter_name"
        " string, top_level_mp_term_id string, top_level_mp_term_name"
        " string, mp_term_id string, mp_term_name string, p_value string,"
        " percentage_change string, effect_size string,"
        " statistical_method string, sex string",
    )
    jax_tsv = tmp_path / "hmd.rpt"
    jax_tsv.write_text("BRCA1\t101\tm1\tx\ty\tz\tMP:0001\n")
    mpo = spark.createDataFrame(
        [("MP:0001", "abnormal gait")], "mpid string, name string"
    )
    genes = spark.createDataFrame(
        [(100, "P1")], "gene_rgd_id long, uniprot_id string"
    )
    qtls = spark.createDataFrame(
        [(1, "Q1", "QTL one", "2.5", "0.001", "t", "mt", "d", "100",
          "SymA", "p1")],
        "qtl_rgd_id long, qtl_symbol string, qtl_name string, lod string,"
        " p_value string, trait_name string, measurement_type string,"
        " associated_diseases string, candidate_gene_rgd_ids string,"
        " candidate_gene_symbols string, phenotypes string",
    )
    terms = spark.createDataFrame(
        [(100, "gene", "Abc", "DOID:1", "t1", None, "IEA")],
        "rgd_id long, object_type string, object_symbol string,"
        " term_acc_id string, term_name string, qualifier string,"
        " evidence string",
    )
    run = run_phenotypes(
        spark,
        omim_inputs=(titles, ps, genemap),
        gwas_rows=gwas_rows,
        impc_rows=impc_rows,
        jax_tsv_path=str(jax_tsv),
        mpo=mpo,
        rgd_inputs=(genes, qtls, [(terms, "Disease Ontology")]),
        protein=protein,
        nhprotein=nh,
    )
    assert run.omim.omim.count() == 1
    assert run.gwas.count() == 1
    assert run.impc.count() == 1
    assert run.jax.phenotype.count() == 1
    assert run.rat_qtl.count() == 1
    assert run.rat_term.count() == 1


def test_mlpassay_xml_parse(spark):
    """python/mlpassay_xml2targets.py:49-62: species splits out of the
    bracketed Name suffix; one row per ProteinTarget."""
    from tcrd_spark.sources.mlpassay_xml import assay_targets_df

    xml = """<eSummaryResult><DocumentSummary>
      <Id>1159535</Id>
      <ProteinTargetList>
        <ProteinTarget>
          <Name>ERAP1 protein [Homo sapiens]</Name>
          <GI>21315078</GI>
          <GeneSymbol>ERAP1</GeneSymbol>
        </ProteinTarget>
        <ProteinTarget>
          <Name>bare name no species</Name>
          <GI>99</GI>
          <GeneSymbol>XYZ</GeneSymbol>
        </ProteinTarget>
      </ProteinTargetList>
    </DocumentSummary></eSummaryResult>"""
    rows = {r["tgt_gi"]: r for r in assay_targets_df(spark, [xml]).collect()}
    assert rows["21315078"]["tgt_species"] == "Homo sapiens"
    assert rows["21315078"]["tgt_name"] == "ERAP1 protein"
    assert rows["21315078"]["aid"] == "1159535"
    assert rows["99"]["tgt_name"] == "bare name no species"
