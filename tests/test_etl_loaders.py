"""End-to-end loader pipelines (FIXTURES.md §B2/B3/B8, hand-computed
expectations per §C conventions)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.tcrd_fixtures import build_lake


@pytest.fixture(scope="module")
def lake(spark):
    return build_lake(spark)


def test_stringdb_loader(spark, lake, tmp_path):
    # B8: header + links; one non-9606 row (skipped), one unknown ENSP
    # (notfnd). Fixture stringids are 9606.ENSP0000000{1..6} → P11..P16.
    links = tmp_path / "links.txt"
    links.write_text(
        "protein1 protein2 combined_score\n"
        "9606.ENSP00000001 9606.ENSP00000002 900\n"
        "9606.ENSP00000002 9606.ENSP00000003 150\n"
        "9606.ENSP00000001 9606.ENSP99999999 400\n"   # unknown endpoint 2
        "10090.ENSMUSP0001 9606.ENSP00000002 500\n"   # non-human: skipped
    )
    from tcrd_spark.etl.loaders import load_stringdb_ppi

    out = load_stringdb_ppi(spark, str(links), lake["protein"])
    edges = {
        (r.protein1_id, r.protein2_id, r.score)
        for r in out.ppi.collect()
    }
    assert edges == {(11, 12, 900.0), (12, 13, 150.0)}
    assert out.notfnd.count() == 1  # the unknown-endpoint row only
    assert out.ppi.schema["ppitype"].dataType.simpleString() == "string"


def test_pmscores_loader(spark, lake, tmp_path):
    # B2: ENSP<TAB>year<TAB>score over 2 proteins; P13..P16 get no rows
    # → zero-filled sums (InsZeroJLPMSs). One unknown ENSP → notfnd.
    tsv = tmp_path / "protein_counts.tsv"
    tsv.write_text(
        "ENSP00000001\t2019\t1.5\n"
        "ENSP00000001\t2020\t2.25\n"
        "ENSP00000002\t2020\t4.0\n"
        "ENSP99999999\t2020\t9.9\n"
    )
    from tcrd_spark.etl.loaders import PMSCORE_ITYPE, load_jensenlab_pmscores

    out = load_jensenlab_pmscores(spark, str(tsv), lake["protein"])
    assert out.pmscore.count() == 3
    assert out.notfnd.count() == 1
    sums = {
        r.protein_id: r.number_value
        for r in out.tdl_info.filter(F.col("itype") == PMSCORE_ITYPE).collect()
    }
    # running sum per protein (load-JensenLabPubMedScores.py:104-131)
    assert sums[11] == pytest.approx(3.75)
    assert sums[12] == pytest.approx(4.0)
    # zero-fill covers EVERY protein in the dimension
    assert set(sums) == {r.id for r in lake["protein"].select("id").collect()}
    assert sums[13] == 0.0


def test_consensus_loader(spark, lake, tmp_path):
    # B5: expression rows over 2 proteins; 'Kidney' missing from the
    # tissue map (skipped); 'liver'/'Liver' merge through lower-casing.
    tmap = tmp_path / "tissues_typed.csv"
    tmap.write_text(
        "tissue,unused,TissueType\n"
        "liver,x,Liver-Typed\n"
        "brain,x,Brain-Typed\n"
    )
    exp = spark.createDataFrame(
        [
            (11, "HPA", "Liver", "High"),
            (11, "HPM Gene", "liver", "High"),
            (11, "HPA", "Brain", "Low"),
            (11, "HPA", "Kidney", "High"),      # unmapped: skipped
            (11, "GTEx", "Liver", "Low"),       # etype not contributing
            (12, "HPM Protein", "Brain", "Medium"),
        ],
        "protein_id int, etype string, tissue string, qual_value string",
    )
    from tcrd_spark.etl.loaders import load_consensus_expressions

    out = load_consensus_expressions(spark, exp, str(tmap))
    rows = {
        (r.protein_id, r.tissue): (r.consensus_name, r.confidence)
        for r in out.collect()
    }
    # two High votes agree → mode High; support 2 → confidence 2
    assert rows[(11, "Liver-Typed")] == ("High", 2)
    # single votes → depth-0/1 rungs of the ladder
    assert rows[(11, "Brain-Typed")][0] == "Low"
    assert rows[(12, "Brain-Typed")][0] == "Medium"
    assert len(rows) == 3


def test_gtex_loader(spark, lake, tmp_path):
    # B3: GCT with 2 skip lines; 2 genes × 4 samples = 2 tissues × 2
    # subjects (one M, one F); one ENSGR row (dropped) and versioned
    # ENSG names (suffix stripped). Medians are over a single value per
    # (gene, tissue, sex) here, so levels are hand-derivable.
    gct = tmp_path / "expr.gct"
    gct.write_text(
        "#1.2\n"
        "3\t4\n"
        "Name\tDescription\tGT-AAA-0001\tGT-AAA-0002\tGT-BBB-0001\tGT-BBB-0002\n"
        "ENSG000001.5\tgeneA\t0.0\t2.0\t4.0\t8.0\n"
        "ENSG000002.1\tgeneB\t1.0\t1.0\t1.0\t1.0\n"
        "ENSGR0000999.1\tpar\t5.0\t5.0\t5.0\t5.0\n"
    )
    attrs = spark.createDataFrame(
        [
            ("GT-AAA-0001", "Liver"),
            ("GT-AAA-0002", "Brain"),
            ("GT-BBB-0001", "Liver"),
            ("GT-BBB-0002", "Brain"),
        ],
        "SAMPID string, SMTSD string",
    )
    phenos = spark.createDataFrame(
        [("GT-AAA", 1), ("GT-BBB", 2)], "SUBJID string, GENDER int"
    )
    # fixture xref: ENSG000001→P11, ENSG000002→P12 (Ensembl rows)
    xref = (
        lake["xref"]
        .filter((F.col("xtype") == "Ensembl") & F.col("protein_id").isNotNull())
        .select("protein_id", "value")
        .dropDuplicates(["value"])
    )
    from tcrd_spark.etl.loaders import load_gtex

    out = load_gtex(spark, str(gct), attrs, phenos, xref)
    rows = {
        (r.protein_id, r.tissue, r.sex): (r.qual_value, r.number_value)
        for r in out.expression.collect()
    }
    # ENSGR dropped; 2 genes × 2 tissues × 2 sexes, both ENSGs resolve
    assert len(rows) == 8
    # geneA M: Liver 0.0 → rank 0 → Not detected; Brain 2.0 → top rank
    assert rows[(11, "Liver", "M")] == ("Not detected", 0.0)
    assert rows[(11, "Brain", "M")][0] == "High"
    # geneB: all-equal nonzero values → average frac rank 0.75 → High
    assert rows[(12, "Liver", "F")][0] == "High"
    taus = {(r.protein_id, r.sex): r.tau for r in out.tau.collect()}
    assert len(taus) == 4
    # 2 tissues → bins 1,2 → tau = (1−1/2 + 1−2/2)/(2−1) = 0.5; ties
    # split across ntile bins per the documented cut2 deviation
    # (analytics/tau.py module docstring), so geneB's equal values give
    # the same 0.5, not 0
    assert taus[(11, "F")] == pytest.approx(0.5)
    assert taus[(12, "M")] == pytest.approx(0.5)


def test_hgram_loader(spark):
    from tcrd_spark.etl.loaders import load_hgram_cdfs

    ga = spark.createDataFrame(
        # type 1: counts 1,2,3 over proteins 11-13 → mu=2, sigma_pop≈0.8165
        [(11, 1)] * 1 + [(12, 1)] * 2 + [(13, 1)] * 3
        # type 2: all counts equal → sigma=0 → logistic fallback
        + [(11, 2)] * 2 + [(12, 2)] * 2,
        "protein_id int, gat_id int",
    )
    gat = spark.createDataFrame(
        [(1, "GO-BP"), (2, "Pathways")], "id int, name string"
    )
    out = {
        (r.protein_id, r.type): r for r in load_hgram_cdfs(ga, gat).collect()
    }
    import math

    r = out[(12, "GO-BP")]
    assert r.attr_count == 2 and r.mu == pytest.approx(2.0)
    assert r.sigma == pytest.approx(math.sqrt(2 / 3), abs=1e-6)
    assert r.attr_cdf == pytest.approx(0.5)         # at the mean
    # σ=0 → NaN in both the CDF and the fallback → the reference never
    # writes the row (load-HGramCDFs.py nan_ct); neither do we
    assert (11, "Pathways") not in out
    assert (12, "Pathways") not in out


def test_expression_atlas_loader(spark, tmp_path):
    from tcrd_spark.etl.loaders import load_expression_atlas

    tsv = tmp_path / "a-analytics.tsv"
    tsv.write_text(
        "gene_id\tgene_name\tcontrast\tp_value\tlog2foldchange\n"
        "ENSG1\tg1\tc1\t0.01\t2.5\n"      # kept
        "ENSG1\tg1\tc2\t0.04\t-1.5\n"     # kept, maps to same DOID → dedup
        "ENSG2\tg2\tc1\t0.2\t3.0\n"       # p too high
        "ENSG3\tg3\tc1\t0.01\t0.5\n"      # |lfc| too small
        "ENSG4\tg4\tcX\t0.01\t2.0\n"      # contrast unmapped → dropped
    )
    contrasts = spark.createDataFrame(
        [("c1", "DOID:7", "dz"), ("c2", "DOID:7", "dz")],
        "contrast string, doid string, disease string",
    )
    rows = load_expression_atlas(spark, str(tsv), contrasts).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.gene_id, r.doid, r.dtype) == ("ENSG1", "DOID:7",
                                            "Expression Atlas")


# ------------------------------------------------------ new loader families

def test_chembl_loader_cutoffs_year_and_selectivity(spark):
    from tcrd_spark.etl.loaders import load_chembl_activities

    targets = spark.createDataFrame(
        [(1, "U1", "GPCR"), (2, "U2", None), (3, "U3", "Kinase")],
        "target_id int, uniprot string, fam string",
    )
    acts = spark.createDataFrame(
        [
            # U1 (GPCR, cutoff 7.0): 7.5 passes, 6.5 fails
            ("U1", "CH1", "c-one", "S1", 7.5, "Ki", 2001, "ref1"),
            ("U1", "CH2", "c-two", "S2", 6.5, "Ki", 1999, "ref2"),
            # U2 (no fam, cutoff 6.0): 6.1 passes
            ("U2", "CH3", "c-three", "S1", 5.4, "IC50", 2005, None),
            # selective pair on S1: 7.5 (t1) vs 5.4 (t2) → diff 2.1 ≥ 2
            ("U3", "CH4", "c-four", "S3", 8.0, "Ki", 2010, None),
            # unresolvable uniprot
            ("U9", "CH9", "c-nine", "S9", 9.0, "Ki", 2011, None),
        ],
        "uniprot string, chembl_id string, cmpd_name string, smiles string,"
        " pchembl_value double, act_type string, year int, reference string",
    )
    out = load_chembl_activities(acts, targets)
    cmpd = {
        (r.target_id, r.cmpd_id_in_src) for r in out.cmpd_activity.collect()
    }
    assert cmpd == {(1, "CH1"), (3, "CH4")}
    years = {r.target_id: r.integer_value for r in out.first_year.collect()}
    assert years == {1: 2001, 3: 2010}
    sel = {
        r.target_id: r.string_value for r in out.selective.collect()
    }
    # S1 is selective (7.5 on t1 vs 5.4 on t2, 2.1 apart); t1's
    # qualifying act on S1 is CH1
    assert sel == {1: "CH1|S1"}
    assert out.notfnd.count() == 1


def test_drugcentral_loader_resolution_cascade(spark):
    from tcrd_spark.etl.loaders import load_drugcentral

    targets = spark.createDataFrame(
        [(1, "U1", "P1"), (2, "U2", "P2")],
        "target_id int, uniprot string, protein_name string",
    )
    acts = spark.createDataFrame(
        [
            ("U1", "nope", "aspirin", 5.0, "Ki", "INHIBITOR", "src",
             None, None, None),
            ("U9", "P2", "drugb", None, None, "AGONIST", "src",
             None, None, None),          # falls back to swissprot name
            ("U9", "P9", "drugc", None, None, None, None,
             None, None, None),          # notfnd
        ],
        "uniprot string, swissprot string, drug string, act_value double,"
        " act_type string, action_type string, source string,"
        " reference string, smiles string, cmpd_chemblid string",
    )
    name2id = spark.createDataFrame(
        [("aspirin", "DC1")], "drug string, dcid string"
    )
    druginfo = spark.createDataFrame(
        [("aspirin", "nlm text")], "drug string, nlm_drug_info string"
    )
    out = load_drugcentral(acts, name2id, druginfo, targets)
    rows = {r.drug: r for r in out.drug_activity.collect()}
    assert rows["aspirin"].target_id == 1
    assert rows["aspirin"].dcid == "DC1"
    assert rows["aspirin"].nlm_drug_info == "nlm text"
    assert rows["aspirin"].has_moa is True
    assert rows["drugb"].target_id == 2
    assert out.notfnd.count() == 1


def test_impc_phenotype_loader(spark):
    from tcrd_spark.etl.loaders import load_impc_phenotypes

    nh = spark.createDataFrame(
        [(1, "Trp53", "Mus musculus"), (2, "Kit", "Rattus norvegicus")],
        "id int, sym string, species string",
    )
    rows = spark.createDataFrame(
        [
            ("Trp53", "proc", "param", "MP:0", "top", "MP:1", "short tail",
             "0.001", None, "1.2", "method", "female"),
            ("Trp53", "proc", "param", None, None, None, None,
             "0.5", None, None, "method", "male"),      # no terms: skipped
            ("Kit", "proc", "param", "MP:0", "top", "MP:2", "odd gait",
             "bad-number", None, None, "method", "male"),  # rat: notfnd
        ],
        "marker_symbol string, procedure_name string, parameter_name string,"
        " top_level_mp_term_id string, top_level_mp_term_name string,"
        " mp_term_id string, mp_term_name string, p_value string,"
        " percentage_change string, effect_size string,"
        " statistical_method string, sex string",
    )
    out, notfnd = load_impc_phenotypes(rows, nh)
    got = out.collect()
    assert len(got) == 1
    r = got[0]
    assert r.nhprotein_id == 1 and r.ptype == "IMPC"
    assert r.term_name == "short tail" and r.p_value == 0.001
    assert r.gp_assoc is True
    assert notfnd.count() == 1


def test_gwas_catalog_loader_symbol_split(spark):
    from tcrd_spark.etl.loaders import load_gwas_catalog

    protein = spark.createDataFrame(
        [(11, "BRCA1"), (12, "TP53")], "id int, sym string"
    )
    rows = spark.createDataFrame(
        [
            ("BRCA1 - TP53", "Height", "rs1", "123", "study A", "intron",
             "0", "5e-8", "1.1", None, "height", "EFO:1"),
            ("NR", "Weight", "rs2", "124", "study B", None,
             None, "1e-9", None, None, "weight", "EFO:2"),
            ("NOPE", "Weight", "rs3", "125", "study C", None,
             None, "bad", None, None, "weight", "EFO:3"),
        ],
        "mapped_gene string, disease_trait string, snps string,"
        " pubmedid string, study string, context string,"
        " intergenic string, p_value string, or_beta string, cnv string,"
        " mapped_trait string, mapped_trait_uri string",
    )
    out, notfnd = load_gwas_catalog(rows, protein)
    got = {(r.protein_id, r.disease_trait) for r in out.collect()}
    # the multi-symbol row fans out to both resolved proteins
    assert got == {(11, "Height"), (12, "Height")}
    r = {r.protein_id: r for r in out.collect()}[11]
    assert r.pmid == 123 and r.p_value == 5e-8 and r.intergenic is False
    assert [r.sym for r in notfnd.collect()] == ["NOPE"]


def test_kegg_pathway_loader(spark):
    from tcrd_spark.etl.loaders import load_kegg_pathways

    protein = spark.createDataFrame(
        [(11, 101), (12, 102)], "id int, geneid int"
    )
    link = spark.createDataFrame(
        [("path:hsa04010", 101), ("path:hsa04010", 102),
         ("path:hsa04010", 999)],
        "kpw string, geneid int",
    )
    meta = spark.createDataFrame(
        [("path:hsa04010", "MAPK signaling pathway",
          "http://www.kegg.jp/pathway/hsa04010")],
        "kpw string, name string, url string",
    )
    out, notfnd = load_kegg_pathways(link, meta, protein)
    rows = {r.protein_id: r for r in out.collect()}
    assert set(rows) == {11, 12}
    assert rows[11].pwtype == "KEGG"
    assert rows[11].name == "MAPK signaling pathway"
    assert rows[11].id_in_source == "path:hsa04010"
    assert [r.geneid for r in notfnd.collect()] == [999]


OBO_DOC = """format-version: 1.2

[Term]
id: DOID:0001
name: disease
def: "A disease." [url]

[Term]
id: DOID:0002
name: cancer
def: "A cancer." [url]
is_a: DOID:0001 ! disease
xref: MESH:D009369
xref: ICD10CM:C80.1

[Term]
id: DOID:0003
name: old thing
is_obsolete: true
"""


def test_do_ontology_load(spark, tmp_path):
    from tcrd_spark.etl.loaders import load_do_ontology

    p = tmp_path / "doid.obo"
    p.write_text(OBO_DOC)
    tables = load_do_ontology(spark, str(p))
    do = {r.doid: r for r in tables["do"].collect()}
    assert set(do) == {"DOID:0001", "DOID:0002"}   # obsolete skipped
    assert do["DOID:0002"].name == "cancer"
    parents = [(r.doid, r.parent_id) for r in tables["do_parent"].collect()]
    assert parents == [("DOID:0002", "DOID:0001")]
    xrefs = {(r.db, r.value) for r in tables["do_xref"].collect()}
    assert xrefs == {("MESH", "D009369"), ("ICD10CM", "C80.1")}


def test_uberon_ontology_load(spark, tmp_path):
    from tcrd_spark.etl.loaders import load_uberon_ontology

    p = tmp_path / "uberon.obo"
    p.write_text(OBO_DOC.replace("DOID", "UBERON"))
    tables = load_uberon_ontology(spark, str(p))
    assert tables["uberon"].count() == 2
    assert [
        (r.uid, r.parent_id) for r in tables["uberon_parent"].collect()
    ] == [("UBERON:0002", "UBERON:0001")]


def test_hpa_loader(spark):
    from tcrd_spark.etl.loaders import load_hpa_expression

    nt = spark.createDataFrame(
        [(11, "liver", "ENSG1", "GENE1", "High", "Approved"),
         (12, "brain", "ENSG2", "GENE2", "Low", "Supported")],
        "protein_id int, tissue string, gene string, gene_name string,"
        " level string, reliability string",
    )
    taus = spark.createDataFrame(
        [("ENSG1", "0.85", 11), ("ENSG2", "None", 12)],
        "gene string, tau string, protein_id int",
    )
    exp, infos = load_hpa_expression(nt, taus)
    rows = {r.protein_id: r for r in exp.collect()}
    assert rows[11].etype == "HPA" and rows[11].qual_value == "High"
    assert rows[11].evidence == "Approved"
    got = infos.collect()
    assert len(got) == 1      # 'None' tau skipped (load-HPA.py:149)
    assert got[0].number_value == 0.85
    assert got[0].itype == "HPA Tissue Specificity Index"


def test_omim_loader(spark):
    from tcrd_spark.etl.loaders import load_omim

    protein = spark.createDataFrame(
        [(11, "BRCA1"), (12, "TP53")], "id int, sym string"
    )
    titles = spark.createDataFrame(
        [("#", None, "comment row"),
         ("Asterisk", "100100", "ABC; ALPHA"),
         ("NULL", "100200", "DEF")],
        "prefix string, mim string, title_raw string",
    )
    ps = spark.createDataFrame(
        [("PS100", "100100", "series one")],
        "omim_ps_id string, mim string, title string",
    )
    genemap = spark.createDataFrame(
        [
            ("BRCA1, TP53", 100100, "Some phenotype (3)"),
            ("BRCA1", 100200, "?provisional thing"),     # skipped
            ("NOPE", 100300, ""),                        # notfnd
        ],
        "gene_symbols string, mim long, phenotypes string",
    )
    out = load_omim(titles, ps, genemap, protein)
    omim = {r.mim: r.title for r in out.omim.collect()}
    assert omim == {100100: "ABC", 100200: "DEF"}        # ';' truncation
    assert out.omim_ps.collect()[0].omim_ps_id == "PS100"
    pts = {(r.protein_id, r.trait) for r in out.phenotype.collect()}
    assert pts == {
        (11, "MIM Number: 100100; Phenotype: Some phenotype (3)"),
        (12, "MIM Number: 100100; Phenotype: Some phenotype (3)"),
    }
    assert out.notfnd.count() == 1


def test_orthologs_loader(spark):
    from tcrd_spark.etl.loaders import load_orthologs

    protein = spark.createDataFrame(
        [(11, "BRCA1", 672), (12, None, 7157)],
        "id int, sym string, geneid int",
    )
    rows = spark.createDataFrame(
        [
            # mouse via symbol; MGI url
            ("BRCA1", 672, "10090", "Brca1", "breast cancer 1", "MGI:104537",
             "12189", "HGNC"),
            # rat via geneid fallback; RGD: stripped in url
            (None, 7157, "10116", "Tp53", "tumor protein p53", "RGD:3889",
             "24842", "HGNC"),
            # both symbol and name '-': skipped
            ("BRCA1", 672, "10090", "-", "-", "-", "-", "HGNC"),
            # unwanted species: skipped
            ("BRCA1", 672, "99999", "X", "x protein", "-", "-", "HGNC"),
            # unresolvable human side
            ("NOPE", 999999, "10090", "Y", "y protein", "-", "-", "HGNC"),
        ],
        "human_symbol string, human_entrez_gene int, ortholog_species string,"
        " ortholog_species_symbol string, ortholog_species_name string,"
        " ortholog_species_db_id string, ortholog_species_entrez_gene string,"
        " sources string",
    )
    out, notfnd = load_orthologs(rows, protein)
    got = {r.species: r for r in out.collect()}
    assert set(got) == {"Mouse", "Rat"}
    assert got["Mouse"].protein_id == 11
    assert got["Mouse"].mod_url == \
        "http://www.informatics.jax.org/marker/MGI:104537"
    assert got["Rat"].protein_id == 12
    assert got["Rat"].mod_url == \
        "http://rgd.mcw.edu/rgdweb/report/gene/main.html?id=3889"
    assert got["Rat"].geneid == 24842
    assert notfnd.count() == 1
