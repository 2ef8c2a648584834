"""Disease / pathway / variant loader families (loaders_dis)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.tcrd_fixtures import _df, build_lake


@pytest.fixture(scope="module")
def lake(spark):
    return build_lake(spark)


CLINVAR_HEADER = (
    "#AlleleID\tType\tName\tGeneID\tGeneSymbol\tHGNC_ID\t"
    "ClinicalSignificance\tClinSigSimple\tLastEvaluated\tRS# (dbSNP)\t"
    "nsv/esv (dbVar)\tRCVaccession\tPhenotypeIDS\tPhenotypeList\tOrigin\t"
    "OriginSimple\tAssembly\tChromosomeAccession\tChromosome\tStart\tStop\t"
    "ReferenceAllele\tAlternateAllele\tCytogenetic\tReviewStatus\t"
    "NumberSubmitters\tGuidelines\tTestedInGTR\tOtherIDs\t"
    "SubmitterCategories\tVariationID\n"
)


def _cv_line(alleleid, sym, geneid, ids, pts, status, tig="N"):
    f = [""] * 31
    f[0] = str(alleleid); f[1] = "single nucleotide variant"
    f[2] = f"NM_x.{alleleid}"; f[3] = str(geneid); f[4] = sym
    f[6] = "Pathogenic"; f[7] = "1"; f[8] = "Jun 29, 2015"; f[9] = "397704705"
    f[10] = "-"; f[12] = ids; f[13] = pts; f[14] = "germline"
    f[15] = "germline"; f[16] = "GRCh38"; f[17] = "NC_000007.14"
    f[18] = "7"; f[19] = "4820844"; f[20] = "4820847"; f[24] = status
    f[25] = "2"; f[27] = tig; f[29] = "3"
    return "\t".join(f) + "\n"


def test_clinvar(spark, lake, tmp_path):
    tsv = tmp_path / "variant_summary.txt"
    tsv.write_text(
        CLINVAR_HEADER
        + _cv_line(15041, "SYM1", 101,
                   "MedGen:C3150901;Human Phenotype Ontology:HP:0000001,MedGen:CN2",
                   "Spastic paraplegia;All findings",
                   "criteria provided, multiple submitters, no conflicts", "Y")
        + _cv_line(15042, "NOPE", 999, "MedGen:C1", "Bad status pheno",
                   "no assertion criteria provided")     # gated out
        + _cv_line(15043, "NOSYM", 102, "MedGen:C2", "Nephro",
                   "reviewed by expert panel")           # geneid fallback
        # PhenotypeIDS vs PhenotypeList length mismatch → skipped
        + _cv_line(15044, "SYM1", 101, "MedGen:C3;MedGen:C4", "OnlyOne",
                   "reviewed by expert panel")
    )
    from tcrd_spark.etl.loaders_dis import load_clinvar

    out = load_clinvar(spark, str(tsv), lake["protein"])
    assert out.mismatch_ct == 1
    names = {r.name for r in out.phenotype.collect()}
    # mismatch row contributes no phenotypes; gated row still does
    assert "Spastic paraplegia" in names and "Bad status pheno" in names
    xr = {(r.source, r.value) for r in out.phenotype_xref.collect()}
    assert ("MedGen", "C3150901") in xr
    assert ("HPO", "0000001") in xr          # prefix rewritten
    rows = out.clinvar.collect()
    # allele 15041 → 2 phenotypes on SYM1; 15043 → 1 via geneid
    assert {(r.protein_id, r.alleleid) for r in rows} == {
        (11, 15041), (11, 15041), (12, 15043)
    }
    r = [x for x in rows if x.alleleid == 15041][0]
    assert r.tested_in_gtr is True
    assert str(r.last_evaluated) == "2015-06-29"
    assert r.start == 4820844 and r.number_submitters == 2
    assert out.notfnd.count() == 0  # gated-out row never reaches resolve


def test_wikipathways(spark, lake, tmp_path):
    tsv = tmp_path / "wikipathways.gmt"
    tsv.write_text(
        "Apoptosis Modulation%WikiPathways_20160516%WP1772%Homo sapiens\t"
        "http://www.wikipathways.org/instance/WP1772_r85184\t101\t102\t999\n"
        "Lone%db%WP2%hs\thttp://w/WP2_r1\t103\n"
    )
    from tcrd_spark.etl.loaders_dis import load_wikipathways

    out = load_wikipathways(spark, str(tsv), lake["protein"])
    rows = {(r.protein_id, r.name, r.id_in_source)
            for r in out.pathway.collect()}
    assert rows == {
        (11, "Apoptosis Modulation", "WP1772_r85184"),
        (12, "Apoptosis Modulation", "WP1772_r85184"),
        (13, "Lone", "WP2_r1"),
    }
    assert {r.geneid for r in out.notfnd.collect()} == {"999"}
    assert out.pathway.first().pwtype == "WikiPathways"


def test_pathway_commons(spark, lake, tmp_path):
    tsv = tmp_path / "pc.gmt"
    tsv.write_text(
        "http://pathwaycommons.org/pc2/Pathway_01\t"
        "name: VEGFR1 specific signals; datasource: pid; organism: 9606; "
        "idtype: uniprot\tU00001\tU00002\tUNKNOWN\n"
        "http://identifiers.org/kegg.pathway/hsa00010\t"
        "name: Glycolysis; datasource: kegg; organism: 9606; idtype: "
        "uniprot\tU00001\n"
    )
    from tcrd_spark.etl.loaders_dis import load_pathway_commons

    out = load_pathway_commons(spark, str(tsv), lake["protein"])
    assert out.skipped == 1                  # the kegg row
    rows = out.pathway.collect()
    assert {(r.protein_id, r.name) for r in rows} == {
        (11, "VEGFR1 specific signals"), (12, "VEGFR1 specific signals")
    }
    r = rows[0]
    assert r.pwtype == "PathwayCommons: pid"
    assert r.url.startswith("http://apps.pathwaycommons.org/pathways?uri=")
    assert "%3A%2F%2F" in r.url              # URI percent-encoded
    assert {x.uniprot for x in out.notfnd.collect()} == {"UNKNOWN"}


def test_tiga(spark, lake, tmp_path):
    xref = _df(spark, "xref", [
        dict(id=1, xtype="Ensembl", protein_id=12, value="ENSG000002",
             dataset_id=1),
    ])
    tiga = tmp_path / "tiga.tsv"
    hdr = ("ensg\tefoId\ttrait\tn_study\tn_snp\tn_snpw\tgeneNtrait\t"
           "geneNstudy\ttraitNgene\ttraitNstudy\tpvalue_mlog_median\t"
           "or_median\tn_beta\tstudy_N_mean\trcras\tgeneSymbol\t"
           "geneIdgTdl\tgeneFamily\tgeneIdgList\tgeneName\tmeanRank\t"
           "meanRankScore\n")
    tiga.write_text(
        hdr
        + "ENSG000001\tEFO_1\theight\t3\t7\t5.2\t1\t2\t3\t4\t8.5\tNA\t2\t"
          "10000.5\t1.2\tSYM1\tTbio\tKinase\tFALSE\tname1\t4.0\t88.9\n"
        + "ENSG000002\tEFO_2\tasthma\t1\t2\t1.0\t1\t1\t1\t1\t6.0\t1.44\t1\t"
          "5000.0\t0.5\tNOSYM\tTdark\t\tFALSE\tname2\t9.0\t55.5\n"  # via xref
        + "ENSG999999\tEFO_3\tx\t1\t1\t1.0\t1\t1\t1\t1\t1.0\tNA\t1\t1.0\t"
          "0.1\tNOPE\tTdark\t\tFALSE\tname3\t1.0\t1.0\n"            # notfnd
    )
    prov = tmp_path / "tiga_prov.tsv"
    prov.write_text(
        "ensemblId\tTRAIT_URI\tSTUDY_ACCESSION\tPUBMEDID\tefoId\n"
        "ENSG000001\thttp://efo/EFO_1\tGCST001\t123456\tEFO_1\n"
    )
    from tcrd_spark.etl.loaders_dis import load_tiga

    out = load_tiga(spark, str(tiga), str(prov), lake["protein"], xref)
    rows = {r.protein_id: r for r in out.tiga.collect()}
    assert set(rows) == {11, 12}
    assert rows[11].or_median is None        # 'NA' → null
    assert rows[11].pvalue_mlog_median == 8.5
    assert rows[12].or_median == 1.44        # resolved via Ensembl xref
    assert rows[12].efoid == "EFO_2"
    assert out.notfnd.count() == 1
    p = out.provenance.first()
    assert (p.ensg, p.study_acc, p.pubmedid) == ("ENSG000001", "GCST001",
                                                 123456)


def test_monarch_diseases(spark, lake, tmp_path):
    csv = tmp_path / "monarch.csv"
    csv.write_text(
        "SYM1,U00001,Achondrogenesis,MONDO:0007235,IEA,desc one,0.25,\n"
        "SYM2,UNKNOWN,Asthma,MONDO:0004979,IEA,desc two,,0.75\n"  # sym fb
        "NOPE,UNKNOWN2,X,MONDO:1,IEA,d,,\n"                       # notfnd
    )
    from tcrd_spark.etl.loaders_dis import load_monarch_diseases

    out = load_monarch_diseases(spark, str(csv), lake["protein"])
    rows = {r.protein_id: r for r in out.disease.collect()}
    assert set(rows) == {11, 12}
    assert rows[11].dtype == "Monarch" and rows[11].O2S == 0.25
    assert rows[11].S2O is None
    assert rows[12].S2O == 0.75 and rows[12].O2S is None
    assert out.notfnd.count() == 1


def test_expression_atlas_diseases(spark, lake, tmp_path):
    xref = _df(spark, "xref", [
        dict(id=1, xtype="ENSG", protein_id=12, value="ENSG000002",
             dataset_id=1),
    ])
    tsv = tmp_path / "ea.tsv"
    tsv.write_text(
        "Gene ID\tDOID\tGene Name\tlog2foldchange\tp-value\tdisease\t"
        "experiment_id\tcontrast_id\n"
        "ENSG000001\tDOID:123\tSYM1\t2.3456\t1e-12\tleukemia\tE-1\tg1_g2\n"
        "ENSG000002\tDOID:456\tNOSYM\t-1.5\t0.001\tasthma\tE-2\tg3_g4\n"
        "ENSG999999\tDOID:789\tNOPE\t1.0\t0.5\tx\tE-3\tg5_g6\n"
    )
    from tcrd_spark.etl.loaders_dis import load_expression_atlas_diseases

    out = load_expression_atlas_diseases(
        spark, str(tsv), lake["protein"], xref
    )
    rows = {r.protein_id: r for r in out.disease.collect()}
    assert set(rows) == {11, 12}
    assert rows[11].log2foldchange == 2.346   # %.3f rounding
    assert rows[11].dtype == "Expression Atlas"
    assert rows[12].did == "DOID:456"
    assert out.notfnd.count() == 1
