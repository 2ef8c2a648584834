"""Network / pathway / assay loader families (loaders_net)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from tests.tcrd_fixtures import _df, build_lake


@pytest.fixture(scope="module")
def lake(spark):
    return build_lake(spark)


def test_bioplex_ppis(spark, lake, tmp_path):
    tsv = tmp_path / "bioplex.tsv"
    tsv.write_text(
        "GeneA\tGeneB\tUniprotA\tUniprotB\tSymbolA\tSymbolB\tpW\tpNI\tpInt\n"
        # up1 hit; endpoint2 misses uniprot+sym, falls back to geneid
        "101\t102\tU00001\tUNKNOWN\tSYM1\tNOSYM\t0.01\t0.04\t0.95\n"
        "999\t101\tUNKNOWN\tU00001\tNOPE\tSYM1\t0.2\t0.1\t0.7\n"  # ep1 notfnd
    )
    from tcrd_spark.etl.loaders_net import load_bioplex_ppis

    out = load_bioplex_ppis(spark, str(tsv), lake["protein"])
    rows = out.ppi.collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.protein1_id, r.protein2_id) == (11, 12)
    assert (r.p_int, r.p_ni, r.p_wrong) == (0.95, 0.04, 0.01)
    assert r.ppitype == "BioPlex"
    assert out.notfnd.count() == 1


def test_reactome_ppis(spark, lake, tmp_path):
    tsv = tmp_path / "reactome.tsv"
    tsv.write_text(
        "a\tc1\tc2\tb\tc4\tc5\tint_type\n"
        "uniprotkb:U00001\tx\ty\tuniprotkb:U00002\tz\tw\tphysical\n"
        "uniprotkb:U00001\tx\ty\tuniprotkb:U00002\tz\tw\tphysical\n"  # dup
        "uniprotkb:U00001\tx\ty\tuniprotkb:U00001\tz\tw\tself\n"      # loop
        "chebi:123\tx\ty\tuniprotkb:U00002\tz\tw\tchem\n"             # prefix
    )
    from tcrd_spark.etl.loaders_net import load_reactome_ppis

    out = load_reactome_ppis(spark, str(tsv), lake["protein"])
    rows = out.ppi.collect()
    assert len(rows) == 1
    assert (rows[0].protein1_id, rows[0].protein2_id) == (11, 12)
    assert rows[0].interaction_type == "physical"


def test_reactome_pathways(spark, lake, tmp_path):
    gmt = tmp_path / "ReactomePathways.gmt"
    gmt.write_text(
        "Apoptosis\tR-HSA-109581\tReactome Pathway\tSYM1\tSYM2\tNOPE\n"
        "Signaling\tR-HSA-112316\tReactome Pathway\tSYM1\n"
    )
    from tcrd_spark.etl.loaders_net import load_reactome_pathways

    out = load_reactome_pathways(spark, str(gmt), lake["protein"])
    rows = {(r.protein_id, r.name) for r in out.pathway.collect()}
    assert rows == {(11, "Apoptosis"), (12, "Apoptosis"), (11, "Signaling")}
    r = out.pathway.filter(F.col("name") == "Signaling").first()
    assert r.pwtype == "Reactome"
    assert r.url.endswith("R-HSA-112316")
    assert {x.sym for x in out.notfnd.collect()} == {"NOPE"}


def test_locsig(spark, lake, tmp_path):
    csv = tmp_path / "locsig.csv"
    csv.write_text(
        "KDEL,seq,Endoplasmic reticulum,123;456,U00001;U00002,Homo sapiens\n"
        "NLS,seq,Nucleus,789,U00003,Mus musculus\n"      # non-human: skipped
        "PTS1,seq,Peroxisome,111,UNKNOWN,Homo sapiens\n"  # notfnd
    )
    from tcrd_spark.etl.loaders_net import load_locsig

    out = load_locsig(spark, str(csv), lake["protein"])
    rows = {(r.protein_id, r.location, r.signal) for r in out.locsig.collect()}
    assert rows == {(11, "Endoplasmic reticulum", "KDEL"),
                    (12, "Endoplasmic reticulum", "KDEL")}
    assert out.skipped == 1
    assert {r.uniprot for r in out.notfnd.collect()} == {"UNKNOWN"}


def test_mlp_assay_info(spark, lake, tmp_path):
    xref = _df(spark, "xref", [
        dict(id=1, xtype="NCBI GI", protein_id=11, value="4507241",
             dataset_id=1),
    ])
    links = tmp_path / "links.csv"
    links.write_text(
        "aid,gi,species,name,sym\n"
        "624\t4507241\tHomo sapiens\tkinase\tSYM1\n".replace("\t", ",")
        + "625,999,Homo sapiens,other,SYM2\n"            # falls back to sym
        + "626,888,Mus musculus,mouse,Msym\n"            # skipped
        + "627,777,Homo sapiens,unknown,NOPE\n"          # notfnd
    )
    details = tmp_path / "details.csv"
    details.write_text(
        "aid,assay_name,method,active_sids,inactive_sids,iconclusive_sids,"
        "total_sids\n"
        "624,qHTS Assay,summary,10,100,5,115\n"
        "625,Counter Screen,screening,2,20,0,22\n"
    )
    from tcrd_spark.etl.loaders_net import load_mlp_assay_info

    out = load_mlp_assay_info(spark, str(links), str(details),
                              lake["protein"], xref)
    rows = {r.protein_id: r for r in out.mlp_assay_info.collect()}
    assert rows[11].assay_name == "qHTS Assay" and rows[11].aid == 624
    assert rows[11].total_sids == 115
    assert rows[12].assay_name == "Counter Screen"       # sym fallback
    assert out.skipped == 1 and out.notfnd.count() == 1


def test_monarch_ortholog_diseases(spark, lake, tmp_path):
    ortholog = _df(spark, "ortholog", [
        dict(id=1, protein_id=11, taxid=10090, species="Mouse",
             geneid=22059, symbol="Trp53", sources="Monarch"),
        dict(id=2, protein_id=12, taxid=10116, species="Rat",
             geneid=64030, symbol="Kit", sources="Monarch"),
    ])
    tsv = tmp_path / "monarch.tsv"
    tsv.write_text(
        "sym\tuniprot\tname\tdid\tscore\ttaxid\tspecies\tdbid\t"
        "o_geneid\to_symbol\n"
        # protein via uniprot; ortholog via (symbol, taxid)
        "SYM1\tU00001\tcancer\tDOID:162\t0.8\t10090\tMouse\tMGI:1\t"
        "0\tTrp53\n"
        # protein via sym fallback; ortholog via (geneid, taxid) fallback
        "SYM2\tUNKNOWN\tmast cell dz\tDOID:999\t0.5\t10116\tRat\tRGD:2\t"
        "64030\tWrongSym\n"
        # ortholog unresolvable
        "SYM3\tU00003\tx\tDOID:1\t0.1\t7955\tZfish\tZ:1\t1\tzsym\n"
    )
    from tcrd_spark.etl.loaders_net import load_monarch_ortholog_diseases

    out = load_monarch_ortholog_diseases(spark, str(tsv),
                                         lake["protein"], ortholog)
    rows = {(r.protein_id, r.ortholog_id, r.did, r.score)
            for r in out.ortholog_disease.collect()}
    assert rows == {(11, 1, "DOID:162", 0.8), (12, 2, "DOID:999", 0.5)}
    assert out.notfnd.count() == 1


def test_ncbi_gene(spark, lake, tmp_path):
    jl = tmp_path / "ncbi.jsonl"
    recs = [
        {"geneid": 101, "summary": "This gene encodes a kinase.",
         "aliases": ["AAA", "BBB"], "pmids": ["11", "22", "33"],
         "generifs": [{"pubmed_ids": "11|22", "text": "rif one"}]},
        {"geneid": 102, "summary": "", "aliases": [], "pmids": [],
         "generifs": []},
        {"geneid": 999, "summary": "x", "aliases": [], "pmids": [],
         "generifs": []},
    ]
    jl.write_text("\n".join(json.dumps(r) for r in recs) + "\n")
    from tcrd_spark.etl.loaders_net import (
        NCBI_PMC_ITYPE, NCBI_SUMMARY_ITYPE, load_ncbi_gene,
    )

    out = load_ncbi_gene(spark, str(jl), lake["protein"])
    assert {(r.protein_id, r.value) for r in out.alias.collect()} == {
        (11, "AAA"), (11, "BBB")}
    ti = {(r.protein_id, r.itype): r for r in out.tdl_info.collect()}
    assert ti[(11, NCBI_SUMMARY_ITYPE)].string_value.startswith("This gene")
    assert ti[(11, NCBI_PMC_ITYPE)].integer_value == 3
    assert (12, NCBI_SUMMARY_ITYPE) not in ti     # empty summary skipped
    assert ti[(12, NCBI_PMC_ITYPE)].integer_value == 0
    rifs = out.generif.collect()
    assert len(rifs) == 1 and rifs[0].pubmed_ids == "11|22"
    assert {(r.protein_id, r.xtype, r.value) for r in out.xref.collect()} == {
        (11, "PubMed", "11"), (11, "PubMed", "22"), (11, "PubMed", "33")}
    assert out.notfnd.count() == 1
