"""Atlas / xref-fill / worklist loader families (loaders_atlas)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from tests.tcrd_fixtures import build_lake


@pytest.fixture(scope="module")
def lake(spark):
    return build_lake(spark)


def test_id_xrefs(spark, lake, tmp_path):
    tsv = tmp_path / "l1000.tsv"
    tsv.write_text(
        "value\tsym\tgeneid\n"
        "L1000-1\tSYM1\t101\n"
        "L1000-2\tNOSYM\t102\n"      # geneid fallback
        "L1000-3\tNOPE\t999\n"       # notfnd
    )
    from tcrd_spark.etl.loaders_atlas import load_id_xrefs

    out = load_id_xrefs(spark, str(tsv), lake["protein"], "L1000 ID")
    rows = {(r.protein_id, r.xtype, r.value) for r in out.resolved.collect()}
    assert rows == {(11, "L1000 ID", "L1000-1"), (12, "L1000 ID", "L1000-2")}
    assert out.unresolved.count() == 1


def test_cspa(spark, lake, tmp_path):
    csv = tmp_path / "cspa.csv"
    csv.write_text(
        "c0,UP,conf,c3,GeneID,c5,HELA,K562\n"
        "x,U00001,1 - high confidence,x,101,x,1,\n"
        "x,U00002,2 - putative,x,102,x,1,1\n"      # low conf: skipped
        "x,UNKNOWN,1 - high confidence,x,103,x,,1\n"  # geneid fallback
        "x,NOPE,1 - high confidence,x,999,x,1,1\n"    # notfnd
    )
    from tcrd_spark.etl.loaders_atlas import CSPA_ETYPE, load_cspa

    out = load_cspa(spark, str(csv), lake["protein"])
    rows = {(r.protein_id, r.tissue) for r in out.expression.collect()}
    assert rows == {(11, "Cell Line HELA"), (13, "Cell Line K562")}
    assert out.expression.first().etype == CSPA_ETYPE
    assert out.expression.first().boolean_value is True
    assert out.skipped == 1 and out.notfnd.count() == 1


def test_hca(spark, lake, tmp_path):
    rna = tmp_path / "hca_rna.csv"
    rna.write_text(
        "ENSG,Gene,HeLa (TPM),HEK293 (TPM)\n"
        "ENSG000001,SYM1,0,10\n"
        "ENSG000001,NOSYMB,4,30\n"       # resolves via Ensembl xref
        "ENSGX,SYM3,8,50\n"
        "ENSGY,SYM4,12,70\n"
        "ENSGZ,NOPE,16,90\n"             # notfnd
    )
    loc = tmp_path / "hca_loc.csv"
    # cols: ENSG, Gene, Uniprot, <2 compartments>, Reliability, +4 tail
    loc.write_text(
        "ENSG,Gene,Uniprot,Cytosol,Nucleus,Reliability,t1,t2,t3,t4\n"
        "ENSG000001,SYM1,U00001,1,0,Supportive,,,,\n"
        "ENSGX,SYM3,U00003,1,1,Uncertain,,,,\n"     # uncertain: dropped
        "ENSGY,NOSYM,UNKNOWN,1,0,Supportive,,,,\n"  # notfnd
    )
    from tcrd_spark.etl.loaders_atlas import (
        HCA_CTYPE, HCA_ETYPE, load_hca,
    )

    out = load_hca(
        spark, str(rna), str(loc), lake["protein"], lake["xref"],
        compartment_go={"Cytosol": ("C:cytosol", "GO:0005829"),
                        "Nucleus": ("C:nucleus", "GO:0005634")},
    )
    allrows = out.expression.collect()
    # HeLa nonzero tpms: 4,8,12,16 (notfnd row still counts for pctiles)
    # p33≈7.96, p66≈11.88 ⇒ 0→Not detected, 4→Low, 8→Medium, 12/16→High
    hela = {r.number_value: r.qual_value
            for r in allrows if r.tissue == "Cell Line HeLa"}
    assert hela[0.0] == "Not detected"
    assert any(r.protein_id == 11 and r.number_value == 10.0
               for r in allrows if r.tissue == "Cell Line HEK293")
    assert hela[4.0] == "Low" and hela[8.0] == "Medium"
    assert hela[12.0] == "High"
    # the unresolvable ENSGZ row contributed to the percentiles but
    # produced no expression row
    assert 16.0 not in hela
    assert all(r.etype == HCA_ETYPE for r in out.expression.collect())
    comp = out.compartment.collect()
    assert len(comp) == 1
    assert (comp[0].protein_id, comp[0].go_id, comp[0].go_term) == (
        11, "GO:0005829", "C:cytosol")
    assert comp[0].ctype == HCA_CTYPE and comp[0].reliability == "Supportive"


def test_eram(spark, lake, tmp_path):
    jl = tmp_path / "eram.jsonl"
    recs = [
        {"name": "asthma", "doids": ["DOID:2841", "DOID:9999"],
         "currated_genes": [
             {"sym": "SYM1", "geneid": 101, "sources": "CURATED;OMIM"},
             {"sym": "NOPE", "geneid": 999, "sources": "X"}]},
        {"name": "empty dz", "doids": ["DOID:1"], "currated_genes": []},
    ]
    jl.write_text("\n".join(json.dumps(r) for r in recs) + "\n")
    from tcrd_spark.etl.loaders_atlas import load_eram

    out = load_eram(spark, str(jl), lake["protein"])
    rows = {(r.protein_id, r.did) for r in out.disease.collect()}
    # genes × doids fan-out
    assert rows == {(11, "DOID:2841"), (11, "DOID:9999")}
    r = out.disease.first()
    assert r.dtype == "eRAM" and r.source == "CURATED;OMIM"
    assert out.skipped == 1 and out.notfnd.count() == 1


def test_techdev(spark, lake, tmp_path):
    contact = tmp_path / "contact.json"
    contact.write_text(json.dumps({
        "id": 7, "contact_name": "A Person", "contact_email": "a@b.org",
        "grant_number": "U01-XYZ", "date": "2019-05-01"}) + "\n")
    wl = tmp_path / "worklist.csv"
    wl.write_text(
        "c0,sym,c2,c3,c4,c5,flag,comment,pcmid,pmid,data_url,resource_url\n"
        "x,SYM1,,,,,1,antibody generated,PMC1,123,http://d,http://r\n"
        "x,SYM2,,,,,0,skipped row,,,,\n"          # unflagged
        "x,SYM3,,,,,1,,,,,\n"                     # no comment
        "x,NOPE,,,,,1,ok,,,,\n"                   # notfnd
    )
    from tcrd_spark.etl.loaders_atlas import load_techdev_info

    out = load_techdev_info(spark, str(contact), str(wl), lake["protein"])
    assert out.techdev_contact.first().grant_number == "U01-XYZ"
    rows = out.techdev_info.collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.contact_id, r.protein_id, r.comment) == (
        7, 11, "antibody generated")
    assert r.publication_pcmid == "PMC1" and r.publication_pmid == 123
    assert r.data_url == "http://d" and r.resource_url == "http://r"
    assert out.skipped == 2 and out.notfnd.count() == 1
