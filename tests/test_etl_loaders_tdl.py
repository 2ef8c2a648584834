"""TDL-info worklist / IDG-housekeeping loaders (loaders_tdl),
hand-computed expectations."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.tcrd_fixtures import _df, build_lake


@pytest.fixture(scope="module")
def lake(spark):
    return build_lake(spark)


def test_animal_tfdb(spark, lake, tmp_path):
    from tcrd_spark.etl.loaders_tdl import TF_ITYPE, load_animal_tfdb

    tsv = tmp_path / "HsTFList.txt"
    tsv.write_text(
        # sym hit
        "bZIP\tENSGX\t999\tSYM1\n"
        # sym miss, geneid hit
        "bHLH\tENSGY\t102\tNOPE\n"
        # sym+geneid miss, Ensembl xref hit (protein branch, pid 12)
        "HMG\tENSG000002\t0\tNOPE2\n"
        # all three miss
        "ZF\tENSGZ\t0\tNOPE3\n"
    )
    target = _df(spark, "target", [
        dict(id=1, name="T1", ttype="Single Protein", tdl="Tclin"),
        dict(id=2, name="T2", ttype="Single Protein", tdl="Tchem"),
    ])
    out = load_animal_tfdb(spark, str(tsv), lake["protein"], lake["xref"],
                           lake["t2tc"], target)
    infos = {r.protein_id: r for r in out.tdl_info.collect()}
    assert set(infos) == {11, 12}
    assert all(r.itype == TF_ITYPE and r.boolean_value for r in infos.values())
    tally = {r.tdl: r.ct for r in out.tdl_counts.collect()}
    assert tally == {"Tclin": 1, "Tchem": 1}
    assert out.notfnd.count() == 1


def test_antibodypedia_list(spark, tmp_path):
    from tcrd_spark.etl.loaders_tdl import (
        AB_ITYPE, ABURL_ITYPE, MAB_ITYPE, load_antibodypedia_list,
    )

    wl = tmp_path / "ablist.txt"
    wl.write_text("U00001 11\nU00002 12\nUNPOLLED 13\n")
    payload = spark.createDataFrame(
        [("U00001", 120, 5, "https://antibodypedia.com/gene/1"),
         ("U00002", 3, None, "https://antibodypedia.com/gene/2")],
        "uniprot string, num_antibodies int, ab_type_monoclonal int, "
        "url string",
    )
    rows = {(r.protein_id, r.itype): r
            for r in load_antibodypedia_list(spark, str(wl), payload).collect()}
    assert rows[(11, AB_ITYPE)].integer_value == 120
    assert rows[(11, MAB_ITYPE)].integer_value == 5
    # missing monoclonal field counts as 0 (load-AntibodypediaList.py:122-125)
    assert rows[(12, MAB_ITYPE)].integer_value == 0
    assert rows[(12, ABURL_ITYPE)].string_value.endswith("/2")
    assert not any(pid == 13 for pid, _ in rows)


_OWL = """<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"
         xmlns:owl="http://www.w3.org/2002/07/owl#"
         xmlns:obo="http://purl.obolibrary.org/obo/">
  <owl:Class rdf:about="http://www.drugtargetontology.org/dto/DTO_00000001">
    <rdfs:label>protein</rdfs:label>
    <obo:IAO_0000115>[root term]</obo:IAO_0000115>
  </owl:Class>
  <owl:Class rdf:about="http://www.drugtargetontology.org/dto/DTO_00000101">
    <rdfs:label>kinase</rdfs:label>
    <rdfs:subClassOf
      rdf:resource="http://www.drugtargetontology.org/dto/DTO_00000001"/>
    <obo:IAO_0000115>phospho-transfer enzyme</obo:IAO_0000115>
  </owl:Class>
</rdf:RDF>
"""


def test_dto_terms(spark):
    from tcrd_spark.etl.loaders_tdl import dto_terms

    rows = {r.dtoid: r for r in dto_terms(spark, _OWL).collect()}
    assert rows["DTO:00000001"].name == "protein"
    assert rows["DTO:00000001"].parent_id is None
    # []-stripping matches pronto's desc handling (load-DTO.py:62-64)
    assert rows["DTO:00000001"]["def"] == "root term"
    assert rows["DTO:00000101"].parent_id == "DTO:00000001"
    assert rows["DTO:00000101"]["def"] == "phospho-transfer enzyme"


def test_apply_dto_classifications(spark, lake, tmp_path):
    from tcrd_spark.etl.loaders_tdl import apply_dto_classifications

    mp = tmp_path / "mapping.csv"
    mp.write_text("dtoid,uniprot\nDTO:00000101,U00002\nDTO:00000102,UNKNOWN\n")
    cp = tmp_path / "classes.csv"
    # U00003 exists but was not in the mapping -> stays notfnd_class
    cp.write_text("uniprot,dto_class\nU00002,Kinase\nU00003,GPCR\n")
    out = apply_dto_classifications(spark, str(mp), str(cp), lake["protein"])
    p = {r.uniprot: r for r in out.protein.collect()}
    assert p["U00002"].dtoid == "DTO:00000101"
    assert p["U00002"].dtoclass == "Kinase"
    assert p["U00003"].dtoid is None and p["U00003"].dtoclass is None
    # pre-existing values survive (fixture P11 has DTO:101/Kinase)
    assert p["U00001"].dtoid == "DTO:101"
    assert out.notfnd_ids.count() == 1
    assert {r.uniprot for r in out.notfnd_class.collect()} == {"U00003"}


def test_druggable_epigenome(spark, lake, tmp_path):
    from tcrd_spark.etl.loaders_tdl import (
        EPI_ITYPE, load_druggable_epigenome,
    )

    f5 = tmp_path / "nrd3674-s4.csv"   # 5-column file: bare class string
    f5.write_text(
        "sym,name,uniprot,geneid,extra\n"
        "SYM1,HDAC x,U00001,101,z\n"
    )
    f6 = tmp_path / "nrd3674-s1.csv"   # 6-column file: domain detail suffix
    f6.write_text(
        "sym,name,uniprot,geneid,domain,detail\n"
        "NOPE,b1,U00002,0,BRD,1 of 2\n"      # resolves via uniprot fallback
        "NOPE2,b2,UNKNOWN,0,BRD,2 of 2\n"    # unresolved
    )
    out = load_druggable_epigenome(
        spark,
        {("Eraser", "Histone deacetylase"): str(f5),
         ("Reader", "Bromodomain"): str(f6)},
        lake["protein"],
    )
    rows = {r.protein_id: r for r in out.tdl_info.collect()}
    assert rows[11].string_value == "Epigenetic Eraser - Histone deacetylase"
    assert rows[12].string_value == "Epigenetic Reader - Bromodomain BRD: 1 of 2"
    assert all(r.itype == EPI_ITYPE for r in rows.values())
    assert out.notfnd.count() == 1


def test_idg_fams(spark, lake, tmp_path):
    from tcrd_spark.etl.loaders_tdl import load_idg_fams

    target = _df(spark, "target", [
        dict(id=1, name="T1", ttype="Single Protein", fam="GPCR",
             famext="GPCR-old"),                      # IDG target: keep fam
        dict(id=2, name="T2", ttype="Single Protein"),  # gets fam + famext
        dict(id=3, name="T3", ttype="Single Protein"),  # gets fam only
        dict(id=4, name="T4", ttype="Single Protein"),  # untouched
    ])
    csv = tmp_path / "idgfams.csv"
    csv.write_text(
        "c0,c1,uniprot,fam,famext\n"
        "x,x,U00001,Kinase,Kinase: AGC\n"   # target 1 has fam -> skipped
        "x,x,U00002,IC,IC: SLC\n"
        "x,x,U00003,NR,\n"
        "x,x,U00004,,\n"                    # empty fam -> skipped
    )
    out = {r.id: r for r in load_idg_fams(
        spark, str(csv), target, lake["protein"], lake["t2tc"]
    ).collect()}
    assert out[1].fam == "GPCR" and out[1].famext == "GPCR-old"
    assert out[2].fam == "IC" and out[2].famext == "IC: SLC"
    assert out[3].fam == "NR" and out[3].famext is None
    assert out[4].fam is None


def test_idg_evol(spark, tmp_path):
    from tcrd_spark.etl.loaders_tdl import load_idg_evol

    f1 = tmp_path / "v1.csv"
    f1.write_text('5,Name A,desc a,U00001,SYM1,101,Tclin,GPCR\n')
    f2 = tmp_path / "v2.csv"
    f2.write_text('9,Name B,desc b,U00002,SYM2,\\N,Tdark,Kinase\n')
    rows = {(r.tcrd_ver, r.tcrd_dbid): r for r in load_idg_evol(
        spark, [(1, str(f1)), (2, str(f2))]
    ).collect()}
    assert rows[(1, 5)].geneid == 101 and rows[(1, 5)].tdl == "Tclin"
    # '\\N' MySQL-export null scrubbed (load-IDGevol.py:72-73)
    assert rows[(2, 9)].geneid is None and rows[(2, 9)].fam == "Kinase"


def test_impc_mice(spark, lake, tmp_path):
    from tcrd_spark.etl.loaders_tdl import (
        IMPC_CLONES_ITYPE, IMPC_STATUS_ITYPE, load_impc_mice,
    )

    xref = _df(spark, "xref", [
        dict(id=1, xtype="MGI ID", protein_id=13, value="MGI:3",
             dataset_id=1),
    ])
    csv = tmp_path / "impc.csv"
    csv.write_text(
        "Gene,MGI Accession,Status,# Clones\n"
        "Sym1,MGI:1,Genotype confirmed,4\n"   # sym hit (upper-cased)
        "Nope,MGI:3,,2\n"                     # MGI fallback; status -> '?'
        "Sym2,MGI:2,,\n"                      # resolved but empty -> skipped
        "Ghost,MGI:9,Started,1\n"             # unresolved
    )
    out = load_impc_mice(spark, str(csv), lake["protein"], xref,
                         lake["t2tc"])
    rows = {(r.protein_id, r.itype): r.string_value
            for r in out.tdl_info.collect()}
    assert rows[(11, IMPC_STATUS_ITYPE)] == "Genotype confirmed"
    assert rows[(11, IMPC_CLONES_ITYPE)] == "4"
    assert rows[(13, IMPC_STATUS_ITYPE)] == "?"
    assert rows[(13, IMPC_CLONES_ITYPE)] == "2"
    assert (12, IMPC_STATUS_ITYPE) not in rows
    assert out.skipped == 1
    assert out.notfnd.count() == 1


def test_tmhmm(spark):
    from tcrd_spark.etl.loaders_tdl import (
        TMHMM_ITYPE, tmhmm_fasta, tmhmm_tdl_infos,
    )

    protein = spark.createDataFrame(
        [(11, "P1", "protein 1", "MKV"), (12, "P2", "protein 2", "MAA")],
        "id long, name string, description string, seq string",
    )
    t2tc = spark.createDataFrame(
        [(1, 11), (2, 12)], "target_id long, protein_id long"
    )
    fa = {r.protein_id: r.fasta for r in tmhmm_fasta(protein, t2tc).collect()}
    assert fa[11] == ">1|P1 protein 1\nMKV\n"

    preds = spark.createDataFrame(
        [(11, "len=500 ExpAA=110 PredHel=5 Topology=o1-20i"),
         (12, "len=300 ExpAA=0.1 PredHel=0 Topology=o"),
         (13, "garbage with no marker")],
        "protein_id long, output string",
    )
    rows = tmhmm_tdl_infos(preds).collect()
    assert len(rows) == 1
    assert rows[0].protein_id == 11 and rows[0].itype == TMHMM_ITYPE
    assert "PredHel=5" in rows[0].string_value
