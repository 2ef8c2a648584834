"""Annotation-loader families (loaders_annot) against the fixture lake,
hand-computed expectations per FIXTURES.md §C conventions."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from tests.tcrd_fixtures import build_lake


@pytest.fixture(scope="module")
def lake(spark):
    return build_lake(spark)


def test_jensenlab_diseases(spark, lake, tmp_path):
    # knowledge: ENSP00000001 resolves by stringid; UNKNOWN falls back
    # to sym SYM2; experiment conf=0 row skipped; textmining carries
    # zscore. One fully-unresolvable row -> notfnd.
    k = tmp_path / "k.tsv"
    k.write_text(
        "ENSP00000001\tSYM1\tDOID:1\tasthma\tGHR\tCURATED\t5\n"
        "UNKNOWN\tSYM2\tDOID:2\tflu\tUniProtKB-KW\tCURATED\t4\n"
    )
    e = tmp_path / "e.tsv"
    e.write_text(
        "ENSP00000003\tSYM3\tDOID:3\tgout\tDistiLD\tr=0.5\t2\n"
        "ENSP00000004\tSYM4\tDOID:4\tals\tDistiLD\tr=0.1\t0\n"   # conf 0: skip
    )
    t = tmp_path / "t.tsv"
    t.write_text(
        "ENSP00000005\tSYM5\tDOID:5\tcancer\t4.5\t2.1\n"
        "NOPE\tNOSYM\tDOID:6\tnone\t1.0\t1.0\n"                  # notfnd
    )
    from tcrd_spark.etl.loaders_annot import load_jensenlab_diseases

    out = load_jensenlab_diseases(
        spark, lake["protein"], knowledge_path=str(k),
        experiment_path=str(e), textmining_path=str(t),
    )
    rows = {r.protein_id: r for r in out.disease.collect()}
    assert rows[11].dtype == "JensenLab Knowledge GHR"
    assert rows[11].evidence == "CURATED" and rows[11].conf == 5.0
    assert rows[12].did == "DOID:2"          # sym fallback hit
    assert rows[13].dtype == "JensenLab Experiment DistiLD"
    assert 14 not in rows                     # conf=0 skipped
    assert rows[15].dtype == "JensenLab Text Mining"
    assert rows[15].zscore == 4.5 and rows[15].evidence is None
    assert out.notfnd.count() == 1


def test_jensenlab_tissues(spark, lake, tmp_path):
    # fixture uberon: UBERON:0000955 'brain' with xref BTO:0000142
    # (see tcrd_fixtures). oid wins over name; name-only row resolves
    # by lowercased name; unknown tissue lands in no_uberon.
    k = tmp_path / "k.tsv"
    k.write_text(
        "ENSP00000001\tSYM1\tBTO:0000142\tBrain\tUniProt\tCURATED\t3\n"
        "ENSP00000002\tSYM2\t\tbrain\tUniProt\tCURATED\t2\n"
        "ENSP00000003\tSYM3\t\tnowhere-tissue\tUniProt\tCURATED\t1\n"
    )
    e = tmp_path / "e.tsv"
    e.write_text("ENSP00000004\tSYM4\t\tBrain\tHPA\tHigh\t2\n")
    from tcrd_spark.etl.loaders_annot import load_jensenlab_tissues

    out = load_jensenlab_tissues(
        spark, lake["protein"], lake,
        knowledge_path=str(k), experiment_path=str(e),
    )
    rows = {r.protein_id: r for r in out.expression.collect()}
    assert rows[11].etype == "JensenLab Knowledge UniProt"
    assert rows[11].boolean_value is True and rows[11].string_value is None
    assert rows[11].uberon_id == "UBERON:0000955"    # via oid xref
    assert rows[12].uberon_id == "UBERON:0000955"    # via name
    assert rows[13].uberon_id is None
    assert rows[14].string_value == "High"           # experiment channel
    assert rows[14].boolean_value is None
    assert {r.tissue for r in out.no_uberon.collect()} == {"nowhere-tissue"}


def test_jensenlab_compartments(spark, lake, tmp_path):
    k = tmp_path / "k.tsv"
    k.write_text(
        "ENSP00000001\tSYM1\tGO:0005634\tNucleus\tUniProt\tCURATED\t5\n"
        "ENSP00000002\tSYM2\tGO:0005737\tCytosol\tUniProt\tCURATED\t2\n"  # <3
    )
    t = tmp_path / "t.tsv"
    t.write_text(
        "ENSP00000003\tSYM3\tGO:0005739\tMito\t4.2\t2.0\n"
        "ENSP00000004\tSYM4\tGO:0005575\tCell\t1.5\t1.0\n"       # zscore<3
    )
    from tcrd_spark.etl.loaders_annot import load_jensenlab_compartments

    out = load_jensenlab_compartments(
        spark, lake["protein"], knowledge_path=str(k), textmining_path=str(t)
    )
    rows = {r.protein_id: r for r in out.compartment.collect()}
    assert set(rows) == {11, 13}
    assert rows[11].ctype == "JensenLab Knowledge"
    assert rows[11].evidence == "UniProt CURATED"    # source+evidence concat
    assert rows[13].zscore == 4.2
    assert out.skipped == 2


def test_pubtator_scores(spark, lake, tmp_path):
    # fixture geneids are 101..106. Multi-id cell '101,102' explodes;
    # '(tax:10090)' entries are dropped; 999 -> notfnd.
    tsv = tmp_path / "pubtator_counts.tsv"
    tsv.write_text(
        "101,102\t2019\t1.5\n"
        "101\t2020\t2.0\n"
        "999(tax:10090)\t2020\t5.0\n"
        "999\t2020\t7.0\n"
    )
    from tcrd_spark.etl.loaders_annot import PUBTATOR_ITYPE, load_pubtator_scores

    out = load_pubtator_scores(spark, str(tsv), lake["protein"])
    assert out.scores.count() == 3
    sums = {r.protein_id: r.number_value for r in out.tdl_info.collect()}
    assert sums == {11: 3.5, 12: 1.5}
    assert out.tdl_info.first().itype == PUBTATOR_ITYPE
    assert out.notfnd.count() == 1


def test_patent_counts(spark, lake, tmp_path):
    csv = tmp_path / "patents.csv"
    csv.write_text(
        "uniprot,gene,year,count\n"
        "U00001,SYM1,2018,3\n"
        "U00001,SYM1,2019,4\n"
        "U00002,SYM2,2019,10\n"
        "UNKNOWN,NOPE,2019,1\n"
    )
    from tcrd_spark.etl.loaders_annot import PATENT_ITYPE, load_patent_counts

    out = load_patent_counts(spark, str(csv), lake["protein"])
    assert out.scores.count() == 3
    sums = {r.protein_id: r.integer_value for r in out.tdl_info.collect()}
    assert sums == {11: 7, 12: 10}
    assert out.tdl_info.schema["integer_value"].dataType.simpleString() == "int"
    assert out.tdl_info.first().itype == PATENT_ITYPE
    assert out.notfnd.count() == 1


def test_homologene(spark, lake, tmp_path):
    # fixture nhprotein: (id=1, taxid=10090, geneid=22059),
    # (id=2, taxid=10116, geneid=64030). Zebrafish 7955 is skipped.
    tsv = tmp_path / "homologene.data"
    tsv.write_text(
        "3\t9606\t101\tSYM1\n"
        "3\t10090\t22059\tMsym\n"
        "3\t10116\t64030\tRsym\n"
        "3\t7955\t301\tZsym\n"
        "4\t9606\t999\tNOPE\n"
    )
    from tcrd_spark.etl.loaders_annot import load_homologene

    out = load_homologene(spark, str(tsv), lake["protein"], lake["nhprotein"])
    rows = out.homologene.collect()
    human = {r.protein_id for r in rows if r.protein_id is not None}
    nonhuman = {r.nhprotein_id for r in rows if r.nhprotein_id is not None}
    assert human == {11} and nonhuman == {1, 2}
    assert all(r.groupid == 3 for r in rows)
    assert out.skipped == 1
    assert out.notfnd.count() == 1


def test_panther_classes(spark, lake, tmp_path):
    relations = tmp_path / "relations.tsv"
    relations.write_text(
        "PC00001\tkinase\tPC00000\n"
        "PC00001\tkinase\tPC00099\n"
    )
    classes = tmp_path / "classes.tsv"
    classes.write_text(
        "PC00001\tx\tProtein kinase\tphosphorylates\n"
        "PC00001\tx\tProtein kinase\tdupe-row\n"
        "PC00002\tx\tReceptor\t\n"
    )
    p2pc = tmp_path / "p2pc.tsv"
    lines = []
    row = ["HUMAN|HGNC=1|UniProtKB=U00001"] + [""] * 7 + ["#PC00001;#PC00002"]
    lines.append("\t".join(row))
    row = ["HUMAN|HGNC=2|UniProtKB=NOPE"] + [""] * 7 + ["#PC00001"]  # notfnd
    lines.append("\t".join(row))
    row = ["HUMAN|HGNC=3|UniProtKB=U00003"] + [""] * 7 + [""]        # no class
    lines.append("\t".join(row))
    p2pc.write_text("\n".join(lines) + "\n")
    from tcrd_spark.etl.loaders_annot import load_panther_classes

    out = load_panther_classes(
        spark, str(relations), str(classes), str(p2pc), lake["protein"]
    )
    cls = {r.pcid: r for r in out.panther_class.collect()}
    assert set(cls) == {"PC00001", "PC00002"}
    assert sorted(cls["PC00001"].parent_pcids.split("|")) == ["PC00000", "PC00099"]
    bridge = {(r.protein_id, r.pcid) for r in out.p2pc.collect()}
    assert bridge == {(11, "PC00001"), (11, "PC00002")}
    assert out.notfnd.count() == 1


def test_drgc_resources(spark, lake, tmp_path):
    jl = tmp_path / "drgc.jsonl"
    recs = [
        {"resourceType": "Antibody", "target": "SYM1",
         "resource": {"vendor": "x", "catalog": "ab-1"}},
        {"resourceType": "Dataset", "target": "SYM2", "resource": {"n": 1}},
        {"resourceType": "Mouse", "target": "NOSYM", "resource": {"n": 2}},
    ]
    jl.write_text("\n".join(json.dumps(r) for r in recs) + "\n")
    from tcrd_spark.etl.loaders_annot import load_drgc_resources

    out = load_drgc_resources(
        spark, str(jl), lake["target"], lake["t2tc"], lake["protein"]
    )
    rows = out.drgc_resource.collect()
    assert len(rows) == 1 and rows[0].target_id == 1
    assert json.loads(rows[0].json) == {"vendor": "x", "catalog": "ab-1"}
    assert out.skipped == 1 and out.notfnd.count() == 1


def test_idg_list(spark, lake, tmp_path):
    csv = tmp_path / "idg.csv"
    csv.write_text(
        "SYM1,Tdark,GPCR,oGPCR\n"
        "SYM2,Tbio,Kinase,\n"      # empty famext: fam set, famext kept
        "NOSYM,Tdark,IC,\n"
    )
    from tcrd_spark.etl.loaders_annot import load_idg_list

    out = load_idg_list(
        spark, str(csv), lake["target"], lake["t2tc"], lake["protein"]
    )
    rows = {r.id: r for r in out.target.collect()}
    assert rows[1].idg is True and rows[1].fam == "GPCR"
    assert rows[1].famext == "oGPCR"
    assert rows[2].idg is True and rows[2].fam == "Kinase"
    assert rows[2].famext is None            # empty string did not overwrite
    assert rows[3].idg is False              # untouched target
    assert out.notfnd.count() == 1
    assert out.multfnd.count() == 0


def test_generif_years(spark, lake):
    from tcrd_spark.etl.loaders_annot import generif_years
    from tests.tcrd_fixtures import _df

    generif = _df(spark, "generif", [
        dict(id=1, protein_id=11, pubmed_ids="1001|1002|1001", text="a"),
        dict(id=2, protein_id=12, pubmed_ids="9999", text="b"),
    ])
    pubmed = _df(spark, "pubmed", [
        dict(id=1001, title="t1", date="2019 Jan 5"),
        dict(id=1002, title="t2", date="2021"),
    ])
    out = {r.id: r for r in generif_years(generif, pubmed).collect()}
    # dupes removed keeping order; years aligned with pmid order
    assert out[1].pubmed_ids == "1001|1002"
    assert out[1].years == "2019|2021"
    # no resolvable year: years stays NULL (reference skips the update)
    assert out[2].years is None
