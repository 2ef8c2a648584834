"""TCRDMP read-surface tests (loaders/TCRDMP.py getters) over the
fixture lake: expression/tissue getters, uberon point + set-based
resolution, nhprotein finders, per-protein annotation getters,
pathway/disease/phenotype getters."""

from __future__ import annotations

import pytest

from tcrd_spark.api import adaptor_mp as mp


@pytest.fixture(scope="module")
def lake(spark):
    from tests.tcrd_fixtures import build_lake

    return build_lake(spark)


def test_expressions_and_tissues(spark, lake):
    assert mp.get_expression_count(lake) == 2
    assert mp.get_expression_count(lake, etype="HPA") == 2
    assert mp.get_expression_count(lake, etype="HPA", oid_flag=True) == 0
    tissues = {r.tissue for r in mp.get_tissues(lake).collect()}
    assert tissues == {"liver", "brain"}


def test_get_uberon_id_point(spark, lake):
    assert [r.uid for r in mp.get_uberon_id(lake, oid="BTO:0000759").collect()] \
        == ["UBERON:0002107"]
    assert [r.uid for r in mp.get_uberon_id(lake, name="Brain").collect()] \
        == ["UBERON:0000955"]
    assert mp.get_uberon_id(lake, oid="BTO:9999999").count() == 0
    with pytest.raises(ValueError):
        mp.get_uberon_id(lake)


def test_resolve_uberon_ids_set_based(spark, lake):
    rows = spark.createDataFrame(
        [
            ("BTO:0000759", "nope"),       # oid wins
            (None, "LIVER"),               # name fallback, case-folded
            (None, "unknown"),             # unresolved -> null uid
        ],
        "oid string, tissue string",
    )
    out = {
        (r.oid, r.tissue): r.uid
        for r in mp.resolve_uberon_ids(
            lake, rows, oid_col="oid", name_col="tissue"
        ).collect()
    }
    assert out[("BTO:0000759", "nope")] == "UBERON:0002107"
    assert out[(None, "LIVER")] == "UBERON:0002107"
    assert out[(None, "unknown")] is None


def test_nhprotein_getters(spark, lake):
    assert mp.get_nhproteins(lake).count() == 2
    assert [
        r.sym for r in mp.get_nhproteins(lake, species="Mus musculus").collect()
    ] == ["Trp53"]
    assert [
        r.id for r in mp.find_nhproteins(lake, sym="Kit").collect()
    ] == [2]
    assert mp.find_nhproteins(
        lake, sym="Kit", species="Mus musculus"
    ).count() == 0
    with pytest.raises(KeyError):
        mp.find_nhproteins(lake, bogus="x")


def test_per_protein_annotation_getters(spark, lake):
    assert mp.get_gtex(lake).count() == 2
    assert [r.tissue for r in mp.get_gtex(lake, protein_id=11).collect()] \
        == ["Liver"]
    assert [
        r.disease_trait for r in mp.get_gwases(lake, protein_id=11).collect()
    ] == ["Height"]
    cv = mp.get_clinvars(lake, protein_id=11).collect()
    assert cv[0].phenotype_name == "Lynch syndrome"
    assert mp.get_generifs(lake).count() == 11
    assert mp.get_pubmed(lake, 1).collect()[0].title == "paper one"
    assert mp.get_pmids(lake).count() == 2
    assert mp.get_cmpd_activities(lake, catype="ChEMBL").count() == 1
    assert mp.get_drug_activities(lake).count() == 2


def test_pathway_disease_phenotype_getters(spark, lake):
    assert mp.get_pathways(lake, pwtype="KEGG").count() == 1
    # pw1 attaches to protein 11 -> target 1 via t2tc
    assert [
        r.target_id
        for r in mp.get_pathway_targets(lake, "KEGG", "pw1").collect()
    ] == [1]
    assert mp.get_diseases(lake, dtype="eRAM").count() == 1
    assert [
        r.target_id for r in mp.get_disease_targets(lake, "DOID:9").collect()
    ] == [1]
    assert mp.get_phenotypes(lake, ptype="OMIM").count() == 2
    assert mp.get_xref_values(lake, "PDB").count() == 2
    assert [
        r.symbol for r in mp.get_ortholog(lake, symbol="Sym1").collect()
    ] == ["Sym1"]
    assert mp.get_orthologs_dbid2id(lake).columns == ["db_id", "ortholog_id"]


def test_counts_and_type_dictionaries(spark, lake):
    assert mp.get_info_types(lake)[:2] == ["Ab Count", "ChEMBL First Reference Year"]
    ct, type_ct = mp.get_count_typecount(lake, "expression")
    assert (ct, type_ct) == (2, 1)
    ct, type_ct = mp.get_count_typecount(lake, "disease")
    assert ct == 5 and type_ct == 3
    assert mp.get_complex_goas(lake).count() == 0
    with pytest.raises(KeyError):
        mp.get_count_typecount(lake, "bogus")


def test_target_iteration_paging(spark, lake):
    assert mp.get_target_count(lake) == 6
    assert mp.get_target_count(lake, past_id=4) == 2
    assert [r.id for r in mp.get_targets(lake, past_id=4).collect()] == [5, 6]
    # fixture targets carry no tdl values (computed downstream)
    assert mp.get_tdl_target_count(lake, "Tclin") == 0
    assert mp.get_tdl_targets(lake, "Tclin").count() == 0
    # idg flag filters (all fixture targets idg=False)
    assert mp.get_target_count(lake, idg=True) == 0
