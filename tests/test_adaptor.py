"""DBAdaptor-surface tests over the TCRD-shaped fixture lake: entity
joins, xref two-branch dedup, EAV dereference, nested target document,
wide export, lake-driven TDL, resolve cascade."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def lake(spark):
    from tests.tcrd_fixtures import build_lake

    return build_lake(spark)


def test_entity_join(spark, lake):
    from tcrd_spark.api.adaptor import entity

    rows = entity(lake).collect()
    assert len(rows) == 6
    got = {(r.target_id, r.uniprot) for r in rows}
    assert (1, "U00001") in got and (6, "U00006") in got


def test_find_targets(spark, lake):
    from tcrd_spark.api.adaptor import find_targets

    assert [r.target_id for r in find_targets(lake, sym="SYM3").collect()] == [3]
    assert (
        find_targets(lake, uniprot="U00002", sym="SYM2").count() == 1
    )
    assert find_targets(lake, uniprot="U00002", sym="SYM3").count() == 0
    with pytest.raises(KeyError):
        find_targets(lake, bogus="x")


def test_find_targets_by_xref_two_branches_dedup(spark, lake):
    from tcrd_spark.api.adaptor import find_targets_by_xref

    # ENSG000001 exists target-attached (T1) AND protein-attached (P11->T1)
    got = [r.target_id for r in find_targets_by_xref(lake, "Ensembl", "ENSG000001").collect()]
    assert got == [1]
    got2 = [r.target_id for r in find_targets_by_xref(lake, "Ensembl", "ENSG000002").collect()]
    assert got2 == [2]


def test_eav_dereference_types(spark, lake):
    from tcrd_spark.functions.eav import dereference, pivot_infos

    d = dereference(lake["tdl_info"], lake["info_type"])
    by_type = {
        (r.itype, r.protein_id): r.value
        for r in d.collect()
    }
    assert by_type[("JensenLab PubMed Score", 11)] == "99.0"
    assert by_type[("Ab Count", 14)] == "10"
    assert by_type[("Experimental MF/BP Leaf Term GOA", 15)] == "true"
    assert by_type[("UniProt Function", 16)] == "does things"

    wide = pivot_infos(
        lake["tdl_info"], lake["info_type"],
        ["JensenLab PubMed Score", "Ab Count"],
    )
    row = {r.protein_id: r for r in wide.collect()}[14]
    assert row["JensenLab PubMed Score"] == "2.0"
    assert row["Ab Count"] == "10"


def test_get_beans(spark, lake):
    from tcrd_spark.api.adaptor import get_beans

    beans = {
        (r.table_name, r.type): r.ct for r in get_beans(lake).collect()
    }
    assert beans[("target", None)] == 6
    assert beans[("xref", "Ensembl")] == 3
    assert beans[("expression", "HPA")] == 2


def test_target_documents_nested(spark, lake):
    from tcrd_spark.api.adaptor import target_documents

    docs = {r.target_id: r for r in target_documents(lake).collect()}
    t1 = docs[1]
    assert t1.uniprot == "U00001"
    assert t1.tdl_infos["JensenLab PubMed Score"] == "99.0"
    assert t1.xrefs["Ensembl"] == ["ENSG000001"]
    assert {g.go_id for g in t1.goas} == {"GO:1", "GO:2"}
    assert len(t1.expressions) == 2
    # diseases ordered by zscore desc
    assert [d.name for d in t1.diseases] == ["dz-high", "dz-mid", "dz-low"]
    assert docs[2].drug_activities[0].drug == "plaindrug"
    # only ids filter
    two = target_documents(lake, target_ids=[1, 2]).count()
    assert two == 2


def test_export_wide(spark, lake):
    from tcrd_spark.api.adaptor import export_wide_csv_df

    rows = {r.target_id: r for r in export_wide_csv_df(lake).collect()}
    assert rows[1].top5_diseases == "dz-high|dz-mid|dz-low"
    assert rows[1].alias_count == 1
    assert rows[1].aliases_pipe == "ALIAS1"
    assert rows[1].pubmed_score == "99.0"
    assert rows[4].ab_count == "10"


def test_tdl_from_lake_matches_reference_branches(spark, lake):
    from tcrd_spark.analytics.tdl import compute_tdl, features_from_lake

    out = {
        r.target_id: (r.tdl, r.bump_flag)
        for r in compute_tdl(features_from_lake(lake)).collect()
    }
    assert out[1] == ("Tclin", False)
    assert out[2] == ("Tchem", False)
    assert out[3] == ("Tchem", False)
    assert out[4] == ("Tdark", False)
    assert out[5] == ("Tbio", True)   # bumped by efl_goa
    assert out[6] == ("Tbio", False)


def test_resolve_cascade_and_zero_fill(spark, lake):
    from tcrd_spark.etl.resolve import resolve, zero_fill

    incoming = spark.createDataFrame(
        [
            ("9606.ENSP00000001", None, 10.0),   # hits stringid (P11)
            ("missing", "SYM3", 20.0),           # falls back to sym (P13)
            ("missing", "NOPE", 30.0),           # notfnd
        ],
        "ext_string string, ext_sym string, score double",
    )
    res = resolve(
        incoming,
        lake["protein"],
        keys=[("ext_string", "stringid"), ("ext_sym", "sym")],
        id_col="id",
        out_col="protein_id",
    )
    resolved = {r.protein_id: r.score for r in res.resolved.collect()}
    assert resolved == {11: 10.0, 13: 20.0}
    assert res.unresolved.count() == 1

    # zero-fill: proteins without a score get 0 (InsZeroJLPMSs pattern)
    base = lake["protein"].select(F.col("id").alias("protein_id"))
    scores = res.resolved.select("protein_id", "score")
    filled = {
        r.protein_id: r.score
        for r in zero_fill(base, scores, "protein_id", "score").collect()
    }
    assert filled[11] == 10.0 and filled[12] == 0.0
