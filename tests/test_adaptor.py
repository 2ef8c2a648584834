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
    assert [d.name for d in t1.diseases] == [
        "dz-high", "tm-dz", "dz-mid", "dz-low", "eram-dz"
    ]
    assert docs[2].drug_activities[0].drug == "plaindrug"
    # only ids filter
    two = target_documents(lake, target_ids=[1, 2]).count()
    assert two == 2


def test_target_documents_annotation_breadth(spark, lake):
    """The get_protein annotation families land as nested values
    (`loaders/TCRD.py:1953-2125`)."""
    from tcrd_spark.api.adaptor import target_documents

    t1 = {r.target_id: r for r in target_documents(lake).collect()}[1]
    assert len(t1.generifs) == 1
    assert [p.year for p in t1.pmscores] == [2019, 2020]
    assert {p.ptype for p in t1.phenotypes} == {
        "OMIM", "JAX/MGI Human Ortholog Phenotype", "IMPC"
    }
    assert t1.orthologs[0].species == "Mouse"
    assert [p.name for p in t1.pathways] == ["pw1"]
    assert [p.title for p in t1.pubmeds] == ["paper one", "paper two"]
    assert set(t1.features.keys()) == {"DOMAIN", "ACT_SITE"}
    assert [c.pcid for c in t1.panther_classes] == ["PC00001", "PC00002"]
    assert [p.year for p in t1.patent_counts] == [2019, 2020]
    assert t1.compartments[0].go_id == "GO:5"
    assert t1.mlp_assay_infos[0].assay_name == "assay one"
    assert t1.gene_attribute_counts == {
        "CCLE Cell Line Gene Expression Profiles": 3
    }
    assert float(t1.tinx_novelty) == 0.123456
    # score DESC, bad_diseases ('cancer') filtered out (TCRD.py:2108)
    assert [(i.disease, float(i.score)) for i in t1.tinx_importances] == [
        ("asthma", 9.5), ("lung cancer", 5.5)
    ]
    assert t1.kegg_nearest_tclins[0].tclin_id == 12
    assert t1.gwases[0].disease_trait == "Height"
    assert t1.target_tdl_infos["ChEMBL First Reference Year"] == "1999"


def test_export_wide_headers_match_reference(spark, lake):
    """Column set must equal the 47 tcrd2csv --expand headers verbatim
    (`python/tcrd2csv.py:45-47`)."""
    from tcrd_spark.api.adaptor import EXPANDED_HEADER, export_wide_csv_df

    wide = export_wide_csv_df(lake)
    assert wide.columns == EXPANDED_HEADER
    assert len(EXPANDED_HEADER) == 47


def test_export_wide_values(spark, lake):
    from tcrd_spark.api.adaptor import export_wide_csv_df

    rows = {
        r["TCRD ID"]: r.asDict() for r in export_wide_csv_df(lake).collect()
    }
    r1 = rows[1]
    assert r1["Name"] == "P1"
    assert r1["Description"] == "protein 1"
    assert r1["HGNC Sym"] == "SYM1"
    assert r1["DTO ID"] == "DTO:101"
    assert r1["DTO Class"] == "Kinase"
    assert r1["PANTHER Class(es)"] == "PC00001:kinase|PC00002:receptor"
    assert r1["GeneRIF Count"] == 1
    assert r1["NCBI Gene PubMed Count"] == "42"
    assert r1["JensenLab PubMed Score"] == "99.0"
    assert r1["PubTator Score"] == "0"            # default like csv.append(0)
    assert r1["Ab Count"] == "300"
    assert r1["Monoclonal Ab Count"] == "7"
    assert r1["ChEMBL Selective Compound"] == "CHEMBL123:9.1"
    assert r1["ChEMBL First Reference Year"] == "1999"
    assert r1["DrugCentral Activity Count"] == 1
    assert r1["PDB Count"] == 2
    assert r1["PDBs"] == "1ABC|2XYZ"
    assert r1["GO Annotation Count"] == 2
    assert r1["OMIM Phenotype Count"] == 2
    assert r1["OMIM Phenotype(s)"] == "trait-A|trait-B"
    assert r1["JAX/MGI Human Ortholog Phenotype(s)"] == "MP:1:odd gait"
    assert r1["IMPC Ortholog Phenotype(s)"] == "MP:2:short tail"
    assert r1["GWAS Count"] == 1
    assert r1["Pathway Count"] == 1
    assert r1["Pathways"] == "KEGG:pw1"
    assert r1["Total Disease Count"] == 5
    assert r1["Top 5 Text-Mining DISEASES"] == "tm-dz (ZScore: 4.5)"
    assert r1["eRAM Diseases"] == "DOID:9: eram-dz"
    assert r1["EBI Patent Count"] == "13"
    assert r1["Is Transcription Factor"] == 1
    assert r1["TMHMM Prediction"] == "2"
    assert r1["HPA Tissue Specificity Index"] == "0.82"
    assert float(r1["TIN-X Novelty"]) == 0.123456
    # decimal(34,16) → string keeps scale, like str() of MySQLdb Decimals
    assert r1["Top 5 TIN-X Importance(s)"] == (
        "asthma: 9.5000000000000000|lung cancer: 5.5000000000000000"
    )
    # a sparse target: defaults mirror the reference's else branches
    r4 = rows[4]
    assert r4["Ab Count"] == "10"
    assert r4["OMIM Phenotype Count"] is None     # reference appends ''
    assert r4["Is Transcription Factor"] == 0
    assert r4["TMHMM Prediction"] == "0"


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


def test_get_target_features_domain_union(spark, lake):
    from tcrd_spark.api.adaptor import get_target_features

    extra = spark.createDataFrame(
        [
            (50, "Pfam", None, 11, "PF001", 1),
            (51, "Pfam", None, 11, "PF001", 1),      # duplicate: deduped
            (52, "InterPro", None, 11, "IPR9", 1),
            (53, "PROSITE", None, 12, "PS77", 1),
            (54, "Pfam", None, None, "PF-orphan", 1),  # no protein: dropped
        ],
        "id int, xtype string, target_id int, protein_id int, "
        "value string, dataset_id int",
    )
    lake2 = {
        **lake,
        "xref": lake["xref"].unionByName(extra, allowMissingColumns=True),
    }
    feats = {
        (r.protein_id, r.xtype, r.value)
        for r in get_target_features(lake2).collect()
    }
    assert feats == {
        (11, "Pfam", "PF001"),
        (11, "InterPro", "IPR9"),
        (12, "PROSITE", "PS77"),
    }


def test_get_common_pathway(spark, lake):
    from tcrd_spark.api.adaptor import get_common_pathway

    extra = spark.createDataFrame(
        [
            (10, 12, "KEGG", "pw1"),        # shared with P11's pw1
            (11, 12, "KEGG", "pw-only-12"),
            (12, 11, "Reactome", "pw-react"),
        ],
        "id int, protein_id int, pwtype string, name string",
    )
    lake2 = {
        **lake,
        "pathway": lake["pathway"].unionByName(extra, allowMissingColumns=True),
    }
    names = [r.name for r in get_common_pathway(lake2, 11, 12).collect()]
    assert names == ["pw1"]


def test_get_nearest_tclin_directions_and_ties(spark, lake):
    from tcrd_spark.api.adaptor import get_nearest_tclin

    # fixture TDLs: tdl set per target? force: targets 1,2 -> Tclin via
    # override; proteins 11,12 are their components.
    target = lake["target"].withColumn(
        "tdl",
        F.when(F.col("id").isin(1, 2), "Tclin").otherwise(F.col("tdl")),
    )
    kd = spark.createDataFrame(
        [
            (13, 11, 2),   # downstream: 13 -> Tclin 11 at 2
            (13, 12, 2),   # tie at distance 2, kept
            (13, 11, 5),   # non-minimal, dropped by rank window
            (11, 13, 4),   # upstream for 13: Tclin 11 -> 13
            (11, 12, 1),   # between two Tclins: filtered (12 is Tclin)
        ],
        "pid1 int, pid2 int, distance int",
    )
    lake2 = {**lake, "target": target, "kegg_distance": kd}
    rows = {
        (r.protein_id, r.direction, r.tclin_id): r.distance
        for r in get_nearest_tclin(lake2).collect()
    }
    assert rows == {
        (13, "downstream", 11): 2,
        (13, "downstream", 12): 2,   # tie kept like the reference requery
        (13, "upstream", 11): 4,
    }


def test_get_protein_dto_path(spark, lake):
    from tcrd_spark.api.adaptor import get_protein_dto

    dto = spark.createDataFrame(
        [
            ("DTO:root", "root", None),
            ("DTO:mid", "mid", "DTO:root"),
            ("DTO:leaf", "leaf", "DTO:mid"),
        ],
        "id string, name string, parent_id string",
    )
    protein = lake["protein"].withColumn(
        "dtoid", F.when(F.col("id") == 11, "DTO:leaf")
    )
    lake2 = {**lake, "dto": dto, "protein": protein}
    path = {
        (r.ancestor, r.depth) for r in get_protein_dto(lake2).collect()
    }
    assert path == {("DTO:leaf", 0), ("DTO:mid", 1), ("DTO:root", 2)}


def test_tdl_evolution_pivot(spark):
    from tcrd_spark.api.adaptor import tdl_evolution

    v5 = spark.createDataFrame(
        [("P1", "Tdark"), ("P2", "Tbio")], "uniprot string, tdl string"
    )
    v6 = spark.createDataFrame(
        [("P1", "Tbio"), ("P3", "Tclin")], "uniprot string, tdl string"
    )
    out = {
        r.uniprot: (r.v5, r.v6)
        for r in tdl_evolution({"v5": v5, "v6": v6}).collect()
    }
    assert out == {
        "P1": ("Tdark", "Tbio"),
        "P2": ("Tbio", None),
        "P3": (None, "Tclin"),
    }


def test_documents_roundtrip_to_lake(spark, lake):
    """lake → nested documents → normalized tables must lose nothing
    for every covered annotation family (the write-side proof of the
    §3-A assembly)."""
    from tcrd_spark.api.adaptor import documents_to_lake, target_documents

    docs = target_documents(lake).cache()
    try:
        back = documents_to_lake(docs)

        def rows(df, *cols):
            return sorted(tuple(r[c] for c in cols) for r in df.collect())

        # (label, back side, want side, columns) — collected via a
        # thread pool: each pair re-executes the (cached) assembly, so
        # serial collects dominated this test's wall
        cases = [
            ("target", back["target"], lake["target"], ("id", "name")),
            ("protein", back["protein"], lake["protein"],
             ("id", "uniprot", "dtoclass")),
            ("t2tc", back["t2tc"], lake["t2tc"],
             ("target_id", "protein_id")),
            ("alias", back["alias"], lake["alias"],
             ("protein_id", "type", "value")),
            ("goa", back["goa"], lake["goa"], ("protein_id", "go_id")),
            ("expression", back["expression"], lake["expression"],
             ("protein_id", "tissue", "qual_value")),
            ("generif", back["generif"], lake["generif"],
             ("protein_id", "text")),
            ("pmscore", back["pmscore"], lake["pmscore"],
             ("protein_id", "year", "score")),
            # protein-attached xrefs (the target-attached branch lives
            # on the target document's own xref map, not this one)
            ("xref", back["xref"],
             lake["xref"].filter(F.col("protein_id").isNotNull()),
             ("protein_id", "xtype", "value")),
            ("disease", back["disease"],
             lake["disease"].filter(F.col("target_id").isNotNull()),
             ("target_id", "name")),
            ("drug_activity", back["drug_activity"],
             lake["drug_activity"], ("target_id", "drug")),
            ("phenotype", back["phenotype"], lake["phenotype"],
             ("protein_id", "ptype", "trait")),
            ("pathway", back["pathway"],
             lake["pathway"].filter(F.col("protein_id").isNotNull()),
             ("protein_id", "name")),
        ]

        def diff(case):
            label, got_df, want_df, cols = case
            got, want = rows(got_df, *cols), rows(want_df, *cols)
            return None if got == want else (label, got, want)

        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(8) as pool:
            bad = [d for d in pool.map(diff, cases) if d]
        assert not bad, bad
    finally:
        docs.unpersist()
