"""Mutation-surface tests: upd_* / del_* / del_target cascade /
tdl_update_log — semantics mirror `loaders/TCRD.py:2920-3345`."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def lake(spark):
    from tests.tcrd_fixtures import build_lake

    return build_lake(spark)


def test_upd_target_point_update(lake):
    from tcrd_spark.api.adaptor_mut import upd_target

    new = upd_target(lake, 4, "tdl", "Tbio")
    got = {r.id: r.tdl for r in new.select("id", "tdl").collect()}
    assert got[4] == "Tbio"
    # every other row untouched
    old = {r.id: r.tdl for r in lake["target"].select("id", "tdl").collect()}
    assert all(got[i] == old[i] for i in old if i != 4)


def test_do_update_generic(lake):
    from tcrd_spark.api.adaptor_mut import do_update

    new = do_update(
        lake, {"table": "protein", "id": 12, "col": "sym", "val": "NEWSYM"}
    )
    assert new.filter("id = 12").collect()[0].sym == "NEWSYM"
    with pytest.raises(ValueError, match="missing key"):
        do_update(lake, {"table": "protein", "id": 12})


def test_del_protein_xrefs_typed_and_all(lake):
    from tcrd_spark.api.adaptor_mut import del_protein_xrefs

    pid = 11
    before = lake["xref"].filter(F.col("protein_id") == pid)
    xtypes = [r.xtype for r in before.select("xtype").distinct().collect()]
    assert len(xtypes) >= 2  # fixture has several types on protein 11
    one = del_protein_xrefs(lake, pid, xtype=xtypes[0])
    assert one.filter(
        (F.col("protein_id") == pid) & (F.col("xtype") == xtypes[0])
    ).count() == 0
    assert one.filter(F.col("protein_id") == pid).count() > 0
    # untyped form sweeps everything for the protein, nothing else
    allgone = del_protein_xrefs(lake, pid)
    assert allgone.filter(F.col("protein_id") == pid).count() == 0
    assert allgone.count() == lake["xref"].filter(
        F.col("protein_id") != pid
    ).count()


def test_del_expressions_generifs_goas(lake):
    from tcrd_spark.api import adaptor_mut as m

    assert m.del_protein_expressions(lake, 11).filter(
        "protein_id = 11"
    ).count() == 0
    assert m.del_generifs(lake, 11).filter("protein_id = 11").count() == 0
    assert m.del_goas(lake, 11).filter("protein_id = 11").count() == 0
    assert m.del_target_drug_activity(lake, 1).filter(
        "target_id = 1"
    ).count() == 0
    assert m.del_target_cmpd_activity(lake, 3).filter(
        "target_id = 3"
    ).count() == 0


def test_del_target_cascade(lake):
    from tcrd_spark.api.adaptor_mut import del_target

    out = del_target(lake, 1)
    # ~20 independent count() probes — fan them over a thread pool
    # (each was its own serial Spark job; the test was latency-bound)
    cases: list[tuple[str, object, object]] = [
        ("target gone", out["target"].filter("id = 1"), 0),
        ("t2tc gone", out["t2tc"].filter("target_id = 1"), 0),
        # protein 11 (target 1's component) and every child row with it
        ("protein gone", out["protein"].filter("id = 11"), 0),
        # other targets' data survives
        ("target count", out["target"], lake["target"].count() - 1),
        ("tdl_info p12", out["tdl_info"].filter("protein_id = 12"),
         lake["tdl_info"].filter("protein_id = 12").count()),
        # dictionaries/lineage are exempt from the sweep
        ("dataset kept", out["dataset"], lake["dataset"].count()),
        # non-standard FK columns (kegg_distance.pid1/pid2,
        # kegg_nearest_tclin.tclin_id) are swept via
        # integrity.FK_EDGES — the reference's ON DELETE CASCADE
        # (SQL/create-TCRDv7.sql:1022,1052)
        ("kegg_distance swept",
         out["kegg_distance"].filter("pid1 = 11 OR pid2 = 11"), 0),
        ("kegg_distance survives",
         out["kegg_distance"].filter("pid1 = 12"), 1),
        ("kegg_nearest swept",
         out["kegg_nearest_tclin"].filter(
             "protein_id = 11 OR tclin_id = 11"), 0),
        ("kegg_nearest survives",
         out["kegg_nearest_tclin"].filter("id = 3"), 1),
    ]
    for tbl in ("xref", "tdl_info", "expression", "goa", "generif",
                "pmscore", "phenotype"):
        if "protein_id" in out[tbl].columns:
            cases.append(
                (f"{tbl} p11", out[tbl].filter("protein_id = 11"), 0)
            )
    for tbl in ("drug_activity", "disease", "tdl_update_log"):
        if "target_id" in out[tbl].columns:
            cases.append(
                (f"{tbl} t1", out[tbl].filter("target_id = 1"), 0)
            )

    from concurrent.futures import ThreadPoolExecutor

    def probe(case):
        label, df, want = case
        got = df.count()
        return None if got == want else (label, got, want)

    with ThreadPoolExecutor(8) as pool:
        bad = [b for b in pool.map(probe, cases) if b]
    assert not bad, bad
    # and the lake passes its own FK audit after the cascade
    from tcrd_spark.quality.integrity import assert_clean

    assert_clean(out)


def test_tdl_update_log_history_and_append(spark, lake):
    from tcrd_spark.api.adaptor_mut import (
        get_tdl_update_log,
        ins_tdl_update_log,
    )

    hist = get_tdl_update_log(lake, 1).collect()
    assert [r.new_tdl for r in hist] == ["Tclin", "Tchem"]  # newest first
    add = spark.createDataFrame(
        [(4, 2, "Tbio", "Tchem", "tester", "2021-01-01 00:00:00")],
        "id long, target_id long, old_tdl string, new_tdl string, "
        "person string, datetime string",
    )
    grown = ins_tdl_update_log({"tdl_update_log": lake["tdl_update_log"]}, add)
    assert grown.count() == lake["tdl_update_log"].count() + 1


def test_ins_rows_validates_and_appends(spark, lake):
    from tcrd_spark.api.adaptor_mut import ins_rows

    add = spark.createDataFrame(
        [(7, "T7", "Single Protein", "Tbio")],
        "id long, name string, ttype string, tdl string",
    )
    grown = ins_rows(lake, "target", add)
    assert grown.count() == lake["target"].count() + 1
    # required column missing → immediate ValueError
    with pytest.raises(ValueError, match="required columns absent"):
        ins_rows(lake, "target", add.select("id", "tdl"))
    # unknown table
    with pytest.raises(ValueError, match="unknown table"):
        ins_rows(lake, "nope", add)
    # enum violation surfaces at action time, like MySQL's enum CHECK
    bad = spark.createDataFrame(
        [(8, "T8", "Single Protein", "Tmagenta")],
        "id long, name string, ttype string, tdl string",
    )
    with pytest.raises(Exception, match="enum violation"):
        ins_rows(lake, "target", bad).collect()


def test_named_ins_wrappers(spark, lake):
    from tcrd_spark.api import adaptor_mut as m

    # every named wrapper binds a real schema table and validates
    for fn_name in [n for n in dir(m) if n.startswith("ins_")
                    and n not in ("ins_rows", "ins_tdl_update_log")]:
        fn = getattr(m, fn_name)
        assert fn.__doc__ and "loaders/TCRD" in fn.__doc__, fn_name
    add = spark.createDataFrame(
        [(99, 11, "KEGG", "test pathway")],
        "id long, protein_id long, pwtype string, name string",
    )
    grown = m.ins_pathway(lake, add)
    assert grown.count() == lake["pathway"].count() + 1
    # direction enum on kegg_nearest_tclin enforced through the wrapper
    bad = spark.createDataFrame(
        [(9, 15, 13, "sideways", 1)],
        "id long, protein_id long, tclin_id long, direction string, "
        "distance long",
    )
    with pytest.raises(Exception, match="enum violation"):
        m.ins_kegg_nearest_tclin(lake, bad).collect()


def test_ins_rows_rejects_unknown_columns(spark, lake):
    from tcrd_spark.api.adaptor_mut import ins_rows

    add = spark.createDataFrame(
        [(9, "T9", "Single Protein", "bogus")],
        "id long, name string, ttype string, not_a_column string",
    )
    with pytest.raises(ValueError, match="unknown columns"):
        ins_rows(lake, "target", add)
