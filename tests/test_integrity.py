"""FK-integrity audit tests (`tcrd_spark/quality/integrity.py`)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def lake(spark):
    from tests.tcrd_fixtures import build_lake

    return build_lake(spark)


def test_fixture_lake_is_clean(lake):
    from tcrd_spark.quality.integrity import fk_orphans

    # ONE execution of the all-edges union plan; every assertion
    # (breadth, cleanliness — what assert_clean checks) derives from
    # the same collected rows
    rows = fk_orphans(lake).collect()
    assert len(rows) > 10  # plenty of edges actually audited
    assert [r for r in rows if r.orphan_ct > 0] == []


def test_orphans_detected_and_reported(spark, lake):
    from tcrd_spark.quality.integrity import assert_clean, fk_orphans

    broken = dict(lake)
    extra = spark.createDataFrame(
        [(999, 888, "Ensembl", "ENSGX")],
        "id long, protein_id long, xtype string, value string",
    )
    broken["xref"] = lake["xref"].select(
        "id", "protein_id", "xtype", "value"
    ).unionByName(extra)
    rep = {
        (r.child_table, r.fk_col): r.orphan_ct
        for r in fk_orphans(broken).collect()
    }
    assert rep[("xref", "protein_id")] == 1
    with pytest.raises(AssertionError, match="xref"):
        assert_clean(broken)


def test_del_target_leaves_clean_lake(lake):
    """The cascade and the audit agree: deleting a target leaves no
    dangling FK anywhere."""
    from tcrd_spark.api.adaptor_mut import del_target
    from tcrd_spark.quality.integrity import assert_clean

    assert_clean(del_target(lake, 1))


def test_diff_reports_insert_signal(spark, lake):
    """count_report diffing reproduces the build log's 'Inserted N
    rows' signal: appending rows to one table shows exactly that
    table's delta, everything unchanged is suppressed."""
    from tcrd_spark.api.adaptor_mut import ins_rows
    from tcrd_spark.quality.provenance import count_report, diff_reports

    before = count_report(lake)
    add = spark.createDataFrame(
        [(901, 11, "KEGG", "pw-a"), (902, 12, "KEGG", "pw-b")],
        "id long, protein_id long, pwtype string, name string",
    )
    after_lake = dict(lake)
    after_lake["pathway"] = ins_rows(lake, "pathway", add)
    deltas = diff_reports(before, count_report(after_lake)).collect()
    assert all(r.table_name == "pathway" for r in deltas)
    assert sum(r.delta for r in deltas) >= 2  # 2 rows, per-type split
