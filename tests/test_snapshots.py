"""Versioned-manifest time travel (sources/snapshots.py): the
write-v1 → merge → read-v1-byte-identical contract, copy-on-write
file sharing, provenance accounting, and retention GC."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tcrd_spark.sources import snapshots as snap


def _orders(spark, sf_dir):
    from tcrd_spark.sources.lake import load_table

    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus",
        F.round("o_totalprice", 2).alias("o_totalprice"),
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_read_v1_is_byte_identical_after_merge(spark, sf_dir, tmp_path):
    table = str(tmp_path / "t")
    orders = _orders(spark, sf_dir)
    v1_rows = _rows(orders)
    assert snap.create_table(orders, table, "o_orderstatus") == 1

    updates = orders.where("o_orderkey % 17 = 0").select(
        "o_orderkey", "o_orderstatus",
        F.round(F.col("o_totalprice") + 100.0, 2).alias("o_totalprice"),
    )
    assert snap.merge_version(spark, table, updates, ["o_orderkey"]) == 2

    # v1 re-reads exactly the pre-merge state; latest shows the merge
    assert _rows(snap.read_version(spark, table, 1)) == v1_rows
    from tcrd_spark.sources.merge import merge_frames

    want = _rows(merge_frames(orders, updates, ["o_orderkey"]))
    assert _rows(snap.read_version(spark, table)) == want
    assert snap.versions(table) == [1, 2]


def test_copy_on_write_shares_untouched_partition_files(
    spark, sf_dir, tmp_path
):
    table = str(tmp_path / "t")
    orders = _orders(spark, sf_dir)
    snap.create_table(orders, table, "o_orderstatus")
    # source touches only one partition ('F') — every other
    # partition's files must carry forward BY REFERENCE, untouched
    src = orders.where("o_orderstatus = 'F' and o_orderkey % 5 = 0")
    before = {
        f: os.path.getmtime(os.path.join(table, "data", f))
        for f in snap._read_manifest(table, 1)["files"]
    }
    snap.merge_version(spark, table, src, ["o_orderkey"])
    d = snap.manifest_diff(table, 1, 2)
    assert d["carried"], "untouched partitions must be shared"
    assert all("o_orderstatus=F" not in f for f in d["carried"])
    assert all("o_orderstatus=F" in f for f in d["removed"])
    for f, mt in before.items():
        assert os.path.getmtime(os.path.join(table, "data", f)) == mt
    # provenance accounts every file of v2
    m2 = set(snap._read_manifest(table, 2)["files"])
    assert m2 == set(d["carried"]) | set(d["added"])


def test_merge_into_new_partition_inserts(spark, sf_dir, tmp_path):
    table = str(tmp_path / "t")
    orders = _orders(spark, sf_dir)
    snap.create_table(orders, table, "o_orderstatus")
    novel = spark.createDataFrame(
        [(999_999_001, "Z", 1.0), (999_999_002, "Z", 2.0)],
        "o_orderkey long, o_orderstatus string, o_totalprice double",
    )
    snap.merge_version(spark, table, novel, ["o_orderkey"])
    latest = snap.read_version(spark, table)
    assert latest.where("o_orderstatus = 'Z'").count() == 2
    assert latest.count() == orders.count() + 2


def test_vacuum_never_touches_retained_versions(spark, sf_dir, tmp_path):
    table = str(tmp_path / "t")
    orders = _orders(spark, sf_dir)
    snap.create_table(orders, table, "o_orderstatus")
    for i in (17, 19, 23):
        src = orders.where(f"o_orderkey % {i} = 0").select(
            "o_orderkey", "o_orderstatus",
            F.round(F.col("o_totalprice") + float(i), 2).alias(
                "o_totalprice"
            ),
        )
        snap.merge_version(spark, table, src, ["o_orderkey"])
    keep_last2 = _rows(snap.read_version(spark, table, 3))
    latest = _rows(snap.read_version(spark, table, 4))
    removed = snap.vacuum(table, keep_versions=2)
    assert snap.versions(table) == [3, 4]
    # retained versions still read exactly as before the GC
    assert _rows(snap.read_version(spark, table, 3)) == keep_last2
    assert _rows(snap.read_version(spark, table, 4)) == latest
    # GC'd files are really gone and were never referenced by 3 or 4
    live = set(snap._read_manifest(table, 3)["files"]) | set(
        snap._read_manifest(table, 4)["files"]
    )
    assert not set(removed) & live


def test_concurrent_commit_of_same_version_fails_loudly(
    spark, sf_dir, tmp_path
):
    import pytest

    table = str(tmp_path / "t")
    orders = _orders(spark, sf_dir)
    snap.create_table(orders, table, "o_orderstatus")
    with pytest.raises(FileExistsError, match="already committed"):
        snap._commit(
            table,
            {"version": 1, "parent": None, "op": "create",
             "part_col": "o_orderstatus", "files": []},
        )
