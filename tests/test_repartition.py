"""Partition-evolution pins (snapshots.repartition_table): rows are
identical across the boundary, prior versions keep their original
layout, subsequent commits adopt the new spec automatically, the CDC
feed across the rewrite is EMPTY (no row changed), and the streaming
source treats it as a change commit."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tcrd_spark.sources import snapshots as snap


def _mk(spark, sf_dir, tmp_path):
    from tcrd_spark.sources.lake import load_table

    table = str(tmp_path / "t")
    orders = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_orderpriority",
                F.round("o_totalprice", 2).alias("o_totalprice"))
        .orderBy("o_orderkey")
        .limit(60)
    )
    snap.create_table(orders, table, "o_orderstatus")
    return table, orders


def test_rows_identical_layout_evolves(spark, sf_dir, tmp_path):
    table, orders = _mk(spark, sf_dir, tmp_path)
    before = sorted(map(tuple, snap.read_version(spark, table).collect()))
    v = snap.repartition_table(spark, table, "o_orderpriority")
    assert v == 2
    after = sorted(map(tuple, snap.read_version(spark, table).collect()))
    assert after == before
    # the new snapshot's files live under the NEW spec's directories
    m2 = snap._read_manifest(table, 2)
    assert m2["part_col"] == "o_orderpriority"
    assert m2["prev_part_col"] == "o_orderstatus"
    assert all(f.startswith("o_orderpriority=") for f in m2["files"])
    # the OLD snapshot still reads its original layout untouched
    m1 = snap._read_manifest(table, 1)
    assert all(f.startswith("o_orderstatus=") for f in m1["files"])
    old = sorted(
        map(tuple, snap.read_version(spark, table, 1).collect())
    )
    assert old == before


def test_future_commits_adopt_the_new_spec(spark, sf_dir, tmp_path):
    table, orders = _mk(spark, sf_dir, tmp_path)
    snap.repartition_table(spark, table, "o_orderpriority")
    batch = orders.limit(5).select(
        (F.col("o_orderkey") + 10**9).alias("o_orderkey"),
        "o_orderstatus", "o_orderpriority", "o_totalprice",
    )
    v = snap.append_version(table, batch)
    m = snap._read_manifest(table, v)
    added = set(m["files"]) - set(snap._read_manifest(table, v - 1)["files"])
    assert added and all(
        f.startswith("o_orderpriority=") for f in added
    )
    assert snap.read_version(spark, table).count() == 65


def test_cdc_across_the_rewrite_is_empty(spark, sf_dir, tmp_path):
    table, _ = _mk(spark, sf_dir, tmp_path)
    snap.repartition_table(spark, table, "o_orderpriority")
    feed = snap.read_changes(spark, table, 1, 2, ["o_orderkey"])
    assert feed.count() == 0  # every file rewritten, no row changed


def test_streaming_source_skip_contract(spark, sf_dir, tmp_path):
    from tcrd_spark.streaming.lake_source import LakeCommitsStreamReader

    table, _ = _mk(spark, sf_dir, tmp_path)
    snap.repartition_table(spark, table, "o_orderpriority")
    r = LakeCommitsStreamReader({"path": table})
    with pytest.raises(ValueError, match="skipChangeCommits"):
        r.partitions({"version": 1}, {"version": 2})
    r2 = LakeCommitsStreamReader(
        {"path": table, "skipChangeCommits": "true"}
    )
    assert r2.partitions({"version": 1}, {"version": 2}) == []


def test_bad_column_refused(spark, sf_dir, tmp_path):
    table, _ = _mk(spark, sf_dir, tmp_path)
    with pytest.raises(ValueError, match="not a table column"):
        snap.repartition_table(spark, table, "nope")


def test_target_files_actually_splits_hot_partitions(
    spark, sf_dir, tmp_path
):
    """Review catch: repartition(n, part_col) alone routes each value
    wholly into one task, so the parameter never split anything. The
    deterministic row-hash salt makes a populated partition value
    yield multiple files (<= target)."""
    table, orders = _mk(spark, sf_dir, tmp_path)
    snap.repartition_table(
        spark, table, "o_orderstatus", target_files_per_partition=4
    )
    m = snap._read_manifest(table, 2)
    per_part: dict[str, int] = {}
    for f in m["files"]:
        per_part[f.split("/")[0]] = per_part.get(f.split("/")[0], 0) + 1
    assert max(per_part.values()) >= 2  # the hot value split
    assert all(n <= 4 for n in per_part.values())
    # rows still identical
    assert sorted(
        map(tuple, snap.read_version(spark, table).collect())
    ) == sorted(map(tuple, snap.read_version(spark, table, 1).collect()))


def test_optimize_target_splits_too(spark, sf_dir, tmp_path):
    """The sibling flaw: optimize_version(target>1) also never split a
    hot partition; same salt fix, same bound, bit-identical data."""
    table, orders = _mk(spark, sf_dir, tmp_path)
    before = sorted(map(tuple, snap.read_version(spark, table).collect()))
    snap.optimize_version(spark, table, target_files_per_partition=4)
    m = snap._read_manifest(table, 2)
    per_part: dict[str, int] = {}
    for f in m["files"]:
        d = f.split("/")[0]
        per_part[d] = per_part.get(d, 0) + 1
    assert max(per_part.values()) >= 2
    assert all(k <= 4 for k in per_part.values())
    after = sorted(map(tuple, snap.read_version(spark, table).collect()))
    assert after == before
    # the default (target=1) still bin-packs to ONE file per partition
    snap.optimize_version(spark, table)
    m3 = snap._read_manifest(table, 3)
    parts3: dict[str, int] = {}
    for f in m3["files"]:
        d = f.split("/")[0]
        parts3[d] = parts3.get(d, 0) + 1
    assert all(n == 1 for n in parts3.values())
