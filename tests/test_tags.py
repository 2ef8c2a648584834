"""Tag/ref pins (sources/snapshots.py): tags resolve, are immutable,
and make their version vacuum-proof."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tcrd_spark.sources import snapshots as snap


def _lake(spark, sf_dir, tmp_path, n_appends=3):
    table = str(tmp_path / "t")
    from tcrd_spark.sources.lake import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", F.round("o_totalprice", 2)
        .alias("o_totalprice"),
    )
    snap.create_table(orders.where("o_orderkey % 4 = 0"), table,
                      "o_orderstatus")
    for i in range(1, n_appends + 1):
        snap.append_version(table, orders.where(f"o_orderkey % 4 = {i}"))
    return table


def test_tag_resolves_and_is_immutable(spark, sf_dir, tmp_path):
    table = _lake(spark, sf_dir, tmp_path)
    assert snap.tag_version(table, "train-v1", 2) == 2
    assert snap.list_tags(table) == {"train-v1": 2}
    want = snap.read_version(spark, table, 2).count()
    assert snap.read_tag(spark, table, "train-v1").count() == want
    with pytest.raises(FileExistsError):
        snap.tag_version(table, "train-v1", 3)
    snap.delete_tag(table, "train-v1")
    assert snap.tag_version(table, "train-v1", 3) == 3


def test_tagged_version_survives_vacuum(spark, sf_dir, tmp_path):
    table = _lake(spark, sf_dir, tmp_path)
    v2_rows = sorted(
        tuple(r) for r in snap.read_version(spark, table, 2).collect()
    )
    snap.tag_version(table, "published", 2)
    snap.vacuum(table, keep_versions=1)
    # v1 and v3 manifests are gone, v2 (tagged) + v4 (retained) stay
    assert snap.versions(table) == [2, 4]
    assert sorted(
        tuple(r) for r in snap.read_tag(spark, table, "published").collect()
    ) == v2_rows


def test_untagged_vacuum_unchanged(spark, sf_dir, tmp_path):
    table = _lake(spark, sf_dir, tmp_path)
    removed = snap.vacuum(table, keep_versions=2)
    assert snap.versions(table) == [3, 4]
    assert all(not os.path.exists(
        os.path.join(snap._data_dir(table), f)) for f in removed)
