"""Bloom file-skipping pins (sources/bloomidx.py): a point lookup
through the index equals the unpruned filter exactly, actually prunes
files, never false-negatives, and degrades safely for files appended
after the index was built."""

from __future__ import annotations

from pyspark.sql import functions as F

from tcrd_spark.sources import bloomidx, snapshots as snap


def _orders(spark, sf_dir):
    from tcrd_spark.sources.lake import load_table

    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus",
        F.round("o_totalprice", 2).alias("o_totalprice"),
    )


def _build(spark, sf_dir, tmp_path, n_appends=3):
    """v1 + n disjoint-key appends → a multi-file snapshot."""
    table = str(tmp_path / "t")
    orders = _orders(spark, sf_dir)
    snap.create_table(orders.where("o_orderkey % 4 = 0"), table,
                      "o_orderstatus")
    for i in range(1, n_appends + 1):
        snap.append_version(table, orders.where(f"o_orderkey % 4 = {i}"))
    return table, orders


def test_point_lookup_equals_full_filter(spark, sf_dir, tmp_path):
    table, orders = _build(spark, sf_dir, tmp_path)
    bloomidx.build_bloom_index(spark, table, "o_orderkey")
    keys = [r.o_orderkey for r in orders.limit(7).collect()]
    for key in keys:
        got = sorted(
            tuple(r)
            for r in bloomidx.point_lookup(
                spark, table, "o_orderkey", key
            ).collect()
        )
        want = sorted(
            tuple(r)
            for r in snap.read_version(spark, table)
            .where(F.col("o_orderkey") == key)
            .collect()
        )
        assert got == want and len(got) >= 1


def test_index_prunes_files(spark, sf_dir, tmp_path):
    table, orders = _build(spark, sf_dir, tmp_path)
    bloomidx.build_bloom_index(spark, table, "o_orderkey")
    key = orders.head().o_orderkey
    kept, total = bloomidx.bloom_candidate_files(
        spark, table, "o_orderkey", key
    )
    # the key lives in exactly one append's files; with 4 disjoint
    # batches over the partitions the index must drop a majority
    assert total >= 4
    assert 1 <= len(kept) < total / 2 + 1


def test_absent_key_usually_prunes_everything(spark, sf_dir, tmp_path):
    table, _ = _build(spark, sf_dir, tmp_path)
    bloomidx.build_bloom_index(spark, table, "o_orderkey")
    kept, total = bloomidx.bloom_candidate_files(
        spark, table, "o_orderkey", 10**15 + 7
    )
    # ~0.2% fp/file at this fill: a handful of survivors at most
    assert len(kept) <= max(1, total // 4)
    assert bloomidx.point_lookup(
        spark, table, "o_orderkey", 10**15 + 7
    ).count() == 0


def test_post_index_appends_degrade_to_scan(spark, sf_dir, tmp_path):
    table, orders = _build(spark, sf_dir, tmp_path, n_appends=2)
    bloomidx.build_bloom_index(spark, table, "o_orderkey")
    snap.append_version(table, orders.where("o_orderkey % 4 = 3"))
    key = orders.where("o_orderkey % 4 = 3").head().o_orderkey
    # the key is ONLY in unindexed files — they must stay candidates
    got = bloomidx.point_lookup(spark, table, "o_orderkey", key).count()
    want = (
        snap.read_version(spark, table)
        .where(F.col("o_orderkey") == key)
        .count()
    )
    assert got == want >= 1


def test_no_index_returns_all_files(spark, sf_dir, tmp_path):
    table, _ = _build(spark, sf_dir, tmp_path, n_appends=1)
    kept, total = bloomidx.bloom_candidate_files(
        spark, table, "o_orderkey", 42
    )
    assert kept == snap._read_manifest(table, 2)["files"]
    assert len(kept) == total
