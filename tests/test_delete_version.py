"""Predicate-DELETE pins (sources/snapshots.delete_version): the COW
commit removes exactly the matching rows from the CURRENT version,
prior versions still read them (time travel), untouched files carry
by reference, the CDC feed shows pure deletes, no-match is a
commitless no-op, and vacuum completes PHYSICAL erasure."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tcrd_spark.sources import snapshots as snap


def _lake(spark, sf_dir, tmp_path):
    table = str(tmp_path / "t")
    from tcrd_spark.sources.lake import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        F.round("o_totalprice", 2).alias("o_totalprice"),
    )
    snap.create_table(orders.where("o_orderkey % 2 = 0"), table,
                      "o_orderstatus")
    snap.append_version(table, orders.where("o_orderkey % 2 = 1"))
    return table


def test_delete_is_cow_and_versioned(spark, sf_dir, tmp_path):
    table = _lake(spark, sf_dir, tmp_path)
    pred = "o_custkey % 10 = 3"
    before = snap.read_version(spark, table)
    n_match = before.where(pred).count()
    assert n_match > 0
    n_total = before.count()

    v, n_deleted = snap.delete_version(spark, table, pred)
    assert v == 3 and n_deleted == n_match
    cur = snap.read_version(spark, table)
    assert cur.where(pred).count() == 0
    assert cur.count() == n_total - n_match
    # time travel: v2 still holds the rows (that IS the contract)
    assert snap.read_version(spark, table, 2).where(pred).count() == n_match
    # audit trail in the manifest
    m = snap._read_manifest(table, 3)
    assert m["op"] == "delete" and m["predicate"] == pred


def test_cdc_shows_pure_deletes(spark, sf_dir, tmp_path):
    table = _lake(spark, sf_dir, tmp_path)
    pred = "o_custkey % 10 = 3"
    n = snap.read_version(spark, table).where(pred).count()
    snap.delete_version(spark, table, pred)
    feed = snap.read_changes(spark, table, 2, 3, ["o_orderkey"])
    kinds = {r.change_type for r in feed.select("change_type").collect()}
    assert kinds == {"delete"}
    assert feed.count() == n


def test_no_match_is_commitless_noop(spark, sf_dir, tmp_path):
    table = _lake(spark, sf_dir, tmp_path)
    v, n = snap.delete_version(spark, table, "o_custkey = -42")
    assert (v, n) == (2, 0)
    assert snap.versions(table) == [1, 2]


def test_zone_prune_narrows_candidates_same_answer(spark, sf_dir, tmp_path):
    table = _lake(spark, sf_dir, tmp_path)
    key = snap.read_version(spark, table).head().o_orderkey
    pred = f"o_orderkey = {key}"
    v, n = snap.delete_version(
        spark, table, pred, prune=("o_orderkey", key, key)
    )
    assert n >= 1
    assert snap.read_version(spark, table).where(pred).count() == 0


def test_prune_range_is_conjoined_into_the_predicate(
    spark, sf_dir, tmp_path
):
    """The r8 ADVICE (medium) hazard: a predicate matching rows
    OUTSIDE the caller's prune range must never silently survive a
    'successful' delete. The range is now conjoined into the
    effective predicate, so (1) only in-range matches are deleted,
    (2) the recorded audit predicate names the range, and (3) the
    out-of-range matches are by definition out of the delete's scope
    — still present and still visible, not silently leaked."""
    table = _lake(spark, sf_dir, tmp_path)
    before = snap.read_version(spark, table)
    pred = "o_custkey % 10 = 3"  # matches keys across the whole range
    n_match_all = before.where(pred).count()
    hi = before.agg(F.expr("percentile(o_orderkey, 0.5)")).head()[0]
    lo, hi = 0, int(hi)
    in_range = before.where(
        f"({pred}) AND o_orderkey >= {lo} AND o_orderkey <= {hi}"
    ).count()
    assert 0 < in_range < n_match_all  # the hazard setup is real
    v, n = snap.delete_version(
        spark, table, pred, prune=("o_orderkey", lo, hi)
    )
    assert n == in_range  # only in-range matches deleted...
    cur = snap.read_version(spark, table)
    # ...and the out-of-range matches are still THERE (not leaked)
    assert cur.where(pred).count() == n_match_all - in_range
    m = snap._read_manifest(table, v)
    assert "o_orderkey >=" in m["predicate"]  # audit names the range


def test_vacuum_completes_physical_erasure(spark, sf_dir, tmp_path):
    table = _lake(spark, sf_dir, tmp_path)
    pred = "o_custkey % 10 = 3"
    old_files = set(snap._read_manifest(table, 2)["files"])
    snap.delete_version(spark, table, pred)
    new_files = set(snap._read_manifest(table, 3)["files"])
    rewritten = old_files - new_files
    assert rewritten  # the touched files were replaced
    snap.vacuum(table, keep_versions=1)
    data = snap._data_dir(table)
    # the files that held the erased rows are physically gone
    assert all(
        not os.path.exists(os.path.join(data, f)) for f in rewritten
    )
    assert snap.versions(table) == [3]
    assert snap.read_version(spark, table).where(pred).count() == 0
