"""Two-feed join-view maintenance (sources/incremental_join.py): the
fold over BOTH change feeds equals the full recompute — including a
dim-side group MOVE — and spans multi-version fact histories."""

from __future__ import annotations

from pyspark.sql import functions as F

from tcrd_spark.sources import snapshots as snap
from tcrd_spark.sources.incremental import group_agg
from tcrd_spark.sources.incremental_join import (
    _join_lakes, incremental_join_agg,
)


def _rows(df):
    return sorted(
        (r[0], r[1], round(r[2], 6)) for r in df.collect()
    )


def _recompute(spark, path_f, path_d, vf, vd):
    a = snap.read_version(spark, path_f, vf)
    b = snap.read_version(spark, path_d, vd)
    return group_agg(
        a.join(b, a["o_custkey"] == b["c_custkey"]),
        "c_nationkey",
        "o_totalprice",
    )


def test_fold_equals_recompute_with_group_move(spark, sf_dir):
    path_f, path_d = _join_lakes(spark, sf_dir)
    got = incremental_join_agg(
        spark, path_f, path_d, (1, 2), (1, 2),
        "o_orderkey", ["c_custkey"], ("o_custkey", "c_custkey"),
        "c_nationkey", "o_totalprice",
    )
    want = _recompute(spark, path_f, path_d, 2, 2)
    assert _rows(got) == _rows(want)
    # the dim merge moved customers across nations: the fold must have
    # handled update_pre/update_post pairs, not just inserts
    moved = (
        snap.read_changes(spark, path_d, 1, 2, ["c_custkey"])
        .where(F.col("change_type") == "update_pre")
        .count()
    )
    assert moved > 0


def test_fold_spans_multi_version_fact(spark, sf_dir, tmp_path):
    path_f, path_d = _join_lakes(spark, sf_dir)
    # clone the fact lake so the shared fixture stays two-version
    import shutil

    clone = str(tmp_path / "orders")
    shutil.copytree(path_f, clone)
    extra = snap.read_version(spark, clone, 1).limit(5).select(
        (F.col("o_orderkey") + 10**9).alias("o_orderkey"),
        "o_custkey", "o_orderstatus",
        F.round(F.col("o_totalprice") + 1.0, 2).alias("o_totalprice"),
    )
    assert snap.append_version(clone, extra) == 3
    got = incremental_join_agg(
        spark, clone, path_d, (1, 3), (1, 2),
        "o_orderkey", ["c_custkey"], ("o_custkey", "c_custkey"),
        "c_nationkey", "o_totalprice",
    )
    want = _recompute(spark, clone, path_d, 3, 2)
    assert _rows(got) == _rows(want)
