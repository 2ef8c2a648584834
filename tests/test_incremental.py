"""Incremental aggregate maintenance (sources/incremental.py): the
fold over the CDC feed reconstructs the full-refresh aggregate across
merge, append, and optimize commits."""

from __future__ import annotations

from pyspark.sql import functions as F

from tcrd_spark.sources import incremental as inc
from tcrd_spark.sources import snapshots as snap


def _orders(spark, sf_dir):
    from tcrd_spark.sources.lake import load_table

    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )


def _by_key(df):
    return {
        r["o_orderpriority"]: (r["n"], round(r["s"], 4))
        for r in df.collect()
    }


def test_fold_matches_full_refresh_across_commit_kinds(
    spark, sf_dir, tmp_path
):
    table = str(tmp_path / "t")
    orders = _orders(spark, sf_dir)
    snap.create_table(orders, table, "o_orderstatus")
    # v2: merge (updates + deletes), v3: append, v4: optimize
    src = orders.where("o_orderkey % 5 = 0").withColumn(
        "o_totalprice", F.col("o_totalprice") + 7.0
    )
    snap.merge_version(
        spark, table, src, ["o_orderkey"],
        delete_condition="s.o_orderpriority = '5-LOW'",
    )
    extra = orders.limit(7).select(
        (F.col("o_orderkey") + 10**9).alias("o_orderkey"),
        "o_orderstatus", "o_totalprice", "o_orderpriority",
    )
    snap.append_version(table, extra)
    snap.optimize_version(spark, table)

    for v_from, v_to in ((1, 2), (2, 3), (3, 4), (1, 4)):
        got = inc.incremental_group_agg(
            spark, table, v_from, v_to, ["o_orderkey"], "o_orderpriority", "o_totalprice"
        )
        want = inc.group_agg(
            snap.read_version(spark, table, v_to),
            "o_orderpriority", "o_totalprice",
        )
        g, w = _by_key(got), _by_key(want)
        assert set(g) == set(w), (v_from, v_to)
        for k in w:
            assert g[k][0] == w[k][0], (v_from, v_to, k)
            assert abs(g[k][1] - w[k][1]) < 1e-3, (v_from, v_to, k)


def test_group_vanishes_when_all_rows_deleted(spark, sf_dir, tmp_path):
    table = str(tmp_path / "t")
    orders = _orders(spark, sf_dir)
    snap.create_table(orders, table, "o_orderstatus")
    # delete EVERY '1-URGENT' row via a matched-delete merge
    src = orders.where("o_orderpriority = '1-URGENT'")
    snap.merge_version(
        spark, table, src, ["o_orderkey"], delete_condition="true",
    )
    got = inc.incremental_group_agg(
        spark, table, 1, 2, ["o_orderkey"], "o_orderpriority", "o_totalprice"
    )
    assert "1-URGENT" not in {
        r["o_orderpriority"] for r in got.collect()
    }
