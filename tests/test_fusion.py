"""RRF axioms on constructed rankings (values vs DuckDB ride the
registry sweep)."""

from __future__ import annotations

from tcrd_spark.pipeline.fusion import RRF_K, rrf_fuse


def _ranked(spark, rows):
    return spark.createDataFrame(rows, "q_id long, doc_id long, rank long")


def test_doc_in_both_lists_beats_single_list(spark):
    a = _ranked(spark, [(0, 1, 1), (0, 2, 2)])
    b = _ranked(spark, [(0, 1, 2), (0, 3, 1)])
    got = {r.doc_id: r for r in rrf_fuse([a, b]).collect()}
    # doc 1 appears in both lists -> highest fused score
    assert got[1].fused_rank == 1
    assert got[1].rrf > got[2].rrf and got[1].rrf > got[3].rrf
    # exact RRF arithmetic
    assert abs(got[1].rrf - (1 / (RRF_K + 1) + 1 / (RRF_K + 2))) < 1e-6


def test_missing_membership_contributes_zero(spark):
    a = _ranked(spark, [(0, 1, 1)])
    b = _ranked(spark, [(0, 2, 1)])
    got = {r.doc_id: r for r in rrf_fuse([a, b]).collect()}
    assert got[1].rank_1 is None and got[2].rank_0 is None
    assert abs(got[1].rrf - 1 / (RRF_K + 1)) < 1e-6
    # symmetric -> tie broken by doc_id
    assert got[1].fused_rank == 1 and got[2].fused_rank == 2


def test_queries_fuse_independently(spark):
    a = _ranked(spark, [(0, 1, 1), (7, 9, 1)])
    b = _ranked(spark, [(0, 1, 1), (7, 8, 1)])
    got = rrf_fuse([a, b]).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.q_id, []).append(r)
    assert {r.doc_id for r in by_q[7]} == {8, 9}
    assert all(r.fused_rank <= 2 for r in by_q[7])
