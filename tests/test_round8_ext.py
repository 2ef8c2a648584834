"""Round-8 extensions: the shortlist hard-negative path (VERDICT r7
#4 — the docstring's scale claim now has a code path, a recall bound,
and a pruned-scan plan assertion)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _panel(spark, sf_dir):
    from tcrd_spark.sources.lake import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cell_id"), F.col("embedding").alias("cell_vec")
    )
    qs = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    return corpus, cents, qs


def test_hard_negatives_shortlist_overlap_bound(spark, sf_dir, tmp_path):
    """The IVF-shortlist mine must agree with the exact mine on most
    pairs — the probe's recall is what a deployment trades for the
    pruned scan, and it must never silently collapse (an empty or
    disjoint shortlist result would pass a rows-only check)."""
    from tcrd_spark.pipeline.negatives import (
        DUP_THRESHOLD, K, hard_negatives, hard_negatives_shortlist,
    )
    from tcrd_spark.pipeline.similarity import build_ivf_index

    corpus, cents, qs = _panel(spark, sf_dir)
    path = str(tmp_path / "hn_ivf")
    build_ivf_index(corpus, cents, 64, path)
    exact = {
        (r.q_id, r.c_id)
        for r in hard_negatives(qs, corpus, 64, k=K).collect()
    }
    approx = {
        (r.q_id, r.c_id)
        for r in hard_negatives_shortlist(
            qs, path, cents, 64, k=K, dup_threshold=DUP_THRESHOLD
        ).collect()
    }
    assert len(approx) == len(exact) == 5 * K
    overlap = len(exact & approx) / len(exact)
    assert overlap >= 0.6, f"shortlist recall collapsed: {overlap:.2f}"


def test_hard_negatives_shortlist_scan_is_partition_pruned(
    spark, sf_dir, tmp_path
):
    """The composed mine inherits ivf_topk_indexed's pruned scan: the
    probed cells appear as a static PartitionFilters IN-list."""
    from tcrd_spark.pipeline.negatives import hard_negatives_shortlist
    from tcrd_spark.pipeline.similarity import build_ivf_index

    corpus, cents, qs = _panel(spark, sf_dir)
    path = str(tmp_path / "hn_ivf")
    build_ivf_index(corpus, cents, 64, path)
    df = hard_negatives_shortlist(qs, path, cents, 64)
    plan = df._jdf.queryExecution().executedPlan().toString()
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf and "cell_id" in pf[0], plan
    assert " IN (" in pf[0], pf[0]
