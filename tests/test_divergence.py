"""Divergence properties: KL/JS axioms on constructed slices and the
plain-sum production path (values vs DuckDB ride the registry
sweep)."""

from __future__ import annotations

import math

from tcrd_spark.pipeline.divergence import divergence_by_slice


def _div(spark, rows, **kw):
    df = spark.createDataFrame(rows, "source string, text string")
    return {
        r.slice: r
        for r in divergence_by_slice(df, "source", "text", **kw).collect()
    }


def test_identical_slices_have_near_zero_divergence(spark):
    # both slices share the corpus distribution exactly; add-half
    # smoothing normalizes slice and corpus slightly differently, so
    # the divergence is small-positive rather than exactly zero
    rows = [("a", "x y z x"), ("b", "x y z x")]
    got = _div(spark, rows)
    assert abs(got["a"].kl_vs_corpus) < 0.01
    assert abs(got["b"].js_vs_corpus) < 0.01


def test_disjoint_slice_dominates(spark):
    rows = [
        ("a", "x x x x x x x x"),
        ("b", "x x x x x x x y"),
        ("c", "q r s t q r s t"),  # disjoint vocabulary
    ]
    got = _div(spark, rows)
    assert got["c"].kl_vs_corpus > got["b"].kl_vs_corpus > 0
    assert got["c"].js_vs_corpus > got["b"].js_vs_corpus


def test_js_bounded_and_nonnegative(spark, sf_dir):
    from tcrd_spark.pipeline.divergence import q_corpus_divergence

    rows = q_corpus_divergence(spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        assert 0 <= r.js_vs_corpus <= math.log(2) + 1e-9
        assert r.kl_vs_corpus >= -1e-9


def test_plain_sum_matches_sorted_fold(spark):
    rows = [("a", "x y z w x y"), ("b", "x x q w z z y p"), ("c", "p q r")]
    exact = _div(spark, rows, exact_fold=True)
    plain = _div(spark, rows, exact_fold=False)
    for k in exact:
        assert abs(exact[k].kl_vs_corpus - plain[k].kl_vs_corpus) < 1e-6
        assert abs(exact[k].js_vs_corpus - plain[k].js_vs_corpus) < 1e-6
