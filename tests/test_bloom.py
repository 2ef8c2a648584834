"""Bloom decontamination (pipeline/bloom.py) vs the exact operator:
no false negatives ever, false-positive rate within the design bound,
and the bit array stays within its fixed footprint."""

from __future__ import annotations

from pyspark.sql import functions as F

from tcrd_spark.pipeline.bloom import (
    M_WORDS,
    build_bloom,
    probe_bloom,
)
from tcrd_spark.pipeline.corpus import decontaminate
from tcrd_spark.sources.lake import load_table


def test_bloom_contains_exact_and_fp_bounded(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") < 10)
    corpus = docs.filter(F.col("doc_id") >= 10)

    exact = {
        r["doc_id"]
        for r in decontaminate(corpus, bench, "doc_id", "text", n=5)
        .where("contaminated = 1")
        .collect()
    }
    bloom = build_bloom(bench, "doc_id", "text", n=5)
    got = {
        r["doc_id"]: r["contaminated"]
        for r in probe_bloom(corpus, bloom, "doc_id", "text", n=5).collect()
    }
    flagged = {d for d, c in got.items() if c == 1}

    # a Bloom filter can only over-approximate
    assert exact <= flagged, exact - flagged
    # FP bound: ~1e-4 per shingle probe at ≤10% fill; docs have a few
    # hundred shingles, so extra docs should be a small fraction
    extra = len(flagged) - len(exact)
    assert extra <= max(5, len(got) // 10), (extra, len(got))


def test_bloom_footprint_is_fixed(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    bloom = build_bloom(
        docs.filter(F.col("doc_id") < 10), "doc_id", "text", n=5
    ).collect()
    assert len(bloom) <= M_WORDS
    assert all(r["mask"] > 0 for r in bloom)  # 60-bit masks, sign-safe


def test_sized_bloom_still_contains_exact(spark, sf_dir):
    """The m_words sizing knob (round 6): a non-default filter size
    must preserve the no-false-negative contract when build and probe
    agree on m_words — the sizing rule itself (fill^K bounds the
    per-DOC over-drop via shingles-per-doc) is measured by
    tools/decon_bench.py and recorded in SCALE.md."""
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") < 10)
    corpus = docs.filter(F.col("doc_id") >= 10)
    exact = {
        r["doc_id"]
        for r in decontaminate(corpus, bench, "doc_id", "text", n=5).collect()
        if r["contaminated"] == 1
    }
    m_words = 256  # 4x smaller than the default
    bloom = build_bloom(bench, "doc_id", "text", n=5, m_words=m_words)
    rows = bloom.collect()
    assert len(rows) <= m_words
    assert all(r["mask"] > 0 for r in rows)
    flagged = {
        r["doc_id"]: r["contaminated"]
        for r in probe_bloom(
            corpus, bloom, "doc_id", "text", n=5, m_words=m_words
        ).collect()
    }
    assert exact <= {d for d, c in flagged.items() if c == 1}


def test_probe_rejects_mismatched_filter_size(spark, sf_dir):
    # ADVICE r11: a filter built with a larger m_words than the probe's
    # must fail with a clear error, not a bare IndexError
    import pytest

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") < 10)
    corpus = docs.filter(F.col("doc_id") >= 10)
    big = build_bloom(bench, "doc_id", "text", n=5, m_words=4 * M_WORDS)
    with pytest.raises(ValueError, match="m_words"):
        probe_bloom(corpus, big, "doc_id", "text", n=5, m_words=M_WORDS)
