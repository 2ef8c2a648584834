"""Gopher repetition/quality rules (pipeline/gopher.py): exact
statistics on constructed documents and the composed verdict."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tcrd_spark.pipeline.gopher import (
    dup_ngram_coverage,
    gopher_filter,
    gopher_stats,
    top_ngram_frac,
    word_stats,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )


def test_word_stats_exact(spark):
    docs = _docs(spark, {1: "The cat and the hat 123 !!"})
    r = word_stats(docs, "doc_id", "text").first()
    assert r["n_words"] == 7
    # lengths: 3+3+3+3+3+3+2 = 20
    assert r["mean_word_len"] == pytest.approx(20 / 7, abs=1e-5)
    assert r["alpha_frac"] == pytest.approx(5 / 7, abs=1e-5)
    assert r["n_stopwords"] == 2  # 'the' (case-folded), 'and'


def test_top_ngram_frac_with_tie_break(spark):
    # "a b a b a b": bigrams = [a b, b a, a b, b a, a b] →
    # top 'a b' ×3 → frac = 3*2/6 = 1.0
    docs = _docs(spark, {1: "a b a b a b", 2: "x y z w"})
    got = {
        r["doc_id"]: r["frac"]
        for r in top_ngram_frac(docs, "doc_id", "text", 2).collect()
    }
    assert got[1] == pytest.approx(1.0)
    assert got[2] == pytest.approx(2 / 4)  # all bigrams unique, count 1


def test_dup_ngram_coverage_no_double_count(spark):
    # 'p q r s p q r s': dup 4-gram 'p q r s' at pos 1 and 5 →
    # covered tokens = all 8 → frac 1.0 (overlap-union, not 2×4/8=1.0
    # trivially; add a tail to verify partial coverage)
    docs = _docs(spark, {1: "p q r s p q r s t u v w"})
    r = dup_ngram_coverage(docs, "doc_id", "text", 4).first()
    assert r["frac"] == pytest.approx(8 / 12)


def test_dup_coverage_zero_when_unique(spark):
    docs = _docs(spark, {1: "all tokens here are unique today"})
    assert dup_ngram_coverage(docs, "doc_id", "text", 5).first()["frac"] == 0.0


def test_gopher_filter_verdicts(spark):
    # 54 words, stopwords present, NO repeated n-grams (every content
    # token is unique, so even stopword-adjacent grams differ)
    ok_words = " ".join(
        f"the w{i}a and w{i}b of w{i}c cat{i} dog{i} bird{i}"
        for i in range(6)
    )
    repetitive = " ".join(["spam ham"] * 30)  # top-2gram frac ≈ 1
    short = "too short"
    docs = _docs(spark, {1: ok_words, 2: repetitive, 3: short})
    got = {r["doc_id"]: r["keep"]
           for r in gopher_filter(docs, "doc_id", "text").collect()}
    assert got == {1: 1, 2: 0, 3: 0}
    stats = {r["doc_id"]: r for r in
             gopher_stats(docs, "doc_id", "text").collect()}
    assert stats[2]["top2gram_frac"] > 0.9
    assert stats[3]["n_words"] == 2


def test_whitespace_padded_docs_use_one_token_list(spark):
    """ADVICE r5 #1 regression: leading/trailing whitespace used to put
    empty tokens into the gram positions (substring._gram_hashes raw
    list) while n_words filtered them — numerators and denominators
    came from DIFFERENT token lists and fractions could exceed 1. All
    stats must be identical to the unpadded document's."""
    body = "p q r s p q r s t u v w"
    docs = _docs(spark, {1: body, 2: f"  {body}  ", 3: f"\t{body}\n"})
    stats = {r["doc_id"]: r.asDict()
             for r in gopher_stats(docs, "doc_id", "text").collect()}
    base = {k: v for k, v in stats[1].items() if k != "doc_id"}
    for d in (2, 3):
        got = {k: v for k, v in stats[d].items() if k != "doc_id"}
        assert got == base, f"doc {d} diverges from unpadded stats"
    # and the dup coverage is the exact unpadded value, not >1
    r = {row["doc_id"]: row["frac"]
         for row in dup_ngram_coverage(docs, "doc_id", "text", 4).collect()}
    assert r[2] == pytest.approx(8 / 12) and r[3] == pytest.approx(8 / 12)


def test_gopher_stats_one_row_per_doc(spark, sf_dir):
    from tcrd_spark.sources.lake import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = gopher_stats(docs, "doc_id", "text")
    assert out.count() == docs.count()
    assert out.select("doc_id").distinct().count() == docs.count()
