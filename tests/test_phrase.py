"""Phrase-search pins (pipeline/phrase.py): exact sequence semantics
(adjacent, ordered, 0-based), duplicate phrase words, overlapping
occurrences, no-match terms, and the one-shuffle plan (a single
exchange on (doc, start) however long the phrase is)."""

from __future__ import annotations

from tcrd_spark.pipeline import phrase as ph
from tests.test_plans import plan_of


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_sequence_semantics(spark):
    docs = _df(spark, [
        (1, "big table scan fast"),          # hit at 1
        (2, "table fast scan"),              # words present, not adjacent
        (3, "scan table"),                   # reversed
        (4, "table scan table scan"),        # two hits: 0 and 2
    ])
    got = {
        r.doc_id: (r.n_hits, r.first_pos)
        for r in ph.phrase_search(
            docs, ("table", "scan"), "doc_id", "text"
        ).collect()
    }
    assert got == {1: (1, 1), 4: (2, 0)}


def test_duplicate_phrase_words(spark):
    """phrase[i] repeating a word must not double-count: 'scan scan'
    needs two ADJACENT scans."""
    docs = _df(spark, [
        (1, "scan scan scan"),   # overlapping hits at 0 and 1
        (2, "scan fast scan"),   # no adjacent pair
    ])
    got = {
        r.doc_id: (r.n_hits, r.first_pos)
        for r in ph.phrase_search(
            docs, ("scan", "scan"), "doc_id", "text"
        ).collect()
    }
    assert got == {1: (2, 0)}


def test_unknown_term_matches_nothing(spark):
    docs = _df(spark, [(1, "table scan")])
    assert ph.phrase_search(
        docs, ("table", "zebra"), "doc_id", "text"
    ).count() == 0


def test_one_shuffle_regardless_of_phrase_length(spark, sf_dir):
    """The emission trick's whole point: a 4-word phrase still plans
    exactly ONE exchange before the per-doc rollup (which reuses the
    doc key) — never one shuffle per term."""
    from tcrd_spark.sources.lake import load_table

    docs = load_table(spark, sf_dir, "documents")
    plan = plan_of(
        ph.phrase_search(
            docs, ("table", "scan", "value", "part"), "doc_id", "text"
        )
    )
    # exchanges: the (doc,start) group + the per-doc rollup; the
    # offsets side is broadcast. 3+ would mean per-term shuffles.
    assert plan.count("Exchange hashpartitioning") <= 2, plan
    assert "BroadcastHashJoin" in plan, plan
