"""Interpolated trigram LM (pipeline/lm3.py): closed-form probability
axioms on a hand-countable corpus, graceful unknowns, and the ccnet
swap (bucket stability under the scorer upgrade — VERDICT r7 #6).
Values vs DuckDB ride the registry sweep (`lm_trigram_perplexity`)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tcrd_spark.pipeline.lm import tokenize
from tcrd_spark.pipeline.lm3 import (
    score_trigram_perplexity,
    train_trigram_lm,
    trigram_lang_nll,
)


def _train(spark):
    # "a b c a b c": every token count 2 (>= min_count, no <unk>),
    # V=3, N=6; c(abc)=2, c(ab)=2, c(bc)=2, c(b)=2, c(c)=2
    docs = spark.createDataFrame([(1, "a b c a b c")], "id long, text string")
    return train_trigram_lm(tokenize(docs, "id", "text"), "id")


def test_trigram_probability_matches_hand_count(spark):
    lm = _train(spark)
    probe = spark.createDataFrame([(9, "a b c")], "id long, text string")
    got = score_trigram_perplexity(
        tokenize(probe, "id", "text"), lm, "id"
    ).collect()
    assert len(got) == 1 and got[0].n_trigrams == 1
    # P(c|ab) = .5*(2/2) + .3*(2/2) + .2*(2+1)/(6+3)
    p = 0.5 + 0.3 + 0.2 * 3 / 9
    assert abs(got[0].nll - (-math.log(p))) < 1e-5
    assert abs(got[0].ppl - math.exp(-math.log(p))) < 1e-3


def test_unknown_history_backs_off_gracefully(spark):
    lm = _train(spark)
    probe = spark.createDataFrame([(9, "z b c")], "id long, text string")
    got = score_trigram_perplexity(
        tokenize(probe, "id", "text"), lm, "id"
    ).collect()
    # z -> <unk>: trigram and bigram history unseen (terms drop to 0),
    # the w2w3 and unigram-floor terms still score it
    p = 0.3 * (2 / 2) + 0.2 * (2 + 1) / (6 + 3)
    assert abs(got[0].nll - (-math.log(p))) < 1e-5


def test_docs_too_short_for_a_trigram_score_null(spark):
    lm = _train(spark)
    probe = spark.createDataFrame([(9, "a b")], "id long, text string")
    got = score_trigram_perplexity(
        tokenize(probe, "id", "text"), lm, "id"
    ).collect()
    assert got == []  # no trigram, no row (the query left-joins NULLs)


def test_ccnet_swap_keeps_buckets_stable(spark):
    """Feeding trigram NLLs through ccnet_buckets(_labeled=...) must
    reproduce the bigram gate's decisions where text has structure:
    fluent docs stay head, scrambled docs stay tail, and per-doc
    bucket agreement stays high — so downstream consumers (clf_gate
    pseudo-labels, corpus_v2 stage 3) can swap scorers without
    re-tuning. (On pure word-soup tertiles are near-chance for ANY
    pair of scorers — structure, not noise, is what the gate keys on,
    so the fixture builds fluent / lightly-perturbed / scrambled
    clusters deterministically.)"""
    from tcrd_spark.pipeline.ccnet import ccnet_buckets, lang_nll

    phrase = "the cat sat on the mat and the dog ran in the sun".split()
    rows = []
    for i in range(20):  # fluent: the canonical phrase
        rows.append((i, " ".join(phrase * 6), "fluent"))
    for i in range(20):  # middle: one rotated repetition per doc
        rot = phrase[i % len(phrase):] + phrase[: i % len(phrase)]
        rows.append((100 + i, " ".join(phrase * 5 + rot), "middle"))
    for i in range(20):  # scrambled: per-doc stride permutation
        stride = 3 + (i % 7)
        perm = [
            phrase[(j * stride + i) % len(phrase)]
            for j in range(len(phrase))
        ]
        rows.append((200 + i, " ".join(perm * 6), "garbage"))
    docs = spark.createDataFrame(
        [(a, b) for a, b, _ in rows], "doc_id long, text string"
    )
    kind = {a: k for a, _, k in rows}

    def buckets(labeled):
        out = ccnet_buckets(
            docs, "doc_id", "text", _labeled=labeled.cache()
        ).collect()
        return {r.doc_id: r.bucket for r in out}

    b2 = buckets(lang_nll(docs, "doc_id", "text"))
    b3 = buckets(trigram_lang_nll(docs, "doc_id", "text"))
    for bk in (b2, b3):  # each gate separates the extremes on its own
        assert all(bk[d] == "head" for d in bk if kind[d] == "fluent")
        assert all(bk[d] == "tail" for d in bk if kind[d] == "garbage")
    agree = sum(1 for d in b2 if b2[d] == b3[d]) / len(b2)
    assert agree >= 0.9, f"bucket agreement collapsed: {agree:.2f}"
