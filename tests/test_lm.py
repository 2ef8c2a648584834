"""Bigram-LM quality scoring (pipeline/lm.py) — generalization paths
the self-scoring registered query never exercises: unseen tokens and
histories at score time, sub-bigram documents, and the add-one
probability floor."""

from __future__ import annotations

import math

import pytest

from tcrd_spark.pipeline.lm import (
    score_perplexity,
    tokenize,
    train_bigram_lm,
)


@pytest.fixture(scope="module")
def lm_and_train(spark):
    train = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the dog sat on the mat"),
            (3, "the cat ran"),
        ],
        ["doc_id", "text"],
    )
    toks = tokenize(train, "doc_id", "text")
    return train, toks, train_bigram_lm(toks, "doc_id")


def test_vocab_closes_rare_tokens_to_unk(lm_and_train):
    _, _, lm = lm_and_train
    uni = {r["w"]: r["c1"] for r in lm["unigrams"].collect()}
    # dog/ran/mat appear <2 times? mat appears 2x, dog 1x, ran 1x
    assert "<unk>" in uni and "dog" not in uni and "ran" not in uni
    assert uni["<unk>"] == 2  # dog + ran
    v = lm["vocab"].collect()[0]["v"]
    assert v == len(uni)


def test_self_score_matches_hand_computation(spark, lm_and_train):
    train, toks, lm = lm_and_train
    scored = {
        r["doc_id"]: r for r in score_perplexity(toks, lm, "doc_id").collect()
    }
    uni = {r["w"]: r["c1"] for r in lm["unigrams"].collect()}
    bi = {
        (r["w1"], r["w2"]): r["c2"] for r in lm["bigrams"].collect()
    }
    v = lm["vocab"].collect()[0]["v"]

    def p(w1, w2):
        return (bi.get((w1, w2), 0) + 1.0) / (uni.get(w1, 0) + v)

    # doc 3: "the cat ran" → mapped (the, cat, <unk>)
    expect = -(math.log(p("the", "cat")) + math.log(p("cat", "<unk>"))) / 2
    assert scored[3]["n_bigrams"] == 2
    assert scored[3]["nll"] == pytest.approx(expect, abs=1e-6)
    assert scored[3]["ppl"] == pytest.approx(math.exp(expect), abs=1e-3)


def test_unseen_tokens_hit_the_add_one_floor(spark, lm_and_train):
    _, _, lm = lm_and_train
    new = spark.createDataFrame(
        [(10, "zebra quux"), (11, "solo")], ["doc_id", "text"]
    )
    scored = {
        r["doc_id"]: r
        for r in score_perplexity(
            tokenize(new, "doc_id", "text"), lm, "doc_id"
        ).collect()
    }
    uni = {r["w"]: r["c1"] for r in lm["unigrams"].collect()}
    v = lm["vocab"].collect()[0]["v"]
    # zebra/quux are rare in the NEW frame too (count 1 < MIN_COUNT) →
    # <unk>; the (<unk>, <unk>) bigram is unseen in training, history
    # <unk> IS known → P = 1 / (c1(<unk>) + V)
    expect = -math.log(1.0 / (uni["<unk>"] + v))
    assert scored[10]["nll"] == pytest.approx(expect, abs=1e-6)
    # a single-token doc has no bigrams → absent from the scored frame
    assert 11 not in scored


def test_higher_likelihood_text_scores_lower_nll(spark, lm_and_train):
    _, toks, lm = lm_and_train
    probe = spark.createDataFrame(
        [(20, "the cat sat on the mat"), (21, "mat the on sat cat the")],
        ["doc_id", "text"],
    )
    scored = {
        r["doc_id"]: r["nll"]
        for r in score_perplexity(
            tokenize(probe, "doc_id", "text"), lm, "doc_id"
        ).collect()
    }
    # in-distribution word order beats the shuffled order
    assert scored[20] < scored[21]
