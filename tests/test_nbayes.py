"""Naive Bayes classifier (pipeline/nbayes.py) — held-out scoring and
unseen-token behavior the self-classifying registered query never
exercises."""

from __future__ import annotations

import math

import pytest

from tcrd_spark.pipeline.nbayes import classify, train_nb


@pytest.fixture(scope="module")
def model_and_train(spark):
    train = spark.createDataFrame(
        [
            (1, "goal match striker goal", "sports"),
            (2, "match referee goal", "sports"),
            (3, "election vote senate", "politics"),
            (4, "vote election ballot vote", "politics"),
        ],
        ["doc_id", "text", "topic"],
    )
    return train, train_nb(train, "doc_id", "text", "topic")


def test_holdout_prediction_follows_token_evidence(spark, model_and_train):
    _, model = model_and_train
    new = spark.createDataFrame(
        [(10, "goal goal match"), (11, "vote senate")],
        ["doc_id", "text"],
    )
    pred = {
        r["doc_id"]: r["pred"]
        for r in classify(new, model, "doc_id", "text").collect()
    }
    assert pred == {10: "sports", 11: "politics"}


def test_unseen_tokens_score_the_add_one_floor(spark, model_and_train):
    _, model = model_and_train
    new = spark.createDataFrame([(20, "zebra")], ["doc_id", "text"])
    rows = classify(new, model, "doc_id", "text").collect()
    assert len(rows) == 1
    tot = {r["topic"]: r["tot"] for r in model["totals"].collect()}
    v = model["vocab"].collect()[0]["v"]
    # equal priors (2 docs each); 'zebra' unseen under both labels →
    # score_l = ln(1/2) + ln(1/(tot_l + V)); sports has 7 tokens,
    # politics 7 → exact tie → tie-break to 'politics' (ascending)
    assert tot["sports"] == tot["politics"] == 7
    assert rows[0]["pred"] == "politics"
    expect = math.log(0.5) + math.log(1.0 / (7 + v))
    assert rows[0]["logscore"] == pytest.approx(expect, abs=1e-4)


def test_empty_document_is_dropped(spark, model_and_train):
    _, model = model_and_train
    new = spark.createDataFrame([(30, "   ")], ["doc_id", "text"])
    assert classify(new, model, "doc_id", "text").count() == 0
