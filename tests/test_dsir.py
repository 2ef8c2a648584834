"""DSIR importance resampling (pipeline/dsir.py): the weight sign
separates target-like from off-target documents, selection is
deterministic Gumbel-top-k, and the plans keep the ratio join
broadcast and the selection a bounded top-k (never a global sort)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tcrd_spark.pipeline.dsir import (
    SAMPLE_K,
    bucket_log_ratio,
    dsir_log_weights,
    dsir_sample,
    q_dsir_sample,
    q_dsir_weights,
)
from tests.test_plans import plan_of


@pytest.fixture(scope="module")
def corpora(spark):
    # target speaks "alpha"; half the raw corpus does too, half speaks
    # a disjoint "omega" vocabulary
    tgt = [(i, " ".join(["alpha beta gamma delta"] * 5)) for i in range(40)]
    raw = [(100 + i, " ".join(["alpha beta gamma delta"] * 5)) for i in range(30)]
    raw += [(200 + i, " ".join(["omega psi chi phi"] * 5)) for i in range(30)]
    target = spark.createDataFrame(tgt, ["doc_id", "text"])
    rawdf = spark.createDataFrame(raw, ["doc_id", "text"])
    return target, rawdf


def test_weights_separate_target_like_docs(corpora):
    target, raw = corpora
    ratio = bucket_log_ratio(target, raw, "doc_id", "text")
    w = dsir_log_weights(raw, ratio, "doc_id", "text").collect()
    alpha = [r["log_w"] for r in w if r["doc_id"] < 200]
    omega = [r["log_w"] for r in w if r["doc_id"] >= 200]
    assert min(alpha) > max(omega), (
        "target-vocabulary docs must outweigh off-target docs"
    )


def test_sample_is_deterministic_and_target_biased(corpora):
    target, raw = corpora
    ratio = bucket_log_ratio(target, raw, "doc_id", "text")
    w = dsir_log_weights(raw, ratio, "doc_id", "text")
    s1 = dsir_sample(w, "doc_id", 20).collect()
    s2 = dsir_sample(w, "doc_id", 20).collect()
    assert [r["doc_id"] for r in s1] == [r["doc_id"] for r in s2]
    # weight gap is large, so Gumbel noise cannot flip the classes:
    # every selected doc is from the target-like half
    assert all(r["doc_id"] < 200 for r in s1)


def test_registered_sample_size(spark, sf_dir):
    out = q_dsir_sample(spark, sf_dir)
    assert out.count() == min(
        SAMPLE_K,
        spark.read.parquet(f"{sf_dir}/documents.parquet").count(),
    )


def test_dsir_plans_are_scale_shaped(spark, sf_dir):
    """Ratio table joins broadcast (it is ≤B rows); weight agg keeps a
    partial/final pair; selection plans TakeOrderedAndProject, not a
    global Sort + Limit over an exchange."""
    wplan = plan_of(q_dsir_weights(spark, sf_dir))
    assert "BroadcastHashJoin" in wplan, wplan
    assert wplan.count("HashAggregate") >= 2, wplan
    splan = plan_of(q_dsir_sample(spark, sf_dir))
    assert "TakeOrderedAndProject" in splan, splan


def test_grams_sql_matches_column_form(spark, sf_dir):
    """r12 one-parse DSIR grams: the SQL-parsed gram array is
    value-identical to the Column-built chain."""
    from pyspark.sql import functions as F

    from tcrd_spark.pipeline.dsir import _grams_sql
    from tcrd_spark.pipeline.text import ws_tokens
    from tcrd_spark.sources.lake import load_table

    docs = load_table(spark, sf_dir, "documents")
    toks = F.transform(
        F.filter(ws_tokens(F.col("text")), lambda t: t != ""), F.lower
    )
    bigrams = F.when(
        F.size(toks) >= 2,
        F.zip_with(
            F.slice(toks, 1, F.size(toks) - 1),
            F.slice(toks, 2, F.size(toks) - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    want = {
        r["doc_id"]: r["g"]
        for r in docs.select(
            "doc_id", F.concat(toks, bigrams).alias("g")
        ).collect()
    }
    got = {
        r["doc_id"]: r["g"]
        for r in docs.select(
            "doc_id", F.expr(_grams_sql("`text`")).alias("g")
        ).collect()
    }
    assert got == want
