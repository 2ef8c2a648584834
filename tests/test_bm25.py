"""BM25 scoring (pipeline/bm25.py): hand-computed values on a toy
corpus, monotonicity in tf, and length normalization."""

from __future__ import annotations

import math

import pytest

from tcrd_spark.pipeline.bm25 import B, K1, bm25_scores


def test_hand_computed_scores(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark spark spark aa bb"),
            (2, "spark aa bb cc dd"),
            (3, "aa bb cc dd ee"),
            (4, "query aa bb cc dd"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in bm25_scores(
            docs, "doc_id", "text", terms=("spark", "query")
        ).collect()
    }
    assert set(got) == {1, 2, 4}  # doc 3 matches nothing

    n, avgdl = 4.0, 5.0
    def bm25(tf, df, dl):
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        return idf * tf * (K1 + 1.0) / (
            tf + K1 * (1.0 - B + B * dl / avgdl)
        )

    assert got[1]["score"] == pytest.approx(bm25(3, 2, 5), abs=1e-6)
    assert got[2]["score"] == pytest.approx(bm25(1, 2, 5), abs=1e-6)
    assert got[4]["score"] == pytest.approx(bm25(1, 1, 5), abs=1e-6)
    # tf saturation: 3 occurrences score more than 1, less than 3x
    assert got[1]["score"] > got[2]["score"]
    assert got[1]["score"] < 3 * got[2]["score"]
    # rarer term (df=1) outranks common term (df=2) at equal tf/dl
    assert got[4]["score"] > got[2]["score"]


def test_length_normalization_penalizes_long_docs(spark):
    docs = spark.createDataFrame(
        [(1, "spark aa"), (2, "spark " + "aa " * 20)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["score"]
        for r in bm25_scores(docs, "doc_id", "text", terms=("spark",)).collect()
    }
    assert got[1] > got[2]
