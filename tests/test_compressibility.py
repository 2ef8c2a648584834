"""Compression-score pins (pipeline/compressibility.py): the Arrow
UDF equals direct Python zlib exactly, repetition lowers the ratio,
random-ish text raises it, and the corpus query buckets sanely."""

from __future__ import annotations

import zlib

from tcrd_spark.pipeline.compressibility import (
    LEVEL, compression_scores, q_doc_compressibility,
)


def _frame(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_udf_equals_direct_zlib(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog " * 3,
        "spam " * 200,
        "a1b2c3d4e5f6g7h8i9j0" * 5,
        "",
        None,
    ]
    rows = {
        r.doc_id: r.zlib_ratio
        for r in compression_scores(
            _frame(spark, texts), "doc_id", "text"
        ).collect()
    }
    for i, t in enumerate(texts):
        if not t:
            assert rows[i] is None
        else:
            b = t.encode("utf-8")
            assert rows[i] == round(len(zlib.compress(b, LEVEL)) / len(b), 6)


def test_repetition_compresses_random_does_not(spark):
    import random

    rng = random.Random(7)
    alpha = "abcdefghijklmnopqrstuvwxyz 0123456789"
    texts = [
        "buy cheap pills now " * 100,                        # repetitive
        "".join(rng.choice(alpha) for _ in range(2000)),     # random-ish
    ]
    rows = {
        r.doc_id: (r.zlib_ratio, r.bucket)
        for r in compression_scores(
            _frame(spark, texts), "doc_id", "text"
        ).collect()
    }
    assert rows[0][0] < 0.1 and rows[0][1] == "repetitive"
    assert rows[1][0] > rows[0][0] * 5
    assert rows[1][1] in ("prose", "incompressible")


def test_corpus_query_shape(spark, sf_dir):
    out = q_doc_compressibility(spark, sf_dir)
    rows = out.collect()
    assert len(rows) > 0
    assert all(r.zlib_ratio is not None and 0 < r.zlib_ratio for r in rows)
    # synthetic word-salad corpus: mostly prose-like; the short tail
    # can exceed 1.0 (zlib header overhead dominates tiny texts) —
    # real pipelines length-gate before this filter
    assert all(
        r.bucket in ("prose", "repetitive", "incompressible")
        for r in rows
    )
    prose = sum(1 for r in rows if r.bucket == "prose")
    assert prose > len(rows) * 0.9
