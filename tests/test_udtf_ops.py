"""UDTF surface pins (functions/udtf_ops.py): the table functions
register and run from SQL, and the Python UDTF agrees row-for-row
with its JVM-side expression twin (same segmentation rule)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tcrd_spark.functions.udtf_ops import (
    register_udtfs, split_sentences_expr, split_sentences_py,
)


def test_py_rule_pins():
    assert split_sentences_py("Hi there. Bye!  Ok") == [
        (0, 0, "Hi there."), (1, 10, "Bye!"), (2, 16, "Ok"),
    ]
    assert split_sentences_py("") == []
    assert split_sentences_py("no terminator") == [(0, 0, "no terminator")]


def test_udtf_runs_from_sql(spark):
    register_udtfs(spark)
    rows = spark.sql(
        "SELECT * FROM tcrd_split_sentences(7::bigint, 'A b. C d! E')"
    ).collect()
    assert [(r.doc_id, r.sent_idx, r.char_offset, r.sentence)
            for r in rows] == [
        (7, 0, 0, "A b."), (7, 1, 5, "C d!"), (7, 2, 10, "E"),
    ]
    grams = spark.sql(
        "SELECT gram FROM tcrd_ngrams(1::bigint, 'a b c d', 2)"
    ).collect()
    assert [g.gram for g in grams] == ["a b", "b c", "c d"]


def test_udtf_agrees_with_expression_twin(spark, sf_dir):
    from tcrd_spark.sources.lake import load_table

    register_udtfs(spark)
    # the synthetic corpus has no terminators — stitch multi-sentence
    # texts so the comparison exercises real segmentation
    docs = load_table(spark, sf_dir, "documents").limit(40).select(
        "doc_id",
        F.concat(
            F.substring("text", 1, 50), F.lit(". "),
            F.substring("text", 51, 40), F.lit("!  "),
            F.substring("text", 91, 30),
        ).alias("text"),
    )
    docs.createOrReplaceTempView("_udtf_docs")
    via_udtf = spark.sql(
        "SELECT s.* FROM _udtf_docs, "
        "LATERAL tcrd_split_sentences(doc_id, text) s"
    )
    via_expr = split_sentences_expr(docs, "doc_id", "text")
    a = sorted(tuple(r) for r in via_udtf.collect())
    b = sorted(tuple(r) for r in via_expr.collect())
    assert a == b and len(a) > 80  # ≥2 sentences per stitched doc


def test_expression_twin_offsets_slice_source_text(spark, sf_dir):
    """char_offset is a real offset: slicing the original text at it
    re-yields the sentence (modulo surrounding whitespace)."""
    from tcrd_spark.sources.lake import load_table

    docs = load_table(spark, sf_dir, "documents").limit(10).select(
        "doc_id", "text"
    )
    out = split_sentences_expr(docs, "doc_id", "text").join(docs, "doc_id")
    bad = out.where(
        F.trim(
            F.substring(
                F.col("text"),
                F.col("char_offset") + 1,
                F.length("sentence") + 8,
            )
        ).substr(F.lit(1), F.length("sentence")) != F.col("sentence")
    )
    assert bad.count() == 0
