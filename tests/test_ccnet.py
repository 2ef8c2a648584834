"""CCNet perplexity bucketing (pipeline/ccnet.py): tertile split per
language, explicit 'unscored' bucket, monotone NLL ordering."""

from __future__ import annotations

from pyspark.sql import functions as F

from tcrd_spark.pipeline.ccnet import ccnet_buckets
from tcrd_spark.sources.lake import load_table


def test_buckets_are_per_language_tertiles(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    rows = ccnet_buckets(docs, "doc_id", "text").collect()
    assert len(rows) == docs.count()
    by_lang: dict[str, list] = {}
    for r in rows:
        if r["bucket"] != "unscored":
            by_lang.setdefault(r["pred_lang"], []).append(r)
        else:
            assert r["nll"] is None
    assert by_lang, "no scored documents"
    for lang, rs in by_lang.items():
        # ordering invariant: every head NLL <= every middle NLL <=
        # every tail NLL (ties at the edges may share a bucket label,
        # but never invert)
        heads = [r["nll"] for r in rs if r["bucket"] == "head"]
        mids = [r["nll"] for r in rs if r["bucket"] == "middle"]
        tails = [r["nll"] for r in rs if r["bucket"] == "tail"]
        if heads and mids:
            assert max(heads) <= min(mids), lang
        if mids and tails:
            assert max(mids) <= min(tails), lang
        if heads and tails:
            assert max(heads) <= min(tails), lang
        # tertiles: each non-empty bucket holds a meaningful share for
        # languages with enough documents
        if len(rs) >= 30:
            for part in (heads, mids, tails):
                assert len(part) >= len(rs) // 6, (
                    lang, len(heads), len(mids), len(tails)
                )


def test_short_docs_are_unscored_not_binned(spark):
    docs = spark.createDataFrame(
        [(1, "single"), (2, "the cat sat on the mat and the cat sat")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["bucket"]
           for r in ccnet_buckets(docs, "doc_id", "text").collect()}
    assert got[1] == "unscored"
    assert got[2] != "unscored"
