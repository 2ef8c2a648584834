"""Structural invariants of the composed corpus_pipeline_v2 (value
parity vs DuckDB rides the registry sweep at sf0.001 and the driver
gate at sf0.01)."""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_corpus_pipeline_v2_invariants(spark, sf_dir):
    from tcrd_spark.pipeline.corpus_v2 import (
        BENCH_MAX_ID,
        PACK_BUDGET,
        PACK_SHARDS,
        corpus_pipeline_v2,
    )
    from tcrd_spark.sources.lake import load_table

    out = corpus_pipeline_v2(spark, sf_dir).cache()
    rows = out.collect()
    assert len(rows) > 10, "pipeline degenerated to (almost) nothing"

    # kept docs are real, unique, and never from the benchmark set
    ids = [r.doc_id for r in rows]
    assert len(ids) == len(set(ids))
    assert min(ids) >= BENCH_MAX_ID
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(ids) < n_docs, "pipeline must actually filter"

    # pack layout: chunk is the budget-bin of the doc's start offset,
    # offsets are per-shard prefix sums of n_tok in (hash, id) order
    for r in rows:
        assert 0 <= r.shard < PACK_SHARDS
        assert r.chunk == r.chunk_off // PACK_BUDGET
        assert r.n_tok >= 0 and r.chunk_off >= 0
    per_shard = {}
    for r in rows:
        per_shard.setdefault(r.shard, []).append(r)
    for shard_rows in per_shard.values():
        shard_rows.sort(key=lambda r: r.chunk_off)
        run = 0
        for r in shard_rows:
            assert r.chunk_off == run
            run += r.n_tok
