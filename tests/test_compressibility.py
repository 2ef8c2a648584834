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


def test_mean_ratio_band_gates_spam_batch(spark, sf_dir, tmp_path):
    """The band spec quarantines a template-spam micro-batch through
    the write-audit-publish sink — UDF metric, standard plumbing."""
    import glob
    import json
    import os

    from tcrd_spark.pipeline.compressibility import mean_ratio_band
    from tcrd_spark.sources import snapshots as snap

    table = str(tmp_path / "t")
    src = tmp_path / "in"
    os.makedirs(src)
    from tcrd_spark.sources.lake import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    snap.create_table(docs, table, "lang")

    def write_chunk(name, rows):
        p = os.path.join(str(src), f"{name}.json")
        with open(p + ".tmp", "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        os.rename(p + ".tmp", p)

    prose = [
        {"doc_id": 10**6 + i, "lang": "en",
         "text": f"document {i} discusses a different topic entirely "
                 f"with varied vocabulary item{i % 97} and fresh tokens"}
        for i in range(50)
    ]
    spam = [
        {"doc_id": 2 * 10**6 + i, "lang": "en",
         "text": "buy cheap pills now " * 100}
        for i in range(50)
    ]
    write_chunk("prose", prose)
    write_chunk("spam", spam)

    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )

    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("lang", StringType()),
        StructField("text", StringType()),
    ])
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).json(str(src))
    )
    qdir = str(tmp_path / "q")
    q = snap.streaming_snapshot_append(
        stream, table, str(tmp_path / "ckpt"),
        expectations=[mean_ratio_band("text")], quarantine_dir=qdir,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    published = {
        r.doc_id for r in snap.read_version(spark, table).collect()
    }
    assert 10**6 + 1 in published          # prose landed
    assert 2 * 10**6 + 1 not in published  # spam quarantined
    quarantined = spark.read.parquet(
        *glob.glob(os.path.join(qdir, "batch_id=*"))
    )
    assert quarantined.count() == 50


def test_sidecar_variant_equals_production_path(spark, sf_dir):
    """VERDICT r9 #6: the adjudicable sidecar variant
    (compressibility_buckets — precomputed zlib_bytes joined by
    content hash) must be ROW-IDENTICAL to the pandas-UDF production
    path on the same documents. Equality here transitively
    re-validates the committed sidecar's byte counts against live
    Python zlib (the UDF path calls zlib.compress directly)."""
    from tcrd_spark.pipeline.compressibility import (
        q_compressibility_buckets, q_doc_compressibility,
    )

    prod_all = {
        r.doc_id: (r.n_bytes, r.zlib_ratio, r.bucket)
        for r in q_doc_compressibility(spark, sf_dir).collect()
    }
    side = {
        r.doc_id: (r.n_bytes, r.zlib_ratio, r.bucket)
        for r in q_compressibility_buckets(spark, sf_dir).collect()
    }
    # the variant excludes NULL/empty docs (division semantics differ
    # cross-engine there); the production path scores them NULL/'prose'
    prod = {k: v for k, v in prod_all.items() if v[0] and v[0] > 0}
    assert prod == side and len(prod) == 500
    assert all(v[1] is None for k, v in prod_all.items() if k not in side)
