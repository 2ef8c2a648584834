"""Multimodal plumbing tests: the real-decode stub raises cleanly, the
Arrow batch path streams, and payload bytes survive the round-trip."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_real_decode_stub_raises(spark):
    from tcrd_spark.pipeline.multimodal import (
        attach_fake_payload,
        extract_features,
    )

    docs = spark.createDataFrame([(1, "hello")], "doc_id long, text string")
    media = attach_fake_payload(docs, "doc_id", "text")
    with pytest.raises(Exception, match="NotImplementedError|real media decode"):
        extract_features(media, "doc_id", real_decode=True).collect()


def test_fake_features_deterministic(spark):
    import hashlib

    from tcrd_spark.pipeline.multimodal import (
        attach_fake_payload,
        extract_features,
    )

    docs = spark.createDataFrame(
        [(1, "abc"), (2, "zz top")], "doc_id long, text string"
    )
    media = attach_fake_payload(docs, "doc_id", "text")
    out = {r.doc_id: r for r in extract_features(media).collect()}
    assert out[1].n_bytes == 3
    assert out[1].content_hash == int(hashlib.md5(b"abc").hexdigest()[:15], 16)
    assert out[1].width == 16 + (ord("a") % 64)
    assert out[1].height == 16 + (ord("c") % 64)
    assert out[2].n_bytes == 6


def test_payload_binary_roundtrip(spark):
    """binary column survives parquet write/read and stays out of the
    feature shuffle (features only carry scalars)."""
    from tcrd_spark.pipeline.multimodal import attach_fake_payload

    docs = spark.createDataFrame([(7, "payload-text")], "doc_id long, text string")
    media = attach_fake_payload(docs, "doc_id", "text")
    row = media.select(
        "doc_id", F.length("payload").alias("n"), "media_type", "meta.n_bytes"
    ).collect()[0]
    assert (row.doc_id, row.n, row.media_type, row.n_bytes) == (
        7,
        12,
        "image/fake",
        12,
    )


def test_resize_plumbing(spark, sf_dir):
    from tcrd_spark.pipeline.multimodal import (
        attach_fake_payload,
        resize_images,
    )
    from tcrd_spark.sources.lake import load_table

    docs = load_table(spark, sf_dir, "documents").limit(20)
    media = attach_fake_payload(docs, "doc_id", "text")
    out = resize_images(media, 32, 32).collect()
    assert len(out) == 20
    budget = 32 * 32 // 8
    assert all(len(r.payload) == budget for r in out)
    assert all((r.width, r.height) == (32, 32) for r in out)
    assert all(r.src_width >= 16 and r.src_height >= 16 for r in out)


def test_frame_sampling_fanout(spark, sf_dir):
    import pytest as _pytest

    from tcrd_spark.pipeline.multimodal import (
        attach_fake_payload,
        sample_frames,
    )
    from tcrd_spark.sources.lake import load_table

    docs = load_table(spark, sf_dir, "documents").limit(5)
    media = attach_fake_payload(docs, "doc_id", "text")
    out = sample_frames(media, 4).collect()
    assert len(out) == 20                       # 5 docs × 4 frames
    per_doc = {}
    for r in out:
        per_doc.setdefault(r.doc_id, []).append(r.frame_idx)
    assert all(sorted(v) == [0, 1, 2, 3] for v in per_doc.values())

    # the real-decode gate raises, not silently fakes
    with _pytest.raises(Exception, match="video library"):
        sample_frames(media, 4, real_decode=True).collect()
