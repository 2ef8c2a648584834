"""Perceptual image dedup pins (pipeline/imagedup.py): the JVM
expression twin equals the mapInPandas fake path bit-for-bit on ASCII
payloads, a re-encoded/resized copy of a REAL image collides while a
distinct image does not, band-join candidate generation is
pigeonhole-complete vs brute force, and pairs compose into CC groups."""

from __future__ import annotations

from pyspark.sql import functions as F

from tcrd_spark.functions.png import encode_png, resize_png
from tcrd_spark.pipeline import imagedup
from tcrd_spark.pipeline.multimodal import attach_fake_payload


def _docs(spark, sf_dir, n=300):
    from tcrd_spark.sources.lake import load_table

    return (
        load_table(spark, sf_dir, "documents")
        .where(F.length("text") >= imagedup.MIN_CHARS)
        .orderBy("doc_id")
        .limit(n)
    )


def test_expression_twin_equals_fake_pixel_path(spark, sf_dir):
    """dhash_bands_expr (pure JVM, the registered query's path) and
    dhash_fingerprints(real_decode=False) (Arrow UDF over the payload
    bytes) must agree bit-for-bit on ASCII payloads — same contract as
    multimodal's fake decode."""
    docs = _docs(spark, sf_dir)
    expr_fp = {
        r.doc_id: (r.b0, r.b1, r.b2, r.b3)
        for r in imagedup.dhash_bands_expr(docs, "doc_id", "text").collect()
    }
    media = attach_fake_payload(docs, "doc_id", "text")
    udf_fp = {
        r.doc_id: (r.b0, r.b1, r.b2, r.b3)
        for r in imagedup.dhash_fingerprints(media, "doc_id").collect()
    }
    assert expr_fp == udf_fp and len(expr_fp) == docs.count()


def _img(w, h, f):
    """Deterministic RGB image from a pixel function f(x, y) -> int."""
    raw = bytearray()
    for y in range(h):
        for x in range(w):
            v = f(x, y) % 256
            raw += bytes((v, v, v))
    return encode_png(w, h, 3, raw)


def test_real_pixels_reencoded_copy_collides_distinct_does_not(spark):
    """The reason perceptual hashing exists: a resized re-encode of
    the same picture lands within the Hamming threshold; a different
    picture does not. Runs on REAL pixels via the pure-Python PNG
    codec (no PIL in this environment)."""
    # a textured deterministic image and its half-size re-encode
    tex = lambda x, y: (x * 7 + y * 13 + (x * y) // 5)  # noqa: E731
    a = _img(72, 48, tex)
    a_small, _, _ = resize_png(a, 36, 24)  # resized + re-encoded copy
    b = _img(72, 48, lambda x, y: (255 - x * 7 + y * 3))  # distinct
    media = spark.createDataFrame(
        [(1, bytearray(a)), (2, bytearray(a_small)), (3, bytearray(b))],
        "doc_id long, payload binary",
    )
    fp = imagedup.dhash_fingerprints(media, "doc_id", real_decode=True)
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in imagedup.image_near_dup_pairs(fp).collect()
    }
    assert (1, 2) in pairs, "resized re-encode must collide"
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_banding_is_pigeonhole_complete(spark, sf_dir):
    """Banded candidate generation finds EVERY pair with hamming <=
    3 — verified against the O(n^2) cross join on a sample."""
    docs = _docs(spark, sf_dir, n=200)
    fp = imagedup.dhash_bands_expr(docs, "doc_id", "text").cache()
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in imagedup.image_near_dup_pairs(fp).collect()
    }
    a, b = fp.alias("a"), fp.alias("b")
    hamming = sum(
        F.bit_count(F.col(f"a.b{j}").bitwiseXOR(F.col(f"b.b{j}")))
        for j in range(imagedup.BANDS)
    )
    brute = {
        (r.id_a, r.id_b): r.hamming
        for r in a.join(
            b, F.col("a.doc_id") < F.col("b.doc_id")
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            hamming.alias("hamming"),
        )
        .where(F.col("hamming") <= imagedup.MAX_HAMMING)
        .collect()
    }
    fp.unpersist()
    assert got == brute


def test_pairs_compose_into_groups(spark, sf_dir):
    """A~B, B~C collapse into one visual cluster through the existing
    alternating-star CC."""
    docs = _docs(spark, sf_dir, n=50).select("doc_id")
    pairs = spark.createDataFrame(
        [(1, 2, 0), (2, 3, 2)], "id_a long, id_b long, hamming int"
    )
    ids = [r.doc_id for r in docs.limit(3).collect()]
    # remap the synthetic pair ids onto real doc ids
    m = dict(zip([1, 2, 3], ids))
    pairs = pairs.select(
        F.udf(lambda x: m[x], "long")("id_a").alias("id_a"),
        F.udf(lambda x: m[x], "long")("id_b").alias("id_b"),
    )
    groups = imagedup.image_near_dup_groups(docs, pairs)
    rows = {r.doc_id: (r.group_id, r.group_sz) for r in groups.collect()}
    gid = rows[ids[0]][0]
    assert all(rows[i] == (gid, 3) for i in ids)
    singles = [r for d, r in rows.items() if d not in ids]
    assert all(sz == 1 for _, sz in singles)
