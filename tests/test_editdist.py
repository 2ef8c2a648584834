"""Edit-distance dedup properties: blocking soundness (no qualifying
pair escapes the bucket scheme), counting-filter losslessness, and
exactly-once pair emission (values vs DuckDB ride the registry
sweep)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tcrd_spark.pipeline import editdist


def _pairs(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return editdist.edit_distance_pairs(df, "doc_id", "text", **kw)


def test_identical_and_near_identical_found(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # dist 0
        (3, "the quick brown fox jumped over the lazy dog"),  # dist 2
        (4, "completely unrelated text that matches nothing here at all"),
    ]
    # T must be well under the string lengths or ANY two short strings
    # qualify (dist <= max(len) always)
    got = {
        (r.id_a, r.id_b): r.dist
        for r in _pairs(spark, rows, max_dist=10, bucket=16).collect()
    }
    assert got[(1, 2)] == 0
    assert got[(1, 3)] == 2 and got[(2, 3)] == 2
    assert not any(4 in p for p in got)


def test_cross_bucket_pairs_survive_both_directions(spark):
    # ids chosen so the smaller id sits in the LOWER bucket for one
    # pair and the HIGHER bucket for the other — both must be found
    short = "x" * 60  # bucket 0
    long = "x" * 70  # bucket 1, dist 10
    got = {(r.id_a, r.id_b) for r in _pairs(spark, [(1, short), (2, long)]).collect()}
    assert (1, 2) in got
    got2 = {(r.id_a, r.id_b) for r in _pairs(spark, [(1, long), (2, short)]).collect()}
    assert (1, 2) in got2


def test_pairs_emitted_exactly_once(spark, sf_dir):
    df = editdist.q_dedup_edit_distance(spark, sf_dir)
    n = df.count()
    assert df.select("id_a", "id_b").distinct().count() == n


def test_counting_filter_is_lossless(spark, sf_dir):
    # brute-force (no bag prune) agrees with the filtered pipeline
    from tcrd_spark.sources.lake import load_table

    docs = load_table(spark, sf_dir, "documents").filter(F.col("lang") == "de")
    fast = {
        (r.id_a, r.id_b, r.dist)
        for r in editdist.edit_distance_pairs(docs, "doc_id", "text").collect()
    }
    a = docs.select(F.col("doc_id").alias("ia"), F.col("text").alias("ta"))
    b = docs.select(F.col("doc_id").alias("ib"), F.col("text").alias("tb"))
    brute = {
        (r.ia, r.ib, r.d)
        for r in a.crossJoin(b)
        .filter(F.col("ia") < F.col("ib"))
        .select("ia", "ib", F.levenshtein("ta", "tb").alias("d"))
        .filter(F.col("d") <= editdist.MAX_DIST)
        .collect()
    }
    assert fast == brute
