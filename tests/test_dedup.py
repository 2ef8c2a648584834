

def test_shingle_hashes_sql_matches_column_form(spark, sf_dir):
    """r12 one-parse hashed_shingles: the SQL-parsed hs column is
    value-identical to the Column-built form for every document."""
    from pyspark.sql import functions as F

    from tcrd_spark.functions.hashing import hash60
    from tcrd_spark.pipeline.dedup import hashed_shingles, shingles
    from tcrd_spark.sources.lake import load_table

    docs = load_table(spark, sf_dir, "documents")
    got = {
        r["doc_id"]: r["hs"]
        for r in hashed_shingles(docs, "doc_id", "text", 3).collect()
    }
    want = {
        r["doc_id"]: r["hs"]
        for r in docs.select(
            "doc_id",
            F.array_distinct(
                F.transform(shingles(F.col("text"), 3), hash60)
            ).alias("hs"),
        ).collect()
    }
    assert got == want


def test_jaccard_cache_storage_bounded_across_invocations(spark):
    """r12: repeated pair-builds must not accumulate one cached shingle
    frame per invocation — _cache_rotating releases the predecessor
    (the DataFrame twin of the r11 videodup rotating-cut discipline)."""
    from tcrd_spark.operators.lineage import _DF_ROTATING
    from tcrd_spark.pipeline.dedup import ngram_jaccard_pairs

    def n_persistent():
        return spark.sparkContext._jsc.sc().getPersistentRDDs().size()

    rows = [(i, f"tok{i} alpha beta gamma delta epsilon") for i in range(8)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.3).collect()
    base = n_persistent()
    key = (spark.sparkContext.applicationId, "jaccard-sh")
    assert key in _DF_ROTATING
    for _ in range(3):
        ngram_jaccard_pairs(docs, "doc_id", "text", n=3,
                            threshold=0.3).collect()
    # the slots rotate: persistent count does not grow per call
    assert n_persistent() <= base
