

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
