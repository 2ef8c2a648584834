"""Embedding pooling: collapse chunk-level vectors to one document
vector (mean pooling) — the retrieval-pipeline step between chunk
embedding and document-level ANN.

100 TB shape: posexplode the vectors to (group, dim, value) rows and
let ONE map-side-combinable aggregate do the element-wise mean — never
a collect_list of whole vectors per group (a hot document with
thousands of chunks would materialize them all in one aggregation
buffer; the dim-row form keeps every partial a single float). The
pooled array reassembles from the D per-dim rows — D is the embedding
width, bounded and tiny next to the corpus.

Reference parity: none (no vector ops in the reference); extends the
similarity-search family (SURVEY.md §2) between raw embeddings and
the ANN/SQ/PQ stack, which can all run directly on pooled output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

POOL_GROUPS = 50


def mean_pool_dims(df: DataFrame, group_col, vec_col: str) -> DataFrame:
    """(grp, n_vectors, d, m): flat per-dimension mean rows — the
    driver-hashable form (every column atomic). `mean_pool` reassembles
    these into the array the ANN/SQ/PQ stack consumes; registered
    queries return THIS shape (the adjudication harness canonicalizes
    rows by sorting/hashing values, which nested arrays break)."""
    g = group_col if not isinstance(group_col, str) else F.col(group_col)
    per_dim = (
        df.select(g.alias("grp"), F.posexplode(vec_col).alias("d", "v"))
        .groupBy("grp", "d")
        .agg(F.round(F.avg("v"), 6).alias("m"))
    )
    counts = df.select(g.alias("grp")).groupBy("grp").agg(
        F.count("*").alias("n_vectors")
    )
    return per_dim.join(counts, "grp").select("grp", "n_vectors", "d", "m")


def mean_pool(df: DataFrame, group_col, vec_col: str) -> DataFrame:
    """(group, n_vectors, pooled): element-wise mean vector per group,
    each dimension rounded to 6 (cross-engine float-sum stability)."""
    g = group_col if not isinstance(group_col, str) else F.col(group_col)
    per_dim = (
        df.select(g.alias("grp"), F.posexplode(vec_col).alias("d", "v"))
        .groupBy("grp", "d")
        .agg(F.round(F.avg("v"), 6).alias("m"))
    )
    counts = df.select(g.alias("grp")).groupBy("grp").agg(
        F.count("*").alias("n_vectors")
    )
    pooled = (
        per_dim.groupBy("grp")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("d", "m"))),
                lambda s: s["m"],
            ).alias("pooled")
        )
        .join(counts, "grp")
        .select("grp", "n_vectors", "pooled")
    )
    return pooled


# ------------------------------------------------- registered queries


def q_embedding_meanpool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-pool every 'document' of chunk embeddings (vec_id % 50
    buckets stand in for chunk→doc membership). Flat per-dim rows:
    the driver's canonicalizer hashes atomic columns only (an
    array<double> output column is unhashable in its pandas canon)."""
    from tcrd_spark.sources.lake import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    return mean_pool_dims(emb, F.col("vec_id") % POOL_GROUPS, "embedding")


QUERIES = {"embedding_meanpool": q_embedding_meanpool}

ORACLE = {
    "embedding_meanpool": f"""
        WITH e AS (
            SELECT vec_id % {POOL_GROUPS} AS grp,
                   unnest(embedding) AS v,
                   unnest(range(1, len(embedding) + 1)) AS d
            FROM embeddings
        ),
        per_dim AS (
            SELECT grp, d - 1 AS d, round(avg(v), 6) AS m
            FROM e GROUP BY 1, 2
        ),
        counts AS (
            SELECT vec_id % {POOL_GROUPS} AS grp, count(*) AS n_vectors
            FROM embeddings GROUP BY 1
        )
        SELECT p.grp, c.n_vectors, p.d, p.m
        FROM per_dim p JOIN counts c USING (grp)
    """,
}
