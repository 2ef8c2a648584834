"""Hard-negative mining for contrastive training — per anchor vector,
the most-similar corpus vectors that are NOT near-duplicates: similar
enough to be informative negatives, below the duplicate threshold so
they are not false negatives. The standard dataset-construction step
for embedding/retrieval training (in-batch negatives are easy; mined
hard negatives are what move the model).

Per anchor: rank corpus by cosine DESC, drop self and anything with
score >= dup_threshold (those are positives/duplicates, not
negatives), keep the top k. Scores rounded to 6 for the oracle.

100 TB shape: the anchor panel broadcasts over the corpus scan (the
brute_force_topk plan — one pass, WindowGroupLimit heap per anchor);
for corpus-scale anchor sets the IVF/PQ shortlist variants
(pipeline/similarity.py, pq.py) replace the exact scan and this
module's filter/rank applies unchanged to their candidate lists.

Reference parity: none (extension, SURVEY §2 corpus-construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

K = 5
DUP_THRESHOLD = 0.95


def hard_negatives(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = K,
    dup_threshold: float = DUP_THRESHOLD,
) -> DataFrame:
    """(q_id, c_id, score, rank): the k best sub-threshold negatives
    per anchor. queries: (q_id, q_vec); corpus: (c_id, c_vec)."""
    from tcrd_spark.pipeline.similarity import _pair_score, _with_norm

    q = _with_norm(queries, "q_id", "q_vec", dim)
    c = _with_norm(corpus, "c_id", "c_vec", dim)
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("c_id"))
    return (
        c.crossJoin(F.broadcast(q))
        .select(
            "q_id", "c_id",
            _pair_score("q_vec", "c_vec", dim).alias("score"),
        )
        .filter(
            (F.col("c_id") != F.col("q_id"))
            & (F.col("score") < dup_threshold)
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", "score", "rank")
    )


# ------------------------------------------------- registered query


def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 hard negatives (cosine < 0.95, excluding self) for the
    standard 5-anchor panel over the embeddings corpus."""
    from tcrd_spark.sources.lake import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    qs = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    return hard_negatives(qs, corpus, 64, k=K, dup_threshold=DUP_THRESHOLD)


QUERIES = {"hard_negatives": q_hard_negatives}


def _oracle() -> str:
    from tcrd_spark.pipeline.semdedup import _sql_dot

    return f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
                   FROM embeddings),
        c AS (SELECT vec_id AS c_id, v,
                     sqrt({_sql_dot("v", "v")}) AS nrm FROM e),
        q AS (SELECT vec_id AS q_id, v,
                     sqrt({_sql_dot("v", "v")}) AS nrm
              FROM e WHERE vec_id < 5),
        scored AS (
          SELECT q.q_id, c.c_id,
                 round({_sql_dot("q.v", "c.v")} / (q.nrm * c.nrm), 6)
                   AS score
          FROM c CROSS JOIN q
        )
        SELECT q_id, c_id, score, rank FROM (
          SELECT *, row_number() OVER (
                   PARTITION BY q_id
                   ORDER BY score DESC, c_id ASC) AS rank
          FROM scored
          WHERE c_id != q_id AND score < {DUP_THRESHOLD}
        ) WHERE rank <= {K}
    """


ORACLE = {"hard_negatives": _oracle()}
