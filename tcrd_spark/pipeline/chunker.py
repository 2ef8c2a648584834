"""Sliding-window document chunking — the pre-embedding step every
retrieval/RAG corpus build runs: split each document into fixed-size
token windows with overlap (stride < size), so no span longer than
(size - stride) falls across a chunk boundary unseen.

chunk k covers tokens [k*stride + 1, k*stride + size]; chunks are
emitted while k*stride < n_tokens (so trailing tokens always land in
a final, possibly short, chunk; an empty doc emits nothing). Pure
row-local arithmetic: tokenize → F.sequence over the chunk index →
explode → slice+join. The explode is the Generate barrier that keeps
the tokenization from being re-inlined into every chunk expression
(the CollapseProject×HOF trap, SCALE.md).

Pairs with `pipeline/pooling.embedding_meanpool` (chunk vectors →
doc vector) and the ANN family (chunk-level search).

Reference parity: none (extension, SURVEY §2.9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CHUNK_SIZE = 64
CHUNK_STRIDE = 48


def chunk_documents(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    size: int = CHUNK_SIZE,
    stride: int = CHUNK_STRIDE,
) -> DataFrame:
    """(id, chunk_id, n_tok, chunk_text): overlapping token windows."""
    if not (0 < stride <= size):
        raise ValueError(f"chunker: need 0 < stride <= size, got "
                         f"{stride=} {size=}")
    toks = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda t: t != ""
    )
    n = F.size(toks)
    # k = 0 .. ceil(n/stride) - 1 == floor((n-1)/stride)  (n >= 1)
    ks = F.when(
        n > 0, F.sequence(F.lit(0), F.floor((n - 1) / stride).cast("int"))
    ).otherwise(F.array().cast("array<int>"))
    return (
        docs.select(F.col(id_col), toks.alias("_w"),
                    F.explode(ks).alias("chunk_id"))
        .select(
            id_col,
            "chunk_id",
            F.slice(
                F.col("_w"), F.col("chunk_id") * stride + 1, size
            ).alias("_c"),
        )
        .select(
            id_col,
            "chunk_id",
            F.size("_c").cast("long").alias("n_tok"),
            F.array_join("_c", " ").alias("chunk_text"),
        )
    )


# ------------------------------------------------- registered query


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-token chunks, stride 48 (16-token overlap), whole corpus."""
    from tcrd_spark.sources.lake import load_table

    docs = load_table(spark, sf_dir, "documents")
    return chunk_documents(
        docs, "doc_id", "text", size=CHUNK_SIZE, stride=CHUNK_STRIDE
    )


QUERIES = {"chunk_documents": q_chunk_documents}

ORACLE = {
    "chunk_documents": f"""
        WITH t AS (
          SELECT doc_id,
                 list_filter(string_split_regex(text, '\\s+'),
                             x -> x != '') AS w
          FROM documents
        ),
        ch AS (
          SELECT doc_id,
                 unnest(list_transform(
                     range(0, CAST(floor((len(w) - 1)
                                         / {CHUNK_STRIDE}) AS BIGINT) + 1),
                     k -> {{'chunk_id': k,
                            'c': list_slice(w, k * {CHUNK_STRIDE} + 1,
                                            k * {CHUNK_STRIDE}
                                              + {CHUNK_SIZE})}}),
                     recursive := true)
          FROM t WHERE len(w) > 0
        )
        SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
               CAST(len(c) AS BIGINT) AS n_tok,
               array_to_string(c, ' ') AS chunk_text
        FROM ch
    """,
}
