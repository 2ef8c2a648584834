"""TF-IDF top-terms per document — the lexical keyword extractor that
complements BM25 (fixed-query relevance) with a query-free per-doc
summary; training pipelines use it for topic tagging, near-dup
explanation, and cheap doc descriptors.

Formula pinned for cross-engine determinism: tf = raw term count in
the doc; idf = ln((N + 1) / (df + 1)) + 1 (smoothed, never negative);
score = round(tf * idf, 6); top-k per doc by (score DESC, term ASC).

100 TB shape: tokenize row-local → ONE (doc, term) count shuffle; df
reuses the same aggregate's output (term-keyed partial counts combine
map-side); N is a 1-row broadcast; the per-doc top-k is a
WindowGroupLimit heap (rank filter pushed below the exchange), never
a global sort. The tf table shuffles 8-byte-ish (hash, count) pairs
at scale if terms are dictionary-encoded; here terms ride as strings
for oracle legibility.

Reference parity: none (the reference has no text-statistics layer);
extension row in SURVEY §2.9.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

TOP_K = 5


def tfidf_topterms(
    docs: DataFrame, id_col: str, text_col: str, k: int = TOP_K
) -> DataFrame:
    """(id, term, tf, df, score, rank): the k highest-scoring terms
    per document."""
    toks = docs.select(
        F.col(id_col),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"),
                lambda t: t != "",
            )
        ).alias("term"),
    )
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n))
        .select(
            id_col,
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf")
                * (
                    F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0))
                    + 1.0
                ),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df", "score", "rank")
    )


# ------------------------------------------------- registered query


def q_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 TF-IDF terms per document over the corpus."""
    from tcrd_spark.sources.lake import load_table

    docs = load_table(spark, sf_dir, "documents")
    return tfidf_topterms(docs, "doc_id", "text", k=TOP_K)


QUERIES = {"tfidf_topterms": q_tfidf_topterms}

ORACLE = {
    "tfidf_topterms": f"""
        WITH toks AS (
          SELECT doc_id,
                 unnest(list_filter(
                     string_split_regex(lower(text), '\\s+'),
                     t -> t != '')) AS term
          FROM documents
        ),
        tf AS (
          SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2
        ),
        df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        n AS (SELECT count(*) AS n_docs FROM documents),
        scored AS (
          SELECT tf.doc_id, tf.term, tf.tf, df.df,
                 round(tf.tf * (ln((n.n_docs + 1.0) / (df.df + 1.0))
                                + 1.0), 6) AS score
          FROM tf JOIN df USING (term) CROSS JOIN n
        )
        SELECT doc_id, term, tf, df, score, rank FROM (
          SELECT *, row_number() OVER (
                   PARTITION BY doc_id
                   ORDER BY score DESC, term ASC) AS rank
          FROM scored
        ) WHERE rank <= {TOP_K}
    """,
}
