"""BM25 keyword relevance scoring (Robertson & Zaragoza, "The
Probabilistic Relevance Framework: BM25 and Beyond", 2009) — the
classic sparse-retrieval scorer a corpus pipeline uses for targeted
quality slicing ("find the docs about X") and as the lexical half of
hybrid (BM25 + ANN) search next to pipeline/similarity.

    score(d, q) = Σ_t idf(t) · tf(t,d)·(k1+1)
                         / (tf(t,d) + k1·(1 − b + b·|d|/avgdl))
    idf(t)     = ln(1 + (N − df(t) + 0.5) / (df(t) + 0.5))

Shape: per-document term frequencies are row-local array expressions
(one fixed column per query term — the query is small by definition);
corpus statistics (N, avgdl, per-term df) are ONE aggregate broadcast
back; the score is a fixed-order row-local expression. No explode, no
shuffle beyond the single stats aggregate — a 100 TB corpus pays one
pruned scan. Determinism: the per-term sum is unrolled left-assoc
(the dedup.dot discipline), so the DuckDB oracle reproduces scores
bit-for-bit and `bm25_search` is fully hash-adjudicated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tcrd_spark.pipeline.text import ws_tokens

K1 = 1.2
B = 0.75
# the registered query's search terms (present in the synthetic docs)
TERMS = ("spark", "query", "stream")


def bm25_scores(
    docs: DataFrame, id_col: str, text_col: str,
    terms: tuple[str, ...] = TERMS, k1: float = K1, b: float = B,
) -> DataFrame:
    """(id, tf_<term>..., score) for documents matching ≥1 term.
    Lowercased exact-token match."""
    toks = F.transform(
        F.filter(ws_tokens(F.col(text_col)), lambda t: t != ""), F.lower
    )

    def _match(word):
        # a (t, w) two-arg lambda would make F.filter bind w to the
        # ELEMENT INDEX — close over the term instead
        return lambda t: t == word

    per_doc = docs.select(
        F.col(id_col),
        F.size(toks).cast("double").alias("_dl"),
        *[
            F.size(F.filter(toks, _match(w)))
            .cast("double")
            .alias(f"tf_{i}")
            for i, w in enumerate(terms)
        ],
    )
    stats = per_doc.agg(
        F.count("*").cast("double").alias("_n"),
        F.avg("_dl").alias("_avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("double")).alias(f"_df_{i}")
            for i in range(len(terms))
        ],
    )
    j = per_doc.crossJoin(F.broadcast(stats))
    parts = []
    for i in range(len(terms)):
        tf = F.col(f"tf_{i}")
        idf = F.log(
            F.lit(1.0)
            + (F.col("_n") - F.col(f"_df_{i}") + 0.5)
            / (F.col(f"_df_{i}") + 0.5)
        )
        norm = tf + F.lit(k1) * (
            F.lit(1.0 - b) + F.lit(b) * F.col("_dl") / F.col("_avgdl")
        )
        parts.append(idf * (tf * F.lit(k1 + 1.0)) / norm)
    score = parts[0]
    for p in parts[1:]:
        score = score + p
    return (
        j.select(
            id_col,
            *[F.col(f"tf_{i}").cast("long").alias(f"tf_{i}")
              for i in range(len(terms))],
            F.round(score, 6).alias("score"),
        )
        .where(F.col("score") > 0)
    )


# ------------------------------------------------- registered queries


def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 relevance of every document against the fixed 3-term
    query; only matching documents survive."""
    from tcrd_spark.sources.lake import load_table, split_for_scan

    # split guard (r12): the single-row-group test table pinned the
    # tokenize/score pass to one task — 0.95 → 0.43s at sf0.1
    docs = split_for_scan(spark, load_table(spark, sf_dir, "documents"))
    return bm25_scores(docs, "doc_id", "text")


QUERIES = {"bm25_search": q_bm25_search}


_W = ("list_transform(list_filter(string_split_regex(text, '\\s+'), "
      "t -> t != ''), t -> lower(t))")


def _oracle() -> str:
    tf_cols = ", ".join(
        f"CAST(len(list_filter(w, t -> t = '{w_}')) AS DOUBLE) AS tf_{i}"
        for i, w_ in enumerate(TERMS)
    )
    df_cols = ", ".join(
        f"sum(CASE WHEN tf_{i} > 0 THEN 1.0 ELSE 0.0 END) AS df_{i}"
        for i in range(len(TERMS))
    )
    parts = " + ".join(
        f"(ln(1.0 + (s.n - s.df_{i} + 0.5) / (s.df_{i} + 0.5))"
        f" * (d.tf_{i} * {K1 + 1.0})"
        f" / (d.tf_{i} + {K1} * ({1.0 - B} + {B} * d.dl / s.avgdl)))"
        for i in range(len(TERMS))
    )
    tf_out = ", ".join(
        f"CAST(d.tf_{i} AS BIGINT) AS tf_{i}" for i in range(len(TERMS))
    )
    return f"""
        WITH d AS (
          SELECT doc_id, CAST(len(w) AS DOUBLE) AS dl, {tf_cols}
          FROM (SELECT doc_id, {_W} AS w FROM documents)
        ),
        s AS (
          SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl,
                 {df_cols}
          FROM d
        )
        SELECT d.doc_id, {tf_out}, round({parts}, 6) AS score
        FROM d CROSS JOIN s
        WHERE round({parts}, 6) > 0
    """


ORACLE = {"bm25_search": _oracle()}
