"""Tokenizer fertility — tokens-per-word / tokens-per-100-chars by
corpus slice.

The metric that drives mixture and budget decisions at training time:
a tokenizer spends MORE tokens per character on some languages/
sources than others, so a token budget (pipeline/budget.py) and a
domain mixture (pipeline/mixture.py) need the per-slice exchange rate
between characters on disk and tokens consumed. fastText-era corpus
reports tabulate exactly this (BPE tokens / whitespace words =
fertility; tokens per 100 chars = compression).

Plan shape: per-row token counts are row-local regexp counts (no
explode — counting never materializes the token stream), then ONE
map-side-combinable groupBy over (lang, source). A hot language is
partial-aggregated before the exchange; output is |lang × source|
rows.

Reference parity: none (extension; SURVEY §2 corpus-construction,
with budget.py / mixture.py which consume these rates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tcrd_spark.pipeline.text import BPE_TOKEN_RE


def tokenizer_fertility(
    docs: DataFrame, text_col: str, slice_cols: list[str]
) -> DataFrame:
    """Per-slice corpus/token accounting: docs, chars, whitespace
    words, BPE-regex tokens, fertility (tokens/word), and tokens per
    100 chars."""
    per_doc = docs.select(
        *slice_cols,
        F.length(F.col(text_col)).cast("long").alias("_chars"),
        F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(r"[^\s]+"), F.lit(0))
        ).cast("long").alias("_words"),
        F.size(
            F.regexp_extract_all(
                F.col(text_col), F.lit(BPE_TOKEN_RE), F.lit(0)
            )
        ).cast("long").alias("_toks"),
    )
    return (
        per_doc.groupBy(*slice_cols)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_chars").alias("chars"),
            F.sum("_words").alias("words"),
            F.sum("_toks").alias("tokens"),
        )
        .select(
            *slice_cols,
            "n_docs", "chars", "words", "tokens",
            F.round(
                F.col("tokens") / F.nullif(F.col("words"), F.lit(0)), 6
            ).alias("fertility"),
            F.round(
                F.col("tokens") * 100.0
                / F.nullif(F.col("chars"), F.lit(0)),
                6,
            ).alias("tokens_per_100_chars"),
        )
    )


# ------------------------------------------------- registered query


def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token/char exchange rates of the documents corpus per
    (lang, source) slice."""
    from tcrd_spark.sources.lake import load_table

    docs = load_table(spark, sf_dir, "documents")
    return tokenizer_fertility(docs, "text", ["lang", "source"])


QUERIES = {"tokenizer_fertility": q_tokenizer_fertility}

ORACLE = {
    "tokenizer_fertility": r"""
        WITH d AS (
          SELECT lang, source,
                 length(text) AS c,
                 len(regexp_extract_all(text, '[^\s]+')) AS w,
                 len(regexp_extract_all(text,
                     '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS t
          FROM documents
        )
        SELECT lang, source,
               count(*) AS n_docs,
               CAST(sum(c) AS BIGINT) AS chars,
               CAST(sum(w) AS BIGINT) AS words,
               CAST(sum(t) AS BIGINT) AS tokens,
               round(sum(t) * 1.0 / nullif(sum(w), 0), 6) AS fertility,
               round(sum(t) * 100.0 / nullif(sum(c), 0), 6)
                 AS tokens_per_100_chars
        FROM d GROUP BY lang, source
    """,
}
