"""Token-budget corpus assembly — "give me N tokens per domain".

Mixture weights (`pipeline/mixture.py`) decide the PROPORTIONS of a
training mix; the assembly step that actually builds it is a
token-budget cut: within each domain, take documents in a
deterministic pseudo-random order until the domain's token budget is
spent. Budgets, not row counts, are what a pretraining run consumes —
a domain of long documents must contribute fewer rows for the same
token share.

Semantics: documents order by the portable 60-bit hash of their id
(deterministic, replayable, append-stable: adding documents to OTHER
domains never changes a domain's selection); a document is kept while
the RUNNING token total (inclusive) fits the budget, and the first
document of a domain is always kept so no domain starves on one
oversized head.

100 TB shape: ONE ordered window per domain partition — domain
cardinality is the parallelism, the running sum is a single pass, no
global sort, no collect. A hot domain is bounded by ITS documents
(the same per-key discipline as sessionize/scd2); at extreme per-key
row counts the budget cut composes with the skew-split machinery.

Reference parity: none (extension; SURVEY §2 corpus-construction,
with mixture.py and dsir.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tcrd_spark.functions.hashing import hash60, sql_hash60
from tcrd_spark.pipeline.text import BPE_TOKEN_RE

TOKEN_BUDGET = 2_000  # per-domain budget for the registered query


def token_budget_sample(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    domain_col: str,
    budget: int,
) -> DataFrame:
    """(id, domain, n_tok, cum_tok): the documents selected into the
    mix, with their token count and the running domain total at
    selection time."""
    toks = docs.select(
        F.col(id_col),
        F.col(domain_col).alias("domain"),
        F.size(
            F.regexp_extract_all(
                F.col(text_col), F.lit(BPE_TOKEN_RE), F.lit(0)
            )
        ).cast("long").alias("n_tok"),
        hash60(F.col(id_col).cast("string")).alias("_h"),
    )
    w = (
        Window.partitionBy("domain")
        .orderBy("_h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wo = Window.partitionBy("domain").orderBy("_h", id_col)
    return (
        toks.withColumn("cum_tok", F.sum("n_tok").over(w))
        .withColumn("_rn", F.row_number().over(wo))
        .filter((F.col("cum_tok") <= budget) | (F.col("_rn") == 1))
        .select(id_col, "domain", "n_tok", "cum_tok")
    )


# ------------------------------------------------- registered query


def q_mixture_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-budget cut of the documents corpus (2k tokens
    per source, hash-ordered)."""
    from tcrd_spark.sources.lake import load_table

    docs = load_table(spark, sf_dir, "documents")
    return token_budget_sample(
        docs, "doc_id", "text", "source", TOKEN_BUDGET
    )


QUERIES = {"mixture_token_budget": q_mixture_token_budget}

_H = sql_hash60("doc_id::VARCHAR")

ORACLE = {
    "mixture_token_budget": f"""
        WITH t AS (
          SELECT doc_id, source AS domain,
                 len(regexp_extract_all(text,
                     '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_tok,
                 {_H} AS h
          FROM documents
        ),
        r AS (
          SELECT doc_id, domain, n_tok,
                 CAST(sum(n_tok) OVER (
                   PARTITION BY domain ORDER BY h, doc_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tok,
                 row_number() OVER (
                   PARTITION BY domain ORDER BY h, doc_id) AS rn
          FROM t
        )
        SELECT doc_id, domain, n_tok, cum_tok
        FROM r WHERE cum_tok <= {TOKEN_BUDGET} OR rn = 1
    """,
}
