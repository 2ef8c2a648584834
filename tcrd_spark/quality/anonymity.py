"""k-anonymity audit — the data-governance twin of the PII scrubber.

`text_clean_pii` (pipeline/text.py) removes DIRECT identifiers from
text; re-identification risk also comes from QUASI-identifier
combinations in metadata (language × source × length band narrows a
document to a handful of candidates — Sweeney's k-anonymity). The
audit groups by the quasi-identifier tuple and reports every
equivalence class with its size and an at-risk flag (size < k); the
summary row count of risky classes is the release gate a corpus
publisher checks before shipping metadata alongside text
(`sources/export.py`).

100 TB shape: ONE map-side-combinable groupBy over the
quasi-identifier tuple — counts, nothing else; banding (integer
division) keeps the class space bounded and deterministic.

Reference parity: none (extension; the reference publishes open
biology data and has no privacy surface).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

K_DEFAULT = 5
BAND = 100  # n_chars band width: length is a strong quasi-identifier


def k_anonymity_audit(
    df: DataFrame, quasi_cols: list[Column | str], k: int = K_DEFAULT
) -> DataFrame:
    """(quasi..., class_size, at_risk): every equivalence class of the
    quasi-identifier tuple, flagged when smaller than k."""
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("class_size"))
        .select(
            "*",
            F.when(F.col("class_size") < k, F.lit(1))
            .otherwise(F.lit(0))
            .alias("at_risk"),
        )
    )


# ------------------------------------------------- registered query


def q_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equivalence classes of (lang, source, length band) over the
    corpus metadata, flagged below k=5."""
    from tcrd_spark.sources.lake import load_table

    docs = load_table(spark, sf_dir, "documents")
    # integer division on both engines: a double /-then-cast would
    # round in DuckDB but truncate in Spark
    band = F.expr(f"n_chars div {BAND}").alias("len_band")
    return k_anonymity_audit(
        docs.select("lang", "source", band), ["lang", "source", "len_band"],
        K_DEFAULT,
    )


QUERIES = {"k_anonymity_audit": q_k_anonymity_audit}

ORACLE = {
    "k_anonymity_audit": f"""
        SELECT lang, source,
               n_chars // {BAND} AS len_band,
               count(*) AS class_size,
               CASE WHEN count(*) < {K_DEFAULT} THEN 1 ELSE 0 END
                 AS at_risk
        FROM documents
        GROUP BY 1, 2, 3
    """,
}
