"""Mergeable grouped QUANTILE sketch — the missing member of the
sketch family (`pipeline/sketches.py` covers distinct counts, set
ops, and heavy hitters; this covers percentiles).

At 100 TB an exact grouped percentile is a full sort (or an exact
`percentile` aggregate holding every value); production engines
answer with mergeable quantile sketches (KLL, t-digest, GK). Spark
ships `percentile_approx` (an engine-private KLL-ish layout the
DuckDB oracle could never hash-match); this operator instead builds
the classic deterministic BOTTOM-K HASH SAMPLE (Cohen & Kaplan's
bottom-k sampling): the k rows with the smallest portable hash60 of a
unique row key form a uniform row sample per group, and the
discrete-rank percentile over the sample estimates the population
percentile with rank error O(√(q(1-q)/k)). Every step — the hash,
the rank filter, the rank pick — is computable identically in ANSI
SQL, so the SAME sketch (not a statistically similar one) is
adjudicated bit-for-bit against DuckDB.

Mergeability (the property that makes a sketch a sketch): bottom-k
of a union is the bottom-k of the two bottom-k's, exactly — so
shard-local sketches fold into the global sketch with zero error
vs sketching the whole set (pytest-pinned), the KMV/theta discipline.

100 TB shape: the rank filter plans as WindowGroupLimit (per-task
k-heaps per group, no group ever sorts its full value set); the
estimate then runs on ≤ k rows per group. The exact row count rides
one map-side-combinable aggregate. Nothing holds more than k rows
per group anywhere.

Reference parity: the reference computes medians exactly in pandas
(`python/TIN-X.py` percentile calls); the sketch is the
large-scale extension for when exact is no longer affordable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tcrd_spark.functions.hashing import hash60, sql_hash60

QK = 256  # sample size: ~3% rank error at q=0.5 (1 sigma)
QUANTS = (0.5, 0.9, 0.99)


def quantile_sketch(
    df: DataFrame,
    group_cols: list[str],
    val_col: str | Column,
    key_col: str | Column,
    k: int = QK,
) -> DataFrame:
    """(group..., v, h): the k rows with the smallest hash60(key) per
    group — a deterministic uniform row sample. `key_col` must be
    unique per row (it IS the sample's randomness source; hashing the
    value would bias the sample toward hash-small values).

    The rank filter plans as WindowGroupLimit: each task keeps a
    k-heap per group, the shuffle carries at most k rows per
    (task, group)."""
    base = df.select(
        *group_cols,
        F.col(val_col).alias("v") if isinstance(val_col, str) else val_col.alias("v"),
        hash60(F.col(key_col).cast("string") if isinstance(key_col, str) else key_col.cast("string")).alias("h"),
    )
    w = Window.partitionBy(*group_cols).orderBy(F.asc("h"), F.asc("v"))
    return (
        base.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def merge_quantile_sketches(
    a: DataFrame, b: DataFrame, group_cols: list[str], k: int = QK
) -> DataFrame:
    """Fold two sketches into the sketch of the union: re-take the
    bottom-k of the combined samples. EXACT — bottom-k(A ∪ B) ==
    bottom-k(bottom-k(A) ∪ bottom-k(B)) when row keys are unique
    across both inputs (pytest-pinned)."""
    u = a.unionByName(b)
    w = Window.partitionBy(*group_cols).orderBy(F.asc("h"), F.asc("v"))
    return (
        u.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def quantile_estimates(
    sketch: DataFrame,
    group_cols: list[str],
    quants: tuple[float, ...] = QUANTS,
) -> DataFrame:
    """Collapse a sketch to (group..., k_eff, q50, q90, ...): the
    discrete-rank percentile over the sample — the value at rank
    max(1, ceil(q · k_eff)) in (v, h) order. Rank selection, not
    interpolation: both engines pick the IDENTICAL sample member, so
    estimates hash-match bit-for-bit."""
    wk = Window.partitionBy(*group_cols)
    wv = Window.partitionBy(*group_cols).orderBy(F.asc("v"), F.asc("h"))
    ranked = sketch.select(
        *group_cols,
        "v",
        F.count(F.lit(1)).over(wk).alias("k_eff"),
        F.row_number().over(wv).alias("vrn"),
    )
    aggs = [F.max("k_eff").alias("k_eff")]
    for q in quants:
        rank = F.greatest(F.lit(1), F.ceil(F.lit(q) * F.col("k_eff")))
        aggs.append(
            F.max(F.when(F.col("vrn") == rank, F.col("v"))).alias(
                f"q{int(q * 100)}"
            )
        )
    return ranked.groupBy(*group_cols).agg(*aggs)


# ------------------------------------------------- registered query


def q_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority order-price percentiles (p50/p90/p99) from a
    256-row bottom-k hash sample, alongside the exact group row count.
    The sketch, the rank picks, and the count are all deterministic —
    hash-green vs the identical DuckDB construction."""
    from tcrd_spark.sources.lake import load_table

    orders = load_table(spark, sf_dir, "orders")
    sk = quantile_sketch(
        orders, ["o_orderpriority"], "o_totalprice", "o_orderkey", QK
    )
    est = quantile_estimates(sk, ["o_orderpriority"], QUANTS)
    n = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    return est.join(n, "o_orderpriority").select(
        "o_orderpriority", "n_rows", "k_eff", "q50", "q90", "q99"
    )


QUERIES = {"quantile_sketch": q_quantile_sketch}

_H = sql_hash60("CAST(o_orderkey AS VARCHAR)")

ORACLE = {
    "quantile_sketch": f"""
        WITH base AS (
          SELECT o_orderpriority, o_totalprice AS v, {_H} AS h
          FROM orders
        ),
        samp AS (
          SELECT o_orderpriority, v, h FROM (
            SELECT *, row_number() OVER (
              PARTITION BY o_orderpriority ORDER BY h, v
            ) AS rn FROM base
          ) WHERE rn <= {QK}
        ),
        ranked AS (
          SELECT o_orderpriority, v,
                 count(*) OVER (PARTITION BY o_orderpriority) AS k_eff,
                 row_number() OVER (
                   PARTITION BY o_orderpriority ORDER BY v, h
                 ) AS vrn
          FROM samp
        ),
        est AS (
          SELECT o_orderpriority, max(k_eff) AS k_eff,
                 {", ".join(
                   f"max(CASE WHEN vrn = greatest(1, "
                   f"CAST(ceil({q} * k_eff) AS BIGINT)) THEN v END) "
                   f"AS q{int(q * 100)}"
                   for q in QUANTS
                 )}
          FROM ranked GROUP BY o_orderpriority
        ),
        n AS (
          SELECT o_orderpriority, count(*) AS n_rows
          FROM orders GROUP BY o_orderpriority
        )
        SELECT est.o_orderpriority, n_rows, k_eff, q50, q90, q99
        FROM est JOIN n USING (o_orderpriority)
    """,
}
