"""Tau tissue-specificity (Yanai et al. 2005) — continuous and ordinal.

Reference semantics:
- ordinal (`R/hpa_tau.R:1-11`): qualitative levels mapped 0-3, median
  per tissue, tau = Σ(1 − level/max_level) / (n_tissues − 1).
- continuous (`R/gtex_process.R:9-16`): decile-bin the per-tissue
  log10-medians (Hmisc::cut2 g=10; NA → bin 0), tau =
  Σ Freq·(1 − bin/max_bin) / (ΣFreq − 1).
- qualitative level (`R/gtex_process.R:50`): RANK = frank(median)/.N
  per gene with **average tie ranks** (data.table frank default);
  zero medians forced to rank 0; buckets 0→'Not detected',
  (0,.25)→'Low', [.25,.75)→'Medium', ≥.75→'High'.

Deviation (documented): cut2 assigns *value*-quantile bins so equal
values share a bin; we use ntile(10) over a totally-ordered sort
(value, tissue) which may split ties across adjacent bins. The oracle
SQL uses the identical ntile + tie-break so both engines agree; a
bit-exact cut2 reimplementation would need a per-gene quantile-edge
pass (noted as future work).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def tau_ordinal(df: DataFrame, entity: str, tissue: str, level: str) -> DataFrame:
    """df: (entity, tissue, level ∈ {0..3}) one row per measurement →
    (entity, n_tissues, tau). Median per tissue first (hpa_tau.R:8)."""
    med = df.groupBy(entity, tissue).agg(F.median(level).alias("lv"))
    w = Window.partitionBy(entity)
    return (
        med.withColumn("mx", F.max("lv").over(w))
        .groupBy(entity)
        .agg(
            F.count("*").alias("n_tissues"),
            F.round(
                F.sum(
                    F.when(F.col("mx") > 0, 1 - F.col("lv") / F.col("mx"))
                )
                / (F.count("*") - 1),
                6,
            ).alias("tau"),
        )
    )


def tau_continuous(
    df: DataFrame, entity: str, tissue: str, value: str
) -> DataFrame:
    """df: (entity, tissue, value) one row per (entity, tissue) →
    (entity, n_tissues, tau). Pipeline per gtex_process.R: log10 of
    positive values (else NULL → bin 0), decile bin, tau over bins."""
    lg = df.select(
        entity,
        tissue,
        F.when(F.col(value) > 0, F.log10(value)).alias("lm"),
    )
    nn = lg.filter(F.col("lm").isNotNull())
    w = Window.partitionBy(entity).orderBy("lm", tissue)
    binned = nn.withColumn("bin", F.ntile(10).over(w)).unionByName(
        lg.filter(F.col("lm").isNull()).withColumn("bin", F.lit(0))
    )
    wmax = Window.partitionBy(entity)
    return (
        binned.withColumn("mx", F.max("bin").over(wmax))
        .groupBy(entity)
        .agg(
            F.count("*").alias("n_tissues"),
            # all-NA entity (every bin 0, mx 0) → 0.0, matching the
            # reference tau()'s explicit all-NA short-circuit
            # (R/gtex_process.R)
            F.when(F.max("mx") == 0, F.lit(0.0))
            .otherwise(
                F.round(
                    F.sum(
                        F.when(F.col("mx") > 0, 1 - F.col("bin") / F.col("mx"))
                    )
                    / (F.count("*") - 1),
                    6,
                )
            )
            .alias("tau"),
        )
    )


def tau_continuous_cut2(
    df: DataFrame, entity: str, tissue: str, value: str, g: int = 10
) -> DataFrame:
    """tau with Hmisc::cut2-style VALUE-quantile bins (SURVEY §7 hard
    part a): per entity, interior quantile edges at 1/g..(g-1)/g of the
    log10-medians; bin(x) = 1 + #distinct edges ≤ x. Unlike ntile,
    EQUAL VALUES ALWAYS SHARE A BIN (an all-equal entity gets tau 0,
    where ntile's tie-splitting yields 0.5). Edges are rounded to 9 dp
    before the ≥ comparison so Spark and the DuckDB oracle make
    identical binary decisions on interpolated edges."""
    lg = df.select(
        entity,
        tissue,
        F.when(F.col(value) > 0, F.log10(value)).alias("lm"),
    )
    probs = [i / g for i in range(1, g)]
    edges = (
        lg.filter(F.col("lm").isNotNull())
        .groupBy(entity)
        .agg(
            F.array_distinct(
                F.transform(
                    F.percentile("lm", F.array(*[F.lit(p) for p in probs])),
                    lambda e: F.round(e, 9),
                )
            ).alias("edges")
        )
    )
    binned = (
        lg.join(edges, entity, "left")
        .withColumn(
            "bin",
            F.when(
                F.col("lm").isNotNull(),
                1
                + F.size(
                    F.filter(
                        F.col("edges"),
                        lambda e: F.round(F.col("lm"), 9) >= e,
                    )
                ),
            ).otherwise(0),
        )
    )
    wmax = Window.partitionBy(entity)
    return (
        binned.withColumn("mx", F.max("bin").over(wmax))
        .groupBy(entity)
        .agg(
            F.count("*").alias("n_tissues"),
            # all-NA → 0.0 (reference tau() short-circuit), as above
            F.when(F.max("mx") == 0, F.lit(0.0))
            .otherwise(
                F.round(
                    F.sum(
                        F.when(F.col("mx") > 0, 1 - F.col("bin") / F.col("mx"))
                    )
                    / (F.count("*") - 1),
                    6,
                )
            )
            .alias("tau"),
        )
    )


def qualitative_levels(
    df: DataFrame, entity: str, tissue: str, value: str
) -> DataFrame:
    """Per-(entity, tissue) qualitative expression level from the
    fractional average rank of the value within the entity
    (gtex_process.R:50,53,57): frank(v)/.N with average tie ranks,
    zero values forced to rank 0, then 4-level bucket."""
    n = F.count("*").over(Window.partitionBy(entity))
    min_rank = F.rank().over(Window.partitionBy(entity).orderBy(value))
    tie_ct = F.count("*").over(Window.partitionBy(entity, value))
    avg_rank = min_rank + (tie_ct - 1) / 2.0
    frac = F.when(F.col(value) == 0, 0.0).otherwise(avg_rank / n)
    return df.select(
        entity,
        tissue,
        F.col(value),
        F.round(frac, 6).alias("frac_rank"),
        F.when(frac == 0, "Not detected")
        .when(frac < 0.25, "Low")
        .when(frac < 0.75, "Medium")
        .otherwise("High")
        .alias("level"),
    )
