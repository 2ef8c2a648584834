"""Closed-form grouped linear regression (OLS) — slope, intercept,
Pearson r, R² per group in ONE aggregation pass.

The reference computes regression-flavored statistics offline in R
(`R/` scripts load to dataframes and call lm-adjacent helpers); at
100 TB the closed form is the only shape that matters: every statistic
below is algebra over five map-side-combinable moments (E[x], E[y],
E[xy], E[x²], E[y²]), so the whole model fit is one partial-agg'd
groupBy — no iteration, no driver math, no second pass.

    slope = cov(x,y)/var(x),  intercept = E[y] − slope·E[x]
    r     = cov(x,y)/(σx·σy), R² = r²   (population moments)

Cross-engine determinism: moments are plain double averages rounded at
the same precision the mean/σ operators use (`aggregates.py`
mean_std_population precedent); the derived statistics are computed
from the SAME rounded moments in both engines, so the algebra after
rounding is bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def group_ols(
    df: DataFrame, group_cols: list[str], x_col: str, y_col: str
) -> DataFrame:
    """(group..., n, slope, intercept, r, r2), moments rounded to 6
    before the algebra so both engines derive from identical inputs."""
    x, y = F.col(x_col), F.col(y_col)
    m = df.groupBy(*group_cols).agg(
        F.count("*").alias("n"),
        F.round(F.avg(x), 6).alias("ex"),
        F.round(F.avg(y), 6).alias("ey"),
        F.round(F.avg(x * y), 6).alias("exy"),
        F.round(F.avg(x * x), 6).alias("exx"),
        F.round(F.avg(y * y), 6).alias("eyy"),
    )
    cov = F.col("exy") - F.col("ex") * F.col("ey")
    varx = F.col("exx") - F.col("ex") * F.col("ex")
    vary = F.col("eyy") - F.col("ey") * F.col("ey")
    slope = cov / varx
    return m.select(
        *group_cols,
        "n",
        F.round(slope, 4).alias("slope"),
        F.round(F.col("ey") - slope * F.col("ex"), 4).alias("intercept"),
        F.round(cov / F.sqrt(varx * vary), 6).alias("r"),
        F.round((cov * cov) / (varx * vary), 6).alias("r2"),
    )


# ------------------------------------------------- registered queries


def q_group_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag OLS of extended price on quantity (price scales
    with quantity; the fit exposes per-flag pricing structure)."""
    from tcrd_spark.sources.lake import load_table

    li = load_table(spark, sf_dir, "lineitem")
    return group_ols(li, ["l_returnflag"], "l_quantity", "l_extendedprice")


QUERIES = {"group_ols": q_group_ols}

ORACLE = {
    "group_ols": """
        WITH m AS (
            SELECT l_returnflag,
                   count(*) AS n,
                   round(avg(l_quantity), 6) AS ex,
                   round(avg(l_extendedprice), 6) AS ey,
                   round(avg(l_quantity * l_extendedprice), 6) AS exy,
                   round(avg(l_quantity * l_quantity), 6) AS exx,
                   round(avg(l_extendedprice * l_extendedprice), 6) AS eyy
            FROM lineitem GROUP BY 1
        )
        SELECT l_returnflag, n,
               round((exy - ex * ey) / (exx - ex * ex), 4) AS slope,
               round(ey - ((exy - ex * ey) / (exx - ex * ex)) * ex, 4)
                   AS intercept,
               round((exy - ex * ey)
                     / sqrt((exx - ex * ex) * (eyy - ey * ey)), 6) AS r,
               round(((exy - ex * ey) * (exy - ex * ey))
                     / ((exx - ex * ex) * (eyy - ey * ey)), 6) AS r2
        FROM m
    """,
}
