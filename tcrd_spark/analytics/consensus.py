"""Consensus expression: per-(protein, tissue) histogram of ordinal
levels {0:'Not Detected',1:'Low',2:'Medium',3:'High'} → (consensus
level = mode, confidence 0-5).

Reference semantics (`loaders/load-ConsensusExpressions.py:132-300`):
- histogram per group over all contributing sources (aggregate_exps);
- mode via a *stable* sort of {0,1,2,3} counts descending — ties keep
  insertion order, so the LOWEST level wins a tie (calculate_consensus
  sorted_vals at :161-163);
- confidence from a depth×purity decision ladder per consensus class
  (:165-300). The ladder shape: with `support` = count mass at/behind
  the consensus, `near` = the adjacent level's count, `far` = the rest:
    support>4 → 5 if clean, 4/3/2 for near∈{1,2,3} with far==0, else 1
    support=4 → 4/3/2 ladder, else 1
    support=3 → 3/2 ladder, else 1
    support=2 → 2, else 1        (absent for consensus='Low'!)
    else     → 0
  The 'Low' class genuinely lacks the support==2 rung and guards its
  partial credits on High==0 — preserved exactly, asymmetries and all.

Everything is a when-chain over the pivoted counts — no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

LEVEL_NAMES = {0: "Not Detected", 1: "Low", 2: "Medium", 3: "High"}


def histogram(df: DataFrame, keys: list[str], level: str) -> DataFrame:
    """(keys..., level∈{0..3}) rows → (keys..., n0, n1, n2, n3)."""
    return df.groupBy(*keys).agg(
        *[
            F.sum(F.when(F.col(level) == i, 1).otherwise(0)).alias(f"n{i}")
            for i in range(4)
        ]
    )


def _mode_col() -> Column:
    """Mode of the 4 counts; tie → lowest level (stable-sort order)."""
    mx = F.greatest(*[F.col(f"n{i}") for i in range(4)])
    expr = F.lit(3)
    for i in (2, 1, 0):
        expr = F.when(F.col(f"n{i}") == mx, i).otherwise(expr)
    return expr


def _ladder(
    support: Column,
    clean: Column,
    near1: Column,
    near2: Column,
    near3: Column,
    has_rung2: bool,
) -> Column:
    """The shared depth×purity confidence ladder."""
    gt4 = (
        F.when(clean, 5)
        .when(near1, 4)
        .when(near2, 3)
        .when(near3, 2)
        .otherwise(1)
    )
    eq4 = F.when(clean, 4).when(near1, 3).when(near2, 2).otherwise(1)
    eq3 = F.when(clean, 3).when(near1, 2).otherwise(1)
    out = (
        F.when(support > 4, gt4)
        .when(support == 4, eq4)
        .when(support == 3, eq3)
    )
    if has_rung2:
        out = out.when(support == 2, F.when(clean, 2).otherwise(1))
    return out.otherwise(0)


def _confidence_col(mode: Column) -> Column:
    n0, n1, n2, n3 = [F.col(f"n{i}") for i in range(4)]
    conf_high = _ladder(
        n3,
        (n2 + n1 + n0) == 0,
        (n2 == 1) & ((n1 + n0) == 0),
        (n2 == 2) & ((n1 + n0) == 0),
        (n2 == 3) & ((n1 + n0) == 0),
        has_rung2=True,
    )
    conf_med = _ladder(
        n2 + n3,
        (n1 + n0) == 0,
        (n1 == 1) & (n0 == 0),
        (n1 == 2) & (n0 == 0),
        (n1 == 3) & (n0 == 0),
        has_rung2=True,
    )
    conf_low = _ladder(
        n1 + n2 + n3,
        n0 == 0,
        (n0 == 1) & (n3 == 0),
        (n0 == 2) & (n3 == 0),
        (n0 == 3) & (n3 == 0),
        has_rung2=False,
    )
    conf_nd = _ladder(
        n0,
        (n1 + n2 + n3) == 0,
        (n1 == 1) & ((n2 + n3) == 0),
        (n1 == 2) & ((n2 + n3) == 0),
        (n1 == 3) & ((n2 + n3) == 0),
        has_rung2=True,
    )
    return (
        F.when(mode == 3, conf_high)
        .when(mode == 2, conf_med)
        .when(mode == 1, conf_low)
        .otherwise(conf_nd)
    )


def consensus(df: DataFrame, keys: list[str], level: str) -> DataFrame:
    """(keys..., level) measurement rows → (keys..., n0..n3,
    consensus_level, consensus_name, confidence)."""
    hist = histogram(df, keys, level)
    mode = _mode_col()
    name = F.when(mode == 0, LEVEL_NAMES[0])
    for i in (1, 2, 3):
        name = name.when(mode == i, LEVEL_NAMES[i])
    return hist.withColumn("consensus_level", mode).withColumn(
        "consensus_name", name
    ).withColumn("confidence", _confidence_col(F.col("consensus_level")))


# ---------------------------------------------------------------- SQL twin

def _sql_ladder(support, clean, n1c, n2c, n3c, has_rung2: bool) -> str:
    gt4 = (
        f"CASE WHEN {clean} THEN 5 WHEN {n1c} THEN 4 WHEN {n2c} THEN 3 "
        f"WHEN {n3c} THEN 2 ELSE 1 END"
    )
    eq4 = f"CASE WHEN {clean} THEN 4 WHEN {n1c} THEN 3 WHEN {n2c} THEN 2 ELSE 1 END"
    eq3 = f"CASE WHEN {clean} THEN 3 WHEN {n1c} THEN 2 ELSE 1 END"
    rung2 = (
        f"WHEN {support} = 2 THEN (CASE WHEN {clean} THEN 2 ELSE 1 END) "
        if has_rung2
        else ""
    )
    return (
        f"CASE WHEN {support} > 4 THEN ({gt4}) "
        f"WHEN {support} = 4 THEN ({eq4}) "
        f"WHEN {support} = 3 THEN ({eq3}) "
        f"{rung2}ELSE 0 END"
    )


def sql_consensus_exprs() -> tuple[str, str]:
    """(mode_sql, confidence_sql) over columns n0..n3 — the oracle twin
    of consensus(); mode tie → lowest level."""
    mx = "greatest(n0, n1, n2, n3)"
    mode = (
        f"CASE WHEN n0 = {mx} THEN 0 WHEN n1 = {mx} THEN 1 "
        f"WHEN n2 = {mx} THEN 2 ELSE 3 END"
    )
    high = _sql_ladder(
        "n3", "(n2 + n1 + n0) = 0",
        "(n2 = 1 AND n1 + n0 = 0)", "(n2 = 2 AND n1 + n0 = 0)",
        "(n2 = 3 AND n1 + n0 = 0)", True,
    )
    med = _sql_ladder(
        "(n2 + n3)", "(n1 + n0) = 0",
        "(n1 = 1 AND n0 = 0)", "(n1 = 2 AND n0 = 0)",
        "(n1 = 3 AND n0 = 0)", True,
    )
    low = _sql_ladder(
        "(n1 + n2 + n3)", "n0 = 0",
        "(n0 = 1 AND n3 = 0)", "(n0 = 2 AND n3 = 0)",
        "(n0 = 3 AND n3 = 0)", False,
    )
    nd = _sql_ladder(
        "n0", "(n1 + n2 + n3) = 0",
        "(n1 = 1 AND n2 + n3 = 0)", "(n1 = 2 AND n2 + n3 = 0)",
        "(n1 = 3 AND n2 + n3 = 0)", True,
    )
    conf = (
        f"CASE WHEN ({mode}) = 3 THEN ({high}) "
        f"WHEN ({mode}) = 2 THEN ({med}) "
        f"WHEN ({mode}) = 1 THEN ({low}) "
        f"ELSE ({nd}) END"
    )
    return mode, conf
