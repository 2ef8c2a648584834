"""Analytic extensions: trailing-window anomaly scores, interval
coalescing (gaps-and-islands), and percentile winsorization.

Three shapes every monitoring/preprocessing workload needs that the
reference's SQL surface never grew:

- `rolling_anomaly`: per-key trailing mean/σ (the preceding N
  observations only — never the current row, so a spike can't mask
  itself) and the z-score of each observation against that history.
- `merge_intervals`: coalesce overlapping/adjacent [start, end]
  intervals per key — the classic gaps-and-islands pattern
  (`pipeline/substring.py` uses the same cumulative-max trick
  internally for duplicated-span merging; this is the standalone,
  any-interval-table form).
- `winsorize`: clip a metric to its per-group [p_lo, p_hi] percentile
  envelope — robust-statistics preprocessing before means/regressions.

100 TB shapes: anomaly and interval windows partition by KEY (key
cardinality = parallelism, bounded frames, no global ordering);
winsorization reduces each group to a 2-float envelope broadcast back
over the data (the decile_bucketing discipline — a per-row percentile
window would shuffle everything to compute two numbers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

ANOM_LOOKBACK = 20
WINSOR_LO, WINSOR_HI = 0.05, 0.95


def rolling_anomaly(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    lookback: int = ANOM_LOOKBACK,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """(key, ts, value, mu, sigma, z): trailing-window anomaly score.

    mu/σ come from the `lookback` PRECEDING rows only; rows with fewer
    than 2 preceding observations or σ=0 get NULL z (insufficient
    history is not 'anomalous'). Rounded to 6 for cross-engine
    determinism (bounded frames sum few values — stable at 6dp).
    """
    order = [F.asc(ts_col)] + ([F.asc(tiebreak_col)] if tiebreak_col else [])
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(-lookback, -1)
    )
    mu = F.round(F.avg(val_col).over(w), 6)
    sigma = F.round(F.stddev_pop(val_col).over(w), 6)
    n = F.count(val_col).over(w)
    return df.select(
        key_col,
        ts_col,
        val_col,
        mu.alias("mu"),
        sigma.alias("sigma"),
        F.when(
            (n >= 2) & (sigma > 0),
            F.round((F.col(val_col) - mu) / sigma, 6),
        ).alias("z"),
    )


def merge_intervals(
    df: DataFrame, key_col: str, start_col: str, end_col: str
) -> DataFrame:
    """(key, start, end, n_merged): maximal coalesced intervals per key
    (overlapping OR touching: next.start <= running max end).

    One key-partitioned ordered window computes the running max end
    over PRECEDING rows; a new island starts where the current start
    exceeds it; island ids are a running sum of those starts — the
    standard two-window gaps-and-islands plan, both windows sharing
    one partitioning+ordering (one exchange).
    """
    order = [F.asc(start_col), F.asc(end_col)]
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w2 = Window.partitionBy(key_col).orderBy(*order)
    flagged = df.select(
        key_col,
        start_col,
        end_col,
        F.when(
            F.max(end_col).over(w).isNull()
            | (F.col(start_col) > F.max(end_col).over(w)),
            1,
        )
        .otherwise(0)
        .alias("_new"),
    ).withColumn("_island", F.sum("_new").over(w2))
    return (
        flagged.groupBy(key_col, "_island")
        .agg(
            F.min(start_col).alias("start"),
            F.max(end_col).alias("end"),
            F.count("*").alias("n_merged"),
        )
        .drop("_island")
    )


def winsorize(
    df: DataFrame,
    group_cols: list[str],
    val_col: str,
    lo: float = WINSOR_LO,
    hi: float = WINSOR_HI,
) -> DataFrame:
    """(group..., value, clipped): value clipped to the group's
    [lo, hi] percentile envelope (exact interior percentiles, rounded
    to 6 so both engines make identical clip decisions)."""
    edges = df.groupBy(*group_cols).agg(
        F.round(F.expr(f"percentile({val_col}, {lo})"), 6).alias("_lo"),
        F.round(F.expr(f"percentile({val_col}, {hi})"), 6).alias("_hi"),
    )
    return (
        df.join(F.broadcast(edges), group_cols)
        .select(
            *group_cols,
            F.col(val_col),
            F.round(
                F.least(F.greatest(F.col(val_col), F.col("_lo")), F.col("_hi")),
                6,
            ).alias("clipped"),
        )
    )


def transition_matrix(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """(state_from, state_to, n, p): first-order Markov transition
    estimates over per-key event sequences.

    One key-partitioned lead() window produces the (from, to) stream;
    counts combine map-side; row totals are a broadcast-sized
    |states|-row dimension, so P(to|from) = n / n_from costs no second
    pass over the data. The |states|² output is the model — broadcast
    it to score sequences (the nbayes.py deployment shape).
    """
    order = [F.asc(ts_col)] + ([F.asc(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    steps = (
        df.select(
            F.col(state_col).alias("state_from"),
            F.lead(state_col).over(w).alias("state_to"),
        )
        .filter(F.col("state_to").isNotNull())
    )
    counts = steps.groupBy("state_from", "state_to").agg(
        F.count("*").alias("n")
    )
    totals = counts.groupBy("state_from").agg(F.sum("n").alias("_tot"))
    return counts.join(F.broadcast(totals), "state_from").select(
        "state_from",
        "state_to",
        "n",
        F.round(F.col("n") / F.col("_tot"), 6).alias("p"),
    )


# ------------------------------------------------- registered queries


def q_rolling_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user trailing-20 anomaly z-scores over event values."""
    from tcrd_spark.sources.lake import load_table

    ev = load_table(spark, sf_dir, "events")
    return rolling_anomaly(ev, "user_id", "ts", "value", ANOM_LOOKBACK, "event_id")


def q_merge_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coalesced per-part shipping windows: each lineitem spans
    [shipdate, shipdate + 7d·(1+linenumber%3)]; overlapping spans merge."""
    from tcrd_spark.sources.lake import load_table

    li = load_table(spark, sf_dir, "lineitem")
    iv = li.select(
        "l_partkey",
        F.col("l_shipdate").cast("date").alias("ivl_start"),
        F.date_add(
            F.col("l_shipdate").cast("date"),
            (F.lit(7) * (1 + F.col("l_linenumber") % 3)).cast("int"),
        ).alias("ivl_end"),
    )
    return merge_intervals(iv, "l_partkey", "ivl_start", "ivl_end")


def q_winsorize_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event values winsorized to the per-type [5%, 95%] envelope."""
    from tcrd_spark.sources.lake import load_table

    ev = load_table(spark, sf_dir, "events")
    return winsorize(ev, ["event_type"], "value", WINSOR_LO, WINSOR_HI)


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type Markov transitions: which event follows
    which, with maximum-likelihood P(to|from)."""
    from tcrd_spark.sources.lake import load_table

    ev = load_table(spark, sf_dir, "events")
    return transition_matrix(ev, "user_id", "ts", "event_type", "event_id")


QUERIES = {
    "rolling_anomaly": q_rolling_anomaly,
    "merge_intervals": q_merge_intervals,
    "winsorize_values": q_winsorize_values,
    "event_transitions": q_event_transitions,
}

ORACLE = {
    "event_transitions": """
        WITH steps AS (
            SELECT event_type AS state_from,
                   lead(event_type) OVER (
                       PARTITION BY user_id
                       ORDER BY ts ASC, event_id ASC) AS state_to
            FROM events
        ),
        counts AS (
            SELECT state_from, state_to, count(*) AS n
            FROM steps WHERE state_to IS NOT NULL
            GROUP BY 1, 2
        ),
        totals AS (
            SELECT state_from, CAST(sum(n) AS BIGINT) AS tot
            FROM counts GROUP BY 1
        )
        SELECT c.state_from, c.state_to, c.n,
               round(c.n / t.tot, 6) AS p
        FROM counts c JOIN totals t USING (state_from)
    """,
    "rolling_anomaly": f"""
        SELECT user_id, ts, value,
               round(avg(value) OVER w, 6) AS mu,
               round(stddev_pop(value) OVER w, 6) AS sigma,
               CASE WHEN count(value) OVER w >= 2
                         AND round(stddev_pop(value) OVER w, 6) > 0
                    THEN round((value - round(avg(value) OVER w, 6))
                               / round(stddev_pop(value) OVER w, 6), 6)
               END AS z
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                     ROWS BETWEEN {ANOM_LOOKBACK} PRECEDING
                              AND 1 PRECEDING)
    """,
    "merge_intervals": """
        WITH iv AS (
            SELECT l_partkey,
                   CAST(l_shipdate AS DATE) AS ivl_start,
                   CAST(l_shipdate AS DATE)
                     + CAST(7 * (1 + l_linenumber % 3) AS INTEGER)
                       AS ivl_end
            FROM lineitem
        ),
        flagged AS (
            SELECT l_partkey, ivl_start, ivl_end,
                   CASE WHEN max(ivl_end) OVER wprev IS NULL
                             OR ivl_start > max(ivl_end) OVER wprev
                        THEN 1 ELSE 0 END AS new_island
            FROM iv
            WINDOW wprev AS (PARTITION BY l_partkey
                             ORDER BY ivl_start ASC, ivl_end ASC
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING)
        ),
        islands AS (
            SELECT *, sum(new_island) OVER (
                       PARTITION BY l_partkey
                       ORDER BY ivl_start ASC, ivl_end ASC) AS island
            FROM flagged
        )
        SELECT l_partkey,
               min(ivl_start) AS start,
               max(ivl_end) AS "end",
               count(*) AS n_merged
        FROM islands GROUP BY l_partkey, island
    """,
    "winsorize_values": f"""
        WITH edges AS (
            SELECT event_type,
                   round(quantile_cont(value, {WINSOR_LO}), 6) AS lo,
                   round(quantile_cont(value, {WINSOR_HI}), 6) AS hi
            FROM events GROUP BY 1
        )
        SELECT e.event_type, e.value,
               round(least(greatest(e.value, edges.lo), edges.hi), 6)
                   AS clipped
        FROM events e JOIN edges USING (event_type)
    """,
}
