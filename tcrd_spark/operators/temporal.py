"""Temporal joins Spark lacks as builtins: as-of join and range join.

Training-data pipelines and event analytics need both constantly
(feature-as-of-time joins, interval overlap); kdb/TimescaleDB/DuckDB
ship them natively, Spark does not. Both are expressed here as
compositions of existing DataFrame ops — no UDF, no driver loop — with
the distributed shape chosen for 100 TB:

- asof_join: the classic sorted-merge "most recent right row at or
  before the left row's time, per key". NOT a join at all in the
  physical plan: both sides union into one frame, one shuffle by key,
  and a running `last(right_payload, ignorenulls)` window fills each
  left row from the latest preceding right row. One exchange, no
  row-pair explosion, no range predicate for the optimizer to botch
  into a nested-loop join. (DuckDB spells the same semantics as
  ASOF JOIN; the oracle spells it with an explicit window so the
  tie-break rule is pinned, not engine-defined.)

- range_join: interval-overlap equi-ization by binning. Each interval
  lands in ⌈len/W⌉ bins of width W; candidates join on (keys, bin)
  and the exact overlap predicate verifies. The first-overlap-bin
  guard (emit only where the joined bin is the FIRST bin both
  intervals share) makes each true pair appear exactly once — no
  distinct/dedup shuffle. Bin width trades replication (short W) vs
  candidate fan-out (long W); pick W ≈ median interval length.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    right_order: str | None = None,
    tolerance_seconds: float | None = None,
    prefix: str = "r_",
) -> DataFrame:
    """Backward as-of join (inclusive): every left row, plus
    `right_cols` from the right row with the greatest `right_ts` ≤
    the left row's `left_ts` within the same `on` keys — NULLs when no
    such row exists (left-outer semantics).

    Ties on right_ts break deterministically by `right_order`
    (ascending; the LAST one wins → max order value), so results are
    reproducible and oracle-checkable. `tolerance_seconds` voids
    matches older than the window (rows keep NULLs instead), the kdb
    `wj`/pandas `merge_asof(tolerance=...)` behavior.

    Scale: one hash exchange on `on` + one sort within partitions —
    the same cost as a single shuffle join, regardless of how many
    right rows precede each left row. CAVEAT (skew): the fill window
    is ORDERED per key, and AQE's skew handling splits join/agg
    partitions, NOT ordered-window partitions — a hot key (one user
    holding 30% of events) is one task here. For Zipfian keys use
    `asof_join_segmented`, which splits each key by time bins and
    stitches boundaries with a small carry-in frame (measured on the
    skewed fixture in SCALE.md).
    """
    lcols = left.columns
    tagged_l = left.select(
        *lcols,
        F.lit(0).alias("_is_r"),
        F.col(left_ts).alias("_t"),
        F.lit(None).cast("double").alias("_ro"),
        *[
            F.lit(None).cast(dict(right.dtypes)[c]).alias(f"{prefix}{c}")
            for c in right_cols
        ],
        F.lit(None).cast(dict(right.dtypes)[right_ts]).alias(f"{prefix}{right_ts}"),
    )
    tagged_r = right.select(
        *on,  # join keys must carry the same names on both sides
        *[
            F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
            for c in lcols
            if c not in on
        ],
        F.lit(1).alias("_is_r"),
        F.col(right_ts).alias("_t"),
        (
            F.col(right_order).cast("double")
            if right_order is not None
            else F.lit(0.0)
        ).alias("_ro"),
        *[F.col(c).alias(f"{prefix}{c}") for c in right_cols],
        F.col(right_ts).alias(f"{prefix}{right_ts}"),
    )
    # right rows sort BEFORE left rows at equal time (inclusive ≤);
    # among equal-time right rows the largest right_order sorts last,
    # so `last(...)` picks it — the pinned tie-break
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_t").asc(), F.col("_is_r").desc(), F.col("_ro").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = tagged_l.unionByName(tagged_r).select(
        *on,
        *[c for c in lcols if c not in on],
        "_is_r",
        "_t",
        *[
            F.last(f"{prefix}{c}", ignorenulls=True).over(w).alias(f"{prefix}{c}")
            for c in right_cols + [right_ts]
        ],
    )
    out = filled.filter(F.col("_is_r") == 0)
    if tolerance_seconds is not None:
        in_window = (
            F.col("_t").cast("double")
            - F.col(f"{prefix}{right_ts}").cast("double")
        ) <= F.lit(float(tolerance_seconds))
        out = out.select(
            *on,
            *[c for c in lcols if c not in on],
            "_is_r",
            "_t",
            *[
                F.when(in_window, F.col(f"{prefix}{c}"))
                .otherwise(F.lit(None))
                .alias(f"{prefix}{c}")
                for c in right_cols + [right_ts]
            ],
        )
    return out.drop("_is_r", "_t")


def range_join(
    a: DataFrame,
    b: DataFrame,
    a_start: str,
    a_end: str,
    b_start: str,
    b_end: str,
    on: list[str] | None = None,
    bin_width: float = 1.0,
    how_overlap: str = "closed",
) -> DataFrame:
    """Interval-overlap join: all (a, b) row pairs whose
    [start, end] intervals overlap (closed: touching endpoints count),
    optionally within equal `on` keys. Column names must be disjoint
    across a and b (alias before calling).

    Equi-ization: explode each interval into its covering bins of
    `bin_width`, hash-join on (on, bin), verify the exact predicate.
    The first-overlap-bin guard emits each qualifying pair exactly
    once — max(floor(a_start/W), floor(b_start/W)) is the same number
    computed on both sides of the join, so no distinct() shuffle.
    Candidate count = true pairs + same-bin non-overlaps; replication
    factor per row = interval length / W.
    """
    on = on or []
    W = float(bin_width)

    def binned(df: DataFrame, start: str, end: str, tag: str) -> DataFrame:
        return df.withColumn(
            tag,
            F.explode(
                F.sequence(
                    F.floor(F.col(start) / W).cast("long"),
                    F.floor(F.col(end) / W).cast("long"),
                )
            ),
        )
    ba = binned(a, a_start, a_end, "_bin")
    bb = binned(b, b_start, b_end, "_bin")
    if how_overlap == "closed":
        overlap = (F.col(a_start) <= F.col(b_end)) & (
            F.col(b_start) <= F.col(a_end)
        )
    elif how_overlap == "open":
        overlap = (F.col(a_start) < F.col(b_end)) & (
            F.col(b_start) < F.col(a_end)
        )
    else:
        raise ValueError(f"range_join: how_overlap={how_overlap!r}")
    first_shared_bin = F.greatest(
        F.floor(F.col(a_start) / W).cast("long"),
        F.floor(F.col(b_start) / W).cast("long"),
    )
    return (
        ba.join(bb, on + ["_bin"])
        .where(overlap & (F.col("_bin") == first_shared_bin))
        .drop("_bin")
    )


def funnel_stages(
    events,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
):
    """Ordered-funnel progression per user: stage k is reached iff an
    event of type ``steps[k]`` occurs STRICTLY AFTER the time stage
    k−1 was first reached (min-ts chaining — the standard funnel
    semantics; events before the prior stage don't count). Returns
    (user, stage) for every user who completed stage 1, stage ∈
    [1, len(steps)].

    Plan: one groupBy per step plus an equi-join against the
    previous step's (user, t) frame — len(steps) shuffles on the user
    key, each map-side combinable; no window over per-user event
    sequences (an ordered collect_list per user would shuffle the
    whole event body and skew on hot users).
    """
    u, t = user_col, ts_col
    reached = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(u)
        .agg(F.min(t).alias("_t"))
    )
    flags = [reached.select(u)]
    for s in steps[1:]:
        nxt = (
            events.filter(F.col(type_col) == s)
            .select(u, F.col(t).alias("_ts2"))
            .join(reached, u)
            .where(F.col("_ts2") > F.col("_t"))
            .groupBy(u)
            .agg(F.min("_ts2").alias("_t"))
        )
        flags.append(nxt.select(u))
        reached = nxt
    out = flags[0].withColumn("stage", F.lit(1))
    for k, f in enumerate(flags[1:], start=2):
        out = (
            out.join(f.withColumn(f"_s{k}", F.lit(1)), u, "left")
            .withColumn(
                "stage",
                F.when(F.col(f"_s{k}").isNotNull(), F.lit(k)).otherwise(
                    F.col("stage")
                ),
            )
            .drop(f"_s{k}")
        )
    return out


def cohort_retention(
    events,
    user_col: str,
    ts_col: str,
    period: str = "week",
):
    """Cohort retention matrix: users grouped by their FIRST-activity
    period; for each later period, how many of that cohort were
    active. Returns (cohort, period_offset, n_users).

    Plan: first-activity via one user-keyed min agg (map-side
    combinable), joined back onto the user's distinct activity
    periods — two shuffles total, both on bounded keys; never a
    per-user event collection.

    ``period`` ∈ {'day', 'week', 'month'}: fixed-length periods use
    exact day arithmetic; 'month' (variable-length) uses
    months_between on the truncated dates, which is exact on
    first-of-month boundaries.
    """
    if period not in ("day", "week", "month"):
        raise ValueError(
            "cohort_retention: period must be one of 'day', 'week', "
            f"'month'; got {period!r}"
        )
    u, t = user_col, ts_col
    # cohort keys as DATEs: engines disagree on whether a truncated
    # timestamp renders midnight, a date compares clean everywhere
    firsts = events.groupBy(u).agg(
        F.to_date(F.date_trunc(period, F.min(t))).alias("_cohort")
    )
    active = events.select(
        u, F.to_date(F.date_trunc(period, F.col(t))).alias("_p")
    ).distinct()
    if period == "month":
        offset = F.floor(F.months_between("_p", "_cohort")).cast("long")
    else:
        days = {"week": 7, "day": 1}[period]
        # truncated stamps differ by whole days — datediff is exact
        offset = F.floor(F.datediff("_p", "_cohort") / days)
    return (
        active.join(firsts, u)
        .select(
            F.col("_cohort").alias("cohort"),
            offset.alias("period_offset"),
            F.col(u),
        )
        .groupBy("cohort", "period_offset")
        .agg(F.countDistinct(u).alias("n_users"))
    )


def sessionize(
    events,
    user_col: str,
    ts_col: str,
    id_col: str,
    gap_seconds: int = 1800,
):
    """Assign a per-user session id to EVERY event: a new session
    starts when the gap to the user's previous event exceeds
    ``gap_seconds`` (the per-event counterpart of the aggregated
    session_window). session_id = running count of session starts in
    the user's ts order — one user-partitioned window, no global sort.
    Ties on ts break by event id so the lag is deterministic.
    """
    u, t = user_col, ts_col
    w = Window.partitionBy(u).orderBy(t, id_col)
    prev = F.lag(t).over(w)
    # fractional epoch seconds (timestamp→double): unix_timestamp
    # truncates sub-second parts and would disagree with the oracle's
    # epoch() at gap boundaries
    # NTZ won't cast straight to double; route through TIMESTAMP (UTC
    # session, values preserved) to get fractional epoch seconds
    def _secs(c):
        return c.cast("timestamp").cast("double")

    is_start = F.when(
        prev.isNull() | ((_secs(F.col(t)) - _secs(prev)) > gap_seconds),
        1,
    ).otherwise(0)
    return events.select(
        u,
        id_col,
        t,
        F.sum(is_start)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("session_id"),
    )


# ------------------------------------------------- driver queries

def q_funnel_stages(spark, sf_dir):
    """view → click → purchase funnel over the events stream: per-user
    furthest stage reached under strict min-ts chaining."""
    from tcrd_spark.sources.lake import load_table

    ev = load_table(spark, sf_dir, "events")
    return funnel_stages(
        ev, "user_id", "ts", "event_type", ["view", "click", "purchase"]
    )


def q_cohort_retention(spark, sf_dir):
    """Weekly cohort retention matrix over the events stream."""
    from tcrd_spark.sources.lake import load_table

    ev = load_table(spark, sf_dir, "events")
    return cohort_retention(ev, "user_id", "ts", "week")


def q_sessionize_events(spark, sf_dir):
    """Per-event gap-based session ids (30-minute inactivity gap)."""
    from tcrd_spark.sources.lake import load_table

    ev = load_table(spark, sf_dir, "events")
    return sessionize(ev, "user_id", "ts", "event_id", gap_seconds=1800)


def q_asof_join_events(spark, sf_dir):
    """Feature-as-of-time: each click event joined to the SAME user's
    most recent purchase at or before it (141 clicks at sf0.01 have no
    prior purchase → NULL branch exercised). The engine runs the
    union+window sorted-merge plan; the oracle spells the identical
    rule (max ts, ties to max event_id) with an explicit window."""
    from tcrd_spark.sources.lake import load_table

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts", "value"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value"
    )
    return asof_join(
        clicks,
        purchases,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_cols=["event_id", "value"],
        right_order="event_id",
    )


def q_range_join_events(spark, sf_dir):
    """Interval-overlap: same-user (view, click) pairs whose value
    intervals [value, value+20] overlap — the binned equi-join with
    the first-overlap-bin guard (one output row per true pair, no
    dedup shuffle)."""
    from tcrd_spark.sources.lake import load_table

    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("v_id"),
        F.col("value").alias("v_lo"),
        (F.col("value") + 20.0).alias("v_hi"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("c_id"),
        F.col("value").alias("c_lo"),
        (F.col("value") + 20.0).alias("c_hi"),
    )
    out = range_join(
        views,
        clicks.withColumnRenamed("c_user", "user_id"),
        "v_lo",
        "v_hi",
        "c_lo",
        "c_hi",
        on=["user_id"],
        bin_width=20.0,
    )
    return out.select("user_id", "v_id", "c_id", "v_lo", "c_lo")


QUERIES = {
    "asof_join_events": q_asof_join_events,
    "range_join_events": q_range_join_events,
    "funnel_stages": q_funnel_stages,
    "cohort_retention": q_cohort_retention,
    "sessionize_events": q_sessionize_events,
}

ORACLE = {
    "cohort_retention": """
        WITH f AS (
          SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort
          FROM events GROUP BY 1
        ),
        a AS (
          SELECT DISTINCT user_id,
                 CAST(date_trunc('week', ts) AS DATE) AS p
          FROM events
        )
        SELECT f.cohort,
               CAST(floor(date_diff('day', f.cohort, a.p) / 7.0) AS BIGINT)
                 AS period_offset,
               count(DISTINCT a.user_id) AS n_users
        FROM a JOIN f ON a.user_id = f.user_id
        GROUP BY 1, 2
    """,
    "sessionize_events": """
        WITH o AS (
          SELECT user_id, event_id, ts,
                 lag(ts) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
          FROM events
        )
        SELECT user_id, event_id, ts,
               CAST(sum(CASE WHEN prev IS NULL
                             OR epoch(ts) - epoch(prev) > 1800
                             THEN 1 ELSE 0 END)
                    OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        FROM o
    """,
    "funnel_stages": """
        WITH s1 AS (
          SELECT user_id, min(ts) AS t FROM events
          WHERE event_type = 'view' GROUP BY 1
        ),
        s2 AS (
          SELECT e.user_id, min(e.ts) AS t
          FROM events e JOIN s1 ON e.user_id = s1.user_id
          WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY 1
        ),
        s3 AS (
          SELECT e.user_id, min(e.ts) AS t
          FROM events e JOIN s2 ON e.user_id = s2.user_id
          WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY 1
        )
        SELECT s1.user_id,
               CASE WHEN s3.user_id IS NOT NULL THEN 3
                    WHEN s2.user_id IS NOT NULL THEN 2
                    ELSE 1 END AS stage
        FROM s1
        LEFT JOIN s2 ON s2.user_id = s1.user_id
        LEFT JOIN s3 ON s3.user_id = s1.user_id
    """,
    "asof_join_events": """
        WITH c AS (
          SELECT event_id, user_id, ts, value FROM events
          WHERE event_type = 'click'
        ),
        p AS (
          SELECT event_id, user_id, ts, value FROM events
          WHERE event_type = 'purchase'
        ),
        m AS (
          SELECT c.event_id,
                 p.event_id AS pid, p.value AS pval, p.ts AS pts,
                 row_number() OVER (
                   PARTITION BY c.event_id
                   ORDER BY p.ts DESC, p.event_id DESC) AS rn
          FROM c JOIN p ON p.user_id = c.user_id AND p.ts <= c.ts
        )
        SELECT c.user_id, c.event_id, c.ts, c.value,
               m.pid AS r_event_id, m.pval AS r_value, m.pts AS r_ts
        FROM c LEFT JOIN (SELECT * FROM m WHERE rn = 1) m
          USING (event_id)
    """,
    "range_join_events": """
        WITH v AS (
          SELECT user_id, event_id AS v_id, value AS v_lo,
                 value + 20.0 AS v_hi
          FROM events WHERE event_type = 'view'
        ),
        c AS (
          SELECT user_id, event_id AS c_id, value AS c_lo,
                 value + 20.0 AS c_hi
          FROM events WHERE event_type = 'click'
        )
        SELECT v.user_id, v_id, c_id, v_lo, c_lo
        FROM v JOIN c ON v.user_id = c.user_id
         AND v_lo <= c_hi AND c_lo <= v_hi
    """,
}
