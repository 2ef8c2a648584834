"""Time-series resampling — the hypertable family: time_bucket
rollup, per-key gap filling to a dense grid, last-observation-
carried-forward, and linear interpolation.

The TimescaleDB/`time_bucket_gapfill` shape every metrics/telemetry
workload needs and plain SQL windows alone can't produce (a window
can't mint the MISSING rows). The reference has no streaming-metrics
surface at all; this is an extension in the spirit of its expression
tables (sparse per-tissue observations that downstream R scripts
densify per protein, `R/hgram.R`'s zero-fill loop) re-expressed as a
first-class distributed operator.

Semantics (per key):

1. observations are bucketed to the grid width (`date_trunc`) and
   averaged — the rollup;
2. the dense grid spans that key's OWN observed range
   [min bucket, max bucket] — no leading/trailing fabrication, no
   global clock parameter, fully deterministic from the data;
3. `v` is NULL on gap rows (`is_gap` = 1), `n_obs` = 0;
4. `locf_v` carries the last observed rollup forward;
5. `interp_v` linearly interpolates between the bracketing
   observations (both always exist: the grid is bounded by
   observations on each end). On observed rows both equal `v`.

100 TB shape: the rollup and span are ONE key-hash exchange each
(map-side partial aggs); the grid is minted row-locally by
`sequence()` + `explode` on the already-key-partitioned span (grid
size is range/width per key — bounded, never data-volume); the
grid↔obs join and both fill windows are key-partitioned. Nothing is
global, nothing is quadratic; key cardinality is the parallelism.
AQE coalesces the sparse-key exchanges. Skewed keys (one device with
a year of data) cost grid_len rows, not events² — gapfill is immune
to event-count skew by construction.

Cross-engine determinism: bucket boundaries are date_trunc (engine-
exact); averages round to 6dp before interpolation so both engines
interpolate the SAME endpoint values; the lerp itself runs in 6dp
FIXED-POINT integer space with a floor division (float lerp lands
exactly on round-half edges, which the engines break differently).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

BUCKET = "hour"
_INTERVALS = {"hour": "INTERVAL 1 HOUR", "day": "INTERVAL 1 DAY",
              "minute": "INTERVAL 1 MINUTE"}


def bucket_rollup(
    events: DataFrame, key_col: str, ts_col: str, val_col: str,
    bucket: str = BUCKET,
) -> DataFrame:
    """(key, bucket, v, n_obs): per-key time_bucket average rollup."""
    return (
        events.groupBy(
            F.col(key_col),
            F.date_trunc(bucket, F.col(ts_col)).alias("bucket"),
        )
        .agg(
            F.round(F.avg(val_col), 6).alias("v"),
            F.count(F.lit(1)).alias("n_obs"),
        )
    )


def gapfill(
    obs: DataFrame, key_col: str, bucket: str = BUCKET
) -> DataFrame:
    """Densify a (key, bucket, v, n_obs) rollup to every grid step in
    each key's observed span, with LOCF and linear-interpolation fill.

    Output: (key, bucket, n_obs, v, locf_v, interp_v, is_gap).
    """
    step = _INTERVALS[bucket]
    span = obs.groupBy(key_col).agg(
        F.min("bucket").alias("_b0"), F.max("bucket").alias("_b1")
    )
    grid = span.select(
        key_col,
        F.explode(
            F.sequence("_b0", "_b1", F.expr(step))
        ).alias("bucket"),
    )
    g = grid.join(obs, [key_col, "bucket"], "left").select(
        key_col,
        "bucket",
        F.coalesce("n_obs", F.lit(0).cast("long")).alias("n_obs"),
        "v",
    )
    w_back = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_bucket = F.when(F.col("v").isNotNull(), F.col("bucket"))
    g = g.select(
        key_col,
        "bucket",
        "n_obs",
        "v",
        F.last("v", ignorenulls=True).over(w_back).alias("locf_v"),
        F.last(obs_bucket, ignorenulls=True).over(w_back).alias("_pt"),
        F.first("v", ignorenulls=True).over(w_fwd).alias("_nv"),
        F.first(obs_bucket, ignorenulls=True).over(w_fwd).alias("_nt"),
    )
    # Fixed-point lerp: floating-point interpolation lands EXACTLY on
    # round-half edges (6dp endpoints × terminating k/m fractions), and
    # the engines break halves differently (Spark re-decimalizes then
    # HALF_UPs; DuckDB rounds the raw double). So interpolate in 6dp
    # integer space and FLOOR-divide — bit-identical in both engines.
    # The positivity shift `_off` is DERIVED per row from the two
    # endpoints (greatest(0, -least(iv, jv))): with k in [0, m] the
    # numerator is ≥ m·min(iv, jv), so shifting both endpoints by that
    # amount makes it provably non-negative — where trunc (Spark `div`)
    # and floor (DuckDB `//`) agree — with NO assumed value range (a
    # fixed 1e9 shift silently diverged 1 ulp for values ≤ -1000).
    # Shift linearity: (iv+o)(m-k) + (jv+o)k = iv(m-k) + jv·k + o·m,
    # so the shifted floor-div is exactly the original quotient + o.
    ep = lambda c: F.col(c).cast("timestamp").cast("long")  # noqa: E731
    g = (
        g.withColumn("_iv", F.round(F.col("locf_v") * 1e6).cast("long"))
        .withColumn("_jv", F.round(F.col("_nv") * 1e6).cast("long"))
        .withColumn(
            "_off", F.greatest(F.lit(0), -F.least("_iv", "_jv"))
        )
        .withColumn("_k", ep("bucket") - ep("_pt"))
        .withColumn("_m", ep("_nt") - ep("_pt"))
    )
    lerp = (
        F.expr("((_iv + _off) * (_m - _k) + (_jv + _off) * _k) div _m")
        - F.col("_off")
    ) / F.lit(1e6)
    return g.select(
        key_col,
        "bucket",
        "n_obs",
        "v",
        "locf_v",
        F.when(F.col("v").isNotNull(), F.col("v"))
        .otherwise(lerp)
        .alias("interp_v"),
        F.when(F.col("v").isNull(), F.lit(1))
        .otherwise(F.lit(0))
        .alias("is_gap"),
    )


def resample_gapfill(
    events: DataFrame, key_col: str, ts_col: str, val_col: str,
    bucket: str = BUCKET,
) -> DataFrame:
    """Rollup + gapfill in one call — the `time_bucket_gapfill` verb."""
    return gapfill(
        bucket_rollup(events, key_col, ts_col, val_col, bucket),
        key_col,
        bucket,
    )


# ------------------------------------------------- registered query


def q_resample_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly per-user value series over the events stream, densified
    with LOCF + linear interpolation across the silent hours. A 1-in-7
    user sample bounds the DENSE output (users × ~720 hourly grid rows
    — the compute is sub-second at sf0.1; an unsampled result is a
    million-row collect, all serialization) — the window_rank_funcs
    sampling discipline."""
    from tcrd_spark.sources.lake import load_table

    events = load_table(spark, sf_dir, "events").filter(
        F.col("user_id") % 7 == 0
    )
    return resample_gapfill(events, "user_id", "ts", "value", BUCKET)


QUERIES = {"resample_gapfill": q_resample_gapfill}

ORACLE = {
    "resample_gapfill": """
        WITH obs AS (
          SELECT user_id, date_trunc('hour', ts) AS bucket,
                 round(avg(value), 6) AS v, count(*) AS n_obs
          FROM events WHERE user_id % 7 = 0 GROUP BY 1, 2
        ), span AS (
          SELECT user_id, min(bucket) AS b0, max(bucket) AS b1
          FROM obs GROUP BY 1
        ), grid AS (
          SELECT user_id,
                 unnest(generate_series(b0, b1, INTERVAL 1 HOUR))
                   AS bucket
          FROM span
        ), g AS (
          SELECT grid.user_id, grid.bucket, obs.v,
                 coalesce(obs.n_obs, 0) AS n_obs
          FROM grid LEFT JOIN obs
            ON grid.user_id = obs.user_id AND grid.bucket = obs.bucket
        ), f AS (
          SELECT user_id, bucket, n_obs, v,
                 last_value(v IGNORE NULLS) OVER wb AS locf_v,
                 last_value(CASE WHEN v IS NOT NULL THEN bucket END
                            IGNORE NULLS) OVER wb AS pt,
                 first_value(v IGNORE NULLS) OVER wf AS nv,
                 first_value(CASE WHEN v IS NOT NULL THEN bucket END
                             IGNORE NULLS) OVER wf AS nt
          FROM g
          WINDOW wb AS (PARTITION BY user_id ORDER BY bucket
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW),
                 wf AS (PARTITION BY user_id ORDER BY bucket
                        ROWS BETWEEN CURRENT ROW
                        AND UNBOUNDED FOLLOWING)
        )
        , s AS (
          SELECT user_id, bucket, n_obs, v, locf_v,
                 cast(round(locf_v * 1e6) AS BIGINT) AS iv,
                 cast(round(nv * 1e6) AS BIGINT) AS jv,
                 cast(epoch(bucket) AS BIGINT)
                   - cast(epoch(pt) AS BIGINT) AS k,
                 cast(epoch(nt) AS BIGINT)
                   - cast(epoch(pt) AS BIGINT) AS m
          FROM f
        ), s2 AS (
          SELECT *, greatest(0, -least(iv, jv)) AS off FROM s
        )
        SELECT user_id, bucket, n_obs, v, locf_v,
               CASE WHEN v IS NOT NULL THEN v
                    ELSE ((((iv + off) * (m - k) + (jv + off) * k) // m)
                          - off) / 1e6
               END AS interp_v,
               CASE WHEN v IS NULL THEN 1 ELSE 0 END AS is_gap
        FROM s2
    """,
}
