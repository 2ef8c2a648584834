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

100 TB shape (r12 array form, guide §2.4): the rollup is ONE
map-side-combinable key-hash exchange; a second groupBy(key) folds
each key's (bucket, v, n_obs) rollup rows into one sorted array, and
the dense grid, LOCF and lerp are all minted ROW-LOCALLY from that
array by higher-order functions, exploded once — TWO exchanges total
where the join-plus-two-windows form paid six (span agg, grid↔obs
join, fill windows). Per-key memory is grid-length-bounded (the
array holds one struct per observed bucket, the built grid one per
grid slot — range/width, never event volume), so skewed keys (one
device with a year of data) cost grid_len rows, not events² —
gapfill stays immune to event-count skew by construction. Key
cardinality is the parallelism; AQE coalesces the sparse-key
exchanges.

Cross-engine determinism: bucket boundaries are date_trunc (engine-
exact); averages round to 6dp before interpolation so both engines
interpolate the SAME endpoint values; the lerp itself runs in 6dp
FIXED-POINT integer space with a floor division (float lerp lands
exactly on round-half edges, which the engines break differently).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BUCKET = "hour"
_INTERVALS = {"hour": "INTERVAL 1 HOUR", "day": "INTERVAL 1 DAY",
              "minute": "INTERVAL 1 MINUTE"}
_STEP_SECONDS = {"hour": 3600, "day": 86400, "minute": 60}
_TS_UNITS = {"hour": "HOUR", "day": "DAY", "minute": "MINUTE"}


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

    Array form (r12, guide §2.4 — remove shuffles outright): the
    previous shape was span-agg → grid explode → grid↔obs left join →
    two fill windows — four key-partitioned operators behind the
    rollup, six Exchanges and as many serial AQE stage waves in the
    plan. Each key's rollup rows instead fold into ONE sorted array
    (a second groupBy(key) exchange), and everything downstream is
    row-local higher-order functions over that array:

    - the dense (v, n_obs) grid is built from consecutive OBSERVATION
      pairs (one struct per grid slot — a gap slot is (NULL, 0)),
    - LOCF/lerp coefficients come from consecutive NON-NULL-v
      observation pairs (the window form's `last/first ignorenulls`
      bracketing, made explicit: rows before the first endpoint get
      NULL fills, rows at/after the last get LOCF only),
    - the two dense arrays zip and explode once; the grid position
      rebuilds the bucket timestamp (UTC session, whole-unit buckets,
      so `timestampadd` is exact epoch arithmetic — identical values
      to the old `sequence(b0, b1, interval)`).

    Per-key memory is grid-length-bounded, exactly the bound the old
    window partition had. Values are row-identical to the window form
    for every input (gaps, single-obs keys, NULL-v rollup rows at the
    head/middle/tail of a span, all-NULL keys) — pinned by
    tests/test_timeseries.py::test_gapfill_array_matches_window_form.
    NULL-bucket rollup rows are dropped up front; the old form also
    never emitted them (a NULL bucket can't match the minted grid and
    min/max ignore it), so the filter is equivalence-preserving.

    Fixed-point lerp (unchanged arithmetic, now in the segment
    builder): floating-point interpolation lands EXACTLY on round-half
    edges (6dp endpoints × terminating k/m fractions), and the engines
    break halves differently (Spark re-decimalizes then HALF_UPs;
    DuckDB rounds the raw double). So interpolate in 6dp integer space
    and FLOOR-divide — bit-identical in both engines. The positivity
    shift `off` is DERIVED per row from the two endpoints
    (greatest(0, -least(iv, jv))): with k in [0, m] the numerator is
    ≥ m·min(iv, jv), so shifting both endpoints by that amount makes
    it provably non-negative — where trunc (Spark `div`) and floor
    (DuckDB `//`) agree — with NO assumed value range. Shift
    linearity: (iv+o)(m-k) + (jv+o)k = iv(m-k) + jv·k + o·m, so the
    shifted floor-div is exactly the original quotient + o.
    """
    step = _STEP_SECONDS[bucket]
    unit = _TS_UNITS[bucket]
    a = (
        obs.where(F.col("bucket").isNotNull())
        .groupBy(key_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("bucket", "v", "n_obs"))
            ).alias("_a")
        )
    )
    # observations as (grid offset, v, n_obs); offsets are exact whole
    # steps because buckets are date_trunc'd to the step unit (UTC)
    oa_sql = f"""transform(_a, x -> named_struct(
        'off', (unix_seconds(x.bucket)
                - unix_seconds(element_at(_a, 1).bucket)) DIV {step}L,
        'v', x.v, 'n', x.n_obs))"""
    g = (
        a.select(
            key_col,
            F.expr("element_at(_a, 1).bucket").alias("_b0"),
            F.expr(oa_sql).alias("_oa"),
        )
        .select(
            key_col,
            "_b0",
            "_oa",
            # lerp endpoints = observations with a non-NULL rollup value
            # (`last/first ignorenulls` in the window form)
            F.expr("filter(_oa, x -> x.v IS NOT NULL)").alias("_ea"),
            F.expr("CAST(element_at(_oa, -1).off AS INT) + 1").alias("_n"),
        )
    )
    # dense (v, n_obs) per grid slot: each consecutive-observation pair
    # emits its left observation + the gap slots up to (excluding) the
    # right one; the final observation closes the grid. zip_with over
    # the two slices pairs neighbours without a 1-element/descending-
    # sequence edge case (slice length 0 is an empty array).
    dense_vn = """concat(
      flatten(zip_with(
        slice(_oa, 1, size(_oa) - 1),
        slice(_oa, 2, size(_oa) - 1),
        (x, y) -> transform(sequence(0, CAST(y.off - x.off AS INT) - 1),
          j -> IF(j = 0,
                  named_struct('v', x.v, 'n', x.n),
                  named_struct('v', CAST(NULL AS DOUBLE),
                               'n', CAST(0 AS BIGINT)))))),
      array(named_struct('v', element_at(_oa, -1).v,
                         'n', element_at(_oa, -1).n)))"""
    _nf = (
        "named_struct('locf', CAST(NULL AS DOUBLE), "
        "'iv', CAST(NULL AS BIGINT), 'jv', CAST(NULL AS BIGINT), "
        "'k', CAST(NULL AS BIGINT), 'm', CAST(NULL AS BIGINT))"
    )
    # dense fill coefficients per grid slot: NULLs before the first
    # endpoint (no LOCF source yet), lerp coefficients between
    # consecutive endpoints, LOCF-only at/after the last endpoint —
    # NULL m keeps the lerp NULL there, exactly as the window form's
    # NULL next-endpoint did
    dense_fill = f"""IF(size(_ea) = 0,
      transform(sequence(1, _n), x -> {_nf}),
      concat(
        CASE WHEN CAST(element_at(_ea, 1).off AS INT) > 0
             THEN transform(
                    sequence(1, CAST(element_at(_ea, 1).off AS INT)),
                    x -> {_nf})
             ELSE array() END,
        flatten(zip_with(
          slice(_ea, 1, size(_ea) - 1),
          slice(_ea, 2, size(_ea) - 1),
          (x, y) -> transform(sequence(0, CAST(y.off - x.off AS INT) - 1),
            j -> named_struct(
              'locf', x.v,
              'iv', CAST(round(x.v * 1e6) AS BIGINT),
              'jv', CAST(round(y.v * 1e6) AS BIGINT),
              'k', CAST(j AS BIGINT) * {step}L,
              'm', (y.off - x.off) * {step}L)))),
        transform(sequence(CAST(element_at(_ea, -1).off AS INT), _n - 1),
          x -> named_struct('locf', element_at(_ea, -1).v,
                            'iv', CAST(NULL AS BIGINT),
                            'jv', CAST(NULL AS BIGINT),
                            'k', CAST(NULL AS BIGINT),
                            'm', CAST(NULL AS BIGINT)))))"""
    z = g.select(
        key_col,
        "_b0",
        F.expr(dense_vn).alias("_dv"),
        F.expr(dense_fill).alias("_df"),
    ).select(key_col, "_b0", F.posexplode(F.arrays_zip("_dv", "_df")))
    lerp = """(
        ((_iv + greatest(0L, -least(_iv, _jv))) * (_m - _k)
         + (_jv + greatest(0L, -least(_iv, _jv))) * _k) DIV _m
        - greatest(0L, -least(_iv, _jv))) / 1e6"""
    lerp = (
        lerp.replace("_iv", "col._df.iv")
        .replace("_jv", "col._df.jv")
        .replace("_k", "col._df.k")
        .replace("_m", "col._df.m")
    )
    return z.select(
        key_col,
        # coalesce-to-literal only pins the non-nullable schema flag the
        # old explode(sequence(...)) carried; the fallback never fires
        # (_b0/pos are never NULL on an emitted row)
        F.expr(
            f"coalesce(timestampadd({unit}, pos, _b0), "
            "timestamp'1970-01-01 00:00:00')"
        ).alias("bucket"),
        F.expr("coalesce(col._dv.n, 0L)").alias("n_obs"),
        F.col("col._dv.v").alias("v"),
        F.col("col._df.locf").alias("locf_v"),
        F.expr(
            "CASE WHEN col._dv.v IS NOT NULL THEN col._dv.v ELSE "
            + lerp
            + " END"
        ).alias("interp_v"),
        F.when(F.col("col._dv.v").isNull(), F.lit(1))
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
