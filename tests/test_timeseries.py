"""Gapfill semantics pins (operators/timeseries.py): the dense grid
spans each key's own observed range, LOCF carries the last rollup
forward, the fixed-point lerp hits the exact linear values, and a
single-observation key degenerates to one grid row."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from tcrd_spark.operators.timeseries import (
    bucket_rollup, gapfill, resample_gapfill,
)


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def _events(spark):
    rows = [
        # key "a": observations at hours 0, 0, 3 → grid 0..3, gaps 1-2
        ("a", _ts(0, 10), 10.0),
        ("a", _ts(0, 40), 20.0),
        ("a", _ts(3, 5), 45.0),
        # key "b": single observation → one grid row, no gaps
        ("b", _ts(7, 30), 5.0),
    ]
    return spark.createDataFrame(rows, "key string, ts timestamp, v double")


def test_bucket_rollup_averages_within_bucket(spark):
    obs = bucket_rollup(_events(spark), "key", "ts", "v", "hour")
    got = {(r.key, r.bucket.hour): (r.v, r.n_obs) for r in obs.collect()}
    assert got[("a", 0)] == (15.0, 2)
    assert got[("a", 3)] == (45.0, 1)
    assert got[("b", 7)] == (5.0, 1)


def test_gapfill_grid_locf_and_linear_interp(spark):
    out = resample_gapfill(_events(spark), "key", "ts", "v", "hour")
    rows = {(r.key, r.bucket.hour): r for r in out.collect()}
    # grid spans exactly [min bucket, max bucket] per key
    assert sorted(h for k, h in rows if k == "a") == [0, 1, 2, 3]
    assert sorted(h for k, h in rows if k == "b") == [7]
    a1, a2 = rows[("a", 1)], rows[("a", 2)]
    assert (a1.is_gap, a2.is_gap) == (1, 1)
    assert a1.v is None and a1.n_obs == 0
    # LOCF carries the hour-0 rollup (15.0) across both gap hours
    assert a1.locf_v == 15.0 and a2.locf_v == 15.0
    # linear: 15 → 45 over 3 hours ⇒ 25 at h1, 35 at h2
    assert a1.interp_v == 25.0 and a2.interp_v == 35.0
    # observed rows: both fills equal the rollup value
    a3 = rows[("a", 3)]
    assert (a3.v, a3.locf_v, a3.interp_v, a3.is_gap) == (45.0, 45.0, 45.0, 0)
    b = rows[("b", 7)]
    assert (b.v, b.is_gap) == (5.0, 0)


def test_gapfill_key_isolation(spark):
    """Grids never leak across keys: key b has no rows in key a's
    span and vice versa (the per-key span is the whole contract)."""
    out = resample_gapfill(_events(spark), "key", "ts", "v", "hour")
    assert out.filter((F.col("key") == "b") & (F.col("bucket") < _ts(7))).count() == 0
    assert out.filter((F.col("key") == "a") & (F.col("bucket") > _ts(3))).count() == 0


def test_gapfill_deep_negative_values_interp_exact(spark):
    """The lerp's positivity shift is DERIVED from the endpoints, so
    values far below the old fixed-shift floor (-1000, 6dp-scaled)
    interpolate exactly — the r8 ADVICE regression: a fixed 1e9 shift
    left the numerator negative here and trunc-vs-floor diverged 1 ulp
    between the engines."""
    rows = [
        ("n", _ts(0), -5000.0),
        ("n", _ts(3), -2000.0),
        # mixed-sign bracket: min endpoint negative, other positive
        ("m", _ts(0), -3000.0),
        ("m", _ts(2), 3000.0),
    ]
    df = spark.createDataFrame(rows, "key string, ts timestamp, v double")
    out = resample_gapfill(df, "key", "ts", "v", "hour")
    got = {(r.key, r.bucket.hour): r.interp_v for r in out.collect()}
    assert got[("n", 1)] == -4000.0 and got[("n", 2)] == -3000.0
    assert got[("m", 1)] == 0.0


def test_gapfill_accepts_prebucketed_rollup(spark):
    """gapfill() composes with an externally produced rollup (the
    incremental-maintenance path: fold CDC deltas into obs, re-fill)."""
    obs = bucket_rollup(_events(spark), "key", "ts", "v", "hour")
    out = gapfill(obs, "key", "hour")
    assert out.count() == 5  # 4 grid rows for a + 1 for b


def _gapfill_window_form(obs, key_col):
    """The pre-r12 window-form gapfill, kept as the reference
    implementation for the array-form equivalence pin (hourly grid)."""
    from pyspark.sql.window import Window

    span = obs.groupBy(key_col).agg(
        F.min("bucket").alias("_b0"), F.max("bucket").alias("_b1")
    )
    grid = span.select(
        key_col,
        F.explode(
            F.sequence("_b0", "_b1", F.expr("INTERVAL 1 HOUR"))
        ).alias("bucket"),
    )
    g = grid.join(obs, [key_col, "bucket"], "left").select(
        key_col, "bucket",
        F.coalesce("n_obs", F.lit(0).cast("long")).alias("n_obs"), "v",
    )
    w_back = (
        Window.partitionBy(key_col).orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(key_col).orderBy("bucket")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    ob = F.when(F.col("v").isNotNull(), F.col("bucket"))
    g = g.select(
        key_col, "bucket", "n_obs", "v",
        F.last("v", ignorenulls=True).over(w_back).alias("locf_v"),
        F.last(ob, ignorenulls=True).over(w_back).alias("_pt"),
        F.first("v", ignorenulls=True).over(w_fwd).alias("_nv"),
        F.first(ob, ignorenulls=True).over(w_fwd).alias("_nt"),
    )
    ep = lambda c: F.col(c).cast("timestamp").cast("long")  # noqa: E731
    g = (
        g.withColumn("_iv", F.round(F.col("locf_v") * 1e6).cast("long"))
        .withColumn("_jv", F.round(F.col("_nv") * 1e6).cast("long"))
        .withColumn("_off", F.greatest(F.lit(0), -F.least("_iv", "_jv")))
        .withColumn("_k", ep("bucket") - ep("_pt"))
        .withColumn("_m", ep("_nt") - ep("_pt"))
    )
    lerp = (
        F.expr("((_iv + _off) * (_m - _k) + (_jv + _off) * _k) div _m")
        - F.col("_off")
    ) / F.lit(1e6)
    return g.select(
        key_col, "bucket", "n_obs", "v", "locf_v",
        F.when(F.col("v").isNotNull(), F.col("v")).otherwise(lerp)
        .alias("interp_v"),
        F.when(F.col("v").isNull(), F.lit(1)).otherwise(F.lit(0))
        .alias("is_gap"),
    )


def test_gapfill_array_matches_window_form(spark):
    """The r12 array-form gapfill is row-identical (values AND column
    nullability) to the window form it replaced, across the edge cases
    the window semantics produced implicitly: gaps, single-observation
    keys, NULL-v rollup rows at the head/middle/tail of a span, and
    keys whose every rollup value is NULL."""
    rows = [
        ("a", _ts(0, 10), 10.0), ("a", _ts(0, 40), 20.0),
        ("a", _ts(3, 5), 45.0),
        ("b", _ts(7, 30), 5.0),
        ("n", _ts(0), -5000.0), ("n", _ts(3), -2000.0),
        ("m", _ts(0), -3000.0), ("m", _ts(2), 3000.0),
        # NULL-v rollup rows: leading, trailing, and interleaved
        ("x", _ts(0), None), ("x", _ts(2), 7.0), ("x", _ts(4), None),
        ("x", _ts(3), 9.0), ("x", _ts(6), None),
        # every value NULL: grid still spans the buckets, all fills NULL
        ("z", _ts(1), None), ("z", _ts(3), None),
    ]
    df = spark.createDataFrame(rows, "key string, ts timestamp, v double")
    obs = bucket_rollup(df, "key", "ts", "v", "hour")
    old, new = _gapfill_window_form(obs, "key"), gapfill(obs, "key", "hour")
    assert old.schema == new.schema
    assert sorted(map(repr, old.collect())) == sorted(
        map(repr, new.collect())
    )
