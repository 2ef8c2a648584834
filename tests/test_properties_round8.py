"""Property-based checks (hypothesis) for the late round-8 operators:

- gapfill: the dense grid is exactly contiguous per key, observed
  rows pass through unchanged, LOCF never looks forward, and the
  interpolation is bounded by its bracketing observations;
- pattern match: match counts are invariant under per-key stream
  permutation of INPUT ROW ORDER (the (ts,id) sort is total), and
  bounded by the occurrence count of the pattern's last symbol;
- PSI: nonnegative-ish up to smoothing for identical halves, and
  invariant under slice relabeling.

Few examples, small frames: every example runs real Spark jobs.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
    derandomize=True,
)

# (hour, value) observations for one key — hours within 3 days
obs_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=71),
        st.floats(min_value=0.0, max_value=100.0,
                  allow_nan=False, allow_infinity=False),
    ),
    min_size=1,
    max_size=12,
)


@given(obs=obs_strategy)
@SETTINGS
def test_gapfill_grid_contiguous_and_interp_bounded(spark, obs):
    from tcrd_spark.operators.timeseries import resample_gapfill

    base = dt.datetime(2024, 3, 1)
    rows = [
        ("k", base + dt.timedelta(hours=h, minutes=7), float(v))
        for h, v in obs
    ]
    df = spark.createDataFrame(rows, "key string, ts timestamp, v double")
    out = sorted(
        resample_gapfill(df, "key", "ts", "v", "hour").collect(),
        key=lambda r: r.bucket,
    )
    hours = [int((r.bucket - base).total_seconds() // 3600) for r in out]
    lo, hi = min(h for h, _ in obs), max(h for h, _ in obs)
    assert hours == list(range(lo, hi + 1))  # contiguous, exact span
    by_hour = {}
    for h, v in obs:
        by_hour.setdefault(h, []).append(v)
    lov = min(v for _, v in obs) - 1e-6
    hiv = max(v for _, v in obs) + 1e-6
    for r in out:
        h = int((r.bucket - base).total_seconds() // 3600)
        if h in by_hour:
            assert r.is_gap == 0 and r.n_obs == len(by_hour[h])
            assert abs(r.v - sum(by_hour[h]) / len(by_hour[h])) < 1e-5
            assert r.interp_v == r.v and r.locf_v == r.v
        else:
            assert r.is_gap == 1 and r.v is None
            # LOCF equals the latest preceding observed rollup
            prev = max(hh for hh in by_hour if hh < h)
            assert abs(
                r.locf_v - sum(by_hour[prev]) / len(by_hour[prev])
            ) < 1e-5
            # lerp bounded by the global observed envelope
            assert lov <= r.interp_v <= hiv


streams = st.lists(
    st.text(alphabet="vcp", min_size=0, max_size=12), min_size=1, max_size=4
)


@given(ss=streams, seed=st.integers(min_value=0, max_value=3))
@SETTINGS
def test_pattern_match_order_invariant_and_bounded(spark, ss, seed):
    from tcrd_spark.operators.patterns import match_pattern

    base = dt.datetime(2024, 3, 1)

    def frame(shuffled: bool):
        rows = []
        for k, s in enumerate(ss):
            events = [
                (f"k{k}", base + dt.timedelta(minutes=i), i, c)
                for i, c in enumerate(s)
            ]
            if shuffled:  # permute INPUT order; (ts,id) stays the truth
                events = events[seed % max(1, len(events)):] + \
                    events[: seed % max(1, len(events))]
            rows.extend(events)
        return spark.createDataFrame(
            rows, "key string, ts timestamp, id long, etype string"
        )

    pat = "v[^p]*c[^p]*p"
    a = {
        r.key: r.n_matches
        for r in match_pattern(
            frame(False), "key", "ts", "id", F.col("etype"), pat
        ).collect()
    }
    b = {
        r.key: r.n_matches
        for r in match_pattern(
            frame(True), "key", "ts", "id", F.col("etype"), pat
        ).collect()
    }
    assert a == b
    for k, s in enumerate(ss):
        if s:
            assert a[f"k{k}"] <= s.count("p")
        else:
            assert f"k{k}" not in a  # empty stream ⇒ no row


@given(vals=st.lists(
    st.integers(min_value=0, max_value=1000), min_size=4, max_size=40,
))
@SETTINGS
def test_psi_identical_halves_and_relabel_invariance(spark, vals):
    from tcrd_spark.quality.drift import psi_by_slice

    rows = [(s, v) for s in ("a", "b") for v in vals]
    df = spark.createDataFrame(rows, "slice string, x long")
    out = {r.slice: r.psi for r in psi_by_slice(df, "slice", "x").collect()}
    # identical halves: symmetric, and only SMOOTHING noise away from 0
    # — the add-1 asymmetry between the slice (n+B) and the reference
    # (2n+B) denominators shrinks as 1/n, so the bound scales with it
    assert out["a"] == out["b"]
    assert abs(out["a"]) < 0.02 + 1.0 / len(vals)
    relabeled = {
        r.slice: r.psi
        for r in psi_by_slice(
            df.select(
                F.when(F.col("slice") == "a", "zz").otherwise("yy")
                .alias("slice"),
                "x",
            ),
            "slice",
            "x",
        ).collect()
    }
    assert relabeled["zz"] == out["a"] and relabeled["yy"] == out["b"]
