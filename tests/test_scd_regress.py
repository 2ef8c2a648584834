"""SCD2 and grouped-OLS axioms on constructed data (values vs DuckDB
ride the registry sweep)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from tcrd_spark.operators.regress import group_ols
from tcrd_spark.operators.scd import as_of, scd2_history


def _hist(spark, rows):
    df = spark.createDataFrame(
        rows, "key long, ts timestamp, attr string, seq long"
    )
    return scd2_history(df, "key", "ts", "attr", "seq")


def _t(s):
    return datetime.fromisoformat(s)


def test_scd2_collapses_unchanged_runs(spark):
    rows = [
        (1, _t("2024-01-01"), "a", 1),
        (1, _t("2024-01-02"), "a", 2),  # no change -> collapsed
        (1, _t("2024-01-03"), "b", 3),
        (1, _t("2024-01-04"), "b", 4),  # no change
        (1, _t("2024-01-05"), "a", 5),  # back to a -> NEW version
    ]
    got = sorted(
        _hist(spark, rows).collect(), key=lambda r: r.version
    )
    assert [(r.attr, r.version, r.is_current) for r in got] == [
        ("a", 1, False), ("b", 2, False), ("a", 3, True)
    ]
    # intervals chain: valid_to of v1 == valid_from of v2, open tail
    assert got[0].valid_to == got[1].valid_from
    assert got[2].valid_to is None


def test_scd2_point_in_time(spark):
    rows = [
        (1, _t("2024-01-01"), "a", 1),
        (1, _t("2024-01-10"), "b", 2),
    ]
    h = _hist(spark, rows)
    at = as_of(h, F.lit(_t("2024-01-05"))).collect()
    assert len(at) == 1 and at[0].attr == "a"
    now = as_of(h, F.lit(_t("2024-02-01"))).collect()
    assert len(now) == 1 and now[0].attr == "b"


def test_scd2_same_ts_tiebreak(spark):
    rows = [
        (1, _t("2024-01-01"), "a", 1),
        (1, _t("2024-01-01"), "b", 2),  # same ts: seq orders versions
    ]
    got = sorted(_hist(spark, rows).collect(), key=lambda r: r.version)
    assert [r.attr for r in got] == ["a", "b"]
    assert got[1].is_current


def test_ols_recovers_exact_line(spark):
    rows = [("g", float(x), 3.0 * x + 7.0) for x in range(1, 50)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    r = group_ols(df, ["g"], "x", "y").collect()[0]
    assert abs(r.slope - 3.0) < 1e-3
    assert abs(r.intercept - 7.0) < 1e-2
    assert abs(r.r - 1.0) < 1e-6 and abs(r.r2 - 1.0) < 1e-6


def test_ols_negative_correlation(spark):
    rows = [("g", float(x), -2.0 * x + 100.0 + (x % 3)) for x in range(1, 60)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    r = group_ols(df, ["g"], "x", "y").collect()[0]
    assert r.slope < 0 and r.r < -0.99


def _sorted(df):
    return sorted(map(tuple, df.collect()))


def test_scd2_apply_batch_equals_rebuild(spark):
    """VERDICT r6 #6: N-batch incremental upkeep via MERGE must land
    bit-identically on the one-shot rebuild — changes, no-changes,
    reopened keys, and brand-new keys included."""
    from tcrd_spark.operators.scd import scd2_apply_batch

    rows = [
        (1, _t("2024-01-01"), "a", 1),
        (1, _t("2024-01-02"), "a", 2),
        (1, _t("2024-01-03"), "b", 3),
        (2, _t("2024-01-02"), "x", 4),
        # ---- batch 2 (ts >= Jan 5)
        (1, _t("2024-01-05"), "b", 5),   # no change
        (1, _t("2024-01-06"), "c", 6),   # change
        (2, _t("2024-01-06"), "x", 7),   # no change -> key 2 untouched
        (3, _t("2024-01-05"), "n", 8),   # NEW key
        # ---- batch 3 (ts >= Jan 8)
        (1, _t("2024-01-08"), "a", 9),   # change back
        (3, _t("2024-01-09"), "m", 10),  # change on the new key
    ]
    schema = "key long, ts timestamp, attr string, seq long"
    full = spark.createDataFrame(rows, schema)
    oneshot = scd2_history(full, "key", "ts", "attr", "seq")

    cuts = (_t("2024-01-05"), _t("2024-01-08"))
    hist = scd2_history(
        full.filter(F.col("ts") < cuts[0]), "key", "ts", "attr", "seq"
    )
    b2 = full.filter((F.col("ts") >= cuts[0]) & (F.col("ts") < cuts[1]))
    b3 = full.filter(F.col("ts") >= cuts[1])
    for b in (b2, b3):
        hist = scd2_apply_batch(hist, b, "key", "ts", "attr", "seq")
    assert _sorted(hist) == _sorted(oneshot)


def test_scd2_apply_batch_touches_only_batch_keys(spark):
    """Rows of keys absent from the batch pass through BY REFERENCE of
    the merge (same values), and the delta side only carries the
    batch's keys — work proportional to the change."""
    from tcrd_spark.operators.scd import scd2_apply_batch

    schema = "key long, ts timestamp, attr string, seq long"
    base = spark.createDataFrame(
        [(k, _t("2024-01-01"), "a", k) for k in range(10)], schema
    )
    hist = scd2_history(base, "key", "ts", "attr", "seq")
    batch = spark.createDataFrame(
        [(0, _t("2024-01-09"), "z", 100)], schema
    )
    out = scd2_apply_batch(hist, batch, "key", "ts", "attr", "seq")
    got = _sorted(out)
    # 10 original versions + 1 new version for key 0
    assert len(got) == 11
    untouched = [r for r in got if r[0] != 0]
    assert all(r[5] is True for r in untouched)  # still current


def test_scd2_apply_batch_rejects_out_of_order_rows(spark):
    """r7 ADVICE (medium): a batch row at or before its key's current
    valid_from would make the incremental path silently diverge from
    the rebuild — the guard raises instead of trusting the docstring."""
    import pytest

    from tcrd_spark.operators.scd import scd2_apply_batch

    rows = [(1, _t("2024-01-01"), "a", 1), (1, _t("2024-01-03"), "b", 2)]
    hist = scd2_history(
        spark.createDataFrame(rows, "key long, ts timestamp, attr string, seq long"),
        "key", "ts", "attr", "seq",
    )
    late = spark.createDataFrame(
        [(1, _t("2024-01-02"), "c", 3)],
        "key long, ts timestamp, attr string, seq long",
    )
    with pytest.raises(ValueError, match="not strictly later"):
        scd2_apply_batch(hist, late, "key", "ts", "attr", "seq")
    # same-ts as the current valid_from is equally out of contract
    same = spark.createDataFrame(
        [(1, _t("2024-01-03"), "c", 3)],
        "key long, ts timestamp, attr string, seq long",
    )
    with pytest.raises(ValueError, match="not strictly later"):
        scd2_apply_batch(hist, same, "key", "ts", "attr", "seq")
    # validate=False preserves the trusting (append-in-time) behavior
    scd2_apply_batch(
        hist, same, "key", "ts", "attr", "seq", validate=False
    ).collect()
