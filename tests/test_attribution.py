"""Attribution axioms on constructed event streams (values vs DuckDB
ride the registry sweep)."""

from __future__ import annotations

from datetime import datetime

from tcrd_spark.operators.attribution import touch_attribution


def _attr(spark, rows, **kw):
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    return {
        r.conversion_id: r
        for r in touch_attribution(
            df, "user_id", "ts", "event_id", "event_type", **kw
        ).collect()
    }


def _t(s):
    return datetime.fromisoformat(s)


def test_first_and_last_touch_within_lookback(spark):
    rows = [
        (1, _t("2024-01-01T10:00"), 1, "click"),
        (1, _t("2024-01-02T10:00"), 2, "view"),   # not a touch
        (1, _t("2024-01-03T10:00"), 3, "click"),
        (1, _t("2024-01-04T10:00"), 4, "purchase"),
    ]
    got = _attr(spark, rows)
    assert got[4].first_touch_id == 1
    assert got[4].last_touch_id == 3
    assert got[4].n_touches == 2


def test_touch_outside_lookback_ignored(spark):
    rows = [
        (1, _t("2024-01-01T00:00"), 1, "click"),   # 9 days before
        (1, _t("2024-01-10T00:00"), 2, "purchase"),
    ]
    got = _attr(spark, rows)
    assert got[2].first_touch_id is None and got[2].n_touches == 0


def test_conversion_itself_never_a_touch(spark):
    # a click AT the conversion instant is excluded (strictly before)
    rows = [
        (1, _t("2024-01-04T10:00"), 1, "click"),
        (1, _t("2024-01-04T10:00"), 2, "purchase"),
    ]
    got = _attr(spark, rows)
    assert got[2].first_touch_id is None


def test_users_are_independent(spark):
    rows = [
        (1, _t("2024-01-01T10:00"), 1, "click"),
        (2, _t("2024-01-02T10:00"), 2, "purchase"),
    ]
    got = _attr(spark, rows)
    assert got[2].first_touch_id is None


def test_tied_timestamps_break_deterministically(spark):
    """ADVICE r6: two touches at the SAME instant are RANGE-frame
    peers; first/last must still be deterministic — min/max over the
    (ts, id) struct breaks ties by id (first -> smallest, last ->
    largest), never by partition order."""
    rows = [
        (1, _t("2024-01-01T10:00"), 7, "click"),
        (1, _t("2024-01-01T10:00"), 3, "click"),
        (1, _t("2024-01-02T10:00"), 9, "purchase"),
    ]
    for _ in range(3):  # stable across repeated physical runs
        got = _attr(spark, rows)
        assert got[9].first_touch_id == 3
        assert got[9].last_touch_id == 7
        assert got[9].n_touches == 2


def test_testdata_user_ts_is_unique():
    """The adjudicated query's determinism additionally rests on the
    testdata having no (user, ts) collisions — pin that property."""
    import duckdb

    n = duckdb.sql(
        "SELECT count(*) FROM ("
        "  SELECT user_id, ts FROM '/root/testdata/sf0.001/events.parquet'"
        "  GROUP BY 1, 2 HAVING count(*) > 1)"
    ).fetchone()[0]
    assert n == 0
