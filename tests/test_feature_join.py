"""Point-in-time pins (operators/feature_join.py): availability
stamping means day-one events see NO daily feature, post-midnight
events see exactly the PRIOR day's mean, and the weekly feature lags
a full week."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from tcrd_spark.operators.feature_join import (
    daily_feature, pit_feature_join, weekly_purchase_feature,
)


def _events(spark):
    rows = [
        (1, "u", dt.datetime(2024, 1, 1, 9), "view", 10.0),
        (2, "u", dt.datetime(2024, 1, 1, 15), "purchase", 30.0),
        (3, "u", dt.datetime(2024, 1, 2, 0, 5), "view", 99.0),
        (4, "u", dt.datetime(2024, 1, 9, 12), "view", 1.0),
    ]
    return spark.createDataFrame(
        rows,
        "event_id long, user_id string, ts timestamp, "
        "event_type string, value double",
    )


def _joined(spark):
    ev = _events(spark)
    daily = daily_feature(ev, "user_id", "ts", "value")
    weekly = weekly_purchase_feature(ev, "user_id", "ts", "event_type")
    out = pit_feature_join(
        ev.select("event_id", "user_id", "ts"),
        [(daily, "f_ts", ["f_avg"]), (weekly, "w_ts", ["w_purchases"])],
        "user_id",
        "ts",
    )
    return {r.event_id: r for r in out.collect()}


def test_day_one_sees_no_feature(spark):
    rows = _joined(spark)
    assert rows[1].f_avg is None and rows[2].f_avg is None


def test_post_midnight_sees_prior_day_mean_only(spark):
    rows = _joined(spark)
    # Jan-2 00:05 sees Jan-1's mean (20.0) — NOT its own 99.0
    assert rows[3].f_avg == 20.0
    # weekly (2024-01-01 is a Monday): the purchase week closes Jan 8,
    # so event 3 (Jan 2) sees NULL but event 4 (Jan 9) sees count 1
    assert rows[3].w_purchases is None
    assert rows[4].w_purchases == 1


def test_feature_tables_are_availability_stamped(spark):
    ev = _events(spark)
    d = {r.f_ts for r in daily_feature(ev, "user_id", "ts", "value").collect()}
    assert dt.datetime(2024, 1, 2) in d  # Jan-1 window opens Jan-2 00:00
    w = {
        r.w_ts
        for r in weekly_purchase_feature(
            ev, "user_id", "ts", "event_type"
        ).collect()
    }
    assert w == {dt.datetime(2024, 1, 8)}
