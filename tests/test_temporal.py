"""As-of join and range join: semantics (ties, tolerance, null branch,
touching endpoints) and the scale-defining plan shapes (as-of is one
exchange and ZERO join nodes; range join is an equi hash join, never a
nested-loop)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tcrd_spark.operators.temporal import asof_join, range_join


@pytest.fixture(scope="module")
def quotes_trades(spark):
    # the classic finance shape: trades as-of latest quote
    quotes = spark.createDataFrame(
        [
            ("A", 1.0, 10.0, 1),
            ("A", 3.0, 11.0, 2),
            ("A", 3.0, 12.0, 3),   # tie at t=3 → id 3 wins
            ("A", 7.0, 13.0, 4),
            ("B", 5.0, 50.0, 5),
        ],
        "sym string, t double, px double, qid long",
    )
    trades = spark.createDataFrame(
        [
            ("A", 0.5, 1),   # before any quote → null
            ("A", 3.0, 2),   # equal time → inclusive, tie-broken
            ("A", 6.9, 3),
            ("A", 9.0, 4),
            ("B", 4.0, 5),   # B has no quote until 5.0 → null
            ("C", 1.0, 6),   # key with no right rows at all
        ],
        "sym string, t double, tid long",
    )
    return quotes, trades


def test_asof_backward_semantics(quotes_trades):
    quotes, trades = quotes_trades
    out = asof_join(
        trades, quotes, on=["sym"], left_ts="t", right_ts="t",
        right_cols=["px", "qid"], right_order="qid",
    )
    got = {r.tid: (r.r_px, r.r_qid) for r in out.collect()}
    assert got == {
        1: (None, None),
        2: (12.0, 3),     # inclusive ≤ and tie → max qid
        3: (12.0, 3),     # latest quote at/before 6.9 is t=3 pair
        4: (13.0, 4),
        5: (None, None),
        6: (None, None),
    }
    assert out.count() == trades.count()  # left-outer: every left row


def test_asof_tolerance(quotes_trades):
    quotes, trades = quotes_trades
    out = asof_join(
        trades, quotes, on=["sym"], left_ts="t", right_ts="t",
        right_cols=["px"], right_order="qid", tolerance_seconds=2.0,
    )
    got = {r.tid: r.r_px for r in out.collect()}
    # trade 4 at t=9: latest quote t=7 is 2.0 away → kept;
    # trade 3 at t=6.9: latest quote t=3 is 3.9 away → voided
    assert got[4] == 13.0
    assert got[3] is None
    assert got[2] == 12.0


def test_asof_plan_is_one_exchange_no_join(quotes_trades):
    """The as-of plan must be union → ONE hash exchange → window —
    no join operator at all (the reason it survives unbounded right
    cardinality at scale)."""
    quotes, trades = quotes_trades
    out = asof_join(
        trades, quotes, on=["sym"], left_ts="t", right_ts="t",
        right_cols=["px"], right_order="qid",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    assert plan.count("Exchange hashpartitioning") <= 1, plan


def test_range_join_pairs_and_endpoints(spark):
    a = spark.createDataFrame(
        [(1, 0.0, 10.0), (2, 20.0, 30.0), (3, 45.0, 46.0)],
        "aid long, a_lo double, a_hi double",
    )
    b = spark.createDataFrame(
        [(1, 10.0, 15.0), (2, 31.0, 40.0), (3, 44.0, 47.0), (4, 5.0, 21.0)],
        "bid long, b_lo double, b_hi double",
    )
    closed = range_join(a, b, "a_lo", "a_hi", "b_lo", "b_hi", bin_width=7.0)
    pairs = {(r.aid, r.bid) for r in closed.collect()}
    # (1,1): touching at 10 counts (closed); (1,4),(2,4) overlap;
    # (3,3) contained; (2,2) touching? 30 vs 31 — no
    assert pairs == {(1, 1), (1, 4), (2, 4), (3, 3)}
    opened = range_join(
        a, b, "a_lo", "a_hi", "b_lo", "b_hi", bin_width=7.0,
        how_overlap="open",
    )
    assert {(r.aid, r.bid) for r in opened.collect()} == {
        (1, 4), (2, 4), (3, 3)
    }


def test_range_join_each_pair_exactly_once(spark):
    """Long intervals span many bins; the first-overlap-bin guard must
    still emit each qualifying pair exactly once (no distinct in the
    plan)."""
    a = spark.createDataFrame(
        [(i, float(i), float(i) + 50.0) for i in range(40)],
        "aid long, a_lo double, a_hi double",
    )
    b = spark.createDataFrame(
        [(j, float(j) + 25.0, float(j) + 26.0) for j in range(40)],
        "bid long, b_lo double, b_hi double",
    )
    out = range_join(a, b, "a_lo", "a_hi", "b_lo", "b_hi", bin_width=5.0)
    rows = [(r.aid, r.bid) for r in out.collect()]
    assert len(rows) == len(set(rows))  # exactly once each
    # brute-force truth
    brute = {
        (x, y)
        for x in range(40)
        for y in range(40)
        if x <= y + 26.0 and y + 25.0 <= x + 50.0
    }
    assert set(rows) == brute
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_range_join_rejects_bad_mode(spark):
    a = spark.createDataFrame([(1, 0.0, 1.0)], "aid long, a_lo double, a_hi double")
    with pytest.raises(ValueError, match="how_overlap"):
        range_join(a, a.selectExpr("aid bid", "a_lo b_lo", "a_hi b_hi"),
                   "a_lo", "a_hi", "b_lo", "b_hi", how_overlap="half")


def test_funnel_stages_strict_ordering(spark):
    """Stage k needs a step-k event strictly after stage k-1's first
    time: a purchase BEFORE the first click doesn't count; equal
    timestamps don't count; users without step 1 are absent."""
    from datetime import datetime as dt

    from tcrd_spark.operators.temporal import funnel_stages

    t = lambda s: dt(2026, 1, 1, 0, 0, s)
    rows = [
        # u1: full funnel in order -> 3
        (1, "view", t(1)), (1, "click", t(2)), (1, "purchase", t(3)),
        # u2: purchase precedes click -> stops at 2
        (2, "view", t(1)), (2, "purchase", t(2)), (2, "click", t(3)),
        # u3: click at the SAME ts as first view -> strict, stops at 1
        (3, "view", t(5)), (3, "click", t(5)),
        # u4: never views -> absent
        (4, "click", t(1)), (4, "purchase", t(2)),
        # u5: view only -> 1
        (5, "view", t(9)),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )
    got = {
        r["user_id"]: r["stage"]
        for r in funnel_stages(
            ev, "user_id", "ts", "event_type", ["view", "click", "purchase"]
        ).collect()
    }
    assert got == {1: 3, 2: 2, 3: 1, 5: 1}


def test_sessionize_gap_semantics(spark):
    from datetime import datetime as dt

    from tcrd_spark.operators.temporal import sessionize

    rows = [
        (1, 1, dt(2026, 1, 1, 0, 0, 0)),
        (1, 2, dt(2026, 1, 1, 0, 10, 0)),   # 10 min gap → same session
        (1, 3, dt(2026, 1, 1, 1, 0, 0)),    # 50 min gap → new session
        (1, 4, dt(2026, 1, 1, 1, 30, 0)),   # exactly 30 min → SAME (strict >)
        (2, 5, dt(2026, 1, 1, 0, 0, 0)),    # other user independent
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp")
    got = {
        r["event_id"]: r["session_id"]
        for r in sessionize(ev, "user_id", "ts", "event_id", 1800).collect()
    }
    assert got == {1: 1, 2: 1, 3: 2, 4: 2, 5: 1}


def test_cohort_retention_offsets(spark):
    from datetime import datetime as dt

    from tcrd_spark.operators.temporal import cohort_retention

    rows = [
        (1, dt(2026, 1, 5)),   # Mon wk0 cohort
        (1, dt(2026, 1, 14)),  # wk1
        (1, dt(2026, 1, 21)),  # wk2
        (2, dt(2026, 1, 7)),   # same cohort week, active wk0 only
        (3, dt(2026, 1, 13)),  # next-week cohort
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (str(r["cohort"]), r["period_offset"]): r["n_users"]
        for r in cohort_retention(ev, "user_id", "ts", "week").collect()
    }
    assert got == {
        ("2026-01-05", 0): 2,
        ("2026-01-05", 1): 1,
        ("2026-01-05", 2): 1,
        ("2026-01-12", 0): 1,
    }


def test_cohort_retention_month_and_bad_period(spark):
    """'month' offsets are exact across variable-length months
    (Jan 31 days, Feb 28); an unsupported period raises up front."""
    from datetime import datetime as dt

    from tcrd_spark.operators.temporal import cohort_retention

    rows = [
        (1, dt(2026, 1, 20)),  # Jan cohort
        (1, dt(2026, 2, 3)),   # month offset 1 (Jan is 31 days)
        (1, dt(2026, 3, 28)),  # month offset 2 (Feb is 28 days)
        (2, dt(2026, 2, 1)),   # Feb cohort, active Feb only
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (str(r["cohort"]), r["period_offset"]): r["n_users"]
        for r in cohort_retention(ev, "user_id", "ts", "month").collect()
    }
    assert got == {
        ("2026-01-01", 0): 1,
        ("2026-01-01", 1): 1,
        ("2026-01-01", 2): 1,
        ("2026-02-01", 0): 1,
    }
    with pytest.raises(ValueError, match="period must be one of"):
        cohort_retention(ev, "user_id", "ts", "fortnight")
