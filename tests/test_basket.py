"""Association-rule axioms on a constructed basket set (values vs
DuckDB ride the registry sweep)."""

from __future__ import annotations

from tcrd_spark.operators.basket import association_rules


def test_rule_statistics_on_known_baskets(spark):
    # baskets: {1,2} x3, {1,3} x1, {2,3} x1  -> N=5
    rows = [
        (10, 1), (10, 2),
        (11, 1), (11, 2),
        (12, 1), (12, 2),
        (13, 1), (13, 3),
        (14, 2), (14, 3),
    ]
    df = spark.createDataFrame(rows, "basket long, item long")
    got = {
        (r.antecedent, r.consequent): r
        for r in association_rules(df, "basket", "item", min_sup=2).collect()
    }
    # only the (1,2) pair reaches support 2; both directions emitted
    assert set(got) == {(1, 2), (2, 1)}
    r = got[(1, 2)]
    assert r.pair_sup == 3 and r.sup_ant == 4 and r.sup_cons == 4
    assert abs(r.conf - 3 / 4) < 1e-9
    # lift = (3/4) / (4/5) = 0.9375
    assert abs(r.lift - 0.9375) < 1e-9
    # symmetric supports here -> same numbers both ways
    assert got[(2, 1)].conf == r.conf and got[(2, 1)].lift == r.lift


def test_duplicate_lineitems_do_not_inflate_support(spark):
    rows = [(1, 7), (1, 7), (1, 8), (2, 7), (2, 8)]
    df = spark.createDataFrame(rows, "basket long, item long")
    got = association_rules(df, "basket", "item", min_sup=2).collect()
    assert all(r.pair_sup == 2 for r in got)


def test_lift_above_one_for_positive_association(spark):
    # 9 and 17 always co-occur; 99 appears alone
    rows = [(b, i) for b in range(1, 5) for i in (9, 17)] + [(9, 99), (10, 99)]
    df = spark.createDataFrame(rows, "basket long, item long")
    got = {
        (r.antecedent, r.consequent): r
        for r in association_rules(df, "basket", "item", min_sup=2).collect()
    }
    assert got[(9, 17)].lift > 1 and abs(got[(9, 17)].conf - 1.0) < 1e-9
