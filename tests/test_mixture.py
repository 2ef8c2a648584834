"""Domain mixture resampling (pipeline/mixture.py): plan invariants,
rate capping on skewed domains, determinism, and the temperature
effect (sqrt flattens the domain distribution)."""

from __future__ import annotations

import pytest

from tcrd_spark.pipeline.mixture import mixture_plan, mixture_sample


@pytest.fixture(scope="module")
def skewed(spark):
    # 'hot' holds 80% of the corpus, three cold domains the rest
    rows = [(i, "hot") for i in range(800)]
    rows += [(1000 + i, d) for d in ("a", "b", "c") for i in range(67)]
    return spark.createDataFrame(rows, ["doc_id", "source"])


def test_weights_sum_to_one_and_rates_capped(skewed):
    plan = mixture_plan(skewed, "source", frac=0.5).collect()
    assert sum(r["weight"] for r in plan) == pytest.approx(1.0)
    assert all(0.0 < r["rate"] <= 1.0 for r in plan)
    by = {r["source"]: r for r in plan}
    # sqrt temperature: cold domains are UP-sampled relative to their
    # share — with frac=0.5 each cold domain's rate hits the 1.0 cap
    # (weight·T > n_s) while the hot domain is heavily down-sampled
    assert by["a"]["rate"] == 1.0
    assert by["hot"]["rate"] < 0.4


def test_sample_is_deterministic_and_proportional(skewed):
    plan = mixture_plan(skewed, "source", frac=0.5)
    s1 = mixture_sample(skewed, plan, "doc_id", "source").collect()
    s2 = mixture_sample(skewed, plan, "doc_id", "source").collect()
    assert sorted(r["doc_id"] for r in s1) == sorted(
        r["doc_id"] for r in s2
    )
    got = {}
    for r in s1:
        got[r["source"]] = got.get(r["source"], 0) + 1
    # cold domains at rate 1.0 keep everything, exactly
    assert got["a"] == got["b"] == got["c"] == 67
    # hot domain lands near its quota (binomial noise ~ ±3σ ≈ 40)
    rate = {r["source"]: r["rate"] for r in plan.collect()}["hot"]
    assert abs(got["hot"] - 800 * rate) < 60


def test_exact_quota_sample_hits_quotas_exactly(skewed):
    import math

    from tcrd_spark.pipeline.mixture import exact_quota_sample

    plan = mixture_plan(skewed, "source", frac=0.5)
    got = {}
    for r in exact_quota_sample(
        skewed, plan, "doc_id", "source", frac=0.5
    ).collect():
        got[r["source"]] = got.get(r["source"], 0) + 1
    n_all = skewed.count()
    for p in plan.collect():
        quota = math.floor(p["weight"] * (n_all * 0.5))
        assert got.get(p["source"], 0) == min(quota, 800 if p["source"] == "hot" else 67), (
            p["source"], got.get(p["source"], 0), quota
        )


def test_exact_quota_sample_is_deterministic_and_segment_bounded(skewed):
    from tcrd_spark.pipeline.mixture import exact_quota_sample

    plan = mixture_plan(skewed, "source", frac=0.5)
    s1 = sorted(
        r["doc_id"]
        for r in exact_quota_sample(
            skewed, plan, "doc_id", "source", n_segments=8
        ).collect()
    )
    s2 = sorted(
        r["doc_id"]
        for r in exact_quota_sample(
            skewed, plan, "doc_id", "source", n_segments=64
        ).collect()
    )
    # segment count is a parallelism knob, never a semantics knob
    assert s1 == s2


def test_frac_one_still_rebalances_toward_temperature(skewed):
    # T = N does NOT mean identity: the sqrt weights shift budget from
    # the hot domain to the cold ones, whose rate caps at 1.0 — so the
    # hot domain is down-sampled and some budget goes unspent.
    plan = mixture_plan(skewed, "source", frac=1.0)
    rate = {r["source"]: r["rate"] for r in plan.collect()}
    assert rate["a"] == rate["b"] == rate["c"] == 1.0
    assert 0.5 < rate["hot"] < 1.0
    n = mixture_sample(skewed, plan, "doc_id", "source").count()
    assert 3 * 67 + 400 < n < skewed.count()
