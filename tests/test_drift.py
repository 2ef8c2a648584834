"""PSI drift pins (quality/drift.py): identical slices score ~0, a
shifted slice scores large, empty bins stay finite via smoothing, and
binning is integer-exact."""

from __future__ import annotations

from tcrd_spark.quality.drift import psi_by_slice


def _frame(spark, rows):
    return spark.createDataFrame(rows, "slice string, x long")


def test_identical_slices_score_near_zero(spark):
    # both slices uniform over the same values → q ≈ p, PSI ≈ 0
    rows = [(s, v) for s in ("a", "b") for v in range(100)]
    out = {r.slice: r.psi for r in psi_by_slice(
        _frame(spark, rows), "slice", "x").collect()}
    assert abs(out["a"]) < 0.01 and abs(out["b"]) < 0.01


def test_shifted_slice_scores_large(spark):
    # slice a occupies the low half, slice b the high half → huge PSI
    rows = [("a", v) for v in range(100)] + [("b", v + 100) for v in range(100)]
    out = {r.slice: r.psi for r in psi_by_slice(
        _frame(spark, rows), "slice", "x").collect()}
    # each slice sees ~half the reference mass relocated: PSI >> 0.25
    assert out["a"] > 0.5 and out["b"] > 0.5
    # and the statistic is symmetric for symmetric slices
    assert abs(out["a"] - out["b"]) < 1e-9


def test_empty_bins_are_finite_and_counted(spark):
    # one slice with 3 identical values: 9 of 10 bins empty on both
    # sides — smoothing keeps every term finite
    out = psi_by_slice(_frame(spark, [("a", 5)] * 3), "slice", "x").collect()
    assert len(out) == 1
    assert out[0].n_rows == 3
    assert out[0].psi is not None and abs(out[0].psi) < 0.01
