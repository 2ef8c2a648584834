"""Skyline properties: staircase correctness against brute force
(hypothesis-randomized), duplicate handling, and bucket-prune
soundness across bucket counts (values vs DuckDB ride the sweep)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from tcrd_spark.operators.skyline import skyline_2d


def _brute(points):
    out = []
    for i, (ix, iy) in enumerate(points):
        dominated = any(
            (jx <= ix and jy >= iy and (jx < ix or jy > iy))
            for j, (jx, jy) in enumerate(points)
            if j != i
        )
        if not dominated:
            out.append((ix, iy))
    return sorted(out)


@pytest.mark.parametrize("seed,n_buckets", [(1, 4), (2, 32), (3, 1), (4, 7)])
def test_matches_brute_force(spark, seed, n_buckets):
    rng = random.Random(seed)
    pts = [(rng.randint(0, 30) * 1.0, rng.randint(0, 30) * 1.0) for _ in range(120)]
    df = spark.createDataFrame(pts, "x double, y double")
    got = sorted(
        (r.x, r.y) for r in skyline_2d(df, "x", "y", n_buckets).collect()
    )
    assert got == _brute(pts)


def test_duplicates_both_kept(spark):
    df = spark.createDataFrame(
        [(1.0, 9.0), (1.0, 9.0), (2.0, 1.0)], "x double, y double"
    )
    got = skyline_2d(df, "x", "y").collect()
    assert len(got) == 2 and all(r.x == 1.0 and r.y == 9.0 for r in got)


def test_staircase_shape(spark, sf_dir):
    from tcrd_spark.operators.skyline import q_skyline_parts

    rows = sorted(
        (r.avg_price, r.total_qty) for r in q_skyline_parts(spark, sf_dir).collect()
    )
    # along increasing price, quantity must strictly increase
    for (x0, y0), (x1, y1) in zip(rows, rows[1:]):
        assert x1 > x0 and y1 > y0, rows
