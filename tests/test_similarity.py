"""Similarity-search tests: distributed Lloyd k-means training and its
drop-in use as the IVF cell build (`pipeline/similarity.py`)."""

from __future__ import annotations

import math

import pytest


def _cluster(center, n, spread=0.05):
    # deterministic pseudo-noise around a center vector
    out = []
    for i in range(n):
        out.append(
            [
                c + spread * math.sin(7.3 * i + 1.7 * j)
                for j, c in enumerate(center)
            ]
        )
    return out


CENTERS = [
    [5.0, 0.1, 0.1, 0.1, 0.1, 0.1, 0.1, 0.1],
    [0.1, 5.0, 0.1, 0.1, 0.1, 0.1, 0.1, 0.1],
    [0.1, 0.1, 5.0, 0.1, 0.1, 0.1, 0.1, 0.1],
]


@pytest.fixture(scope="module")
def clustered(spark):
    rows = []
    vid = 0
    for c in CENTERS:
        for v in _cluster(c, 20):
            rows.append((vid, v))
            vid += 1
    return spark.createDataFrame(rows, "c_id long, c_vec array<double>")


def _cos(a, b):
    d = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return d / (na * nb)


def test_kmeans_recovers_separated_clusters(clustered):
    from tcrd_spark.pipeline.similarity import kmeans_centroids

    cents = kmeans_centroids(clustered, dim=8, k=3, n_iters=4)
    got = [r.cell_vec for r in cents.collect()]
    assert len(got) == 3
    # every true center is matched by some trained centroid in cosine
    for c in CENTERS:
        assert max(_cos(c, g) for g in got) > 0.99


def test_kmeans_deterministic(clustered):
    from tcrd_spark.pipeline.similarity import kmeans_centroids

    a = {
        r.cell_id: r.cell_vec
        for r in kmeans_centroids(clustered, dim=8, k=3, n_iters=3).collect()
    }
    b = {
        r.cell_id: r.cell_vec
        for r in kmeans_centroids(clustered, dim=8, k=3, n_iters=3).collect()
    }
    assert a == b


def test_ivf_with_trained_centroids_matches_bruteforce(spark, clustered):
    """With well-separated cells and n_probe=1, IVF over trained
    centroids returns the same neighbors as exact brute force for
    in-cluster queries (the nearest cell IS the right cell)."""
    from pyspark.sql import functions as F

    from tcrd_spark.pipeline.similarity import (
        brute_force_topk,
        ivf_topk,
        kmeans_centroids,
    )

    cents = kmeans_centroids(clustered, dim=8, k=3, n_iters=4)
    queries = clustered.filter(F.col("c_id").isin(0, 25, 45)).select(
        F.col("c_id").alias("q_id"), F.col("c_vec").alias("q_vec")
    )
    corpus = clustered
    exact = {
        (r.q_id, r.rank): r.c_id
        for r in brute_force_topk(queries, corpus, dim=8, k=5).collect()
    }
    ivf = {
        (r.q_id, r.rank): r.c_id
        for r in ivf_topk(
            queries, corpus, cents, dim=8, k=5, n_probe=1
        ).collect()
    }
    assert ivf == exact


def test_recall_at_k(spark, clustered):
    from pyspark.sql import functions as F

    from tcrd_spark.pipeline.similarity import (
        brute_force_topk,
        ivf_topk,
        kmeans_centroids,
        recall_at_k,
    )

    cents = kmeans_centroids(clustered, dim=8, k=3, n_iters=4)
    queries = clustered.filter(F.col("c_id").isin(0, 25)).select(
        F.col("c_id").alias("q_id"), F.col("c_vec").alias("q_vec")
    )
    exact = brute_force_topk(queries, clustered, dim=8, k=5)
    approx = ivf_topk(queries, clustered, cents, dim=8, k=5, n_probe=1)
    rec = {r.q_id: r.recall for r in recall_at_k(approx, exact).collect()}
    assert rec == {0: 1.0, 25: 1.0}  # separated clusters: perfect recall
    # a degenerate approx result scores zero, not null
    empty = exact.filter("q_id = -1")
    rec0 = {r.q_id: r.recall for r in recall_at_k(empty, exact).collect()}
    assert rec0 == {0: 0.0, 25: 0.0}
