"""Embedding moments (pipeline/linalg.py): the one-pass BLAS moment
path equals the explode/self-join specification; whitening produces
identity covariance; projection is deterministic."""

from __future__ import annotations

import numpy as np

from tcrd_spark.pipeline import linalg
from tcrd_spark.sources.lake import load_table


def _emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def test_moment_path_equals_spec(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    spec = {
        (r["i"], r["j"]): r["cov"]
        for r in linalg.covariance_pairs(
            emb, "vec_id", "embedding", linalg.EMB_DIM
        ).collect()
    }
    cov = linalg.covariance_matrix(emb, "embedding", linalg.EMB_DIM)
    for (i, j), v in spec.items():
        assert abs(cov[i, j] - v) < 2e-6, (i, j, cov[i, j], v)
    # and the matrix is symmetric by construction
    assert np.allclose(cov, cov.T)


def test_whitened_corpus_has_identity_covariance(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    cov = linalg.covariance_matrix(emb, "embedding", linalg.EMB_DIM)
    W = linalg.whitening_matrix(cov, eps=1e-9)
    proj = linalg.project(emb, "vec_id", "embedding", W, linalg.EMB_DIM)
    cov2 = linalg.covariance_matrix(proj, "embedding", linalg.EMB_DIM)
    d = linalg.EMB_DIM
    assert np.allclose(cov2, np.eye(d), atol=1e-3), np.abs(
        cov2 - np.eye(d)
    ).max()


def test_projection_is_deterministic_and_keyed(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    W = np.eye(linalg.EMB_DIM) * 2.0
    out = linalg.project(emb, "vec_id", "embedding", W, linalg.EMB_DIM)
    rows = {r["vec_id"]: r["embedding"] for r in out.limit(50).collect()}
    base = {
        r["vec_id"]: r["embedding"]
        for r in emb.select("vec_id", "embedding").collect()
    }
    for vid, v in rows.items():
        assert np.allclose(np.asarray(v), 2.0 * np.asarray(base[vid]))
