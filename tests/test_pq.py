"""IVF-PQ ANN (pipeline/pq.py): codes are genuinely m-byte, the
trained (k-means-per-subspace) path holds recall@10 against the exact
baseline, and the composed IVF-PQ tracks full-precision IVF."""

from __future__ import annotations

from pyspark.sql import functions as F

from tcrd_spark.pipeline.pq import (
    _EMB_DIM,
    _KSUB,
    _M,
    deterministic_codebooks,
    pq_encode,
    pq_topk,
    pq_train_codebooks,
)
from tcrd_spark.pipeline.similarity import brute_force_topk
from tcrd_spark.sources.lake import load_table


def _qs_corpus(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    qs = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    return qs, corpus


def _by_q(rows):
    out = {}
    for r in rows:
        out.setdefault(r["q_id"], set()).add(r["c_id"])
    return out


def _mean_recall(truth, got):
    return sum(len(truth[q] & got[q]) / len(truth[q]) for q in truth) / len(
        truth
    )


def test_codes_are_m_bytes_in_range(spark, sf_dir):
    _, corpus = _qs_corpus(spark, sf_dir)
    cb = deterministic_codebooks(corpus, _EMB_DIM, _M, _KSUB)
    coded = pq_encode(corpus, cb, _EMB_DIM, _M)
    row = coded.select(
        F.size("codes").alias("m"),
        F.array_min("codes").alias("lo"),
        F.array_max("codes").alias("hi"),
    ).agg(
        F.min("m").alias("m_lo"), F.max("m").alias("m_hi"),
        F.min("lo").alias("lo"), F.max("hi").alias("hi"),
    ).collect()[0]
    assert row["m_lo"] == row["m_hi"] == _M
    assert 0 <= row["lo"] and row["hi"] <= _KSUB - 1
    # a codebook member encodes to exactly itself in every subspace,
    # so its quantized norm equals its true norm
    from tcrd_spark.pipeline.dedup import dot

    member = (
        corpus.filter(F.col("c_id") < _KSUB)
        .join(coded, "c_id")
        .select(
            "c_id", "codes",
            F.abs(
                F.col("c_nrm")
                - F.sqrt(
                    dot(
                        F.col("c_vec").cast("array<double>"),
                        F.col("c_vec").cast("array<double>"),
                        _EMB_DIM,
                    )
                )
            ).alias("err"),
        )
        .collect()
    )
    for r in member:
        assert r["codes"][0] == r["c_id"] or r["err"] < 1e-9
        assert r["err"] < 1e-9, r


def test_trained_codebooks_recall_at_10(spark, sf_dir):
    """The REAL path: k-means∥ per subspace (ksub capped to the test
    corpus scale), ADC top-10 vs the exact baseline."""
    qs, corpus = _qs_corpus(spark, sf_dir)
    cb = pq_train_codebooks(corpus, _EMB_DIM, _M, ksub=16, n_iters=2)
    coded = pq_encode(corpus, cb, _EMB_DIM, _M)
    exact = brute_force_topk(qs, corpus, _EMB_DIM, k=10).collect()
    truth = _by_q(exact)
    # 16-entry codebooks (32-bit codes) are a SHORTLIST generator, not
    # a final ranker: direct top-10 recall is coarse (measured ~0.36
    # at sf0.001); the deployment path re-ranks a shortlist, bounded
    # in test_rerank_recovers_most_of_exact_top10 below.
    got10 = _by_q(pq_topk(qs, coded, cb, _EMB_DIM, _M, k=10).collect())
    assert _mean_recall(truth, got10) >= 0.25, (truth, got10)
    # shortlist coverage grows with s (monotone by construction) and
    # reaches re-rank-usable levels by s=50
    got50 = _by_q(pq_topk(qs, coded, cb, _EMB_DIM, _M, k=50).collect())
    assert _mean_recall(truth, got50) >= _mean_recall(truth, got10)
    assert _mean_recall(truth, got50) >= 0.6, (truth, got50)
    # the self-match survives quantization (it shares every code)
    for q in truth:
        assert q in got10[q]


def test_ivfpq_tracks_full_precision_ivf(spark, sf_dir):
    from tcrd_spark.registry import all_queries

    q = all_queries()
    ivf = _by_q(q["ann_ivf"](spark, sf_dir).collect())
    ivfpq = _by_q(q["ann_ivfpq"](spark, sf_dir).collect())
    # same probe cells, same inverted lists — only scores are
    # PQ-quantized (32-bit codes: far coarser than SQ8, so the floor
    # reflects shortlist quality, not final-rank quality; measured
    # 0.46 at sf0.001)
    assert _mean_recall(ivf, ivfpq) >= 0.4, (ivf, ivfpq)


def test_indexed_ivfpq_matches_inline_and_prunes_partitions(
    spark, sf_dir, tmp_path
):
    """The persisted index: identical results to the inline ann_ivfpq,
    and the probe scan carries a PartitionFilters entry on cell_id so
    only the probed cells' files are read."""
    from tests.test_plans import plan_of
    from tcrd_spark.pipeline.pq import (
        build_ivfpq_index,
        ivf_pq_topk_indexed,
    )
    from tcrd_spark.registry import all_queries
    from tcrd_spark.sources.lake import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    qs = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cell_id"),
        F.col("embedding").alias("cell_vec"),
    )
    cb = deterministic_codebooks(corpus, _EMB_DIM, _M, _KSUB)
    path = str(tmp_path / "ivfpq")
    build_ivfpq_index(corpus, cents, cb, _EMB_DIM, _M, path)
    got = ivf_pq_topk_indexed(
        qs, path, cents, cb, _EMB_DIM, _M, k=10, n_probe=2
    )
    plan = plan_of(got)
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf and "cell_id" in pf[0], plan
    inline = {
        (r["q_id"], r["c_id"], r["score"], r["rank"])
        for r in all_queries()["ann_ivfpq"](spark, sf_dir).collect()
    }
    indexed = {
        (r["q_id"], r["c_id"], r["score"], r["rank"])
        for r in got.collect()
    }
    assert inline == indexed


def test_rerank_recovers_most_of_exact_top10(spark, sf_dir):
    """The deployment composition: ADC shortlist-50 + exact re-rank.
    Recall@10 equals the shortlist's coverage of the exact top-10
    (measured 0.78 at sf0.001 with the deterministic codebooks)."""
    from tcrd_spark.pipeline.pq import pq_rerank_topk

    qs, corpus = _qs_corpus(spark, sf_dir)
    cb = deterministic_codebooks(corpus, _EMB_DIM, _M, _KSUB)
    coded = pq_encode(corpus, cb, _EMB_DIM, _M)
    rr = pq_rerank_topk(
        qs, coded, cb, corpus, _EMB_DIM, _M, k=10, shortlist=50
    ).collect()
    exact = brute_force_topk(qs, corpus, _EMB_DIM, k=10).collect()
    truth, got = _by_q(exact), _by_q(rr)
    assert _mean_recall(truth, got) >= 0.7, (truth, got)
    # re-ranked scores of true hits are the EXACT scores
    ex = {(r["q_id"], r["c_id"]): r["score"] for r in exact}
    for r in rr:
        if (r["q_id"], r["c_id"]) in ex:
            assert r["score"] == ex[(r["q_id"], r["c_id"])]
