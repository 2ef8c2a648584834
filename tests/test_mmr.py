"""MMR axioms on constructed candidate sets (values vs DuckDB ride the
registry sweep)."""

from __future__ import annotations

from tcrd_spark.pipeline.mmr import mmr_select


def _frames(spark, rel_rows, pair_rows):
    rel = spark.createDataFrame(rel_rows, "c_id long, rel double")
    pairs = spark.createDataFrame(pair_rows, "a long, b long, sim double")
    return rel, pairs


def test_redundant_candidate_deferred(spark):
    # docs 1,2 nearly identical (sim .99); doc 3 less relevant but
    # novel — plain top-2 would pick {1,2}; MMR must pick {1,3}
    rel, pairs = _frames(
        spark,
        [(1, 0.9), (2, 0.89), (3, 0.5)],
        [(1, 2, 0.99), (2, 1, 0.99), (1, 3, 0.0),
         (3, 1, 0.0), (2, 3, 0.0), (3, 2, 0.0)],
    )
    got = mmr_select(rel, pairs, lam=0.7, k=2)
    assert [d for _, d, _ in got] == [1, 3]


def test_first_pick_is_pure_relevance(spark):
    rel, pairs = _frames(
        spark, [(1, 0.3), (2, 0.8)], [(1, 2, 0.5), (2, 1, 0.5)]
    )
    got = mmr_select(rel, pairs, k=1)
    assert got[0][1] == 2 and abs(got[0][2] - 0.7 * 0.8) < 1e-9


def test_selects_at_most_k_and_no_repeats(spark):
    rel, pairs = _frames(
        spark,
        [(i, 0.5) for i in range(1, 6)],
        [(a, b, 0.1) for a in range(1, 6) for b in range(1, 6) if a != b],
    )
    got = mmr_select(rel, pairs, k=10)
    picked = [d for _, d, _ in got]
    assert len(picked) == 5 and len(set(picked)) == 5  # exhausts, no dupes
