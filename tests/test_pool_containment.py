"""Pooling and containment axioms on constructed data (values vs
DuckDB ride the registry sweep)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tcrd_spark.pipeline.containment import containment_pairs
from tcrd_spark.pipeline.pooling import mean_pool, mean_pool_dims


def test_mean_pool_dims_flat_and_consistent(spark):
    """The registered (driver-hashable) per-dim form carries exactly
    the values mean_pool reassembles, with atomic columns only."""
    from tools.check import nested_output_fields

    rows = [(1, [1.0, 2.0]), (1, [3.0, 6.0]), (2, [5.0, 5.0])]
    df = spark.createDataFrame(rows, "g long, vec array<double>")
    flat = mean_pool_dims(df, "g", "vec")
    assert nested_output_fields(flat.schema) == []
    got = {(r.grp, r.d): r for r in flat.collect()}
    assert got[(1, 0)].m == 2.0 and got[(1, 1)].m == 4.0
    assert got[(1, 0)].n_vectors == 2
    pooled = {r.grp: r.pooled for r in mean_pool(df, "g", "vec").collect()}
    for (grp, d), r in got.items():
        assert pooled[grp][d] == r.m


def test_nested_output_lint_flags_arrays(spark):
    """The lint is red on a nested-output frame — the exact class the
    round-7 embedding_meanpool driver-err belonged to."""
    from tools.check import nested_output_fields

    df = spark.createDataFrame([(1, [1.0])], "g long, vec array<double>")
    assert nested_output_fields(df.schema) == ["vec"]
    assert nested_output_fields(df.select("g").schema) == []


def test_mean_pool_exact_values(spark):
    rows = [
        (1, [1.0, 2.0]),
        (1, [3.0, 6.0]),
        (2, [5.0, 5.0]),
    ]
    df = spark.createDataFrame(rows, "g long, vec array<double>")
    got = {r.grp: r for r in mean_pool(df, "g", "vec").collect()}
    assert got[1].pooled == [2.0, 4.0] and got[1].n_vectors == 2
    assert got[2].pooled == [5.0, 5.0] and got[2].n_vectors == 1


def test_mean_pool_preserves_dimension_order(spark):
    vec = [float(i) for i in range(10)]
    df = spark.createDataFrame([(1, vec)], "g long, vec array<double>")
    got = mean_pool(df, "g", "vec").collect()[0]
    assert got.pooled == vec


def test_containment_detects_subsumed_fragment(spark):
    long_doc = " ".join(f"w{i}" for i in range(40))
    short_doc = " ".join(f"w{i}" for i in range(10, 20))  # inside long
    other = " ".join(f"x{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, long_doc), (2, short_doc), (3, other)], "doc_id long, text string"
    )
    got = {
        (r.id_a, r.id_b): r.containment
        for r in containment_pairs(df, "doc_id", "text").collect()
    }
    # the short doc is fully contained in the long one...
    assert got[(2, 1)] == 1.0
    # ...but the long doc is NOT contained in the short (asymmetry);
    # jaccard would score this pair ~0.2 and miss it entirely
    assert (1, 2) not in got
    assert not any(3 in p for p in got)


def test_containment_df_cap_blocks_stopword_shingles(spark):
    # a shingle present in every doc is dropped before the self-join
    docs = [(i, "the same three words " + f"u{i} v{i} w{i}") for i in range(30)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = containment_pairs(df, "doc_id", "text", max_df=5).collect()
    assert got == []  # shared shingles exceed the cap -> no candidates
