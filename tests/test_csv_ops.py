"""csv_utils.py parity tests (`tcrd_spark/functions/csv_ops.py`)."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [
            (1, "alpha", 10.0, "x"),
            (2, "beta", 5.0, "y"),
            (3, "alpha", None, "x"),
            (4, " spaced   out ", 7.5, None),
            (5, "alpha", 2.5, "y"),
        ],
        "id long, name string, score double, grp string",
    )


def test_shape_and_column_ops(df):
    from tcrd_spark.functions import csv_ops as c

    assert c.csv_size(df) == (5, 4)
    assert c.extract_column(df, "name").columns == ["name"]
    assert "score" not in c.delete_column(df, "score").columns
    assert "nm" in c.rename_column(df, "name", "nm").columns
    assert c.prefix_tags(df, "t_").columns == ["t_id", "t_name", "t_score", "t_grp"]
    assert c.subset_columns(df, ["id", "grp"]).columns == ["id", "grp"]
    merged = c.merge_columns(df, ["name", "grp"], out="ng")
    assert merged.filter("id = 1").collect()[0].ng == "alpha;x"
    cleaned = c.clean_column(df, "name")
    assert cleaned.filter("id = 4").collect()[0].name == "spaced out"


def test_value_ops(df):
    from tcrd_spark.functions import csv_ops as c

    assert [r.name for r in c.unique_sorted_column(df, "name").collect()][0] == " spaced   out "
    counts = {r.name: r["count"] for r in c.column_value_counts(df, "name").collect()}
    assert counts["alpha"] == 3
    assert c.column_uniqueness_check(df, "id") == (5, 5)
    n, nd = c.column_uniqueness_check(df, "name")
    assert (n, nd) == (5, 3)
    stats = c.column_stats(df, "score").collect()[0]
    assert stats.n == 4 and stats.n_null == 1
    assert stats.min == 2.5 and stats.max == 10.0
    assert stats.median == 6.25
    assert c.sort_by_column(df, "score", numeric=True, descending=True).first().id == 1


def test_filter_dedup_melt(df):
    from tcrd_spark.functions import csv_ops as c

    assert c.dedup(df, "name").count() == 3
    assert c.rm_empty_rows(df).count() == 5
    assert c.filter_by_valset(df, "grp", ["x"]).count() == 2
    assert c.filter_by_valset(df, "grp", ["x"], deselect=True).count() == 3
    assert c.filter_by_column(df, "score", minval=5.0).count() == 3
    assert c.filter_by_column(df, "score", minval=5.0, negate=True).count() == 2
    triples = c.convert2triples(df.select("id", "name", "grp"), "id")
    assert triples.columns == ["id", "tag", "value"]
    assert triples.count() == 10  # 5 rows × 2 melted cols
    got = {
        (r.id, r.tag): r.value
        for r in triples.filter("id = 2").collect()
    }
    assert got == {(2, "name"): "beta", (2, "grp"): "y"}


def test_merge_and_pair_analysis(spark, df):
    from tcrd_spark.functions import csv_ops as c

    other = spark.createDataFrame(
        [(1, "L1", "dup"), (3, "L3", "dup"), (9, "L9", "dup")],
        "key long, label string, name string",
    )
    inner = c.merge_csvs(df, other, "id", "key", discard_unmerged=True)
    assert sorted(r.id for r in inner.collect()) == [1, 3]
    assert "name_b" in inner.columns  # overlap disambiguated
    full = c.merge_csvs(df, other, "id", "key")
    assert full.count() == 6  # 5 left + unmatched id 9
    pairs = {
        r.grp: (r.n_distinct_b, r.n_rows)
        for r in c.col_pair_analysis(df, "grp", "name").collect()
    }
    assert pairs["x"] == (1, 2) and pairs["y"] == (2, 2)
