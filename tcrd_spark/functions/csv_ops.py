"""CSV relational toolkit: `python/csv_utils.py` re-expressed on
DataFrames.

The reference ships a 1,568-LoC row-at-a-time CSV manipulation client
(`python/csv_utils.py`) used throughout its export workflows — column
extraction/renaming/merging, sorting, dedup, filtering, value counts,
stats, melt-to-triples, and a hand-written two-file merge join. Each
becomes a one-expression DataFrame transformation here: same
semantics, Catalyst plans instead of csv.reader loops, any input the
lake can read. Pure-formatting entries of the original (quote/delimiter
fixes, HTML rendering) are subsumed by `spark.read/write.csv` options
and are not re-implemented.

All functions are DataFrame → DataFrame (or small driver scalars where
the original printed a number); file-level use is
`spark.read.csv(...)` → op → `.write.csv(...)`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def csv_size(df: DataFrame) -> tuple[int, int]:
    """(n_rows, n_cols) — `python/csv_utils.py:159` (CsvSize)."""
    return df.count(), len(df.columns)


def extract_column(df: DataFrame, col: str) -> DataFrame:
    """`python/csv_utils.py:118` (CsvExtractColumn)."""
    return df.select(col)


def delete_column(df: DataFrame, col: str) -> DataFrame:
    """`python/csv_utils.py:174` (CsvDeleteColumn)."""
    return df.drop(col)


def rename_column(df: DataFrame, col: str, newtag: str) -> DataFrame:
    """`python/csv_utils.py:231` (CsvRenameColumn)."""
    return df.withColumnRenamed(col, newtag)


def prefix_tags(df: DataFrame, prefix: str) -> DataFrame:
    """Prefix every column name — `python/csv_utils.py:248`
    (CsvPrefixTags)."""
    return df.select(
        *[F.col(c).alias(f"{prefix}{c}") for c in df.columns]
    )


def subset_columns(df: DataFrame, coltags: list[str]) -> DataFrame:
    """`python/csv_utils.py:717` (CsvSubsetColumns)."""
    return df.select(*coltags)


def merge_columns(
    df: DataFrame, mergetags: list[str], out: str = "merged", sep: str = ";"
) -> DataFrame:
    """Concatenate columns into one — `python/csv_utils.py:738`
    (CsvMergeColumns)."""
    return df.withColumn(out, F.concat_ws(sep, *mergetags)).drop(*mergetags)


def clean_column(df: DataFrame, col: str) -> DataFrame:
    """Trim + collapse internal whitespace — `python/csv_utils.py:199`
    (CsvCleanColumn)."""
    return df.withColumn(
        col, F.trim(F.regexp_replace(F.col(col), r"\s+", " "))
    )


def unique_sorted_column(
    df: DataFrame, col: str, numeric: bool = False
) -> DataFrame:
    """Distinct values, sorted (numeric or lexical) —
    `python/csv_utils.py:364` (CsvUniqueSortedColumn)."""
    c = F.col(col).cast("double") if numeric else F.col(col)
    return df.select(col).distinct().orderBy(c)


def column_value_counts(df: DataFrame, col: str) -> DataFrame:
    """Histogram of a column — `python/csv_utils.py:455`
    (CsvColumnValueCounts)."""
    return (
        df.groupBy(col)
        .agg(F.count("*").alias("count"))
        .orderBy(F.desc("count"), F.asc(col))
    )


def column_uniqueness_check(df: DataFrame, col: str) -> tuple[int, int]:
    """(n_rows, n_distinct) — `python/csv_utils.py:392`
    (CsvColumnValueUniquenessCheck)."""
    row = df.agg(
        F.count(col).alias("n"), F.countDistinct(col).alias("nd")
    ).collect()[0]
    return row.n, row.nd


def column_stats(df: DataFrame, col: str) -> DataFrame:
    """n / nulls / min / max / mean / median of a numeric column —
    `python/csv_utils.py:489` (CsvColumnStats)."""
    c = F.col(col).cast("double")
    return df.agg(
        F.count(c).alias("n"),
        F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)).alias("n_null"),
        F.min(c).alias("min"),
        F.max(c).alias("max"),
        F.round(F.avg(c), 6).alias("mean"),
        F.median(c).alias("median"),
    )


def sort_by_column(
    df: DataFrame, col: str, numeric: bool = False, descending: bool = False
) -> DataFrame:
    """`python/csv_utils.py:546` (CsvSortbyColumn)."""
    c = F.col(col).cast("double") if numeric else F.col(col)
    return df.orderBy(c.desc() if descending else c.asc())


def dedup(df: DataFrame, col: str | None = None) -> DataFrame:
    """Drop duplicate rows, by key column or whole row —
    `python/csv_utils.py:582` (CsvDedup)."""
    return df.dropDuplicates([col] if col else None)


def rm_empty_rows(df: DataFrame) -> DataFrame:
    """Drop rows whose every column is null/empty —
    `python/csv_utils.py:612` (CsvRmEmptyRows)."""
    any_val = None
    for c in df.columns:
        cond = F.col(c).isNotNull() & (F.col(c).cast("string") != "")
        any_val = cond if any_val is None else (any_val | cond)
    return df.filter(any_val)


def filter_by_valset(
    df: DataFrame, col: str, vals: list, deselect: bool = False
) -> DataFrame:
    """Keep (or drop) rows whose value is in the set —
    `python/csv_utils.py:636` (CsvFilterbyValset). NULL is never "in
    the set": SQL's three-valued `~isin` would silently drop null rows
    on deselect, but the reference's row loop keeps them — coalesce to
    false to match."""
    cond = F.coalesce(F.col(col).isin(vals), F.lit(False))
    return df.filter(~cond if deselect else cond)


def filter_by_column(
    df: DataFrame,
    col: str,
    minval=None,
    maxval=None,
    eqval=None,
    negate: bool = False,
) -> DataFrame:
    """Range/equality filter — `python/csv_utils.py:667`
    (CsvFilterbyColumn)."""
    c = F.col(col).cast("double") if eqval is None else F.col(col)
    cond = F.lit(True)
    if minval is not None:
        cond = cond & (c >= minval)
    if maxval is not None:
        cond = cond & (c <= maxval)
    if eqval is not None:
        cond = cond & (c == eqval)
    cond = F.coalesce(cond, F.lit(False))  # NULL fails the test; negate keeps it
    return df.filter(~cond if negate else cond)


def convert2triples(df: DataFrame, id_col: str) -> DataFrame:
    """Melt wide columns to (id, tag, value) triples —
    `python/csv_utils.py:39` (CsvConvert2Triples)."""
    others = [c for c in df.columns if c != id_col]
    pairs = []
    for c in others:
        pairs += [F.lit(c), F.col(c).cast("string")]
    return df.select(
        F.col(id_col),
        F.explode(F.create_map(*pairs)).alias("tag", "value"),
    )


def merge_csvs(
    a: DataFrame,
    b: DataFrame,
    id_a: str,
    id_b: str,
    discard_unmerged: bool = False,
) -> DataFrame:
    """Two-frame merge on id columns — the reference's hand-written
    nested-loop file join (`python/csv_utils.py:877`, MergeCSVs;
    row pasting `:1005`). discard_unmerged=True ⇒ inner join, else
    full outer keeping unmatched rows from both sides."""
    how = "inner" if discard_unmerged else "full_outer"
    bb = b.withColumnRenamed(id_b, id_a) if id_b != id_a else b
    overlap = (set(a.columns) & set(bb.columns)) - {id_a}
    for c in overlap:
        bb = bb.withColumnRenamed(c, f"{c}_b")
    return a.join(bb, id_a, how)


def col_pair_analysis(df: DataFrame, tag_a: str, tag_b: str) -> DataFrame:
    """Per-pair association summary: for each value of tag_a, the
    distinct tag_b count and row count — `python/csv_utils.py:771`
    (CsvColPairAnalysis, the summary portion)."""
    return (
        df.groupBy(tag_a)
        .agg(
            F.countDistinct(tag_b).alias("n_distinct_b"),
            F.count("*").alias("n_rows"),
        )
        .orderBy(F.desc("n_rows"), F.asc(tag_a))
    )
