"""Bloom file-skipping pins (sources/bloomidx.py): a point lookup
through the index equals the unpruned filter exactly, actually prunes
files, never false-negatives, and degrades safely for files appended
after the index was built."""

from __future__ import annotations

from pyspark.sql import functions as F

from tcrd_spark.sources import bloomidx, snapshots as snap


def _orders(spark, sf_dir):
    from tcrd_spark.sources.lake import load_table

    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus",
        F.round("o_totalprice", 2).alias("o_totalprice"),
    )


def _build(spark, sf_dir, tmp_path, n_appends=3):
    """v1 + n disjoint-key appends → a multi-file snapshot."""
    table = str(tmp_path / "t")
    orders = _orders(spark, sf_dir)
    snap.create_table(orders.where("o_orderkey % 4 = 0"), table,
                      "o_orderstatus")
    for i in range(1, n_appends + 1):
        snap.append_version(table, orders.where(f"o_orderkey % 4 = {i}"))
    return table, orders


def test_point_lookup_equals_full_filter(spark, sf_dir, tmp_path):
    table, orders = _build(spark, sf_dir, tmp_path)
    bloomidx.build_bloom_index(spark, table, "o_orderkey")
    keys = [r.o_orderkey for r in orders.limit(7).collect()]
    for key in keys:
        got = sorted(
            tuple(r)
            for r in bloomidx.point_lookup(
                spark, table, "o_orderkey", key
            ).collect()
        )
        want = sorted(
            tuple(r)
            for r in snap.read_version(spark, table)
            .where(F.col("o_orderkey") == key)
            .collect()
        )
        assert got == want and len(got) >= 1


def test_index_prunes_files(spark, sf_dir, tmp_path):
    table, orders = _build(spark, sf_dir, tmp_path)
    bloomidx.build_bloom_index(spark, table, "o_orderkey")
    key = orders.head().o_orderkey
    kept, total = bloomidx.bloom_candidate_files(
        spark, table, "o_orderkey", key
    )
    # the key lives in exactly one append's files; with 4 disjoint
    # batches over the partitions the index must drop a majority
    assert total >= 4
    assert 1 <= len(kept) < total / 2 + 1


def test_absent_key_usually_prunes_everything(spark, sf_dir, tmp_path):
    table, _ = _build(spark, sf_dir, tmp_path)
    bloomidx.build_bloom_index(spark, table, "o_orderkey")
    kept, total = bloomidx.bloom_candidate_files(
        spark, table, "o_orderkey", 10**15 + 7
    )
    # ~0.2% fp/file at this fill: a handful of survivors at most
    assert len(kept) <= max(1, total // 4)
    assert bloomidx.point_lookup(
        spark, table, "o_orderkey", 10**15 + 7
    ).count() == 0


def test_post_index_appends_degrade_to_scan(spark, sf_dir, tmp_path):
    table, orders = _build(spark, sf_dir, tmp_path, n_appends=2)
    bloomidx.build_bloom_index(spark, table, "o_orderkey")
    snap.append_version(table, orders.where("o_orderkey % 4 = 3"))
    key = orders.where("o_orderkey % 4 = 3").head().o_orderkey
    # the key is ONLY in unindexed files — they must stay candidates
    got = bloomidx.point_lookup(spark, table, "o_orderkey", key).count()
    want = (
        snap.read_version(spark, table)
        .where(F.col("o_orderkey") == key)
        .count()
    )
    assert got == want >= 1


def test_no_index_returns_all_files(spark, sf_dir, tmp_path):
    table, _ = _build(spark, sf_dir, tmp_path, n_appends=1)
    kept, total = bloomidx.bloom_candidate_files(
        spark, table, "o_orderkey", 42
    )
    assert kept == snap._read_manifest(table, 2)["files"]
    assert len(kept) == total


def test_build_and_probe_never_materialize_the_index_on_driver(
    spark, sf_dir, tmp_path, monkeypatch
):
    """The r8 scale-killer: build collected every file's bitset into
    one driver dict; probe looped over all files in Python. Both are
    now distributed — the ONLY driver materializations allowed are
    the k probe positions (1 row) and the admitted-file names
    (bounded by the answer, not the table). Enforced by failing any
    wide collect during the build and counting rows on the probe."""
    import pyspark.sql.classic.dataframe as pdf  # the concrete class

    table, orders = _build(spark, sf_dir, tmp_path)
    real_collect = pdf.DataFrame.collect

    def no_collect(self):
        raise AssertionError(
            "build_bloom_index must not collect to the driver"
        )

    monkeypatch.setattr(pdf.DataFrame, "collect", no_collect)
    try:
        bloomidx.build_bloom_index(spark, table, "o_orderkey")
    finally:
        monkeypatch.setattr(pdf.DataFrame, "collect", real_collect)

    collected_rows = []

    def counting_collect(self):
        rows = real_collect(self)
        collected_rows.append(len(rows))
        return rows

    monkeypatch.setattr(pdf.DataFrame, "collect", counting_collect)
    key = orders.head().o_orderkey
    kept, total = bloomidx.bloom_candidate_files(
        spark, table, "o_orderkey", key
    )
    monkeypatch.setattr(pdf.DataFrame, "collect", real_collect)
    # every probe-side collect is bounded by the ADMITTED set
    assert collected_rows and max(collected_rows) <= len(kept)
    assert len(kept) < total


def test_vacuum_gcs_index_sidecars_probe_stays_exact(
    spark, sf_dir, tmp_path
):
    """VERDICT r9 #7: vacuum removes the sidecars of dropped versions
    with their manifests; a probe on a LIVE version afterwards finds
    no index, degrades to must-scan, and stays exact."""
    import glob
    import os

    table, orders = _build(spark, sf_dir, tmp_path)  # versions 1..4
    bloomidx.build_bloom_index(spark, table, "o_orderkey", version=4)
    snap.append_version(table, orders.limit(0))  # v5 (empty append)
    assert glob.glob(os.path.join(table, "_index", "*"))
    snap.vacuum(table, keep_versions=1)  # drops v1..v4 + the sidecar
    assert not glob.glob(os.path.join(table, "_index", "*"))
    key = orders.head().o_orderkey
    kept, total = bloomidx.bloom_candidate_files(
        spark, table, "o_orderkey", key
    )
    assert kept and len(kept) == total  # must-scan fallback
    got = bloomidx.point_lookup(spark, table, "o_orderkey", key).count()
    want = (
        snap.read_version(spark, table)
        .where(F.col("o_orderkey") == key)
        .count()
    )
    assert got == want >= 1


def test_empty_table_raises_filenotfound(spark, tmp_path):
    """r8 ADVICE: bloom_candidate_files indexed vs[-1] on an empty
    version list (IndexError); now the same FileNotFoundError as
    point_lookup and read_version."""
    import pytest

    empty = str(tmp_path / "nope")
    with pytest.raises(FileNotFoundError):
        bloomidx.bloom_candidate_files(spark, empty, "c", 1)
    with pytest.raises(FileNotFoundError):
        bloomidx.build_bloom_index(spark, empty, "c")


def test_schema_evolution_column_missing_from_kept_files(
    spark, sf_dir, tmp_path
):
    """r8 ADVICE: a column added after the admitted files were written
    (present in NO kept file) made point_lookup throw AnalysisException
    where read_version surfaced NULLs. The lookup now degrades to the
    full snapshot read — exact, just unpruned."""
    table, orders = _build(spark, sf_dir, tmp_path, n_appends=1)
    bloomidx.build_bloom_index(spark, table, "o_orderkey")
    key = orders.where("o_orderkey % 4 = 0").head().o_orderkey
    evolved = orders.where("o_orderkey % 4 = 1").withColumn(
        "note", F.lit("late")
    )
    snap.append_version(table, evolved, merge_schema=True)
    got = bloomidx.point_lookup(spark, table, "o_orderkey", key)
    assert "note" in got.columns
    rows = got.collect()
    assert rows and all(r.note is None for r in rows)


def _docs_lake(spark, sf_dir, tmp_path, n_appends=3):
    """Multi-file documents lake: disjoint doc_id slices per commit."""
    from tcrd_spark.sources.lake import load_table

    table = str(tmp_path / "docs")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    snap.create_table(docs.where("doc_id % 4 = 0"), table, "lang")
    for i in range(1, n_appends + 1):
        snap.append_version(table, docs.where(f"doc_id % 4 = {i}"))
    return table, docs


def test_token_bloom_contains_lookup_exact_and_pruning(
    spark, sf_dir, tmp_path
):
    """tokenize=True indexes words: contains_lookup equals the
    unpruned contains-filter exactly, and a word present in only a
    few docs prunes files; an absent word prunes (almost) all."""
    from pyspark.sql import functions as F

    table, docs = _docs_lake(spark, sf_dir, tmp_path)
    bloomidx.build_bloom_index(spark, table, "text", tokenize=True)
    # a word that exists somewhere in the corpus
    word = (
        docs.select(F.explode(F.split("text", r"\s+")).alias("w"))
        .groupBy("w").count().orderBy("count").head().w
    )
    got = sorted(
        r.doc_id
        for r in bloomidx.contains_lookup(spark, table, "text", word)
        .collect()
    )
    want = sorted(
        r.doc_id
        for r in snap.read_version(spark, table)
        .where(F.array_contains(F.split("text", r"\s+"), word))
        .collect()
    )
    assert got == want and got
    kept, total = bloomidx.bloom_candidate_files(
        spark, table, "text", "zzz-not-a-word-zzz"
    )
    assert len(kept) <= max(1, total // 4)
    assert bloomidx.contains_lookup(
        spark, table, "text", "zzz-not-a-word-zzz"
    ).count() == 0


def test_index_kind_mismatch_degrades_to_must_scan(
    spark, sf_dir, tmp_path
):
    """Review catch: probing a token against a VALUE index (or a value
    against a TOKEN index) hashes different keys — pruning would
    silently false-negative. A kind-mismatched probe must degrade to
    must-scan and stay exact."""
    table, docs = _docs_lake(spark, sf_dir, tmp_path, n_appends=1)
    # VALUE index on text, then a CONTAINS lookup: must not prune
    bloomidx.build_bloom_index(spark, table, "text")  # tokenize=False
    word = docs.select(
        F.explode(F.split("text", r"\s+")).alias("w")
    ).head().w
    kept, total = bloomidx.bloom_candidate_files(
        spark, table, "text", word, tokenize=True
    )
    assert len(kept) == total  # wrong kind -> must-scan
    got = bloomidx.contains_lookup(spark, table, "text", word).count()
    want = (
        snap.read_version(spark, table)
        .where(F.array_contains(F.split("text", r"\s+"), word))
        .count()
    )
    assert got == want >= 1
    # and the other direction: TOKEN index, equality point_lookup
    t2 = str(tmp_path / "docs2")
    snap.create_table(docs.limit(50), t2, "lang")
    bloomidx.build_bloom_index(spark, t2, "text", tokenize=True)
    full_text = docs.limit(1).head().text
    kept2, total2 = bloomidx.bloom_candidate_files(
        spark, t2, "text", full_text, tokenize=False
    )
    assert len(kept2) == total2


def test_orphan_meta_degrades_to_must_scan(spark, sf_dir, tmp_path):
    """ADVICE r9: a crash between vacuum's two sidecar deletes can
    leave index meta without its parquet directory. The probe must
    treat that as 'no index' (must-scan, still exact), never raise —
    and vacuum itself deletes meta FIRST so the orphan direction is
    the harmless one (parquet without meta, invisible to discovery)."""
    import shutil

    table, orders = _build(spark, sf_dir, tmp_path)
    bloomidx.build_bloom_index(spark, table, "o_orderkey")
    key = orders.head().o_orderkey
    kept, total = bloomidx.bloom_candidate_files(
        spark, table, "o_orderkey", key
    )
    assert len(kept) < total  # index prunes while intact
    # orphan the meta: remove the parquet dir, keep the .meta.json
    v = snap.versions(table)[-1]
    shutil.rmtree(bloomidx._index_dir(table, "o_orderkey", v))
    kept2, total2 = bloomidx.bloom_candidate_files(
        spark, table, "o_orderkey", key
    )
    assert kept2 == sorted(
        snap._read_manifest(table, v)["files"]
    ) or len(kept2) == total2  # full must-scan, no exception
    # the pruned READ still returns exact rows through the degrade
    got = bloomidx.point_lookup(
        spark, table, "o_orderkey", key
    ).count()
    want = snap.read_version(spark, table).where(
        F.col("o_orderkey") == key
    ).count()
    assert got == want
