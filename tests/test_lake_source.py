"""Versioned lake as a streaming SOURCE (streaming/lake_source.py):
backfill-then-tail exactly-once over append commits, checkpoint
restart, and the rewrite-commit refusal/skip contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from tcrd_spark.sources import snapshots as snap
from tcrd_spark.streaming.lake_source import LakeCommitsDataSource


def _orders(spark, sf_dir, n=40):
    from tcrd_spark.sources.lake import load_table

    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")
        .limit(n)
    )


def _mk(spark, table, seed):
    snap.create_table(seed, table, "o_orderstatus")
    spark.dataSource.register(LakeCommitsDataSource)


def _collector():
    got = []

    def sink(df, _bid):
        got.extend(
            (r["o_orderkey"], r["o_orderstatus"], r["o_totalprice"])
            for r in df.collect()
        )

    return got, sink


def _start(spark, table, ckpt, sink, **opts):
    reader = spark.readStream.format("tcrd_lake_commits").option(
        "path", table
    )
    for k, v in opts.items():
        reader = reader.option(k, v)
    return (
        reader.load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .start()
    )


def _shift(df, offset):
    return df.select(
        (F.col("o_orderkey") + offset).alias("o_orderkey"),
        "o_orderstatus", "o_totalprice",
    )


def test_backfill_then_tail_exactly_once(spark, sf_dir, tmp_path):
    table, ckpt = str(tmp_path / "t"), str(tmp_path / "ckpt")
    seed = _orders(spark, sf_dir)
    _mk(spark, table, seed)
    got, sink = _collector()

    q = _start(spark, table, ckpt, sink)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    want = {tuple(r) for r in seed.collect()}
    assert set(got) == want and len(got) == len(want)

    # two more append commits while the stream is DOWN, then restart
    # from the checkpoint: each arrives exactly once, no backfill replay
    snap.append_version(table, _shift(seed.limit(5), 10**9))
    snap.append_version(table, _shift(seed.limit(3), 2 * 10**9))
    q = _start(spark, table, ckpt, sink)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    latest = {
        tuple(r) for r in snap.read_version(spark, table).collect()
    }
    assert set(got) == latest
    assert len(got) == len(latest), "a commit replayed into duplicates"


def test_rewrite_commits_refused_then_skipped(spark, sf_dir, tmp_path):
    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    table = str(tmp_path / "t")
    seed = _orders(spark, sf_dir)
    _mk(spark, table, seed)
    src = seed.limit(4).withColumn(
        "o_totalprice", F.col("o_totalprice") + 1.0
    )
    snap.merge_version(spark, table, src, ["o_orderkey"])  # v2: rewrite
    snap.append_version(table, _shift(seed.limit(2), 10**9))  # v3

    got, sink = _collector()
    with pytest.raises(StreamingQueryException, match="skipChangeCommits"):
        q = _start(spark, table, str(tmp_path / "c1"), sink)
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    got2, sink2 = _collector()
    q = _start(
        spark, table, str(tmp_path / "c2"), sink2,
        skipChangeCommits="true",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # v1 backfill + v3 append arrive; the v2 rewrite is passed over
    want = {tuple(r) for r in seed.collect()} | {
        tuple(r)
        for r in _shift(seed.limit(2), 10**9).collect()
    }
    assert set(got2) == want and len(got2) == len(want)


def test_schema_evolution_boundary_stops_the_stream(
    spark, sf_dir, tmp_path
):
    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    table = str(tmp_path / "t")
    seed = _orders(spark, sf_dir, n=10)
    _mk(spark, table, seed)
    evolved = _shift(seed.limit(2), 10**9).withColumn(
        "batch_tag", F.lit("x")
    )
    snap.append_version(table, evolved, merge_schema=True)
    _got, sink = _collector()
    with pytest.raises(StreamingQueryException, match="schema-evolution"):
        q = _start(spark, table, str(tmp_path / "c"), sink)
        try:
            q.processAllAvailable()
        finally:
            q.stop()
