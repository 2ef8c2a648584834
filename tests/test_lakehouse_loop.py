"""End-to-end lakehouse loop: a producer STREAM commits micro-batch
snapshots into the versioned table (exactly-once txn appends), a
consumer STREAM tails the commit log (LakeCommitsDataSource) and
maintains a grouped aggregate — which must equal a full recompute of
the latest snapshot. Producer and consumer never coordinate beyond
the manifest log."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType,
)

from tcrd_spark.sources import snapshots as snap
from tcrd_spark.streaming.lake_source import LakeCommitsDataSource

SCHEMA = StructType([
    StructField("o_orderkey", LongType()),
    StructField("o_orderstatus", StringType()),
    StructField("o_totalprice", DoubleType()),
])


def test_producer_consumer_loop(spark, tmp_path):
    table = str(tmp_path / "t")
    src = tmp_path / "src"
    src.mkdir()
    seed = spark.createDataFrame(
        [(1, "O", 10.0), (2, "F", 20.0)], SCHEMA
    )
    snap.create_table(seed, table, "o_orderstatus")
    spark.dataSource.register(LakeCommitsDataSource)

    def write_chunk(name, rows):
        p = os.path.join(str(src), f"{name}.json")
        with open(p + ".tmp", "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        os.rename(p + ".tmp", p)

    write_chunk("a", [
        {"o_orderkey": 10 + i, "o_orderstatus": "OF"[i % 2],
         "o_totalprice": float(i)} for i in range(6)
    ])
    write_chunk("b", [
        {"o_orderkey": 100 + i, "o_orderstatus": "P",
         "o_totalprice": 2.0 * i} for i in range(4)
    ])

    # producer: file stream -> one snapshot commit per micro-batch
    producer = snap.streaming_snapshot_append(
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1).json(str(src)),
        table,
        str(tmp_path / "ckpt_prod"),
    )
    try:
        producer.processAllAvailable()
    finally:
        producer.stop()
    assert len(snap.versions(table)) >= 3  # seed + 2 commits

    # consumer: tail the commit log, maintain count/sum per status
    state: dict[str, list[float]] = {}

    def fold(df, _bid):
        for r in df.collect():
            s = state.setdefault(r["o_orderstatus"], [0, 0.0])
            s[0] += 1
            s[1] += r["o_totalprice"]

    consumer = (
        spark.readStream.format("tcrd_lake_commits")
        .option("path", table).load()
        .writeStream.foreachBatch(fold)
        .option("checkpointLocation", str(tmp_path / "ckpt_cons"))
        .start()
    )
    try:
        consumer.processAllAvailable()
    finally:
        consumer.stop()

    want = {
        r["o_orderstatus"]: (r["n"], r["s"])
        for r in snap.read_version(spark, table)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"), F.sum("o_totalprice").alias("s"))
        .collect()
    }
    assert set(state) == set(want)
    for k, (n, s) in want.items():
        assert state[k][0] == n
        assert abs(state[k][1] - s) < 1e-9


def test_write_audit_publish_quarantines_bad_batches(spark, tmp_path):
    """WAP: a poisoned micro-batch never publishes — it lands in the
    quarantine with its verdicts; clean batches commit; a restart
    replays nothing into duplicates."""
    import glob
    import os

    from tcrd_spark.quality import expectations as dq

    table = str(tmp_path / "t")
    src = tmp_path / "src"
    src.mkdir()
    qdir = str(tmp_path / "quarantine")
    os.makedirs(qdir)
    seed = spark.createDataFrame([(1, "O", 10.0)], SCHEMA)
    snap.create_table(seed, table, "o_orderstatus")
    suite = [dq.min_value("o_totalprice", 0.0)]

    def write_chunk(name, rows):
        p = os.path.join(str(src), f"{name}.json")
        with open(p + ".tmp", "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        os.rename(p + ".tmp", p)

    write_chunk("good1", [
        {"o_orderkey": 10, "o_orderstatus": "O", "o_totalprice": 5.0}
    ])
    write_chunk("poison", [
        {"o_orderkey": 20, "o_orderstatus": "F", "o_totalprice": -3.0}
    ])
    write_chunk("good2", [
        {"o_orderkey": 30, "o_orderstatus": "P", "o_totalprice": 7.0}
    ])

    def start():
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1).json(str(src))
        )
        return snap.streaming_snapshot_append(
            stream, table, str(tmp_path / "ckpt"),
            expectations=suite, quarantine_dir=qdir,
        )

    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    latest = snap.read_version(spark, table)
    ks = {r["o_orderkey"] for r in latest.collect()}
    assert ks == {1, 10, 30}  # the poisoned row never published
    quarantined = spark.read.parquet(
        *glob.glob(os.path.join(qdir, "batch_id=*"))
    )
    assert {r["o_orderkey"] for r in quarantined.collect()} == {20}
    assert glob.glob(os.path.join(qdir, "verdicts-*.json"))

    # restart: nothing replays into duplicates, table unchanged
    before = latest.count()
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert snap.read_version(spark, table).count() == before


def test_streaming_cdc_apply_via_dv_merge(spark, tmp_path):
    """An at-least-once CDC-apply sink using the MOR merge: each
    micro-batch lands as ONE mark+append dv commit under its batch
    txn_id (no target file ever rewritten), a restart replays the
    stream from scratch and every replayed batch no-ops on the txn
    guard, and the final table equals the batch-computed expectation."""
    table = str(tmp_path / "t")
    src = tmp_path / "src"
    src.mkdir()
    seed = spark.createDataFrame(
        [(i, "OF"[i % 2], 10.0 * i) for i in range(1, 21)], SCHEMA
    )
    snap.create_table(seed, table, "o_orderstatus")
    v1_files = set(snap._read_manifest(table, 1)["files"])

    def write_chunk(name, rows):
        p = os.path.join(str(src), f"{name}.json")
        with open(p + ".tmp", "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        os.rename(p + ".tmp", p)

    # batch a: price updates for even keys; batch b: new keys + one
    # tombstone (status X ⇒ delete via the merge's delete_condition)
    write_chunk("a", [
        {"o_orderkey": k, "o_orderstatus": "OF"[k % 2],
         "o_totalprice": 10.0 * k + 1.0}
        for k in range(2, 21, 2)
    ])
    write_chunk("b", [
        {"o_orderkey": 100 + i, "o_orderstatus": "P",
         "o_totalprice": 5.0 * i} for i in range(3)
    ] + [{"o_orderkey": 7, "o_orderstatus": "X", "o_totalprice": 0.0}])

    def apply_batch(df, bid):
        snap.merge_version(
            spark, table, df, ["o_orderkey"],
            delete_condition="s.o_orderstatus = 'X'",
            granularity="dv", txn_id=f"cdc-{bid}",
        )

    def run(ckpt):
        q = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1).json(str(src))
            .writeStream.foreachBatch(apply_batch)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run(str(tmp_path / "ckpt1"))
    head = snap.versions(table)[-1]
    # a FRESH checkpoint replays every batch from scratch — each must
    # no-op on its committed txn_id, landing zero new versions
    run(str(tmp_path / "ckpt2"))
    assert snap.versions(table)[-1] == head

    got = {
        (r.o_orderkey, r.o_orderstatus, round(r.o_totalprice, 2))
        for r in snap.read_version(spark, table).collect()
    }
    exp = {
        (k, "OF"[k % 2], 10.0 * k + (1.0 if k % 2 == 0 else 0.0))
        for k in range(1, 21) if k != 7
    } | {(100 + i, "P", 5.0 * i) for i in range(3)}
    assert got == exp
    # every seed file survived every commit — merge-on-read all the way
    assert v1_files <= set(snap._read_manifest(table, head)["files"])
