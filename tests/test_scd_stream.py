"""Streaming SCD2 upkeep pins (streaming/scd_stream.py): a change
stream folded into a lake-persisted history equals the batch rebuild
over all observations — across a stream RESTART — and a replayed
micro-batch (same txn epoch) is a no-op, never a double-apply."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tcrd_spark.operators.scd import scd2_history
from tcrd_spark.sources import snapshots as snap
from tcrd_spark.streaming import scd_stream

OBS_DDL = "k long, ts long, attr string"


def _obs(spark, rows):
    return spark.createDataFrame(rows, OBS_DDL)


B0 = [(1, 1000, "a"), (2, 1000, "x"), (3, 1000, "m")]
B1 = [(1, 2000, "b"), (2, 2000, "x"), (4, 2000, "q")]  # 2: no change
B2 = [(1, 3000, "b"), (3, 3000, "n"), (4, 3000, "r")]  # 1: no change


def _mk_history_table(spark, tmp_path):
    table = str(tmp_path / "hist")
    hist = scd2_history(_obs(spark, B0), "k", "ts", "attr")
    snap.create_table(hist, table, "version")
    return table


def _rows(df):
    return sorted(
        tuple(r)
        for r in df.select(
            "k", "attr", "valid_from", "valid_to", "version", "is_current"
        ).collect()
    )


def test_stream_equals_batch_rebuild_across_restart(spark, tmp_path):
    table = _mk_history_table(spark, tmp_path)
    obs_dir = str(tmp_path / "obs")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(obs_dir)

    def writer():
        stream = spark.readStream.schema(OBS_DDL).option(
            "maxFilesPerTrigger", "1"
        ).parquet(obs_dir)
        return scd_stream.scd2_stream_writer(
            stream, table, "k", "ts", "attr", ckpt
        )

    def drop(batch, name):
        # the file source lists top-level files: stage then move flat
        import glob as g
        import shutil

        tmp = str(tmp_path / ("stage_" + name))
        _obs(spark, batch).coalesce(1).write.parquet(tmp)
        shutil.move(g.glob(os.path.join(tmp, "part-*.parquet"))[0],
                    os.path.join(obs_dir, name + ".parquet"))

    drop(B1, "b1")
    q = writer().start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # RESTART: a new query from the same checkpoint picks up batch 2
    drop(B2, "b2")
    q = writer().start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    want = scd2_history(_obs(spark, B0 + B1 + B2), "k", "ts", "attr")
    got = snap.read_version(spark, table)
    assert _rows(got) == _rows(want)
    # unchanged-attr observations created no phantom versions
    assert got.where("k = 2").count() == 1


def test_replayed_txn_is_noop(spark, tmp_path):
    table = _mk_history_table(spark, tmp_path)
    v = scd_stream.scd2_apply_to_lake(
        spark, table, _obs(spark, B1), "k", "ts", "attr", txn_id=7
    )
    assert v == 2
    before = _rows(snap.read_version(spark, table))
    # an at-least-once sink re-offers the same epoch after a crash
    again = scd_stream.scd2_apply_to_lake(
        spark, table, _obs(spark, B1), "k", "ts", "attr", txn_id=7
    )
    assert again is None
    assert _rows(snap.read_version(spark, table)) == before
    assert snap.versions(table) == [1, 2]


def test_closed_versions_never_rescanned(spark, tmp_path):
    """The scale contract: the delta pulls ONLY current rows of
    touched keys (semi-join) — the fold's work is ∝ batch. Pin the
    observable consequence: a key untouched by the batch keeps its
    rows byte-identical across the merge (carried by reference or
    rewritten unchanged), and history grows only for touched keys."""
    table = _mk_history_table(spark, tmp_path)
    scd_stream.scd2_apply_to_lake(
        spark, table, _obs(spark, [(1, 2000, "z")]), "k", "ts", "attr",
        txn_id=1,
    )
    got = snap.read_version(spark, table)
    assert _rows(got.where("k != 1")) == _rows(
        scd2_history(_obs(spark, B0), "k", "ts", "attr").where("k != 1")
    )
    assert got.where("k = 1").count() == 2  # closed v1 + open v2
    r = {x.version: x for x in got.where("k = 1").collect()}
    assert r[1].valid_to == 2000 and r[1].is_current is False
    assert r[2].valid_from == 2000 and r[2].is_current is True


def test_rebuilt_checkpoint_cannot_collide_with_old_epochs(
    spark, tmp_path
):
    """Review catch: the committed txn id is app-scoped
    ('<app>:<epoch>'). A stream whose checkpoint was rebuilt (epochs
    restart at 0 under a new app identity) must APPLY its batches,
    not silently no-op against the first run's epoch numbers."""
    table = _mk_history_table(spark, tmp_path)
    v = scd_stream.scd2_apply_to_lake(
        spark, table, _obs(spark, B1), "k", "ts", "attr",
        txn_id="ckptA:0",
    )
    assert v == 2
    v = scd_stream.scd2_apply_to_lake(
        spark, table, _obs(spark, B2), "k", "ts", "attr",
        txn_id="ckptB:0",  # new app, epoch counter restarted
    )
    assert v == 3  # applied, not skipped
    want = scd2_history(_obs(spark, B0 + B1 + B2), "k", "ts", "attr")
    assert _rows(snap.read_version(spark, table)) == _rows(want)


def test_bucketed_layout_rewrites_only_touched_buckets(spark, tmp_path):
    """The COW write-amplification contract: with the history laid out
    by key bucket (with_history_bucket), a single-key batch rewrites
    ONLY that key's bucket partition — every other bucket's files
    carry forward by reference in the new manifest."""
    table = str(tmp_path / "hist")
    hist = scd_stream.with_history_bucket(
        scd2_history(_obs(spark, B0), "k", "ts", "attr"), "k",
        n_buckets=4,
    )
    snap.create_table(hist, table, "kb")
    v = scd_stream.scd2_apply_to_lake(
        spark, table, _obs(spark, [(1, 2000, "z")]), "k", "ts", "attr",
        txn_id="a:0", bucket_col="kb", n_buckets=4,
    )
    assert v == 2
    d = snap.manifest_diff(table, 1, 2)
    kb1 = spark.range(1).select(
        F.pmod(F.xxhash64(F.lit(1).cast("long")), F.lit(4)).alias("b")
    ).head().b
    # every added/removed file lives in key 1's bucket; all other
    # buckets carried by reference
    changed = d["added"] + d["removed"]
    assert changed and all(f.startswith(f"kb={kb1}/") for f in changed), (
        kb1, d)
    assert d["carried"], "untouched buckets must carry by reference"
    # and the fold is still correct
    got = snap.read_version(spark, table)
    want = scd2_history(_obs(spark, B0 + [(1, 2000, "z")]), "k", "ts",
                        "attr")
    assert _rows(got) == _rows(want)


def test_bucket_spec_mismatch_is_refused(spark, tmp_path):
    """Review catch: folding with a DIFFERENT bucket spec than the
    table was created with would scatter seed updates into wrong
    partitions (duplicate is_current rows, silently) — it must raise
    instead, and a missing bucket column must raise too."""
    import pytest

    table = str(tmp_path / "hist")
    hist = scd_stream.with_history_bucket(
        scd2_history(_obs(spark, B0), "k", "ts", "attr"), "k",
        n_buckets=4,
    )
    snap.create_table(hist, table, "kb")
    with pytest.raises(ValueError, match="bucket spec mismatch"):
        scd_stream.scd2_apply_to_lake(
            spark, table, _obs(spark, B1), "k", "ts", "attr",
            txn_id="a:0", bucket_col="kb", n_buckets=64,
        )
    # and a table created WITHOUT the bucket column refuses the knob
    t2 = str(tmp_path / "hist2")
    snap.create_table(
        scd2_history(_obs(spark, B0), "k", "ts", "attr"), t2, "version"
    )
    with pytest.raises(ValueError, match="no 'kb' column"):
        scd_stream.scd2_apply_to_lake(
            spark, t2, _obs(spark, B1), "k", "ts", "attr",
            txn_id="a:0", bucket_col="kb", n_buckets=4,
        )
