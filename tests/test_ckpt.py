"""Walk checkpoints (sources/snapshots.py — the Delta
`_last_checkpoint` shape): the metadata WALKS (version_as_of,
txn_seen, history_df) answer from a header summary instead of
O(versions) manifest reads, the checkpoint auto-writes every
`_CKPT_EVERY` commits, stays correct under vacuum (live-version
intersection — a dropped version never resurfaces through a stale
checkpoint), and the object-store fake carries it unchanged."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from tcrd_spark.sources import snapshots as snap
from tcrd_spark.sources.metastore import MemoryStore, use_store

SCHEMA = "o_orderkey long, o_orderstatus string, o_totalprice double"


def _seed(spark, n=6, key0=1):
    return spark.createDataFrame(
        [(key0 + i, "OF"[i % 2], 10.0 * i) for i in range(n)], SCHEMA
    )


def _grow(spark, table, upto):
    """Append txn-tagged commits until the table has `upto` versions."""
    v = snap.versions(table)[-1]
    while v < upto:
        v = snap.append_version(
            table, _seed(spark, 2, 10_000 + 100 * v),
            txn_id=f"b{v + 1}",
        )
    return v


def test_auto_checkpoint_and_walk_equivalence(spark, tmp_path):
    """v10 auto-writes a checkpoint; every walk answers identically
    to the manifest-by-manifest ground truth, including the
    post-checkpoint tail."""
    table = str(tmp_path / "t")
    snap.create_table(_seed(spark), table, "o_orderstatus")
    _grow(spark, table, 13)  # crosses the v10 auto-checkpoint

    ck = snap._latest_ckpt(table)
    assert ck is not None and ck[0] == 10
    assert set(ck[1]) == set(range(1, 11))

    # ground truth straight from the manifests
    truth = {
        v: snap._read_manifest(table, v) for v in snap.versions(table)
    }
    hdrs = snap._walk_headers(table)
    assert set(hdrs) == set(truth)
    for v, m in truth.items():
        assert hdrs[v]["ts"] == m["ts"]
        assert hdrs[v].get("txn_id") == m.get("txn_id")
        assert hdrs[v]["n_files"] == len(m["files"])

    # the three walks
    for v in (2, 10, 13):
        assert snap.version_as_of(table, truth[v]["ts"]) == v
    assert snap.version_as_of(table, time.time() + 1) == 13
    for v in (2, 10, 13):
        if truth[v].get("txn_id"):
            assert snap.txn_seen(table, truth[v]["txn_id"])
    assert not snap.txn_seen(table, "nope")
    hist = {r.version: (r.op, r.n_files, r.txn_id)
            for r in snap.history_df(spark, table).collect()}
    assert set(hist) == set(truth)
    for v, m in truth.items():
        assert hist[v] == (
            m["op"], len(m["files"]),
            None if m.get("txn_id") is None else str(m["txn_id"]),
        )
    # and the txn guard still gates replays across the boundary
    assert snap.append_version(
        table, _seed(spark, 2, 999_000), txn_id="b5"
    ) is None


def test_checkpoint_is_incremental_and_survives_vacuum(spark, tmp_path):
    """The second checkpoint builds on the first; vacuum drops old
    versions AND stale checkpoints, and a stale prefix never
    resurrects dropped versions in any walk."""
    table = str(tmp_path / "t")
    snap.create_table(_seed(spark), table, "o_orderstatus")
    _grow(spark, table, 21)  # checkpoints at v10 and v20
    ck = snap._latest_ckpt(table)
    assert ck[0] == 20 and set(ck[1]) == set(range(1, 21))

    snap.vacuum(table, keep_versions=3)
    live = snap.versions(table)
    assert live == [19, 20, 21]
    # only the newest checkpoint file remains
    cks = [n for n in os.listdir(snap._manifest_dir(table))
           if n.startswith("_ckpt-")]
    assert cks == ["_ckpt-v00020.json"]
    # walks see exactly the live versions despite the stale prefix
    assert sorted(
        r.version for r in snap.history_df(spark, table).collect()
    ) == live
    assert snap.version_as_of(table, time.time() + 1) == 21
    assert not snap.txn_seen(table, "b5")  # vacuumed txn is GONE
    assert snap.txn_seen(table, "b21")


def test_checkpoint_on_memory_store(spark, tmp_path):
    table = str(tmp_path / "t")
    with use_store(MemoryStore()):
        snap.create_table(_seed(spark), table, "o_orderstatus")
        _grow(spark, table, 12)
        ck = snap._latest_ckpt(table)
        assert ck is not None and ck[0] == 10
        assert snap.txn_seen(table, "b7")
        assert sorted(
            r.version for r in snap.history_df(spark, table).collect()
        ) == list(range(1, 13))
