"""Drift-gate pins (quality/drift.py psi_max): a same-distribution
batch passes, a shifted batch fails, and — riding the standard
expectation contract — the write-audit-publish streaming sink
quarantines a DRIFTED micro-batch exactly like a failed null check."""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType,
)

from tcrd_spark.quality.drift import freeze_reference, psi_max
from tcrd_spark.quality.expectations import run_expectations
from tcrd_spark.sources import snapshots as snap


def _uniform(spark, lo, hi, n=400):
    return spark.range(n).select(
        (F.lit(lo) + F.col("id") % (hi - lo)).alias("x")
    )


def test_same_distribution_passes_shift_fails(spark):
    ref = freeze_reference(_uniform(spark, 0, 100), "x")
    ok = run_expectations(
        _uniform(spark, 0, 100), [psi_max("x", ref, 0.25)]
    ).head()
    assert ok.passed == 1 and ok.metric < 0.05
    # mass relocated to the top edge bin (clamped, not dropped)
    bad = run_expectations(
        _uniform(spark, 500, 600), [psi_max("x", ref, 0.25)]
    ).head()
    assert bad.passed == 0 and bad.metric > 1.0


def test_wap_sink_quarantines_drifted_batch(spark, sf_dir, tmp_path):
    table = str(tmp_path / "t")
    src = tmp_path / "in"
    qdir = str(tmp_path / "q")
    os.makedirs(src)
    seed = _uniform(spark, 0, 100).select(
        F.col("x").alias("o_orderkey"),
        F.lit("O").alias("o_orderstatus"),
    )
    snap.create_table(seed, table, "o_orderstatus")
    ref = freeze_reference(seed, "o_orderkey")
    suite = [psi_max("o_orderkey", ref, 0.25)]

    def write_chunk(name, keys):
        p = os.path.join(str(src), f"{name}.json")
        with open(p + ".tmp", "w") as f:
            for k in keys:
                f.write(json.dumps(
                    {"o_orderkey": k, "o_orderstatus": "O"}) + "\n")
        os.rename(p + ".tmp", p)

    write_chunk("good", list(range(0, 100)))        # same distribution
    write_chunk("drifted", list(range(5000, 5100)))  # relocated mass

    schema = StructType([
        StructField("o_orderkey", LongType()),
        StructField("o_orderstatus", StringType()),
    ])
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).json(str(src))
    )
    q = snap.streaming_snapshot_append(
        stream, table, str(tmp_path / "ckpt"),
        expectations=suite, quarantine_dir=qdir,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    published = {
        r.o_orderkey for r in snap.read_version(spark, table).collect()
    }
    assert 50 in published          # the good batch landed
    assert 5050 not in published    # the drifted batch never published
    quarantined = spark.read.parquet(
        *glob.glob(os.path.join(qdir, "batch_id=*"))
    )
    assert {r.o_orderkey for r in quarantined.collect()} == set(
        range(5000, 5100)
    )
