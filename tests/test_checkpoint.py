"""Resumable stage checkpointing (etl/checkpoint.py): completed
stages are never recomputed, a mid-pipeline crash resumes at the
failed stage, and incomplete writes are invisible to readers."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tcrd_spark.etl.checkpoint import is_complete, run_stages, stage


def test_stage_computes_once(spark, tmp_path):
    root = str(tmp_path)
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(5).select(F.col("id"), (F.col("id") * 2).alias("v"))

    a = stage(spark, root, "double", build)
    b = stage(spark, root, "double", build)
    assert calls["n"] == 1
    assert sorted(r["v"] for r in b.collect()) == [0, 2, 4, 6, 8]
    assert a.schema == b.schema


def test_crash_resumes_at_failed_stage(spark, tmp_path):
    """Stage 2 fails on the first run; the rerun must skip stage 1
    (already landed) and complete stages 2-3."""
    root = str(tmp_path)
    calls = {"s1": 0, "s2": 0, "s3": 0}
    fail_once = {"armed": True}

    def s1(_):
        calls["s1"] += 1
        return spark.range(10).withColumnRenamed("id", "k")

    def s2(prev):
        calls["s2"] += 1
        if fail_once["armed"]:
            fail_once["armed"] = False
            raise RuntimeError("simulated crash")
        return prev.filter(F.col("k") % 2 == 0)

    def s3(prev):
        calls["s3"] += 1
        return prev.agg(F.sum("k").alias("total"))

    stages = [("gen", s1), ("filter", s2), ("sum", s3)]
    with pytest.raises(RuntimeError, match="simulated crash"):
        run_stages(spark, root, stages)
    assert is_complete(root, "00_gen") and not is_complete(root, "01_filter")

    out = run_stages(spark, root, stages)
    assert out.collect()[0]["total"] == 0 + 2 + 4 + 6 + 8
    # stage 1 ran once total (resume reused its parquet); 2 ran twice
    assert calls == {"s1": 1, "s2": 2, "s3": 1}


def test_incomplete_write_is_invisible(spark, tmp_path):
    """A stage directory without _SUCCESS (killed mid-write) is
    treated as absent and rebuilt."""
    root = str(tmp_path)
    broken = os.path.join(root, "x")
    os.makedirs(broken)
    with open(os.path.join(broken, "part-00000.parquet"), "wb") as f:
        f.write(b"not parquet")
    assert not is_complete(root, "x")
    out = stage(spark, root, "x", lambda: spark.range(3))
    assert out.count() == 3
    assert is_complete(root, "x")
