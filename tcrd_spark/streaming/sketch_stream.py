"""Streaming sketch maintenance: Count-Min grids and KMV sketches kept
current over an append stream.

Mergeability is the entire reason these sketch shapes exist at 100 TB
(SCALE.md, pipeline/sketches.py): a CMS grid merges by cell-wise
addition, a KMV sketch by re-taking the k smallest of a union. That
makes streaming maintenance embarrassingly incremental — each
micro-batch writes its OWN tiny sketch partition, and the "current"
sketch is a fold over partitions at read time:

    batch side:  per-batch sketch (bounded: d·w cells / k hashes),
                 written with mode=overwrite into batch_id=N — the
                 idempotent per-batch-partition pattern
                 `streaming/jobs.dedup_probe_batch` established
                 (foreachBatch is at-least-once; a replayed batch
                 overwrites ITS OWN partition, so reruns are no-ops)
    read side:   CMS:  groupBy(d, col).sum(cnt)   — cell-wise merge
                 KMV:  k smallest over the unioned batch sketches
                 (min-k(A ∪ B) == min-k(min-k(A) ∪ min-k(B)))

Equality with the batch-built sketch over the same data is exact and
replay-tested — not "approximately the same estimate", the identical
grid/hash-set, because the sketches are deterministic (hash60).

State: ZERO in the streaming engine (no mapGroupsWithState) — the
sketch state lives in the lake as data, so restarts need no state
store and the sketch is queryable mid-stream by any other session.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tcrd_spark.pipeline.sketches import (
    CMS_DEPTH,
    CMS_SEED,
    CMS_WIDTH,
    KMV_K,
    cms_build,
    kmv_sketch,
)


def cms_batch_writer(grid_dir: str, item_col: str):
    """foreachBatch hook: build this batch's grid, overwrite its own
    batch_id partition (idempotent under foreachBatch retries)."""

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        grid = cms_build(
            batch_df, F.col(item_col).cast("string"),
            CMS_DEPTH, CMS_WIDTH, CMS_SEED,
        ).withColumn("batch_id", F.lit(int(batch_id)))
        (
            grid.coalesce(1)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(grid_dir)
        )

    return _write


def kmv_batch_writer(sketch_dir: str, item_col: str):
    """foreachBatch hook: this batch's k smallest distinct hashes →
    its own batch_id partition."""

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        sk = kmv_sketch(
            batch_df, [], F.col(item_col).cast("string"), KMV_K
        ).withColumn("batch_id", F.lit(int(batch_id)))
        (
            sk.coalesce(1)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(sketch_dir)
        )

    return _write


def streaming_cms(stream: DataFrame, grid_dir: str, item_col: str,
                  checkpoint_dir: str):
    """Maintain a CMS grid over an append stream (foreachBatch)."""
    return (
        stream.writeStream.foreachBatch(cms_batch_writer(grid_dir, item_col))
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def streaming_kmv(stream: DataFrame, sketch_dir: str, item_col: str,
                  checkpoint_dir: str):
    """Maintain a KMV sketch over an append stream (foreachBatch)."""
    return (
        stream.writeStream.foreachBatch(kmv_batch_writer(sketch_dir, item_col))
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def cms_current(spark: SparkSession, grid_dir: str) -> DataFrame:
    """The merged grid: cell-wise sum across batch partitions."""
    return (
        spark.read.parquet(grid_dir)
        .groupBy("d", "col")
        .agg(F.sum("cnt").alias("cnt"))
    )


def kmv_current(spark: SparkSession, sketch_dir: str, k: int = KMV_K) -> DataFrame:
    """The merged sketch: k smallest distinct hashes over all batch
    sketches (TakeOrdered — never a global window)."""
    return (
        spark.read.parquet(sketch_dir)
        .select("h")
        .distinct()
        .orderBy(F.asc("h"))
        .limit(k)
    )
