"""Dataset publishing: sharded JSONL export with a checksummed
manifest, and distributed verification of a published set.

The delivery step at the end of every training-data pipeline: the
curated corpus leaves the lake as N JSONL shards plus a _MANIFEST
recording, per shard, the byte length, row count, and sha256 — what a
training run (or a downstream team) uses to verify it received
exactly what was published, and what makes a re-export comparable
file-by-file. The reference's CSV exporters (`python/tcrd2csv.py`)
write bare files; the manifest is the parity+ part.

Spark-first mechanics, no driver-side data paths:

- rows are assigned to shards by a DETERMINISTIC key hash (pmod of
  xxhash64), repartitioned to one task per shard, sorted within the
  shard by the key, and written as JSON lines by the engine — same
  input ⇒ same shard MEMBERSHIP and same row ORDER, independent of
  cluster layout;
- checksums are computed DISTRIBUTEDLY by re-reading the written
  shards as `binaryFile` rows and hashing in executors (`sha2`) —
  the driver only assembles the (N-row) manifest JSON;
- `verify_export` re-hashes the same way and compares against the
  manifest: any corrupted, truncated, missing, or extra shard shows
  up as a named mismatch.

100 TB shape: the export is one hash-repartition exchange + a
per-shard sort; verification reads each shard once, embarrassingly
parallel. Shard count is the parallelism knob — size shards to the
consumer (a few hundred MB each), not to the writer.

Reference parity: `python/tcrd2csv.py` (bare CSV export);
manifest/verification is an extension.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_MANIFEST.json"


def export_jsonl(
    spark: SparkSession,
    df: DataFrame,
    out_dir: str,
    key_col: str,
    n_shards: int = 8,
) -> dict:
    """Publish `df` as `n_shards` JSONL shards + manifest; returns the
    manifest dict."""
    shard = F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_shards))
    (
        df.withColumn("_shard", shard)
        .repartition(n_shards, "_shard")
        .sortWithinPartitions("_shard", key_col)
        .drop("_shard")
        .write.mode("overwrite")
        .json(out_dir)
    )
    # distributed shard accounting: bytes+sha in one binaryFile pass,
    # rows in one line-count pass — both executor-side
    files = (
        spark.read.format("binaryFile")
        .load(out_dir + "/part-*")
        .select(
            F.element_at(F.split("path", "/"), -1).alias("shard"),
            F.length("content").alias("bytes"),
            F.sha2("content", 256).alias("sha256"),
        )
    )
    rows = (
        spark.read.text(out_dir + "/part-*")
        .select(
            F.element_at(
                F.split(F.input_file_name(), "/"), -1
            ).alias("shard")
        )
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("rows"))
    )
    shards = {
        r.shard: {"bytes": r.bytes, "sha256": r.sha256, "rows": 0}
        for r in files.collect()
    }
    for r in rows.collect():
        shards[r.shard]["rows"] = r.rows
    manifest = {
        "format": "jsonl",
        "key_col": key_col,
        "n_shards_requested": n_shards,
        "total_rows": sum(s["rows"] for s in shards.values()),
        "shards": dict(sorted(shards.items())),
    }
    with open(os.path.join(out_dir, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def verify_export(spark: SparkSession, out_dir: str) -> dict:
    """Re-hash every shard and compare with the manifest. Returns
    {ok, mismatched, missing, extra, rows_ok} — all named, nothing
    silently summarized away."""
    with open(os.path.join(out_dir, MANIFEST)) as f:
        manifest = json.load(f)
    # drop cached file statuses: a shard mutated since the last read
    # would otherwise surface as a length-mismatch read error (or a
    # stale clean verdict), not a named checksum mismatch
    spark.catalog.refreshByPath(out_dir)
    got = {
        r.shard: (r.bytes, r.sha256)
        for r in (
            spark.read.format("binaryFile")
            .load(out_dir + "/part-*")
            .select(
                F.element_at(F.split("path", "/"), -1).alias("shard"),
                F.length("content").alias("bytes"),
                F.sha2("content", 256).alias("sha256"),
            )
            .collect()
        )
    }
    want = manifest["shards"]
    mismatched = sorted(
        s
        for s in set(got) & set(want)
        if (got[s][0], got[s][1]) != (want[s]["bytes"], want[s]["sha256"])
    )
    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    n_rows = spark.read.text(out_dir + "/part-*").count() if got else 0
    rows_ok = n_rows == manifest["total_rows"]
    return {
        "ok": not (mismatched or missing or extra) and rows_ok,
        "mismatched": mismatched,
        "missing": missing,
        "extra": extra,
        "rows_ok": rows_ok,
    }
