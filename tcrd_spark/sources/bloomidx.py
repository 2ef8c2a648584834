"""Per-file Bloom-filter index for the versioned lake — equality
file-skipping where zone maps can't help.

Zone maps (`snapshots.plan_files`) prune RANGE predicates on
clustered columns; a point lookup on a high-cardinality UNCLUSTERED
key (doc_id, order key, content hash) intersects every file's
[min, max] and prunes nothing. Delta's bloom-filter index / Iceberg's
puffin files solve this with a per-data-file membership sketch; this
is that capability for the manifest lake:

- `build_bloom_index`: ONE distributed pass over a snapshot computes,
  per data file, the k xxhash64 bit positions of every value
  (row-local explode, map-side-combinable distinct per file), packs
  each file's ≤ m-bit set into a hex bitset on the driver
  (m/8 bytes per file — 1 KiB at the default), and publishes
  `_index/bloom-<col>-v<version>.json` atomically.
- `bloom_candidate_files`: a lookup keeps only files whose bitset has
  ALL k bits of the probe value — no data file is opened.
- `point_lookup`: reads just the candidate files and re-applies the
  exact predicate, so results equal the unpruned filter exactly
  (false positives cost IO, never correctness; false negatives are
  impossible for values present when the index was built).

Hashing runs in the ENGINE (xxhash64) on both the build and the
probe side — the probe hashes its literal through a 1-row Spark job
so driver and executors can never disagree on the hash of a value.

Sizing: m auto-scales to ~10 bits per key of the snapshot's BIGGEST
file (power of two, 1 KiB–256 KiB per file), giving ~1% false
positives at k=4 regardless of file size — a fixed m saturates on
large files and quietly stops pruning (measured in
tools/bloom_bench.py before the auto-sizing). At a million files the
index is tens of GiB; a production layout shards it by partition
directory and prunes distributedly — the sketch math is unchanged.

Index version-pins to the snapshot it was built from: appends create
NEW files (existing bitsets stay valid — files are immutable), so a
lookup against a later version falls back to "no bitset ⇒ candidate"
for unindexed files, exactly the zone-map fallback discipline.

Reference parity: none (lakehouse extension; the reference's MySQL
relies on B-tree indexes, `SQL/create-TCRDv7.sql` KEY clauses — this
is the immutable-file analogue).
"""

from __future__ import annotations

import json
import os
import urllib.parse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tcrd_spark.sources.snapshots import (
    _data_dir, _read_manifest, versions,
)

K_HASHES = 4
BITS_PER_KEY = 10  # ~1% fp at k=4
M_MIN, M_MAX = 1 << 13, 1 << 21  # 1 KiB .. 256 KiB per file


def _index_path(table_dir: str, col: str, version: int) -> str:
    return os.path.join(
        table_dir, "_index", f"bloom-{col}-v{version:05d}.json"
    )


def _bit_positions(col, m_bits: int, k: int):
    """k engine-side hash positions for one value (seeded xxhash64)."""
    return F.array(
        *[
            F.pmod(F.xxhash64(F.lit(i), col), F.lit(m_bits))
            for i in range(k)
        ]
    )


def _pack(bits: list[int], m_bits: int) -> str:
    """Bit positions → hex bitset (m_bits/4 hex chars)."""
    n = 0
    for b in bits:
        n |= 1 << int(b)
    return f"{n:0{m_bits // 4}x}"


def _auto_m_bits(paths: list[str]) -> int:
    """Size the filter from the BIGGEST file's footer row count
    (~BITS_PER_KEY bits per key, power of two, clamped): a fixed m
    silently saturates on large files — 12k keys in 8k bits admits a
    third of the snapshot per probe instead of ~1 file (measured,
    tools/bloom_bench.py). Footers only; no data read."""
    import pyarrow.parquet as pq

    max_rows = max(
        (pq.ParquetFile(p).metadata.num_rows for p in paths), default=1
    )
    m = M_MIN
    while m < max_rows * BITS_PER_KEY and m < M_MAX:
        m <<= 1
    return m


def build_bloom_index(
    spark: SparkSession,
    table_dir: str,
    col: str,
    version: int | None = None,
    m_bits: int | None = None,
    k: int = K_HASHES,
) -> str:
    """Build and publish the per-file bloom index for `col` over one
    snapshot; returns the index path. `m_bits=None` auto-sizes from
    footer row counts."""
    vs = versions(table_dir)
    if not vs:
        raise FileNotFoundError(f"no versions at {table_dir}")
    v = vs[-1] if version is None else version
    m = _read_manifest(table_dir, v)
    base = _data_dir(table_dir)
    paths = [os.path.join(base, rel) for rel in m["files"]]
    if m_bits is None:
        m_bits = _auto_m_bits(paths)
    src = (
        spark.read.option("basePath", base)
        .option("mergeSchema", "true")
        .parquet(*paths)
    )
    dtype = src.schema[col].dataType.simpleString()
    df = (
        src.select(
            F.input_file_name().alias("_f"),
            F.explode(_bit_positions(F.col(col), m_bits, k)).alias("_p"),
        )
        .groupBy("_f")
        .agg(F.collect_set("_p").alias("_bits"))
    )
    absbase = os.path.abspath(base)
    filters: dict[str, str] = {}
    for r in df.collect():
        # input_file_name() is a file: URI (percent-encoded)
        path = urllib.parse.urlparse(urllib.parse.unquote(r._f)).path
        rel = os.path.relpath(path, absbase)
        filters[rel] = _pack(r._bits, m_bits)
    out = _index_path(table_dir, col, v)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    tmp = out + ".tmp"
    with open(tmp, "w") as f:
        json.dump(
            {"col": col, "version": v, "m_bits": m_bits, "k": k,
             "dtype": dtype, "filters": filters},
            f, sort_keys=True,
        )
    os.rename(tmp, out)  # derived artifact: last-writer-wins is fine
    return out


def _probe_positions(
    spark: SparkSession, value, dtype: str, m_bits: int, k: int
) -> list[int]:
    """Hash the probe literal through the engine (1-row job) so the
    probe and the build can never disagree on a hash. The literal is
    CAST to the indexed column's type first — xxhash64 is
    type-sensitive (int 5 and bigint 5 hash differently), so an uncast
    Python literal would silently false-negative every lookup."""
    row = spark.range(1).select(
        _bit_positions(F.lit(value).cast(dtype), m_bits, k).alias("p")
    ).head()
    return [int(p) for p in row.p]


def bloom_candidate_files(
    spark: SparkSession,
    table_dir: str,
    col: str,
    value,
    version: int | None = None,
) -> tuple[list[str], int]:
    """Files of `version` that may contain col == value, plus the
    snapshot's total file count. Files without a bitset (added after
    the index was built) are kept — pruning is only ever an IO
    optimization."""
    vs = versions(table_dir)
    v = vs[-1] if version is None else version
    m = _read_manifest(table_dir, v)
    # newest index at or before the requested snapshot
    idx = None
    for iv in range(v, 0, -1):
        p = _index_path(table_dir, col, iv)
        if os.path.exists(p):
            with open(p) as f:
                idx = json.load(f)
            break
    if idx is None:
        return list(m["files"]), len(m["files"])
    pos = _probe_positions(
        spark, value, idx["dtype"], idx["m_bits"], idx["k"]
    )
    kept = []
    for rel in m["files"]:
        hexset = idx["filters"].get(rel)
        if hexset is None:
            kept.append(rel)  # unindexed (post-index append): must scan
            continue
        bits = int(hexset, 16)
        if all((bits >> p) & 1 for p in pos):
            kept.append(rel)
    return kept, len(m["files"])


def point_lookup(
    spark: SparkSession,
    table_dir: str,
    col: str,
    value,
    version: int | None = None,
) -> DataFrame:
    """col == value over one snapshot, planning ONLY bloom-admitted
    files; the exact predicate is re-applied (pytest-pinned equal to
    the unpruned filter)."""
    from tcrd_spark.sources.snapshots import read_version

    vs = versions(table_dir)
    if not vs:
        raise FileNotFoundError(f"no versions at {table_dir}")
    v = vs[-1] if version is None else version
    kept, _total = bloom_candidate_files(spark, table_dir, col, value, v)
    pred = F.col(col) == F.lit(value)
    if not kept:
        return read_version(spark, table_dir, v).where(pred).limit(0)
    base = _data_dir(table_dir)
    cols = _read_manifest(table_dir, v)["columns"]
    return (
        spark.read.option("basePath", base)
        .option("mergeSchema", "true")
        .parquet(*[os.path.join(base, rel) for rel in kept])
        .where(pred)
        .select(*cols)  # manifest column order, same as read_version
    )
