"""Measure the Bloom file-skipping win: point lookups on a
high-cardinality unclustered key, with vs without the per-file index.

Builds a versioned orders lake of MANY files (one create + N disjoint
appends, so o_orderkey is unclustered and zone maps can't prune
equality probes), builds the bloom index, then times K point lookups

  (a) bloom: bloom_candidate_files + read of the admitted files;
  (b) full:  read_version + filter (every file opened).

Also reports the planning-side economics: files admitted per probe vs
snapshot total (the IO a 100 TB cluster would NOT do).

Usage: python tools/bloom_bench.py [sf_dir] [n_appends] [n_probes]
Writes only to a temp dir; prints a table for SCALE.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_appends = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    n_probes = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    from pyspark.sql import functions as F

    from tcrd_spark.session import get_spark
    from tcrd_spark.sources import bloomidx, snapshots as snap
    from tcrd_spark.sources.lake import load_table

    spark = get_spark("bloom_bench")
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix="bloom_bench_")
    table = os.path.join(root, "orders")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    m = n_appends + 1
    snap.create_table(
        orders.where(F.col("o_orderkey") % m == 0), table, "o_orderstatus"
    )
    for i in range(1, n_appends + 1):
        snap.append_version(
            table, orders.where(F.col("o_orderkey") % m == i)
        )
    t0 = time.time()
    idx_dir = bloomidx.build_bloom_index(spark, table, "o_orderkey")
    t_build = time.time() - t0
    import json

    with open(idx_dir + ".meta.json") as f:
        m_bits = json.load(f)["m_bits"]
    total_files = len(snap._read_manifest(
        table, snap.versions(table)[-1])["files"])

    keys = [r.o_orderkey for r in orders.limit(n_probes).collect()]
    # warm both paths once (plan/footers)
    bloomidx.point_lookup(spark, table, "o_orderkey", keys[0]).count()
    snap.read_version(spark, table).where(
        F.col("o_orderkey") == keys[0]).count()

    kept_counts, t_bloom, t_full = [], 0.0, 0.0
    for key in keys:
        kept, tot = bloomidx.bloom_candidate_files(
            spark, table, "o_orderkey", key
        )
        kept_counts.append(len(kept))
        t0 = time.time()
        n1 = bloomidx.point_lookup(
            spark, table, "o_orderkey", key).count()
        t_bloom += time.time() - t0
        t0 = time.time()
        n2 = (
            snap.read_version(spark, table)
            .where(F.col("o_orderkey") == key)
            .count()
        )
        t_full += time.time() - t0
        assert n1 == n2 and n1 >= 1, (key, n1, n2)

    print(f"snapshot files:        {total_files}")
    print(f"index build:           {t_build:.2f}s "
          f"({total_files} bitsets, {m_bits // 8192} KiB each)")
    print(f"files admitted/probe:  "
          f"{sum(kept_counts) / len(kept_counts):.1f} "
          f"(min {min(kept_counts)}, max {max(kept_counts)}) "
          f"of {total_files}")
    print(f"point lookup, bloom:   {t_bloom / n_probes * 1000:.0f} ms/probe")
    print(f"point lookup, full:    {t_full / n_probes * 1000:.0f} ms/probe")
    print(f"speedup:               {t_full / max(t_bloom, 1e-9):.1f}x; "
          f"IO fraction {sum(kept_counts) / (len(kept_counts) * total_files):.3f}")
    shutil.rmtree(root)
    return 0


if __name__ == "__main__":
    sys.exit(main())
