"""Per-query wall-time decomposition for optimization work (guide §1).

For each query prints:
    build   — Python/py4j DataFrame construction time (driver only)
    first   — first noop-sink run (analysis + optimization + codegen
              + execution, cold plan)
    warm    — min of N-1 further noop runs (re-optimization +
              execution; analysis of the cached DataFrame is reused)

`first - warm` bounds the one-off plan/codegen cost; `build` is pure
driver py4j overhead; `warm` is the repeatable cost the bench's
min-of-3 reports.

Usage:
    python tools/prof_bench.py [sf_dir] [query ...]
    python tools/prof_bench.py [sf_dir] --top N   # top-N from plans/r11/bench_before.json
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        args = args[1:]
    reps = int(os.environ.get("PROF_REPS", "3"))

    from tcrd_spark.registry import all_queries
    from tcrd_spark.session import get_spark

    queries = all_queries()
    if args and args[0] == "--top":
        n = int(args[1])
        base = json.load(open(os.path.join(REPO, "plans", "r11", "bench_before.json")))
        names = [k for k, _ in sorted(base["queries"].items(), key=lambda kv: -kv[1])[:n]]
    else:
        names = args or sorted(queries)

    spark = get_spark("prof")
    spark.sparkContext.setLogLevel("ERROR")
    # warm JVM + parquet footers
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    bench_mode = os.environ.get("PROF_BENCH_MODE", "") == "1"
    rows = []
    for name in names:
        if name not in queries:
            print(f"?? {name}: not registered")
            continue
        spark.sparkContext.setJobDescription(f"prof:{name}")
        if bench_mode:
            # bench.py semantics: rebuild + execute per rep, min-of-N,
            # but report build and exec of each rep separately
            per = []
            for _ in range(reps):
                t0 = time.time()
                df = queries[name](spark, sf_dir)
                tb = time.time() - t0
                t0 = time.time()
                df.write.format("noop").mode("overwrite").save()
                per.append((tb, time.time() - t0))
            best = min(b + e for b, e in per)
            detail = "  ".join(f"[{b:.2f}+{e:.2f}]" for b, e in per)
            rows.append((name, best, 0.0, 0.0))
            print(f"{name:32s} bench={best:7.3f}  reps: {detail}", flush=True)
            spark.sparkContext.setJobDescription(None)
            continue
        t0 = time.time()
        df = queries[name](spark, sf_dir)
        t_build = time.time() - t0
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t_first = time.time() - t0
        t_warm = float("inf")
        for _ in range(max(1, reps - 1)):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t_warm = min(t_warm, time.time() - t0)
        rows.append((name, t_build, t_first, t_warm))
        print(f"{name:32s} build={t_build:7.3f}  first={t_first:7.3f}  "
              f"warm={t_warm:7.3f}", flush=True)
        spark.sparkContext.setJobDescription(None)
    if bench_mode:
        print("\nTOTAL bench-like=%.2f" % sum(r[1] for r in rows))
    else:
        print("\nTOTALS  build=%.2f first=%.2f warm=%.2f (bench-like=build+min(first,warm))"
              % (sum(r[1] for r in rows), sum(r[2] for r in rows),
                 sum(r[3] for r in rows)))


if __name__ == "__main__":
    main()
