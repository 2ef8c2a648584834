"""Dump per-query `.explain("formatted")` output to individual files.

Usage:
    python tools/dump_plans.py <sf_dir> <outdir> <suffix> <query ...>

Writes <outdir>/<query>_<suffix>.txt for each query. Used to produce
the committed plans/r11/<query>_{before,after}.txt evidence files
(run from a worktree at the pre-change commit for "before").
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    sf_dir, outdir, suffix, *names = sys.argv[1:]
    os.makedirs(outdir, exist_ok=True)

    from tcrd_spark.registry import all_queries
    from tcrd_spark.session import get_spark

    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    for name in names:
        if name not in queries:
            print(f"?? {name}: not registered", flush=True)
            continue
        try:
            df = queries[name](spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as ex:  # keep going; a missing helper in old code
            txt = f"ERROR generating plan: {ex}\n"
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(txt)
        print(f"wrote {name}_{suffix}.txt ({len(txt)} bytes)", flush=True)


if __name__ == "__main__":
    main()
