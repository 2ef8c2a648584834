"""CLI query/export tool — the `python/tcrd_app.py` + `python/
tcrd2csv.py` surface over a parquet lake.

Usage:
  python tools/tcrd_query.py --lake DIR find-targets sym=EGFR tdl=Tclin
  python tools/tcrd_query.py --lake DIR get-target 123 [--json]
  python tools/tcrd_query.py --lake DIR beans
  python tools/tcrd_query.py --lake DIR export [--out targets.csv]

find-targets takes the reference's key=value conjunctions
(`python/tcrd_app.py:87-148` → `find_targets` `loaders/TCRD.py:
2244-2298`); get-target prints the nested target document as JSON
(lifecycle A); export writes the tcrd2csv-style wide CSV (lifecycle
B). One Spark plan per command — never a per-entity fan-out.
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--lake", required=True, help="parquet lake directory")
    sub = ap.add_subparsers(dest="cmd", required=True)

    ft = sub.add_parser("find-targets")
    ft.add_argument("criteria", nargs="+", help="key=value pairs")

    gt = sub.add_parser("get-target")
    gt.add_argument("target_id", type=int)

    sub.add_parser("beans")

    ex = sub.add_parser("export")
    ex.add_argument("--out", default="-", help="CSV path or - for stdout")

    args = ap.parse_args(argv)

    from tcrd_spark.api import adaptor
    from tcrd_spark.session import get_spark
    from tcrd_spark.sources.lake import load_lake

    spark = get_spark("tcrd_query")
    spark.sparkContext.setLogLevel("ERROR")
    lake = load_lake(spark, args.lake)

    if args.cmd == "find-targets":
        criteria = dict(kv.split("=", 1) for kv in args.criteria)
        ids = adaptor.find_targets(lake, **criteria)
        for r in ids.orderBy("target_id").collect():
            print(r.target_id)
    elif args.cmd == "get-target":
        docs = adaptor.target_documents(lake, target_ids=[args.target_id])
        for row in docs.toJSON().collect():
            print(row)
    elif args.cmd == "beans":
        for r in adaptor.get_beans(lake).orderBy(
            "table_name", "type"
        ).collect():
            print(f"{r.table_name}\t{r.type or ''}\t{r.ct}")
    elif args.cmd == "export":
        wide = adaptor.export_wide_csv_df(lake)
        if args.out == "-":
            pdf = wide.orderBy("target_id").toPandas()
            pdf.to_csv(sys.stdout, index=False)
        else:
            # distributed write: one CSV directory per the Spark
            # convention (coalesce for a single part at small scale)
            wide.coalesce(1).write.mode("overwrite").option(
                "header", True
            ).csv(args.out)
            print(f"wrote {args.out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
