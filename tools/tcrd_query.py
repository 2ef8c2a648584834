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


def _lake_cmd(args) -> int:
    """Versioned-table administration over the manifest log — the
    DESCRIBE HISTORY / table_changes / OPTIMIZE / VACUUM surface."""
    from tcrd_spark.sources import snapshots as snap

    table = args.lake
    vs = snap.versions(table)
    if not vs:
        print(f"no versions at {table}", file=sys.stderr)
        return 1
    if args.action == "tag":
        if not args.name:
            print("--name required for tag", file=sys.stderr)
            return 1
        v = snap.tag_version(table, args.name, args.v_to)
        print(f"tagged {args.name} -> v{v}")
        return 0
    if args.action == "tags":
        for name, v in sorted(snap.list_tags(table).items()):
            print(f"{name}\tv{v}")
        return 0
    if args.action == "branch":
        from tcrd_spark.sources import branches as br

        if not args.name:
            print("--name required for branch", file=sys.stderr)
            return 1
        bdir = br.create_branch(table, args.name, args.v_to)
        print(f"branched {args.name} at v{br._branch_meta(bdir)['fork_version']}: {bdir}")
        return 0
    if args.action == "branches":
        from tcrd_spark.sources import branches as br

        for name, info in br.list_branches(table).items():
            print(f"{name}\tfork=v{info['fork_version']}\thead=v{info['head']}")
        return 0
    if args.action == "drop-branch":
        from tcrd_spark.sources import branches as br

        if not args.name:
            print("--name required for drop-branch", file=sys.stderr)
            return 1
        for f in br.delete_branch(table, args.name):
            print(f"removed\t{f}")
        return 0
    if args.action == "history":
        for v in vs:
            m = snap._read_manifest(table, v)
            print(
                f"v{v}\top={m['op']}\tts={m.get('ts', 0):.3f}\t"
                f"files={len(m['files'])}\tparent={m.get('parent')}"
                + (f"\ttxn={m['txn_id']}" if m.get("txn_id") is not None
                   else "")
            )
        return 0
    v_from = args.v_from if args.v_from is not None else vs[0]
    v_to = args.v_to if args.v_to is not None else vs[-1]
    if args.action == "diff":
        d = snap.manifest_diff(table, v_from, v_to)
        for kind in ("added", "removed", "carried"):
            for f in d[kind]:
                print(f"{kind}\t{f}")
        return 0
    from tcrd_spark.session import get_spark

    spark = get_spark("tcrd_query")
    spark.sparkContext.setLogLevel("ERROR")
    if args.action == "changes":
        if not args.keys:
            print("--keys required for changes", file=sys.stderr)
            return 1
        feed = snap.read_changes(
            spark, table, v_from, v_to, args.keys.split(",")
        )
        for r in feed.orderBy(*feed.columns).collect():
            print("\t".join(str(v) for v in r))
        return 0
    if args.action == "merge-branch":
        from tcrd_spark.sources import branches as br

        if not args.name:
            print("--name required for merge-branch", file=sys.stderr)
            return 1
        v = br.merge_branch(spark, table, args.name)
        print(f"merged {args.name} -> v{v}")
        return 0
    if args.action == "delete":
        if not args.predicate:
            print("--predicate required for delete", file=sys.stderr)
            return 1
        v, n = snap.delete_version(
            spark, table, args.predicate, mode=args.mode
        )
        print(f"v{v}\tdeleted={n}")
        return 0
    if args.action == "checkpoint":
        v = snap.checkpoint_manifests(table)
        print(f"checkpointed through v{v}")
        return 0
    if args.action == "restore":
        if args.v_to is None:
            print("--to (version) required for restore", file=sys.stderr)
            return 1
        v = snap.restore_version(table, args.v_to)
        print(f"restored v{args.v_to} as v{v}")
        return 0
    if args.action == "files":
        for r in snap.files_df(spark, table, args.v_to).orderBy(
            "file"
        ).collect():
            print(f"{r.file}	{r.partition}	{r.bytes}")
        return 0
    if args.action == "clone":
        from tcrd_spark.sources import branches as br

        if not args.dest:
            print("--dest required for clone", file=sys.stderr)
            return 1
        br.clone_table(table, args.dest)
        print(f"cloned -> {args.dest}")
        return 0
    if args.action == "repartition":
        if not args.name:
            print("--name (new partition column) required", file=sys.stderr)
            return 1
        v = snap.repartition_table(spark, table, args.name)
        print(f"committed v{v} (part_col={args.name})")
        return 0
    if args.action == "optimize":
        cluster = args.cluster_by.split(",") if args.cluster_by else None
        v = snap.optimize_version(spark, table, cluster_by=cluster)
        print(f"committed v{v}")
        return 0
    if args.action == "remove-orphans":
        for f in snap.remove_orphans(table):
            print(f"removed\t{f}")
        return 0
    if args.action == "vacuum":
        removed = snap.vacuum(table, keep_versions=args.keep)
        for f in removed:
            print(f"removed\t{f}")
        return 0
    return 2


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--lake", required=True, help="parquet lake directory")
    sub = ap.add_subparsers(dest="cmd", required=True)

    ft = sub.add_parser("find-targets")
    ft.add_argument("criteria", nargs="+", help="key=value pairs")

    fb = sub.add_parser("find-targets-batch")
    fb.add_argument("qfile", help="file of query values, one per line")
    fb.add_argument("--qtype", default="sym", help="lookup key (default sym)")

    fx = sub.add_parser("find-targets-by-xref")
    fx.add_argument("xtype")
    fx.add_argument("value")

    gt = sub.add_parser("get-target")
    gt.add_argument("target_id", type=int)

    sub.add_parser("beans")
    sub.add_parser("info")
    sub.add_parser("tdl-counts")
    sub.add_parser("idgfam-counts")
    sub.add_parser("list-xref-types")

    lt = sub.add_parser("list-targets")
    lt.add_argument("--tdl", default=None)
    lt.add_argument("--idgfam", default=None)

    ex = sub.add_parser("export")
    ex.add_argument("--out", default="-", help="CSV path or - for stdout")

    # versioned-lake administration: here --lake is the TABLE dir
    # (the directory create_table committed), not the sf parquet lake
    lk = sub.add_parser(
        "lake",
        help="versioned-table ops; --lake is the table directory",
    )
    lk.add_argument(
        "action",
        choices=["history", "diff", "changes", "optimize", "vacuum",
                 "tag", "tags", "delete", "branch", "branches",
                 "merge-branch", "drop-branch", "repartition",
                 "clone", "restore", "files", "remove-orphans",
                 "checkpoint"],
    )
    lk.add_argument("--from", dest="v_from", type=int, default=None)
    lk.add_argument("--to", dest="v_to", type=int, default=None)
    lk.add_argument("--keys", default=None, help="comma-joined key columns")
    lk.add_argument("--keep", type=int, default=2, help="vacuum retention")
    lk.add_argument("--name", default=None,
                    help="tag or branch name (tag/branch actions)")
    lk.add_argument("--predicate", default=None,
                    help="SQL predicate (delete action)")
    lk.add_argument("--mode", default="rewrite",
                    choices=["rewrite", "dv"],
                    help="delete mode: copy-on-write rewrite or "
                         "merge-on-read deletion vector")
    lk.add_argument("--cluster-by", default=None,
                    help="comma-joined OPTIMIZE ZORDER columns")
    lk.add_argument("--dest", default=None,
                    help="destination directory (clone action)")

    args = ap.parse_args(argv)

    if args.cmd == "lake":
        return _lake_cmd(args)

    from tcrd_spark.api import adaptor
    from tcrd_spark.session import get_spark
    from tcrd_spark.sources.lake import load_lake

    spark = get_spark("tcrd_query")
    spark.sparkContext.setLogLevel("ERROR")
    lake = load_lake(spark, args.lake)

    from pyspark.sql import functions as F

    if args.cmd == "find-targets":
        criteria = dict(kv.split("=", 1) for kv in args.criteria)
        ids = adaptor.find_targets(lake, **criteria)
        for r in ids.orderBy("target_id").collect():
            print(r.target_id)
    elif args.cmd == "find-targets-batch":
        # --qfile batch mode (`python/tcrd_app.py:133-146`): resolve
        # every query in ONE join instead of a per-line lookup loop
        with open(args.qfile) as fin:
            qs = [ln.strip() for ln in fin if ln.strip()]
        qdf = spark.createDataFrame([(q,) for q in qs], "q string")
        p = lake["protein"].select(
            F.col(args.qtype).cast("string").alias("q"), F.col("id")
        )
        hits = (
            qdf.join(p, "q", "left")
            .join(lake["t2tc"].withColumnRenamed("protein_id", "id"), "id", "left")
            .groupBy("q")
            .agg(F.sort_array(F.collect_set("target_id")).alias("tids"))
        )
        found = {r.q: r.tids for r in hits.collect()}
        for q in qs:  # preserve input order, like the reference loop
            tids = found.get(q) or []
            print(f"{q}\t" + (",".join(map(str, tids)) if tids else "NOTFOUND"))
    elif args.cmd == "find-targets-by-xref":
        ids = adaptor.find_targets_by_xref(lake, args.xtype, args.value)
        for r in ids.orderBy("target_id").collect():
            print(r.target_id)
    elif args.cmd == "info":
        # --info dashboard (`python/tcrd_app.py:102`): per-table counts,
        # the count_report oracle the build logs print
        from tcrd_spark.quality.provenance import count_report

        for r in count_report(lake).orderBy("table_name").collect():
            print(f"{r.table_name}\t{r.ct}")
    elif args.cmd == "tdl-counts":
        # `python/tcrd_app.py:104` --tdl_counts
        t = lake["target"].groupBy("tdl").count()
        for r in t.orderBy(F.desc("count"), F.asc("tdl")).collect():
            print(f"{r.tdl or 'None'}\t{r['count']}")
    elif args.cmd == "idgfam-counts":
        # `python/tcrd_app.py:105` --idgfam_counts
        t = lake["target"].groupBy("fam").count()
        for r in t.orderBy(F.desc("count"), F.asc("fam")).collect():
            print(f"{r.fam or 'None'}\t{r['count']}")
    elif args.cmd == "list-xref-types":
        # `python/tcrd_app.py:108` --list_xref_types → DISTINCT xtype
        # from the data (`loaders/TCRD.py:2610-2633`)
        for r in (
            lake["xref"].select("xtype").distinct().orderBy("xtype").collect()
        ):
            print(r.xtype)
    elif args.cmd == "list-targets":
        # `python/tcrd_app.py:107` --list_targets with --tdl/--idgfam
        t = lake["target"]
        if args.tdl:
            t = t.filter(F.col("tdl") == args.tdl)
        if args.idgfam:
            t = t.filter(F.col("fam") == args.idgfam)
        for r in t.select("id", "name", "tdl", "fam").orderBy("id").collect():
            print(f"{r.id}\t{r.name}\t{r.tdl or ''}\t{r.fam or ''}")
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
