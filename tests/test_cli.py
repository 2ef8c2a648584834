"""CLI surface (tools/tcrd_query.py) over a parquet lake round-trip."""

from __future__ import annotations

import pytest

from tests.tcrd_fixtures import build_lake


@pytest.fixture(scope="module")
def lake_dir(spark, tmp_path_factory):
    from concurrent.futures import ThreadPoolExecutor

    d = tmp_path_factory.mktemp("lake")

    def write(item):
        name, df = item
        # coalesce(1): a 6-row local DataFrame otherwise writes as 32
        # near-empty tasks, and each such job monopolizes the local
        # scheduler — 1 task per write lets the jobs truly overlap
        df.coalesce(1).write.mode("overwrite").parquet(
            str(d / f"{name}.parquet")
        )

    # ~45 independent tiny writes: submit concurrently — commit
    # latency, not work, dominates
    with ThreadPoolExecutor(24) as ex:
        list(ex.map(write, build_lake(spark).items()))
    return str(d)


def test_cli_find_targets_and_beans(spark, lake_dir, capsys):
    from tools.tcrd_query import main

    assert main(["--lake", lake_dir, "find-targets", "sym=SYM3"]) == 0
    out1 = capsys.readouterr().out.strip().splitlines()
    assert out1 == ["3"]

    assert main(["--lake", lake_dir, "beans"]) == 0
    out2 = capsys.readouterr().out
    assert "protein\t" in out2 and "xref\t" in out2


def test_cli_get_target_and_export(spark, lake_dir, capsys):
    import json

    from tools.tcrd_query import main

    assert main(["--lake", lake_dir, "get-target", "1"]) == 0
    doc = json.loads(capsys.readouterr().out.strip())
    assert doc["target_id"] == 1
    assert "tdl_infos" in doc

    assert main(["--lake", lake_dir, "export"]) == 0
    csv_out = capsys.readouterr().out.splitlines()
    header = csv_out[0]
    # tcrd2csv --expand header columns (python/tcrd2csv.py:45-47)
    assert "TCRD ID" in header
    assert "Top 5 TIN-X Importance(s)" in header
    assert len(csv_out) > 1


def test_cli_counts_and_lists(spark, lake_dir, capsys):
    from tools.tcrd_query import main

    # fixture targets carry no stored tdl (TDL is a computed analytic)
    assert main(["--lake", lake_dir, "tdl-counts"]) == 0
    tdl = dict(
        line.split("\t") for line in capsys.readouterr().out.strip().splitlines()
    )
    assert tdl == {"None": "6"}

    assert main(["--lake", lake_dir, "list-xref-types"]) == 0
    xt = capsys.readouterr().out.strip().splitlines()
    assert xt == sorted(xt) and len(xt) >= 2

    assert main(["--lake", lake_dir, "list-targets"]) == 0
    rows = capsys.readouterr().out.strip().splitlines()
    assert len(rows) == 6 and rows[0].startswith("1\tT1")
    assert main(["--lake", lake_dir, "list-targets", "--tdl", "Tclin"]) == 0
    assert capsys.readouterr().out.strip() == ""

    assert main(["--lake", lake_dir, "idgfam-counts"]) == 0
    assert capsys.readouterr().out.strip()

    assert main(["--lake", lake_dir, "info"]) == 0
    assert "target" in capsys.readouterr().out


def test_cli_find_by_xref(spark, lake_dir, capsys):
    from pyspark.sql import functions as F

    from tools.tcrd_query import main

    # pick a real protein-attached xref from the fixture
    xr = (
        spark.read.parquet(f"{lake_dir}/xref.parquet")
        .filter(F.col("protein_id").isNotNull())
        .select("xtype", "value")
        .first()
    )
    assert main(["--lake", lake_dir, "find-targets-by-xref", xr.xtype, xr.value]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out and all(line.isdigit() for line in out)


def test_cli_find_targets_batch(spark, lake_dir, capsys, tmp_path):
    from tools.tcrd_query import main

    qfile = tmp_path / "queries.txt"
    qfile.write_text("SYM2\nNOPE\nSYM5\n")
    assert main(
        ["--lake", lake_dir, "find-targets-batch", str(qfile), "--qtype", "sym"]
    ) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out == ["SYM2\t2", "NOPE\tNOTFOUND", "SYM5\t5"]


def test_corpus_build_cli_end_to_end(spark, tmp_path, capsys):
    """The corpus-build CLI: staged, resumable, produces the sharded
    tree + report; kept set equals the adjudicated corpus_pipeline
    query's; a rerun reuses every stage (report identical)."""
    import json
    import os

    from tools.corpus_build import build

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    out = str(tmp_path / "corpus")
    report = build(spark, sf_dir, out, n_shards=4)
    assert report["03_layout"] > 0
    shards = spark.read.parquet(os.path.join(out, "shards"))
    assert shards.count() == report["03_layout"]

    from tcrd_spark.pipeline.corpus_queries import q_corpus_pipeline

    want = {r["doc_id"] for r in q_corpus_pipeline(spark, sf_dir).collect()}
    got = {r["doc_id"] for r in shards.collect()}
    assert got == want

    report2 = build(spark, sf_dir, out, n_shards=4)
    assert report2 == report


def test_lake_admin_surface(spark, sf_dir, tmp_path, capsys):
    """lake history/diff/changes/optimize/vacuum over a versioned
    table — the DESCRIBE HISTORY / table_changes CLI shape."""
    from pyspark.sql import functions as F

    from tcrd_spark.sources import snapshots as snap
    from tcrd_spark.sources.lake import load_table
    from tools.tcrd_query import main

    table = str(tmp_path / "t")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    ).limit(200)
    snap.create_table(orders, table, "o_orderstatus")
    src = orders.where("o_orderstatus = 'F'").limit(5).withColumn(
        "o_totalprice", F.col("o_totalprice") + 1.0
    )
    snap.merge_version(spark, table, src, ["o_orderkey"])

    assert main(["--lake", table, "lake", "history"]) == 0
    out = capsys.readouterr().out
    assert "v1\top=create" in out and "v2\top=merge" in out

    assert main(["--lake", table, "lake", "diff",
                 "--from", "1", "--to", "2"]) == 0
    out = capsys.readouterr().out
    assert "added\t" in out and "carried\t" in out

    assert main(["--lake", table, "lake", "changes",
                 "--from", "1", "--to", "2",
                 "--keys", "o_orderkey"]) == 0
    out = capsys.readouterr().out
    assert "update_pre" in out and "update_post" in out

    assert main(["--lake", table, "lake", "optimize"]) == 0
    assert "committed v3" in capsys.readouterr().out

    assert main(["--lake", table, "lake", "vacuum", "--keep", "1"]) == 0
    assert snap.versions(table) == [3]
