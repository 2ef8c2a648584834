"""SQL surface tests: views + temp functions agree with the DataFrame
implementations they mirror."""

from __future__ import annotations

import math


def test_views_and_functions(spark, sf_dir):
    from tcrd_spark.api.sql_surface import register_all

    names = register_all(spark, sf_dir)
    assert "tcrd_hash60" in names

    row = spark.sql(
        "SELECT tcrd_hash60('hello') AS h, "
        "tcrd_token_count('a b  c') AS tc, "
        "tcrd_stopword_hits('the cat and a hat') AS sw, "
        "tcrd_logistic_cdf(1.0, 0.0, 2.0) AS cdf, "
        "tcrd_level_bucket(60.0) AS lvl"
    ).collect()[0]
    import hashlib

    assert row.h == int(hashlib.md5(b"hello").hexdigest()[:15], 16)
    assert row.tc == 3
    assert row.sw == 3
    assert row.cdf == 1.0 / (1.0 + math.exp(-1.702 * 0.5))
    assert row.lvl == 2

    # views registered: SQL over the lake works end-to-end
    n = spark.sql("SELECT count(*) AS n FROM documents").collect()[0].n
    assert n > 0

    # SQL function matches the DataFrame-side fingerprint primitive
    from pyspark.sql import functions as F

    from tcrd_spark.functions.hashing import hash60

    df_side = (
        spark.sql("SELECT text FROM documents LIMIT 20")
        .select(hash60(F.col("text")).alias("h"))
        .collect()
    )
    sql_side = spark.sql(
        "SELECT tcrd_hash60(text) AS h FROM documents LIMIT 20"
    ).collect()
    assert sorted(r.h for r in df_side) == sorted(r.h for r in sql_side)


def test_provenance_and_count_report(spark):
    from tests.tcrd_fixtures import build_lake

    from tcrd_spark.quality.provenance import count_report, record_load

    lake = build_lake(spark)
    ds, prov = record_load(
        spark,
        name="fixture-load",
        source="synthetic",
        targets=[("xref", None, None), ("alias", "value", "type='symbol'")],
    )
    dsr = ds.collect()[0]
    assert dsr.name == "fixture-load"
    provs = prov.collect()
    assert {p.table_name for p in provs} == {"xref", "alias"}
    assert all(p.dataset_id == dsr.id for p in provs)
    # deterministic ids: re-running produces identical ids
    ds2, _ = record_load(
        spark, name="fixture-load", source="synthetic", targets=[("x", None, None)]
    )
    assert ds2.collect()[0].id == dsr.id

    report = {
        (r.table_name, r.type): r.ct for r in count_report(lake).collect()
    }
    assert report[("target", None)] == 6


def test_tinx_target_view(spark):
    from tests.tcrd_fixtures import build_lake

    from tcrd_spark.api.sql_surface import register_domain_views

    lake = build_lake(spark)
    names = register_domain_views(spark, lake)
    assert "tinx_target" in names
    rows = spark.sql(
        "SELECT target_id, protein_id, uniprot FROM tinx_target"
    ).collect()
    # only protein 11 has a tinx_novelty row (view's IN-subquery gate)
    assert [(r.target_id, r.protein_id, r.uniprot) for r in rows] == [
        (1, 11, "U00001")
    ]
