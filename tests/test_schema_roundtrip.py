"""Every declared table schema must round-trip the lake format:
empty-DF create → parquet write → read → schema equality. Catches
malformed StructTypes (reserved column names, unsupported types) for
the ~50 tables the fixture lake doesn't instantiate."""

from __future__ import annotations

from tcrd_spark.schema.tables import TABLE_SCHEMAS


def test_all_schemas_roundtrip_parquet(spark, tmp_path):
    # all 77 reference v7 tables (`SQL/create-TCRDv7.sql`) plus the six
    # loader-defined ones (tiga/tiga_provenance/grant/virus/viral_*)
    assert len(TABLE_SCHEMAS) == 83
    from concurrent.futures import ThreadPoolExecutor

    def roundtrip(item):
        name, schema = item
        df = spark.createDataFrame([], schema).coalesce(1)
        path = str(tmp_path / f"{name}.parquet")
        df.write.mode("overwrite").parquet(path)
        back = spark.read.parquet(path)
        # parquet reads are always nullable — compare names + types
        got = [(f.name, f.dataType) for f in back.schema.fields]
        want = [(f.name, f.dataType) for f in schema.fields]
        assert got == want, name

    # 83 independent write+read jobs: submit concurrently (Spark
    # schedules jobs from multiple threads fine) — the test is
    # commit-latency-bound, not work-bound
    with ThreadPoolExecutor(32) as ex:
        list(ex.map(roundtrip, TABLE_SCHEMAS.items()))


NUMERIC_ID_COLS = {
    "id", "target_id", "protein_id", "protein1_id", "protein2_id",
    "nhprotein_id", "dataset_id", "pubmed_id", "gat_id", "tclin_id",
    "disease_id", "importance_id", "clinvar_phenotype_id",
    "panther_class_id", "pid1", "pid2",
}


def test_numeric_id_columns_are_long(spark):
    """Surrogate ids are 60-bit md5 prefixes — every numeric id/FK
    column must be LongType so ids never truncate. (Ontology FKs like
    doid/uberon_id/go_id are natural string keys and excluded.)"""
    from pyspark.sql.types import LongType

    for name, schema in TABLE_SCHEMAS.items():
        for f in schema.fields:
            if f.name in NUMERIC_ID_COLS:
                assert f.dataType == LongType(), f"{name}.{f.name}"
