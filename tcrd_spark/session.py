"""SparkSession factory with scale-oriented defaults.

Tuned for the test harness (local[N], 32 shuffle partitions) but every
setting is the one you'd want on a 1000-executor cluster too: AQE for
runtime re-planning + skew-join splitting, Arrow for the few pandas_udf
paths, and a broadcast threshold that lets every dimension table
(region/nation/supplier/type-dictionaries) broadcast instead of shuffle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "tcrd_spark", master: str | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime coalescing of shuffle partitions + skew-join splitting.
        # At 100 TB hub-protein joins (ppi/lincs analogues) are skewed; AQE
        # splits oversized partitions without manual salting in most cases.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", "32")
        # Dimension tables (≤25 rows here; ≤20k targets in the reference)
        # must broadcast — never shuffle a fact table to join a dim.
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        # Arrow batches for the pandas_udf paths (erf CDF, minhash, ANN).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # driver testdata stores events.ts as parquet TIMESTAMP(NANOS);
        # read as long and rebuild micros in load_table (lake.py)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    # local parallelize() slicing: createDataFrame of an N-row fixture
    # otherwise fans into <cores> near-empty partitions and every tiny
    # action pays a full task wave. Parquet readers are unaffected.
    # The pytest harness sets this low (tests/conftest.py); production
    # keeps Spark's default (= total cores).
    dp = os.environ.get("SPARK_GRAFT_DEFAULT_PARALLELISM")
    if dp:
        builder = builder.config("spark.default.parallelism", dp)
    return builder.getOrCreate()
