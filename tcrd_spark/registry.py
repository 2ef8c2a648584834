"""Central query registry: collects QUERIES/ORACLE from every module.

`__spark_entry__.py` (the driver contract) is a thin shim over this.
Each query name appears in exactly one module; a name collision is a
bug and raises at import time.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_MODULES = []


def _collect():
    from tcrd_spark.operators import aggregates, joins, scans, setops, windows
    from tcrd_spark.functions import scalars

    mods = [scans, joins, aggregates, windows, setops, scalars]
    for name in ("graph",):
        try:
            from tcrd_spark.operators import graph as _g

            mods.append(_g)
        except ImportError:
            pass
    for modname in ("analytics.testdata_queries", "pipeline.testdata_queries",
                    "pipeline.multimodal", "streaming.testdata_queries",
                    "api.testdata_queries"):
        try:
            import importlib

            mods.append(importlib.import_module(f"tcrd_spark.{modname}"))
        except ImportError:
            pass

    queries: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracle: dict[str, str] = {}
    for mod in mods:
        for k, v in getattr(mod, "QUERIES", {}).items():
            if k in queries:
                raise ValueError(f"duplicate query name {k!r} in {mod.__name__}")
            queries[k] = v
        for k, v in getattr(mod, "ORACLE", {}).items():
            if k in oracle:
                raise ValueError(f"duplicate oracle name {k!r} in {mod.__name__}")
            oracle[k] = v
    # every oracle key must have a query; not every query needs an oracle
    # (non-SQL-expressible ops get the driver's weaker rows-only check)
    missing = set(oracle) - set(queries)
    if missing:
        raise ValueError(f"oracle entries without queries: {missing}")
    return queries, oracle


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _collect()[0]


def all_oracle_sql() -> dict[str, str]:
    return _collect()[1]
