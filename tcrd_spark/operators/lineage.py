"""Lineage-cut helper shared by every iterative algorithm.

Deliberately a LEAF module (imports nothing from tcrd_spark): corpus
connected-components, BPE training, and graph BFS all need the cut,
and an import edge through graph.py previously made graph churn stale
the whole corpus family under the registry's closure-based rotation
invariant (tests/test_registry.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _truncate(df: DataFrame, _caches: list | None = None) -> DataFrame:
    """Cut the logical plan at this point (RDD round-trip, cached).

    Iterative algorithms build self-referential union/join chains whose
    Catalyst analysis cost grows EXPONENTIALLY with depth — by hop 5 the
    driver spends minutes analyzing, not computing. An opaque RDD scan
    resets analysis to O(1) per hop. (localCheckpoint would be the
    native way, but Spark 4.1 hits a rewriteStatsAndConstraints bug on
    window-derived plans.)

    The cached RDD is appended to ``_caches`` when given so the caller
    can unpersist it once a later cut is fully materialized (ADVICE r6:
    loops that never release superseded hop caches pin ~2 RDDs per hop
    for the whole session). Unpersisting is a perf decision, never a
    correctness one — the RDD lineage survives and recomputes on
    demand.
    """
    rdd = df.rdd.cache()
    if _caches is not None:
        _caches.append(rdd)
    return df.sparkSession.createDataFrame(rdd, df.schema)
