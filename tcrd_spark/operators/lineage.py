"""Lineage-cut helper shared by every iterative algorithm.

Deliberately a LEAF module (imports nothing from tcrd_spark): corpus
connected-components, BPE training, and graph BFS all need the cut,
and an import edge through graph.py previously made graph churn stale
the whole corpus family under the registry's closure-based rotation
invariant (tests/test_registry.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _truncate(
    df: DataFrame, _caches: list | None = None, cache: bool = True
) -> DataFrame:
    """Cut the logical plan at this point (RDD round-trip, cached).

    Iterative algorithms build self-referential union/join chains whose
    Catalyst analysis cost grows EXPONENTIALLY with depth — by hop 5 the
    driver spends minutes analyzing, not computing. An opaque RDD scan
    resets analysis to O(1) per hop.

    The round-trip stays INSIDE the JVM: ``df._jdf.javaRDD()`` is the
    Dataset's RDD[Row] and ``createDataFrame(JavaRDD[Row], schema)``
    re-encodes it — no JVM→Python pickling. The old ``df.rdd`` path
    shipped every cut row out to the Python driver-side serializer and
    back (guide §4: every Python crossing pays transpose+serialize both
    ways); measured on a 100k-row window-derived cut this was 1.65s vs
    0.34s warm, and it tripled corpus/CC loop wall time. The pickle
    path remains as a fallback if the JVM accessors ever move.
    (localCheckpoint is NOT equivalent: unpersisting a local checkpoint
    loses the blocks permanently — CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND on
    re-read — while this cut's lineage survives unpersist.)

    The cached RDD is appended to ``_caches`` when given so the caller
    can unpersist it once a later cut is fully materialized (ADVICE r6:
    loops that never release superseded hop caches pin ~2 RDDs per hop
    for the whole session). Unpersisting is a perf decision, never a
    correctness one — the RDD lineage survives and recomputes on
    demand.

    ``cache=False`` skips persisting the cut RDD: right for strictly
    LINEAR chains (pagerank's per-iteration cut) where every cut is
    read exactly once by the single terminal action — caching there
    only costs storage-memory bookkeeping per hop.
    """
    spark = df.sparkSession
    try:
        jrdd = df._jdf.javaRDD()
        if cache:
            jrdd = jrdd.cache()
        out = DataFrame(
            spark._jsparkSession.createDataFrame(jrdd, df._jdf.schema()),
            spark,
        )
        handle = jrdd
    except Exception:  # pragma: no cover — internal-API drift fallback
        handle = df.rdd
        if cache:
            handle = handle.cache()
        out = spark.createDataFrame(handle, df.schema)
    if cache and _caches is not None:
        _caches.append(handle)
    return out


# one cached-cut handle per (application, slot) — see _truncate_rotating
_ROTATING: dict = {}


def _truncate_rotating(
    df: DataFrame, slot: str, _caches: list | None = None
) -> DataFrame:
    """``_truncate`` with BOUNDED session storage for callers that have
    no terminal action of their own (registered queries return lazy
    frames, so they can never unpersist "after the action"): when
    ``_caches`` is None, the previous cut cached under the same slot is
    unpersisted first — repeated invocations pin at most ONE cut per
    slot instead of one per call (ADVICE r11: video/image_near_dup_pairs
    accumulated a cached RDD per invocation for the session lifetime).
    Unpersisting the predecessor is a perf decision, never a correctness
    one: its lineage survives and recomputes on demand if a stale frame
    is still referenced. With ``_caches`` given, identical to
    ``_truncate(df, _caches)`` — the caller owns cleanup."""
    if _caches is not None:
        return _truncate(df, _caches)
    held: list = []
    out = _truncate(df, held)
    key = (df.sparkSession.sparkContext.applicationId, slot)
    prev = _ROTATING.pop(key, None)
    if prev is not None:
        try:
            prev.unpersist()
        except Exception:  # pragma: no cover — JVM handle already gone
            pass
    _ROTATING[key] = held[0]
    return out
