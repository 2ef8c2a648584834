"""Central query registry: collects QUERIES/ORACLE from every module.

`__spark_entry__.py` (the driver contract) is a thin shim over this.
Each query name appears in exactly one module; a name collision is a
bug and raises at import time.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_MODULES = []

# The driver adjudicates only the FIRST 50 registry entries against the
# DuckDB oracle, so ordering is evidence budget. Rounds 1+2 together
# drove every one of the 65 registered queries green at least once;
# round 3 rotates ten twice-green micro-queries out of the cap in
# favor of the round-1-only entries, so every query's LATEST
# adjudication is at most one round old (VERDICT r2 next-step #7).
# The three round-2 hash-typed queries (consensus_expression,
# dedup_simhash, nested_document) stay in-cap so their oracle-cast
# fixes get adjudicated.
PRIORITY = (
    # scans / filters / joins
    "scan_project_filter",
    "three_way_entity_join",
    "semi_join",
    "anti_join_notfnd",
    "union_dedup",
    "fallback_join_cascade",
    "filter_like_null",
    "keyset_pagination",
    "lookup_point_join",
    "self_join_common",
    "bridge_m2n_join",
    # aggregation
    "pricing_summary",
    "beans_counts",
    "rollup_counts",
    "group_sum",
    "mode_consensus",
    "min_tie_expansion",
    "pivot_wide",
    "grouped_set_agg",
    # windows / set ops / dedup
    "rank_compound_order",
    "topk_per_group",
    "decile_bucketing",
    "frank_level_buckets",
    "intersect_sets",
    "except_sets",
    "distinct_projection",
    "dedup_composite_key",
    # scalar function families
    "string_math_funcs",
    "json_case_funcs",
    # graph / recursive
    "apsp_min_merge",
    "nearest_flagged",
    "ancestor_closure",
    # business-logic analytics
    "tdl_classification",
    "tau_continuous",
    "consensus_expression",
    "hgram_cdf",
    "tinx_novelty",
    "tinx_importance",
    # text / LLM pipeline (the prefix-filtered/banded dedup family and
    # the REWRITTEN blocked embedding plan keep their slots; the pure
    # column-expression text queries rotate out)
    "corpus_clean",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "dedup_embedding_cosine",
    "ann_ivf",
    "multimodal_features",
    # streaming window semantics (batch-equivalent)
    "window_tumbling",
    "window_session",
    # API lifecycles (the reference's two most important entry points)
    "nested_document",
    "wide_export",
    # ---- past the driver's 50-query cap: all green in r01/r02 under
    # unchanged code; every operator also pytest-covered ----
    "qualitative_levels",
    "type_histogram",
    "median_per_group",
    "mean_std_population",
    "date_funcs",
    "clique_expansion",
    "tau_ordinal",
    "tinx_pmid_rankings",
    "text_stats",
    "text_quality",
    "lang_id",
    "entity_tagging",
    "dedup_exact",
    "ann_bruteforce",
    "window_sliding",
    "text_clean_pii",
)


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
    lost = [n for n in PRIORITY if n not in queries]
    if lost:
        raise ValueError(f"PRIORITY names without queries: {lost}")
    # priority names first (driver checks the first 50), rest in
    # module-collection order
    q_ordered = {n: queries[n] for n in PRIORITY}
    q_ordered.update((k, v) for k, v in queries.items() if k not in q_ordered)
    o_ordered = {n: oracle[n] for n in PRIORITY if n in oracle}
    o_ordered.update((k, v) for k, v in oracle.items() if k not in o_ordered)
    return q_ordered, o_ordered


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _collect()[0]


def all_oracle_sql() -> dict[str, str]:
    return _collect()[1]
