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
# DuckDB oracle, so ordering is evidence budget. Round-7 rotation
# (mechanical via tests/test_registry.py): the cap takes
#   (a) the 21 round-6 post-cap additions — sweep- and sf0.1-verified
#       but never driver-adjudicated (their new-query grace expired
#       when CORRECTNESS_r06.json was committed),
#   (b) the 15 churn-stale queries the closure reports: graph.py
#       changed in round 6 (pagerank landed there) after these queries'
#       last green, and `_truncate` made graph.py part of the corpus
#       family's closure (decoupled this round via operators/lineage.py),
#   (c) queries whose closure round 7 touches (graph.py/corpus.py/
#       bpe.py `_truncate` split + unpersist fix → pagerank and the
#       corpus family; scd.py grows scd2_apply_batch),
#   (d) queries NEW in round 7 (corpus_pipeline_v2, scd2_apply_batch).
# Four small corpus-family queries implicated by (c) did not fit the
# 50-slot cap and defer to the round-8 obligation under the one-round
# grace: sample_stratified, quality_quantile_filter, vocab_topk,
# line_dedup. The pytest oracle sweep still re-hash-matches every
# registered query against DuckDB on every run, so past-cap (or
# deferred) never means unverified.
PRIORITY = (
    # (a) round-6 additions, never driver-adjudicated
    "dsir_weights",
    "dsir_sample",
    "cube_counts",
    "grouping_sets_mix",
    "unpivot_metrics",
    "winnow_fingerprints",
    "association_rules",
    "group_ols",
    "scd2_history",
    "rolling_anomaly",
    "merge_intervals",
    "winsorize_values",
    "attribution_touch",
    "triangle_counts",
    "embedding_meanpool",
    "dedup_containment",
    "rrf_fusion",
    "mmr_rerank",
    "welch_ttest",
    "chi2_independence",
    "event_transitions",
    # (b) churn-stale: graph.py changed in r6 after these greens
    "bpe_pair_counts",
    "qualitative_levels",
    "clique_expansion",
    "tau_ordinal",
    "tinx_pmid_rankings",
    "tdl_refresh_delta",
    "apsp_min_merge",
    "nearest_flagged",
    "ancestor_closure",
    "tdl_classification",
    "tau_continuous",
    "consensus_expression",
    "hgram_cdf",
    "tinx_novelty",
    "tinx_importance",
    # (c) closure touched in round 7 (lineage split, scd growth)
    "pagerank",
    "dedup_groups_cc",
    "dedup_rep_quality",
    "dedup_incremental",
    "dedup_incremental_indexed",
    "dedup_incremental_lsh",
    "semantic_dedup_pairs",
    "semantic_dedup",
    "corpus_pipeline",
    "corpus_shard_assign",
    "sequence_pack",
    "decontaminate",
    # (d) NEW round 7 queries
    "corpus_pipeline_v2",
    "scd2_apply_batch",
    # ---- past the driver's 50-query cap: every entry holds a green
    # driver CORRECTNESS row from a prior round under unchanged code,
    # except the four deferred corpus-family queries listed above
    # (r6-green; one-round grace; head of the r8 cap) ----
    "sample_stratified",
    "quality_quantile_filter",
    "vocab_topk",
    "line_dedup",
    "lm_perplexity",
    "lm_top_bigrams",
    "nb_classify",
    "mixture_weights",
    "domain_mixture_sample",
    "domain_mixture_exact",
    "decontaminate_bloom",
    "ann_sq_topk",
    "ann_ivfsq",
    "zorder_values",
    "merge_upsert",
    "cohort_retention",
    "asof_join_events",
    "range_join_events",
    "funnel_stages",
    "sessionize_events",
    "gopher_repetition",
    "gopher_quality_filter",
    "substring_dedup",
    "substring_excise",
    "substring_dedup_incremental",
    "ann_pq_topk",
    "ann_ivfpq",
    "ann_pq_rerank",
    "zorder_sampled",
    "ccnet_buckets",
    "bm25_search",
    "kmv_distinct",
    "theta_sketch_ops",
    "cms_heavy_hitters",
    "winnow_candidate_pairs",
    "dedup_edit_distance",
    "corpus_divergence",
    "skyline_parts",
    "topk_per_group",
    "decile_bucketing",
    "rank_compound_order",
    "mode_consensus",
    "frank_level_buckets",
    "min_tie_expansion",
    "dedup_simhash_pairs",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "corpus_clean",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "multimodal_features",
    "window_tumbling",
    "window_session",
    "nested_document",
    "wide_export",
    "pivot_wide",
    "grouped_set_agg",
    "scan_project_filter",
    "three_way_entity_join",
    "semi_join",
    "anti_join_notfnd",
    "union_dedup",
    "filter_like_null",
    "keyset_pagination",
    "lookup_point_join",
    "bridge_m2n_join",
    "pricing_summary",
    "beans_counts",
    "rollup_counts",
    "group_sum",
    "intersect_sets",
    "except_sets",
    "distinct_projection",
    "dedup_composite_key",
    "string_math_funcs",
    "json_case_funcs",
    "sessionize_skew",
    "asof_join_segmented",
    "profile_documents",
    "window_sliding",
    "text_clean_pii",
    "type_histogram",
    "median_per_group",
    "mean_std_population",
    "date_funcs",
    "text_stats",
    "text_quality",
    "lang_id",
    "entity_tagging",
    "dedup_exact",
    "ann_bruteforce",
    "kmeans_assign",
    "ann_ivf_indexed",
    "shipping_priority",
    "fallback_join_cascade",
    "self_join_common",
    "ann_ivf",
    # ---- NEW in round 7 past the cap (new-query grace until the next
    # adjudication; sweep-verified every run; head of the r8 cap) ----
    "session_durations",
    "tfidf_topterms",
    "hard_negatives",
    "leakage_safe_split",
    "chunk_documents",
    "window_rank_funcs",
    "classifier_quality_gate",
    "asof_forward_events",
)


def _collect():
    from tcrd_spark.operators import (
        aggregates,
        joins,
        scans,
        setops,
        temporal,
        temporal_skew,
        windows,
    )
    from tcrd_spark.functions import scalars

    mods = [scans, joins, aggregates, windows, setops, temporal,
            temporal_skew, scalars]
    for name in ("graph",):
        try:
            from tcrd_spark.operators import graph as _g

            mods.append(_g)
        except ImportError:
            pass
    for modname in ("operators.olap_ext", "operators.basket",
                    "operators.skyline", "operators.regress",
                    "operators.scd", "operators.analytic_ext",
                    "operators.attribution", "operators.triangles",
                    "operators.stats", "operators.sessions_ext",
                    "operators.window_ext", "operators.temporal_ext",
                    "analytics.testdata_queries", "pipeline.testdata_queries",
                    "pipeline.corpus_queries", "pipeline.corpus_v2",
                    "pipeline.substring",
                    "pipeline.bpe", "pipeline.gopher", "pipeline.lm",
                    "pipeline.nbayes", "pipeline.mixture",
                    "pipeline.bloom", "pipeline.sq", "pipeline.pq",
                    "pipeline.semdedup", "pipeline.ccnet",
                    "pipeline.bm25", "pipeline.dsir",
                    "pipeline.sketches", "pipeline.winnow",
                    "pipeline.tfidf", "pipeline.negatives",
                    "pipeline.splits", "pipeline.chunker",
                    "pipeline.clf_gate",
                    "pipeline.editdist", "pipeline.divergence",
                    "pipeline.pooling", "pipeline.containment",
                    "pipeline.fusion", "pipeline.mmr",
                    "sources.zorder", "sources.merge",
                    "pipeline.multimodal", "streaming.testdata_queries",
                    "api.testdata_queries", "quality.testdata_queries"):
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
