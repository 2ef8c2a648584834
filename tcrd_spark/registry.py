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
# DuckDB oracle, so ordering is evidence budget. Round-8 rotation,
# computed by tools/rotate_cap.py (obligations from the same closure
# resolver the test_registry invariants use, filler oldest-green-first):
#   (a) the 9 round-7 post-cap additions (new-query grace expired when
#       CORRECTNESS_r07.json landed) + the reshaped embedding_meanpool
#       (the one r7 driver-err row — flat per-dim output now);
#   (b) the 4 corpus-family refreshers deferred from r7 under the
#       one-round grace (closure churn: pipeline/corpus.py);
#   (c) closure churn from this round's ADVICE fixes: scd.py (batch
#       guard) → scd2_history/scd2_apply_batch; triangles.py (memo
#       eviction) → triangle_counts;
#   (d) queries NEW in round 8;
#   (e) filler: the whole r4-green tier (oldest in the registry), then
#       the oldest r5 queries — no query's last adjudication ages past
#       3 rounds (MAX_STALE_ROUNDS in tools/rotate_cap.py).
# The pytest oracle sweep still re-hash-matches every registered query
# against DuckDB on every run, so past-cap never means unverified.
PRIORITY = (
    # (a) round-7 grace + the meanpool refit
    "asof_forward_events",
    "chunk_documents",
    "classifier_quality_gate",
    "embedding_meanpool",
    "hard_negatives",
    "leakage_safe_split",
    "session_durations",
    "tfidf_topterms",
    "window_rank_funcs",
    # (b) deferred corpus-family refreshers (r6-green, one-round grace)
    "sample_stratified",
    "quality_quantile_filter",
    "vocab_topk",
    "line_dedup",
    # (c) round-8 ADVICE-fix closure churn
    "scd2_history",
    "scd2_apply_batch",
    "triangle_counts",
    # (d) NEW round 8 queries
    "hard_negatives_shortlist",
    "html_extract",
    "web_pipeline",
    "web_pipeline_funnel",
    "lm_trigram_perplexity",
    "mixture_token_budget",
    "url_filter",
    "snapshot_changes",
    "dq_expectations",
    "embedding_covariance",
    "tokenizer_fertility",
    "incremental_orders_agg",
    "window_range_interval",
    "dq_group_expectations",
    # (e) filler — the full r4 tier (oldest greens in the registry)
    "ann_bruteforce",
    "ann_ivf",
    "ann_ivf_indexed",
    "date_funcs",
    "dedup_exact",
    "entity_tagging",
    "fallback_join_cascade",
    "kmeans_assign",
    "lang_id",
    "mean_std_population",
    "median_per_group",
    "profile_documents",
    "self_join_common",
    "shipping_priority",
    "text_clean_pii",
    "text_quality",
    "text_stats",
    "type_histogram",
    "window_sliding",
    # (e) filler — oldest r5 greens
    "anti_join_notfnd",
    # ---- past the driver's 50-query cap (position 51+): every entry
    # holds a green driver CORRECTNESS row from a prior round under
    # unchanged code ----
    "asof_join_segmented",
    "beans_counts",
    "bridge_m2n_join",
    "corpus_clean",
    "decile_bucketing",
    "dedup_composite_key",
    "dedup_embedding_cosine",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "distinct_projection",
    "except_sets",
    "dsir_weights",
    "dsir_sample",
    "cube_counts",
    "grouping_sets_mix",
    "unpivot_metrics",
    "winnow_fingerprints",
    "association_rules",
    "group_ols",
    "rolling_anomaly",
    "merge_intervals",
    "winsorize_values",
    "attribution_touch",
    "dedup_containment",
    "rrf_fusion",
    "mmr_rerank",
    "welch_ttest",
    "chi2_independence",
    "event_transitions",
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
    "corpus_pipeline_v2",
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
    "rank_compound_order",
    "mode_consensus",
    "frank_level_buckets",
    "min_tie_expansion",
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
    "union_dedup",
    "filter_like_null",
    "keyset_pagination",
    "lookup_point_join",
    "pricing_summary",
    "rollup_counts",
    "group_sum",
    "intersect_sets",
    "string_math_funcs",
    "json_case_funcs",
    "sessionize_skew",
    # ---- round-8 POST-cap additions (new-query grace: module added
    # after CORRECTNESS_r07 landed; pytest-sweep + sf0.1 check now,
    # rotate into the r9 cap) ----
    "resample_gapfill",
    "drift_psi",
    "event_pattern_match",
    "corr_scalar_below_avg",
    "corr_not_exists_idle",
    "incremental_join_agg",
    "pit_feature_join",
    "k_anonymity_audit",
    "dq_drift_gate",
    "session_pattern_match",
    "doc_compressibility",
    "blamed_suppliers",
    "top_revenue_supplier",
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
                    "operators.timeseries", "operators.patterns",
                    "operators.subqueries", "operators.feature_join",
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
                    "pipeline.html", "pipeline.lm3", "pipeline.budget",
                    "pipeline.urlfilter",
                    "pipeline.splits", "pipeline.chunker",
                    "pipeline.linalg", "pipeline.fertility",
                    "pipeline.clf_gate",
                    "pipeline.editdist", "pipeline.divergence",
                    "pipeline.compressibility",
                    "pipeline.pooling", "pipeline.containment",
                    "pipeline.fusion", "pipeline.mmr",
                    "sources.zorder", "sources.merge",
                    "sources.snapshots", "sources.incremental",
                    "sources.incremental_join",
                    "quality.expectations", "quality.drift",
                    "quality.anonymity",
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
