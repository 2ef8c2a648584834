"""Central query registry: collects QUERIES/ORACLE from every module.

`__spark_entry__.py` (the driver contract) is a thin shim over this.
Each query name appears in exactly one module; a name collision is a
bug and raises at import time.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_MODULES = []

PRIORITY = (
    # ---- the 50-query adjudication cap for round 11, emitted by
    # tools/rotate_cap.py (obligations first, then strict
    # oldest-green-first filler):
    #   (a) 15 never-driver-green — the 13 TPC-H-family queries +
    #       video_near_dups (registered after the r10 cap was fixed;
    #       judge-verified at sf0.01 in VERDICT r10) and
    #       doc_compressibility (now ADJUDICABLE: r11 gave the
    #       production path a sidecar-join oracle, VERDICT r10 #7);
    #   (b) 10 closure-churn entries: subqueries.py changed in r11
    #       (decimal money-sum sweep) after its queries' latest
    #       greens; snapshots.py/scd.py changed late in r10 after
    #       theirs;
    #   (c) filler: the entire remaining r7 tier (oldest greens).
    # The staleness bound is computed from the LIVE registry size
    # (tools/rotate_cap.py): 205 queries -> ceil(205/50) = 5 rounds.
    "doc_compressibility",
    "tpch_q10_returned",
    "tpch_q12_priority_lines",
    "tpch_q13_custdist",
    "tpch_q14_promo",
    "tpch_q16_supplier_cnt",
    "tpch_q18_large_orders",
    "tpch_q19_disjunctive",
    "tpch_q4_priority",
    "tpch_q5_local_supplier",
    "tpch_q6_forecast",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_profit",
    "video_near_dups",
    "big_share_parts",
    "blamed_suppliers",
    "corr_not_exists_idle",
    "corr_scalar_below_avg",
    "excess_share_suppliers",
    "incremental_join_agg",
    "min_cost_supplier",
    "scd2_apply_batch",
    "scd2_history",
    "top_revenue_supplier",
    # registered mid-r11 into a pre-existing module (sources/
    # snapshots.py): no new-module grace — adjudicate now, displacing
    # the youngest-green fillers (mmr_rerank, merge_intervals,
    # hgram_cdf, grouping_sets_mix — r7, back to the tail)
    "lake_history",
    "dv_deletes",
    "dv_updates",
    "dv_merge",
    "association_rules",
    "attribution_touch",
    "bpe_pair_counts",
    "chi2_independence",
    "clique_expansion",
    "consensus_expression",
    "corpus_pipeline",
    "corpus_pipeline_v2",
    "corpus_shard_assign",
    "cube_counts",
    "decontaminate",
    "dedup_containment",
    "dedup_groups_cc",
    "dedup_incremental",
    "dedup_incremental_indexed",
    "dedup_incremental_lsh",
    "dedup_rep_quality",
    "dsir_sample",
    "dsir_weights",
    "event_transitions",
    "group_ols",
    # ---- past the driver's 50-query cap (position 51+): every
    # entry holds a green driver CORRECTNESS row from a prior
    # round, ordered oldest-green-first so the next rotation
    # reads straight off this list ----
    # last green r7
    "grouping_sets_mix",
    "hgram_cdf",
    "merge_intervals",
    "mmr_rerank",
    "nearest_flagged",
    "pagerank",
    "qualitative_levels",
    "rolling_anomaly",
    "rrf_fusion",
    "semantic_dedup",
    "semantic_dedup_pairs",
    "sequence_pack",
    "tau_continuous",
    "tau_ordinal",
    "tdl_classification",
    "tdl_refresh_delta",
    "tinx_importance",
    "tinx_novelty",
    "tinx_pmid_rankings",
    "unpivot_metrics",
    "welch_ttest",
    "winnow_fingerprints",
    "winsorize_values",
    # last green r8
    "ann_bruteforce",
    "ann_ivf",
    "ann_ivf_indexed",
    "anti_join_notfnd",
    "asof_forward_events",
    "chunk_documents",
    "classifier_quality_gate",
    "date_funcs",
    "dedup_exact",
    "dq_expectations",
    "dq_group_expectations",
    "embedding_covariance",
    "embedding_meanpool",
    "entity_tagging",
    "fallback_join_cascade",
    "hard_negatives",
    "hard_negatives_shortlist",
    "html_extract",
    "kmeans_assign",
    "lang_id",
    "leakage_safe_split",
    "line_dedup",
    "lm_trigram_perplexity",
    "mean_std_population",
    "median_per_group",
    "mixture_token_budget",
    "profile_documents",
    "quality_quantile_filter",
    "sample_stratified",
    "self_join_common",
    "session_durations",
    "shipping_priority",
    "text_clean_pii",
    "text_quality",
    "text_stats",
    "tfidf_topterms",
    "tokenizer_fertility",
    "triangle_counts",
    "type_histogram",
    "url_filter",
    "vocab_topk",
    "web_pipeline",
    "web_pipeline_funnel",
    "window_range_interval",
    "window_rank_funcs",
    "window_sliding",
    # last green r9
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
    "dq_drift_gate",
    "drift_psi",
    "event_pattern_match",
    "except_sets",
    "filter_like_null",
    "frank_level_buckets",
    "group_sum",
    "grouped_set_agg",
    "intersect_sets",
    "json_case_funcs",
    "k_anonymity_audit",
    "keyset_pagination",
    "lookup_point_join",
    "min_tie_expansion",
    "mode_consensus",
    "multimodal_features",
    "nested_document",
    "pit_feature_join",
    "pivot_wide",
    "pricing_summary",
    "rank_compound_order",
    "resample_gapfill",
    "rollup_counts",
    "scan_project_filter",
    "semi_join",
    "session_pattern_match",
    "sessionize_skew",
    "string_math_funcs",
    "three_way_entity_join",
    "topk_per_group",
    "union_dedup",
    # last green r10
    "ancestor_closure",
    "ann_ivfpq",
    "ann_ivfsq",
    "ann_pq_rerank",
    "ann_pq_topk",
    "ann_sq_topk",
    "apsp_min_merge",
    "asof_join_events",
    "bm25_search",
    "ccnet_buckets",
    "cms_heavy_hitters",
    "cohort_retention",
    "compressibility_buckets",
    "corpus_divergence",
    "decontaminate_bloom",
    "dedup_edit_distance",
    "domain_mixture_exact",
    "domain_mixture_sample",
    "funnel_stages",
    "gopher_quality_filter",
    "gopher_repetition",
    "image_near_dups",
    "incremental_orders_agg",
    "kmv_distinct",
    "lm_perplexity",
    "lm_top_bigrams",
    "lttb_downsample",
    "merge_upsert",
    "mixture_weights",
    "nb_classify",
    "phrase_search",
    "quantile_sketch",
    "range_join_events",
    "sessionize_events",
    "skyline_parts",
    "snapshot_changes",
    "substring_dedup",
    "substring_dedup_incremental",
    "substring_excise",
    "table_profile",
    "theta_sketch_ops",
    "wide_export",
    "window_session",
    "window_tumbling",
    "winnow_candidate_pairs",
    "zorder_sampled",
    "zorder_values",
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
                    "operators.downsample",
                    "operators.subqueries", "operators.tpch",
                    "operators.feature_join",
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
                    "pipeline.imagedup", "pipeline.videodup",
                    "pipeline.quantiles",
                    "pipeline.phrase", "pipeline.profile",
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
