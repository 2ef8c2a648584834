"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric":..., "value": N, "unit": "sec", "queries":
{name: sec}, "sf": ...}.

Materialization uses the noop sink (full execution, no driver collect)
— the same discipline that keeps 100 TB runs collect()-free.

Each query is timed $SPARK_GRAFT_BENCH_REPS times (default 3) and the
MINIMUM is reported: min-of-N is the standard noise-robust estimator
for a deterministic workload on a shared box (ambient contention only
ever adds time), so round-over-round comparisons track plan changes,
not machine load.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

HEADLINE = [
    "pricing_summary",
    "three_way_entity_join",
    "bridge_m2n_join",
    "self_join_common",
    "group_sum",
    "median_per_group",
    "mode_consensus",
    "mean_std_population",
    "pivot_wide",
    "grouped_set_agg",
    "min_tie_expansion",
    "rank_compound_order",
    "topk_per_group",
    "decile_bucketing",
    "union_dedup",
    "dedup_composite_key",
    "string_math_funcs",
    "json_case_funcs",
    "date_funcs",
    # API lifecycles (SURVEY §3-A/§3-B)
    "nested_document",
    "wide_export",
    # derived analytics (SURVEY §2.10)
    "tdl_classification",
    "tau_continuous",
    "consensus_expression",
    "hgram_cdf",
    "tinx_importance",
    "tinx_pmid_rankings",
    # LLM-pipeline extensions
    "corpus_clean",
    "text_quality",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash_pairs",
    "dedup_embedding_cosine",
    "ann_bruteforce",
    "ann_ivf",
    # graph / streaming / multimodal
    "apsp_min_merge",
    "nearest_flagged",
    "ancestor_closure",
    "window_tumbling",
    "window_session",
    "multimodal_features",
    "entity_tagging",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    from tcrd_spark.registry import all_queries
    from tcrd_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    names = [n for n in HEADLINE if n in queries]
    # warm the JVM + parquet footers with one tiny job
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    per_query: dict[str, float] = {}
    for name in names:
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            queries[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.time() - t0)
        per_query[name] = round(best, 3)
    total = round(sum(per_query.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "reps": reps,  # per-query timing = min of this many runs
                "queries": per_query,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
