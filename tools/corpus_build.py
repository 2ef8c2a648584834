"""End-to-end corpus build CLI: documents parquet in → cleaned,
deduplicated, decontaminated, sharded training corpus out.

Chains the adjudicated corpus_pipeline stages through resumable
parquet checkpoints (etl/checkpoint.py) — kill it at any stage and
rerun; finished stages are reused. Final output is the
shard-partitioned tree (pipeline/corpus.write_corpus_shards) plus a
small JSON report of per-stage row counts.

Usage:
    python tools/corpus_build.py <sf_dir> <out_dir> [n_shards]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build(spark, sf_dir: str, out_dir: str, n_shards: int = 4) -> dict:
    from pyspark.sql import functions as F

    from tcrd_spark.etl.checkpoint import run_stages
    from tcrd_spark.pipeline import corpus, dedup, text
    from tcrd_spark.sources.lake import load_table

    docs = load_table(spark, sf_dir, "documents")
    stages_root = os.path.join(out_dir, "_stages")

    def s_dedup_reps(_):
        exact_reps = dedup.exact_dedup(docs, "doc_id", "text").select(
            F.col("keep_id").alias("doc_id")
        )
        pairs = dedup.ngram_jaccard_pairs(
            docs, "doc_id", "text", n=3, threshold=0.3
        )
        cc_reps = (
            corpus.dedup_groups(docs, pairs, "doc_id")
            .filter(F.col("doc_id") == F.col("group_id"))
            .select("doc_id")
        )
        return exact_reps.join(cc_reps, "doc_id", "left_semi")

    def s_decontaminate(reps):
        clean = corpus.decontaminate(
            docs.filter(F.col("doc_id") >= 10),
            docs.filter(F.col("doc_id") < 10),
            "doc_id",
            "text",
            n=5,
        ).filter(F.col("contaminated") == 0).select("doc_id")
        return reps.join(clean, "doc_id", "left_semi")

    def s_quality_gate(kept_ids):
        survivors = (
            docs.join(kept_ids, "doc_id", "left_semi")
            .select(
                "doc_id",
                text.lang_id(F.col("text")).alias("pred_lang"),
                F.round(text.quality_score(F.col("text")), 6).alias("quality"),
            )
            .filter(F.col("pred_lang") == "en")
            .cache()
        )
        return corpus.quantile_filter(
            survivors, "doc_id", "quality", 0.25
        ).select("doc_id")

    def s_layout(kept_ids):
        return corpus.shard_assign(
            docs.join(kept_ids, "doc_id", "left_semi"), "doc_id", n_shards
        )

    layout = run_stages(
        spark,
        stages_root,
        [
            ("dedup_reps", s_dedup_reps),
            ("decontaminate", s_decontaminate),
            ("quality_gate", s_quality_gate),
            ("layout", s_layout),
        ],
    )
    corpus.write_corpus_shards(docs, layout, os.path.join(out_dir, "shards"))

    from tcrd_spark.etl.checkpoint import stage_path

    report = {"input_docs": docs.count(), "n_shards": n_shards}
    for name in ("00_dedup_reps", "01_decontaminate", "02_quality_gate",
                 "03_layout"):
        report[name] = spark.read.parquet(
            stage_path(stages_root, name)
        ).count()
    with open(os.path.join(out_dir, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    return report


def main(argv: list[str] | None = None) -> int:
    args = list(argv if argv is not None else sys.argv[1:])
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    out_dir = args[1] if len(args) > 1 else os.path.join(
        REPO, ".localdata", "corpus_build"
    )
    n_shards = int(args[2]) if len(args) > 2 else 4

    from tcrd_spark.session import get_spark

    spark = get_spark("corpus_build")
    spark.sparkContext.setLogLevel("ERROR")
    report = build(spark, sf_dir, out_dir, n_shards)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
