"""Measure the Bloom-vs-exact decontamination crossover (VERDICT r5
next-step #6): wall time and broadcast payload as the benchmark grows
from 1 to 100 eval suites.

The exact operator (`corpus.decontaminate`) broadcasts the
benchmark's full distinct shingle-hash set — payload grows linearly
with eval-suite count. The Bloom form (`pipeline/bloom`) broadcasts a
FIXED ~8 KB bit array regardless of benchmark size, at the cost of K=4
chained probe joins and an engine-reproducible false-positive rate
that rises with filter fill. This script prints one row per
(suites, variant): wall seconds (min of N reps), broadcast payload
bytes, Bloom fill fraction, and the measured false-positive count vs
the exact verdicts. Results go into SCALE.md.

Synthetic suites: replica k of the base benchmark (doc_id < 10)
prefixes every text with a replica token, so each suite contributes
fresh shingles — the linear-growth worst case for the exact
broadcast.

Usage: python tools/decon_bench.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from pyspark.sql import functions as F

    from tcrd_spark.pipeline import bloom
    from tcrd_spark.pipeline.corpus import decontaminate
    from tcrd_spark.pipeline.dedup import hashed_shingles
    from tcrd_spark.session import get_spark
    from tcrd_spark.sources.lake import load_table

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    spark = get_spark("decon_bench")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") >= 10).cache()
    corpus.count()
    base = docs.filter(F.col("doc_id") < 10)

    def suites_bench(k: int):
        # interleave a per-suite token between every pair of words so
        # EVERY 5-gram is suite-unique — the linear-growth worst case
        # for the exact broadcast (a plain prefix only perturbs the
        # first n−1 shingles and the distinct set collapses the rest)
        reps_df = None
        for i in range(k):
            r = base.select(
                (F.col("doc_id") + i * 1_000_000).alias("doc_id"),
                F.regexp_replace(
                    F.col("text"), " ", f" x{i} "
                ).alias("text"),
            )
            reps_df = r if reps_df is None else reps_df.unionAll(r)
        return reps_df.cache()

    def timed(make_df):
        best = None
        for _ in range(reps):
            t0 = time.time()
            make_df().collect()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        return best

    rows = []
    for k in (1, 10, 100):
        bench = suites_bench(k)
        bench.count()

        # exact: broadcast payload = distinct bench shingles × 8 bytes
        n_shingles = (
            hashed_shingles(bench, "doc_id", "text", 5)
            .select(F.explode("hs").alias("g"))
            .distinct()
            .count()
        )
        t_exact = timed(
            lambda: decontaminate(corpus, bench, "doc_id", "text", n=5)
        )
        exact_flags = {
            r["doc_id"]: r["contaminated"]
            for r in decontaminate(
                corpus, bench, "doc_id", "text", n=5
            ).collect()
        }

        # two Bloom sizings: "compact" 10 bits/element (the textbook
        # K≈m/n·ln2 regime — fine for PER-PROBE FP, catastrophic for
        # per-DOC verdicts: a doc probes ~hundreds of shingles), and
        # "doc-safe" from the rule fill^K ≤ δ_doc / shingles_per_doc
        # with δ=1%, S≈300 → ~51 bits/element at K=4.
        out = {
            "suites": k,
            "exact_wall_s": round(t_exact, 2),
            "exact_bcast_bytes": n_shingles * 8,
        }
        for label, bits_per_elem in (("compact10", 10), ("docsafe51", 51)):
            m_words = max(
                64,
                (n_shingles * bits_per_elem + bloom.BITS_PER_WORD - 1)
                // bloom.BITS_PER_WORD,
            )
            bl = bloom.build_bloom(
                bench, "doc_id", "text", n=5, m_words=m_words
            ).cache()
            n_words = bl.count()
            fill = (
                bl.agg(F.sum(F.expr("bit_count(mask)")).alias("b"))
                .collect()[0]["b"]
                / (m_words * bloom.BITS_PER_WORD)
            )
            t_bloom = timed(
                lambda: bloom.probe_bloom(
                    corpus, bl, "doc_id", "text", n=5, m_words=m_words
                )
            )
            bloom_flags = {
                r["doc_id"]: r["contaminated"]
                for r in bloom.probe_bloom(
                    corpus, bl, "doc_id", "text", n=5, m_words=m_words
                ).collect()
            }
            false_pos = sum(
                1
                for d, f in bloom_flags.items()
                if f and not exact_flags.get(d, 0)
            )
            false_neg = sum(
                1
                for d, f in exact_flags.items()
                if f and not bloom_flags.get(d, 0)
            )
            out[label] = {
                "wall_s": round(t_bloom, 2),
                "bcast_bytes": n_words * 16,
                "fill": round(fill, 3),
                "false_pos": false_pos,
                "false_neg": false_neg,
            }
            bl.unpersist()
        rows.append(out)
        bench.unpersist()
        print(json.dumps(rows[-1]))

    print(json.dumps({"sf_dir": sf_dir, "rows": rows}))


if __name__ == "__main__":
    main()
