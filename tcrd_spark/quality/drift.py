"""Population-stability-index (PSI) drift between corpus slices and
the whole-corpus reference — the standard MLOps drift statistic for
NUMERIC features, complementing `pipeline/divergence.py`'s KL/JS over
token distributions.

    bin(x)  = ((x - min) * B) div (max - min + 1)   B equal-width bins,
                                                    INTEGER arithmetic
    p(b)    = (n_ref(b) + 1) / (N_ref + B)          add-1 smoothing so
    q_s(b)  = (n_s(b) + 1)  / (N_s + B)             empty bins are finite
    PSI_s   = Σ_b (q_s(b) - p(b)) · ln(q_s(b) / p(b))

Rule-of-thumb thresholds a deployment alerts on: PSI < 0.1 stable,
0.1–0.25 moderate shift, > 0.25 action. A training-data refresh whose
new crawl slice shows PSI > 0.25 on doc-length (or quality-score)
against the accepted corpus gets quarantined before it reaches a
mixture (`pipeline/mixture.py`) — the numeric-feature twin of the
divergence gate.

100 TB shape: ONE map-side-combinable (slice, bin) count is the only
data-sized aggregation; min/max ride a 1-row broadcast; everything
after runs on the |S|×B grid (tiny). No window over the data, no
join of data against data.

Cross-engine determinism: binning is pure INTEGER arithmetic (floor
division of non-negative ints — float width_bucket lands on bin-edge
ulps the engines break differently); the B-term ln-sum folds in
sorted order (the `pipeline/divergence.py` / TIN-X discipline) and
rounds to 6dp.

Reference parity: none (extension; SURVEY.md §2 corpus-construction
family — monitoring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_BINS = 10


def _sorted_fold_sum(col_name: str):
    """Bit-exact cross-engine double sum (see pipeline/divergence.py)."""
    return F.aggregate(
        F.array_sort(F.collect_list(col_name)), F.lit(0.0), lambda a, x: a + x
    )


def psi_by_slice(
    df: DataFrame, slice_col: str, val_col: str, n_bins: int = N_BINS
) -> DataFrame:
    """(slice, n_rows, psi): per-slice PSI of an INTEGER-valued feature
    against the whole-frame reference distribution.

    `val_col` must be integral — the equal-width binning divides in
    integer space so both engines place boundary values identically.
    """
    stats = df.agg(
        F.min(val_col).alias("_mn"),
        F.max(val_col).alias("_mx"),
        F.count(F.lit(1)).alias("_n_all"),
    )
    binned = df.crossJoin(F.broadcast(stats)).select(
        F.col(slice_col).alias("slice"),
        F.expr(
            f"(({val_col} - _mn) * {n_bins}) div (_mx - _mn + 1)"
        ).alias("bin"),
        "_n_all",
    )
    sb = binned.groupBy("slice", "bin").agg(F.count(F.lit(1)).alias("n_sb"))
    refb = binned.groupBy("bin").agg(F.count(F.lit(1)).alias("n_b"))
    ns = sb.groupBy("slice").agg(F.sum("n_sb").alias("n_s"))
    grid = ns.select(
        "slice", "n_s",
        F.explode(F.sequence(F.lit(0), F.lit(n_bins - 1))).alias("bin"),
    )
    terms = (
        grid.join(F.broadcast(refb), "bin", "left")
        .join(F.broadcast(sb), ["slice", "bin"], "left")
        .crossJoin(F.broadcast(stats.select("_n_all")))
        .select(
            "slice",
            "n_s",
            (
                (F.coalesce("n_sb", F.lit(0)) + 1) / (F.col("n_s") + n_bins)
            ).alias("q"),
            (
                (F.coalesce("n_b", F.lit(0)) + 1) / (F.col("_n_all") + n_bins)
            ).alias("p"),
        )
    )
    term = (F.col("q") - F.col("p")) * F.log(F.col("q") / F.col("p"))
    return (
        terms.withColumn("term", term)
        .groupBy("slice")
        .agg(
            F.max("n_s").alias("n_rows"),
            F.round(_sorted_fold_sum("term"), 6).alias("psi"),
        )
    )


# ------------------------------------------------- registered query


def q_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source doc-length PSI against the whole corpus."""
    from tcrd_spark.sources.lake import load_table

    docs = load_table(spark, sf_dir, "documents")
    return psi_by_slice(docs, "source", "n_chars", N_BINS)


QUERIES = {"drift_psi": q_drift_psi}

ORACLE = {
    "drift_psi": f"""
        WITH stats AS (
          SELECT min(n_chars) AS mn, max(n_chars) AS mx,
                 count(*) AS n_all
          FROM documents
        ), binned AS (
          SELECT source AS slice,
                 ((n_chars - mn) * {N_BINS}) // (mx - mn + 1) AS bin,
                 n_all
          FROM documents CROSS JOIN stats
        ), sb AS (
          SELECT slice, bin, count(*) AS n_sb FROM binned GROUP BY 1, 2
        ), refb AS (
          SELECT bin, count(*) AS n_b, max(n_all) AS n_all
          FROM binned GROUP BY 1
        ), ns AS (
          SELECT slice, CAST(sum(n_sb) AS BIGINT) AS n_s
          FROM sb GROUP BY 1
        ), grid AS (
          SELECT ns.slice, ns.n_s, b.bin
          FROM ns CROSS JOIN (
            SELECT unnest(generate_series(0, {N_BINS - 1})) AS bin
          ) b
        ), terms AS (
          SELECT g.slice, g.n_s,
                 (coalesce(sb.n_sb, 0) + 1)
                   / (g.n_s + {N_BINS}) AS q,
                 (coalesce(refb.n_b, 0) + 1)
                   / ((SELECT n_all FROM stats) + {N_BINS}) AS p
          FROM grid g
          LEFT JOIN refb ON refb.bin = g.bin
          LEFT JOIN sb ON sb.slice = g.slice AND sb.bin = g.bin
        )
        SELECT slice,
               max(n_s) AS n_rows,
               round(list_reduce(
                 list_prepend(0.0, list_sort(list((q - p) * ln(q / p)))),
                 (a, x) -> a + x), 6) AS psi
        FROM terms GROUP BY slice
    """,
}
