"""Temperature-weighted domain mixture resampling.

Pretraining corpora are mixed by domain with temperature-scaled
weights (multilingual LM sampling, Raffel et al. C4 mixing): a domain
with n_s documents gets weight ∝ n_s^α (α = 0.5 here — sqrt keeps the
expression exactly reproducible across engines, since sqrt is
IEEE-correctly-rounded where pow is not), and documents are selected
to hit a global target budget T = ⌊N·frac⌋ in proportion.

Selection is DETERMINISTIC HASH THRESHOLDING, not per-domain ranking:
keep a document iff

    hash60('mix:' || doc_id)  <  rate_s · 2^60,
    rate_s = min(1, w_s · T / n_s)

A rank-based exact quota would need an ordered window per domain — a
hot domain (one source holding 30%+ of a 100 TB corpus) becomes ONE
task there (AQE cannot split ordered windows; see
operators/temporal_skew.py). The hash threshold is embarrassingly
parallel: one tiny aggregate for the plan (|domains| rows, broadcast
back), then a map-side filter — zero windows, zero extra shuffles,
and the same doc set on every engine and every rerun. The achieved
count is quota ± binomial noise, the standard trade at corpus scale.

Reference parity: no mixing step exists in the reference; this extends
the beyond-reference training-data surface (SURVEY §2 LLM-pipeline
rows) next to corpus.py's sharding/sampling family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tcrd_spark.functions.hashing import hash60, sql_hash60

# fraction of the corpus the mixed sample targets
FRAC = 0.5
# 2^60: hash60 values are uniform in [0, 2^60)
_HASH_SPAN = float(1 << 60)


def mixture_plan(
    docs: DataFrame, domain_col: str, frac: float = FRAC
) -> DataFrame:
    """(domain, n_docs, weight, rate) — sqrt-temperature weights and
    the per-domain keep rate. |domains| rows; broadcast it."""
    stats = docs.groupBy(domain_col).agg(F.count("*").alias("n_docs"))
    total = docs.agg(F.count("*").alias("n_all"))
    w = stats.withColumn("sw", F.sqrt("n_docs"))
    ssw = w.agg(F.sum("sw").alias("ssw"))
    return (
        w.crossJoin(ssw)
        .crossJoin(total)
        .withColumn("weight", F.col("sw") / F.col("ssw"))
        .withColumn(
            "rate",
            F.least(
                F.lit(1.0),
                F.col("weight")
                * (F.col("n_all") * F.lit(frac))
                / F.col("n_docs"),
            ),
        )
        .select(domain_col, "n_docs", "weight", "rate")
    )


def mixture_sample(
    docs: DataFrame, plan: DataFrame, id_col: str, domain_col: str
) -> DataFrame:
    """Documents surviving the per-domain hash threshold — map-side
    after a broadcast join of the plan."""
    key = hash60(
        F.concat(F.lit("mix:"), F.col(id_col).cast("string"))
    ).cast("double")
    return (
        docs.join(F.broadcast(plan.select(domain_col, "rate")), domain_col)
        .where(key < F.col("rate") * F.lit(_HASH_SPAN))
        .select(id_col, domain_col)
    )


def exact_quota_sample(
    docs: DataFrame,
    plan: DataFrame,
    id_col: str,
    domain_col: str,
    frac: float = FRAC,
    n_segments: int = 64,
) -> DataFrame:
    """EXACT per-domain quotas without a hot ordered window — the
    two-phase segmented global rank (the TeraSort trick):

    1. every row gets a deterministic SEGMENT = a RANGE of the
       selection hash (its top bits: k div 2^60/n_segments) — so
       ordering by (segment, k) IS the global k order, and the
       selected set is invariant to n_segments (a parallelism knob,
       never a semantics knob). The hash is uniform, so range
       segments are balanced with no sampling pass — the TeraSort
       partitioner with the sampler replaced by uniformity-by-
       construction;
    2. local rank within (domain, segment), ordered by (k, id) —
       window partitions are domain_size / n_segments, so a domain
       holding 30% of a 100 TB corpus is n_segments tasks, not one
       (tune n_segments to the executor count);
    3. per-(domain, segment) counts → exclusive prefix offsets per
       domain (a window over n_segments rows per domain — trivially
       small) broadcast back;
    4. global rank = offset + local rank; keep rank ≤ quota_s =
       ⌊w_s · N · frac⌋.

    Same weights as `mixture_plan`; unlike `mixture_sample` the
    achieved count is EXACTLY min(quota, n_s) per domain.
    """
    if (1 << 60) % n_segments:
        raise ValueError("n_segments must divide 2^60 (power of two)")
    step = (1 << 60) // n_segments
    key = hash60(F.concat(F.lit("mix:"), F.col(id_col).cast("string")))
    base = docs.select(
        id_col, domain_col, key.alias("_k")
    ).withColumn(
        # integer division in LONG space (k > 2^53 — double division
        # would lose the low bits); SQL `div` is exact on both engines
        "_seg",
        F.expr(f"_k div {step}"),
    )
    w_local = Window.partitionBy(domain_col, "_seg").orderBy(
        "_k", id_col
    )
    ranked = base.withColumn("_lr", F.row_number().over(w_local))
    counts = base.groupBy(domain_col, "_seg").agg(
        F.count("*").alias("_n")
    )
    w_pfx = (
        Window.partitionBy(domain_col)
        .orderBy("_seg")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("_n").over(w_pfx), F.lit(0))
    ).select(domain_col, "_seg", "_off")
    quota = plan.crossJoin(
        plan.agg(F.sum("n_docs").alias("_n_all"))
    ).select(
        domain_col,
        F.floor(F.col("weight") * (F.col("_n_all") * F.lit(frac)))
        .cast("long")
        .alias("_quota"),
    )
    return (
        ranked.join(F.broadcast(offsets), [domain_col, "_seg"])
        .join(F.broadcast(quota), domain_col)
        .where(F.col("_off") + F.col("_lr") <= F.col("_quota"))
        .select(id_col, domain_col)
    )


# ------------------------------------------------- registered queries


def q_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mixing plan over documents.source at α=0.5, frac=0.5."""
    from tcrd_spark.sources.lake import load_table

    docs = load_table(spark, sf_dir, "documents")
    return mixture_plan(docs, "source").select(
        "source",
        "n_docs",
        F.round("weight", 6).alias("weight"),
        F.round("rate", 6).alias("rate"),
    )


def q_domain_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministically resampled document set under the plan."""
    from tcrd_spark.sources.lake import load_table

    docs = load_table(spark, sf_dir, "documents")
    plan = mixture_plan(docs, "source")
    return mixture_sample(docs, plan, "doc_id", "source")


def q_domain_mixture_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exact-quota resample via the segmented two-phase rank."""
    from tcrd_spark.sources.lake import load_table

    docs = load_table(spark, sf_dir, "documents")
    plan = mixture_plan(docs, "source")
    return exact_quota_sample(docs, plan, "doc_id", "source")


QUERIES = {
    "mixture_weights": q_mixture_weights,
    "domain_mixture_sample": q_domain_mixture_sample,
    "domain_mixture_exact": q_domain_mixture_exact,
}

_PLAN_CTES = f"""
s AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
n AS (SELECT count(*) AS n_all FROM documents),
w AS (SELECT source, n_docs, sqrt(n_docs) AS sw FROM s),
sws AS (SELECT sum(sw) AS ssw FROM w),
plan AS (
  SELECT w.source, w.n_docs,
         w.sw / sws.ssw AS weight,
         least(1.0,
               (w.sw / sws.ssw) * (n.n_all * {FRAC}) / w.n_docs) AS rate
  FROM w CROSS JOIN sws CROSS JOIN n
)
"""

_KEY = sql_hash60("concat('mix:', CAST(d.doc_id AS VARCHAR))")
_KEY_B = sql_hash60("concat('mix:', CAST(doc_id AS VARCHAR))")

ORACLE = {
    "mixture_weights": f"""
        WITH {_PLAN_CTES}
        SELECT source, n_docs, round(weight, 6) AS weight,
               round(rate, 6) AS rate
        FROM plan
    """,
    "domain_mixture_sample": f"""
        WITH {_PLAN_CTES}
        SELECT d.doc_id, d.source
        FROM documents d JOIN plan USING (source)
        WHERE CAST({_KEY} AS DOUBLE) < plan.rate * 1152921504606846976.0
    """,
    "domain_mixture_exact": f"""
        WITH {_PLAN_CTES},
        q AS (
          SELECT plan.source,
                 CAST(floor(plan.weight *
                            ((SELECT sum(n_docs) FROM plan) * {FRAC}))
                      AS BIGINT) AS quota
          FROM plan
        ),
        base AS (
          SELECT doc_id, source, k, k // {(1 << 60) // 64} AS seg
          FROM (SELECT doc_id, source, {_KEY_B} AS k FROM documents)
        ),
        lr AS (
          SELECT *, row_number() OVER (PARTITION BY source, seg
                                       ORDER BY k, doc_id) AS lrank
          FROM base
        ),
        cnt AS (
          SELECT source, seg, count(*) AS n FROM base GROUP BY 1, 2
        ),
        off AS (
          SELECT source, seg,
                 coalesce(sum(n) OVER (
                   PARTITION BY source ORDER BY seg
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0) AS off
          FROM cnt
        )
        SELECT l.doc_id, l.source
        FROM lr l
        JOIN off USING (source, seg)
        JOIN q ON q.source = l.source
        WHERE l.lrank + off.off <= q.quota
    """,
}
