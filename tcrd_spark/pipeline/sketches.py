"""Mergeable sketch operators: KMV distinct-count, theta-style set-op
estimates, and Count-Min heavy-hitter estimation.

At 100 TB exact `COUNT(DISTINCT x)` per group is a full shuffle of every
distinct (group, x) pair, and exact set intersection of two billion-key
sets is a giant join. Production engines answer these with mergeable
sketches (DataSketches' theta/KMV/CMS families). Spark ships
`approx_count_distinct` (HLL++), but its register layout is
engine-private — the DuckDB oracle could never hash-match it. These
operators instead build the classic *deterministic* sketches on the
portable hash60 primitive (`functions/hashing.py`), so the exact same
sketch — not just a statistically similar one — is computable in ANSI
SQL, and every estimate is adjudicated bit-for-bit:

- KMV (k-minimum values, Beyer et al. SIGMOD'07): keep the k smallest
  hashes of the distinct item set; n̂ = (k-1)·U/h_k with U = 2^60.
- Theta set ops (Dasgupta et al., DataSketches): cut both KMV sketches
  at θ = min(h_k^A, h_k^B); below θ each sketch is a uniform sample of
  its set, so |A∪B| ≈ c_union·U/θ, |A∩B| ≈ c_inter·U/θ.
- Count-Min (Cormode & Muthukrishnan '05): d×w counter grid, point
  estimate = min over the d hashed counters; over-estimates only.

100 TB shape: every sketch here is a bounded-size partial-aggregable
reduction. The KMV top-k runs as a WindowGroupLimit (per-partition
k-heap, no per-group sort materialization) over hash-deduped rows whose
shuffle combines map-side. The CMS build is one map-side-combinable
groupBy with ≤ d·w output rows regardless of input size; the grid
broadcasts for estimation. Nothing holds per-item state beyond k or
d·w counters.

Reference parity: the reference computes its summary counts exactly
(`loaders/TCRD.py` COUNT(DISTINCT ...) SQL); sketches are part of the
large-scale extension surface (SURVEY.md §2, corpus-construction
family) for the cardinalities where exact is no longer affordable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tcrd_spark.functions.hashing import (
    MERSENNE_P,
    hash60,
    minhash_params,
    sql_hash60,
)

U60 = float(1 << 60)  # hash60 range: uniform over [0, 2^60)
KMV_K = 64
CMS_DEPTH = 4
CMS_WIDTH = 256
CMS_SEED = 11
CMS_TOPN = 20


# --------------------------------------------------------------- KMV


def _distinct_hashes(df: DataFrame, group_cols: list[str], item) -> DataFrame:
    """(group..., h): hash60 of each distinct item per group. The
    groupBy dedups with map-side combine — the only full shuffle."""
    return (
        df.select(*group_cols, hash60(item).alias("h"))
        .groupBy(*group_cols, "h")
        .agg(F.lit(1).alias("_one"))
        .drop("_one")
    )


def kmv_sketch(df: DataFrame, group_cols: list[str], item, k: int = KMV_K) -> DataFrame:
    """(group..., h, rn): the k smallest distinct-item hashes per group.

    Grouped, the rank-filter window plans as WindowGroupLimit: each
    task keeps a k-heap per group, so no group's full hash set is ever
    sorted or held in memory. Ungrouped, a global window would funnel
    every distinct hash through ONE task — instead orderBy+limit plans
    as TakeOrderedAndProject (per-partition k-heaps merged on the
    driver). Both are the 100 TB-safe shapes for bounded top-k.
    """
    d = _distinct_hashes(df, group_cols, item)
    if not group_cols:
        return d.orderBy(F.asc("h")).limit(k)
    w = Window.partitionBy(*group_cols).orderBy(F.asc("h"))
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def kmv_estimate(sketch: DataFrame, group_cols: list[str], k: int = KMV_K) -> DataFrame:
    """Collapse a KMV sketch to (group..., k_eff, kth_hash, est_distinct).

    If a group has fewer than k distinct items the sketch IS the set
    (estimate exact); otherwise n̂ = (k-1)·U/h_k (unbiased, Beyer et
    al.). floor() — not round() — so both engines make the identical
    integer decision.
    """
    return (
        sketch.groupBy(*group_cols)
        .agg(F.count("*").alias("k_eff"), F.max("h").alias("kth_hash"))
        .select(
            *group_cols,
            "k_eff",
            "kth_hash",
            F.when(F.col("k_eff") < k, F.col("k_eff"))
            .otherwise(
                F.floor(F.lit(float(k - 1)) * F.lit(U60) / F.col("kth_hash"))
            )
            .cast("long")
            .alias("est_distinct"),
        )
    )


def theta_set_ops(
    a: DataFrame, b: DataFrame, item_col: str = "h", k: int = KMV_K
) -> DataFrame:
    """One-row theta-sketch set-op estimates from two single-group KMV
    sketches (columns: h). Cut both at θ = min(kthA, kthB); below θ each
    side is a uniform ~k/|set| sample, so counts scale by U/θ.
    """
    ka = a.agg(F.max(item_col).alias("kth_a"))
    kb = b.agg(F.max(item_col).alias("kth_b"))
    theta = ka.crossJoin(kb).select(
        F.least("kth_a", "kth_b").alias("theta")
    )
    au = a.select(F.col(item_col).alias("h"), F.lit(1).alias("in_a"))
    bu = b.select(F.col(item_col).alias("h"), F.lit(1).alias("in_b"))
    both = (
        au.join(bu, "h", "full_outer")
        .crossJoin(F.broadcast(theta))
        .filter(F.col("h") < F.col("theta"))
    )
    return both.agg(
        F.count("*").alias("c_union"),
        F.sum(
            F.when(F.col("in_a").isNotNull() & F.col("in_b").isNotNull(), 1).otherwise(0)
        ).alias("c_inter"),
        F.max("theta").alias("theta"),
    ).select(
        "c_union",
        "c_inter",
        F.floor(F.col("c_union") * F.lit(U60) / F.col("theta"))
        .cast("long")
        .alias("est_union"),
        F.floor(F.col("c_inter") * F.lit(U60) / F.col("theta"))
        .cast("long")
        .alias("est_inter"),
        F.round(F.col("c_inter") / F.col("c_union"), 6).alias("est_jaccard"),
    )


# --------------------------------------------------------- Count-Min


def _cms_col(h, a: int, b: int, width: int):
    """Counter column for one CMS row: universal hash of h into [0, w)."""
    return ((F.lit(a) * (h % F.lit(MERSENNE_P)) + F.lit(b)) % F.lit(MERSENNE_P)) % F.lit(
        width
    )


def cms_build(
    df: DataFrame,
    item,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    seed: int = CMS_SEED,
) -> DataFrame:
    """(d, col, cnt): the d×w Count-Min grid over an item stream.

    One select fans each occurrence into its d counter cells row-locally,
    then a single map-side-combinable groupBy reduces to ≤ d·w rows —
    the sketch is kilobytes no matter how many trillions of occurrences
    feed it, and two grids built this way merge by cell-wise addition.
    """
    h = hash60(item)
    cells = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"), _cms_col(h, a, b, width).alias("col")
            )
            for d, (a, b) in enumerate(minhash_params(depth, seed))
        ]
    )
    return (
        df.select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.d").alias("d"), F.col("c.col").alias("col"))
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimates(
    grid: DataFrame,
    items: DataFrame,
    item_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    seed: int = CMS_SEED,
) -> DataFrame:
    """(item..., cms_est): min-over-rows point estimate per queried item.

    The grid (≤ d·w rows) broadcasts; each item fans to its d cells and
    a per-item min collapses them — no shuffle of the item table beyond
    the final agg.
    """
    h = hash60(F.col(item_col))
    cells = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"), _cms_col(h, a, b, width).alias("col")
            )
            for d, (a, b) in enumerate(minhash_params(depth, seed))
        ]
    )
    fanned = items.select(
        "*", F.explode(cells).alias("c")
    ).select("*", F.col("c.d").alias("d"), F.col("c.col").alias("col")).drop("c")
    out_cols = [c for c in items.columns]
    return (
        fanned.join(F.broadcast(grid), ["d", "col"])
        .groupBy(*out_cols)
        .agg(F.min("cnt").alias("cms_est"))
    )


# ------------------------------------------------- registered queries


def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-partkey estimate per returnflag, next to the exact
    count so the error is visible in the adjudicated output."""
    from tcrd_spark.sources.lake import load_table

    li = load_table(spark, sf_dir, "lineitem")
    item = F.col("l_partkey").cast("string")
    sketch = kmv_sketch(li, ["l_returnflag"], item, KMV_K)
    est = kmv_estimate(sketch, ["l_returnflag"], KMV_K)
    exact = (
        li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("exact_distinct"))
    )
    return est.join(exact, "l_returnflag").orderBy("l_returnflag")


def q_theta_sketch_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta union/intersection/Jaccard estimates between the partkey
    sets of returnflag A and R, from 64-value KMV sketches, alongside
    the exact values."""
    from tcrd_spark.sources.lake import load_table

    li = load_table(spark, sf_dir, "lineitem")
    item = F.col("l_partkey").cast("string")

    def side(flag: str) -> DataFrame:
        return kmv_sketch(
            li.filter(F.col("l_returnflag") == flag), [], item, KMV_K
        ).select("h")

    est = theta_set_ops(side("A"), side("R"), "h", KMV_K)
    pa = li.filter(F.col("l_returnflag") == "A").select("l_partkey").distinct()
    pr = li.filter(F.col("l_returnflag") == "R").select("l_partkey").distinct()
    exact = (
        pa.join(pr, "l_partkey", "full_outer")
        .agg(F.count("*").alias("exact_union"))
        .crossJoin(pa.intersect(pr).agg(F.count("*").alias("exact_inter")))
    )
    return est.crossJoin(F.broadcast(exact))


def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min estimates for the exact top-20 partkeys by lineitem
    occurrence: (partkey, exact_cnt, cms_est); cms_est ≥ exact_cnt
    always (collisions only inflate)."""
    from tcrd_spark.sources.lake import load_table, split_for_scan

    # split guard (r12): the CMS cell explode does one md5 per row ×
    # one 600k-row single-row-group scan — 4.90 → 3.19s at sf0.1
    li = split_for_scan(spark, load_table(spark, sf_dir, "lineitem"))
    item = F.col("l_partkey").cast("string")
    grid = cms_build(li, item, CMS_DEPTH, CMS_WIDTH, CMS_SEED)
    top = (
        li.groupBy("l_partkey")
        .agg(F.count("*").alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), F.asc("l_partkey"))
        .limit(CMS_TOPN)
    )
    est = cms_estimates(
        grid,
        top.select(F.col("l_partkey").cast("string").alias("item")),
        "item",
        CMS_DEPTH,
        CMS_WIDTH,
        CMS_SEED,
    )
    return (
        top.join(
            est.select(F.col("item").cast("bigint").alias("l_partkey"), "cms_est"),
            "l_partkey",
        )
        .select("l_partkey", "exact_cnt", "cms_est")
    )


QUERIES = {
    "kmv_distinct": q_kmv_distinct,
    "theta_sketch_ops": q_theta_sketch_ops,
    "cms_heavy_hitters": q_cms_heavy_hitters,
}


def _sql_kmv(src: str, k: int) -> str:
    """CTE body: k smallest distinct hashes of l_partkey from `src`."""
    return f"""
        SELECT h FROM (
            SELECT h, row_number() OVER (ORDER BY h ASC) AS rn FROM (
                SELECT DISTINCT
                    {sql_hash60("CAST(l_partkey AS VARCHAR)")} AS h
                FROM {src}
            )
        ) WHERE rn <= {k}
    """


def _sql_cms_cells(h_expr: str) -> str:
    """SQL list literal of the d (d, col) cell structs for a hash expr."""
    parts = [
        f"struct_pack(d := {d}, col := "
        f"(({a} * (({h_expr}) % {MERSENNE_P}) + {b}) % {MERSENNE_P}) % {CMS_WIDTH})"
        for d, (a, b) in enumerate(minhash_params(CMS_DEPTH, CMS_SEED))
    ]
    return "[" + ", ".join(parts) + "]"


ORACLE = {
    "kmv_distinct": f"""
        WITH d AS (
            SELECT DISTINCT l_returnflag,
                   {sql_hash60("CAST(l_partkey AS VARCHAR)")} AS h
            FROM lineitem
        ),
        sk AS (
            SELECT l_returnflag, h FROM (
                SELECT l_returnflag, h,
                       row_number() OVER (
                           PARTITION BY l_returnflag ORDER BY h ASC
                       ) AS rn
                FROM d
            ) WHERE rn <= {KMV_K}
        ),
        est AS (
            SELECT l_returnflag,
                   count(*) AS k_eff,
                   max(h) AS kth_hash,
                   CAST(CASE WHEN count(*) < {KMV_K} THEN count(*)
                        ELSE floor({float(KMV_K - 1)!r} * {U60!r} / max(h))
                        END AS BIGINT) AS est_distinct
            FROM sk GROUP BY 1
        ),
        ex AS (
            SELECT l_returnflag,
                   count(DISTINCT l_partkey) AS exact_distinct
            FROM lineitem GROUP BY 1
        )
        SELECT est.*, ex.exact_distinct
        FROM est JOIN ex USING (l_returnflag)
        ORDER BY l_returnflag
    """,
    "theta_sketch_ops": f"""
        WITH ska AS ({_sql_kmv("lineitem WHERE l_returnflag = 'A'", KMV_K)}),
        skr AS ({_sql_kmv("lineitem WHERE l_returnflag = 'R'", KMV_K)}),
        th AS (
            SELECT least((SELECT max(h) FROM ska),
                         (SELECT max(h) FROM skr)) AS theta
        ),
        m AS (
            SELECT coalesce(ska.h, skr.h) AS h,
                   ska.h IS NOT NULL AS in_a,
                   skr.h IS NOT NULL AS in_b
            FROM ska FULL OUTER JOIN skr ON ska.h = skr.h
        ),
        c AS (
            SELECT count(*) AS c_union,
                   CAST(sum(CASE WHEN in_a AND in_b THEN 1 ELSE 0 END)
                        AS BIGINT) AS c_inter,
                   max(th.theta) AS theta
            FROM m CROSS JOIN th WHERE m.h < th.theta
        ),
        ex AS (
            SELECT
              (SELECT count(*) FROM (
                  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'
                  UNION
                  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
              )) AS exact_union,
              (SELECT count(*) FROM (
                  SELECT DISTINCT l_partkey FROM lineitem
                  WHERE l_returnflag = 'A'
                  INTERSECT
                  SELECT DISTINCT l_partkey FROM lineitem
                  WHERE l_returnflag = 'R'
              )) AS exact_inter
        )
        SELECT c_union, c_inter,
               CAST(floor(c_union * {U60!r} / theta) AS BIGINT) AS est_union,
               CAST(floor(c_inter * {U60!r} / theta) AS BIGINT) AS est_inter,
               round(c_inter / c_union, 6) AS est_jaccard,
               ex.exact_union, ex.exact_inter
        FROM c CROSS JOIN ex
    """,
    "cms_heavy_hitters": f"""
        WITH cells AS (
            SELECT unnest({_sql_cms_cells(
                sql_hash60("CAST(l_partkey AS VARCHAR)")
            )}) AS c
            FROM lineitem
        ),
        grid AS (
            SELECT c.d AS d, c.col AS col, count(*) AS cnt
            FROM cells GROUP BY 1, 2
        ),
        top AS (
            SELECT l_partkey, count(*) AS exact_cnt
            FROM lineitem GROUP BY 1
            ORDER BY exact_cnt DESC, l_partkey ASC LIMIT {CMS_TOPN}
        ),
        fanned AS (
            SELECT l_partkey, exact_cnt,
                   unnest({_sql_cms_cells(
                       sql_hash60("CAST(l_partkey AS VARCHAR)")
                   )}) AS c
            FROM top
        )
        SELECT f.l_partkey, f.exact_cnt, min(g.cnt) AS cms_est
        FROM fanned f JOIN grid g ON f.c.d = g.d AND f.c.col = g.col
        GROUP BY 1, 2
    """,
}
