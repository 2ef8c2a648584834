"""Scalar-quantized (SQ8) ANN — the memory-compression scale path.

At 100 TB the embedding column dominates storage: 64 float64 = 512
bytes/vector. SQ8 stores one uint8 code per dimension (64 bytes, 8×
smaller), learned from per-dimension [min, max] ranges:

    code_d   = min(255, ⌊(x_d − mn_d) / span_d · 256⌋)
    center_d = mn_d + (code_d + 0.5) / 256 · span_d

Search is ASYMMETRIC (Faiss SQ convention): queries stay full
precision, corpus vectors are dequantized to bucket centers on the
fly — so the scan reads 64-byte codes, not 512-byte vectors, and the
top-k machinery is exactly `similarity.brute_force_topk` over the
reconstructed corpus (same WindowGroupLimit plan). Compose with the
IVF index for the full Faiss-style IVF+SQ pipeline: the cell scan
then reads n_probe/n_cells of a table 8× smaller.

Determinism is engineered like the rest of the similarity family:
range stats are exact min/max aggregates (order-independent), the
quantize/dequantize expressions are the same left-assoc double ops on
both engines, and the dot fold is the unrolled `dedup.dot`. Even the
quantization error is therefore bit-identical in DuckDB, and the
query is fully oracle-adjudicated (`ann_sq_topk`). Recall vs the
exact baseline is pytest-bounded (tests/test_sq.py).

Everything is whole-stage-codegen column expressions (unrolled
per-dimension arrays, no higher-order folds, no Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# codes per dimension: 8-bit
_LEVELS = 256
# the synthetic embeddings table is 64-dim (TESTDATA.md)
_EMB_DIM = 64


def quantize_stats(corpus: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """One-row (mins, spans) double arrays — per-dimension ranges.
    Exact min/max: order-independent, so engine-reproducible.

    posexplode + groupBy(d): the explode is map-side and the partial
    aggregate reduces every partition to dim rows BEFORE the exchange,
    so the shuffle is dim × n_partitions scalars regardless of corpus
    size. (The tempting 2·dim-scalar-aggregates-in-one-pass form was
    measured 3× slower end-to-end: 128 separate agg expressions cost
    seconds of py4j plan construction + codegen at ANY data size.)"""
    dims = (
        corpus.select(
            F.posexplode(F.col(vec_col).cast("array<double>")).alias(
                "d", "x"
            )
        )
        .groupBy("d")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    )
    return dims.agg(
        F.array_sort(F.collect_list(F.struct("d", "mn", "mx"))).alias("a")
    ).select(
        F.transform("a", lambda z: z["mn"]).alias("mins"),
        F.transform("a", lambda z: z["mx"] - z["mn"]).alias("spans"),
    )


def _code(v, mins, spans, i: int):
    x = F.element_at(v, i + 1)
    mn = F.element_at(mins, i + 1)
    s = F.element_at(spans, i + 1)
    return F.when(s == 0, F.lit(0)).otherwise(
        F.least(
            F.lit(_LEVELS - 1),
            F.floor((x - mn) / s * _LEVELS).cast("int"),
        )
    )


def sq_encode(
    df: DataFrame, id_col: str, vec_col: str, stats: DataFrame, dim: int
) -> DataFrame:
    """(id, codes array<int>) — 8-bit codes per dimension. Unrolled
    array constructor (codegen; interpreted transform() folds are the
    measured 10× slow path, see dedup.dot)."""
    v = F.col(vec_col).cast("array<double>")
    return df.crossJoin(F.broadcast(stats)).select(
        id_col,
        F.array(
            *[_code(v, F.col("mins"), F.col("spans"), i) for i in range(dim)]
        ).alias("codes"),
    )


def sq_dequantize(
    df: DataFrame, id_col: str, stats: DataFrame, dim: int,
    out_col: str = "dv",
) -> DataFrame:
    """(id, dv array<double>) — bucket centers from codes."""

    def center(i: int):
        c = F.element_at(F.col("codes"), i + 1)
        mn = F.element_at(F.col("mins"), i + 1)
        s = F.element_at(F.col("spans"), i + 1)
        return mn + (c + F.lit(0.5)) / F.lit(_LEVELS) * s

    return df.crossJoin(F.broadcast(stats)).select(
        id_col, F.array(*[center(i) for i in range(dim)]).alias(out_col)
    )


def _centers_expr(vec_col: str = "c_vec"):
    """Fused encode∘dequantize via zip_with (center_i is a pure
    function of (x_i, mn_i, span_i)) — SMALL expression trees. The
    wide unrolled form made Catalyst's CollapseProject inline the
    64-element array constructor into each of the 128 element_at
    terms of the downstream dot (measured: +10s of pure
    planning/codegen at ANY data size). Expects `mins`/`spans`
    columns from quantize_stats alongside `vec_col`."""
    v = F.col(vec_col).cast("array<double>")
    paired = F.zip_with(
        v, F.col("mins"), lambda x, m: F.struct(x.alias("x"), m.alias("m"))
    )
    return F.zip_with(
        paired,
        F.col("spans"),
        lambda z, s: F.when(s == 0, z["m"]).otherwise(
            z["m"]
            + (
                F.least(
                    F.lit(_LEVELS - 1),
                    F.floor((z["x"] - z["m"]) / s * _LEVELS).cast("int"),
                )
                + F.lit(0.5)
            )
            / F.lit(_LEVELS)
            * s
        ),
    )


def sq_dequant_frame(corpus: DataFrame, dim: int) -> DataFrame:
    """(c_id, c_vec): the corpus reconstructed to SQ8 bucket centers —
    the table the asymmetric scan reads (uncached; see sq_topk)."""
    stats = quantize_stats(corpus, "c_vec", dim)
    return corpus.crossJoin(F.broadcast(stats)).select(
        "c_id", _centers_expr().alias("c_vec")
    )


def sq_topk(
    queries: DataFrame, corpus: DataFrame, dim: int, k: int,
    _caches: list | None = None,
) -> DataFrame:
    """Asymmetric SQ8 top-k: full-precision queries (q_id, q_vec) vs
    the quantize→dequantize corpus (c_id, c_vec). Same output shape as
    the exact baseline: (q_id, c_id, score, rank).

    Callers that invoke repeatedly pass ``_caches`` and unpersist after
    the terminal action (the incremental_near_dups convention — ADVICE
    r5 #3: an untracked per-call cache() accumulates executor storage
    across bench reps / the threaded oracle sweep)."""
    from tcrd_spark.pipeline.similarity import brute_force_topk

    deq = sq_dequant_frame(corpus, dim)
    # Materialization barrier: in a real deployment the codes ARE the
    # persisted index (that is the point of SQ — the scan reads 64-byte
    # codes from disk); cache() is the single-session stand-in. It
    # also stops the optimizer from substituting the center expression
    # into every dot term (the blowup above) — the top-k reads stored
    # arrays exactly like it would read the persisted index.
    deq = deq.cache()
    if _caches is not None:
        _caches.append(deq)
    return brute_force_topk(queries, deq, dim, k)


# ------------------------------------------------- registered queries

# The cached SQ code tables stand in for the persisted index, so the
# registered queries memoize them per (application, sf_dir, kind):
# repeated invocations (bench min-of-3 reps, the threaded oracle
# sweep) reuse ONE cached DataFrame instead of caching a fresh copy
# per call and accumulating executor storage (ADVICE r5 #3). Bounded
# by contract — one entry per sf_dir per session, like the persisted
# index it models.
_CODE_TABLES: dict[tuple, DataFrame] = {}


def _memo_cached(spark: SparkSession, key: tuple, build) -> DataFrame:
    full = (spark.sparkContext.applicationId,) + key
    df = _CODE_TABLES.get(full)
    if df is None:
        df = build().cache()
        _CODE_TABLES[full] = df
    return df


def q_ann_sq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 cosine top-10 for the standard 5-query panel (vec_id < 5),
    corpus = every embedding, quantized."""
    from tcrd_spark.pipeline.similarity import brute_force_topk
    from tcrd_spark.sources.lake import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    qs = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    deq = _memo_cached(
        spark, (sf_dir, "sq"), lambda: sq_dequant_frame(corpus, _EMB_DIM)
    )
    return brute_force_topk(qs, deq, _EMB_DIM, k=10)


def q_ann_ivfsq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed Faiss pipeline: IVF cell assignment on the
    full-precision vectors (the index build), SQ8 codes inside the
    inverted lists, asymmetric scoring of the probed cells — the scan
    a 100 TB deployment runs (n_probe/n_cells of a table 8× smaller).
    Same deterministic first-8 centroids / probe-2 contract as
    `ann_ivf`, so the two queries differ ONLY by quantization."""
    from pyspark.sql.window import Window

    from tcrd_spark.pipeline.similarity import (
        _pair_score,
        _probe_cells,
        assign_cells,
    )
    from tcrd_spark.sources.lake import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    qs = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cell_id"),
        F.col("embedding").alias("cell_vec"),
    )
    assigned = assign_cells(corpus, cents, _EMB_DIM).select(
        "c_id", "c_vec", "cell_id"
    )
    stats = quantize_stats(corpus, "c_vec", _EMB_DIM)

    # the SQ-coded inverted lists — the memoized cache() stands in for
    # the persisted cell-partitioned code table (see _memo_cached)
    def _build_lists() -> DataFrame:
        return (
            assigned.crossJoin(F.broadcast(stats))
            .select("c_id", "cell_id", _centers_expr().alias("c_vec"))
            .withColumn(
                "c_vec_nrm",
                F.sqrt(
                    F.aggregate(
                        F.zip_with("c_vec", "c_vec", lambda a, b: a * b),
                        F.lit(0.0),
                        lambda acc, t: acc + t,
                    )
                ),
            )
        )

    lists = _memo_cached(spark, (sf_dir, "ivfsq"), _build_lists)
    probes = _probe_cells(qs, cents, _EMB_DIM, n_probe=2)
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("c_id"))
    return (
        lists.join(F.broadcast(probes), "cell_id")
        .select(
            "q_id", "c_id",
            _pair_score("q_vec", "c_vec", _EMB_DIM).alias("score"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("q_id", "c_id", "score", "rank")
    )


QUERIES = {"ann_sq_topk": q_ann_sq_topk, "ann_ivfsq": q_ann_ivfsq}


def _sql_dot(av: str, bv: str) -> str:
    return (
        "("
        + " + ".join(f"{av}[{i + 1}] * {bv}[{i + 1}]" for i in range(_EMB_DIM))
        + ")"
    )


_DEQ = f"""
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
dims AS (
  SELECT i, min(v[i]) AS mn, max(v[i]) AS mx
  FROM e CROSS JOIN range(1, {_EMB_DIM} + 1) r(i)
  GROUP BY i
),
stats AS (
  SELECT array_agg(mn ORDER BY i) AS mins,
         array_agg(mx - mn ORDER BY i) AS spans
  FROM dims
),
enc AS (
  SELECT vec_id,
         list_transform(range(1, {_EMB_DIM} + 1), i ->
           CASE WHEN spans[i] = 0 THEN 0
                ELSE least({_LEVELS - 1},
                           CAST(floor((v[i] - mins[i]) / spans[i]
                                      * {_LEVELS}) AS INT))
           END) AS codes
  FROM e CROSS JOIN stats
),
deq AS (
  SELECT vec_id,
         list_transform(range(1, {_EMB_DIM} + 1), i ->
           mins[i] + (codes[i] + 0.5) / {_LEVELS} * spans[i]) AS dv
  FROM enc CROSS JOIN stats
),
dn AS (
  SELECT vec_id, dv, sqrt({_sql_dot("dv", "dv")}) AS nrm FROM deq
),
qn AS (
  SELECT vec_id AS q_id, v, sqrt({_sql_dot("v", "v")}) AS nrm
  FROM e WHERE vec_id < 5
)
"""

def _sql_score(a: str, av: str, b: str, bv: str) -> str:
    return (
        f"round({_sql_dot(f'{a}.{av}', f'{b}.{bv}')} "
        f"/ ({a}.nrm * {b}.nrm), 6)"
    )


ORACLE = {
    "ann_ivfsq": f"""
        WITH {_DEQ},
        c AS (SELECT vec_id AS c_id, v, sqrt({_sql_dot("v", "v")}) AS nrm
              FROM e),
        cent AS (SELECT vec_id AS cell_id, v,
                        sqrt({_sql_dot("v", "v")}) AS nrm
                 FROM e WHERE vec_id < 8),
        assigned AS (
          SELECT c_id, cell_id FROM (
            SELECT c.c_id, cent.cell_id,
                   row_number() OVER (
                     PARTITION BY c.c_id
                     ORDER BY {_sql_score("c", "v", "cent", "v")} DESC,
                              cent.cell_id ASC) AS rn
            FROM c CROSS JOIN cent
          ) WHERE rn = 1
        ),
        probes AS (
          SELECT q_id, v, nrm, cell_id FROM (
            SELECT q.q_id, q.v, q.nrm, cent.cell_id,
                   row_number() OVER (
                     PARTITION BY q.q_id
                     ORDER BY {_sql_score("q", "v", "cent", "v")} DESC,
                              cent.cell_id ASC) AS rn
            FROM qn q CROSS JOIN cent
          ) WHERE rn <= 2
        ),
        scored AS (
          SELECT p.q_id, a.c_id,
                 {_sql_score("p", "v", "dn", "dv")} AS score
          FROM probes p
          JOIN assigned a ON p.cell_id = a.cell_id
          JOIN dn ON dn.vec_id = a.c_id
        ),
        ranked AS (
          SELECT q_id, c_id, score,
                 row_number() OVER (PARTITION BY q_id
                                    ORDER BY score DESC, c_id ASC) AS rank
          FROM scored
        )
        SELECT q_id, c_id, score, rank FROM ranked WHERE rank <= 10
    """,
    "ann_sq_topk": f"""
        WITH {_DEQ},
        scored AS (
          SELECT qn.q_id, dn.vec_id AS c_id,
                 round({_sql_dot("qn.v", "dn.dv")} / (qn.nrm * dn.nrm), 6)
                   AS score
          FROM dn CROSS JOIN qn
        ),
        ranked AS (
          SELECT q_id, c_id, score,
                 row_number() OVER (PARTITION BY q_id
                                    ORDER BY score DESC, c_id ASC) AS rank
          FROM scored
        )
        SELECT q_id, c_id, score, rank FROM ranked WHERE rank <= 10
    """,
}
