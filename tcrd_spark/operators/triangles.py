"""Triangle counting with degree-ordered orientation — the standard
distributed-graph benchmark workload (Suri & Vassilvitskii, WWW'11
"Counting Triangles and the Curse of the Last Reducer").

Naive wedge enumeration joins the edge list to itself on the shared
endpoint: a hub of degree d contributes d² wedges — the 'last reducer'
that kills the job at scale. Orienting every edge from its lower-
(degree, id) endpoint to the higher one fixes it: each triangle is
counted exactly once from its minimum-degree corner, and per-node
wedge fan-out drops from deg² to O(arboricity²) — bounded for real
(power-law) graphs.

Plan shape: one distinct, one degree aggregate (broadcast-joined back),
one wedge self-join on the oriented source, one closing equi-join —
all key-partitioned; nothing quadratic in a hub's degree survives the
orientation. Reference parity: none (the reference's graph work is
BFS-distance only, §2.8); triangle support is the standard next
workload for clustering-coefficient / community-density analysis.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def oriented_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Undirected-dedup + degree orientation: (lo, hi) with
    (deg, id) of lo < (deg, id) of hi."""
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .union(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    keyed = und.join(F.broadcast(du), "u").join(F.broadcast(dv), "v")
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    return keyed.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("lo"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("hi"),
    )


def triangle_counts(
    edges: DataFrame | None,
    src: str,
    dst: str,
    prebuilt: DataFrame | None = None,
) -> DataFrame:
    """(node, n_triangles): triangles incident to each node.

    ``prebuilt``: an already-materialized oriented-edge frame. The
    oriented frame feeds THREE plan branches (e1, e2, closer ×2);
    uncached, Catalyst repeats the full scan→distinct→degree subtree
    per branch (VERDICT r6 #1: 145 Exchange nodes for a logically
    4-exchange query — ReuseExchange rescued execution but a
    non-byte-identical branch refactor would silently quadruple real
    work). Callers that reuse the graph should pass a cached frame."""
    o = prebuilt if prebuilt is not None else oriented_edges(edges, src, dst)
    e1 = o.select(F.col("lo").alias("a"), F.col("hi").alias("b"))
    e2 = o.select(F.col("lo").alias("a"), F.col("hi").alias("c"))
    wedges = e1.join(e2, "a").filter(F.col("b") < F.col("c"))
    # close the wedge with the (b, c) edge in EITHER orientation
    closer = o.select(
        F.col("lo").alias("b"), F.col("hi").alias("c")
    ).unionAll(o.select(F.col("hi").alias("b"), F.col("lo").alias("c")))
    tris = wedges.join(closer, ["b", "c"])
    # ONE pass over the closed triangles: a 3-branch union of selects
    # would re-execute the wedge/closing joins once per corner (the
    # printed plan showed the whole subtree ×3; ReuseExchange is a
    # rescue, not a plan) — Generate emits the 3 corners row-locally
    corners = tris.select(
        F.explode(F.array("a", "b", "c")).alias("node")
    )
    return corners.groupBy("node").agg(F.count("*").alias("n_triangles"))


# ------------------------------------------------- registered queries


# cached oriented-edge frame keyed by (applicationId, sf_dir) — the
# _PR_EDGE_MEMO idiom (operators/graph.py): bench reps and the oracle
# sweep re-invoke q_triangle_counts within one session, and the frame
# is scan-derived, so memoize-and-cache rather than rebuild per call
_TRI_EDGE_MEMO: dict = {}


def q_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts over the 2%-of-orders part-chain graph
    (the apsp edge set, undirected)."""
    from tcrd_spark.operators.graph import _order_chain_edges

    key = (spark.sparkContext.applicationId, sf_dir)
    # evict every other entry (r7 ADVICE): dead applications' frames
    # are unreachable anyway, and a second sf_dir's cached edges would
    # otherwise pin executor storage for the session lifetime — no
    # caller interleaves sf_dirs, so at most ONE live entry is ever
    # useful
    for stale in [k for k in _TRI_EDGE_MEMO if k != key]:
        df = _TRI_EDGE_MEMO.pop(stale)
        try:
            df.unpersist()
        except Exception:
            pass  # frame from a dead application: nothing to release
    o = _TRI_EDGE_MEMO.get(key)
    if o is None:
        edges = _order_chain_edges(spark, sf_dir, order_mod=50)
        o = oriented_edges(edges, "src", "dst").cache()
        _TRI_EDGE_MEMO[key] = o
    return triangle_counts(None, "src", "dst", prebuilt=o)


QUERIES = {"triangle_counts": q_triangle_counts}

ORACLE = {
    "triangle_counts": """
        WITH raw AS (
            SELECT g, src, dst FROM (
              SELECT l_orderkey AS g, l_partkey AS src,
                     lead(l_partkey) OVER (PARTITION BY l_orderkey
                                           ORDER BY l_linenumber, l_partkey)
                         AS dst
              FROM lineitem
            ) WHERE dst IS NOT NULL AND src != dst AND g % 50 = 0
        ),
        und AS (
            SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
            FROM raw WHERE src != dst
        ),
        deg AS (
            SELECT node, count(*) AS deg FROM (
                SELECT u AS node FROM und
                UNION ALL SELECT v FROM und
            ) GROUP BY 1
        ),
        o AS (
            SELECT CASE WHEN (du.deg, und.u) < (dv.deg, und.v)
                        THEN und.u ELSE und.v END AS lo,
                   CASE WHEN (du.deg, und.u) < (dv.deg, und.v)
                        THEN und.v ELSE und.u END AS hi
            FROM und
            JOIN deg du ON du.node = und.u
            JOIN deg dv ON dv.node = und.v
        ),
        wedges AS (
            SELECT e1.lo AS a, e1.hi AS b, e2.hi AS c
            FROM o e1 JOIN o e2 ON e1.lo = e2.lo AND e1.hi < e2.hi
        ),
        closer AS (
            SELECT lo AS b, hi AS c FROM o
            UNION ALL SELECT hi, lo FROM o
        ),
        tris AS (
            SELECT a, b, c FROM wedges JOIN closer USING (b, c)
        ),
        corners AS (
            SELECT a AS node FROM tris
            UNION ALL SELECT b FROM tris
            UNION ALL SELECT c FROM tris
        )
        SELECT node, count(*) AS n_triangles FROM corners GROUP BY 1
    """,
}
