"""KEGG distance chain: KGML files → kegg_distance → kegg_nearest_tclin.

The reference runs this as two sequential loader scripts:

- `loaders/load-KEGGDistances.py:85-108` parses each KGML file to a
  NetworkX digraph (group entries → cliques, `loaders/KEGG_Graph.py:
  20-60`), runs ``all_pairs_shortest_path_length`` per pathway, and
  min-merges (node1, node2) distances across pathways; then `:123-167`
  strips the ``hsa:`` prefix, resolves each KEGG gene id to protein
  id(s) through ``find_targets({'geneid': ...})`` with positive
  (gid2pids) and negative (notfnd) caches, and fans out every
  pids1×pids2 combination to one ``ins_kegg_distance`` row.
  Golden counts (`doc/README_v6.txt:1633-1641`): 292 KGML files →
  204,569 unique pairs → 208,238 rows inserted, 6,560 skipped
  (200 unresolved ids).
- `loaders/load-KEGGNearestTclins.py:83-110` walks every non-Tclin
  target and stores the nearest upstream (kd.pid1 = Tclin,
  kd.pid2 = self) and downstream (kd.pid1 = self, kd.pid2 = Tclin)
  Tclin targets at MIN(distance), keeping ties
  (`loaders/TCRD.py:2800-2869`). Golden counts
  (`doc/README_v6.txt:1655-1660`): 1,864 targets with upstream rows
  (7,563 rows), 1,919 with downstream (8,348 rows).

Spark-first: one declarative pipeline — mapInPandas KGML parse →
per-pathway BFS in applyInPandas (one shuffle) → groupBy min-merge →
broadcast geneid resolution join (the memoized cache pattern becomes
the join itself; the negative cache is the null side) → rank-window
nearest with ties. No driver loop anywhere; at 100 TB the only
shuffles are the per-pathway co-location and the two group-bys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tcrd_spark.operators.graph import (
    apsp_local,
    min_distance_merge,
    nearest_flagged,
)
from tcrd_spark.sources.kgml import kgml_edges


def kegg_distances(
    spark: SparkSession,
    kgml_xmls: list[str],
    protein: DataFrame,
    max_hops: int = 32,
) -> dict[str, DataFrame]:
    """KGML documents + protein(id, geneid) → kegg_distance rows.

    Returns {'kegg_distance': (pid1, pid2, distance), 'pairs': the
    pre-resolution (geneid1, geneid2, distance) min-merge, 'notfnd':
    distinct unresolved geneids} — the three counts the reference
    build log records (`doc/README_v6.txt:1633-1641`).
    """
    edges = kgml_edges(spark, kgml_xmls)
    spl = apsp_local(edges, "pathway", "src", "dst", max_hops=max_hops)
    pairs = (
        min_distance_merge(spl, "pathway", "src", "dst")
        # strip the organism prefix AFTER the graph math: node identity
        # inside a pathway is the full KEGG name
        # (`loaders/load-KEGGDistances.py:132-133`)
        .select(
            F.regexp_replace("src", r"^hsa:", "").alias("geneid1"),
            F.regexp_replace("dst", r"^hsa:", "").alias("geneid2"),
            "distance",
        )
    )
    p = F.broadcast(
        protein.select(
            F.col("id").alias("protein_id"),
            F.col("geneid").cast("string").alias("geneid"),
        ).filter(F.col("geneid").isNotNull())
    )
    resolved = (
        pairs.join(p.withColumnRenamed("geneid", "geneid1"), "geneid1", "left")
        .withColumnRenamed("protein_id", "pid1")
        .join(p.withColumnRenamed("geneid", "geneid2"), "geneid2", "left")
        .withColumnRenamed("protein_id", "pid2")
    )
    kegg_distance = resolved.filter(
        F.col("pid1").isNotNull() & F.col("pid2").isNotNull()
    ).select("pid1", "pid2", "distance")
    notfnd = (
        resolved.filter(F.col("pid1").isNull())
        .select(F.col("geneid1").alias("geneid"))
        .union(
            resolved.filter(F.col("pid2").isNull()).select(
                F.col("geneid2").alias("geneid")
            )
        )
        .distinct()
    )
    return {"kegg_distance": kegg_distance, "pairs": pairs, "notfnd": notfnd}


def kegg_nearest_tclins(
    kegg_distance: DataFrame, target: DataFrame, t2tc: DataFrame
) -> DataFrame:
    """kegg_distance + target(tdl) → kegg_nearest_tclin rows.

    Output (protein_id, tclin_id, direction, distance): per non-Tclin
    protein, the Tclin protein(s) at minimum distance, ties kept, in
    both directions (`loaders/load-KEGGNearestTclins.py:83-110`;
    MIN + re-query SQL `loaders/TCRD.py:2800-2869` collapsed to one
    rank-window pass per direction).
    """
    ptdl = t2tc.join(target.select(F.col("id").alias("target_id"), "tdl"),
                     "target_id").select("protein_id", "tdl")
    tclin = F.broadcast(
        ptdl.filter(F.col("tdl") == "Tclin").select("protein_id").distinct()
    )
    non_tclin = ptdl.filter(F.col("tdl") != "Tclin").select(
        "protein_id"
    ).distinct()

    def one_direction(src: str, dst: str, name: str) -> DataFrame:
        d = kegg_distance.select(
            F.col(src).alias("protein_id"),
            F.col(dst).alias("tclin_id"),
            "distance",
        ).join(non_tclin, "protein_id", "left_semi")
        near = nearest_flagged(
            d, tclin.withColumnRenamed("protein_id", "tclin_id"),
            "protein_id", "tclin_id", "tclin_id",
        )
        return near.select(
            "protein_id", "tclin_id", F.lit(name).alias("direction"),
            "distance",
        )

    # downstream: self = pid1, Tclin = pid2; upstream: the reverse
    return one_direction("pid1", "pid2", "downstream").unionByName(
        one_direction("pid2", "pid1", "upstream")
    )


def kegg_chain(
    spark: SparkSession,
    kgml_xmls: list[str],
    protein: DataFrame,
    target: DataFrame,
    t2tc: DataFrame,
    max_hops: int = 32,
) -> dict[str, DataFrame]:
    """The full two-loader chain as one pipeline; keys mirror the two
    lake tables plus the build-log count frames."""
    out = kegg_distances(spark, kgml_xmls, protein, max_hops=max_hops)
    out["kegg_nearest_tclin"] = kegg_nearest_tclins(
        out["kegg_distance"], target, t2tc
    )
    # lineage, exactly as the two reference loaders record it
    # (`loaders/load-KEGGDistances.py:68-72`,
    # `loaders/load-KEGGNearestTclins.py:65-69`)
    from tcrd_spark.quality.provenance import record_load

    ds1, prov1 = record_load(
        spark, "KEGG Distances",
        "IDG-KMC generated data by Steve Mathias at UNM.",
        [("kegg_distance", None, None)],
    )
    ds2, prov2 = record_load(
        spark, "KEGG Nearest Tclins",
        "IDG-KMC generated data by Steve Mathias at UNM.",
        [("kegg_nearest_tclin", None, None)],
    )
    out["dataset"] = ds1.unionByName(ds2)
    out["provenance"] = prov1.unionByName(prov2)
    return out
