"""Corpus-construction operators for a large-scale training-data
pipeline: near-dup GROUP resolution (connected components), dedup
against an existing corpus (incremental near-dups), deterministic
sharding / interleaving, stratified sampling, global-quantile
filtering, and fixed-token-budget sequence packing.

The reference (unmtransinfo/TCRD) has no corpus tooling — these are
the LLM-data-pipeline extension surface (BASELINE.json north star),
built scale-first:

- every hash is the portable ``hash60`` (functions/hashing.py), so a
  DuckDB oracle reproduces results bit-identically;
- connected components is the alternating large-star/small-star
  algorithm (Kiveris et al., "Connected Components in MapReduce and
  Beyond", SoCC'14) — O(log n) rounds, each round two key-grouped
  shuffles, never any driver-side graph state;
- sharding / sampling / packing are pure window + hash expressions
  (whole-stage codegen, one hash-partitioned exchange each).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tcrd_spark.functions.hashing import hash60
from tcrd_spark.operators.lineage import _truncate

# Size-adaptive threshold for the connected-components driver fast
# path (see connected_components below) — the CC analogue of
# spark.sql.autoBroadcastJoinThreshold: edge sets at or below this
# count (~3 MB of longs at the default) are resolved by driver
# union-find instead of the O(log n)-round distributed star loop.
# Parameterised for the cluster regime; 0 disables the fast path.
_CC_DRIVER_MAX = int(os.environ.get("TCRD_CC_DRIVER_MAX", "200000"))


# ------------------------------------------------------- connected components

def connected_components(
    edges: DataFrame, src: str, dst: str, max_iter: int = 25,
    _caches: list | None = None,
) -> DataFrame:
    """Undirected edge list → (node, component), component = min node
    id reachable. Only nodes that appear in ``edges`` are returned
    (callers left-join isolated nodes back, label = self).

    Alternating large-star / small-star (Kiveris et al. SoCC'14 §3):
    each round rewires edges toward per-neighborhood minima; the edge
    set converges to a star forest rooted at each component's min in
    O(log n) rounds. Per round: two groupBy shuffles on node id, both
    map-side combinable (MIN). Nothing ever touches the driver except
    the O(1) convergence test; lineage is truncated per round so
    Catalyst analysis stays O(1) per iteration. At 100 TB this is the
    standard formulation: no component is ever materialized as a
    single task's worth of state, so hub components (a viral document
    duplicated everywhere) spread across the cluster instead of OOMing
    one executor.
    """
    def _sig(df: DataFrame) -> tuple:
        # O(1)-output convergence signature: (edge count, checksum).
        # One job instead of count + exceptAll (a full shuffle join);
        # xxhash64 is used ONLY for change detection, never in results.
        row = df.agg(
            F.count("*").alias("n"),
            F.bit_xor(F.xxhash64("u", "v")).alias("s"),
        ).first()
        return (row["n"], row["s"])

    e = (
        edges.select(
            F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    # Size-adaptive fast path (r11 optimization, the broadcast-join-
    # below-threshold principle applied to CC): at or below
    # _CC_DRIVER_MAX edges (~3 MB of longs) a driver union-find
    # resolves components in O(α) per edge with ZERO per-round Spark
    # jobs, where the star loop paid 3 shuffles + a cut + a signature
    # action per round. Components are identical by construction (min
    # reachable id). Above the threshold — the 100 TB regime — the
    # alternating-star loop below runs unchanged. The size test IS the
    # collect (r12, guide §1/§2: the separate count job doubled the
    # AQE stage cascade of the upstream pair plan — 16 jobs → 8 in
    # corpus_pipeline_v2's stage 4): limit(MAX+1) bounds the driver
    # memory exactly like the count test did, and the extra row, when
    # present, proves the edge set is over threshold without counting
    # it. Union-find labels are row-order-independent, so the limit's
    # partition order does not matter.
    e = e.cache()
    # Arrow transfer (r12, guide §6 — the pagerank fast-path lesson):
    # toPandas moves the bounded edge list 4-8× faster than collect()'s
    # pickled Rows; values are exact int64 either way (u/v are cast to
    # long and the != filter drops NULL endpoints before this point)
    pdf = e.limit(_CC_DRIVER_MAX + 1).toPandas()
    if len(pdf) <= _CC_DRIVER_MAX:
        e.unpersist()
        us = pdf[pdf.columns[0]].tolist()
        vs = pdf[pdf.columns[1]].tolist()
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:  # path compression
                parent[x], x = r, parent[x]
            return r

        for u, v in zip(us, vs):
            if u not in parent:
                parent[u] = u
            if v not in parent:
                parent[v] = v
            ru, rv = find(u), find(v)
            if ru != rv:
                parent[ru] = rv
        comp_min: dict[int, int] = {}
        for node in parent:
            r = find(node)
            m = comp_min.get(r)
            if m is None or node < m:
                comp_min[r] = node
        spark = edges.sparkSession
        # the star loop's fixpoint is a star forest with NO self-edges,
        # so each component's min (the root) is absent from its output;
        # match that exactly — callers coalesce missing nodes to self
        out = [
            (node, comp)
            for node in parent
            if (comp := comp_min[find(node)]) != node
        ]
        if not out:
            return spark.createDataFrame(
                [], schema="node long, component long"
            )
        import pandas as pd

        return spark.createDataFrame(
            pd.DataFrame(out, columns=["node", "component"]),
            schema="node long, component long",
        )
    # superseded round cuts are unpersisted as the loop advances
    # (ADVICE r6: these previously pinned one RDD per round for the
    # session); only the final cut stays pinned — the returned plan
    # reads it — handed to ``_caches`` when given.
    held: list = [e]
    e = _truncate(e, held)
    prev = _sig(e)
    # per-neighborhood minima via an unordered window (min over the
    # whole u-partition): ONE exchange per star step, versus the
    # textbook groupBy+self-join formulation's three — the window and
    # the emit read the same shuffled partition
    wu = Window.partitionBy("u")
    converged = False
    for _ in range(max_iter):
        # --- large-star: for each node n, m = min(Γ(n) ∪ {n});
        #     emit (v, m) for every neighbor v > n
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        ls = (
            sym.withColumn("m", F.least(F.min("v").over(wu), F.col("u")))
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
        )
        # --- small-star: orient edges high→low; for each node n,
        #     m = min(Γ(n)); emit (v, m) for v ∈ Γ(n) plus (n, m)
        o = ls.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).withColumn("m", F.min("v").over(wu))
        ss = (
            o.select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(o.select("u", F.col("m").alias("v")))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )
        ss = _truncate(ss, held)
        # converged ⇔ the edge set is unchanged (a star forest is a
        # fixpoint of both rewrites). The signature is the cheap
        # screen; a matching signature is CONFIRMED with one exact
        # check before declaring convergence — a (count, xor-of-hash)
        # collision must not silently emit wrong component labels.
        # Counts match and both sides are distinct sets, so one-sided
        # exceptAll emptiness ⇔ set equality. Runs on the final round
        # only (one extra job across the whole algorithm).
        cur = _sig(ss)  # full agg: the new cut is materialized here
        done = cur == prev and ss.exceptAll(e).isEmpty()
        while len(held) > 1:  # release every superseded round cut
            held.pop(0).unpersist()
        if done:
            e = ss
            converged = True
            break
        prev = cur
        e = ss
    if _caches is not None:
        _caches.extend(held)
    if not converged:
        # alternating stars converge in O(log n) rounds (Kiveris §4);
        # exhausting max_iter means labels may be split mid-merge —
        # fail loudly rather than return silently-wrong components
        raise RuntimeError(
            f"connected_components: no fixpoint after {max_iter} rounds; "
            "raise max_iter"
        )
    return e.select(F.col("u").alias("node"), F.col("v").alias("component"))


def dedup_groups(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id",
    rep_by: str | None = None, _caches: list | None = None,
) -> DataFrame:
    """Resolve near-dup PAIRS into transitive GROUPS, one row per doc:
    (doc_id, group_id, group_sz). group_id = min doc id of the group
    (isolated docs form their own group); the canonical "keep one
    representative per duplicate cluster" step that follows any pair
    detector — pairs alone under-remove: A~B, B~C must all collapse
    even when A~C scored below threshold.

    ``rep_by`` (VERDICT r5 #7): a score column in ``docs`` (higher =
    better) elects each group's REPRESENTATIVE — real pipelines keep
    the highest-quality member (a Gopher/perplexity score, SemDeDup's
    distance-from-centroid), not the smallest id. Adds a rep_id
    column: argmax(rep_by), ties to the smallest id. The election is
    ONE map-side-combinable max-of-struct aggregate per group (scores
    fold before the exchange) — deliberately NOT an ordered window, so
    a viral million-member group costs its partitions a merge of
    partial maxima, never a single-task sort.
    """
    cc = connected_components(pairs, "id_a", "id_b", _caches=_caches)
    labeled = (
        docs.select(
            F.col(id_col).cast("long").alias(id_col),
            *([F.col(rep_by)] if rep_by else []),
        )
        .join(cc.withColumnRenamed("node", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("component", F.col(id_col)).alias("group_id"),
            *([rep_by] if rep_by else []),
        )
    )
    sizes = labeled.groupBy("group_id").agg(F.count("*").alias("group_sz"))
    out = labeled.join(sizes, "group_id").select(
        id_col, "group_id", "group_sz"
    )
    if rep_by is None:
        return out
    # max of (score, -id) ⇒ highest score, then smallest id — an
    # order-independent aggregate, engine-reproducible
    reps = labeled.groupBy("group_id").agg(
        F.max(
            F.struct(
                F.col(rep_by).alias("s"),
                (-F.col(id_col)).alias("negid"),
            )
        ).alias("m")
    ).select("group_id", (-F.col("m.negid")).alias("rep_id"))
    return out.join(reps, "group_id").select(
        id_col, "group_id", "group_sz", "rep_id"
    )


def dedup_group_reps(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id",
    rep_by: str | None = None, _caches: list | None = None,
) -> DataFrame:
    """The REPRESENTATIVE ids only — exactly the set
    ``dedup_groups(...).filter(id == rep_id)`` (or ``== group_id`` when
    ``rep_by`` is None) selects, without computing what that
    composition throws away (r12, guide §2.3/§2.4): the group-size
    aggregate and the two join-backs onto every member row existed
    only to build the full per-doc frame. Keep-one gates (the corpus
    pipelines) consume the rep SET alone, so this form stops at the
    election aggregate: min-id reps are simply the distinct group
    labels; rep_by reps are the same max-of-(score, -id) struct
    aggregate dedup_groups runs, minus sizes and join-backs — 3 fewer
    exchanges per gate in the composed pipelines' plans.
    """
    cc = connected_components(pairs, "id_a", "id_b", _caches=_caches)
    labeled = (
        docs.select(
            F.col(id_col).cast("long").alias(id_col),
            *([F.col(rep_by)] if rep_by else []),
        )
        .join(cc.withColumnRenamed("node", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("component", F.col(id_col)).alias("group_id"),
            *([rep_by] if rep_by else []),
        )
    )
    if rep_by is None:
        # the min-id representative IS the group label
        return labeled.select(
            F.col("group_id").alias(id_col)
        ).distinct()
    return (
        labeled.groupBy("group_id")
        .agg(
            F.max(
                F.struct(
                    F.col(rep_by).alias("s"),
                    (-F.col(id_col)).alias("negid"),
                )
            ).alias("m")
        )
        .select((-F.col("m.negid")).alias(id_col))
    )


# ------------------------------------------------- incremental (batch) dedup

def incremental_near_dups(
    batch: DataFrame,
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.3,
    _caches: list | None = None,
) -> DataFrame:
    """Dedup an incoming BATCH against an existing CORPUS without
    re-pairing the corpus with itself — the production shape: the
    corpus's shingle index is precomputed/persisted once and each
    ingest batch probes it.

    Returns one row per batch doc: (doc_id, exact_src, near_src,
    verdict) where exact_src = min corpus doc with identical text,
    near_src = min corpus doc with n-gram Jaccard ≥ threshold, and
    verdict ∈ {'exact', 'near', 'new'}. Candidate generation is a
    shared-shingle equi-join batch→corpus (inverted-index probe: cost
    ∝ batch size × avg postings, never corpus²); verify is exact
    Jaccard on candidates only.

    The shingle frames are cached (each feeds both the inverted index
    and the verify join). Callers that invoke this repeatedly — the
    streaming ingest sink runs it once per micro-batch — pass a
    ``_caches`` list and unpersist after their terminal action, so
    cached partitions don't accumulate in executor storage.
    """
    from tcrd_spark.pipeline.dedup import hashed_shingles

    b_hash = batch.select(
        F.col(id_col).alias("b_id"), hash60(F.col(text_col)).alias("th")
    )
    c_hash = corpus.select(
        F.col(id_col).alias("c_id"), hash60(F.col(text_col)).alias("th")
    )
    exact = (
        b_hash.join(c_hash, "th")
        .groupBy("b_id")
        .agg(F.min("c_id").alias("exact_src"))
    )

    from tcrd_spark.operators.lineage import _cache_rotating

    # rotating cache slots (r12): registered queries pass no _caches,
    # and a plain .cache() pinned two shingle frames per invocation
    # for the session lifetime
    b_sh = _cache_rotating(
        hashed_shingles(batch, id_col, text_col, n).select(
            F.col(id_col).alias("b_id"), F.col("hs").alias("hs_b")
        ), "incr-bsh", _caches,
    )
    c_sh = _cache_rotating(
        hashed_shingles(corpus, id_col, text_col, n).select(
            F.col(id_col).alias("c_id"), F.col("hs").alias("hs_c")
        ), "incr-csh", _caches,
    )
    b_inv = b_sh.select("b_id", F.explode("hs_b").alias("g"))
    c_inv = c_sh.select("c_id", F.explode("hs_c").alias("g"))
    cand = b_inv.join(c_inv, "g").select("b_id", "c_id").distinct()
    near = (
        cand.join(b_sh, "b_id")
        .join(c_sh, "c_id")
        .select(
            "b_id",
            "c_id",
            (
                F.size(F.array_intersect("hs_b", "hs_c"))
                / (
                    F.size("hs_b")
                    + F.size("hs_c")
                    - F.size(F.array_intersect("hs_b", "hs_c"))
                )
            ).alias("j"),
        )
        .filter(F.col("j") >= threshold)
        .groupBy("b_id")
        .agg(F.min("c_id").alias("near_src"))
    )
    return (
        batch.select(F.col(id_col).alias("b_id"))
        .join(exact, "b_id", "left")
        .join(near, "b_id", "left")
        .select(
            F.col("b_id").alias(id_col),
            "exact_src",
            "near_src",
            F.when(F.col("exact_src").isNotNull(), F.lit("exact"))
            .when(F.col("near_src").isNotNull(), F.lit("near"))
            .otherwise(F.lit("new"))
            .alias("verdict"),
        )
    )


def build_dedup_index(
    corpus_df: DataFrame,
    id_col: str,
    text_col: str,
    table_prefix: str,
    n: int = 3,
    n_buckets: int = 32,
) -> None:
    """Persist the standing corpus's dedup probe assets as BUCKETED
    tables (the asset `incremental_near_dups` recomputes per call):

    - ``<prefix>_th``   (c_id, th)  bucketed by th   — exact-hash probe
    - ``<prefix>_inv``  (g, c_id)   bucketed by g    — shingle postings
    - ``<prefix>_sets`` (c_id, hs)  bucketed by c_id — verify arrays

    Bucketing is the point: a batch probe join against a bucketed
    side shuffles ONLY the batch (Spark reads the bucketed side's
    buckets in place), so per-ingest cost is proportional to the
    batch, while the corpus-sized shuffle happened once, at build
    time. Same layout philosophy as build_ivf_index's cell_id
    partitioning (pipeline/similarity.py).
    """
    from tcrd_spark.pipeline.dedup import hashed_shingles
    from tcrd_spark.sources.lake import write_bucketed

    hashes = corpus_df.select(
        F.col(id_col).alias("c_id"), hash60(F.col(text_col)).alias("th")
    )
    write_bucketed(hashes, f"{table_prefix}_th", "th", n_buckets)
    sh = hashed_shingles(corpus_df, id_col, text_col, n).select(
        F.col(id_col).alias("c_id"), F.col("hs")
    )
    write_bucketed(
        sh.select(F.explode("hs").alias("g"), "c_id"),
        f"{table_prefix}_inv",
        "g",
        n_buckets,
    )
    write_bucketed(sh, f"{table_prefix}_sets", "c_id", n_buckets)


def incremental_near_dups_indexed(
    batch: DataFrame,
    table_prefix: str,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.3,
    _caches: list | None = None,
) -> DataFrame:
    """incremental_near_dups against a persisted build_dedup_index —
    identical results; the difference is the corpus side is read, not
    recomputed, and its bucketing keeps every probe join's exchange on
    the batch side only. ``_caches`` as in incremental_near_dups."""
    from tcrd_spark.pipeline.dedup import hashed_shingles

    spark = batch.sparkSession
    c_hash = spark.table(f"{table_prefix}_th")
    c_inv = spark.table(f"{table_prefix}_inv")
    c_sets = spark.table(f"{table_prefix}_sets").withColumnRenamed("hs", "hs_c")

    b_hash = batch.select(
        F.col(id_col).alias("b_id"), hash60(F.col(text_col)).alias("th")
    )
    exact = (
        b_hash.join(c_hash, "th")
        .groupBy("b_id")
        .agg(F.min("c_id").alias("exact_src"))
    )
    from tcrd_spark.operators.lineage import _cache_rotating

    b_sh = _cache_rotating(
        hashed_shingles(batch, id_col, text_col, n).select(
            F.col(id_col).alias("b_id"), F.col("hs").alias("hs_b")
        ), "incridx-bsh", _caches,
    )
    cand = (
        b_sh.select("b_id", F.explode("hs_b").alias("g"))
        .join(c_inv, "g")
        .select("b_id", "c_id")
        .distinct()
    )
    near = (
        cand.join(b_sh, "b_id")
        .join(c_sets, "c_id")
        .select(
            "b_id",
            "c_id",
            (
                F.size(F.array_intersect("hs_b", "hs_c"))
                / (
                    F.size("hs_b")
                    + F.size("hs_c")
                    - F.size(F.array_intersect("hs_b", "hs_c"))
                )
            ).alias("j"),
        )
        .filter(F.col("j") >= threshold)
        .groupBy("b_id")
        .agg(F.min("c_id").alias("near_src"))
    )
    return (
        batch.select(F.col(id_col).alias("b_id"))
        .join(exact, "b_id", "left")
        .join(near, "b_id", "left")
        .select(
            F.col("b_id").alias(id_col),
            "exact_src",
            "near_src",
            F.when(F.col("exact_src").isNotNull(), F.lit("exact"))
            .when(F.col("near_src").isNotNull(), F.lit("near"))
            .otherwise(F.lit("new"))
            .alias("verdict"),
        )
    )


def incremental_near_dups_lsh(
    batch: DataFrame,
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    n_perms: int = 32,
    bands: int = 16,
    threshold: float = 0.3,
    _caches: list | None = None,
) -> DataFrame:
    """incremental_near_dups with MinHash-LSH candidate generation:
    instead of probing EVERY shared shingle's postings (exact recall,
    but candidate count ∝ Σ batch_df·corpus_df over shingles — the
    common-shingle hazard on skewed corpora), batch docs probe only
    the corpus's LSH band buckets. Candidate recall follows the
    (1-(1-s^r)^b) S-curve; the exact-Jaccard verify keeps precision at
    1. The corpus's band-bucket table is the persistable asset.
    Exact-hash duplicates are still caught exactly (hash join).
    Returns the same (doc_id, exact_src, near_src, verdict) shape.
    """
    from tcrd_spark.functions.hashing import (
        band_hashes_expr,
        minhash_sig_expr,
    )
    from tcrd_spark.pipeline.dedup import hashed_shingles

    assert n_perms % bands == 0
    r = n_perms // bands

    def _sig_and_buckets(df: DataFrame, out_id: str):
        from tcrd_spark.operators.lineage import _cache_rotating

        sh = _cache_rotating(
            hashed_shingles(df, id_col, text_col, n)
            .filter(F.size("hs") > 0)
            .select(F.col(id_col).alias(out_id), "hs"),
            f"incrlsh-{out_id}", _caches,
        )
        # one F.expr parse per frame instead of n_perms Column-API
        # transform lambdas — tree-identical (hashing.minhash_sig_expr)
        sig = sh.select(
            out_id, minhash_sig_expr("hs", n_perms).alias("sig")
        )
        buckets = sig.select(
            out_id,
            F.explode(band_hashes_expr("sig", bands, r)).alias("bucket"),
        )
        return sh, buckets

    b_sh, b_buckets = _sig_and_buckets(batch, "b_id")
    c_sh, c_buckets = _sig_and_buckets(corpus, "c_id")

    b_hash = batch.select(
        F.col(id_col).alias("b_id"), hash60(F.col(text_col)).alias("th")
    )
    c_hash = corpus.select(
        F.col(id_col).alias("c_id"), hash60(F.col(text_col)).alias("th")
    )
    exact = (
        b_hash.join(c_hash, "th")
        .groupBy("b_id")
        .agg(F.min("c_id").alias("exact_src"))
    )
    cand = (
        b_buckets.join(c_buckets, "bucket")
        .select("b_id", "c_id")
        .distinct()
    )
    near = (
        cand.join(b_sh.withColumnRenamed("hs", "hs_b"), "b_id")
        .join(c_sh.withColumnRenamed("hs", "hs_c"), "c_id")
        .select(
            "b_id",
            "c_id",
            (
                F.size(F.array_intersect("hs_b", "hs_c"))
                / (
                    F.size("hs_b")
                    + F.size("hs_c")
                    - F.size(F.array_intersect("hs_b", "hs_c"))
                )
            ).alias("j"),
        )
        .filter(F.col("j") >= threshold)
        .groupBy("b_id")
        .agg(F.min("c_id").alias("near_src"))
    )
    return (
        batch.select(F.col(id_col).alias("b_id"))
        .join(exact, "b_id", "left")
        .join(near, "b_id", "left")
        .select(
            F.col("b_id").alias(id_col),
            "exact_src",
            "near_src",
            F.when(F.col("exact_src").isNotNull(), F.lit("exact"))
            .when(F.col("near_src").isNotNull(), F.lit("near"))
            .otherwise(F.lit("new"))
            .alias("verdict"),
        )
    )


# ------------------------------------------------------- vocab / contamination

def vocab_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_count: int = 2,
    k: int = 100,
) -> DataFrame:
    """Corpus vocabulary: the k most frequent whitespace tokens with
    term frequency and document frequency (tokenizer/vocab seeding).
    Classic wordcount — explode → groupBy(token) with map-side partial
    aggregation; the global top-k is orderBy+limit, which Spark
    executes as TakeOrderedAndProject (per-partition heaps, no full
    sort, no global window). Ties break lexicographically so the
    result is deterministic.
    """
    from tcrd_spark.pipeline.text import ws_tokens

    tok = df.select(
        F.col(id_col), F.explode(ws_tokens(F.col(text_col))).alias("token")
    )
    return (
        tok.groupBy("token")
        .agg(
            F.count("*").alias("tf"),
            F.countDistinct(id_col).alias("df"),
        )
        .filter(F.col("tf") >= min_count)
        .orderBy(F.desc("tf"), F.asc("token"))
        .limit(k)
    )


def decontaminate(
    corpus_df: DataFrame,
    bench_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing any
    word n-gram with a benchmark/eval set (the train-test-overlap
    scrub every pretraining pipeline runs before training).

    The benchmark shingle set is small by construction (eval suites
    are thousands of docs, not billions) — it broadcasts, so the scan
    of the 100 TB corpus side stays shuffle-free: explode → broadcast
    hash join → groupBy doc. Returns one row per corpus doc:
    (doc_id, bench_hits, contaminated 0/1).
    """
    from tcrd_spark.pipeline.dedup import hashed_shingles

    c_inv = hashed_shingles(corpus_df, id_col, text_col, n).select(
        id_col, F.explode("hs").alias("g")
    )
    b_set = (
        hashed_shingles(bench_df, id_col, text_col, n)
        .select(F.explode("hs").alias("g"))
        .distinct()
    )
    hits = (
        c_inv.join(F.broadcast(b_set), "g")
        .groupBy(id_col)
        .agg(F.count("*").alias("bench_hits"))
    )
    return (
        corpus_df.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("bench_hits", F.lit(0)).alias("bench_hits"),
            (F.coalesce("bench_hits", F.lit(0)) > 0).cast("int").alias(
                "contaminated"
            ),
        )
    )


def boilerplate_line_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_doc_freq: int = 3,
    sep: str = "\n",
) -> DataFrame:
    """C4-style boilerplate removal: a LINE that occurs (identically)
    in more than ``max_doc_freq`` distinct documents is boilerplate —
    navigation chrome, cookie banners, licence footers — and is
    dropped from every document; remaining lines are reassembled in
    their original order. Returns (id, clean_text, n_lines_kept,
    n_lines_dropped). ``sep`` is used both as a split REGEX and a
    join literal — pass plain separators (newline, tab), not regex
    metacharacters.

    Plan: posexplode lines → hash60 per line (8-byte shuffle key, the
    line body never shuffles twice) → distinct-doc counts per hash →
    broadcast-able "common" set is WRONG at 100 TB (boilerplate
    cardinality is corpus-sized), so it stays a shuffled anti-join on
    the hash → groupBy doc reassembles with array_sort over (pos,
    line) structs. Two shuffles total (line-hash agg + doc regroup).
    """
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "line"),
    ).withColumn("lh", hash60(F.col("line")))
    common = (
        lines.groupBy("lh")
        .agg(F.countDistinct(id_col).alias("ndocs"))
        .filter(F.col("ndocs") > max_doc_freq)
        .select("lh")
    )
    kept = lines.join(common, "lh", "left_anti")
    dropped_ct = (
        lines.join(common, "lh", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_lines_dropped"))
    )
    return (
        kept.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "line"))),
                    lambda s: s["line"],
                ),
                sep,
            ).alias("clean_text"),
            F.count("*").alias("n_lines_kept"),
        )
        .join(df.select(id_col), id_col, "right")
        .join(dropped_ct, id_col, "left")
        .select(
            id_col,
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_lines_kept", F.lit(0)).alias("n_lines_kept"),
            F.coalesce("n_lines_dropped", F.lit(0)).alias("n_lines_dropped"),
        )
    )


# ------------------------------------------------- sharding / interleaving

def shard_assign(
    df: DataFrame, id_col: str, n_shards: int
) -> DataFrame:
    """Deterministic shard + interleaved position per row: shard =
    hash60(id) mod n_shards; pos = rank of hash60 within the shard.

    Hash-ordered positions interleave the source ordering (adjacent
    input rows land far apart in every shard) — the training-data
    write-out contract: any prefix of any shard is an unbiased sample.
    One hash-partitioned exchange (the window); the hash itself is
    md5-based and engine-portable, so shard layouts are reproducible
    anywhere, not an artifact of Spark's internal hash.
    """
    h = hash60(F.col(id_col).cast("string"))
    w = Window.partitionBy("shard").orderBy("h", id_col)
    return (
        df.select(F.col(id_col), h.alias("h"))
        .withColumn("shard", (F.col("h") % n_shards).cast("int"))
        .withColumn("pos", F.row_number().over(w))
        .select(id_col, "shard", "pos")
    )


def stratified_sample(
    df: DataFrame, strata_col: str, id_col: str, quota: int
) -> DataFrame:
    """Deterministic per-stratum quota sample: the ``quota`` rows with
    the smallest hash60(id) per stratum (corpus balancing: equal-sized
    language/source slices regardless of raw skew). Hash-ranking makes
    the sample uniform-at-random w.r.t. any input correlate yet stable
    across runs/engines — no RNG state, no seed plumbing. One window
    exchange on the stratum key; strata far above quota can pre-prune
    with an approx per-stratum hash cutoff before the exact window at
    extreme skew.
    """
    h = hash60(F.col(id_col).cast("string"))
    w = Window.partitionBy(strata_col).orderBy("h", id_col)
    return (
        df.select(strata_col, F.col(id_col), h.alias("h"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= quota)
        .select(id_col, strata_col, F.col("rn").alias("sample_rank"))
    )


def quantile_filter(
    df: DataFrame, id_col: str, score_col: str, q: float
) -> DataFrame:
    """Keep rows with score ≥ the global q-quantile (linear
    interpolation, exact). The scalar threshold is computed once and
    broadcast-joined (literally a 1-row cross join — Catalyst turns it
    into BroadcastNestedLoopJoin with a single-row build side); the
    filter then runs map-side. The exact percentile is a single-pass
    typed agg; at extreme scale swap for approx_percentile with a
    documented error bound.
    """
    thr = df.agg(
        F.round(F.percentile(F.col(score_col), F.lit(q)), 6).alias("thr")
    )
    return (
        df.crossJoin(F.broadcast(thr))
        .filter(F.col(score_col) >= F.col("thr"))
        .select(F.col(id_col), F.col(score_col), F.col("thr"))
    )


def write_corpus_shards(
    docs: DataFrame,
    layout: DataFrame,
    path: str,
    id_col: str = "doc_id",
) -> None:
    """Materialize the training-data write-out: join documents to their
    shard_assign layout and write a shard-partitioned parquet tree,
    each shard's rows position-sorted within its files (one file per
    shard here; at scale repartition by shard first and the sort holds
    per file, which is the contract sequential trainers read by).

    The partition directory IS the shard: a reader streams shard=K in
    pos order with a partition-pruned scan and zero shuffle.
    """
    (
        docs.join(layout, id_col)
        .repartition("shard")
        .sortWithinPartitions("pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


def read_corpus_shard(spark, path: str, shard: int) -> DataFrame:
    """Partition-pruned read of one shard, in training order."""
    return (
        spark.read.parquet(path)
        .filter(F.col("shard") == shard)
        .sortWithinPartitions("pos")
    )


# --------------------------------------------------------- sequence packing

def sequence_pack(
    df: DataFrame,
    id_col: str,
    tok_col: str,
    n_shards: int,
    budget: int,
) -> DataFrame:
    """Pack documents into fixed-token-budget training chunks:
    documents are sharded and interleaved deterministically (hash
    order), then each shard is split greedily into contiguous chunks —
    a document starts a new chunk when the shard-running token total
    would cross the next budget boundary mid-document... here the
    simpler offset-bin rule: chunk = floor(tokens_before_doc / budget),
    i.e. a document belongs to the chunk its first token falls in under
    the running concatenation. Pure prefix-sum semantics (one window
    over the shard), so both engines agree exactly and the plan is a
    single exchange; exact first-fit (reset at each boundary) is
    sequential per shard and buys <budget/doc_len fewer padding tokens
    — not worth losing the closed-form plan.

    Returns (doc_id, shard, chunk, n_tok, chunk_off): chunk_off = token
    offset of the doc inside the running shard stream.
    """
    h = hash60(F.col(id_col).cast("string"))
    w = Window.partitionBy("shard").orderBy("h", id_col)
    cum = F.sum(tok_col).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.select(F.col(id_col), F.col(tok_col).alias("n_tok"), h.alias("h"))
        .withColumn("shard", (F.col("h") % n_shards).cast("int"))
        .withColumn("cum", cum.cast("long"))
        .select(
            id_col,
            "shard",
            F.floor((F.col("cum") - F.col("n_tok")) / budget).alias("chunk"),
            "n_tok",
            (F.col("cum") - F.col("n_tok")).alias("chunk_off"),
        )
    )
