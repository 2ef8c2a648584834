"""CCNet-style perplexity bucketing — the quality split a pretraining
pipeline applies after language ID (Wenzek et al., "CCNet: Extracting
High Quality Monolingual Datasets from Web Crawl Data", LREC 2020).

CCNet scores each document with a language-model NLL and splits every
language's documents into head / middle / tail TERTILES — the head
feeds training directly, the middle is kept for mixing, the tail is
dropped or down-weighted. This module composes the in-tree pieces:

    pipeline/text.lang_id          n-gram stopword-profile language ID
    pipeline/lm.train/score        add-one bigram LM, per-doc mean NLL
    grouped percentile edges       per-language tertile thresholds

Scale: the per-language tertile edges are ONE grouped percentile
aggregate over (lang, nll) — |languages| rows broadcast back; the
bucket label is a row-local comparison. No windows, no ranks — the
same discipline as quality_quantile_filter. Edges and NLLs round to 6
decimals on both engines so interpolation ulps never move a bucket
boundary (the zorder_sampled lesson).

Documents too short to produce a bigram (no NLL) land in an explicit
'unscored' bucket rather than silently biasing a tertile.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def lang_nll(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, pred_lang, nll): language ID + per-doc bigram-LM mean NLL
    (NULL for docs with no bigram). This is the expensive lineage —
    ccnet_buckets reads it TWICE (tertile edges + the final label), so
    callers should materialize it (cache / the registered query's
    session memo) or the whole LM train+score chain executes twice."""
    from tcrd_spark.pipeline import text
    from tcrd_spark.pipeline.lm import (
        score_perplexity,
        tokenize,
        train_bigram_lm,
    )

    toks = tokenize(docs, id_col, text_col)
    lm = train_bigram_lm(toks, id_col)
    scored = score_perplexity(toks, lm, id_col).select(
        id_col, F.round("nll", 6).alias("nll")
    )
    return docs.select(
        F.col(id_col),
        text.lang_id(F.col(text_col)).alias("pred_lang"),
    ).join(scored, id_col, "left")


def ccnet_buckets(
    docs: DataFrame, id_col: str, text_col: str,
    _labeled: DataFrame | None = None,
    _caches: list | None = None,
) -> DataFrame:
    """(id, pred_lang, nll, bucket): bucket ∈ {head, middle, tail,
    unscored} by per-language NLL tertiles (lower NLL = head, the
    CCNet convention: fluent text scores low perplexity).

    ``_labeled`` accepts a pre-materialized lang_nll frame; otherwise
    one is built and cached here (recorded in ``_caches`` under the
    incremental_near_dups unpersist convention)."""
    if _labeled is not None:
        labeled = _labeled
    else:
        labeled = lang_nll(docs, id_col, text_col).cache()
        if _caches is not None:
            _caches.append(labeled)
    edges = labeled.filter(F.col("nll").isNotNull()).groupBy(
        "pred_lang"
    ).agg(
        F.expr(
            "transform(percentile(nll, array(0.3333333333333333, "
            "0.6666666666666666)), e -> round(e, 6))"
        ).alias("_e")
    )
    return labeled.join(F.broadcast(edges), "pred_lang", "left").select(
        id_col,
        "pred_lang",
        "nll",
        F.when(F.col("nll").isNull(), F.lit("unscored"))
        .when(F.col("nll") <= F.element_at("_e", 1), F.lit("head"))
        .when(F.col("nll") <= F.element_at("_e", 2), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


# ------------------------------------------------- registered queries


def q_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Head/middle/tail perplexity split per predicted language over
    the documents corpus. The (lang, nll) frame is memoized per
    session like the SQ/PQ code tables, so the LM lineage runs once
    across the edge pass, the label pass, and repeated invocations."""
    from tcrd_spark.pipeline.lm import _docs
    from tcrd_spark.pipeline.sq import _memo_cached

    docs = _docs(spark, sf_dir)
    labeled = _memo_cached(
        spark, (sf_dir, "ccnet-labeled"),
        lambda: lang_nll(docs, "doc_id", "text"),
    )
    return ccnet_buckets(docs, "doc_id", "text", _labeled=labeled)


QUERIES = {"ccnet_buckets": q_ccnet_buckets}


def _oracle() -> str:
    from tcrd_spark.pipeline.lm import _LM_CTES
    from tcrd_spark.pipeline.testdata_queries import _BEST, _LANG_SCORE

    lang_case = (
        "CASE "
        + " ".join(
            f"WHEN {_BEST} > 0 AND {_LANG_SCORE[lg]} = {_BEST} "
            f"THEN '{lg}'"
            for lg in _LANG_SCORE
        )
        + " ELSE 'und' END"
    )
    return f"""
        WITH {_LM_CTES},
        s AS (
          SELECT bg.doc_id,
                 round(avg(-ln((c2.c2 + 1.0) / (c1.c1 + v.v))), 6) AS nll
          FROM bg
          JOIN c2 USING (w1, w2)
          JOIN c1 ON bg.w1 = c1.w
          CROSS JOIN v
          GROUP BY bg.doc_id
        ),
        lang AS (
          SELECT doc_id, {lang_case} AS pred_lang FROM documents
        ),
        labeled AS (
          SELECT l.doc_id, l.pred_lang, s.nll
          FROM lang l LEFT JOIN s USING (doc_id)
        ),
        edges AS (
          SELECT pred_lang,
                 list_transform(
                   quantile_cont(nll, [0.3333333333333333,
                                       0.6666666666666666]),
                   e -> round(e, 6)) AS e
          FROM labeled WHERE nll IS NOT NULL GROUP BY pred_lang
        )
        SELECT l.doc_id, l.pred_lang, l.nll,
               CASE WHEN l.nll IS NULL THEN 'unscored'
                    WHEN l.nll <= e[1] THEN 'head'
                    WHEN l.nll <= e[2] THEN 'middle'
                    ELSE 'tail' END AS bucket
        FROM labeled l LEFT JOIN edges USING (pred_lang)
    """


ORACLE = {"ccnet_buckets": _oracle()}
