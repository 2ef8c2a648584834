"""Streaming web ingestion — stage 0 in the streaming runtime.

The batch story (pipeline/html.py → gates → dedup) assumed the corpus
arrives as a table; a production crawl arrives as an unbounded PAGE
stream. This job composes the existing, individually-verified pieces
into the ingest path a deployment actually runs:

    raw page micro-batch
      → html_extract            (row-local, pipeline/html.py)
      → quality gate            (pipeline/text.quality_score)
      → dedup probe vs the STANDING corpus
                                (pipeline/corpus.incremental_near_dups
                                 — inverted-index probe, cost ∝ batch)
      → idempotent batch_id-partitioned parquet sink
        (every gated doc lands with its extracted text AND its
         provenance verdict: exact / near / new — acceptance is a
         reader-side filter, the audit trail is never thrown away)

foreachBatch for the same reason as streaming_incremental_dedup: the
probe is a multi-step plan Structured Streaming cannot express as one
continuous query, and the static side is the persisted corpus index.
Exactly-once is earned the same way — the sink write is keyed by the
checkpointed batch_id, so an at-least-once replay overwrites its own
partition with identical rows (replay==batch and restart tests in
tests/test_web_ingest.py).

100 TB shape: extraction and gating are shuffle-free map work over
the batch; the probe shuffles the BATCH's shingles against the
bucketed corpus index (cost ∝ batch size × avg postings, never
corpus²); the sink appends one partition per micro-batch and rides
`lake.compact_table` for file-count upkeep.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# one quality_score credit (e.g. "no punctuation", 0.25) must not be
# enough on its own — junk three-word pages earn exactly 0.25
MIN_QUALITY = 0.3


def web_ingest_batch(
    batch_df: DataFrame,
    batch_id: int,
    corpus: DataFrame,
    out_path: str,
    id_col: str = "doc_id",
    page_col: str = "page",
    min_quality: float = MIN_QUALITY,
    n: int = 3,
    threshold: float = 0.3,
) -> None:
    """One micro-batch: extract, gate, probe, land. Idempotent — the
    write target derives from the checkpointed batch_id."""
    from tcrd_spark.pipeline.corpus import incremental_near_dups
    from tcrd_spark.pipeline.html import html_extract
    from tcrd_spark.pipeline.text import quality_score

    gated = (
        batch_df.select(
            id_col, html_extract(page_col).alias("text")
        )
        .filter(
            (F.length("text") > 0)
            & (quality_score(F.col("text")) >= min_quality)
        )
    )
    caches: list[DataFrame] = []
    try:
        verdicts = incremental_near_dups(
            gated, corpus, id_col, "text",
            n=n, threshold=threshold, _caches=caches,
        )
        (
            gated.join(
                verdicts.select(
                    id_col, "exact_src", "near_src", "verdict"
                ),
                id_col,
            )
            .write.mode("overwrite")
            .parquet(os.path.join(out_path, f"batch_id={batch_id}"))
        )
    finally:
        for c in caches:
            c.unpersist()


def streaming_web_ingest(
    page_stream: DataFrame,
    corpus: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    page_col: str = "page",
    min_quality: float = MIN_QUALITY,
    n: int = 3,
    threshold: float = 0.3,
):
    """Run the ingest pipeline over an unbounded page stream."""

    def _one(batch_df: DataFrame, batch_id: int) -> None:
        web_ingest_batch(
            batch_df, batch_id, corpus, out_path,
            id_col=id_col, page_col=page_col,
            min_quality=min_quality, n=n, threshold=threshold,
        )

    return (
        page_stream.writeStream.foreachBatch(_one)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )


def batch_web_ingest(
    pages: DataFrame,
    corpus: DataFrame,
    id_col: str = "doc_id",
    page_col: str = "page",
    min_quality: float = MIN_QUALITY,
    n: int = 3,
    threshold: float = 0.3,
) -> DataFrame:
    """The one-shot twin the replay test pins the stream against:
    identical extract → gate → probe plan over all pages at once."""
    from tcrd_spark.pipeline.corpus import incremental_near_dups
    from tcrd_spark.pipeline.html import html_extract
    from tcrd_spark.pipeline.text import quality_score

    gated = (
        pages.select(id_col, html_extract(page_col).alias("text"))
        .filter(
            (F.length("text") > 0)
            & (quality_score(F.col("text")) >= min_quality)
        )
    )
    return gated.join(
        incremental_near_dups(
            gated, corpus, id_col, "text", n=n, threshold=threshold
        ).select(id_col, "exact_src", "near_src", "verdict"),
        id_col,
    )
