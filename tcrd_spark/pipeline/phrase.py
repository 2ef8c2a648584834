"""Positional phrase search — exact word-sequence matching over an
inverted positional index.

BM25/TF-IDF (`pipeline/bm25.py`, `tfidf.py`) rank by bag-of-words;
an exact PHRASE query ("large language model", an entity name, a
quoted string) needs POSITIONS. This is the classic positional-
postings phrase join every search engine runs, expressed as ONE
shuffle regardless of phrase length:

1. postings: (doc, pos, term) via posexplode — row-local;
2. each posting of a phrase term emits (doc, start = pos - i) for
   every offset i where phrase[i] == that term (a broadcast join
   against the |phrase|-row offsets table — duplicate phrase words
   handled naturally);
3. an occurrence is a (doc, start) group containing EVERY offset:
   one groupBy with HAVING count(DISTINCT i) = |phrase|.

The naive alternative — |phrase|-way self-join of the postings —
shuffles once PER TERM; this emission trick always shuffles once, on
(doc, start), and the phrase-term filter prunes the postings before
the exchange so cost ∝ occurrences of the phrase's words, not corpus
size.

100 TB shape: the explode is row-local inside the scan task; only
matching-term candidates reach the single exchange; the per-doc
rollup refines the same (doc) key so it combines map-side. Selective
phrases (rare words) move almost nothing.

Reference parity: none (IR extension; the reference's text search is
MySQL LIKE '%...%' — `loaders/TCRD.py` find_targets name matching).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tcrd_spark.pipeline.text import ws_tokens

PHRASE = ("table", "scan")  # the registered query's phrase


def positional_postings(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(id, pos, term): 0-based positional postings of the whitespace
    tokens — the index every positional query probes."""
    return docs.select(
        F.col(id_col),
        F.posexplode(ws_tokens(text_col)).alias("pos", "term"),
    )


def phrase_occurrences(
    postings: DataFrame, phrase: list[str] | tuple[str, ...], id_col: str
) -> DataFrame:
    """(id, start): every exact occurrence of the word sequence.
    One shuffle on (id, start) however long the phrase is."""
    spark = postings.sparkSession
    offsets = spark.createDataFrame(
        [(i, t) for i, t in enumerate(phrase)], "i int, term string"
    )
    cand = (
        postings.join(F.broadcast(offsets), "term")
        .select(id_col, (F.col("pos") - F.col("i")).alias("start"), "i")
        .where(F.col("start") >= 0)
    )
    return (
        cand.groupBy(id_col, "start")
        .agg(F.count_distinct("i").alias("_k"))
        .where(F.col("_k") == len(phrase))
        .select(id_col, "start")
    )


def phrase_search(
    docs: DataFrame,
    phrase: list[str] | tuple[str, ...],
    id_col: str,
    text_col: str,
) -> DataFrame:
    """(id, n_hits, first_pos): per-document occurrence count and the
    earliest match position of the exact phrase."""
    occ = phrase_occurrences(
        positional_postings(docs, id_col, text_col), phrase, id_col
    )
    return occ.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_hits"),
        F.min("start").alias("first_pos"),
    )


# ------------------------------------------------- registered query


def q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-phrase hits for "table scan" over the documents corpus."""
    from tcrd_spark.sources.lake import load_table

    docs = load_table(spark, sf_dir, "documents")
    return phrase_search(docs, PHRASE, "doc_id", "text")


QUERIES = {"phrase_search": q_phrase_search}

_PH_VALUES = ", ".join(f"({i}, '{t}')" for i, t in enumerate(PHRASE))

ORACLE = {
    "phrase_search": f"""
        WITH toks AS (
          SELECT doc_id,
                 unnest(string_split_regex(text, '\\s+')) AS term,
                 generate_subscripts(
                   string_split_regex(text, '\\s+'), 1) - 1 AS pos
          FROM documents
        ),
        cand AS (
          SELECT t.doc_id, t.pos - ph.i AS start, ph.i
          FROM toks t
          JOIN (VALUES {_PH_VALUES}) ph(i, term) ON t.term = ph.term
          WHERE t.pos - ph.i >= 0
        ),
        occ AS (
          SELECT doc_id, start FROM cand
          GROUP BY doc_id, start
          HAVING count(DISTINCT i) = {len(PHRASE)}
        )
        SELECT doc_id, count(*) AS n_hits, min(start) AS first_pos
        FROM occ GROUP BY doc_id
    """,
}
