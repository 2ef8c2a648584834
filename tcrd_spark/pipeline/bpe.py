"""Distributed BPE (byte-pair-encoding) training: learn a merge table
from a corpus with Spark doing the counting (Sennrich et al., "Neural
Machine Translation of Rare Words with Subword Units", ACL'16 §3.2).

Scale shape: the corpus collapses to its DISTINCT-WORD frequency
table first (one wordcount shuffle — vocab-sized from then on, the
100 TB body is never touched again). Each merge iteration is then one
small job over the vocab frame: row-local adjacent-pair extraction →
groupBy(pair) sum(freq) (map-side combinable) → global top-1 via
TakeOrdered. The winning pair (an O(1) driver value — the merge table
IS the model) is applied row-locally with a left-fold over each
word's symbol array; no shuffle moves symbol data between iterations.
Lineage is truncated every few merges so Catalyst analysis stays flat
(the iterative-algorithm discipline of operators/graph.py).

Ties break (freq desc, pair asc) so the learned table is deterministic
and reproducible across engines — the pytest golden-checks it against
a pure-Python reference implementation.

`sequence_pack` (pipeline/corpus.py) is tokenizer-pluggable by
construction — it budgets whatever count column it is handed; the
registered `sequence_pack` query already packs BPE-ish regex token
counts (pipeline/corpus_queries.py), and `encode_token_counts` here
plugs TRAINED-BPE counts into the same operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tcrd_spark.operators.lineage import _truncate
from tcrd_spark.pipeline.text import ws_tokens

END = "</w>"


def word_freqs(docs: DataFrame, text_col: str) -> DataFrame:
    """(word, freq) over whitespace tokens — the one corpus-sized
    shuffle of BPE training."""
    return (
        docs.select(F.explode(ws_tokens(F.col(text_col))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _chars(word: Column) -> Column:
    """Initial symbol sequence: characters + end-of-word marker."""
    return F.concat(
        F.filter(F.split(word, ""), lambda c: c != ""),
        F.array(F.lit(END)),
    )


def _adjacent_pairs(syms: Column) -> Column:
    """['a','b','c'] → ['a b', 'b c'] (space-joined pair keys)."""
    return F.when(
        F.size(syms) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(syms) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(syms, i), F.element_at(syms, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent-symbol pair counts weighted by word frequency.
    vocab: (syms array<string>, freq long) → (pair, n)."""
    return (
        vocab.select(
            F.explode(_adjacent_pairs(F.col("syms"))).alias("pair"), "freq"
        )
        .groupBy("pair")
        .agg(F.sum("freq").alias("n"))
    )


def _merge_in(syms: Column, a: str, b: str) -> Column:
    """Replace every leftmost-first adjacent (a, b) with a+b —
    row-local left fold carrying one pending symbol."""
    merged = a + b
    acc0 = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("pend"),
    )

    def step(acc, x):
        return (
            F.when(
                acc["pend"].isNull(),
                F.struct(acc["out"].alias("out"), x.alias("pend")),
            )
            .when(
                (acc["pend"] == a) & (x == b),
                F.struct(
                    F.concat(acc["out"], F.array(F.lit(merged))).alias("out"),
                    F.lit(None).cast("string").alias("pend"),
                ),
            )
            .otherwise(
                F.struct(
                    F.concat(acc["out"], F.array(acc["pend"])).alias("out"),
                    x.alias("pend"),
                )
            )
        )

    def finish(acc):
        return F.when(acc["pend"].isNull(), acc["out"]).otherwise(
            F.concat(acc["out"], F.array(acc["pend"]))
        )

    return F.aggregate(syms, acc0, step, finish)


def bpe_train(
    docs: DataFrame, text_col: str, n_merges: int, min_pair_freq: int = 2
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges. Returns the ordered merge table
    [(left, right), ...] — O(n_merges) driver memory by definition
    (the merge table is the model artifact). Stops early when no pair
    reaches ``min_pair_freq``."""
    vocab = (
        word_freqs(docs, text_col)
        .select(_chars(F.col("word")).alias("syms"), "freq")
        .cache()
    )
    merges: list[tuple[str, str]] = []
    held: list = []  # _truncate cut RDDs; DataFrame.unpersist on the
    # wrapping DF does NOT release them (ADVICE r6) — drain explicitly
    # once the collect has materialized the newer vocab cache
    try:
        for it in range(n_merges):
            top = (
                pair_counts(vocab)
                .orderBy(F.desc("n"), F.asc("pair"))
                .limit(1)
                .collect()
            )
            while len(held) > 1:  # vocab is materialized past the old cut
                held.pop(0).unpersist()
            if not top or top[0]["n"] < min_pair_freq:
                break
            a, b = top[0]["pair"].split(" ", 1)
            merges.append((a, b))
            nxt = vocab.select(
                _merge_in(F.col("syms"), a, b).alias("syms"), "freq"
            )
            if (it + 1) % 4 == 0:
                nxt = _truncate(nxt, held)
            old, vocab = vocab, nxt.cache()
            old.unpersist()
        return merges
    finally:
        vocab.unpersist()
        for r in held:
            r.unpersist()


def encode_token_counts(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """(id, n_tok): per-document token count under the trained merge
    table — the pluggable count column for sequence_pack. The merge
    folds run row-local over each word's symbol array (merge tables
    are small constants baked into the plan); no shuffle."""
    syms = _chars(F.col("w"))
    for a, b in merges:
        syms = _merge_in(syms, a, b)
    per_word = docs.select(
        F.col(id_col),
        F.explode(ws_tokens(F.col(text_col))).alias("w"),
    ).filter(F.col("w") != "")
    return (
        per_word.select(id_col, F.size(syms).alias("_n"))
        .groupBy(id_col)
        .agg(F.sum("_n").cast("long").alias("n_tok"))
    )


# ------------------------------------------------- registered queries

_TOP_PAIRS = 50


def q_bpe_pair_counts(spark, sf_dir):
    """First-iteration BPE pair statistics over the documents corpus:
    the 50 most frequent adjacent character pairs (freq-weighted,
    deterministic tie-break) — the inner loop of BPE training as one
    adjudicated plan."""
    from tcrd_spark.sources.lake import load_table

    docs = load_table(spark, sf_dir, "documents")
    vocab = word_freqs(docs, "text").select(
        _chars(F.col("word")).alias("syms"), "freq"
    )
    return (
        pair_counts(vocab)
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(_TOP_PAIRS)
    )


QUERIES = {"bpe_pair_counts": q_bpe_pair_counts}

ORACLE = {
    "bpe_pair_counts": f"""
        WITH wf AS (
          SELECT word, count(*) AS freq
          FROM (SELECT unnest(string_split_regex(text, '\\s+')) AS word
                FROM documents)
          WHERE word != '' GROUP BY 1
        ),
        syms AS (
          SELECT list_append(string_split(word, ''), '{END}') AS s, freq
          FROM wf
        ),
        pairs AS (
          SELECT unnest(list_transform(range(1, len(s)),
                        i -> concat(s[i], ' ', s[i+1]))) AS pair,
                 freq
          FROM syms
        )
        SELECT pair, CAST(sum(freq) AS BIGINT) AS n
        FROM pairs GROUP BY pair
        ORDER BY n DESC, pair ASC LIMIT {_TOP_PAIRS}
    """,
}
