"""Distributed BPE training (pipeline/bpe.py): merge table matches a
pure-Python reference bit-for-bit; trained-BPE counts plug into
sequence_pack."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from tcrd_spark.pipeline.bpe import (
    END,
    bpe_train,
    encode_token_counts,
    word_freqs,
)

TEXTS = [
    "low lower lowest low low",
    "new newer newest new newer",
    "wide wider widest wide",
    "low new wide low new",
]


def _py_bpe(texts: list[str], n_merges: int, min_pair_freq: int = 2):
    """Reference implementation (Sennrich et al. alg. 1): greedy
    leftmost merges, ties freq desc then pair asc."""
    wf = Counter(w for t in texts for w in t.split() if w)
    vocab = {tuple(list(w) + [END]): f for w, f in wf.items()}
    merges = []
    for _ in range(n_merges):
        pc: Counter = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += f
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}"))
        if best[1] < min_pair_freq:
            break
        (a, b), _n = best
        merges.append((a, b))
        new_vocab = {}
        for syms, f in vocab.items():
            out, pend = [], None
            for x in syms:
                if pend is None:
                    pend = x
                elif pend == a and x == b:
                    out.append(a + b)
                    pend = None
                else:
                    out.append(pend)
                    pend = x
            if pend is not None:
                out.append(pend)
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


def _docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )


def test_bpe_train_matches_reference(spark):
    got = bpe_train(_docs(spark), "text", n_merges=12)
    want = _py_bpe(TEXTS, 12)
    assert got == want
    assert len(got) >= 6  # the fixture genuinely trains


def test_bpe_early_stop_on_min_freq(spark):
    docs = spark.createDataFrame(
        [(1, "ab cd ef")], "doc_id long, text string"
    )  # every pair occurs once
    assert bpe_train(docs, "text", n_merges=5, min_pair_freq=2) == []


def test_encoded_counts_feed_sequence_pack(spark):
    """Trained-BPE token counts are a drop-in count column for
    sequence_pack (tokenizer pluggability, VERDICT r4 #8)."""
    from tcrd_spark.pipeline.corpus import sequence_pack

    docs = _docs(spark)
    merges = bpe_train(docs, "text", n_merges=8)
    counts = encode_token_counts(docs, "doc_id", "text", merges)
    rows = {r["doc_id"]: r["n_tok"] for r in counts.collect()}
    # encoding merges symbols, so counts sit strictly between
    # 1×words (full merge) and chars+1 per word (no merges)
    wf = {
        i: [w for w in t.split() if w] for i, t in enumerate(TEXTS)
    }
    for i, words in wf.items():
        assert len(words) <= rows[i] <= sum(len(w) + 1 for w in words)
    packed = sequence_pack(counts, "doc_id", "n_tok", n_shards=2, budget=16)
    out = packed.collect()
    assert {r["doc_id"] for r in out} == set(wf)
    assert all(r["n_tok"] == rows[r["doc_id"]] for r in out)


def test_word_freqs_is_exact(spark):
    got = {
        (r["word"], r["freq"])
        for r in word_freqs(_docs(spark), "text").collect()
    }
    want = set(Counter(w for t in TEXTS for w in t.split()).items())
    assert got == want
