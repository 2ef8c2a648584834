"""Token-budget corpus assembly (pipeline/budget.py): budget,
first-doc guarantee, and append-stability axioms. Values vs DuckDB
ride the registry sweep (`mixture_token_budget`)."""

from __future__ import annotations

from tcrd_spark.pipeline.budget import token_budget_sample


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )


def test_budget_respected_and_head_doc_always_kept(spark):
    rows = [
        # domain a: five 10-token docs, budget 25 -> exactly 2 kept
        # (pure-alpha words: the BPE-ish tokenizer splits "w0" into 2)
        *[
            (i, " ".join(f"w{chr(97 + i)}{chr(97 + j)}" for j in range(10)), "a")
            for i in range(5)
        ],
        # domain b: ONE 100-token doc over budget -> still kept (rn 1)
        (100, " ".join(f"x{chr(97 + j // 26)}{chr(97 + j % 26)}"
                       for j in range(100)), "b"),
    ]
    got = token_budget_sample(
        _docs(spark, rows), "doc_id", "text", "source", budget=25
    ).collect()
    by_dom = {}
    for r in got:
        by_dom.setdefault(r.domain, []).append(r)
    assert len(by_dom["a"]) == 2
    assert all(r.cum_tok <= 25 for r in by_dom["a"])
    assert len(by_dom["b"]) == 1 and by_dom["b"][0].n_tok == 100


def test_selection_is_append_stable_across_domains(spark):
    base = [
        (i, " ".join(f"w{chr(97 + i)}{chr(97 + j)}" for j in range(10)), "a")
        for i in range(20)
    ]
    extra = [
        (1000 + i,
         " ".join(f"y{chr(97 + i)}{chr(97 + j)}" for j in range(10)), "b")
        for i in range(20)
    ]
    pick = lambda rows: sorted(
        r.doc_id
        for r in token_budget_sample(
            _docs(spark, rows), "doc_id", "text", "source", budget=55
        ).collect()
        if r.domain == "a"
    )
    assert pick(base) == pick(base + extra)


def test_selection_is_hash_ordered_not_id_ordered(spark):
    rows = [
        (i, " ".join(f"w{chr(97 + i % 26)}{chr(97 + j)}x{chr(97 + i // 26)}"
                     for j in range(10)), "a")
        for i in range(30)
    ]
    got = sorted(
        r.doc_id
        for r in token_budget_sample(
            _docs(spark, rows), "doc_id", "text", "source", budget=55
        ).collect()
    )
    # 5 docs of 10 tokens fit 55; a head-of-table cut would pick 0..4
    assert len(got) == 5
    assert got != [0, 1, 2, 3, 4]
