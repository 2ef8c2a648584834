"""Axioms for the round-7 extension operators (value parity vs DuckDB
rides the registry sweep)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F


def _t(s):
    return datetime.fromisoformat(s)


def test_session_stats_respect_gap(spark):
    from tcrd_spark.operators.sessions_ext import session_stats_batch

    rows = [
        (1, _t("2024-01-01T10:00"), 1),
        (1, _t("2024-01-01T10:10"), 2),   # same session (gap 600s)
        (1, _t("2024-01-01T12:00"), 3),   # new session (> 1800s)
        (2, _t("2024-01-01T10:00"), 4),
    ]
    ev = spark.createDataFrame(rows, "u long, ts timestamp, eid long")
    got = {
        (r.u, r.session_id): r
        for r in session_stats_batch(ev, "u", "ts", "eid", 1800).collect()
    }
    assert got[(1, 1)].n_events == 2 and got[(1, 1)].duration_s == 600.0
    assert got[(1, 2)].n_events == 1 and got[(1, 2)].duration_s == 0.0
    assert got[(2, 1)].n_events == 1
    # durations always equal end - start
    for r in got.values():
        assert r.duration_s == (r.end_ts - r.start_ts).total_seconds()


def test_tfidf_rare_term_outranks_common(spark):
    from tcrd_spark.pipeline.tfidf import tfidf_topterms

    docs = spark.createDataFrame(
        [
            (1, "alpha alpha zebra common common"),
            (2, "common beta"),
            (3, "common gamma"),
        ],
        "doc_id long, text string",
    )
    got = tfidf_topterms(docs, "doc_id", "text", k=2).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r.doc_id, []).append(r)
    d1 = sorted(by_doc[1], key=lambda r: r.rank)
    # 'alpha' (tf=2, df=1) beats 'common' (tf=2, df=3) and 'zebra' (tf=1)
    assert d1[0].term == "alpha" and d1[0].df == 1 and d1[0].tf == 2
    assert all(len(v) == 2 for v in by_doc.values())
    for rows in by_doc.values():
        rows = sorted(rows, key=lambda r: r.rank)
        assert rows[0].score >= rows[1].score


def test_hard_negatives_exclude_self_and_dups(spark):
    from tcrd_spark.pipeline.negatives import hard_negatives

    dim = 4
    vecs = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.001, 0.0, 0.0]),   # near-dup of 0 (cos ~1)
        (2, [0.9, 0.4, 0.0, 0.0]),     # similar, below 0.95
        (3, [0.0, 1.0, 0.0, 0.0]),     # orthogonal
        (4, [-1.0, 0.0, 0.0, 0.0]),    # opposite
    ]
    emb = spark.createDataFrame(vecs, "id long, v array<double>")
    corpus = emb.select(F.col("id").alias("c_id"), F.col("v").alias("c_vec"))
    qs = emb.filter("id = 0").select(
        F.col("id").alias("q_id"), F.col("v").alias("q_vec")
    )
    got = sorted(
        hard_negatives(qs, corpus, dim, k=3, dup_threshold=0.95).collect(),
        key=lambda r: r.rank,
    )
    ids = [r.c_id for r in got]
    assert 0 not in ids, "self must be excluded"
    assert 1 not in ids, "near-duplicate must be excluded"
    assert ids[0] == 2, "hardest (most similar sub-threshold) first"
    assert [r.rank for r in got] == [1, 2, 3]
    assert got[0].score >= got[1].score >= got[2].score


def test_leakage_safe_split_holds_groups_together(spark):
    from tcrd_spark.pipeline.splits import leakage_safe_split

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(40)], "doc_id long, text string"
    )
    # chain 0-1-2 one group; 10-11 another; rest isolated
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11)], "id_a long, id_b long"
    )
    got = {r.doc_id: r for r in
           leakage_safe_split(docs, pairs, "doc_id").collect()}
    assert len(got) == 40
    assert got[0].split == got[1].split == got[2].split
    assert got[0].group_id == got[1].group_id == got[2].group_id == 0
    assert got[10].split == got[11].split
    assert {r.split for r in got.values()} <= {"train", "val", "test"}
    # deterministic across invocations
    again = {r.doc_id: r.split for r in
             leakage_safe_split(docs, pairs, "doc_id").collect()}
    assert again == {k: v.split for k, v in got.items()}


def test_chunker_covers_every_token_with_overlap(spark):
    from tcrd_spark.pipeline.chunker import chunk_documents

    text = " ".join(f"t{i}" for i in range(150))
    docs = spark.createDataFrame(
        [(1, text), (2, "a b c"), (3, "")],
        "doc_id long, text string",
    )
    rows = chunk_documents(docs, "doc_id", "text", size=64, stride=48)
    by_doc = {}
    for r in rows.collect():
        by_doc.setdefault(r.doc_id, []).append(r)
    d1 = sorted(by_doc[1], key=lambda r: r.chunk_id)
    # ceil(150/48) = 4 chunks; starts at 0,48,96,144
    assert [r.chunk_id for r in d1] == [0, 1, 2, 3]
    assert [r.n_tok for r in d1] == [64, 64, 54, 6]
    # coverage: union of chunk tokens == all tokens, in order per chunk
    toks = text.split()
    for r in d1:
        start = r.chunk_id * 48
        assert r.chunk_text.split() == toks[start:start + 64]
    # short doc -> one whole chunk; empty doc -> nothing
    assert len(by_doc[2]) == 1 and by_doc[2][0].chunk_text == "a b c"
    assert 3 not in by_doc


def test_classifier_gate_generalizes_extremes(spark):
    """NB trained on head/tail extremes must label an UNSEEN middle
    doc by its lexical profile — good-vocabulary docs keep, bad drop."""
    from tcrd_spark.pipeline.clf_gate import classifier_quality_gate

    docs = spark.createDataFrame(
        [
            (1, "clear prose clear prose fine writing"),
            (2, "fine writing clear prose good text"),
            (3, "spam junk spam junk noise noise"),
            (4, "junk noise spam junk junk spam"),
            (5, "clear prose good text fine"),   # middle, good-ish
            (6, "spam noise junk"),              # middle, bad-ish
        ],
        "doc_id long, text string",
    )
    buckets = spark.createDataFrame(
        [(1, "head"), (2, "head"), (3, "tail"), (4, "tail"),
         (5, "middle"), (6, "middle")],
        "doc_id long, bucket string",
    )
    got = {
        r.doc_id: r
        for r in classifier_quality_gate(
            docs, buckets, "doc_id", "text"
        ).collect()
    }
    assert got[1].keep == 1 and got[2].keep == 1   # trained extremes
    assert got[3].keep == 0 and got[4].keep == 0
    assert got[5].keep == 1, "good-vocab middle doc must pass the gate"
    assert got[6].keep == 0, "bad-vocab middle doc must be dropped"


def test_corpus_v2_layout_writes_pruned_shards(spark, sf_dir, tmp_path):
    """The v2 output IS a write layout: materialize it with
    write_corpus_shards and prove a one-shard read is partition-pruned
    and position-ordered."""
    from tcrd_spark.pipeline.corpus import (
        read_corpus_shard,
        write_corpus_shards,
    )
    from tcrd_spark.pipeline.corpus_v2 import corpus_pipeline_v2
    from tcrd_spark.sources.lake import load_table

    layout = corpus_pipeline_v2(spark, sf_dir).withColumnRenamed(
        "chunk_off", "pos"
    ).select("doc_id", "shard", "pos")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    path = str(tmp_path / "v2_shards")
    write_corpus_shards(docs, layout, path)

    got = read_corpus_shard(spark, path, 1)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(shard" in plan or (
        "shard=1" in plan
    ), "one-shard read must prune partitions"
    rows = got.select("pos").collect()
    assert [r.pos for r in rows] == sorted(r.pos for r in rows)
    expected = {r.doc_id for r in layout.filter("shard = 1").collect()}
    assert {r.doc_id for r in got.collect()} == expected


def test_streaming_session_rollup_equals_batch(spark, tmp_path):
    """Composition: rolling up the STREAMING sessionizer's per-event
    output (grouped by its eviction-stable session_start label) equals
    the batch session_stats rollup."""
    import datetime as dt

    from pyspark.sql import functions as F

    from tcrd_spark.operators.sessions_ext import session_stats_batch
    from tcrd_spark.streaming.jobs import (
        read_event_replay,
        run_to_memory_sink,
        stage_replay_chunks,
    )
    from tcrd_spark.streaming.sessions import streaming_sessionize

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, t0 + dt.timedelta(minutes=m), u, "click", 1.0)
        for i, (u, m) in enumerate(
            [(1, 0), (1, 10), (1, 120), (2, 5), (2, 200), (1, 125)]
        )
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double"
    )
    src = str(tmp_path / "sess_roll_src")
    stage_replay_chunks(ev, src, n_chunks=3)
    q = run_to_memory_sink(
        streaming_sessionize(read_event_replay(spark, src, ev.schema)),
        "sess_roll", "append", str(tmp_path / "ckpt2"),
    )
    try:
        q.processAllAvailable()
        streamed = spark.sql("SELECT * FROM sess_roll")
    finally:
        q.stop()
    got = sorted(
        map(tuple, streamed.groupBy("user_id", "session_start").agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("start_ts"),
            F.max("ts").alias("end_ts"),
        ).collect())
    )
    want = sorted(
        map(tuple, session_stats_batch(ev, "user_id", "ts", "event_id")
            .groupBy("user_id", "start_ts")
            .agg(F.sum("n_events").alias("n"),
                 F.min("start_ts").alias("s"),
                 F.max("end_ts").alias("e"))
            .select(
                "user_id", F.col("start_ts").alias("session_start"),
                F.col("n"), "s", "e",
            ).collect())
    )
    assert got == want


def test_forward_asof_picks_next_event_with_tolerance(spark):
    from tcrd_spark.operators.temporal_ext import forward_asof_join

    left = spark.createDataFrame(
        [(1, _t("2024-01-01T10:00"), 100)],
        "k long, ts timestamp, lv long",
    )
    right = spark.createDataFrame(
        [
            (1, _t("2024-01-01T09:00"), 1, 9.0),   # before: ignored
            (1, _t("2024-01-01T10:30"), 2, 30.0),  # NEXT (earliest >=)
            (1, _t("2024-01-01T10:30"), 3, 31.0),  # tie: larger id loses
            (1, _t("2024-01-01T11:00"), 4, 60.0),
        ],
        "k long, ts timestamp, rid long, rv double",
    )
    got = forward_asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts",
        right_cols=["rid", "rv"], right_order="rid",
    ).collect()
    assert len(got) == 1
    assert got[0].r_rid == 2 and got[0].r_rv == 30.0
    # tolerance: next event further ahead than 10 min -> NULLs
    got2 = forward_asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts",
        right_cols=["rid", "rv"], right_order="rid",
        tolerance_seconds=600,
    ).collect()
    assert got2[0].r_rid is None and got2[0].r_rv is None


def test_forward_asof_rejects_non_numeric_tiebreak(spark):
    """r7 ADVICE: a string right_order would cast('double') to NULL and
    silently randomize same-ts tie-breaks — raise instead."""
    import pytest

    from tcrd_spark.operators.temporal_ext import forward_asof_join

    left = spark.createDataFrame(
        [(1, _t("2024-01-01T10:00"))], "k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, _t("2024-01-01T10:30"), "id-2")],
        "k long, ts timestamp, rid string",
    )
    with pytest.raises(TypeError, match="non-numeric"):
        forward_asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="ts",
            right_cols=["rid"], right_order="rid",
        )
