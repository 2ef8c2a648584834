"""Compression-ratio quality scoring — the zlib heuristic modern web
pipelines (RefinedWeb, Dolma, FineWeb ablations) use beside Gopher
rules: highly REPETITIVE text (boilerplate, keyword stuffing, template
spam) compresses far below prose, and random/binary-ish content
barely compresses at all; both tails are low-quality for training.

    ratio(d) = len(zlib(d, level=6)) / len(d)      (UTF-8 bytes)
    bucket   = repetitive (< LO) | prose ([LO, HI]) | incompressible (> HI)

This is the engine's canonical SLOW-PATH surface done right: zlib has
no Catalyst/DuckDB expression, so the score is an Arrow-batched
`pandas_udf` — one Python-worker round trip per ~10k-row batch,
vectorized bytes-in/floats-out, never a row-at-a-time Python UDF. The
level is PINNED (6) so scores are deterministic across runs and
executors; zlib's format is stable across CPython versions in
practice, and the pytest pins the reference values so a library bump
that changed byte counts would fail loudly, not drift silently.

No DuckDB oracle exists for zlib ITSELF, but BOTH registered queries
adjudicate through the committed content-hash-keyed sidecar fixture
(tools/gen_zlib_sidecar.py, level pinned over every distinct testdata
document): `doc_compressibility` (the live-UDF production path) gets
a LEFT-JOIN oracle whose byte counts the pytest re-validates against
direct Python zlib on every run — exact equality plus the monotone
invariants (repetition ⇒ lower ratio; random-ish ⇒ higher) — and
`compressibility_buckets` runs the division + CASE live in both
engines over the same sidecar (VERDICT r9 #6 / r10 #7; the production
path previously took the weaker rows-only driver check).

100 TB shape: embarrassingly parallel map work, no shuffle; cost is
~30 MB/s/core of zlib — the reason real pipelines run this ONCE and
store the score as a column (the quality/expectations gate can then
range-check it for free on every ingest).

Reference parity: none (extension; corpus-construction family).
"""

from __future__ import annotations

import os
import zlib

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

LEVEL = 6
LO, HI = 0.35, 0.95


_UDF = None


def _zlib_ratio_udf():
    """Built lazily — a module-level @pandas_udf parses its return
    type at import time and needs a live session."""
    global _UDF
    if _UDF is None:
        @pandas_udf("double")
        def _zlib_ratio(texts: pd.Series) -> pd.Series:
            def ratio(t):
                if t is None:
                    return None
                b = t.encode("utf-8")
                if not b:
                    return None
                return len(zlib.compress(b, LEVEL)) / len(b)

            return texts.map(ratio)

        _UDF = _zlib_ratio
    return _UDF


def compression_scores(
    docs: DataFrame, id_col: str, text_col: str,
    lo: float = LO, hi: float = HI,
) -> DataFrame:
    """(id, n_bytes, zlib_ratio, bucket): per-document compressibility
    with the three-way quality bucket."""
    r = F.round(_zlib_ratio_udf()(F.col(text_col)), 6)
    return docs.select(
        id_col,
        F.octet_length(text_col).alias("n_bytes"),
        r.alias("zlib_ratio"),
    ).select(
        "*",
        F.when(F.col("zlib_ratio") < lo, F.lit("repetitive"))
        .when(F.col("zlib_ratio") > hi, F.lit("incompressible"))
        .otherwise(F.lit("prose"))
        .alias("bucket"),
    )


def mean_ratio_band(
    text_col: str, lo: float = LO, hi: float = HI
) -> dict:
    """Expectation spec (quality/expectations.py contract): the
    batch's MEAN zlib ratio must sit in [lo, hi] — the ingest gate
    against template-spam floods (mean collapses toward 0) and
    binary/garbled floods (mean rises past prose). The metric is the
    Arrow UDF inside a plain F.avg, so it rides the one-pass verdict
    suite and the write-audit-publish sink unchanged. No `sql_metric`:
    zlib has no SQL twin, so this spec gates ingest but cannot join an
    ADJUDICATED dq query (the generator needs the SQL side)."""
    return {
        "name": f"zlib_band_{text_col}", "column": text_col,
        "metric": lambda: F.avg(_zlib_ratio_udf()(F.col(text_col))),
        "passed": lambda m: (m >= F.lit(lo)) & (m <= F.lit(hi)),
    }


# ------------------------------------------------- registered query


def q_doc_compressibility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document zlib compression ratio + quality bucket. Live
    Arrow-batched zlib UDF on the Spark side; adjudicated against the
    sidecar-join oracle (the pytest twin pins exact equality against
    direct Python zlib, so the sidecar cannot drift)."""
    from tcrd_spark.sources.lake import load_table

    docs = load_table(spark, sf_dir, "documents")
    return compression_scores(docs, "doc_id", "text")


_SIDECAR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))),
    "tests", "fixtures", "zlib_sidecar.parquet",
)


def q_compressibility_buckets(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The ADJUDICABLE twin of `doc_compressibility` (VERDICT r9 #6):
    zlib itself has no SQL expression, so the compressed SIZES come
    from a committed sidecar fixture keyed by md5(text) — generated
    once by tools/gen_zlib_sidecar.py at pinned level 6 over every
    distinct testdata document — and the ratio + bucket VERDICT LOGIC
    (the part that can silently rot) runs live in both engines and
    hash-matches. tests/test_compressibility.py pins this variant
    row-identical to the pandas-UDF production path, which transitively
    re-validates the sidecar's byte counts against live Python zlib on
    every run."""
    from tcrd_spark.sources.lake import load_table

    # NULL/empty docs are excluded in BOTH engines: the production
    # path scores them NULL-ratio/'prose', but the sidecar variant
    # would divide by octet_length 0 — Spark (non-ANSI) nulls the
    # division while DuckDB yields Infinity, a cross-engine verdict
    # split; and md5(NULL) never joins. The pytest pin compares on
    # this same non-empty subset.
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull() & (F.octet_length("text") > 0)
    )
    side = spark.read.parquet(_SIDECAR)
    joined = docs.join(
        F.broadcast(side), F.md5(F.col("text")) == F.col("text_md5")
    )
    r = F.round(F.col("zlib_bytes") / F.octet_length("text"), 6)
    return joined.select(
        "doc_id",
        F.octet_length("text").alias("n_bytes"),
        r.alias("zlib_ratio"),
    ).select(
        "*",
        F.when(F.col("zlib_ratio") < LO, F.lit("repetitive"))
        .when(F.col("zlib_ratio") > HI, F.lit("incompressible"))
        .otherwise(F.lit("prose"))
        .alias("bucket"),
    )


QUERIES = {
    "doc_compressibility": q_doc_compressibility,
    "compressibility_buckets": q_compressibility_buckets,
}

# zlib itself is not SQL-expressible, but the committed sidecar
# fixture (content-hash-keyed, level-pinned byte counts that the
# pytest re-validates against live zlib every run) gives BOTH queries
# a DuckDB twin (VERDICT r10 #7 — the production path previously took
# the weaker rows-only check and burned a cap slot on a permanent
# no_oracle row). The production oracle LEFT JOINs the sidecar so
# NULL/empty documents keep the production semantics: NULL ratio,
# 'prose' bucket (a NULL CASE comparison falls through to ELSE in
# both engines).
ORACLE: dict[str, str] = {
    "doc_compressibility": f"""
        SELECT doc_id, n_bytes, zlib_ratio,
               CASE
                 WHEN zlib_ratio < {LO} THEN 'repetitive'
                 WHEN zlib_ratio > {HI} THEN 'incompressible'
                 ELSE 'prose'
               END AS bucket
        FROM (
          SELECT doc_id,
                 octet_length(encode(text)) AS n_bytes,
                 CASE WHEN text IS NULL OR octet_length(encode(text)) = 0
                      THEN NULL
                      ELSE round(CAST(zlib_bytes AS DOUBLE)
                                 / octet_length(encode(text)), 6)
                 END AS zlib_ratio
          FROM documents
          LEFT JOIN read_parquet('{_SIDECAR}') s
            ON s.text_md5 = md5(text)
        ) scored
    """,
    "compressibility_buckets": f"""
        SELECT doc_id,
               octet_length(encode(text)) AS n_bytes,
               round(CAST(zlib_bytes AS DOUBLE)
                     / octet_length(encode(text)), 6) AS zlib_ratio,
               CASE
                 WHEN round(CAST(zlib_bytes AS DOUBLE)
                      / octet_length(encode(text)), 6) < {LO}
                   THEN 'repetitive'
                 WHEN round(CAST(zlib_bytes AS DOUBLE)
                      / octet_length(encode(text)), 6) > {HI}
                   THEN 'incompressible'
                 ELSE 'prose'
               END AS bucket
        FROM documents
        JOIN read_parquet('{_SIDECAR}') s ON s.text_md5 = md5(text)
        WHERE text IS NOT NULL AND octet_length(encode(text)) > 0
    """,
}
