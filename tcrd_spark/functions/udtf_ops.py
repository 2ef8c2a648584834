"""Python UDTF surface (Spark 4 table functions) — the last cell of
SURVEY §2.10's function-registration row.

`api/sql_surface.py` registers scalar SQL macros (pure Catalyst) and
the engine registers pandas UDAF-shaped logic elsewhere; a TABLE
function (one row in → many rows out, usable in a SQL FROM clause) is
the remaining registration kind. Two real corpus verbs:

- `tcrd_split_sentences(doc_id, text)`: sentence segmentation with
  per-sentence index and char offsets — the row-exploding text verb
  (chunkers, per-sentence dedup, citation alignment all start here).
- `tcrd_ngrams(doc_id, text, n)`: word n-gram emission with position
  — the shingle feed in table-function form.

Honesty about the hot path: BOTH verbs are also expressible as
row-local `explode(...)` column expressions (the engine's dedup/
chunking pipelines use that JVM-side form — see pipeline/text.py,
pipeline/dedup.py); a Python UDTF pays a Python-worker round trip per
partition. The UDTF form exists because it is an API COMPLETENESS
surface (SQL-only consumers write `SELECT * FROM tcrd_split_sentences(
TABLE(documents))`-style lateral calls) — the docstring price tag is
the point, not an accident. Throughput-sensitive pipelines keep the
expression form; tests pin that the two forms agree row-for-row.

Segmentation rule (shared with the expression form): sentences end at
[.!?]+ followed by whitespace; trailing text without a terminator is
a sentence. Pure regex — deterministic, no model.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SENT_RE = re.compile(r"[^.!?]*[.!?]+(?:\s+|$)|[^.!?]+$")


def split_sentences_py(text: str) -> list[tuple[int, int, str]]:
    """(sent_idx, char_offset, sentence) triples — the single shared
    implementation both the UDTF and the tests call."""
    out = []
    for i, m in enumerate(_SENT_RE.finditer(text or "")):
        s = m.group(0).strip()
        if s:
            out.append((i, m.start(), s))
    return out


class SplitSentences:
    """UDTF: (doc_id BIGINT, text STRING) → rows of
    (doc_id, sent_idx, char_offset, sentence)."""

    def eval(self, doc_id, text):  # noqa: D102 — UDTF contract
        for idx, off, s in split_sentences_py(text):
            yield doc_id, idx, off, s


class NGrams:
    """UDTF: (doc_id, text, n) → (doc_id, pos, gram) word n-grams."""

    def eval(self, doc_id, text, n):  # noqa: D102 — UDTF contract
        toks = [t for t in (text or "").split() if t]
        for i in range(max(0, len(toks) - int(n) + 1)):
            yield doc_id, i, " ".join(toks[i:i + int(n)])


def register_udtfs(spark: SparkSession) -> list[str]:
    """Install the table functions; returns registered names."""
    from pyspark.sql.functions import udtf

    spark.udtf.register(
        "tcrd_split_sentences",
        udtf(
            SplitSentences,
            returnType=(
                "doc_id bigint, sent_idx int, char_offset int, "
                "sentence string"
            ),
        ),
    )
    spark.udtf.register(
        "tcrd_ngrams",
        udtf(NGrams, returnType="doc_id bigint, pos int, gram string"),
    )
    return ["tcrd_split_sentences", "tcrd_ngrams"]


def split_sentences_expr(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """The JVM-side expression twin of the UDTF: same rule, zero
    Python workers — the form pipelines actually use."""
    # regexp_extract_all with the same RE2-safe pattern; posexplode
    # supplies sent_idx. char offsets need the running length of the
    # PRECEDING raw pieces: aggregate over the slice.
    pieces = F.expr(
        rf"regexp_extract_all({text_col}, '[^.!?]*[.!?]+(\\s+|$)|[^.!?]+$', 0)"
    )
    # offsets are window-free: the raw pieces tile the text from 0, so
    # each sentence's offset is the summed length of its predecessors
    # (a row-local fold over the array slice).
    return docs.select(
        F.col(id_col),
        F.posexplode(pieces).alias("sent_idx", "_raw"),
        pieces.alias("_pieces"),
    ).select(
        id_col,
        "sent_idx",
        F.aggregate(
            F.slice("_pieces", F.lit(1), F.col("sent_idx")),
            F.lit(0),
            lambda acc, x: acc + F.length(x),
        ).alias("char_offset"),
        F.trim("_raw").alias("sentence"),
    ).where(F.trim("_raw") != "")
