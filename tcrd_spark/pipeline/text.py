"""Text-analysis operators for a training-data pipeline.

All pure column expressions (JVM-side, whole-stage codegen) — these run
map-side over a 100 TB `documents` table with zero shuffle, so the scan
is the only cost and Catalyst prunes it to the `text` column.

The reference's closest analogue is the dictionary-based entity tagging
driver (`python/grant_tagger.py:1-30`, external C++ tagger) and the
text-mining score ETL (`loaders/load-JensenLab-*.py`); these operators
generalize that per-document scoring surface.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from tcrd_spark.functions.hashing import rolling_fingerprint

# BPE-ish token pattern: word pieces, numbers, or single punctuation —
# a public-vocabulary approximation of byte-pair pretokenization.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# Tiny per-language stopword profiles for the n-gram/stopword heuristic
# language-ID. Deterministic and SQL-expressible; not a real langid model.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "is"),
    "de": ("der", "die", "das", "und", "ist", "ein"),
    "fr": ("le", "la", "et", "les", "des", "est"),
    "es": ("el", "la", "los", "que", "y", "es"),
}

STOPWORDS = LANG_PROFILES["en"]


def ws_tokens(text: Column | str) -> Column:
    """Whitespace tokenization (split on runs of spaces)."""
    return F.split(F.col(text) if isinstance(text, str) else text, r"\s+")


def token_counts(text: Column | str) -> dict[str, Column]:
    """Whitespace token count + BPE-ish regex token count."""
    c = F.col(text) if isinstance(text, str) else text
    return {
        "ws_tokens": F.size(ws_tokens(c)),
        "bpe_tokens": F.size(F.regexp_extract_all(c, F.lit(BPE_TOKEN_RE), 0)),
    }


def quality_features(text: Column | str) -> dict[str, Column]:
    """Length / punctuation ratio / stopword ratio / mean word length —
    the standard cheap quality-filter features (C4/Gopher-style rules,
    public recipes)."""
    c = F.col(text) if isinstance(text, str) else text
    toks = ws_tokens(c)
    n_tok = F.size(toks)
    n_chars = F.length(c)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.array_intersect(F.array_distinct(toks), stop_arr))
    n_punct = F.size(F.regexp_extract_all(c, F.lit(r"[^\w\s]"), 0))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tok,
        "mean_word_len": F.round((n_chars - n_tok + 1) / n_tok, 6),
        "punct_ratio": F.round(n_punct / n_chars, 6),
        "stopword_hit_ratio": F.round(n_stop / F.lit(len(STOPWORDS)), 6),
    }


def quality_score(text: Column | str) -> Column:
    """Composite 0-1 quality score: inside-range token count, low punct,
    some stopwords. Weights are arbitrary but fixed (documented here and
    mirrored in the oracle SQL)."""
    f = quality_features(text)
    len_ok = (f["n_tokens"] >= 20) & (f["n_tokens"] <= 1000)
    return F.round(
        F.when(len_ok, 0.5).otherwise(0.0)
        + F.when(f["punct_ratio"] < 0.1, 0.25).otherwise(0.0)
        + f["stopword_hit_ratio"] * 0.25,
        6,
    )


def lang_scores(text: Column | str) -> dict[str, Column]:
    """Per-language stopword-profile hit counts over distinct tokens."""
    toks = F.array_distinct(ws_tokens(text))
    return {
        lang: F.size(
            F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))
        )
        for lang, words in LANG_PROFILES.items()
    }


def lang_id(text: Column | str) -> Column:
    """Argmax language with deterministic tie order en>de>fr>es;
    'und' (undetermined) when no profile matches."""
    scores = lang_scores(text)
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    # build when-chain in reverse so earlier languages win ties
    for lang in reversed(list(LANG_PROFILES)):
        expr = F.when(
            (scores[lang] == best) & (best > 0), F.lit(lang)
        ).otherwise(expr)
    return expr


CONTROL_CHARS = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"
HTML_TAG = r"<[^>]{1,200}>"
EMAIL = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
URL = r"https?://[^\s]+"


def clean_text(text: Column | str) -> Column:
    """Corpus-normalization pass: strip control characters and HTML
    tags, collapse runs of whitespace, trim. Pure JVM regexps (RE2-
    compatible, so the DuckDB oracle runs the identical patterns) —
    the standard first step of an LLM data pipeline, map-side only."""
    c = F.col(text) if isinstance(text, str) else text
    c = F.regexp_replace(c, CONTROL_CHARS, "")
    c = F.regexp_replace(c, HTML_TAG, " ")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def mask_pii(text: Column | str) -> Column:
    """Replace emails and URLs with typed placeholder tokens — the
    minimal PII/leakage scrub a training corpus gets before tokenizing.
    Deliberately pattern-conservative (no lookaround, RE2-safe) so
    Spark and the oracle agree byte-for-byte."""
    c = F.col(text) if isinstance(text, str) else text
    c = F.regexp_replace(c, EMAIL, "<EMAIL>")
    c = F.regexp_replace(c, URL, "<URL>")
    return c


def fingerprint(text: Column | str) -> Column:
    """Document fingerprint: polynomial rolling hash over ws tokens."""
    return rolling_fingerprint(ws_tokens(text))


def tag_dictionary_terms(text: Column | str, terms: list[str]) -> Column:
    """Dictionary-based entity tagging: the distinct dictionary terms
    mentioned in the document, sorted.

    The reference shells out to the JensenLab C++ `tagger` over grant
    text (`python/grant_tagger.py:1-30`); the engine-side pattern is a
    broadcast dictionary matched per document — here the dictionary is
    a literal array (small dictionaries); for megaword dictionaries,
    explode tokens and semi-join a dictionary DataFrame instead."""
    dict_arr = F.array(*[F.lit(t) for t in terms])
    return F.array_sort(
        F.array_intersect(F.array_distinct(ws_tokens(text)), dict_arr)
    )
