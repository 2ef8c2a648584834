"""OBO ontology source (DO / ECO / MPO / Uberon).

The reference hand-writes a stanza parser (`python/obo.py:101-242`)
and walks it single-threaded. Spark-first: each OBO FILE is one row
(`spark.read.text(wholetext=True)`) — ontology files are MBs, far
under task limits — and stanza splitting + tag parsing run inside
mapInPandas, yielding one row per [Term] with typed columns. Parent
edges (`is_a`) come out as an array ready to explode into the
do_parent/uberon_parent edge tables (SURVEY §1.1 ontology shape).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

TERM_SCHEMA = (
    "term_id string, name string, namespace string, definition string, "
    "is_a array<string>, alt_ids array<string>, xrefs array<string>, "
    "synonyms array<string>, is_obsolete boolean"
)


def _parse_stanza(stanza: str) -> dict | None:
    rec = {
        "term_id": None, "name": None, "namespace": None,
        "definition": None, "is_a": [], "alt_ids": [], "xrefs": [],
        "synonyms": [], "is_obsolete": False,
    }
    for line in stanza.splitlines():
        line = line.strip()
        if not line or line.startswith("!"):
            continue
        if ":" not in line:
            continue
        tag, val = line.split(":", 1)
        val = val.strip()
        if tag == "id":
            rec["term_id"] = val
        elif tag == "name":
            rec["name"] = val
        elif tag == "namespace":
            rec["namespace"] = val
        elif tag == "def":
            rec["definition"] = val.split('"')[1] if '"' in val else val
        elif tag == "is_a":
            rec["is_a"].append(val.split("!")[0].strip())
        elif tag == "alt_id":
            rec["alt_ids"].append(val)
        elif tag == "xref":
            rec["xrefs"].append(val.split(" ")[0])
        elif tag == "synonym":
            rec["synonyms"].append(val.split('"')[1] if '"' in val else val)
        elif tag == "is_obsolete":
            rec["is_obsolete"] = val == "true"
    return rec if rec["term_id"] else None


def read_obo(spark: SparkSession, path: str) -> DataFrame:
    """Parse OBO file(s) to one row per [Term]."""
    raw = spark.read.text(path, wholetext=True)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc in pdf["value"]:
                for chunk in doc.split("[Term]")[1:]:
                    # a stanza ends at the next [..] section header
                    body = chunk.split("\n[")[0]
                    rec = _parse_stanza(body)
                    if rec:
                        rows.append(rec)
            yield pd.DataFrame(
                rows,
                columns=[
                    "term_id", "name", "namespace", "definition", "is_a",
                    "alt_ids", "xrefs", "synonyms", "is_obsolete",
                ],
            )

    return raw.mapInPandas(parse, TERM_SCHEMA)


def parent_edges(terms: DataFrame) -> DataFrame:
    """(term_id, parent_id) edge table — the do_parent/uberon_parent
    shape (`SQL/create-TCRDv7.sql:446,2229`)."""
    from pyspark.sql import functions as F

    return terms.select(
        "term_id", F.explode("is_a").alias("parent_id")
    ).distinct()
