"""PubChem MLP-assay E-utils XML → per-assay protein-target rows.

Reference: `python/mlpassay_xml2targets.py:44-63` — iterparse over
<DocumentSummary> elements, one output row per
ProteinTargetList/ProteinTarget with the species extracted from the
trailing '[...]' of the Name and stripped from it. Spark shape
matches the other XML sources (uniprot_xml, kgml): documents arrive
as a string column and parse inside mapInPandas (Arrow batches), so a
100 TB crawl of assay XML parses with zero driver involvement.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

TARGET_SCHEMA = (
    "aid string, tgt_gi string, tgt_sym string, tgt_species string, "
    "tgt_name string"
)

_SPECIES_RE = re.compile(r"^.*\[(.*)\].*$", re.S)
_NAME_RE = re.compile(r"\s*\[.*\].*$", re.S)


def parse_docsum(xml_str: str) -> list[dict]:
    """One DocumentSummary (or a document containing several) → target
    rows (`mlpassay_xml2targets.py:49-62`: Id, then per ProteinTarget
    the GI / GeneSymbol / species-split Name)."""
    root = ET.fromstring(xml_str)
    docsums = (
        [root] if root.tag == "DocumentSummary"
        else root.iter("DocumentSummary")
    )
    out = []
    for ds in docsums:
        aid = ds.findtext("Id")
        for pt in ds.findall("ProteinTargetList/ProteinTarget"):
            name = pt.findtext("Name") or ""
            m = _SPECIES_RE.match(name)
            out.append(
                {
                    "aid": aid,
                    "tgt_gi": pt.findtext("GI"),
                    "tgt_sym": pt.findtext("GeneSymbol"),
                    "tgt_species": m.group(1) if m else name,
                    "tgt_name": _NAME_RE.sub("", name),
                }
            )
    return out


def assay_targets_df(
    spark: SparkSession, xml_docs: list[str]
) -> DataFrame:
    """Distribute the documents and parse in Arrow batches."""
    raw = spark.createDataFrame([(d,) for d in xml_docs], "xml string")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [r for doc in pdf["xml"] for r in parse_docsum(doc)]
            yield pd.DataFrame(
                rows,
                columns=[
                    "aid", "tgt_gi", "tgt_sym", "tgt_species", "tgt_name",
                ],
            )

    return raw.mapInPandas(parse, TARGET_SCHEMA)
