"""KGML (KEGG pathway XML) source → edge-list DataFrames.

Reference: BioPython KGML parser → NetworkX DiGraph per pathway with
protein-complex "group" entries expanded to cliques
(`loaders/KEGG_Graph.py:5-11, 20-60`). Spark-first: parse each KGML
document to (pathway, entries, relations) with ElementTree in
mapInPandas; group expansion is the clique self-join
(operators/graph.clique_edges); shortest paths run through
operators/graph.apsp_local.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EDGE_SCHEMA = "pathway string, src string, dst string"


def parse_kgml(xml_str: str) -> list[tuple[str, str, str]]:
    """KGML → directed edges between KEGG gene names.

    Entries of type 'group' (complexes) expand to bidirectional
    cliques among their components; relations become edges between
    the (expanded) endpoint gene sets.
    """
    root = ET.fromstring(xml_str)
    pathway = root.get("name", "unknown")
    # entry id -> list of gene names (groups flatten components)
    genes: dict[str, list[str]] = {}
    groups: dict[str, list[str]] = {}
    for e in root.findall("entry"):
        eid, etype = e.get("id"), e.get("type")
        names = (e.get("name") or "").split()
        if etype == "group":
            comps = [c.get("id") for c in e.findall("component")]
            groups[eid] = comps
        elif etype == "gene":
            genes[eid] = names
    edges: list[tuple[str, str, str]] = []

    def resolve(eid: str) -> list[str]:
        if eid in genes:
            return genes[eid]
        if eid in groups:
            out: list[str] = []
            for c in groups[eid]:
                out += resolve(c)
            return out
        return []

    # group cliques: bidirectional edges among members
    for gid in groups:
        members = resolve(gid)
        for a in members:
            for b in members:
                if a != b:
                    edges.append((pathway, a, b))
    for rel in root.findall("relation"):
        srcs = resolve(rel.get("entry1"))
        dsts = resolve(rel.get("entry2"))
        for s in srcs:
            for d in dsts:
                if s != d:
                    edges.append((pathway, s, d))
    return edges


def kgml_edges(spark: SparkSession, xml_docs: list[str]) -> DataFrame:
    raw = spark.createDataFrame([(x,) for x in xml_docs], "xml string")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple[str, str, str]] = []
            for x in pdf["xml"]:
                rows += parse_kgml(x)
            yield pd.DataFrame(rows, columns=["pathway", "src", "dst"])

    return raw.mapInPandas(parse, EDGE_SCHEMA).distinct()
