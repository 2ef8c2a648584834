"""Web-API payload → bronze-parquet ingest shims.

The reference's two web-API ingest loops — Harmonizome REST JSON
(`loaders/load-Harmonizome.py:44-110`) and batched PubMed E-utils XML
(`loaders/load-PubMed.py:112-140`, parser `:320-373`) — are network
steps the engine scopes out (SURVEY §2.1). What belongs IN the engine
is everything after the response body hits disk: these shims take the
saved payloads (JSONL gene-set docs; efetch XML batches) and produce
lake-schema rows, closing the loop so a `curl`-then-ingest pipeline
needs no reference code.

Scale shape: one payload file = one parse unit inside mapInPandas
(Arrow-batched); a directory of thousands of saved responses parses
with full parallelism and no driver involvement.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def jsonl_to_bronze(
    spark: SparkSession, path: str, out_path: str, table: str | None = None
) -> DataFrame:
    """Generic JSONL → bronze parquet. With `table`, columns are
    selected/cast to the declared lake schema (extra payload fields
    dropped, missing ones null); without, the inferred schema lands
    as-is. Returns the frame that was written."""
    df = spark.read.json(path)
    if table is not None:
        from tcrd_spark.schema.tables import TABLE_SCHEMAS

        schema = TABLE_SCHEMAS[table]
        df = df.select(
            *[
                (
                    F.col(f.name).cast(f.dataType)
                    if f.name in df.columns
                    else F.lit(None).cast(f.dataType)
                ).alias(f.name)
                for f in schema.fields
            ]
        )
    df.write.mode("overwrite").parquet(out_path)
    return spark.read.parquet(out_path)


def harmonizome_gene_attributes(
    spark: SparkSession, genesets_jsonl: str, protein: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Saved Harmonizome gene-set JSON docs → gene_attribute rows
    (`loaders/load-Harmonizome.py:88-110`): each doc is one gene set
    {name, associations: [{gene: {symbol}, thresholdValue}]}; symbols
    that resolve to no protein are skipped (`:103`), which the notfnd
    frame reports instead of silently dropping.

    Returns (gene_attribute_rows(protein_id, name, value), notfnd)."""
    raw = spark.read.json(genesets_jsonl)
    assoc = raw.select(
        F.col("name"),
        F.explode("associations").alias("a"),
    ).select(
        "name",
        F.col("a.gene.symbol").alias("sym"),
        F.col("a.thresholdValue").cast("int").alias("value"),
    )
    p = F.broadcast(protein.select(F.col("id").alias("protein_id"), "sym"))
    joined = assoc.join(p, "sym", "left")
    notfnd = joined.filter(F.col("protein_id").isNull()).select("sym").distinct()
    rows = joined.filter(F.col("protein_id").isNotNull()).select(
        "protein_id", "name", "value"
    )
    return rows, notfnd


_MONTHS = {
    "Jan": "01", "Feb": "02", "Mar": "03", "Apr": "04", "May": "05",
    "Jun": "06", "Jul": "07", "Aug": "08", "Sep": "09", "Oct": "10",
    "Nov": "11", "Dec": "12",
}


def _author_str(a) -> str | None:
    """LastName, ForeName Initials — reference format (`:344-348`)."""
    last = a.find("LastName")
    if last is None or last.text is None:
        return None
    s = last.text
    fore = a.find("ForeName")
    if fore is not None and fore.text:
        s += f", {fore.text}"
    init = a.find("Initials")
    if init is not None and init.text:
        s += f" {init.text}"
    return s


def _authors_field(authors: list) -> str | None:
    """The reference's two-mode authors string (`load-PubMed.py:
    336-369`): >5 authors → 'First, F I and N more authors.';
    ≤5 → 'a1, a2 and last.'."""
    if not authors:
        return None
    if len(authors) > 5:
        first = _author_str(authors[0])
        if first is None:
            return None
        return f"{first} and {len(authors) - 1} more authors."
    rest, last = authors[:-1], authors[-1]
    last_s = _author_str(last)
    if last_s is None:
        return None
    head = ", ".join(
        s for s in (_author_str(a) for a in rest) if s is not None
    )
    return f"{head} and {last_s}."


def _parse_pubmed_article(pma) -> dict | None:
    """One PubmedArticle element → a pubmed-table dict, field rules per
    `loaders/load-PubMed.py:320-373`."""
    pmid = pma.find(".//PMID")
    article = pma.find(".//Article")
    if pmid is None or article is None:
        return None
    title = article.find("ArticleTitle")
    rec = {
        "id": int(pmid.text),
        "title": title.text if title is not None else None,
        "journal": None,
        "date": None,
        "authors": None,
        "abstract": None,
    }
    journal = article.find("Journal")
    if journal is not None:
        jt = journal.find("Title")
        if jt is not None:
            rec["journal"] = jt.text
        pd_el = journal.find(".//PubDate")
        if pd_el is not None:
            y = pd_el.find("Year")
            m = pd_el.find("Month")
            d = pd_el.find("Day")
            if y is not None:
                date = y.text
                if m is not None:
                    date += "-" + _MONTHS.get(m.text, m.text)
                    if d is not None:
                        date += "-" + d.text.zfill(2)
                rec["date"] = date
    rec["authors"] = _authors_field(pma.findall(".//Author"))
    abstract = article.find(".//AbstractText")
    if abstract is not None:
        rec["abstract"] = abstract.text
    return rec


PUBMED_SCHEMA = (
    "id long, title string, journal string, date string, "
    "authors string, abstract string"
)


def pubmed_from_efetch_xml(spark: SparkSession, path: str) -> DataFrame:
    """Saved E-utils efetch XML (PubmedArticleSet batches) → pubmed
    rows. One saved response = one parse unit; a directory of batches
    parses in parallel inside mapInPandas."""
    import xml.etree.ElementTree as ET

    raw = spark.read.text(path, wholetext=True)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["id", "title", "journal", "date", "authors", "abstract"]
        for pdf in batches:
            rows = []
            for doc in pdf["value"]:
                root = ET.fromstring(doc)
                for pma in root.iter("PubmedArticle"):
                    rec = _parse_pubmed_article(pma)
                    if rec is not None:
                        rows.append(rec)
            yield pd.DataFrame(rows, columns=cols)

    return raw.mapInPandas(parse, schema=PUBMED_SCHEMA).dropDuplicates(["id"])
