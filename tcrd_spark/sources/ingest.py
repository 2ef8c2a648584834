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


def batched_fetch(
    spark: SparkSession,
    ids: DataFrame,
    fetch_fn,
    out_dir: str,
    id_col: str = "id",
    chunk_size: int = 200,
    max_retries: int = 2,
    rate_limit_s: float = 0.0,
) -> tuple[DataFrame, DataFrame]:
    """The reference's chunked web-fetch loop as a restartable Spark
    stage (`loaders/load-PubMed.py:112-140` chunks of 200 ids with one
    inline retry, `:83` shelve checkpoint, `:162-205` error-retry
    pass). The network call is INJECTED (`fetch_fn(list_of_ids) ->
    {id: payload}`), so the engine owns chunking, parallelism, rate
    limiting, retries, and resumability, while the caller owns HTTP.

    - Chunks execute inside mapInPandas: each task slices its Arrow
      batch into ≤chunk_size id lists, calls fetch_fn per slice, and
      sleeps rate_limit_s between slices (the reference's 0.5 s
      EUtils throttle — per-task here, matching a per-worker API key).
    - A failed slice (fetch_fn raises) marks its ids failed; after the
      first pass, failed ids re-fetch in up to max_retries further
      passes — the error-retry loop, driver-coordinated like the
      reference's, with the work itself distributed.
    - Checkpoint/resume: fetched (id, payload) rows append to out_dir
      parquet; on restart, ids already present are anti-joined away
      BEFORE any fetch, so a killed run resumes where it stopped (the
      shelve pattern, but crash-safe and parallel).

    Returns (fetched, notfnd): all rows now in out_dir, and the ids
    still failing after every retry.
    """
    import os
    import time

    from pyspark.sql.types import StringType, StructField, StructType

    id_type = ids.schema[id_col].dataType
    out_schema = StructType(
        [
            StructField(id_col, id_type),
            StructField("payload", StringType()),
            StructField("ok", StringType()),
        ]
    )

    def fetch_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        first = True
        for pdf in batches:
            vals = list(pdf[id_col])
            for i in range(0, len(vals), chunk_size):
                if not first and rate_limit_s:
                    time.sleep(rate_limit_s)
                first = False
                slice_ids = vals[i : i + chunk_size]
                try:
                    got = fetch_fn(slice_ids)
                except Exception:
                    got = None
                if got is None:
                    yield pd.DataFrame(
                        {id_col: slice_ids, "payload": None, "ok": "n"}
                    )
                else:
                    yield pd.DataFrame(
                        {
                            id_col: slice_ids,
                            "payload": [got.get(x) for x in slice_ids],
                            "ok": ["y" if x in got else "n" for x in slice_ids],
                        }
                    )

    todo = ids.select(id_col).distinct()
    if os.path.isdir(out_dir) and any(
        f.endswith(".parquet") for f in os.listdir(out_dir)
    ):
        done = spark.read.parquet(out_dir).select(id_col)
        todo = todo.join(done, id_col, "left_anti")

    import shutil

    scratch_dirs = []
    for attempt in range(1 + max_retries):
        if todo.isEmpty():
            break
        # fetch_fn is side-effectful: materialize each pass ONCE to a
        # scratch dir (an "_"-prefixed path — invisible to the parquet
        # reader of out_dir), then derive both the good rows and the
        # retry list from the materialized result. Reusing the lazy
        # frame would re-execute every fetch per consumer.
        scratch = os.path.join(out_dir, f"_pass_{attempt}")
        scratch_dirs.append(scratch)
        todo.mapInPandas(fetch_partition, out_schema).write.mode(
            "overwrite"
        ).parquet(scratch)
        res = spark.read.parquet(scratch)
        res.filter(F.col("ok") == "y").select(id_col, "payload").write.mode(
            "append"
        ).parquet(out_dir)
        todo = res.filter(F.col("ok") == "n").select(id_col)

    for d in scratch_dirs:
        shutil.rmtree(d, ignore_errors=True)
    have_rows = os.path.isdir(out_dir) and any(
        f.endswith(".parquet") for f in os.listdir(out_dir)
    )
    fetched = (
        spark.read.parquet(out_dir)
        if have_rows
        else spark.createDataFrame(
            [], StructType(out_schema.fields[:2])
        )
    )
    notfnd = ids.select(id_col).distinct().join(
        fetched.select(id_col), id_col, "left_anti"
    )
    return fetched, notfnd
