"""Source-parser tests: OBO stanzas, GCT unpivot, UniProt XML entries,
KGML graphs — synthetic minimal files exercising the reference's
parse semantics."""

from __future__ import annotations

OBO_DOC = """format-version: 1.2
ontology: doid

[Term]
id: DOID:1
name: disease
def: "A disposition." [url:x]
xref: MESH:D004194
xref: UMLS_CUI:C0012634

[Term]
id: DOID:2
name: disease of anatomical entity
is_a: DOID:1 ! disease
synonym: "anatomical disease" EXACT []
alt_id: DOID:3

[Term]
id: DOID:4
name: gone
is_obsolete: true
is_a: DOID:2

[Typedef]
id: part_of
name: part of
"""

GCT_DOC = """#1.2
2\t3
Name\tDescription\tGTEX-A-0001\tGTEX-A-0002\tGTEX-B-0001
ENSG1\tgene one\t1.0\t2.0\t0.0
ENSG2\tgene two\t5.5\t0.5\t4.5
"""

UNIPROT_ENTRY = """<entry xmlns="http://uniprot.org/uniprot" dataset="Swiss-Prot">
  <accession>P12345</accession>
  <accession>Q99999</accession>
  <name>TEST_HUMAN</name>
  <protein>
    <recommendedName><fullName>Test protein</fullName></recommendedName>
  </protein>
  <gene>
    <name type="primary">TST1</name>
    <name type="synonym">TST1B</name>
  </gene>
  <dbReference type="GO" id="GO:0005524">
    <property type="term" value="F:ATP binding"/>
    <property type="evidence" value="ECO:0000255"/>
  </dbReference>
  <dbReference type="Ensembl" id="ENSG00000001"/>
  <dbReference type="HGNC" id="HGNC:111"/>
  <comment type="tissue specificity">
    <text>Expressed in liver.</text>
  </comment>
  <feature type="active site" description="Proton acceptor">
    <location><position position="41"/></location>
  </feature>
  <feature type="chain" description="Full chain">
    <location><begin position="1"/><end position="300"/></location>
  </feature>
</entry>"""

KGML_DOC = """<pathway name="path:hsa00001" org="hsa" number="00001">
  <entry id="1" name="hsa:10" type="gene"/>
  <entry id="2" name="hsa:20 hsa:21" type="gene"/>
  <entry id="3" name="undefined" type="group">
    <component id="1"/>
    <component id="2"/>
  </entry>
  <entry id="4" name="hsa:30" type="gene"/>
  <relation entry1="3" entry2="4" type="PPrel"/>
</pathway>"""


def test_obo_parser(spark, tmp_path):
    from tcrd_spark.sources.obo import parent_edges, read_obo

    p = tmp_path / "doid.obo"
    p.write_text(OBO_DOC)
    terms = {r.term_id: r for r in read_obo(spark, str(p)).collect()}
    assert len(terms) == 3  # Typedef stanza ignored
    assert terms["DOID:1"].name == "disease"
    assert terms["DOID:1"].definition == "A disposition."
    assert terms["DOID:1"].xrefs == ["MESH:D004194", "UMLS_CUI:C0012634"]
    assert terms["DOID:2"].is_a == ["DOID:1"]
    assert terms["DOID:2"].alt_ids == ["DOID:3"]
    assert terms["DOID:2"].synonyms == ["anatomical disease"]
    assert terms["DOID:4"].is_obsolete is True
    edges = {(r.term_id, r.parent_id) for r in parent_edges(
        read_obo(spark, str(p))).collect()}
    assert edges == {("DOID:2", "DOID:1"), ("DOID:4", "DOID:2")}


def test_gct_unpivot(spark, tmp_path):
    from tcrd_spark.sources.gct import read_gct, sample_to_subject
    from pyspark.sql import functions as F

    p = tmp_path / "x.gct"
    p.write_text(GCT_DOC)
    long = read_gct(spark, str(p), value_name="rpkm")
    rows = {(r.gene, r.sample_id): r.rpkm for r in long.collect()}
    assert len(rows) == 6
    assert rows[("ENSG1", "GTEX-A-0002")] == 2.0
    assert rows[("ENSG2", "GTEX-B-0001")] == 4.5
    subj = {
        r.sample_id: r.subj
        for r in long.select(
            "sample_id", sample_to_subject(F.col("sample_id")).alias("subj")
        ).collect()
    }
    assert subj["GTEX-A-0001"] == "GTEX-A"


def test_uniprot_entry_parser(spark):
    from tcrd_spark.sources.uniprot_xml import entries_df

    out = entries_df(spark, [UNIPROT_ENTRY]).collect()
    assert len(out) == 1
    e = out[0]
    assert e.uniprot == "P12345"
    assert e.name == "TEST_HUMAN"
    assert e.description == "Test protein"
    assert e.sym == "TST1"
    assert ("uniprot", "Q99999") in [tuple(a) for a in e.aliases]
    assert ("symbol", "TST1B") in [tuple(a) for a in e.aliases]
    assert ("Ensembl", "ENSG00000001") in [tuple(x) for x in e.xrefs]
    assert [tuple(g) for g in e.goas] == [
        ("GO:0005524", "F:ATP binding", "ECO:0000255")
    ]
    feats = {f.ftype: (f.begin, f.end) for f in e.features}
    assert feats["active site"] == (41, 41)
    assert feats["chain"] == (1, 300)
    assert [tuple(x) for x in e.expressions] == [
        ("UniProt Tissue", "Expressed in liver.")
    ]


def test_kgml_graph_and_apsp(spark):
    from tcrd_spark.operators.graph import apsp_local
    from tcrd_spark.sources.kgml import kgml_edges

    edges = kgml_edges(spark, [KGML_DOC])
    got = {(r.src, r.dst) for r in edges.collect()}
    # group {hsa:10, hsa:20, hsa:21} clique + group -> hsa:30 relation
    assert ("hsa:10", "hsa:20") in got and ("hsa:20", "hsa:10") in got
    assert ("hsa:10", "hsa:30") in got and ("hsa:21", "hsa:30") in got
    assert ("hsa:30", "hsa:10") not in got  # relation is directed
    sp = apsp_local(
        edges.withColumnRenamed("pathway", "g")
        .withColumn("src", spark_hash("src"))
        .withColumn("dst", spark_hash("dst")),
        "g", "src", "dst",
    )
    assert sp.count() > 0


def spark_hash(col):
    from pyspark.sql import functions as F

    return F.xxhash64(col)


def test_uniprot_core_slice(spark):
    """entry rows → normalized core tables with stable surrogate ids
    and FK integrity (etl/uniprot.py, SURVEY §7 step 2)."""
    from tcrd_spark.etl.uniprot import core_slice
    from tcrd_spark.sources.uniprot_xml import entries_df

    entries = entries_df(spark, [UNIPROT_ENTRY])
    tables = core_slice(entries)
    prot = tables["protein"].collect()
    assert len(prot) == 1 and prot[0].uniprot == "P12345"
    pid = prot[0].id
    # deterministic id: same input → same id on a fresh run
    pid2 = core_slice(entries_df(spark, [UNIPROT_ENTRY]))["protein"] \
        .collect()[0].id
    assert pid == pid2
    # bridge joins target to protein 1:1
    bridge = tables["t2tc"].collect()[0]
    assert (bridge.target_id, bridge.protein_id) == (pid, pid)
    # children FK the protein id
    for t in ("alias", "xref", "goa", "feature", "expression"):
        rows = tables[t].collect()
        assert rows, t
        assert all(r.protein_id == pid for r in rows), t
    xtypes = {r.xtype for r in tables["xref"].collect()}
    assert "GO" not in xtypes          # GO split out into goa
    assert {"Ensembl", "HGNC"} <= xtypes
    feats = {(r.type, r.begin, r.end) for r in tables["feature"].collect()}
    assert ("chain", 1, 300) in feats
    exp = tables["expression"].collect()
    assert exp[0].tissue and exp[0].etype == "UniProt Tissue"


def test_csv_ddl_codegen(spark, tmp_path):
    """csv2sql analogue: inferSchema replaces the reference's two-pass
    type guesser (`python/csv2sql.py:26-120`)."""
    from tcrd_spark.sources.csv_ddl import csv_to_ddl

    p = tmp_path / "t.csv"
    p.write_text(
        "id,name,score,flag,when\n"
        "1,alpha,1.5,true,2020-01-01\n"
        "2,beta,2.0,false,2021-06-30\n"
    )
    ddl = csv_to_ddl(spark, str(p), "t")
    assert ddl.startswith("CREATE TABLE t (")
    assert "id INTEGER" in ddl
    assert "name VARCHAR" in ddl
    assert "score DOUBLE" in ddl
    assert "flag BOOLEAN" in ddl
    assert "when DATE" in ddl


# ------------------------------------------------------- web-payload ingest

PUBMED_XML = """<?xml version="1.0" ?>
<PubmedArticleSet>
  <PubmedArticle>
    <MedlineCitation>
      <PMID>101</PMID>
      <Article>
        <Journal>
          <Title>J Test</Title>
          <JournalIssue><PubDate><Year>2019</Year><Month>Mar</Month><Day>5</Day></PubDate></JournalIssue>
        </Journal>
        <ArticleTitle>Paper one.</ArticleTitle>
        <Abstract><AbstractText>Things happened.</AbstractText></Abstract>
        <AuthorList>
          <Author><LastName>Smith</LastName><ForeName>Jo</ForeName><Initials>J</Initials></Author>
          <Author><LastName>Lee</LastName><Initials>K</Initials></Author>
        </AuthorList>
      </Article>
    </MedlineCitation>
  </PubmedArticle>
  <PubmedArticle>
    <MedlineCitation>
      <PMID>102</PMID>
      <Article>
        <Journal><Title>J Big</Title><JournalIssue><PubDate><Year>2020</Year></PubDate></JournalIssue></Journal>
        <ArticleTitle>Paper two.</ArticleTitle>
        <AuthorList>
          <Author><LastName>A1</LastName></Author><Author><LastName>A2</LastName></Author>
          <Author><LastName>A3</LastName></Author><Author><LastName>A4</LastName></Author>
          <Author><LastName>A5</LastName></Author><Author><LastName>A6</LastName></Author>
        </AuthorList>
      </Article>
    </MedlineCitation>
  </PubmedArticle>
</PubmedArticleSet>
"""


def test_pubmed_efetch_xml_ingest(spark, tmp_path):
    from tcrd_spark.sources.ingest import pubmed_from_efetch_xml

    (tmp_path / "batch1.xml").write_text(PUBMED_XML)
    rows = {
        r.id: r for r in pubmed_from_efetch_xml(
            spark, str(tmp_path / "batch1.xml")
        ).collect()
    }
    assert set(rows) == {101, 102}
    r = rows[101]
    assert r.title == "Paper one."
    assert r.journal == "J Test"
    assert r.date == "2019-03-05"
    assert r.authors == "Smith, Jo J and Lee K."
    assert r.abstract == "Things happened."
    # >5 authors → the reference's "and N more authors." form
    assert rows[102].authors == "A1 and 5 more authors."
    assert rows[102].date == "2020"


def test_harmonizome_geneset_ingest(spark, tmp_path):
    import json

    from tcrd_spark.sources.ingest import harmonizome_gene_attributes

    doc = {
        "name": "CCLE gene set",
        "associations": [
            {"gene": {"symbol": "SYM1"}, "thresholdValue": 1},
            {"gene": {"symbol": "SYM2"}, "thresholdValue": -1},
            {"gene": {"symbol": "NOPE"}, "thresholdValue": 1},
        ],
    }
    p = tmp_path / "genesets.jsonl"
    p.write_text(json.dumps(doc) + "\n")
    protein = spark.createDataFrame(
        [(11, "SYM1"), (12, "SYM2")], "id int, sym string"
    )
    rows, notfnd = harmonizome_gene_attributes(spark, str(p), protein)
    got = {(r.protein_id, r.value) for r in rows.collect()}
    assert got == {(11, 1), (12, -1)}
    assert [r.sym for r in notfnd.collect()] == ["NOPE"]


def test_jsonl_to_bronze_schema_projection(spark, tmp_path):
    import json

    from tcrd_spark.sources.ingest import jsonl_to_bronze

    src = tmp_path / "pmscore.jsonl"
    src.write_text(
        json.dumps({"id": 1, "protein_id": 11, "year": 2020,
                    "score": "1.5", "extra_field": "x"}) + "\n"
    )
    out = jsonl_to_bronze(
        spark, str(src), str(tmp_path / "bronze"), table="pmscore"
    )
    assert out.columns == ["id", "protein_id", "year", "score"]
    r = out.collect()[0]
    assert r.year == 2020 and float(r.score) == 1.5


def test_export_sql_dump(spark, tmp_path):
    from tcrd_spark.sources.csv_ddl import export_sql_dump

    lake = {
        "mini": spark.createDataFrame(
            [(1, "a"), (2, "b")], "id int, name string"
        ),
    }
    out = tmp_path / "dump"
    names = export_sql_dump(lake, str(out), tables=["mini"])
    assert names == ["mini"]
    ddl = (out / "schema.sql").read_text()
    assert "CREATE TABLE mini" in ddl and "id INTEGER" in ddl
    back = spark.read.csv(str(out / "mini"), header=True, inferSchema=True)
    assert sorted((r.id, r.name) for r in back.collect()) == [(1, "a"), (2, "b")]


# ------------------------------------------------ batched_fetch loop


def test_batched_fetch_retry_and_notfnd(spark, tmp_path):
    """Chunked fetch with injected network: a transiently-failing
    chunk succeeds on the retry pass (marker file shared across worker
    processes), permanently-poisoned ids end in notfnd, everything
    else lands in the checkpoint parquet."""
    from tcrd_spark.sources.ingest import batched_fetch

    marker = str(tmp_path / "flaky_seen")
    out = str(tmp_path / "fetched")
    ids = spark.createDataFrame([(i,) for i in range(1, 21)], "id long")

    def fetch(batch_ids):
        import os

        if 13 in batch_ids:  # permanently down
            raise RuntimeError("boom")
        if 7 in batch_ids and not os.path.exists(marker):
            open(marker, "w").close()  # fail once, succeed on retry
            raise RuntimeError("transient")
        return {i: f"payload-{i}" for i in batch_ids}

    fetched, notfnd = batched_fetch(
        spark, ids, fetch, out, chunk_size=2, max_retries=2
    )
    got = {r.id: r.payload for r in fetched.collect()}
    missing = {r.id for r in notfnd.collect()}
    # 13's chunk partner also fails with it, every retry
    assert 13 in missing and len(missing) <= 2
    assert 7 in got and got[7] == "payload-7"
    assert set(got) | missing == set(range(1, 21))


def test_batched_fetch_resumes_without_refetch(spark, tmp_path):
    """Ids already in the checkpoint are anti-joined away BEFORE any
    fetch — the pre-seeded payload survives untouched and the fetch
    function never sees those ids (crash-safe shelve pattern)."""
    from tcrd_spark.sources.ingest import batched_fetch

    out = str(tmp_path / "fetched")
    spark.createDataFrame(
        [(1, "old-1"), (2, "old-2")], "id long, payload string"
    ).write.parquet(out)
    called = str(tmp_path / "calls")

    def fetch(batch_ids):
        import os

        os.makedirs(called, exist_ok=True)
        for i in batch_ids:
            open(os.path.join(called, str(i)), "w").close()
        return {i: f"new-{i}" for i in batch_ids}

    ids = spark.createDataFrame([(1,), (2,), (3,)], "id long")
    fetched, notfnd = batched_fetch(spark, ids, fetch, out, chunk_size=10)
    import os

    got = {r.id: r.payload for r in fetched.collect()}
    assert got == {1: "old-1", 2: "old-2", 3: "new-3"}
    assert notfnd.isEmpty()
    assert sorted(os.listdir(called)) == ["3"]
