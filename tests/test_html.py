"""HTML/boilerplate extraction (pipeline/html.py): rule axioms on
handcrafted pages, composability with the downstream corpus stages,
and the zero-shuffle plan shape. Values vs DuckDB ride the registry
sweep (`html_extract`)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tcrd_spark.pipeline.html import html_extract


def _extract(spark, page: str) -> str:
    df = spark.createDataFrame([(page,)], "page string")
    return df.select(html_extract("page").alias("x")).collect()[0].x


def test_extractor_keeps_body_drops_boilerplate(spark):
    page = (
        "<html><head><script>var x = 'nav nav nav nav';</script>"
        "<style>p {margin: 0}</style></head><body>"
        '<div><a href="/">Home</a> <a href="/x">All products</a></div>'
        "<!-- tracking pixel comment with many words inside -->"
        "<h1>Two words</h1>"
        "<p>This paragraph has plenty of body words to survive</p>"
        "<p>Second &quot;paragraph&quot; &amp; its entities</p>"
        '<p>See <a href="/t">terms of service and privacy</a> now</p>'
        "</body></html>"
    )
    got = _extract(spark, page)
    lines = got.split("\n")
    assert lines[0] == "This paragraph has plenty of body words to survive"
    assert lines[1] == 'Second "paragraph" & its entities'
    # nav (link-dense), h1 (< 3 words), footer-ish link-heavy line,
    # script/style payloads and comment text are all gone
    assert len(lines) == 2
    assert "nav" not in got and "margin" not in got
    assert "Home" not in got and "terms" not in got
    assert "tracking" not in got and "Two words" not in got


def test_extractor_entity_decode_is_one_level(spark):
    # '&amp;lt;' is the ESCAPED text '&lt;' — it must not double-decode
    got = _extract(
        spark, "<p>compare a &amp;lt; b with real a &lt; b here</p>"
    )
    assert got == "compare a &lt; b with real a < b here"


def test_extractor_all_boilerplate_page_is_empty(spark):
    got = _extract(
        spark,
        '<body><div><a href="/">Home page link</a></div>'
        "<h1>Hi</h1></body>",
    )
    assert got == ""


def test_extractor_survives_unclosed_tags(spark):
    got = _extract(spark, "<p>unclosed paragraph with enough words")
    assert got == "unclosed paragraph with enough words"


def test_extracted_text_feeds_gopher_stage(spark, sf_dir):
    """Stage-0 composability: the extractor's output is exactly the
    (doc_id, text) shape stage 1+ consumes — the Gopher gate runs on
    it unchanged and keeps real documents."""
    from tcrd_spark.pipeline.gopher import gopher_stats
    from tcrd_spark.pipeline.html import q_html_extract

    ex = q_html_extract(spark, sf_dir).withColumnRenamed(
        "extracted", "text"
    )
    stats = gopher_stats(ex, "doc_id", "text")
    row = stats.filter(F.col("n_words") > 0).count()
    assert row == ex.count()


def test_extractor_plan_is_shuffle_free(spark, sf_dir):
    from tcrd_spark.pipeline.html import q_html_extract

    df = q_html_extract(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan
