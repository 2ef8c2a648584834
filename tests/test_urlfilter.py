"""URL filtering (pipeline/urlfilter.py): rule precedence, parse
edge cases, and the shuffle-free plan. Values vs DuckDB ride the
registry sweep (`url_filter`)."""

from __future__ import annotations

from tcrd_spark.pipeline.urlfilter import filter_urls


def _reasons(spark, urls):
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "id long, url string"
    )
    return {r.url: r for r in filter_urls(df, "url").collect()}


def test_rules_fire_first_match_wins(spark):
    got = _reasons(spark, [
        "https://news.example.com/a/b.html",          # ok
        "https://spam.adfarm.biz/clean/path.html",     # blocklist
        "https://spam.adfarm.biz/ads/x",               # blocklist > ads
        "https://shop.example.shop/x.html",            # tld
        "https://blog.example.net/ads/banner",         # ads
        "https://docs.example.org/a/b/c/d/e/f.html",   # depth (6 > 4)
        "http://news.example.com/plain.html",          # http scheme ok
    ])
    want = {
        "https://news.example.com/a/b.html": "ok",
        "https://spam.adfarm.biz/clean/path.html": "blocklist",
        "https://spam.adfarm.biz/ads/x": "blocklist",
        "https://shop.example.shop/x.html": "tld",
        "https://blog.example.net/ads/banner": "ads",
        "https://docs.example.org/a/b/c/d/e/f.html": "depth",
        "http://news.example.com/plain.html": "ok",
    }
    assert {u: r.reason for u, r in got.items()} == want


def test_parse_features(spark):
    got = _reasons(spark, ["https://docs.example.org/a/b/c.html",
                           "https://news.example.com"])
    r = got["https://docs.example.org/a/b/c.html"]
    assert (r.host, r.tld, r.path_depth) == ("docs.example.org", "org", 3)
    bare = got["https://news.example.com"]
    assert bare.path_depth == 0 and bare.reason == "ok"


def test_plan_is_shuffle_free(spark, sf_dir):
    from tcrd_spark.pipeline.urlfilter import q_url_filter

    plan = (
        q_url_filter(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan
