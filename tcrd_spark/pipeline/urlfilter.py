"""URL filtering — the pre-crawl/pre-fetch gate of a web corpus
(C4 / RefinedWeb discipline): before any byte of a page is fetched or
extracted, its URL is judged — blocklisted hosts, disallowed TLDs,
ad/tracker path fragments, and absurd path depths are dropped. Cheap,
row-local, and it removes a large fraction of junk before the
expensive stages ever see it (stage -1 to `pipeline/html.py`'s
stage 0).

Everything is regexp/CASE expression work shared verbatim with the
oracle (Spark's parse_url has no DuckDB twin, so host/tld/path parse
with the same RE2-safe patterns on both engines). First matching rule
wins, and the verdict is a REASON, not a boolean — the funnel
discipline (`web_pipeline_funnel`): a pipeline that cannot say WHY it
dropped a URL cannot be audited.

100 TB shape: zero shuffles — a pure Project over the URL column; the
blocklist is a literal IN-list here and a broadcast join at real
blocklist sizes (millions of hosts — the `decontaminate` broadcast
pattern applies unchanged).

Reference parity: none (extension; SURVEY §2 corpus-construction).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

HOST_RE = r"^https?://([^/]+)"
PATH_RE = r"^https?://[^/]+(/.*)$"
TLD_RE = r"\.([a-z0-9-]+)$"

BLOCKLIST = ("spam.adfarm.biz", "tracker.clickmill.io")
TLD_ALLOW = ("com", "org", "net")
AD_FRAGMENT = "/ads/"
MAX_DEPTH = 4


def url_features(url: Column | str) -> dict[str, Column]:
    """host / tld / path_depth from a URL column (RE2-safe parse)."""
    u = F.col(url) if isinstance(url, str) else url
    host = F.regexp_extract(u, HOST_RE, 1)
    path = F.regexp_extract(u, PATH_RE, 1)
    depth = F.size(
        F.filter(F.split(path, "/"), lambda s: s != "")
    )
    return {
        "host": host,
        "tld": F.regexp_extract(host, TLD_RE, 1),
        "path_depth": depth,
    }


def url_filter_reason(
    url: Column | str,
    blocklist: tuple[str, ...] = BLOCKLIST,
    tld_allow: tuple[str, ...] = TLD_ALLOW,
    ad_fragment: str = AD_FRAGMENT,
    max_depth: int = MAX_DEPTH,
) -> dict[str, Column]:
    """Features + first-matching-rule verdict ('ok' or the drop
    reason: blocklist / tld / ads / depth)."""
    u = F.col(url) if isinstance(url, str) else url
    f = url_features(u)
    reason = (
        F.when(f["host"].isin(*blocklist), F.lit("blocklist"))
        .when(~f["tld"].isin(*tld_allow), F.lit("tld"))
        .when(u.contains(ad_fragment), F.lit("ads"))
        .when(f["path_depth"] > max_depth, F.lit("depth"))
        .otherwise(F.lit("ok"))
    )
    return {**f, "reason": reason}


def filter_urls(df: DataFrame, url_col: str) -> DataFrame:
    """df + (host, tld, path_depth, reason); downstream keeps
    reason == 'ok' and the funnel counts the rest by reason."""
    f = url_filter_reason(url_col)
    return df.select(
        "*",
        f["host"].alias("host"),
        f["tld"].alias("tld"),
        f["path_depth"].alias("path_depth"),
        f["reason"].alias("reason"),
    )


# ------------------------------------------------- registered query
#
# The corpus has no URLs, so the query synthesizes one per document
# deterministically (host bucket, repeated path segments, an /ads/
# fragment on every 11th doc) with plain string concatenation the
# oracle repeats verbatim — every rule fires for some slice.

_HOSTS = (
    "news.example.com",      # ok
    "spam.adfarm.biz",       # blocklisted
    "docs.example.org",      # ok
    "shop.example.shop",     # disallowed TLD
    "blog.example.net",      # ok
)


def synth_url(doc_id: Column) -> Column:
    host = F.when(doc_id % len(_HOSTS) == 0, F.lit(_HOSTS[0]))
    for i, h in enumerate(_HOSTS[1:], start=1):
        host = host.when(doc_id % len(_HOSTS) == i, F.lit(h))
    return F.concat(
        F.lit("https://"),
        host,
        F.repeat(F.lit("/p"), (doc_id % 6).cast("int")),
        F.when(doc_id % 11 == 0, F.lit("/ads/x")).otherwise(
            F.lit("/page.html")
        ),
    )


def q_url_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, url, host, tld, path_depth, reason) over synthesized
    URLs — blocklist/tld/ads/depth rules all exercised."""
    from tcrd_spark.sources.lake import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", synth_url(F.col("doc_id")).alias("url")
    )
    return filter_urls(docs, "url")


QUERIES = {"url_filter": q_url_filter}


def _oracle() -> str:
    host_case = "CASE " + " ".join(
        f"WHEN doc_id % {len(_HOSTS)} = {i} THEN '{h}'"
        for i, h in enumerate(_HOSTS)
    ) + " END"
    url = (
        f"'https://' || {host_case} || repeat('/p', (doc_id % 6)::INT)"
        " || CASE WHEN doc_id % 11 = 0 THEN '/ads/x'"
        " ELSE '/page.html' END"
    )
    bl = ", ".join(f"'{h}'" for h in BLOCKLIST)
    allow = ", ".join(f"'{t}'" for t in TLD_ALLOW)
    return f"""
        WITH u AS (SELECT doc_id, {url} AS url FROM documents),
        f AS (
          SELECT doc_id, url,
                 regexp_extract(url, '{HOST_RE}', 1) AS host,
                 len(list_filter(
                   string_split(
                     regexp_extract(url, '{PATH_RE}', 1), '/'),
                   s -> s != '')) AS path_depth
          FROM u
        ),
        g AS (
          SELECT *, regexp_extract(host, '{TLD_RE}', 1) AS tld FROM f
        )
        SELECT doc_id, url, host, tld, path_depth,
               CASE
                 WHEN host IN ({bl}) THEN 'blocklist'
                 WHEN tld NOT IN ({allow}) THEN 'tld'
                 WHEN url LIKE '%{AD_FRAGMENT}%' THEN 'ads'
                 WHEN path_depth > {MAX_DEPTH} THEN 'depth'
                 ELSE 'ok'
               END AS reason
        FROM g
    """


ORACLE = {"url_filter": _oracle()}
