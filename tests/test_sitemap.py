"""Sitemap ingestion: loc extraction, index fan-out, and the seed-row
hand-off into the engine's canonical frontier columns."""

from __future__ import annotations

from crawler_spark.operators.sitemap import parse_sitemaps, sitemap_seeds
from crawler_spark.textcore import canonicalize, seen_key

BODY = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc> HTTP://Shop.Example.COM:80/p/1?b=2&a=1 </loc>
    <lastmod>2024-01-01</lastmod>
  </url>
  <url><loc>https://shop.example.com/p/2</loc></url>
</urlset>
<sitemapindex>
  <sitemap><loc>https://shop.example.com/sitemap-2.xml</loc></sitemap>
</sitemapindex>
"""


def _df(spark):
    return spark.createDataFrame([("shop.example.com", BODY)],
                                 "host string, body string")


def test_parse_sitemaps(spark):
    rows = {(r["kind"], r["loc"]) for r in parse_sitemaps(_df(spark)).collect()}
    assert rows == {
        ("url", "HTTP://Shop.Example.COM:80/p/1?b=2&a=1"),
        ("url", "https://shop.example.com/p/2"),
        ("sitemap", "https://shop.example.com/sitemap-2.xml"),
    }


def test_sitemap_seeds_canonical_frontier_rows(spark):
    seeds = sitemap_seeds(_df(spark), task="t1", rule="list").collect()
    got = {r["curl"]: r for r in seeds}
    want = canonicalize("HTTP://Shop.Example.COM:80/p/1?b=2&a=1")
    assert want in got and got[want]["key"] == seen_key(want)
    r = got[want]
    assert (r["task"], r["rule"], r["depth"]) == ("t1", "list", 0)
    assert set(seeds[0].asDict()) == {"curl", "key", "task", "rule", "depth"}


def test_sitemap_freshness(spark):
    from crawler_spark.operators.sitemap import sitemap_freshness

    body = (
        "<urlset>\n"
        "<url><loc>https://a.com/new</loc><lastmod>2026-03-10</lastmod></url>\n"
        "<url><loc>https://a.com/week</loc><lastmod>2026-03-04</lastmod></url>\n"
        "<url><loc>https://a.com/old</loc><lastmod>2025-03-10</lastmod></url>\n"
        "<url><loc>https://a.com/nomod</loc></url>\n"
        "</urlset>"
    )
    got = {r["url"]: r.asDict() for r in sitemap_freshness(
        spark.createDataFrame([("a.com", body)], "host string, body string")
    ).collect()}
    # newest lastmod is the reference: age 0 -> priority 5
    assert got["https://a.com/new"]["age_days"] == 0
    assert got["https://a.com/new"]["priority"] == 5
    # 6 days old -> bin length 3 -> priority 3
    assert got["https://a.com/week"]["age_days"] == 6
    assert got["https://a.com/week"]["priority"] == 3
    # a year old -> priority 0, entries without lastmod dropped
    assert got["https://a.com/old"]["priority"] == 0
    assert "https://a.com/nomod" not in got
