"""Sitemap ingestion: fetched sitemap.xml bodies -> seed URLs.

The reference seeds from static config (spider/task.go Tasks +
ParseTaskConfig); at web scale the seed source is the sitemap protocol.
This operator turns fetched sitemap bodies into frontier seed rows and
sitemap-index children into further fetch targets — pure codegen
``regexp_extract_all`` over the body column, linear in the number of
sitemap files, no Python and no shuffle (the explode keys stay with
their host partition).

Supported subset (documented, mirrored by the DuckDB oracle):
``<url><loc>…</loc>`` entries (optional whitespace between tags) emit
kind='url'; ``<sitemap><loc>…</loc>`` children emit kind='sitemap'
(the index fan-out to fetch next). Entity decoding and <lastmod>
scheduling hints are out of scope here — recrawl scheduling is driven
by the engine's round metrics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_URL_LOC = r"<url>\s*<loc>\s*([^<]+?)\s*</loc>"
_SITEMAP_LOC = r"<sitemap>\s*<loc>\s*([^<]+?)\s*</loc>"


def parse_sitemaps(sitemap_bodies: DataFrame) -> DataFrame:
    """Parse (host, body) sitemap rows into exploded (host, kind, loc)."""
    urls = sitemap_bodies.select(
        "host",
        F.lit("url").alias("kind"),
        F.explode(
            F.regexp_extract_all("body", F.lit(_URL_LOC), F.lit(1))
        ).alias("loc"),
    )
    children = sitemap_bodies.select(
        "host",
        F.lit("sitemap").alias("kind"),
        F.explode(
            F.regexp_extract_all("body", F.lit(_SITEMAP_LOC), F.lit(1))
        ).alias("loc"),
    )
    return urls.unionByName(children)


def sitemap_seeds(sitemap_bodies: DataFrame, task: str, rule: str) -> DataFrame:
    """Canonicalized frontier seed rows from sitemap url entries — the
    drop-in replacement for a static seed list (engine.init_state input):
    same canonical URL + md5 key the whole engine keys on."""
    from crawler_spark.operators.canon import with_canonical

    urls = parse_sitemaps(sitemap_bodies).filter(F.col("kind") == "url")
    raw = urls.select(F.col("loc").alias("url"), F.lit("GET").alias("method"))
    return with_canonical(raw, "url").select(
        "curl",
        "key",
        F.lit(task).alias("task"),
        F.lit(rule).alias("rule"),
        F.lit(0).alias("depth"),
    )


_URL_BLOCK = r"(?s)<url>.*?</url>"
_LOC_IN = r"<loc>\s*([^<]+?)\s*</loc>"
_LASTMOD_IN = r"<lastmod>\s*([^<]+?)\s*</lastmod>"


def sitemap_freshness(sitemap_bodies: DataFrame) -> DataFrame:
    """(host, url, lastmod, age_days, priority): ``<lastmod>``-driven
    recrawl priorities from sitemap bodies — the freshness signal a
    continuous crawl feeds its priority column (sitemaps are the one
    place publishers TELL you what changed; ignoring lastmod re-fetches
    the whole site at the politeness rate).

    age_days is measured against the newest lastmod in the batch (a
    data-derived reference — no wall clock, so runs are reproducible);
    priority = max(0, 6 - length(bin(age_days))) gives a log-spaced
    ladder: age 0-1 -> 5, 2-3 -> 4, 4-7 -> 3, 8-15 -> 2, 16-31 -> 1,
    32+ -> 0.

    Shape: one (?s) block explode per <url> element, two per-block
    regexp_extracts — all codegen; the reference max(lastmod) is a 1-row
    broadcast crossJoin.
    """
    blocks = sitemap_bodies.select(
        "host",
        F.explode(F.regexp_extract_all("body", F.lit(_URL_BLOCK), F.lit(0))).alias("b"),
    ).select(
        "host",
        F.regexp_extract("b", _LOC_IN, 1).alias("url"),
        # try_to_date: blocks without <lastmod> extract '' and must drop,
        # not throw under ANSI mode
        F.expr(
            "try_to_date(regexp_extract(b, '{}', 1))".format(
                _LASTMOD_IN.replace("\\", "\\\\")  # SQL literal: keep \s as regex
            )
        ).alias("lastmod"),
    ).filter((F.col("url") != "") & F.col("lastmod").isNotNull())
    ref = blocks.agg(F.max("lastmod").alias("_ref"))
    return (
        blocks.crossJoin(F.broadcast(ref))
        .withColumn("age_days", F.datediff(F.col("_ref"), F.col("lastmod")).cast("int"))
        .withColumn(
            "priority",
            F.greatest(
                F.lit(0), F.lit(6) - F.length(F.bin(F.col("age_days").cast("long")))
            ).cast("int"),
        )
        .select(
            "host", "url",
            F.date_format("lastmod", "yyyy-MM-dd").alias("lastmod"),
            "age_days", "priority",
        )
    )
