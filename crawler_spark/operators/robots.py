"""Vectorized robots.txt ingestion: raw fetched robots bodies -> the
engine's structured robots table (schemas.ROBOTS).

The reference crawler takes politeness limits from task options
(spider/task.go WaitTime); the north rule requires robots.txt rules
proper. This operator closes the ingestion gap: fetch ``/robots.txt``
like any page through the normal fetch stage, then parse the bodies
declaratively — whole-stage-codegen line classification plus ONE window
keyed on host (the group-scan: each directive is governed by the most
recent preceding ``User-agent`` line), so parsing 10^7 robots files is a
linear scan partitioned by host with no Python in the path.

Supported subset (documented, mirrored exactly by the DuckDB oracle):
``User-agent`` / ``Disallow`` / ``Crawl-delay`` directives matched
case-insensitively, trailing ``#`` comments stripped, only the
``User-agent: *`` group honored (this engine identifies as a generic
crawler), empty ``Disallow:`` (allow-all) ignored, integer Crawl-delay
seconds converted to ms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_UA = r"(?i)^user-agent:\s*(.*)$"
_DISALLOW = r"(?i)^disallow:\s*(.*)$"
_DELAY = r"(?i)^crawl-delay:\s*([0-9]+)$"
_ALLOW = r"(?i)^allow:\s*(.*)$"


def parse_robots(
    robots_bodies: DataFrame, include_allow: bool = False
) -> DataFrame:
    """Parse (host, body) robots.txt rows into exploded rules.

    Returns (host, rule_kind, rule_value) with rule_kind in
    ('disallow', 'crawl_delay_ms') — flat columns for the driver's value
    gate; fold with ``to_robots_table`` for the engine's ROBOTS shape.
    ``include_allow=True`` additionally emits ('allow', prefix) rows for
    RFC 9309 longest-match evaluation via :func:`robots_decision`
    (opt-in: the engine's ROBOTS table keeps its disallow-only contract,
    so the golden E2E is unaffected).
    """
    lines = robots_bodies.select(
        "host",
        F.posexplode(F.split("body", "\n")).alias("pos", "raw"),
    ).select(
        "host",
        "pos",
        F.trim(F.regexp_replace("raw", "#.*$", "")).alias("line"),
    )
    classified = lines.select(
        "host",
        "pos",
        F.regexp_extract("line", _UA, 1).alias("ua"),
        F.regexp_extract("line", _DISALLOW, 1).alias("disallow"),
        F.regexp_extract("line", _DELAY, 1).alias("delay"),
        F.regexp_extract("line", _ALLOW, 1).alias("allow"),
    )
    w = (
        Window.partitionBy("host")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    governed = classified.withColumn(
        "gov",
        F.last(F.when(F.col("ua") != "", F.col("ua")), ignorenulls=True).over(w),
    ).filter(F.col("gov") == "*")
    dis = governed.filter(F.col("disallow") != "").select(
        "host",
        F.lit("disallow").alias("rule_kind"),
        F.col("disallow").alias("rule_value"),
    )
    delay = governed.filter(F.col("delay") != "").select(
        "host",
        F.lit("crawl_delay_ms").alias("rule_kind"),
        (F.col("delay").cast("long") * 1000).cast("string").alias("rule_value"),
    )
    out = dis.unionByName(delay)
    if include_allow:
        out = out.unionByName(
            governed.filter(F.col("allow") != "").select(
                "host",
                F.lit("allow").alias("rule_kind"),
                F.col("allow").alias("rule_value"),
            )
        )
    return out


def to_robots_table(rules: DataFrame) -> DataFrame:
    """Fold exploded rules into schemas.ROBOTS rows: sorted distinct
    disallow prefixes + the minimum declared crawl delay (0 if none)."""
    return rules.groupBy("host").agg(
        F.sort_array(
            F.array_distinct(
                F.collect_list(
                    F.when(F.col("rule_kind") == "disallow", F.col("rule_value"))
                )
            )
        ).alias("disallow_prefixes"),
        F.coalesce(
            F.min(
                F.when(
                    F.col("rule_kind") == "crawl_delay_ms",
                    F.col("rule_value").cast("int"),
                )
            ),
            F.lit(0),
        ).alias("crawl_delay_ms"),
    )


def robots_decision(candidates: DataFrame, rules: DataFrame) -> DataFrame:
    """(host, path, allowed, match_len): RFC 9309 / Google-style robots
    evaluation — among all allow/disallow prefixes matching a candidate
    path, the LONGEST match governs, and on equal length ``Allow`` wins;
    no matching rule means allowed. This is the full-precedence layer
    above the engine's disallow-only fast path (the engine keeps its
    simpler contract; a production crawl evaluates this operator when
    publishers rely on Allow carve-outs like ``Allow: /public`` under
    ``Disallow: /``).

    Shape: an EQUI-join on host (rules per host are few — the joined
    fan-out is bounded by a site's robots file, not the frontier), prefix
    match as a codegen filter, then one max(struct(match_len, is_allow))
    aggregation per candidate — deterministic precedence with no window.
    """
    r = rules.filter(F.col("rule_kind").isin("allow", "disallow")).select(
        "host",
        F.col("rule_value").alias("prefix"),
        (F.col("rule_kind") == "allow").alias("is_allow"),
    )
    cand = candidates.select("host", "path").distinct()
    m = (
        cand.join(r, "host", "left")
        .withColumn(
            "_hit",
            F.col("prefix").isNotNull()
            & (F.col("prefix") != "")
            & F.col("path").startswith(F.col("prefix")),
        )
    )
    best = F.max(
        F.when(
            F.col("_hit"),
            F.struct(
                F.length("prefix").alias("_len"),
                F.col("is_allow").cast("int").alias("_al"),
            ),
        )
    )
    return (
        m.groupBy("host", "path")
        .agg(best.alias("_b"))
        .select(
            "host",
            "path",
            F.coalesce(F.col("_b._al") == 1, F.lit(True)).alias("allowed"),
            F.coalesce(F.col("_b._len"), F.lit(0)).cast("int").alias("match_len"),
        )
    )
