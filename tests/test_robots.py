"""robots.txt parser: group selection, comments, empty Disallow, folding
to the engine's ROBOTS shape, and agreement with textcore.robots_allowed."""

from __future__ import annotations

from crawler_spark.operators.robots import parse_robots, to_robots_table
from crawler_spark.textcore import robots_allowed

BODY = """# example robots
User-Agent: googlebot
Disallow: /google-only
Crawl-delay: 9

user-agent: *
Disallow: /private
Disallow:
disallow: /tmp/ # trailing comment
Crawl-Delay: 3
User-agent: otherbot
Disallow: /other
"""


def _parsed(spark):
    df = spark.createDataFrame([("h.io", BODY), ("empty.io", "\n# nothing\n")],
                               "host string, body string")
    return parse_robots(df)


def test_parse_robots_star_group_only(spark):
    rows = {(r["host"], r["rule_kind"], r["rule_value"])
            for r in _parsed(spark).collect()}
    assert rows == {
        ("h.io", "disallow", "/private"),
        ("h.io", "disallow", "/tmp/"),
        ("h.io", "crawl_delay_ms", "3000"),
    }


def test_to_robots_table_matches_engine_schema(spark):
    from crawler_spark import schemas

    tbl = to_robots_table(_parsed(spark))
    row = tbl.collect()[0]
    assert row["host"] == "h.io"
    assert row["disallow_prefixes"] == ["/private", "/tmp/"]
    assert row["crawl_delay_ms"] == 3000
    got_fields = {f.name: f.dataType.simpleString() for f in tbl.schema.fields}
    want_fields = {f.name: f.dataType.simpleString() for f in schemas.ROBOTS.fields}
    assert got_fields == want_fields
    # the parsed prefixes drive the same allow decision the oracle uses
    assert not robots_allowed("/private/x", row["disallow_prefixes"])
    assert robots_allowed("/public", row["disallow_prefixes"])


def test_parse_robots_single_window_per_host(spark):
    """The group scan is ONE window partitioned by host — never
    'No Partition Defined' (a 10^7-host robots sweep must parallelize)."""
    plan = _parsed(spark)._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    import re

    for m in re.finditer(r"Window \[[^\]]*\], (\[[^\]]*\])", plan):
        assert m.group(1) != "[]", plan


def test_robots_roundtrip_fixture_table(spark):
    """Render the crawl fixture's robots table as robots.txt bodies, parse
    them back, and require EXACT equality with the table the engine
    consumes — the full ingestion path is lossless for the engine's
    politeness semantics."""
    from crawler_spark.fixtures import make_fixture

    fx = make_fixture()
    bodies = [
        (
            r["host"],
            "\n".join(
                ["# generated", "User-agent: *"]
                + [f"Disallow: {p}" for p in r["disallow_prefixes"]]
                + [f"Crawl-delay: {r['crawl_delay_ms'] // 1000}"]
            ),
        )
        for r in fx.robots
    ]
    parsed = to_robots_table(
        parse_robots(spark.createDataFrame(bodies, "host string, body string"))
    )
    got = {
        r["host"]: (sorted(r["disallow_prefixes"]), r["crawl_delay_ms"])
        for r in parsed.collect()
    }
    want = {
        r["host"]: (sorted(r["disallow_prefixes"]), r["crawl_delay_ms"])
        for r in fx.robots
        # ms below 1000 floor to delay 0 in the text rendering; fixture
        # delays are whole seconds (assert that precondition first)
    }
    for r in fx.robots:
        assert r["crawl_delay_ms"] % 1000 == 0
    assert got == want


def test_robots_decision_rfc9309(spark):
    from crawler_spark.operators.robots import parse_robots, robots_decision

    body = "\n".join(
        [
            "User-agent: *",
            "Disallow: /private/",
            "Allow: /private/pub/",
            "Allow: /p",          # shorter than the disallow: loses
            "Disallow: /open",    # same length as allow below: allow wins
            "Allow: /open",
        ]
    )
    rules = parse_robots(
        spark.createDataFrame([("h1", body)], "host string, body string"),
        include_allow=True,
    )
    cand = spark.createDataFrame(
        [
            ("h1", "/private/x"),        # longest: disallow /private/ -> blocked
            ("h1", "/private/pub/x"),    # longest: allow -> allowed
            ("h1", "/open/x"),           # tie length 5: allow wins
            ("h1", "/elsewhere"),        # no match -> allowed
            ("h2", "/private/x"),        # host without robots -> allowed
        ],
        "host string, path string",
    )
    got = {(r["host"], r["path"]): (r["allowed"], r["match_len"])
           for r in robots_decision(cand, rules).collect()}
    assert got[("h1", "/private/x")] == (False, 9)
    assert got[("h1", "/private/pub/x")] == (True, 13)
    assert got[("h1", "/open/x")] == (True, 5)
    assert got[("h1", "/elsewhere")] == (True, 0)
    assert got[("h2", "/private/x")] == (True, 0)


def test_parse_robots_allow_opt_in_default_unchanged(spark):
    from crawler_spark.operators.robots import parse_robots

    body = "User-agent: *\nAllow: /pub\nDisallow: /x"
    df = spark.createDataFrame([("h", body)], "host string, body string")
    kinds_default = {r["rule_kind"] for r in parse_robots(df).collect()}
    assert "allow" not in kinds_default  # engine contract unchanged
    kinds_opt = {r["rule_kind"] for r in parse_robots(df, include_allow=True).collect()}
    assert "allow" in kinds_opt
