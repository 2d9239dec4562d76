"""SQL canonicalizer == textcore.canonicalize over a messy-URL corpus.

The engine's hot path uses the pure-codegen exprs (operators/canon.py);
the oracle uses textcore.canonicalize (urlsplit). This pins byte parity on
the URL shapes a frontier actually carries — absolute http(s) in every
messy spelling, scheme-relative, and relative links (a rule with
url_prefix='' emits those verbatim).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler_spark.operators.canon import canonical_col, host_col
from crawler_spark.textcore import canonicalize, host_of

CORPUS = [
    # absolute, messy spellings
    "HTTP://Books.Example.COM:80/a?b=2&a=1#frag",
    "https://X.io:443/",
    "http://x.io",
    "http://x.io:8080/p",
    "https://a.b/p?z=1&y=2&",
    "http://a.b/p#only-frag",
    "http://a.b/?",
    "http://a.b?x=1",  # query directly after netloc
    "  http://pad.ded/space  ",
    "\thttp://tab.bed/x\n",  # Python .strip() strips \t\n; SQL must too
    "http://h/p?a=1&a=1&b=2",  # duplicate params survive, sorted
    "HtTpS://MiXeD.CaSe/PaThCaSe",  # path case preserved
    # scheme-relative
    "//Host.Example.com/p?b=1&a=2",
    "//h.io:80/x",  # no default-port strip without a scheme
    "//h",
    "//",
    "///x",
    "////x",
    # relative / path-only
    "path/only",
    "/abs/path?z=9&a=1#f",
    "books/list?tag=fiction",
    "",
    "#fragment-only",
    "?b=2&a=1",
]


def test_sql_canonicalize_parity(spark):
    df = spark.createDataFrame([(u,) for u in CORPUS], "url string")
    rows = df.select(
        "url",
        canonical_col("url").alias("curl"),
        host_col("url").alias("host"),
    ).collect()
    for r in rows:
        assert r["curl"] == canonicalize(r["url"]), (
            f"curl mismatch for {r['url']!r}: sql={r['curl']!r} "
            f"py={canonicalize(r['url'])!r}"
        )
        # the engine's host column keys politeness budgets off the CANONICAL
        # url (oracle: host_of(curl), oracle.py:247) — default port stripped
        assert (r["host"] or "") == host_of(canonicalize(r["url"])), (
            f"host mismatch for {r['url']!r}: sql={r['host']!r} "
            f"py={host_of(canonicalize(r['url']))!r}"
        )


def test_sql_canonicalize_stays_codegen(spark):
    """The canonical exprs must not smuggle a Python UDF into the plan."""
    df = spark.createDataFrame([("http://a.b/x",)], "url string")
    plan = (
        df.select(canonical_col("url").alias("c"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
