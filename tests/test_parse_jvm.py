"""JVM codegen parse == pandas-UDF parse == textcore oracle, byte-for-byte.

Runs both parse paths over every fixture page under every applicable rule
(plus failure-masked NULL bodies) and compares the full ``_p`` struct.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler_spark.fixtures import make_fixture
from crawler_spark.operators.parse import make_parse_udf
from crawler_spark.operators.parse_jvm import rules_jvm_ok, with_jvm_parse
from crawler_spark.textcore import canonicalize


@pytest.fixture(scope="module")
def parse_inputs(spark):
    fx = make_fixture()
    rows = []
    for p in fx.web_graph:
        for r in fx.rules:
            rows.append(
                {
                    "task": r.task,
                    "rule": r.rule,
                    "curl": canonicalize(p["url"]),
                    "body": p["body"],
                    "tmp": {"book_name": "Carried Title"},
                }
            )
    # NULL bodies (failure-masked rows) and empty tmp
    rows.append({"task": "book_task", "rule": "detail", "curl": "http://x/",
                 "body": None, "tmp": None})
    rows.append({"task": "unknown", "rule": "none", "curl": "http://x/",
                 "body": "<h1>x</h1>" + "pad " * 2000, "tmp": None})
    df = spark.createDataFrame(
        rows,
        "task string, rule string, curl string, body string, "
        "tmp map<string,string>",
    ).cache()
    return fx, df


def test_rules_in_jvm_domain(parse_inputs):
    fx, _ = parse_inputs
    assert rules_jvm_ok(fx.rules)


def test_jvm_parse_matches_pandas_parse(parse_inputs):
    fx, df = parse_inputs
    udf = make_parse_udf(fx.rules)
    got_pd = df.select(
        "task", "rule", "curl",
        udf("task", "rule", "curl", "body", "tmp").alias("_p"),
    )
    got_jvm = with_jvm_parse(df, fx.rules).select("task", "rule", "curl", "_p")

    a = {(r["task"], r["rule"], r["curl"]): r["_p"] for r in got_pd.collect()}
    b = {(r["task"], r["rule"], r["curl"]): r["_p"] for r in got_jvm.collect()}
    assert a.keys() == b.keys()
    n_span_rows = 0
    for k in a:
        pa, pb = a[k], b[k]
        assert pa["l_url"] == pb["l_url"], (k, pa["l_url"], pb["l_url"])
        assert pa["l_carry"] == pb["l_carry"], (k, "carry")
        assert pa["l_idx"] == pb["l_idx"], (k, "idx")
        assert (pa["item"] or None) == (pb["item"] or None), (
            k, pa["item"], pb["item"])
        for f in ("s_kind", "s_text", "s_ref", "s_off"):
            assert pa[f] == pb[f], (k, f, pa[f], pb[f])
        if pa["s_kind"]:
            n_span_rows += 1
    assert n_span_rows > 10  # the corpus genuinely exercises spans


def test_jvm_parse_is_codegen_only(parse_inputs):
    fx, df = parse_inputs
    plan = (
        with_jvm_parse(df, fx.rules)
        .select("_p")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
