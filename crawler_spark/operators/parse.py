"""Rules-as-data parse stage (the reference's UDTF surface, SURVEY.md §2.8).

One Arrow-batched pandas UDF evaluates the row's rule over the body and
returns a struct of (links, items, spans) arrays; three cheap selects +
explodes then split the branches (ParseResult semantics,
spider/request.go:95-98). The extraction core is textcore.extract_* — the
exact functions the oracle runs, so span sequences match byte-for-byte
(input_hint invariant).

Rules are data (task, rule, regexes, carry/next metadata) captured in the
UDF closure — they replace both the Go-native ParseFuncs
(parse/doubanbook/book.go, parse/doubangroup/group.go) and the otto-JS rule
scripts (engine/schedule.go:99-133) without embedding a JS engine.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..textcore import Rule, extract_items, extract_links, extract_spans

PARSED_TYPE = (
    "struct<"
    "links:array<struct<url:string,rule:string,priority:int,match_idx:int,"
    "tmp:map<string,string>>>,"
    "items:array<map<string,string>>,"
    "spans:array<struct<kind:string,text:string,media_ref:string,offset:int>>"
    ">"
)


def make_parse_udf(rules: list[Rule]):
    rulemap = {(r.task, r.rule): r for r in rules}

    @pandas_udf(PARSED_TYPE)
    def parse_udf(
        task: pd.Series, rule: pd.Series, curl: pd.Series, body: pd.Series, tmp: pd.Series
    ) -> pd.DataFrame:
        links_col, items_col, spans_col = [], [], []
        for t, rn, u, b, tm in zip(task, rule, curl, body, tmp):
            r = rulemap.get((t, rn))
            if r is None or b is None:
                links_col.append([])
                items_col.append([])
                spans_col.append([])
                continue
            tm = dict(tm) if tm else {}
            links = []
            for idx, (url, carry) in enumerate(extract_links(b, r)):
                ntmp = dict(tm)
                if r.carry_field and carry:
                    ntmp[r.carry_field] = carry
                links.append(
                    {
                        "url": url,
                        "rule": r.next_rule or rn,
                        "priority": r.next_priority,
                        "match_idx": idx,
                        "tmp": ntmp,
                    }
                )
            links_col.append(links)
            items_col.append(extract_items(b, u, tm, r))
            spans_col.append(
                [
                    {"kind": k, "text": tx, "media_ref": mr, "offset": off}
                    for (k, tx, mr, off) in extract_spans(b, r)
                ]
            )
        return pd.DataFrame({"links": links_col, "items": items_col, "spans": spans_col})

    return parse_udf


def parse_fetched(fetched_ok: DataFrame, rules: list[Rule]):
    """Returns (parsed, documents, items, raw_links) DataFrames.

    raw_links still carry the parent's depth/seq and the un-canonicalized
    URL; canonicalization, robots filtering, and seq assignment happen in
    the engine round (they need frontier-global state).
    """
    parse_udf = make_parse_udf(rules)
    parsed = fetched_ok.withColumn(
        "_p", parse_udf("task", "rule", "curl", "body", "tmp")
    ).cache()

    documents = parsed.select(
        F.col("curl").alias("doc_id"), F.col("_p.spans").alias("spans")
    )
    items = parsed.select(
        "task",
        "rule",
        F.col("curl").alias("url"),
        F.explode("_p.items").alias("data"),
    )
    raw_links = parsed.select(
        "task",
        F.col("depth").alias("parent_depth"),
        F.col("seq").alias("parent_seq"),
        F.explode("_p.links").alias("l"),
    ).select(
        "task",
        "parent_depth",
        "parent_seq",
        F.col("l.url").alias("url"),
        F.col("l.rule").alias("rule"),
        F.col("l.priority").alias("priority"),
        F.col("l.match_idx").alias("match_idx"),
        F.col("l.tmp").alias("tmp"),
    )
    return parsed, documents, items, raw_links
