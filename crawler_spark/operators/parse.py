"""Rules-as-data parse stage (the reference's UDTF surface, SURVEY.md §2.8).

One Arrow-batched pandas UDF evaluates the row's rule over the body; the
extraction core is textcore.extract_* — the exact functions the oracle
runs, so span sequences match byte-for-byte (input_hint invariant).

Boundary design (the hot path at 100 TB): the UDF returns FLAT PARALLEL
PRIMITIVE ARRAYS (link urls / carries / match indexes, span kinds / texts /
refs / offsets) rather than arrays of structs with nested maps. Arrow
converts plain string/int lists vectorized; nested dict-per-element output
falls back to per-object Python conversion and was measured ~30x slower on
fat waves. The structs the engine needs are reassembled JVM-side:

- spans:  arrays_zip + transform -> array<struct<kind,text,media_ref,offset>>
- links:  explode(arrays_zip) + broadcast rules join -> next_rule/priority,
          tmp carry via map_filter + map_concat (LAST_WIN semantics without
          relying on spark.sql.mapKeyDedupPolicy)
- items:  at most one per page (all reference parsers emit 0..1), a single
          small map column.

Rules are data (task, rule, regexes, carry/next metadata) — they replace
both the Go-native ParseFuncs (parse/doubanbook/book.go,
parse/doubangroup/group.go) and the otto-JS rule scripts
(engine/schedule.go:99-133) without embedding a JS engine.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..textcore import Rule, extract_items, extract_links, extract_spans

PARSED_TYPE = (
    "struct<"
    "l_url:array<string>,l_carry:array<string>,l_idx:array<int>,"
    "item:map<string,string>,"
    "s_kind:array<string>,s_text:array<string>,s_ref:array<string>,s_off:array<int>"
    ">"
)


def make_parse_udf(rules: list[Rule]):
    rulemap = {(r.task, r.rule): r for r in rules}

    @pandas_udf(PARSED_TYPE)
    def parse_udf(
        task: pd.Series, rule: pd.Series, curl: pd.Series, body: pd.Series, tmp: pd.Series
    ) -> pd.DataFrame:
        cols = {k: [] for k in
                ("l_url", "l_carry", "l_idx", "item",
                 "s_kind", "s_text", "s_ref", "s_off")}
        for t, rn, u, b, tm in zip(task, rule, curl, body, tmp):
            r = rulemap.get((t, rn))
            if r is None or b is None:
                for k in cols:
                    cols[k].append(None if k == "item" else [])
                continue
            links = extract_links(b, r)
            cols["l_url"].append([url for url, _ in links])
            cols["l_carry"].append([carry for _, carry in links])
            cols["l_idx"].append(list(range(len(links))))
            items = extract_items(b, u, dict(tm) if tm else {}, r)
            cols["item"].append(items[0] if items else None)
            spans = extract_spans(b, r)
            cols["s_kind"].append([s[0] for s in spans])
            cols["s_text"].append([s[1] for s in spans])
            cols["s_ref"].append([s[2] for s in spans])
            cols["s_off"].append([s[3] for s in spans])
        return pd.DataFrame(cols)

    return parse_udf


def _rules_df(spark, rules: list[Rule]) -> DataFrame:
    return F.broadcast(
        spark.createDataFrame(
            [
                {
                    "task": r.task,
                    "rule": r.rule,
                    "next_rule": r.next_rule or r.rule,
                    "next_priority": r.next_priority,
                    "carry_field": r.carry_field,
                }
                for r in rules
            ],
            "task string, rule string, next_rule string, "
            "next_priority int, carry_field string",
        )
    )


def parse_fetched(fetched_ok: DataFrame, rules: list[Rule]):
    """Returns (parsed, documents, items, raw_links) DataFrames.

    raw_links still carry the parent's depth/seq and the un-canonicalized
    URL; canonicalization, robots filtering, and seq assignment happen in
    the engine round (they need frontier-global state).
    """
    parse_udf = make_parse_udf(rules)
    # body is consumed by the UDF and dropped from the cached frame — the
    # fetched frame already caches bodies once; caching them again here
    # would double the memory footprint (and GC pressure) of a fat wave
    parsed = fetched_ok.select(
        "task",
        "rule",
        "curl",
        "depth",
        "seq",
        "tmp",
        parse_udf("task", "rule", "curl", "body", "tmp").alias("_p"),
    ).cache()

    spans = F.transform(
        F.arrays_zip("_p.s_kind", "_p.s_text", "_p.s_ref", "_p.s_off"),
        lambda x: F.struct(
            x["s_kind"].alias("kind"),
            x["s_text"].alias("text"),
            x["s_ref"].alias("media_ref"),
            x["s_off"].alias("offset"),
        ),
    )
    documents = parsed.select(
        F.col("curl").alias("doc_id"), spans.alias("spans")
    )

    items = parsed.filter(F.col("_p.item").isNotNull()).select(
        "task", "rule", F.col("curl").alias("url"), F.col("_p.item").alias("data")
    )

    exploded = parsed.select(
        "task",
        "rule",
        "tmp",
        F.col("depth").alias("parent_depth"),
        F.col("seq").alias("parent_seq"),
        F.explode(F.arrays_zip("_p.l_url", "_p.l_carry", "_p.l_idx")).alias("l"),
    )
    rdf = _rules_df(fetched_ok.sparkSession, rules)
    base_tmp = F.coalesce(
        F.col("tmp"), F.create_map().cast("map<string,string>")
    )
    # carry semantics (oracle: set tmp[carry_field] = carry iff both nonempty);
    # map_filter-then-concat gives last-wins without the session dedup policy
    carried = F.when(
        F.col("carry_field").isNotNull() & (F.col("l.l_carry") != ""),
        F.map_concat(
            F.map_filter(base_tmp, lambda k, _: k != F.col("carry_field")),
            F.map_from_arrays(
                F.array(F.col("carry_field")), F.array(F.col("l.l_carry"))
            ),
        ),
    ).otherwise(base_tmp)
    raw_links = (
        exploded.join(rdf, ["task", "rule"])
        .select(
            "task",
            "parent_depth",
            "parent_seq",
            F.col("l.l_url").alias("url"),
            F.col("next_rule").alias("rule"),
            F.col("next_priority").alias("priority"),
            F.col("l.l_idx").alias("match_idx"),
            carried.alias("tmp"),
        )
    )
    return parsed, documents, items, raw_links
