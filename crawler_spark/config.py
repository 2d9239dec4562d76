"""Rules/tasks as config TABLES (the dynamic-rules surface).

The reference loads task configs + parse-rule scripts at runtime from its
config store (engine/schedule.go:72-137 reads Task options; JS rule bodies
arrive as strings, parse/doubangroup-js). The Spark-first analog is
rules-as-data: the SAME Rule/TaskCfg dataclasses the engine consumes are
round-trippable through DataFrames, so a deployment keeps its crawl config
in ordinary tables (parquet/Iceberg/JDBC), edits them between rounds, and
the engine reloads — no code deploy, which is exactly what the JS layer
bought the reference. Config tables are O(#tasks) rows, so driver collect
is the right plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .textcore import LimitTier, Rule, TaskCfg

RULE_SCHEMA = T.StructType(
    [
        T.StructField("task", T.StringType(), False),
        T.StructField("rule", T.StringType(), False),
        T.StructField("link_regex", T.StringType(), True),
        T.StructField("url_prefix", T.StringType(), False),
        T.StructField("next_rule", T.StringType(), True),
        T.StructField("next_priority", T.IntegerType(), False),
        T.StructField("carry_field", T.StringType(), True),
        T.StructField("item_fields", T.ArrayType(T.StringType(), False), False),
        T.StructField(
            "item_regexes", T.MapType(T.StringType(), T.StringType(), False), False
        ),
        T.StructField("filter_regex", T.StringType(), True),
        T.StructField("emit_url_as", T.StringType(), True),
    ]
)

TASK_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType(), False),
        T.StructField("reload", T.BooleanType(), False),
        T.StructField("max_depth", T.IntegerType(), False),
        T.StructField("closed", T.BooleanType(), False),
        T.StructField("cookie", T.StringType(), False),
        T.StructField(
            "limits",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("event_count", T.IntegerType(), False),
                        T.StructField("event_dur_s", T.IntegerType(), False),
                        T.StructField("bucket", T.IntegerType(), False),
                    ]
                ),
                False,
            ),
            False,
        ),
    ]
)


def rules_to_table(spark: SparkSession, rules: list[Rule]) -> DataFrame:
    rows = [
        (
            r.task,
            r.rule,
            r.link_regex,
            r.url_prefix,
            r.next_rule,
            r.next_priority,
            r.carry_field,
            list(r.item_fields),
            dict(r.item_regexes),
            r.filter_regex,
            r.emit_url_as,
        )
        for r in rules
    ]
    return spark.createDataFrame(rows, RULE_SCHEMA)


def rules_from_table(df: DataFrame) -> list[Rule]:
    out = []
    for r in df.collect():
        out.append(
            Rule(
                task=r["task"],
                rule=r["rule"],
                link_regex=r["link_regex"],
                url_prefix=r["url_prefix"],
                next_rule=r["next_rule"],
                next_priority=r["next_priority"],
                carry_field=r["carry_field"],
                item_fields=tuple(r["item_fields"]),
                item_regexes=dict(r["item_regexes"]),
                filter_regex=r["filter_regex"],
                emit_url_as=r["emit_url_as"],
            )
        )
    # deterministic engine-input order regardless of table partitioning
    out.sort(key=lambda r: (r.task, r.rule))
    return out


def tasks_to_table(spark: SparkSession, tasks: list[TaskCfg]) -> DataFrame:
    rows = [
        (
            t.name,
            t.reload,
            t.max_depth,
            t.closed,
            t.cookie,
            [(l.event_count, l.event_dur_s, l.bucket) for l in t.limits],
        )
        for t in tasks
    ]
    return spark.createDataFrame(rows, TASK_SCHEMA)


def tasks_from_table(df: DataFrame) -> list[TaskCfg]:
    out = []
    for r in df.collect():
        out.append(
            TaskCfg(
                name=r["name"],
                reload=r["reload"],
                max_depth=r["max_depth"],
                closed=r["closed"],
                cookie=r["cookie"],
                limits=tuple(
                    LimitTier(l["event_count"], l["event_dur_s"], l["bucket"])
                    for l in r["limits"]
                ),
            )
        )
    out.sort(key=lambda t: t.name)
    return out
