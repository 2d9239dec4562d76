"""Isolate the fetch-join / parse-UDF / cache-write costs at one parallelism.

Usage: python scripts/profile_parse.py local[16] [n_books] [pad] [mem]

Phases (each timed twice):
  join:      fetch join + sum(length(body))  — no Python, no cache
  joincache: fetch join + cache slim+body length agg? (skipped)
  udf:       fetch join -> parse UDF -> count, NO cache
  udfcache:  full parse_fetched (UDF + slim cache) -> count
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from crawler_spark.fixtures_big import (
    bench_tasks_rules_robots,
    big_web_graph,
    fat_frontier,
)
from crawler_spark.operators.fetch import GraphFetcher
from crawler_spark.operators.parse import make_parse_udf, parse_fetched
from crawler_spark.session import get_spark


def main() -> None:
    master = sys.argv[1] if len(sys.argv) > 1 else "local[16]"
    n_books = int(sys.argv[2]) if len(sys.argv) > 2 else 400_000
    pad = int(sys.argv[3]) if len(sys.argv) > 3 else 8000

    extra = {}
    for kv in os.environ.get("PROFILE_CONF", "").split(";"):
        if "=" in kv:
            k, v = kv.split("=", 1)
            extra[k.strip()] = v.strip()
    spark = get_spark(
        "profile-parse", master=master, shuffle_partitions=32, extra_conf=extra
    )
    tasks, rules, robots = bench_tasks_rules_robots(task_budget_per_round=n_books * 2)
    web = big_web_graph(
        spark, n_tags=1, lists_per_tag=max(1, n_books // 60), books_per_list=60,
        n_topics=1, pad_to=pad,
    )
    fetcher = GraphFetcher(web)
    fetcher.graph.count()
    wave = (
        fat_frontier(spark, n_books)
        .repartition(32, F.xxhash64("host", "key"))
        .cache()
    )
    wave.count()

    times: dict[str, list[float]] = {}

    def phase(name, fn, reps=2):
        for _ in range(reps):
            t0 = time.time()
            fn()
            times.setdefault(name, []).append(round(time.time() - t0, 2))
        print(f"# {master} {name}: {times[name]}", flush=True)

    def join_only():
        f = fetcher.fetch(wave)
        f.agg(F.sum(F.length("body"))).collect()

    def udf_nocache():
        f = fetcher.fetch(wave)
        udf = make_parse_udf(rules)
        out = f.select(
            "task", udf("task", "rule", "curl", F.when(F.col("ok"), F.col("body")), "tmp").alias("_p")
        )
        out.agg(F.sum(F.size("_p.s_kind"))).collect()

    def udf_cache():
        f = fetcher.fetch(wave)
        parsed, documents, items, raw_links = parse_fetched(f, rules)
        parsed.count()
        parsed.unpersist()

    phase("join", join_only)
    phase("udf", udf_nocache)
    phase("udfcache", udf_cache)
    print("PARSEPROF " + json.dumps({"master": master, "times": times}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
