"""Decompose the fat-round fetch+parse stage into isolated sub-probes.

Stages, each measured separately (3 runs) at a given master:
  join   — wave SHJ against the bucketed corpus, sum(length(body)) only
  parse  — join + JVM parse struct, aggregates over _p (no write)
  write  — join + parse + slim parquet write to tmpfs

Usage: python scripts/stage_probe.py 'local[16]' [join|parse|write ...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from crawler_spark.fixtures_big import bench_tasks_rules_robots
from crawler_spark.operators.fetch import GraphFetcher
from crawler_spark.operators.parse import parse_fetched
from crawler_spark.session import get_spark


def cpu_times():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:9]]
    hz = os.sysconf("SC_CLK_TCK")
    out = {
        "user": (vals[0] + vals[1]) / hz,
        "sys": (vals[2] + vals[5] + vals[6]) / hz,
        "steal": vals[7] / hz,
    }
    with open("/proc/vmstat") as f:
        for line in f:
            if line.startswith("pgfault "):
                out["pgfault"] = int(line.split()[1])
                break
    return out


def main() -> None:
    master = sys.argv[1] if len(sys.argv) > 1 else "local[16]"
    stages = sys.argv[2:] or ["join", "parse", "write"]
    corpus = os.environ.get("SPARK_GRAFT_FAT_CORPUS", "/dev/shm/fat_corpus")
    spark = get_spark("stage-probe", master=master, shuffle_partitions=128)
    spark.sql(
        "CREATE TABLE IF NOT EXISTS bench_fat_graph "
        "(gcurl STRING, status INT, body STRING, latency_ms INT) "
        "USING PARQUET CLUSTERED BY (gcurl) INTO 128 BUCKETS "
        f"LOCATION '{os.path.join(corpus, 'graph')}'"
    )
    fetcher = GraphFetcher(spark.table("bench_fat_graph"), prepped=True)
    _, rules, _ = bench_tasks_rules_robots()

    wave = (
        spark.read.parquet(os.path.join(corpus, "frontier"))
        .repartition(128, F.xxhash64("host", "key"))
    )

    def run_join():
        fetched = fetcher.fetch(wave)
        return fetched.agg(
            F.sum(F.length("body")).alias("b"), F.count("*").alias("n")
        ).collect()[0]["n"]

    def run_parse():
        fetched = fetcher.fetch(wave)
        parsed, _, _, _ = parse_fetched(fetched, rules, persist=lambda df: df)
        return parsed.agg(
            F.sum(F.size("_p.s_kind")).alias("k"),
            F.sum(F.length(F.try_element_at("_p.s_text", F.lit(1)))).alias("t"),
            F.count("*").alias("n"),
        ).collect()[0]["n"]

    def run_write():
        fetched = fetcher.fetch(wave)
        parsed, _, _, _ = parse_fetched(fetched, rules, persist=lambda df: df)
        d = f"/dev/shm/stage_probe_{os.getpid()}"
        parsed.write.mode("overwrite").parquet(d)
        n = spark.read.parquet(d).count()
        shutil.rmtree(d, ignore_errors=True)
        return n

    fns = {"join": run_join, "parse": run_parse, "write": run_write}
    n_runs = int(os.environ.get("PROBE_RUNS", "3"))
    for stage in stages:
        for run in range(n_runs):
            c0 = cpu_times()
            t0 = time.time()
            n = fns[stage]()
            wall = time.time() - t0
            c1 = cpu_times()
            print(
                f"{stage} RUN{run} {master} "
                + json.dumps(
                    {
                        "wall_s": round(wall, 2),
                        "rows": n,
                        "cpu": {k: round(c1[k] - c0[k], 1) for k in c0},
                    }
                ),
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
