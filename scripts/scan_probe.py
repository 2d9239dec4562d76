"""Discriminating probe: does a pure-JVM scan of the prepped bucketed corpus
anti-scale with cores on this host?

Reads /dev/shm/fat_corpus/graph (bucketed parquet, 128 buckets), forces full
body materialization via sum(length(body)) twice (cold+warm), printing wall
time and the host-wide user/sys CPU-time delta around each run.

Usage: python scripts/scan_probe.py 'local[16]'
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawler_spark.session import get_spark


def cpu_times():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    # user nice system idle iowait irq softirq steal
    vals = [int(x) for x in parts[1:9]]
    hz = os.sysconf("SC_CLK_TCK")
    return {
        "user": (vals[0] + vals[1]) / hz,
        "sys": (vals[2] + vals[5] + vals[6]) / hz,
        "idle": vals[3] / hz,
        "iowait": vals[4] / hz,
        "steal": vals[7] / hz,
    }


def main() -> None:
    master = sys.argv[1] if len(sys.argv) > 1 else "local[16]"
    corpus = os.environ.get("SPARK_GRAFT_FAT_CORPUS", "/dev/shm/fat_corpus")
    spark = get_spark("scan-probe", master=master, shuffle_partitions=128)
    spark.sql(
        "CREATE TABLE IF NOT EXISTS bench_fat_graph "
        "(gcurl STRING, status INT, body STRING, latency_ms INT) "
        "USING PARQUET CLUSTERED BY (gcurl) INTO 128 BUCKETS "
        f"LOCATION '{os.path.join(corpus, 'graph')}'"
    )
    t = spark.table("bench_fat_graph")
    for run in range(3):
        c0 = cpu_times()
        t0 = time.time()
        row = t.selectExpr(
            "sum(length(body)) AS total", "count(*) AS n"
        ).collect()[0]
        wall = time.time() - t0
        c1 = cpu_times()
        print(
            f"RUN{run} {master} "
            + json.dumps(
                {
                    "wall_s": round(wall, 2),
                    "bytes": row["total"],
                    "rows": row["n"],
                    "cpu": {k: round(c1[k] - c0[k], 1) for k in c0},
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
