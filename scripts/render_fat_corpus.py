"""Pre-render the fat-wave bench corpus ONCE to tmpfs (bucketed parquet).

Usage: python scripts/render_fat_corpus.py [/dev/shm/fat_corpus] [n_books] [pad]

Mirrors bench.run_scaling's render step so profile/stage probes read the
identical bytes the scaling bench measures.
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawler_spark.fixtures_big import big_web_graph, fat_frontier
from crawler_spark.session import get_spark


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/dev/shm/fat_corpus"
    n_books = int(sys.argv[2]) if len(sys.argv) > 2 else 400_000
    pad = int(sys.argv[3]) if len(sys.argv) > 3 else 8000
    fat_parts = int(os.environ.get("SPARK_GRAFT_FAT_PARTS", "128"))
    shutil.rmtree(out, ignore_errors=True)
    spark = get_spark("render-fat", master="local[32]", shuffle_partitions=fat_parts)
    (
        big_web_graph(
            spark, n_tags=1, lists_per_tag=max(1, -(-n_books // 60)),
            books_per_list=60, n_topics=1, pad_to=pad,
        )
        .selectExpr("url AS gcurl", "status", "body", "latency_ms")
        .repartition(fat_parts, "gcurl")
        .write.bucketBy(fat_parts, "gcurl")
        .mode("overwrite")
        .option("path", os.path.join(out, "graph"))
        .saveAsTable("bench_fat_graph_src")
    )
    fat_frontier(spark, n_books).write.mode("overwrite").parquet(
        os.path.join(out, "frontier")
    )
    import subprocess

    print(subprocess.run(["du", "-sh", out], capture_output=True, text=True).stdout)
    spark.stop()


if __name__ == "__main__":
    main()
