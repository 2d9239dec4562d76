"""Benchmark harness (driver-run per round; see BASELINE.md protocol).

Prints ONE JSON line:
  {"metric": "urls_fetched_deduped_per_sec", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1, "scaling": {...}}

- headline queries run at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
  on local[$SPARK_GRAFT_CPUS];
- the north-star crawl metric runs a seeded synthetic frontier through the
  full engine and reports URLs fetched+deduped/sec;
- the two-cluster-size scaling criterion (BASELINE.json: efficiency >= 0.8
  from N to 4N executors) is evidenced by running the same crawl at
  local[8] and local[32] in subprocesses (sandbox stand-in for N vs 4N),
  reported under "scaling" and appended to BENCH/BASELINE.md.

Set SPARK_GRAFT_SCALING=0 to skip the scaling subprocesses (e.g. in CI).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

BENCH_QUERIES = [
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "text_quality",
    "text_lang_id",
    "sim_cosine_topk",
    "sim_ann_lsh",
    "agg_pricing_summary",
    "events_sessionize",
    "crawl_wave_topk",
]

# bench fixture: larger synthetic frontier, high budgets -> few fat rounds
BENCH_FIXTURE = dict(
    n_tags=6,
    lists_per_tag=8,
    books_per_list=24,
    n_topics=600,
    book_limits=((4000, 60, 4000),),
    group_limits=((2000, 60, 2000),),
)


def run_crawl_bench(master: str, cpus: int) -> dict:
    """Run the crawl engine on the bench fixture; return throughput stats."""
    import shutil
    import tempfile

    from crawler_spark.engine import CrawlEngine
    from crawler_spark.fixtures import make_fixture, write_fixture
    from crawler_spark.operators.fetch import GraphFetcher
    from crawler_spark.session import get_spark

    spark = get_spark("bench-crawl", master=master, shuffle_partitions=cpus)
    d = tempfile.mkdtemp(prefix="bench_crawl_")
    try:
        fx = make_fixture(**BENCH_FIXTURE)
        write_fixture(fx, f"{d}/fx", spark)
        web = spark.read.parquet(f"{d}/fx/web_graph")
        eng = CrawlEngine(
            spark, f"{d}/state", GraphFetcher(web), fx.tasks, fx.rules, fx.robots,
            fx.round_s, bloom_min_seen=1_000_000,
        )
        eng.init_state(spark.read.parquet(f"{d}/fx/seeds"))
        t0 = time.time()
        stats = eng.run(max_rounds=50)
        wall = time.time() - t0
        fetched = sum(s.selected for s in stats)
        return {
            "master": master,
            "urls_fetched": fetched,
            "rounds": len(stats),
            "wall_s": round(wall, 2),
            "urls_per_sec": round(fetched / wall, 2),
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)
        spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--crawl-only":
        # subprocess mode for the scaling runs
        master = sys.argv[2]
        cpus = int(sys.argv[3])
        print("CRAWL_RESULT " + json.dumps(run_crawl_bench(master, cpus)))
        return

    import __spark_entry__ as entrymod
    from crawler_spark.session import get_spark

    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1])
    spark = get_spark("bench", master=f"local[{CPUS}]", shuffle_partitions=CPUS)

    qtimes: dict[str, float] = {}
    qs = entrymod.queries()
    for name in BENCH_QUERIES:
        fn = qs[name]
        t0 = time.time()
        df = fn(spark, SF_DIR)
        n = df.count()  # materialize
        qtimes[name] = round(time.time() - t0, 3)
        print(f"# {name}: {n} rows in {qtimes[name]}s", file=sys.stderr)

    # north-star crawl throughput at local[CPUS] (in-process)
    crawl = run_crawl_bench_inproc(spark)

    scaling = None
    if os.environ.get("SPARK_GRAFT_SCALING", "1") != "0":
        scaling = {}
        for master, cpus in (("local[8]", 8), ("local[32]", 32)):
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--crawl-only", master, str(cpus)],
                capture_output=True,
                text=True,
                timeout=3600,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            line = [l for l in out.stdout.splitlines() if l.startswith("CRAWL_RESULT ")]
            if line:
                scaling[master] = json.loads(line[-1][len("CRAWL_RESULT "):])
            else:
                print(f"# scaling run {master} failed: {out.stderr[-500:]}", file=sys.stderr)
        if "local[8]" in scaling and "local[32]" in scaling:
            t8 = scaling["local[8]"]["urls_per_sec"]
            t32 = scaling["local[32]"]["urls_per_sec"]
            scaling["efficiency_n_to_4n"] = round((t32 / t8) / 4.0, 3) if t8 else None
            scaling["speedup"] = round(t32 / t8, 3) if t8 else None
            _append_bench_md(scaling)

    result = {
        "metric": "urls_fetched_deduped_per_sec",
        "value": crawl["urls_per_sec"],
        "unit": "sec",
        "queries": qtimes,
        "sf": sf,
        "crawl": crawl,
        "scaling": scaling,
    }
    print(json.dumps(result))


def run_crawl_bench_inproc(spark) -> dict:
    import shutil
    import tempfile

    from crawler_spark.engine import CrawlEngine
    from crawler_spark.fixtures import make_fixture, write_fixture
    from crawler_spark.operators.fetch import GraphFetcher

    d = tempfile.mkdtemp(prefix="bench_crawl_")
    try:
        fx = make_fixture(**BENCH_FIXTURE)
        write_fixture(fx, f"{d}/fx", spark)
        web = spark.read.parquet(f"{d}/fx/web_graph")
        eng = CrawlEngine(
            spark, f"{d}/state", GraphFetcher(web), fx.tasks, fx.rules, fx.robots,
            fx.round_s, bloom_min_seen=1_000_000,
        )
        eng.init_state(spark.read.parquet(f"{d}/fx/seeds"))
        t0 = time.time()
        stats = eng.run(max_rounds=50)
        wall = time.time() - t0
        fetched = sum(s.selected for s in stats)
        return {
            "urls_fetched": fetched,
            "rounds": len(stats),
            "wall_s": round(wall, 2),
            "urls_per_sec": round(fetched / wall, 2) if wall else 0.0,
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _append_bench_md(scaling: dict) -> None:
    os.makedirs(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH"), exist_ok=True)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH", "BASELINE.md")
    t8 = scaling.get("local[8]", {})
    t32 = scaling.get("local[32]", {})
    with open(path, "a") as f:
        f.write(
            f"\n## Scaling run {time.strftime('%Y-%m-%d %H:%M:%S')}\n\n"
            f"Same seeded synthetic frontier (fixture {BENCH_FIXTURE}), same input, "
            f"two parallelism levels (sandbox stand-in for N vs 4N executors, "
            f"BASELINE.json:2,14):\n\n"
            f"| master | urls fetched | rounds | wall s | urls/s |\n|---|---|---|---|---|\n"
            f"| local[8] | {t8.get('urls_fetched')} | {t8.get('rounds')} | {t8.get('wall_s')} | {t8.get('urls_per_sec')} |\n"
            f"| local[32] | {t32.get('urls_fetched')} | {t32.get('rounds')} | {t32.get('wall_s')} | {t32.get('urls_per_sec')} |\n\n"
            f"speedup 8→32 cores: {scaling.get('speedup')}; "
            f"efficiency (speedup/4): {scaling.get('efficiency_n_to_4n')}\n"
        )


if __name__ == "__main__":
    main()
