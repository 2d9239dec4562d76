"""The engine consumes a revisit-bandwidth capacity plan.

Round 3 shipped the recrawl analytics family (change_rate_estimate ->
refetch_schedule -> revisit_bandwidth -> drain_plan) as oracle-gated
queries, but the engine's per-round host budgets came only from robots
politeness. This file pins the round-4 wiring (VERDICT r3 next-round
item 5): ``CrawlEngine(revisit_plan=...)`` takes a (host,
fetches_per_day) plan — revisit_bandwidth's output shape — and the
effective per-host round budget becomes

    min(politeness budget, max(1, fetches_per_day * round_s div 86400))

verified end-to-end against the pure-Python reference-semantics oracle
(run_oracle(host_budget_overrides=...)) on the golden fixture: crawl
order, seen set, and metrics must match exactly, and the plan must
actually BIND (the schedule differs from the no-plan baseline).

Reference analog: limiter/limiter.go:11-45 budget table gating the wave.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler_spark.engine import CrawlEngine
from crawler_spark.fixtures import make_fixture, write_fixture
from crawler_spark.operators.fetch import GraphFetcher
from crawler_spark.oracle import run_oracle

# per-round budgets the plan encodes: books (politeness-unbounded in the
# fixture) gets a BINDING 3/round; groups (politeness 12/round from its
# 5000 ms crawl delay) gets a NON-binding 100/round — the min must pick
# the politeness side there and the plan side for books.
ROUND_PLAN = {"books.example.com": 3, "groups.example.com": 100}


@pytest.fixture(scope="module")
def crawl(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("revisit")
    fx = make_fixture()
    write_fixture(fx, str(d / "fx"), spark)
    # invert the engine's proration exactly: budget = fpd*round_s div 86400
    plan = spark.createDataFrame(
        [(h, b * 86400 // fx.round_s) for h, b in ROUND_PLAN.items()],
        "host string, fetches_per_day long",
    )
    web = spark.read.parquet(f"{d}/fx/web_graph")
    seeds = spark.read.parquet(f"{d}/fx/seeds")
    eng = CrawlEngine(
        spark, str(d / "state"), GraphFetcher(web), fx.tasks, fx.rules,
        fx.robots, fx.round_s, revisit_plan=plan,
    )
    eng.init_state(seeds)
    eng.run()
    oracle = run_oracle(
        fx.seeds, fx.web_graph, fx.tasks, fx.rules, fx.robots, fx.round_s,
        host_budget_overrides=ROUND_PLAN,
    )
    baseline = run_oracle(
        fx.seeds, fx.web_graph, fx.tasks, fx.rules, fx.robots, fx.round_s
    )
    return eng, oracle, baseline


def test_plan_binds(crawl):
    """The revisit budget must actually change the schedule (more rounds
    — the books wave is throttled to 3/round) while converging to the
    same seen set: a budget defers, never drops."""
    eng, oracle, baseline = crawl
    assert oracle.order != baseline.order
    assert len(oracle.order) == len(baseline.order)
    assert oracle.seen == baseline.seen
    assert eng._hostcap_active


def test_order_matches_oracle(crawl):
    eng, oracle, _ = crawl
    rnd = eng.store.latest_round()
    got = (
        eng.store.read_through("order", rnd)
        .orderBy("round", F.desc("priority"), "seq")
        .select("curl", "round")
        .collect()
    )
    assert [(r["curl"], r["round"]) for r in got] == [
        (u, rd) for _, u, rd in oracle.order
    ]


def test_seen_matches_oracle(crawl):
    eng, oracle, _ = crawl
    rnd = eng.store.latest_round()
    got = {
        r["key"]
        for r in eng.store.read_through("seen", rnd).select("key").collect()
    }
    assert got == oracle.seen


def test_metrics_match_oracle(crawl):
    eng, oracle, _ = crawl
    rnd = eng.store.latest_round()
    got = {
        (r["round"], r["task"]): (
            r["selected"], r["fetched_ok"], r["new_links"], r["retried"],
            r["items"],
        )
        for r in eng.store.read_through("metrics", rnd).collect()
        if r["selected"] or r["fetched_ok"] or r["new_links"] or r["retried"]
    }
    want = {
        (m["round"], m["task"]): (
            m["selected"], m["fetched_ok"], m["new_links"], m["retried"],
            m["items"],
        )
        for m in oracle.metrics
        if m["selected"] or m["fetched_ok"] or m["new_links"] or m["retried"]
    }
    assert got == want


def test_plan_derived_from_history_feeds_engine(spark, tmp_path):
    """Full recrawl loop closure: a fetch HISTORY -> revisit_bandwidth's
    capacity plan -> CrawlEngine(revisit_plan=...) -> effective budgets.
    The engine's _host_budgets must equal min(politeness,
    max(1, fetches_per_day * round_s div 86400)) computed independently
    from the same plan — no hand-made fetches_per_day anywhere."""
    import datetime as dt

    from pyspark.sql import functions as F

    from crawler_spark.pipeline.frontier import revisit_bandwidth

    fx = make_fixture()
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # url 1 (books): hourly fetches, always changed -> interval clamps to
    # the 3600 s floor -> 24 fetches/day; url 2 (groups): daily fetches,
    # never changed -> interval clamps to the 604800 s cap -> 0/day
    for i in range(25):
        rows.append((1, t0 + dt.timedelta(hours=i), i, True))
    for i in range(8):
        rows.append((2, t0 + dt.timedelta(days=i), 100 + i, False))
    hist = spark.createDataFrame(
        rows, "url_id long, ts timestamp, fetch_id long, changed boolean"
    )
    hosts = spark.createDataFrame(
        [(1, "books.example.com"), (2, "groups.example.com")],
        "url_id long, host string",
    )
    plan = revisit_bandwidth(hist, hosts)
    got_plan = {r["host"]: r["fetches_per_day"] for r in plan.collect()}
    assert got_plan == {"books.example.com": 24, "groups.example.com": 0}

    d = tmp_path / "state"
    web = spark.createDataFrame(
        [dict(url=p["url"], host=p["host"], status=p["status"],
              body=p["body"], latency_ms=p["latency_ms"])
         for p in fx.web_graph]
    )
    eng = CrawlEngine(
        spark, str(d), GraphFetcher(web), fx.tasks, fx.rules, fx.robots,
        fx.round_s, revisit_plan=plan.select("host", "fetches_per_day"),
    )
    assert eng._hostcap_active
    budgets = {r["host"]: r["_budget"] for r in eng._host_budgets.collect()}
    # books: politeness unbounded, plan 24*60 div 86400 = 0 -> floor 1
    # groups: politeness floor(60000/5000) = 12, plan floor(0) -> floor 1
    assert budgets["books.example.com"] == 1
    assert budgets["groups.example.com"] == 1


def test_gated_query_proration_matches_operator(spark):
    """ADVICE r4: q_crawl_budget_from_revisit INLINES
    revisit_budget_per_round's proration (so all derived columns come
    out of one projection over the expensive revisit_bandwidth rollup).
    Pin the inlined expression equal to the operator's output on the
    same plan, per host — if the operator's formula ever changes, this
    fails before the driver gate can silently drift from what
    CrawlEngine(revisit_plan=...) actually computes."""
    import __spark_entry__ as entry

    from crawler_spark.pipeline.frontier import revisit_budget_per_round

    sf = "/root/testdata/sf0.001"
    q = entry.q_crawl_budget_from_revisit(spark, sf)
    got = {r["host"]: r["revisit_budget"] for r in q.collect()}

    # rebuild the query's own revisit_bandwidth plan and run it through
    # the OPERATOR at the query's round_s (one macro-round = 86400 s)
    from crawler_spark.pipeline.frontier import revisit_bandwidth

    ev = spark.read.parquet(f"{sf}/events.parquet")
    hist = ev.select(
        F.col("user_id").alias("url_id"),
        F.col("ts"),
        F.col("event_id").alias("fetch_id"),
        F.col("event_type").isin("purchase", "view", "click").alias("changed"),
    )
    hosts = ev.select(F.col("user_id").alias("url_id")).distinct().select(
        "url_id",
        F.concat(F.lit("h"), (F.col("url_id") % 20).cast("string")).alias("host"),
    )
    want = {
        r["host"]: r["_budget"]
        for r in revisit_budget_per_round(
            revisit_bandwidth(hist, hosts), round_s=86400
        ).collect()
    }
    assert got == want and got, (got, want)
