"""The grouped-count accounting fallback == the Observation fast path.

The engine computes per-task round counts from Observation metrics riding
the scratch writes whenever #tasks <= engine._OBS_MAX_TASKS, else from one
8-branch grouped-count job. Both must produce identical manifests, metrics
and outputs; this pins the fallback against the pure-Python oracle (the
fast path is pinned by the golden E2E suite).
"""

from __future__ import annotations

import crawler_spark.engine as engine_mod
from crawler_spark.engine import CrawlEngine
from crawler_spark.fixtures import make_fixture, write_fixture
from crawler_spark.operators.fetch import GraphFetcher
from crawler_spark.oracle import run_oracle


def test_fallback_accounting_matches_oracle(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(engine_mod, "_OBS_MAX_TASKS", -1)  # force fallback
    fx = make_fixture(n_tags=2, lists_per_tag=2, books_per_list=4, n_topics=12)
    write_fixture(fx, str(tmp_path / "fx"), spark)
    oracle = run_oracle(
        fx.seeds, fx.web_graph, fx.tasks, fx.rules, fx.robots, fx.round_s
    )
    web = spark.read.parquet(str(tmp_path / "fx" / "web_graph"))
    eng = CrawlEngine(
        spark, str(tmp_path / "state"), GraphFetcher(web), fx.tasks, fx.rules,
        fx.robots, fx.round_s,
    )
    eng.init_state(spark.read.parquet(str(tmp_path / "fx" / "seeds")))
    eng.run()
    rnd = eng.store.latest_round()
    seen = {r["key"] for r in eng.store.read_through("seen", rnd).collect()}
    assert seen == oracle.seen
    got = sorted(
        (r["round"], r["task"], r["selected"], r["fetched_ok"], r["failed"],
         r["retried"], r["new_links"], r["items"])
        for r in eng.store.read_through("metrics", rnd).collect()
    )
    want = sorted(
        (m["round"], m["task"], m["selected"], m["fetched_ok"], m["failed"],
         m["retried"], m["new_links"], m["items"])
        for m in oracle.metrics
    )
    assert got == want
