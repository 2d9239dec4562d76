"""Rules/tasks-as-config-tables loader (crawler_spark/config.py): the
dynamic-rules surface replacing the reference's runtime JS rule loading
(engine/schedule.go:72-137). The config must survive a parquet round-trip
and drive the engine to byte-identical output."""

from __future__ import annotations

from crawler_spark.config import (
    rules_from_table,
    rules_to_table,
    tasks_from_table,
    tasks_to_table,
)
from crawler_spark.engine import CrawlEngine
from crawler_spark.fixtures import make_fixture, write_fixture
from crawler_spark.operators.fetch import GraphFetcher


def test_config_roundtrip_identity(spark):
    fx = make_fixture(n_tags=2, lists_per_tag=2, books_per_list=3, n_topics=8)
    rules2 = rules_from_table(rules_to_table(spark, fx.rules))
    tasks2 = tasks_from_table(tasks_to_table(spark, fx.tasks))
    assert sorted(fx.rules, key=lambda r: (r.task, r.rule)) == rules2
    assert sorted(fx.tasks, key=lambda t: t.name) == tasks2


def test_engine_runs_from_reloaded_config(spark, tmpdir_):
    """Write config to parquet, reload it, run the crawl from the reloaded
    config — outputs must equal the dataclass-config run exactly."""
    fx = make_fixture(n_tags=2, lists_per_tag=2, books_per_list=3, n_topics=8)
    write_fixture(fx, f"{tmpdir_}/fx", spark)
    web = spark.read.parquet(f"{tmpdir_}/fx/web_graph")
    seeds = spark.read.parquet(f"{tmpdir_}/fx/seeds")

    rules_to_table(spark, fx.rules).write.parquet(f"{tmpdir_}/cfg/rules")
    tasks_to_table(spark, fx.tasks).write.parquet(f"{tmpdir_}/cfg/tasks")
    rules2 = rules_from_table(spark.read.parquet(f"{tmpdir_}/cfg/rules"))
    tasks2 = tasks_from_table(spark.read.parquet(f"{tmpdir_}/cfg/tasks"))

    def run(tasks, rules, sub):
        eng = CrawlEngine(
            spark, f"{tmpdir_}/{sub}", GraphFetcher(web), tasks, rules,
            fx.robots, fx.round_s,
        )
        eng.init_state(seeds)
        eng.run(max_rounds=3)
        rnd = eng.store.latest_round()
        order = {
            tuple(r) for r in eng.store.read_through("order", rnd).collect()
        }
        seen = {r["key"] for r in eng.store.read_through("seen", rnd).collect()}
        return order, seen

    assert run(fx.tasks, fx.rules, "a") == run(tasks2, rules2, "b")
