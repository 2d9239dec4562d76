"""Per-task typed result tables == oracle items, declared-projection shape.

Reference: storage/sqlstorage/sqlstorage.go:43-61 lazily creates one table
per task with the rule's ItemFields as columns (+ URL/Time envelope);
sqldb/sqldb.go:68-90 is the DDL. Here the typed tables are a projection of
the map-typed results envelope, written per round when the engine runs
with typed_tables=True.
"""

from __future__ import annotations

import pytest

from crawler_spark.engine import CrawlEngine
from crawler_spark.fixtures import make_fixture, write_fixture
from crawler_spark.operators.fetch import GraphFetcher
from crawler_spark.operators.typed_results import typed_schema, typed_results_all
from crawler_spark.oracle import run_oracle


@pytest.fixture(scope="module")
def typed_crawl(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("typed")
    fx = make_fixture(n_tags=2, lists_per_tag=2, books_per_list=4, n_topics=12)
    write_fixture(fx, str(d / "fx"), spark)
    oracle = run_oracle(
        fx.seeds, fx.web_graph, fx.tasks, fx.rules, fx.robots, fx.round_s
    )
    web = spark.read.parquet(str(d / "fx" / "web_graph"))
    eng = CrawlEngine(
        spark, str(d / "state"), GraphFetcher(web), fx.tasks, fx.rules,
        fx.robots, fx.round_s, typed_tables=True,
    )
    eng.init_state(spark.read.parquet(str(d / "fx" / "seeds")))
    eng.run()
    return fx, oracle, eng


def test_typed_tables_match_oracle_items(typed_crawl):
    fx, oracle, eng = typed_crawl
    rnd = eng.store.latest_round()
    checked = 0
    for rule in fx.rules:
        if not (rule.item_fields or rule.emit_url_as):
            continue
        want = sorted(
            tuple(x["data"].get(f) for f in typed_schema(rule)[:-2])
            + (x["url"], x["round"])
            for x in oracle.results
            if x["task"] == rule.task and x["rule"] == rule.rule
        )
        table = f"typed/{rule.task}__{rule.rule}"
        df = eng.store.read_through(table, rnd)
        if df is None:
            assert not want, f"{table} missing but oracle has items"
            continue
        # declared column order: ItemFields..., url, round (sqldb DDL order)
        assert df.columns == typed_schema(rule)
        got = sorted(tuple(r) for r in df.collect())
        assert got == want, f"typed rows mismatch for {table}"
        checked += 1
    assert checked > 0  # the fixture must exercise at least one typed table


def test_lazy_create_only_for_emitting_tasks(typed_crawl, spark):
    """Rules that never emitted an item get NO table directory — the
    create-on-first-flush semantics of the reference."""
    import os

    fx, oracle, eng = typed_crawl
    emitted = {(x["task"], x["rule"]) for x in oracle.results}
    base = os.path.join(eng.store.root, "typed")
    on_disk = set(os.listdir(base)) if os.path.isdir(base) else set()
    for rule in fx.rules:
        name = f"{rule.task}__{rule.rule}"
        if (rule.task, rule.rule) in emitted:
            assert name in on_disk
        else:
            assert name not in on_disk


def test_typed_projection_operator_missing_keys(spark):
    """A declared field absent from the data map projects as NULL; map keys
    outside the declaration are dropped (fixed-DDL semantics)."""
    from crawler_spark.textcore import Rule

    rule = Rule(task="t", rule="detail", item_fields=("title", "score"))
    rows = [
        ("t", "detail", "http://x/1", 1, {"title": "A", "score": "9", "junk": "z"}),
        ("t", "detail", "http://x/2", 1, {"title": "B"}),
        ("other", "detail", "http://x/3", 1, {"title": "C", "score": "1"}),
    ]
    df = spark.createDataFrame(
        rows, "task string, rule string, url string, round int, data map<string,string>"
    )
    out = typed_results_all(df, [rule])[("t", "detail")]
    assert out.columns == ["title", "score", "url", "round"]
    got = sorted(tuple(r) for r in out.collect())
    assert got == [
        ("A", "9", "http://x/1", 1),
        ("B", None, "http://x/2", 1),
    ]
