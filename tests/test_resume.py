"""Resume layer (SURVEY.md §5.2 layer 3): kill after round k, restart from
the last committed snapshot, final state identical to an uninterrupted run —
including when the kill left uncommitted (torn) round files behind."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from crawler_spark.engine import CrawlEngine
from crawler_spark.fixtures import make_fixture, write_fixture
from crawler_spark.operators.fetch import GraphFetcher

FX_KW = dict(n_tags=2, lists_per_tag=2, books_per_list=4, n_topics=12)


def _mk_engine(spark, fx_dir, state_dir, fx):
    web = spark.read.parquet(f"{fx_dir}/web_graph")
    return CrawlEngine(
        spark, state_dir, GraphFetcher(web), fx.tasks, fx.rules, fx.robots, fx.round_s
    )


def _final_state(eng):
    rnd = eng.store.latest_round()
    order = [
        (r["round"], r["priority"], r["seq"], r["curl"])
        for r in eng.store.read_through("order", rnd)
        .orderBy("round", F.desc("priority"), "seq")
        .collect()
    ]
    seen = {r["key"] for r in eng.store.read_through("seen", rnd).collect()}
    docs = sorted(
        (r["doc_id"], tuple((s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]))
        for r in eng.store.read_through("documents", rnd).collect()
    )
    man = eng.store.manifest(rnd)
    return order, seen, docs, man


@pytest.fixture(scope="module")
def fixture_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("resume")
    fx = make_fixture(**FX_KW)
    write_fixture(fx, str(d / "fx"), spark)
    return str(d), fx


def test_resume_after_kill_matches_uninterrupted(spark, fixture_dir):
    d, fx = fixture_dir

    # uninterrupted run
    a = _mk_engine(spark, f"{d}/fx", f"{d}/state_a", fx)
    a.init_state(spark.read.parquet(f"{d}/fx/seeds"))
    a.run()
    want = _final_state(a)
    assert len(want[0]) > 0

    # interrupted run: stop after 2 rounds, then "crash" mid-round-3 by
    # leaving torn uncommitted files (no commit.json) behind
    b1 = _mk_engine(spark, f"{d}/fx", f"{d}/state_b", fx)
    b1.init_state(spark.read.parquet(f"{d}/fx/seeds"))
    b1.run(max_rounds=2)
    killed_at = b1.store.latest_round()
    assert killed_at == 2

    torn_round = killed_at + 1
    junk = spark.createDataFrame(
        [("deadbeef", "http://junk.example.com/", torn_round)], "key string, url string, round int"
    )
    b1.store.append("seen", torn_round, junk)
    os.makedirs(b1.store._round_dir(torn_round), exist_ok=True)
    with open(os.path.join(b1.store._round_dir(torn_round), "frontier.garbage"), "w") as f:
        f.write("torn write")

    # fresh engine object over the same state dir = process restart
    b2 = _mk_engine(spark, f"{d}/fx", f"{d}/state_b", fx)
    assert b2.store.latest_round() == killed_at  # torn round not visible
    b2.run()
    got = _final_state(b2)

    assert got[0] == want[0], "crawl order diverged after resume"
    assert got[1] == want[1], "seen set diverged after resume"
    assert got[2] == want[2], "documents diverged after resume"
    assert got[3]["fetch_count"] == want[3]["fetch_count"]
    assert got[3]["carries"] == want[3]["carries"]
    assert got[3]["max_seq"] == want[3]["max_seq"]
    assert "deadbeef" not in got[1]  # torn delta was overwritten, not read


def test_run_on_finished_state_is_noop(spark, fixture_dir):
    d, fx = fixture_dir
    eng = _mk_engine(spark, f"{d}/fx", f"{d}/state_a", fx)
    rnd = eng.store.latest_round()
    assert eng.store.manifest(rnd)["done"]
    stats = eng.run()
    assert stats == []
    assert eng.store.latest_round() == rnd


def test_manifest_commit_is_atomic(spark, fixture_dir):
    d, _ = fixture_dir
    base = f"{d}/state_a/rounds"
    for rd in os.listdir(base):
        p = os.path.join(base, rd, "commit.json")
        assert os.path.exists(p)
        with open(p) as f:
            man = json.load(f)  # parseable -> no torn manifest
        assert not os.path.exists(p + ".tmp")
        assert "carries" in man and "max_seq" in man
