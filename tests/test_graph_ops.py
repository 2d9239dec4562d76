"""Hand-computed expectations for the link-graph operators
(pipeline/graph.py); the sf0.01 DuckDB oracle covers corpus scale."""

from __future__ import annotations

from crawler_spark.pipeline.graph import degrees, pagerank


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string")


def test_degrees(spark):
    e = _edges(spark, [("a", "b"), ("a", "c"), ("b", "a")])
    got = {r["node"]: (r["out_deg"], r["in_deg"]) for r in degrees(e).collect()}
    assert got == {"a": (2, 1), "b": (1, 1), "c": (0, 1)}


def test_pagerank_hand_computed(spark):
    # a -> b, a -> c, b -> a; scale 1000, damping 85/100, teleport 150.
    # r1: a = 150 + 85*1000//100 = 1000; b = c = 150 + 85*(1000//2)//100 = 575
    # r2: a = 150 + 85*575//100 = 638;   b = c = 150 + 85*(1000//2)//100 = 575
    e = _edges(spark, [("a", "b"), ("a", "c"), ("b", "a")])
    r1 = {r["node"]: r["rank"] for r in pagerank(e, iters=1, scale=1000).collect()}
    assert r1 == {"a": 1000, "b": 575, "c": 575}
    r2 = {r["node"]: r["rank"] for r in pagerank(e, iters=2, scale=1000).collect()}
    assert r2 == {"a": 638, "b": 575, "c": 575}


def test_pagerank_dedupes_edges(spark):
    # duplicate edges must not double out-degree or inflow
    e = _edges(spark, [("a", "b"), ("a", "b"), ("b", "a")])
    one = {r["node"]: r["rank"] for r in pagerank(e, iters=1, scale=1000).collect()}
    assert one == {"a": 1000, "b": 1000}
