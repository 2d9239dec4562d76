"""Connected-components cluster assignment (pipeline/dedup.py).

The reference dedups URLs with an equivalence-relation key (md5 of
URL+Method, engine/schedule.go:412-429) so it never needs closure; content
near-dup is NOT transitive pairwise, so the pipeline closes LSH pairs into
components and keeps one survivor each. These tests pin the component
semantics on adversarial shapes (chains, merges, singletons) independent
of the minhash front-end; the full neardup_clusters query is additionally
oracle-checked by the driver (recursive-CTE DuckDB oracle).
"""

from __future__ import annotations

import pytest

from crawler_spark.pipeline.dedup import connected_components, neardup_clusters


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "doc_a string, doc_b string")
    rows = connected_components(df).collect()
    return {r["node"]: r["label"] for r in rows}


def test_chain_converges_to_min(spark):
    # a path graph is the worst case for min propagation: d hops
    edges = [(f"n{i}", f"n{i+1}") for i in range(8)]
    labels = _cc(spark, edges)
    assert set(labels.values()) == {"n0"}
    assert len(labels) == 9


def test_disjoint_components_and_merge(spark):
    edges = [
        ("a2", "a1"),  # component min a1
        ("a3", "a2"),
        ("b1", "b9"),  # component min b1
        ("c5", "c9"),  # bridged to a-component below
        ("a3", "c5"),
    ]
    labels = _cc(spark, edges)
    assert labels["a1"] == labels["a2"] == labels["a3"] == "a1"
    assert labels["c5"] == labels["c9"] == "a1"
    assert labels["b1"] == labels["b9"] == "b1"


def test_max_iter_raises_instead_of_wrong_answer(spark):
    edges = [(f"n{i}", f"n{i+1}") for i in range(6)]
    df = spark.createDataFrame(edges, "doc_a string, doc_b string")
    with pytest.raises(RuntimeError):
        connected_components(df, max_iter=1)


def test_neardup_clusters_full_assignment(spark):
    # three exact-duplicate bodies (minhash signature identical -> all
    # bands collide -> pairwise edges) + one distinct doc + one doc too
    # short to shingle: every corpus row must appear exactly once.
    dup = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [
            ("d1", dup),
            ("d2", dup),
            ("d3", dup),
            ("dx", "completely different words nothing shared here at all"),
            ("dy", "too short"),
        ],
        "doc_id string, text string",
    )
    out = {r["doc_id"]: (r["cluster_id"], r["keep"]) for r in neardup_clusters(docs).collect()}
    assert len(out) == 5
    assert out["d1"] == ("d1", True)
    assert out["d2"] == ("d1", False)
    assert out["d3"] == ("d1", False)
    assert out["dx"] == ("dx", True)  # singleton: own cluster
    assert out["dy"] == ("dy", True)  # < k tokens: no shingles, singleton
