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
    out = {r["doc_id"]: (r["cluster_id"], r["keep"]) for r in neardup_clusters(docs, num_hashes=9, band_size=3).collect()}
    assert len(out) == 5
    assert out["d1"] == ("d1", True)
    assert out["d2"] == ("d1", False)
    assert out["d3"] == ("d1", False)
    assert out["dx"] == ("dx", True)  # singleton: own cluster
    assert out["dy"] == ("dy", True)  # < k tokens: no shingles, singleton


# ---- winnowing (MOSS fingerprints) ----


def test_winnow_instance_matches_array_spec(spark):
    """The codegen instance path must produce exactly the semantic array
    form's fingerprint sets on random small-vocab corpora."""
    import random

    from pyspark.sql import functions as F

    from crawler_spark.pipeline.dedup import (
        _winnow_instance_fps,
        winnow_signatures,
    )

    rng = random.Random(5)
    rows = [
        (i, " ".join(rng.choice("abcd") for _ in range(rng.randint(0, 20))),
         "en", "s", 0)
        for i in range(40)
    ]
    d = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    want = {
        r["doc_id"]: set(r["fps"])
        for r in winnow_signatures(d, k=3, w=4).collect()
        if r["fps"]
    }
    got = {}
    for r in _winnow_instance_fps(d, k=3, w=4).collect():
        got.setdefault(r["doc_id"], set()).add(r["fp"])
    assert got == want


def test_winnow_pairs_detects_shared_run(spark):
    """Two docs sharing a long token run must pair; an unrelated doc must
    not. Guarantee: any shared run of >= w+k-1 tokens shares >= 1
    fingerprint; with 12 shared tokens and min_shared=2 the pair shows."""
    from crawler_spark.pipeline.dedup import winnow_pairs

    shared = "q w e r t y u i o p a s"
    d = spark.createDataFrame(
        [
            (1, shared + " one tail here", "en", "s", 0),
            (2, "prefix bit " + shared, "en", "s", 0),
            (3, "completely different words entirely unrelated corpus row", "en", "s", 0),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    pairs = {(r["doc_a"], r["doc_b"]) for r in winnow_pairs(d, min_shared=2).collect()}
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)


def test_lsh_pair_quality_cells(spark):
    """The confusion matrix must expose both LSH false positives and
    recall misses, not just the happy diagonal.

    Construction: doc pairs (a1,a2) are exact duplicates -> LSH catches
    them and Jaccard=1 (hit). Pair (m1,m2) shares most shingles (true at
    threshold 1/5) but differs in every 3rd token so minhash signatures
    disagree on all 9 hashes with this seed -> recall-miss cell must be
    nonzero whenever LSH misses it; we assert cell arithmetic rather than
    which side of the s-curve the pair lands on: total truth pairs and
    total LSH pairs reconstructed from the cells must match the
    standalone generators.
    """
    from crawler_spark.pipeline.dedup import (
        lsh_pair_quality,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )

    dup = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near = "alpha beta X gamma delta Y epsilon zeta Z eta theta W iota"
    rows = [
        ("a1", dup),
        ("a2", dup),
        ("m1", dup + " lambda mu nu xi"),
        ("m2", near + " lambda mu nu"),
        ("solo", "completely different words nothing shared here at all today"),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")

    cells = {
        (r["in_lsh"], r["is_true"]): r["n_pairs"]
        for r in lsh_pair_quality(docs, num_hashes=9, band_size=3).collect()
    }
    n_lsh = minhash_lsh_pairs(docs, num_hashes=9, band_size=3).count()
    n_true = ngram_jaccard_pairs(
        docs, k=3, threshold_num=1, threshold_den=5, max_df=100
    ).count()

    assert sum(v for (l, _), v in cells.items() if l) == n_lsh
    assert sum(v for (_, t), v in cells.items() if t) == n_true
    # the exact-dup pair is both an LSH candidate and a truth pair
    assert cells.get((True, True), 0) >= 1
    # no (False, False) cell can exist: every emitted row came from a pair
    assert (False, False) not in cells


def test_incremental_dedup_verdicts(spark):
    """Exact beats near; fresh docs pass; matched is the minimal corpus
    doc; corpus-internal dups never appear in the output."""
    from crawler_spark.pipeline.dedup import incremental_dedup

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    corpus = spark.createDataFrame(
        [(1, base), (5, base), (7, "totally different corpus page content here")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (10, base),                                  # exact dup of 1 and 5
            (20, base + " extra trailing tokens here"),  # near dup (shares bands)
            (30, "entirely novel page nobody indexed before today okay"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["verdict"], r["matched"])
        for r in incremental_dedup(new, corpus, num_hashes=9, band_size=3).collect()
    }
    assert got[10] == ("exact_dup", 1)
    assert got[30] == ("fresh", None)
    assert set(got) == {10, 20, 30}
    # 20 is near iff it shares a band; with 9/3 toy params the shared
    # 8-shingle prefix usually wins at least one band — but never exact
    assert got[20][0] in ("near_dup", "fresh")


def test_survivorship_picks_quality_not_min_id(spark):
    """Three exact near-dups where the HIGHEST doc_id has the best
    stopword ratio: min-id clustering still labels the family by its
    minimum, but keep goes to the quality winner."""
    from crawler_spark.pipeline.dedup import survivorship

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [(1, base), (2, base), (9, base), (50, "completely unrelated single doc here")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["cluster_id"], r["keep"]) for r in survivorship(docs, num_hashes=9, band_size=3).collect()}
    # identical text -> identical quality -> tie broken by MIN doc_id
    assert got[1] == (1, True)
    assert got[2] == (1, False)
    assert got[9] == (1, False)
    assert got[50] == (50, True)


def test_survivorship_quality_wins(spark):
    """A family where the larger doc_id genuinely has more stopwords per
    token: it must be the survivor."""
    from crawler_spark.pipeline.dedup import survivorship

    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    better = shared + " the of and to is"  # adds stopwords -> higher stop_bp
    docs = spark.createDataFrame(
        [(1, shared), (8, better)], "doc_id long, text string"
    )
    got = {r["doc_id"]: (r["cluster_id"], r["keep"]) for r in survivorship(docs, num_hashes=9, band_size=3).collect()}
    if got[1][0] == got[8][0]:  # same family (bands collided)
        assert got[8][1] is True and got[1][1] is False
    else:  # LSH missed the pair at toy params — both survive their own family
        assert got[1][1] and got[8][1]


def test_simhash_pairs_pigeonhole_guarantee(spark):
    """Identical docs have distance 0 (found); a doc differing in a couple
    of tokens lands within distance 3 of its original (found via at least
    one agreeing band); unrelated docs don't pair."""
    from crawler_spark.pipeline.dedup import simhash, simhash_hamming_pairs

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon") * 3
    tweaked = base.replace("delta", "JOLT", 1)
    docs = spark.createDataFrame(
        [(1, base), (2, base), (3, tweaked),
         (9, "utterly different material nothing shared with those pages")],
        "doc_id long, text string",
    )
    pairs = {(r["doc_a"], r["doc_b"]): r["dist"]
             for r in simhash_hamming_pairs(docs).collect()}
    assert pairs[(1, 2)] == 0
    assert all(9 not in p for p in pairs)
    # the tweaked doc pairs iff its fingerprint is within 3 bits — verify
    # the reported distance against the raw fingerprints either way
    fp = {r["doc_id"]: (r["simhash_hi"], r["simhash_lo"])
          for r in simhash(docs, bits=64).collect()}
    true_d = bin(fp[1][0] ^ fp[3][0]).count("1") + bin(fp[1][1] ^ fp[3][1]).count("1")
    if true_d <= 3:
        assert pairs[(1, 3)] == true_d
    else:
        assert (1, 3) not in pairs
