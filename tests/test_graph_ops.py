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


def test_hits_shift_normalized(spark):
    # a->x, a->y, b->x; scale 10^9 = S.
    # iter1: auth_raw x=2S y=S -> g=2 -> auth x=S y=S/2 (a,b: 0)
    #        hub_raw a=S+S/2 b=S -> g=1 -> hub a=1.5S b=S (x,y: 0)
    # iter2: auth_raw x=2.5S y=1.5S -> g=2 -> x=1.25S y=0.75S
    #        hub_raw a=2S b=1.25S -> g=2 -> a=S b=0.625S
    from crawler_spark.pipeline.graph import hits

    S = 10**9
    e = _edges(spark, [("a", "x"), ("a", "y"), ("b", "x")])
    got = {r["node"]: (r["hub"], r["auth"]) for r in hits(e, iters=2).collect()}
    assert got == {
        "a": (S, 0),
        "b": (625_000_000, 0),
        "x": (0, 1_250_000_000),
        "y": (0, 750_000_000),
    }


def test_components_hash_min_propagation(spark):
    # two chains: a-b-c and x-y (undirected: both directions passed).
    # hash-min with 1 iter labels b=a, c=b -> 'b' still; 2 iters converge.
    fwd = [("a", "b"), ("b", "c"), ("x", "y")]
    und = fwd + [(d, s) for s, d in fwd]
    from crawler_spark.pipeline.graph import components

    one = {r["node"]: r["comp"] for r in components(_edges(spark, und), iters=1).collect()}
    assert one == {"a": "a", "b": "a", "c": "b", "x": "x", "y": "x"}
    two = {r["node"]: r["comp"] for r in components(_edges(spark, und), iters=2).collect()}
    assert two == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_components_requires_iters(spark):
    import pytest

    from crawler_spark.pipeline.graph import components

    with pytest.raises(ValueError):
        components(_edges(spark, [("a", "b")]), iters=0)


def test_rank_budget_composition(spark):
    """Budget math: supplier rank 1+least(7, rank DIV quarter-scale) caps
    the per-supplier pop; hand graph where one supplier dominates."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from crawler_spark.pipeline.graph import RANK_SCALE, pagerank

    # two orders point at s1; one at s2 (bidirectional like the query)
    fwd = [("o:1", "s:1"), ("o:2", "s:1"), ("o:3", "s:2")]
    e = _edges(spark, fwd + [(d, s) for s, d in fwd])
    ranks = pagerank(e, iters=2)
    q = RANK_SCALE // 4
    budgets = {
        r["node"]: 1 + min(7, r["rank"] // q)
        for r in ranks.collect() if r["node"].startswith("s:")
    }
    # s1 gathers 2 orders' mass, s2 one: budget(s1) >= budget(s2) >= 1
    assert budgets["s:1"] >= budgets["s:2"] >= 1


def test_components_fuzz_vs_python_fold(spark):
    """Randomized small graphs: k-round hash-min in Spark must equal the
    pure-Python fold exactly (including the not-yet-converged states)."""
    import random

    rng = random.Random(42)
    from crawler_spark.pipeline.graph import components

    for trial in range(4):
        n = rng.randint(2, 12)
        nodes = [f"n{i:02d}" for i in range(n)]
        fwd = sorted({
            (rng.choice(nodes), rng.choice(nodes)) for _ in range(rng.randint(1, 20))
        })
        und = sorted(set(fwd) | {(d, s) for s, d in fwd})
        iters = rng.randint(1, 4)

        # pure-Python reference: min over self + in-neighbors per round
        present = sorted({x for e in und for x in e})
        lbl = {v: v for v in present}
        for _ in range(iters):
            inflow = {}
            for s, d in und:
                inflow[d] = min(inflow.get(d, lbl[s]), lbl[s])
            lbl = {v: min(lbl[v], inflow.get(v, lbl[v])) for v in present}

        got = {
            r["node"]: r["comp"]
            for r in components(_edges(spark, und), iters=iters).collect()
        }
        assert got == lbl, (trial, und, iters)


def test_triangles_counts_exact(spark):
    """K4 has 4 triangles (3 per node); a pendant node has 0; the count
    must be per-corner exact and independent of edge direction/dup noise."""
    from crawler_spark.pipeline.graph import triangles

    k4 = [(a, b) for i, a in enumerate("abcd") for b in "abcd"[i + 1:]]
    edges = k4 + [("d", "e"), ("e", "d"), ("a", "a")]  # dup reversed + self-loop
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["n_triangles"] for r in triangles(df).collect()}
    assert got == {"a": 3, "b": 3, "c": 3, "d": 3, "e": 0}


def test_triangles_hub_bounded_plan(spark):
    """A star graph (one hub, many leaves) has zero triangles; the
    degree-ordered orientation must emit zero wedges FROM the hub (all
    star edges orient leaf->hub), so the result is exact without a
    quadratic neighbor-pair blowup."""
    from crawler_spark.pipeline.graph import triangles

    edges = [("hub", f"leaf{i}") for i in range(50)]
    df = spark.createDataFrame(edges, "src string, dst string")
    rows = triangles(df).collect()
    assert all(r["n_triangles"] == 0 for r in rows)
    assert len(rows) == 51


def test_triangles_fuzz_vs_bruteforce(spark):
    """Random graphs vs an O(n^3) pure-Python brute force — the oriented
    wedge join must count exactly, including nodes in many triangles."""
    import itertools
    import random

    rng = random.Random(1234)
    for trial in range(3):
        n = 14
        nodes = [f"n{i:02d}" for i in range(n)]
        edges = [
            (a, b)
            for a, b in itertools.combinations(nodes, 2)
            if rng.random() < 0.35
        ]
        adj = {v: set() for v in nodes}
        for a, b in edges:
            adj[a].add(b)
            adj[b].add(a)
        want = {
            v: sum(
                1
                for a, b in itertools.combinations(sorted(adj[v]), 2)
                if b in adj[a]
            )
            for v in nodes
            if adj[v]
        }
        from crawler_spark.pipeline.graph import triangles

        df = spark.createDataFrame(edges, "src string, dst string")
        got = {r["node"]: r["n_triangles"] for r in triangles(df).collect()}
        assert got == want, f"trial {trial}"


def _uf_labels(nodes, edges):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # one more pass so every root is the component MINIMUM
    labels = {}
    for n in nodes:
        r = find(n)
        labels.setdefault(r, []).append(n)
    return {n: min(members) for r, members in labels.items() for n in members}


def test_twophase_long_chain_logarithmic(spark):
    """A 64-node path: one-hop min propagation needs 64 rounds; the
    large-star/small-star contraction must finish well inside max_rounds
    and label everything with the chain minimum."""
    from crawler_spark.pipeline.graph import components_twophase

    edges = [(f"n{i:03d}", f"n{i+1:03d}") for i in range(63)]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["comp"] for r in components_twophase(df, max_rounds=12).collect()}
    assert set(got.values()) == {"n000"}
    assert len(got) == 64


def test_twophase_fuzz_vs_union_find(spark):
    import random

    from crawler_spark.pipeline.graph import components_twophase

    rng = random.Random(77)
    for trial in range(3):
        nodes = [f"v{i:02d}" for i in range(24)]
        edges = [
            (a, b)
            for a in nodes
            for b in nodes
            if a < b and rng.random() < 0.06
        ]
        if not edges:
            continue
        df = spark.createDataFrame(edges, "src string, dst string")
        got = {r["node"]: r["comp"] for r in components_twophase(df).collect()}
        touched = {n for e in edges for n in e}
        want = _uf_labels(sorted(touched), edges)
        assert got == want, f"trial {trial}"


def test_kcore_peels_pendant_chain(spark):
    """A triangle with a pendant chain: the chain strips one shell per
    round (degree-1 endpoints), the triangle survives any number of
    2-core peels."""
    from crawler_spark.pipeline.graph import kcore_peel

    edges = [("a", "b"), ("b", "c"), ("c", "a"),  # triangle = 2-core
             ("c", "p1"), ("p1", "p2"), ("p2", "p3")]  # pendant chain
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["in_core"] for r in kcore_peel(df, core_k=2, iters=4).collect()}
    assert got == {"a": True, "b": True, "c": True,
                   "p1": False, "p2": False, "p3": False}


def test_host_graph(spark):
    from crawler_spark.pipeline.graph import host_graph

    e = spark.createDataFrame(
        [
            ("http://A.com/p1", "http://b.com/x"),
            ("http://a.com/p1", "http://B.com/y"),  # same pair after lower()
            ("http://a.com/p2", "http://b.com/z"),
            ("http://a.com/p1", "http://a.com/nav"),  # self-loop kept
        ],
        "src_url string, dst_url string",
    )
    got = {(r["src_host"], r["dst_host"]): r.asDict() for r in host_graph(e).collect()}
    ab = got[("a.com", "b.com")]
    assert ab["n_links"] == 3
    # case-variant URLs are distinct pages (host lowered, URL not)
    assert ab["n_src_pages"] == 3
    assert got[("a.com", "a.com")]["n_links"] == 1


def test_reciprocity(spark):
    from crawler_spark.pipeline.graph import reciprocity

    e = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("a", "c"), ("c", "d"), ("a", "a"), ("a", "b")],
        "src string, dst string",
    )
    got = {r["node"]: r.asDict() for r in reciprocity(e).collect()}
    # a: out {b, c} (self-loop and dup dropped); only a->b reciprocated
    assert got["a"]["out_deg"] == 2 and got["a"]["n_reciprocal"] == 1
    assert got["a"]["reciprocity_bp"] == 5000
    assert got["b"]["out_deg"] == 1 and got["b"]["n_reciprocal"] == 1
    assert got["c"]["n_reciprocal"] == 0


def test_spam_mass_flags_untrusted_farm(spark):
    """Two disjoint star graphs; seeds sit only in the first. The
    untrusted farm's hub gets spam_bp = 10000 (no trust mass reaches
    it), the trusted hub stays near 0, and trust normalization conserves
    total mass."""
    from crawler_spark.pipeline.graph import spam_mass

    edges = spark.createDataFrame(
        [("t1", "thub"), ("t2", "thub"), ("t3", "thub"),
         ("f1", "fhub"), ("f2", "fhub"), ("f3", "fhub")],
        "src string, dst string",
    )
    seeds = spark.createDataFrame([("t1",), ("t2",), ("t3",)], "node string")
    got = {r["node"]: r.asDict() for r in spam_mass(edges, seeds, iters=3).collect()}
    assert got["fhub"]["spam_bp"] == 10000          # zero trust reaches the farm
    assert got["fhub"]["tr_norm"] == 0
    assert got["thub"]["spam_bp"] < 2000            # trusted hub mostly clean
    assert got["thub"]["tr_norm"] > 0
    # leaves of the trusted star hold seed teleport mass; farm leaves none
    assert got["t1"]["tr_norm"] > got["f1"]["tr_norm"] == 0
