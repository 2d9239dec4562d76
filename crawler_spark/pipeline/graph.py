"""Link-graph analytics: the crawl-priority side of a web corpus.

A frontier scheduler wants more than FIFO — link mass tells it which hosts
deserve budget (the reference's two-class priority queue is the degenerate
form of this). Two operators over an edge list:

- ``degrees`` — in/out degree per node, one partial->final aggregation
  per direction.
- ``pagerank`` — fixed-iteration PageRank in EXACT INTEGER arithmetic
  (ranks scaled by 10^12, floor division everywhere), so the result
  hashes identically to the DuckDB oracle and is bit-stable across
  engines, partitionings, and retries. Each iteration is one join
  (edges x ranks) + one aggregation, both keyed on node ids — the
  standard distributed PageRank shape; no driver-side state beyond the
  loop counter.

Dangling nodes (no out-edges) simply drop their mass per iteration — the
usual simplification when ranks are used as relative priorities, noted
here because the absolute total is therefore not conserved.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Rank unit. Headroom contract: damp_num * (total mass) must fit in int64,
# i.e. n_nodes * RANK_SCALE * damp_num < 2^63 — at 10^9 that allows ~10^8
# nodes; for larger graphs lower the scale (relative priorities survive).
# The DuckDB oracle sums in HUGEINT, so the Spark side is the binding one.
RANK_SCALE = 10**9


def degrees(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """(node, out_deg, in_deg) — zero-filled over the full node set."""
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    outd = edges.groupBy(F.col(src).alias("node")).agg(
        F.count("*").alias("out_deg")
    )
    ind = edges.groupBy(F.col(dst).alias("node")).agg(F.count("*").alias("in_deg"))
    return (
        nodes.join(outd, "node", "left")
        .join(ind, "node", "left")
        .na.fill({"out_deg": 0, "in_deg": 0})
        .select(
            "node",
            F.col("out_deg").cast("long").alias("out_deg"),
            F.col("in_deg").cast("long").alias("in_deg"),
        )
    )


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damp_num: int = 85,
    damp_den: int = 100,
    src: str = "src",
    dst: str = "dst",
    scale: int = RANK_SCALE,
) -> DataFrame:
    """(node, rank) after ``iters`` exact-integer PageRank iterations.

    r_0(v) = scale;  r_{t+1}(v) = teleport + damp_num * S(v) DIV damp_den
    where S(v) = sum over in-neighbors u of (r_t(u) DIV out_deg(u)) and
    teleport = (damp_den - damp_num) * scale DIV damp_den. Every division
    is floor division on BIGINT, so Spark and the SQL oracle agree to the
    last unit. Duplicate (src, dst) rows count once (the edge relation is
    made distinct) — degree semantics match ``degrees`` on the deduped
    edge list.

    Scale shape: each iteration shuffles the rank relation once (join on
    src) and the contributions once (agg on dst) — both keyed exchanges
    that parallelize with the graph; the per-iteration plan is truncated
    with localCheckpoint so lineage stays constant for any ``iters``.
    """
    if damp_num * scale <= 0 or damp_num >= damp_den:
        raise ValueError("need 0 < damp_num < damp_den and positive scale")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    e = e.cache()
    # every iteration's left join re-reads nodes — checkpoint the
    # union+distinct once instead of re-running it per iteration
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    outd = e.groupBy("src").agg(F.count("*").alias("od"))
    ranks = nodes.withColumn("rank", F.lit(int(scale)).cast("long"))
    ranks = ranks.localCheckpoint()
    teleport = (damp_den - damp_num) * scale // damp_den
    for _ in range(iters):
        contrib = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(outd, "src")
            .select("dst", F.expr("rank DIV od").alias("c"))
        )
        inflow = contrib.groupBy(F.col("dst").alias("node")).agg(
            F.sum("c").alias("s")
        )
        ranks = (
            nodes.join(inflow, "node", "left")
            .select(
                "node",
                (
                    F.lit(int(teleport))
                    + F.expr(f"{damp_num} * coalesce(s, 0) DIV {damp_den}")
                ).cast("long").alias("rank"),
            )
            .localCheckpoint()
        )
    e.unpersist()
    return ranks


def hits(
    edges: DataFrame,
    iters: int = 2,
    src: str = "src",
    dst: str = "dst",
    scale: int = RANK_SCALE,
) -> DataFrame:
    """(node, hub, auth) after ``iters`` shift-normalized integer HITS steps.

    Kleinberg's HITS on a directed edge list: auth(v) = sum of hub over
    in-neighbors, hub(u) = sum of auth over out-neighbors, renormalized
    each half-step. The float L2 normalization is replaced by SHIFT
    normalization in exact integers: x' = x DIV g with g = greatest(max(x)
    DIV scale, 1) — division of every value by one positive per-side
    constant, so the RANKING is preserved exactly, values stay ~[0, scale],
    and Spark and the SQL oracle agree to the last unit (no float, no
    int64 overflow: values <= ~scale, sums <= n * scale).

    Scale shape per iteration: two keyed join+agg passes (edges x hub on
    src -> agg on dst; edges x auth on dst -> agg on src) plus one scalar
    max broadcast each — the same distributed shape as ``pagerank``, with
    localCheckpoint keeping lineage constant across iterations.
    """
    if iters < 1:
        raise ValueError("hits needs iters >= 1 (auth is defined by the first half-step)")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    e = e.cache()
    # nodes is re-read by every half-step's renormalization join — checkpoint
    # it once instead of re-running the union+distinct 2*iters times
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    hub = nodes.withColumn("hub", F.lit(int(scale)).cast("long")).localCheckpoint()

    def _shift_norm(raw: DataFrame, col: str) -> DataFrame:
        # materialize the join+agg ONCE: `raw` feeds both the g scalar and
        # the renormalization join, and without this the two branches each
        # re-execute the edge join (ReusedExchange does not cover the
        # differing post-shuffle aggregates)
        raw = raw.localCheckpoint()
        g = raw.agg(
            F.expr(f"greatest(max({col}) DIV {scale}, CAST(1 AS BIGINT))").alias("g")
        )
        return (
            nodes.join(raw, "node", "left")
            .crossJoin(F.broadcast(g))
            .select(
                "node",
                F.expr(f"coalesce({col}, CAST(0 AS BIGINT)) DIV g")
                .cast("long")
                .alias(col),
            )
        )

    auth = None
    for _ in range(iters):
        a_raw = (
            e.join(hub.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("hub").alias("auth"))
        )
        auth = _shift_norm(a_raw, "auth").localCheckpoint()
        h_raw = (
            e.join(auth.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("auth").alias("hub"))
        )
        hub = _shift_norm(h_raw, "hub").localCheckpoint()
    e.unpersist()
    return hub.join(auth, "node").select("node", "hub", "auth")


def components(
    edges: DataFrame,
    iters: int = 4,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(node, comp) after ``iters`` rounds of hash-min label propagation.

    Every node starts labeled with its own id; each round it takes the
    minimum label over itself and its in-neighbors along ``edges`` (pass
    both edge directions for undirected components — the callers here do).
    After enough rounds the label is the component-wide minimum id; with a
    fixed ``iters`` the result is the exact k-round propagation state,
    which the unrolled SQL oracle reproduces label-for-label. Labels are
    compared as plain binary strings, identical in Spark and DuckDB for
    the ASCII ids used here.

    Scale shape per iteration: one join keyed on src (edges x labels) and
    one min-aggregation keyed on dst — the same two keyed exchanges as
    ``pagerank``, no driver-side state, lineage truncated per round with
    localCheckpoint. Hash-min converges in O(diameter) rounds; the classic
    large-star/small-star variant (Kiveris et al.) halves that at the cost
    of re-writing edges — out of scope while diameters stay modest.
    """
    if iters < 1:
        raise ValueError("components needs iters >= 1")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    e = e.cache()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    lbl = nodes.withColumn("comp", F.col("node")).localCheckpoint()
    for _ in range(iters):
        inflow = (
            e.join(lbl.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("comp").alias("m"))
        )
        lbl = (
            lbl.join(inflow, "node", "left")
            .select("node", F.least(F.col("comp"), F.coalesce("m", "comp")).alias("comp"))
            .localCheckpoint()
        )
    e.unpersist()
    return lbl


def triangles(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """(node, n_triangles) — exact per-node triangle counts.

    Triangle density separates organic link neighborhoods from link farms
    and mirror rings, so it feeds the same crawl-priority decisions as
    PageRank/HITS. Input is treated as UNDIRECTED: edges are canonicalized
    to (lo, hi) and deduped; self-loops dropped.

    Scale shape (the standard degree-ordered orientation, cf. Suri &
    Vassilvitskii, "Counting Triangles and the Curse of the Last Reducer",
    WWW'11): orient every undirected edge from its lower-(degree, id)
    endpoint to the higher one. Every node's OUT-degree in the oriented
    graph is O(sqrt(m)), so the wedge self-join (out-neighbor pairs per
    node) is bounded even when a hub has 10^7 raw neighbors — the naive
    neighbor-pair join would square the hub. Wedges (v,w from u) are then
    matched against the oriented edge set with one more keyed join; each
    triangle is found exactly once, then credited to its 3 corners via one
    explode + final aggregation. All exchanges keyed (degree join on node,
    wedge join on u, closing join on (v,w)); nothing quadratic in a hub's
    degree survives the orientation.
    """
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("db"))
    # orient: u -> v iff (deg(u), u) < (deg(v), v); total order, acyclic.
    # The out-neighbor's degree rides along so wedges can be ordered by the
    # SAME key — which makes the closing edge of every triangle oriented
    # exactly tv -> tw, so the final join is a plain equi-join (an
    # either-orientation OR-join would degrade to a nested loop).
    lt = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = (
        und.join(da, "a")
        .join(db, "b")
        .select(
            F.when(
                lt,
                F.struct(
                    F.col("a").alias("u"), F.col("b").alias("v"), F.col("db").alias("dv")
                ),
            )
            .otherwise(
                F.struct(
                    F.col("b").alias("u"), F.col("a").alias("v"), F.col("da").alias("dv")
                )
            )
            .alias("e")
        )
        .select("e.u", "e.v", "e.dv")
    )
    e1 = oriented.alias("e1")
    e2 = oriented.alias("e2")
    # wedges: out-neighbor pairs of u ordered by the orientation key
    wedges = (
        e1.join(e2, "u")
        .filter(
            (F.col("e1.dv") < F.col("e2.dv"))
            | ((F.col("e1.dv") == F.col("e2.dv")) & (F.col("e1.v") < F.col("e2.v")))
        )
        .select(
            F.col("u").alias("tu"),
            F.col("e1.v").alias("tv"),
            F.col("e2.v").alias("tw"),
        )
    )
    closing = oriented.select(F.col("u").alias("tv"), F.col("v").alias("tw"))
    tri = wedges.join(closing, ["tv", "tw"], "left_semi")
    corners = tri.select(
        F.explode(F.array("tu", "tv", "tw")).alias("node")
    )
    counted = corners.groupBy("node").agg(
        F.count("*").cast("long").alias("n_triangles")
    )
    nodes = deg.select("node")
    return (
        nodes.join(counted, "node", "left")
        .select("node", F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"))
    )


def components_twophase(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 40,
) -> DataFrame:
    """(node, comp) by alternating large-star / small-star rounds —
    O(log n) rounds on ANY graph shape (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC'14).

    ``connected_components`` / ``components`` propagate min labels one hop
    per round: fine for shallow near-dup families, O(diameter) on chains —
    a crawler's redirect/pagination chains can be 10^4 hops. The two-phase
    algorithm contracts the graph itself:

    - LARGE-STAR (per node u): link every strictly-larger neighbor to the
      minimum m(u) of u's closed neighborhood;
    - SMALL-STAR (per node u): link every neighbor <= u (and u itself) to
      m(u), dropping the self-pair.

    Each phase is one groupBy(node) min-aggregate + one re-expansion join
    keyed on the node — the same exchange shape as one label-propagation
    round — but the composition halves component height per alternation,
    so convergence is logarithmic, not linear, in the worst case. The
    fixpoint is a star forest: every node's unique neighbor is its
    component minimum.

    Convergence = edge multiset unchanged (checked with an exceptAll
    probe, one extra job per round); ``max_rounds`` is the runaway bound
    (2^40-deep graphs don't fit in any cluster). Deterministic: min() is
    order-free and the fixpoint is unique.
    """

    def _star(e: DataFrame, large: bool) -> DataFrame:
        # closed-neighborhood minimum per pivot node
        both = e.select(F.col("u"), F.col("v")).unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        m = both.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        nb = both.join(m, "u")
        keep = nb.filter(F.col("v") > F.col("u")) if large else nb.filter(
            F.col("v") <= F.col("u")
        )
        out = keep.select(F.col("v").alias("u"), F.col("m").alias("v")).filter(
            F.col("u") != F.col("v")
        )
        # also keep the pivot's own link to m (small-star re-roots u)
        own = m.filter(F.col("u") != F.col("m")).select(
            "u", F.col("m").alias("v")
        )
        return out.unionByName(own).distinct()

    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    for _ in range(max_rounds):
        e2 = _star(_star(e, large=True), large=False).localCheckpoint()
        changed = (
            e2.exceptAll(e).limit(1).count() + e.exceptAll(e2).limit(1).count()
        )
        prev, e = e, e2
        if changed == 0:
            roots = e.groupBy("u").agg(F.min("v").alias("comp"))
            return (
                nodes.join(roots.withColumnRenamed("u", "node"), "node", "left")
                .select(
                    "node", F.coalesce("comp", F.col("node")).alias("comp")
                )
            )
    raise RuntimeError(f"components_twophase did not converge in {max_rounds} rounds")


def kcore_peel(
    edges: DataFrame,
    core_k: int = 2,
    iters: int = 4,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(node, in_core) after ``iters`` rounds of k-core peeling: drop
    nodes whose degree WITHIN the surviving subgraph is < core_k, repeat.

    The dense-nucleus detector for link graphs — spam farms and mirror
    rings live in high cores, genuine long-tail pages in the 1-core
    fringe, so coreness feeds the same crawl-priority decisions as
    PageRank from the opposite direction (connectivity density, not link
    mass). Fixed ``iters`` (like pagerank/components) keeps the result an
    exact, engine-portable function of the input — the full fixpoint is
    data-dependent; 4 peels separate fringe from nucleus in practice
    because each round strips an entire shell.

    Scale shape per round: restrict edges to surviving endpoints (two
    semi-joins keyed on the endpoint), recount degrees (one partial->final
    aggregation over both directions), filter — all keyed exchanges,
    nothing quadratic; localCheckpoint truncates lineage so plan size is
    constant in ``iters``.
    """
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        und.select(F.col("u").alias("node"))
        .unionByName(und.select(F.col("v").alias("node")))
        .distinct()
    )
    alive = nodes.localCheckpoint()
    for _ in range(iters):
        e_alive = und.join(
            alive.withColumnRenamed("node", "u"), "u", "left_semi"
        ).join(alive.withColumnRenamed("node", "v"), "v", "left_semi")
        deg = (
            e_alive.select(F.col("u").alias("node"))
            .unionByName(e_alive.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("d"))
        )
        alive = deg.filter(F.col("d") >= core_k).select("node").localCheckpoint()
    return nodes.join(
        alive.withColumn("_in", F.lit(True)), "node", "left"
    ).select("node", F.coalesce("_in", F.lit(False)).alias("in_core"))


def neighbor_jaccard(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_deg: int = 100,
    threshold_num: int = 1,
    threshold_den: int = 5,
) -> DataFrame:
    """(node_a, node_b, inter, un): node pairs whose OUT-neighbor sets
    overlap with Jaccard >= num/den — co-citation similarity, the
    link-structure analog of content near-dup (mirror sites and scraped
    copies link to the same targets even when their text is rewritten).

    Same bounded inverted-index discipline as ngram_jaccard_pairs, with
    the roles flipped: the "posting list" key is the shared NEIGHBOR, and
    neighbors with in-degree > ``max_deg`` are dropped from the
    intersection (a target linked by millions of pages — a jquery CDN —
    creates deg^2 join rows and carries no similarity signal; identical
    hot-key cap, identical recall trade). Set sizes keep the FULL
    out-neighbor sets; the >= test is exact integer arithmetic.
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).distinct()
    sizes = e.groupBy("u").agg(F.count("*").cast("long").alias("n"))
    hot = (
        e.groupBy("v")
        .agg(F.count("*").alias("_d"))
        .filter(F.col("_d") > max_deg)
        .select("v")
    )
    cold = e.join(hot, "v", "left_anti")
    a = cold.alias("a")
    b = cold.alias("b")
    inter = (
        a.join(b, "v")
        .filter(F.col("a.u") < F.col("b.u"))
        .groupBy(F.col("a.u").alias("node_a"), F.col("b.u").alias("node_b"))
        .agg(F.count("*").cast("long").alias("inter"))
    )
    sa = sizes.select(F.col("u").alias("node_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("u").alias("node_b"), F.col("n").alias("nb"))
    return (
        inter.join(sa, "node_a")
        .join(sb, "node_b")
        .withColumn("un", F.col("na") + F.col("nb") - F.col("inter"))
        .filter(
            F.lit(threshold_den) * F.col("inter") >= F.lit(threshold_num) * F.col("un")
        )
        .select("node_a", "node_b", "inter", "un")
    )


def ppr(
    edges: DataFrame,
    seeds: DataFrame,
    iters: int = 3,
    damp_num: int = 85,
    damp_den: int = 100,
    src: str = "src",
    dst: str = "dst",
    scale: int = RANK_SCALE,
) -> DataFrame:
    """(node, rank): exact-integer PERSONALIZED PageRank — random walks
    restart at the ``seeds`` relation instead of uniformly, so mass
    concentrates around the seed neighborhood. This is the focused-crawl
    priority signal: seed the walk at trusted/topic hosts and the ranks
    say which frontier hosts are worth budget (TrustRank-style), where
    global PageRank would happily fund an off-topic hub.

    Same exact integer recurrence as :func:`pagerank` (every division a
    floor division, bit-identical to the SQL oracle) with two changes:
    r_0 = scale on seeds / 0 elsewhere, and the teleport term pays
    (damp_den-damp_num)*scale DIV damp_den only to seeds. Nodes unreached
    from the seed set stay at exactly 0 — their rank is not padded.

    Scale shape: identical to pagerank (two keyed exchanges per
    iteration, constant plan via localCheckpoint); the seed relation
    joins broadcast (seed lists are small by definition).
    """
    if damp_num * scale <= 0 or damp_num >= damp_den:
        raise ValueError("need 0 < damp_num < damp_den and positive scale")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    e = e.cache()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    outd = e.groupBy("src").agg(F.count("*").alias("od"))
    teleport = (damp_den - damp_num) * scale // damp_den
    s = F.broadcast(seeds.select("node").distinct().withColumn("_is_seed", F.lit(1)))
    base = nodes.join(s, "node", "left").select(
        "node",
        F.when(F.col("_is_seed").isNotNull(), F.lit(int(teleport)))
        .otherwise(F.lit(0)).cast("long").alias("_t"),
        F.when(F.col("_is_seed").isNotNull(), F.lit(int(scale)))
        .otherwise(F.lit(0)).cast("long").alias("rank"),
    )
    base = base.cache()
    ranks = base.select("node", "rank").localCheckpoint()
    for _ in range(iters):
        contrib = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(outd, "src")
            .select("dst", F.expr("rank DIV od").alias("c"))
        )
        inflow = contrib.groupBy(F.col("dst").alias("node")).agg(
            F.sum("c").alias("s")
        )
        ranks = (
            base.join(inflow, "node", "left")
            .select(
                "node",
                (
                    F.col("_t")
                    + F.expr(f"{damp_num} * coalesce(s, 0) DIV {damp_den}")
                ).cast("long").alias("rank"),
            )
            .localCheckpoint()
        )
    e.unpersist()
    base.unpersist()
    return ranks


def host_graph(
    url_edges: DataFrame, src: str = "src_url", dst: str = "dst_url"
) -> DataFrame:
    """(src_host, dst_host, n_links, n_src_pages): collapse a URL-level
    link graph to the host graph — the standard preprocessing step before
    host-level PageRank/components (10^10 URL edges -> 10^7-node host
    graph), and the granularity politeness budgets actually live at.
    Self-loops (intra-host navigation, usually >90% of links) are kept as
    rows so the consumer chooses; n_src_pages makes the edge weight
    normalizable (links per linking page, the spam-resistant variant).

    Shape: host extraction is map-side regexp; then ONE partial->final
    aggregation keyed on (src_host, dst_host) — hot host pairs collapse
    map-side; the distinct page count aggregates in the same group row.
    """
    hp = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)"
    return (
        url_edges.select(
            F.lower(F.regexp_extract(F.col(src), hp, 1)).alias("src_host"),
            F.lower(F.regexp_extract(F.col(dst), hp, 1)).alias("dst_host"),
            F.col(src).alias("_sp"),
        )
        .groupBy("src_host", "dst_host")
        .agg(
            F.count("*").cast("long").alias("n_links"),
            F.count_distinct("_sp").cast("long").alias("n_src_pages"),
        )
    )


def reciprocity(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """(node, out_deg, n_reciprocal, reciprocity_bp): fraction of a node's
    out-edges that are reciprocated — the classic link-farm signal
    (organic web linking is strongly asymmetric; mutual-admiration spam
    rings reciprocate at many times the background rate).

    Shape: dedupe the edge relation, one self-join keyed on the REVERSED
    edge (equi-join on both endpoints — never a per-node fan-out), then a
    per-src aggregation. A hub with 10^6 out-edges costs its edge count,
    not its degree squared.
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).filter(
        F.col("u") != F.col("v")
    ).distinct()
    rev = e.select(F.col("v").alias("u"), F.col("u").alias("v")).withColumn(
        "_r", F.lit(1)
    )
    return (
        e.join(rev, ["u", "v"], "left")
        .groupBy(F.col("u").alias("node"))
        .agg(
            F.count("*").cast("long").alias("out_deg"),
            F.sum(F.coalesce(F.col("_r"), F.lit(0))).cast("long").alias("n_reciprocal"),
        )
        .withColumn(
            "reciprocity_bp",
            F.expr("CAST(10000 * n_reciprocal div out_deg AS BIGINT)"),
        )
    )


def spam_mass(
    edges: DataFrame,
    trusted_seeds: DataFrame,
    iters: int = 3,
    src: str = "src",
    dst: str = "dst",
    scale: int = RANK_SCALE,
) -> DataFrame:
    """(node, pr, tr_norm, spam_bp): SPAM MASS (Gyöngyi, Garcia-Molina &
    Pedersen, VLDB'06 "Link Spam Detection Based on Mass Estimation") —
    the fraction of a node's PageRank that does NOT flow from a trusted
    seed set. PageRank happily funds a link farm; trust-seeded
    personalized PageRank cannot reach it except through trusted paths,
    so ``pr - tr`` localizes exactly the artificially-acquired rank. The
    crawl use: high spam_bp hosts get budget cuts / blocklist review
    before they eat 10^6 fetches.

    tr is normalized so total trust mass equals total PageRank mass
    (``tr * sum(pr) div sum(tr)`` — the two walks conserve different
    totals), then spam_bp = 10000 * max(pr - tr_norm, 0) div pr. The
    cross-multiplication runs in DECIMAL(38,0): tr * sum(pr) reaches
    ~10^25 at web scale (rank ~10^9 x mass-total ~10^16), far past
    int64 — same overflow discipline as wave_fairness. Everything floor
    division, bit-identical to the composed SQL oracle.

    Scale shape: the two rank relations are the existing fixed-iteration
    ops (constant plans, keyed exchanges); the combine is one join keyed
    on node + a 1-row broadcast of the two mass totals.
    """
    pr = pagerank(edges, iters=iters, src=src, dst=dst, scale=scale).select(
        "node", F.col("rank").alias("pr")
    )
    tr = ppr(
        edges, trusted_seeds, iters=iters, src=src, dst=dst, scale=scale
    ).select("node", F.col("rank").alias("tr"))
    j = pr.join(tr, "node", "left").select(
        "node", "pr", F.coalesce("tr", F.lit(0)).cast("long").alias("tr")
    )
    tot = j.agg(
        F.sum("pr").cast("long").alias("sp"), F.sum("tr").cast("long").alias("st")
    )
    return (
        j.crossJoin(F.broadcast(tot))
        .select(
            "node",
            "pr",
            F.expr(
                "CAST(CASE WHEN st > 0 THEN"
                " CAST(tr AS DECIMAL(38,0)) * sp DIV st"
                " ELSE 0 END AS BIGINT)"
            ).alias("tr_norm"),
        )
        .select(
            "node",
            "pr",
            "tr_norm",
            F.expr(
                "CAST(CASE WHEN pr > 0 THEN"
                " 10000 * greatest(pr - tr_norm, 0) DIV pr"
                " ELSE 0 END AS BIGINT)"
            ).alias("spam_bp"),
        )
    )
