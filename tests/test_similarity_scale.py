"""Scale-path tests for the similarity / dedup families beyond the oracle
defaults: multi-table LSH ANN recall dominance and production-sized minhash
parameters. The driver's CORRECTNESS gate pins the small default configs;
these pin that the *scale* configs (more tables, more hashes) still produce
correct, well-shaped results."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def embeddings(spark):
    df = spark.read.parquet(f"{SF}/embeddings.parquet").cache()
    yield df
    # unpersist at module teardown: a cached relation over these parquet
    # files would otherwise replace the parquet scan with an
    # InMemoryRelation in EVERY later plan in the shared session, and
    # the plan-pin suite (test_plans.py) asserts on scan shapes
    df.unpersist()


@pytest.fixture(scope="module")
def documents(spark):
    df = spark.read.parquet(f"{SF}/documents.parquet").cache()
    yield df
    df.unpersist()


def _topk_map(df):
    return {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["sim6"])
        for r in df.collect()
    }


def test_multitable_ann_recall_dominates_single_table(spark, embeddings):
    """T tables can only ADD candidates over table 0 alone, so multi-table
    recall vs the exact answer is >= single-table recall, per query."""
    from crawler_spark.pipeline.similarity import (
        ann_topk,
        ann_topk_multitable,
        cosine_topk,
    )

    qids = [0, 1, 2, 3, 4]
    exact = cosine_topk(embeddings, qids, k=10)
    single = ann_topk(embeddings, qids, k=10)
    multi = ann_topk_multitable(embeddings, qids, k=10, n_tables=4)

    def neighbor_sets(df):
        out: dict[int, set[int]] = {}
        for r in df.collect():
            out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return out

    ex, si, mu = neighbor_sets(exact), neighbor_sets(single), neighbor_sets(multi)
    for q in qids:
        recall_single = len(si.get(q, set()) & ex[q]) / len(ex[q])
        recall_multi = len(mu.get(q, set()) & ex[q]) / len(ex[q])
        assert recall_multi >= recall_single, (q, recall_multi, recall_single)
    # and at least one query must actually gain candidates from tables 1-3
    assert sum(len(mu.get(q, set())) for q in qids) >= sum(
        len(si.get(q, set())) for q in qids
    )


def test_multitable_table0_matches_single_table_buckets(spark, embeddings):
    """Table 0 of the multitable index uses the original plane seeds, so its
    buckets must equal lsh_buckets exactly (backward compatibility)."""
    from crawler_spark.pipeline.similarity import lsh_buckets, lsh_buckets_multitable

    single = {r["vec_id"]: r["bucket"] for r in lsh_buckets(embeddings).collect()}
    multi = {
        r["vec_id"]: r["bucket"]
        for r in lsh_buckets_multitable(embeddings, n_tables=2)
        .filter("table = 0")
        .collect()
    }
    assert single == multi


def test_minhash_production_params(spark, documents):
    """128 hashes / 16 bands (the size a real corpus needs) still runs and
    its candidate set contains every exact duplicate pair."""
    from pyspark.sql import functions as F

    from crawler_spark.pipeline.dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(documents, num_hashes=128, band_size=8)
    got = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}

    dup = (
        documents.groupBy(F.md5("text").alias("fp"))
        .agg(F.collect_list("doc_id").alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    exact_pairs = set()
    for r in dup.collect():
        ids = sorted(r["ids"])
        exact_pairs.update((a, b) for i, a in enumerate(ids) for b in ids[i + 1 :])
    # identical docs have identical signatures -> share every band bucket
    assert exact_pairs <= got
    # banded LSH must never emit a pair twice
    assert pairs.count() == len(got)


def test_ivf_partitions_corpus_and_recall_sane(spark, embeddings):
    """IVF assignment must cover every vector exactly once; probing more
    cells can only add candidates, so recall vs exact is monotone in
    nprobe, and nprobe = n_cells recovers the exact top-k (every cell
    probed => candidate set = whole corpus)."""
    from crawler_spark.pipeline.similarity import (
        DEFAULT_IVF_CENTROID_IDS,
        cosine_topk,
        ivf_assign,
        ivf_topk,
    )

    cells = ivf_assign(embeddings).collect()
    n = embeddings.count()
    assert len(cells) == n
    assert len({r["vec_id"] for r in cells}) == n
    assert all(0 <= r["cell"] < len(DEFAULT_IVF_CENTROID_IDS) for r in cells)

    qids = [0, 1, 2, 3, 4]
    exact = _topk_map(cosine_topk(embeddings, qids, k=10))
    allprobe = _topk_map(
        ivf_topk(embeddings, qids, k=10, nprobe=len(DEFAULT_IVF_CENTROID_IDS))
    )
    assert allprobe == exact

    def recall(df):
        got: dict[int, set[int]] = {}
        for r in df.collect():
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        ex: dict[int, set[int]] = {}
        for (q, _), (nb, _) in exact.items():
            ex.setdefault(q, set()).add(nb)
        return {q: len(got.get(q, set()) & ex[q]) / len(ex[q]) for q in ex}

    r1 = recall(ivf_topk(embeddings, qids, k=10, nprobe=1))
    r4 = recall(ivf_topk(embeddings, qids, k=10, nprobe=4))
    assert all(r4[q] >= r1[q] for q in r1)


def test_pq_topk_contract(spark):
    """PQ ADC output contract: exactly topk ranked rows per query, ranks
    dense from 1, approximate distance nondecreasing with rank, never a
    self-match, and fully deterministic across runs."""
    from crawler_spark.pipeline.similarity import pq_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = pq_topk(emb, [0, 1], m=4, k_codes=4, iters=1, topk=5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 1}
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5]
        assert all(r["neighbor_id"] != qid for r in rows)
        d = [r["ad2"] for r in rows]
        assert d == sorted(d)
    again = pq_topk(emb, [0, 1], m=4, k_codes=4, iters=1, topk=5).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))


def test_multiprobe_dominates_single_bucket_recall(spark):
    """Multi-probe's candidate set is a strict superset of the
    single-bucket search's (the home bucket is always probed), so per
    query its recall against the exact cosine top-k can never be lower.
    Pinned on the sf0.001 embeddings at two plane widths."""
    from pyspark.sql import functions as F

    from crawler_spark.pipeline.similarity import (
        ann_topk,
        ann_topk_multiprobe,
        cosine_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = [0, 7, 19, 31, 44]
    exact = cosine_topk(emb, queries, 10).select("query_id", "neighbor_id")

    def per_query_hits(approx):
        return {
            r["query_id"]: r["h"]
            for r in exact.join(
                approx.select("query_id", "neighbor_id", F.lit(1).alias("hit")),
                ["query_id", "neighbor_id"],
                "left",
            )
            .groupBy("query_id")
            .agg(F.sum(F.coalesce("hit", F.lit(0))).alias("h"))
            .collect()
        }

    for p in (4, 6):
        single = per_query_hits(ann_topk(emb, queries, 10, 64, p))
        multi = per_query_hits(ann_topk_multiprobe(emb, queries, 10, 64, p))
        for q in queries:
            assert multi.get(q, 0) >= single.get(q, 0), (p, q, single, multi)
        assert sum(multi.values()) > sum(single.values()), (p, single, multi)


def test_clustered_embeddings_fixture(spark):
    """The MoG study corpus is deterministic and actually clustered:
    same seed -> identical vectors; mean within-cluster cosine far above
    mean cross-cluster cosine (centers are near-orthogonal random unit
    vectors, so cross-cluster cosine ~ 0); schema matches the testdata
    embeddings table so every ANN operator runs unchanged."""
    from pyspark.sql import functions as F

    from crawler_spark.fixtures_big import clustered_embeddings

    a = clustered_embeddings(spark, n=256, dim=32, k_clusters=8)
    b = clustered_embeddings(spark, n=256, dim=32, k_clusters=8)
    ra = a.orderBy("vec_id").collect()
    rb = b.orderBy("vec_id").collect()
    assert [r["embedding"] for r in ra] == [r["embedding"] for r in rb]
    assert a.schema.simpleString() == (
        "struct<vec_id:bigint,embedding:array<float>,label:int>"
    )

    import math

    vecs = {r["vec_id"]: (r["label"], r["embedding"]) for r in ra}

    def cos(u, v):
        d = sum(x * y for x, y in zip(u, v))
        return d / (
            math.sqrt(sum(x * x for x in u)) * math.sqrt(sum(x * x for x in v))
        )

    within, cross = [], []
    ids = sorted(vecs)
    for i in ids[:64]:
        for j in ids[64:128]:
            (li, ui), (lj, uj) = vecs[i], vecs[j]
            (within if li == lj else cross).append(cos(ui, uj))
    assert within and cross
    mw = sum(within) / len(within)
    mc = sum(cross) / len(cross)
    assert mw > 0.8, mw          # compact clusters
    assert abs(mc) < 0.35, mc    # near-orthogonal centers
    assert mw - mc > 0.5, (mw, mc)


def test_kmeans_and_semdedup_recover_planted_clusters(spark):
    """Ground-truth recovery on the labeled MoG corpus: the integer-exact
    Lloyd k-means must recover the PLANTED partition exactly — seeds are
    the k lowest vec_ids, and the fixture's round-robin labels put ids
    0..k-1 one per planted cluster, so cluster i converges onto label i
    (sigma=0.05 clusters are linearly separable; no permutation matching
    needed). SemDeDup at cosine >= 0.9 must then collapse every planted
    cluster to exactly its rank-1 representative: within-cluster cosine
    is ~0.99 >> 0.9 >> cross-cluster ~0 — the semantic-redundancy case
    the operator exists for, now verified against known truth rather
    than only against the DuckDB replica."""
    from crawler_spark.fixtures_big import clustered_embeddings
    from crawler_spark.pipeline.similarity import (
        kmeans_quantized,
        semantic_dedup,
    )

    emb = clustered_embeddings(spark, n=512, dim=32, k_clusters=8)
    emb = emb.localCheckpoint()
    labels = {r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()}

    km = {r["vec_id"]: r["cluster"] for r in kmeans_quantized(emb, k=8, iters=4).collect()}
    assert len(km) == 512
    assert all(km[v] == labels[v] for v in km)

    sd = semantic_dedup(emb, k=8, iters=4, threshold_num=9, threshold_den=10).collect()
    keeps = [r for r in sd if r["keep"]]
    assert len(sd) == 512
    assert len(keeps) == 8
    # exactly one survivor per planted cluster
    assert sorted(labels[r["vec_id"]] for r in keeps) == list(range(8))
