"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: exact baseline. All JVM-side: zip_with +
  aggregate in DOUBLE precision with left-to-right summation, which is the
  same evaluation order DuckDB's list_dot_product uses — so similarity
  values are bit-identical and safe to hash-compare after rounding.
- LSH-bucketed ANN (sign-random-projection): the scale path. Hyperplanes
  are derived deterministically from md5 (no RNG), buckets join instead of
  all-pairs; recall is approximate but the *plumbing* (bucketing, bucket
  join, per-bucket rerank) is the real 100TB design.

At cluster scale the brute-force variant broadcast-joins the (small) query
set against the corpus — one scan, no shuffle; the LSH variant shuffles
once on bucket id.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_topk(
    embeddings: DataFrame, query_ids: list[int], k: int = 10
) -> DataFrame:
    """Exact top-k neighbors by cosine for each query vector.

    Output: (query_id, neighbor_id, rank, sim6) where sim6 = cosine rounded
    to 6 dp; ties broken by neighbor_id so ranks are deterministic.
    """
    from pyspark.sql import Window

    q = embeddings.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    pairs = embeddings.crossJoin(F.broadcast(q)).filter(
        F.col("vec_id") != F.col("query_id")
    )
    sim = _dot(F.col("embedding"), F.col("qv")) / (
        _norm(F.col("embedding")) * _norm(F.col("qv"))
    )
    scored = pairs.select(
        "query_id", F.col("vec_id").alias("neighbor_id"), sim.alias("sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 6).alias("sim6"))
    )


def _hyperplanes(dim: int, n_planes: int, table: int = 0) -> list[list[float]]:
    """Deterministic pseudo-random unit-free hyperplanes from md5 bytes.

    ``table`` selects an independent plane family (table 0 keeps the
    original ``plane:{p}:{d}`` seeds so single-table results are stable;
    tables >= 1 salt the seed with the table id).
    """
    planes = []
    for p in range(n_planes):
        vals = []
        for d in range(0, dim, 16):
            seed = f"plane:{p}:{d}" if table == 0 else f"plane:t{table}:{p}:{d}"
            h = hashlib.md5(seed.encode()).digest()
            vals.extend(b - 127.5 for b in h)
        planes.append(vals[:dim])
    return planes


def _bucket_col(planes: list[list[float]]):
    bucket = None
    for i, pl in enumerate(planes):
        arr = F.array(*[F.lit(v) for v in pl])
        bit = F.when(_dot(F.col("embedding"), arr) > 0, F.lit(1 << i)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return bucket.cast("int")


def _bucket_udf(plane_tables: list[list[list[float]]]):
    """Arrow-vectorized bucket ids for T plane tables in one pass.

    The expression form (``_bucket_col``) folds each dot product through
    zip_with/aggregate HigherOrderFunctions, which Spark evaluates
    INTERPRETED (not codegen) at ~µs/element — T*P dots of D elements per
    row made the multi-table index the slowest query in the bench sweep.
    This UDF does the same math Arrow-batched: one numpy accumulator per
    table, accumulated dimension-by-dimension (``acc += emb[:, d] *
    plane[:, d]``) so every row's sum is the identical left-to-right IEEE
    double fold as the SQL ``aggregate`` and the DuckDB oracle's dot —
    bucket ids stay bit-identical to the expression path (pinned by a
    parity test) while the per-row cost drops ~100x.
    """
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, IntegerType

    tables = [np.asarray(t, dtype=np.float64) for t in plane_tables]  # (P, D)

    @pandas_udf(ArrayType(IntegerType()))
    def buckets(emb: pd.Series) -> pd.Series:
        n = len(emb)
        if n == 0:
            return pd.Series([], dtype=object)
        m = np.stack([np.asarray(e, dtype=np.float64) for e in emb.to_list()])
        per_table = []
        for planes in tables:
            acc = np.zeros((n, planes.shape[0]))
            for d in range(planes.shape[1]):
                # left-to-right fold over dimensions == SQL aggregate order
                acc += m[:, d : d + 1] * planes[:, d]
            bits = (acc > 0).astype(np.int64)
            per_table.append(bits @ (1 << np.arange(planes.shape[0], dtype=np.int64)))
        res = np.stack(per_table, axis=1).astype(np.int32)  # (n, T)
        return pd.Series(list(res))

    return buckets


def lsh_buckets(
    embeddings: DataFrame, dim: int = 64, n_planes: int = 8, vectorized: bool = True
) -> DataFrame:
    """Sign-random-projection bucket id per vector (the ANN scale path).

    ``vectorized=False`` keeps the pure-expression form as the parity
    cross-check; results are bit-identical (tests/test_pipeline_ops.py).
    """
    if vectorized:
        udf = _bucket_udf([_hyperplanes(dim, n_planes)])
        return embeddings.select(
            "vec_id", udf("embedding").getItem(0).alias("bucket")
        )
    return embeddings.select(
        "vec_id", _bucket_col(_hyperplanes(dim, n_planes)).alias("bucket")
    )


def lsh_buckets_multitable(
    embeddings: DataFrame,
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 4,
    vectorized: bool = True,
) -> DataFrame:
    """(vec_id, table, bucket) — one row per independent LSH table.

    A single table of p planes makes 2^p buckets; at corpus scale each
    bucket holds ~N/2^p vectors AND a near neighbor falls in the query's
    bucket only with probability (1 - theta/pi)^p, so recall collapses as
    p grows. The standard fix is T independent tables: a candidate matches
    if it shares the query's bucket in ANY table — recall
    1 - (1 - r^p)^T — while each per-table bucket stays small. Cost is one
    shuffle on (table, bucket), T· the index size, never all-pairs.

    All T bucket ids come out of ONE Arrow-batched pass over the corpus
    (see ``_bucket_udf``); ``vectorized=False`` is the expression-form
    cross-check.
    """
    if vectorized:
        udf = _bucket_udf(
            [_hyperplanes(dim, n_planes, table=t) for t in range(n_tables)]
        )
        return embeddings.select(
            "vec_id", F.posexplode(udf("embedding")).alias("table", "bucket")
        )
    per_table = F.array(
        *[
            F.struct(
                F.lit(t).alias("table"),
                _bucket_col(_hyperplanes(dim, n_planes, table=t)).alias("bucket"),
            )
            for t in range(n_tables)
        ]
    )
    return embeddings.select("vec_id", F.explode(per_table).alias("tb")).select(
        "vec_id", "tb.table", "tb.bucket"
    )


def ann_topk(
    embeddings: DataFrame, query_ids: list[int], k: int = 10, dim: int = 64, n_planes: int = 8
) -> DataFrame:
    """Approximate top-k: rerank only within the query's LSH bucket."""
    from pyspark.sql import Window

    b = lsh_buckets(embeddings, dim, n_planes)
    emb = embeddings.join(b, "vec_id")
    q = emb.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("bucket").alias("qbucket"),
    )
    cand = emb.join(
        F.broadcast(q), (F.col("bucket") == F.col("qbucket")) & (F.col("vec_id") != F.col("query_id"))
    )
    sim = _dot(F.col("embedding"), F.col("qv")) / (
        _norm(F.col("embedding")) * _norm(F.col("qv"))
    )
    scored = cand.select("query_id", F.col("vec_id").alias("neighbor_id"), sim.alias("sim"))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 6).alias("sim6"))
    )


def ann_topk_multiprobe(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    dim: int = 64,
    n_planes: int = 8,
) -> DataFrame:
    """Multi-probe LSH (Lv et al., VLDB 2007): instead of T independent
    tables (T× the index memory), probe the ONE table's neighboring
    buckets — the query's home bucket plus every Hamming-1 bucket (each
    single sign bit flipped), p+1 probes total. A near neighbor that
    lands one hyperplane-sign away is recovered without building another
    index: the memory/recall trade that made multi-probe the production
    default when index size matters (at 10^10 vectors, T=8 tables is 8×
    the footprint; p+1 probes of one table is free).

    Shape: identical to ann_topk with the probe set exploded — the
    corpus keeps one (vec_id, bucket) row, queries broadcast p+1 probe
    rows each, candidates = bucket-equijoin (a vector lives in exactly
    one bucket and a query's probes are distinct, so no candidate dedup
    is needed), exact-cosine rerank with the same (sim desc,
    neighbor_id) contract.
    """
    from pyspark.sql import Window

    b = lsh_buckets(embeddings, dim, n_planes)
    emb = embeddings.join(b, "vec_id")
    q = emb.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("bucket").alias("qbucket"),
    )
    probes = q.select(
        "query_id",
        "qv",
        F.explode(
            F.array(
                F.col("qbucket"),
                *[
                    F.col("qbucket").bitwiseXOR(F.lit(1 << i))
                    for i in range(n_planes)
                ],
            )
        ).alias("bucket"),
    )
    cand = emb.join(F.broadcast(probes), "bucket").filter(
        F.col("vec_id") != F.col("query_id")
    )
    sim = _dot(F.col("embedding"), F.col("qv")) / (
        _norm(F.col("embedding")) * _norm(F.col("qv"))
    )
    scored = cand.select(
        "query_id", F.col("vec_id").alias("neighbor_id"), sim.alias("sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 6).alias("sim6"))
    )


def ann_topk_multitable(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 4,
) -> DataFrame:
    """Approximate top-k with T independent LSH tables (the production
    recall fix): candidates = vectors sharing the query's bucket in ANY
    table, deduped, then exact-cosine reranked. Same output contract as
    ann_topk/cosine_topk: (query_id, neighbor_id, rank, sim6)."""
    from pyspark.sql import Window

    b = lsh_buckets_multitable(embeddings, dim, n_planes, n_tables)
    qb = b.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("table").alias("qtable"),
        F.col("bucket").alias("qbucket"),
    )
    cand_ids = (
        b.join(
            F.broadcast(qb),
            (F.col("table") == F.col("qtable"))
            & (F.col("bucket") == F.col("qbucket"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select("query_id", "vec_id")
        .distinct()
    )
    q = embeddings.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    cand = cand_ids.join(embeddings, "vec_id").join(F.broadcast(q), "query_id")
    sim = _dot(F.col("embedding"), F.col("qv")) / (
        _norm(F.col("embedding")) * _norm(F.col("qv"))
    )
    scored = cand.select("query_id", F.col("vec_id").alias("neighbor_id"), sim.alias("sim"))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 6).alias("sim6"))
    )


DEFAULT_IVF_CENTROID_IDS = tuple(7 + 37 * i for i in range(8))


def _ivf_cell_udf(cent_vecs: list[list[float]], cent_norms: list[float]):
    """Arrow-vectorized nearest-centroid assignment, bit-identical to the
    expression form: dots and row norms use the same left-to-right double
    fold (see ``_bucket_udf``), centroid norms are the same precomputed
    Python floats, and ties go to the lowest cell (np.argmax first-max ==
    the struct sort's (sim desc, -cell desc) order)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import IntegerType

    cents = np.asarray(cent_vecs, dtype=np.float64)  # (C, D)
    cnorms = np.asarray(cent_norms, dtype=np.float64)  # (C,)

    @pandas_udf(IntegerType())
    def cell_of(emb: pd.Series) -> pd.Series:
        n = len(emb)
        if n == 0:
            return pd.Series([], dtype="int32")
        m = np.stack([np.asarray(e, dtype=np.float64) for e in emb.to_list()])
        dots = np.zeros((n, cents.shape[0]))
        rnorm2 = np.zeros(n)
        for d in range(cents.shape[1]):
            col = m[:, d]
            dots += col[:, None] * cents[:, d]
            rnorm2 += col * col
        sims = dots / (np.sqrt(rnorm2)[:, None] * cnorms[None, :])
        return pd.Series(np.argmax(sims, axis=1).astype("int32"))

    return cell_of


def ivf_assign(
    embeddings: DataFrame,
    centroid_ids: tuple[int, ...] = DEFAULT_IVF_CENTROID_IDS,
    vectorized: bool = True,
) -> DataFrame:
    """(vec_id, cell) — IVF coarse quantization: nearest sampled centroid.

    The OTHER standard ANN family next to LSH (Faiss IVF*): partition the
    corpus into cells around centroids, search only the query's nearest
    cells. Centroids here are corpus vectors at fixed ids (the
    training-free "sampled centroids" variant — deterministic, no RNG, no
    iterative k-means; a k-means refinement would slot in front without
    changing any downstream plumbing). The centroid set is tiny and is
    collected once at plan-build time and closed over by an Arrow-batched
    assignment UDF (one numpy pass per batch, order-preserving folds —
    see ``_ivf_cell_udf``), so assignment is one corpus scan with the
    centroids effectively broadcast; ``vectorized=False`` keeps the
    pure-expression form as the bit-parity cross-check.

    Cell choice = argmax cosine, ties to the lowest cell index (struct
    sort on (sim desc, -cell desc) — both engines compare the identical
    left-to-right double sums, mirrored in the DuckDB oracle).
    """
    cents = {
        r["vec_id"]: r["embedding"]
        for r in embeddings.filter(F.col("vec_id").isin(list(centroid_ids))).collect()
    }
    missing = [i for i in centroid_ids if i not in cents]
    if missing:
        raise ValueError(f"centroid ids not in corpus: {missing}")
    if vectorized:
        udf = _ivf_cell_udf(
            [[float(v) for v in cents[cid]] for cid in centroid_ids],
            [
                sum(float(v) * float(v) for v in cents[cid]) ** 0.5
                for cid in centroid_ids
            ],
        )
        return embeddings.select("vec_id", udf("embedding").alias("cell"))
    scored = F.array(
        *[
            F.struct(
                (
                    _dot(F.col("embedding"), F.array(*[F.lit(float(v)) for v in cents[cid]]))
                    / (
                        _norm(F.col("embedding"))
                        * F.lit(sum(float(v) * float(v) for v in cents[cid]) ** 0.5)
                    )
                ).alias("sim"),
                F.lit(-cell).alias("negcell"),
            )
            for cell, cid in enumerate(centroid_ids)
        ]
    )
    best = F.sort_array(scored, asc=False)[0]
    return embeddings.select("vec_id", (-best["negcell"]).cast("int").alias("cell"))


def _ivf_probes(
    embeddings: DataFrame,
    query_ids: list[int],
    nprobe: int,
    centroid_ids: tuple[int, ...],
) -> DataFrame:
    """(query_id, qv, cell): each query's ``nprobe`` nearest coarse
    cells by cosine (ties to the lowest cell index — same struct-sort
    contract as ivf_assign). Shared by ``ivf_topk`` (which reranks with
    the carried qv) and ``ivf_pq_topk`` (which needs only the cell
    set). Centroids collect once (tiny) and fold into the expression."""
    cents = {
        r["vec_id"]: r["embedding"]
        for r in embeddings.filter(F.col("vec_id").isin(list(centroid_ids))).collect()
    }
    q = embeddings.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    cell_sims = F.array(
        *[
            F.struct(
                (
                    _dot(F.col("qv"), F.array(*[F.lit(float(v)) for v in cents[cid]]))
                    / (
                        _norm(F.col("qv"))
                        * F.lit(sum(float(v) * float(v) for v in cents[cid]) ** 0.5)
                    )
                ).alias("sim"),
                F.lit(-cell).alias("negcell"),
            )
            for cell, cid in enumerate(centroid_ids)
        ]
    )
    return q.select(
        "query_id",
        "qv",
        F.explode(
            F.slice(F.sort_array(cell_sims, asc=False), 1, nprobe)
        ).alias("probe"),
    ).select("query_id", "qv", (-F.col("probe.negcell")).cast("int").alias("cell"))


def ivf_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    nprobe: int = 2,
    centroid_ids: tuple[int, ...] = DEFAULT_IVF_CENTROID_IDS,
) -> DataFrame:
    """IVF approximate top-k: rerank only within the query's ``nprobe``
    nearest cells. Output contract matches cosine_topk/ann_topk:
    (query_id, neighbor_id, rank, sim6).

    Scale shape: the index (vec_id, cell) is one corpus scan; queries
    probe a handful of cells, so candidates = corpus rows whose cell is in
    a tiny broadcast set — never all-pairs, and the corpus side never
    shuffles. At 10^10 vectors the cell column becomes the Iceberg
    partition key so probing prunes file scans.
    """
    from pyspark.sql import Window

    cells = ivf_assign(embeddings, centroid_ids)
    probes = _ivf_probes(embeddings, query_ids, nprobe, centroid_ids)
    cand = (
        embeddings.join(cells, "vec_id")
        .join(F.broadcast(probes), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
    )
    sim = _dot(F.col("embedding"), F.col("qv")) / (
        _norm(F.col("embedding")) * _norm(F.col("qv"))
    )
    # no dedup needed: each corpus vector lives in exactly one cell, so it
    # matches at most one of a query's nprobe (distinct) probed cells
    scored = cand.select(
        "query_id", F.col("vec_id").alias("neighbor_id"), sim.alias("sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 6).alias("sim6"))
    )


def embedding_neardup_clusters(
    embeddings: DataFrame, max_id: int = 200, sim_threshold: float = 0.99
) -> DataFrame:
    """(vec_id, cluster_id, keep) — the dedup DECISION over embedding
    near-dup pairs: cosine near-duplication is transitive in practice, so
    pairs close into connected components and exactly one survivor (min
    vec_id) is kept per component; every other vector in the id-bounded
    subset is its own singleton cluster. Same shape as the text-side
    ``dedup.neardup_clusters`` — at corpus scale the pair source swaps to
    the LSH/IVF bucketed path with this closure unchanged."""
    from .dedup import connected_components

    pairs = embedding_neardup_pairs(embeddings, max_id, sim_threshold)
    labels = connected_components(pairs, src="id_a", dst="id_b")
    return (
        embeddings.filter(F.col("vec_id") < max_id)
        .select("vec_id")
        .join(labels.withColumnRenamed("node", "vec_id"), "vec_id", "left")
        .select(
            "vec_id", F.coalesce("label", F.col("vec_id")).alias("cluster_id")
        )
        .withColumn("keep", F.col("vec_id") == F.col("cluster_id"))
    )


def embedding_neardup_pairs(
    embeddings: DataFrame, max_id: int = 200, sim_threshold: float = 0.99
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs on an id-bounded subset.

    The subset bound keeps the exact all-pairs check small; the scale path
    for the full corpus is lsh_buckets + within-bucket pairs.
    """
    sub = embeddings.filter(F.col("vec_id") < max_id).select("vec_id", "embedding")
    a = sub.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea"))
    b = sub.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"))
    pairs = a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
    sim = _dot(F.col("ea"), F.col("eb")) / (_norm(F.col("ea")) * _norm(F.col("eb")))
    return (
        pairs.select("id_a", "id_b", sim.alias("sim"))
        .filter(F.col("sim") >= sim_threshold)
        .select("id_a", "id_b", F.round("sim", 6).alias("sim6"))
    )


def ann_recall(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int | None = None,
) -> DataFrame:
    """Measured recall@k of the LSH ANN against the exact cosine top-k.

    The number that justifies an ANN index: per query, how many of the true
    top-k the bucketed search recovered (integer percent). ``n_tables``
    selects the multi-table variant; None measures the single-table path.
    At corpus scale this runs on a SAMPLE of queries — the exact side is
    the expensive one (broadcast scan per query), the ANN side is the
    production path, and a few hundred sampled queries bound recall tightly.

    Shape: both sides end in per-query top-k relations (query_ids x k
    rows); the recall join + agg is over that tiny product, keyed on
    (query_id, neighbor_id).
    """
    exact = cosine_topk(embeddings, query_ids, k).select("query_id", "neighbor_id")
    approx = (
        ann_topk_multitable(embeddings, query_ids, k, dim, n_planes, n_tables)
        if n_tables
        else ann_topk(embeddings, query_ids, k, dim, n_planes)
    ).select("query_id", "neighbor_id", F.lit(1).alias("hit"))
    return (
        exact.join(approx, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("*").alias("n_exact"),
            F.sum(F.coalesce("hit", F.lit(0))).alias("n_hit"),
        )
        .select(
            "query_id",
            F.col("n_exact").cast("long").alias("n_exact"),
            F.col("n_hit").cast("long").alias("n_hit"),
            F.expr("(100 * n_hit) DIV n_exact").alias("recall_pct"),
        )
    )


def pair_cosine_histogram(
    embeddings: DataFrame, dim: int = 64, n_planes: int = 8, bins: int = 20
) -> DataFrame:
    """(bin, n_pairs): cosine distribution of LSH same-bucket candidate
    pairs, bin = floor(round(cos, 6) * bins) in [-bins, bins].

    The embedding-side threshold-tuning diagnostic (the ANN analog of
    dedup's lsh_pair_quality): before picking a near-dup cosine cutoff at
    corpus scale you want the candidate-pair similarity mass, and
    computing it over ALL pairs is quadratic — over LSH candidates it is
    exactly the set the dedup pass would score anyway. Rounding to 6 dp
    BEFORE binning reuses the engine-parity contract of cosine_topk
    (sequential index-order fold both engines), so bin edges cannot flip
    on fold noise.

    Scale shape: one self-join on bucket (sizes ~N/2^p, never all-pairs),
    the fold-based dot product per surviving pair, and a final aggregation
    on a <= 2*bins+1-row key space.
    """
    b = lsh_buckets(embeddings, dim, n_planes)
    e = embeddings.join(b, "vec_id").select("vec_id", "bucket", "embedding")
    a_ = e.alias("a")
    b_ = e.alias("b")
    sim = _dot(F.col("a.embedding"), F.col("b.embedding")) / (
        _norm(F.col("a.embedding")) * _norm(F.col("b.embedding"))
    )
    return (
        a_.join(b_, "bucket")
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(F.floor(F.round(sim, 6) * bins).cast("int").alias("bin"))
        .groupBy("bin")
        .agg(F.count("*").cast("long").alias("n_pairs"))
    )


def kmeans_quantized(
    embeddings: DataFrame,
    k: int = 4,
    iters: int = 2,
    scale: int = 10**6,
) -> DataFrame:
    """Lloyd's k-means in EXACT integer arithmetic: (vec_id, cluster, d2).

    The corpus-bucketing step of embedding curation (topic balance, IVF
    training, per-cluster sampling). Float k-means is not reproducible
    across engines or partitionings (mean fold order); here every quantity
    is integer-exact so the assignment is bit-stable and DuckDB-checkable:

    - coordinates quantized once: q = floor(x * scale) as BIGINT;
    - distance = qq - 2*qc + cc from integer dot products (values bounded
      by dim * scale^2 ~ 6.4e13 for unit-ish vectors at scale 1e6 — within
      both engines' exact ranges);
    - centroid update = per-dimension integer mean (sum div count,
      truncation toward zero in both engines);
    - seeds = the k lowest vec_ids (deterministic, no RNG);
    - argmin ties break on cluster id (min over (d2, cid) structs).

    Scale shape: per iteration one broadcast of the k-row centroid
    relation (crossJoin + argmin aggregation keyed on vec_id — never a
    vector-vector shuffle), one posexplode + (cluster, dim) aggregation
    for the update (key space k * dim, tiny); ``localCheckpoint`` truncates
    centroid lineage so the plan stays constant across iterations. One
    final assignment pass emits the labeling.
    """
    q = embeddings.select(
        "vec_id",
        # widen float32 -> double BEFORE scaling: both engines then compute
        # floor on the identical double, so quantized coords are bit-equal
        F.expr(
            f"transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * {scale}) AS BIGINT))"
        ).alias("qe"),
    )
    q = q.cache()

    def _d2(a, b):
        dot = lambda u, v: F.aggregate(  # noqa: E731 — index-order fold
            F.zip_with(u, v, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, t: acc + t,
        )
        return dot(a, a) - 2 * dot(a, b) + dot(b, b)

    cent = q.filter(F.col("vec_id") < k).select(
        F.col("vec_id").cast("int").alias("cid"), F.col("qe").alias("cv")
    ).localCheckpoint()

    def _assign(c):
        scored = q.crossJoin(F.broadcast(c)).select(
            "vec_id", _d2(F.col("qe"), F.col("cv")).alias("d2"), "cid"
        )
        return (
            scored.groupBy("vec_id")
            .agg(F.min(F.struct("d2", "cid")).alias("m"))
            .select("vec_id", F.col("m.cid").alias("cluster"), F.col("m.d2").alias("d2"))
        )

    for _ in range(iters):
        asg = _assign(cent).join(q, "vec_id")
        dims = asg.select("cluster", F.posexplode("qe").alias("dim", "v"))
        newc = (
            dims.groupBy("cluster", "dim")
            .agg(F.expr("sum(v) div count(*)").alias("cval"))
            .groupBy("cluster")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "cval"))),
                    lambda s: s["cval"],
                ).alias("cv")
            )
            .select(F.col("cluster").alias("cid"), "cv")
        )
        cent = newc.localCheckpoint()

    out = _assign(cent)
    q.unpersist()
    return out


def ivf_recall(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    nprobe: int = 2,
) -> DataFrame:
    """Measured recall@k of the IVF index vs exact cosine top-k — the IVF
    analog of ``ann_recall`` (and the number that tunes ``nprobe``: recall
    rises with probed cells, scan cost rises linearly; this measures the
    trade instead of guessing it). Same tiny-relation shape: both sides
    are per-query top-k, the join+agg runs over query_ids x k rows.
    """
    exact = cosine_topk(embeddings, query_ids, k).select("query_id", "neighbor_id")
    approx = ivf_topk(embeddings, query_ids, k, nprobe).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit")
    )
    return (
        exact.join(approx, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("*").alias("n_exact"),
            F.sum(F.coalesce("hit", F.lit(0))).alias("n_hit"),
        )
        .select(
            "query_id",
            F.col("n_exact").cast("long").alias("n_exact"),
            F.col("n_hit").cast("long").alias("n_hit"),
            F.expr("(100 * n_hit) DIV n_exact").alias("recall_pct"),
        )
    )


def semantic_dedup(
    embeddings: DataFrame,
    k: int = 4,
    iters: int = 2,
    threshold_num: int = 3,
    threshold_den: int = 10,
    sim_scale: int = 1000,
) -> DataFrame:
    """(vec_id, cluster, keep): SemDeDup (Abbas et al. 2023) — semantic
    deduplication by cosine similarity WITHIN k-means clusters. A point is
    dropped when some same-cluster point of LOWER rank (closer to the
    centroid; (d2, vec_id) lexicographic, fully deterministic) has cosine
    >= threshold with it — removing semantically redundant documents that
    minhash-style lexical dedup cannot see.

    The clustering is the entire scale story: pairwise cosine is only ever
    computed inside a cluster, so cost is sum(|cluster|^2) ~= N^2/k instead
    of N^2, and k grows with the corpus (the paper runs k ~= sqrt(N)).
    At 100 TB the within-cluster join is further bounded by capping cluster
    size (re-splitting fat clusters with a second k-means round).

    All decisions are exact integers: vectors re-quantized at ``sim_scale``
    (coarser than the k-means scale so dot^2 stays far inside int64:
    dot <= dim*scale^2 = 6.4e7 at dim 64 -> dot^2 ~ 4e15), and
    cos(a,b) >= num/den evaluated as
    dot > 0 AND den^2*dot^2 >= num^2*qq_a*qq_b — no square roots, no
    floats, bit-identical in any engine.
    """
    asg = kmeans_quantized(embeddings, k=k, iters=iters)
    dot = lambda u, v: F.aggregate(  # noqa: E731 — index-order fold
        F.zip_with(u, v, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )
    q = embeddings.select(
        "vec_id",
        F.expr(
            f"transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * {sim_scale}) AS BIGINT))"
        ).alias("qe"),
    )
    base = (
        asg.join(q, "vec_id")
        .withColumn("qq", dot(F.col("qe"), F.col("qe")))
        .select("vec_id", "cluster", "d2", "qe", "qq")
    )
    a, b = base.alias("a"), base.alias("b")
    rank_lt = (F.col("a.d2") < F.col("b.d2")) | (
        (F.col("a.d2") == F.col("b.d2")) & (F.col("a.vec_id") < F.col("b.vec_id"))
    )
    pdot = dot(F.col("a.qe"), F.col("b.qe"))
    num2, den2 = threshold_num * threshold_num, threshold_den * threshold_den
    dropped = (
        a.join(b, (F.col("a.cluster") == F.col("b.cluster")) & rank_lt)
        .withColumn("_dot", pdot)
        .filter(
            (F.col("_dot") > 0)
            & (F.lit(den2) * F.col("_dot") * F.col("_dot")
               >= F.lit(num2) * F.col("a.qq") * F.col("b.qq"))
        )
        .select(F.col("b.vec_id").alias("vec_id"))
        .distinct()
        .withColumn("_drop", F.lit(True))
    )
    return (
        asg.join(dropped, "vec_id", "left")
        .select(
            "vec_id",
            "cluster",
            F.coalesce(~F.col("_drop"), F.lit(True)).alias("keep"),
        )
    )


def norm_histogram(embeddings: DataFrame, scale: int = 1000) -> DataFrame:
    """(bucket, n_vecs, min_qq, max_qq): log2 histogram of squared vector
    norms (quantized at ``scale``) — the ANN index diagnostic: a wide
    norm spread means inner-product and cosine rankings diverge (and
    MIPS-style reductions need norm augmentation), a spike at zero means
    broken embeddings upstream. Exact integers end-to-end: qq = integer
    dot product of the floor-quantized vector, bucket = bit_length(qq).

    Shape: map-side quantize + one partial->final aggregation into <=64
    buckets — the quantile_sketch shape on the embeddings table.
    """
    q = embeddings.select(
        F.expr(
            f"transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * {scale}) AS BIGINT))"
        ).alias("qe")
    )
    qq = F.aggregate(
        F.zip_with(F.col("qe"), F.col("qe"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )
    return (
        q.select(qq.alias("_qq"))
        .select(
            F.length(F.bin(F.greatest(F.col("_qq"), F.lit(0)))).cast("int").alias("bucket"),
            "_qq",
        )
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_vecs"),
            F.min("_qq").cast("long").alias("min_qq"),
            F.max("_qq").cast("long").alias("max_qq"),
        )
    )


def pq_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    m: int = 4,
    k_codes: int = 4,
    iters: int = 2,
    topk: int = 10,
    scale: int = 10**6,
) -> DataFrame:
    """(query_id, neighbor_id, rank, ad2): product-quantization ANN with
    asymmetric distance (ADC) — the third classic ANN family next to LSH
    and IVF (Jégou et al., PAMI 2011). The corpus is compressed to m
    one-byte-ish codes per vector (here m sub-codebooks of ``k_codes``
    centroids trained by the same exact-integer Lloyd as
    ``kmeans_quantized``); a query scans CODES, not vectors — distance is
    a per-subspace table lookup + sum, so the hot loop touches m ints per
    candidate instead of the full float vector (the memory-bandwidth win
    that makes billion-scale ANN fit in RAM).

    Everything integer-exact and deterministic (quantized coords,
    truncating centroid means, (d2, cid) argmin ties, (ad2, vec_id) rank
    ties), so the DuckDB oracle matches bit-for-bit.

    Scale shape: codebook training is Lloyd on the (vec, sub) relation —
    the m×k_codes centroid table is BROADCAST per iteration (keyed join
    on sub, never a vector-vector shuffle), updates aggregate on
    (sub, cid, dim) (key space m·k·sub_dim, tiny), localCheckpoint per
    iteration keeps the plan constant. Encoding is one keyed join; the
    query phase joins the code relation against a broadcast
    (query, sub, cid) distance table and sums keyed on (query, vec) —
    at 10^10 vectors that is the only corpus-sized pass, over codes not
    floats. Top-k is a per-query window over candidate rows.
    """
    from pyspark.sql import Window

    codes, dtable = _pq_codes_dtable(embeddings, query_ids, m, k_codes, iters, scale)
    cand = (
        codes.withColumnRenamed("code", "cid")
        .join(F.broadcast(dtable), ["sub", "cid"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("d2q").cast("long").alias("ad2"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("ad2"), F.asc("vec_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "rank", "ad2")
    )


def _pq_codes_dtable(
    embeddings: DataFrame,
    query_ids: list[int],
    m: int,
    k_codes: int,
    iters: int,
    scale: int,
):
    """The shared PQ machinery behind ``pq_topk`` and ``ivf_pq_topk``:
    train the per-subspace exact-integer Lloyd codebooks, encode the
    corpus, and build the per-query broadcastable ADC distance table.
    Returns (codes: (vec_id, sub, code), dtable: (query_id, sub, cid,
    d2q)). Identical construction (and therefore identical oracle
    parity) to the original inline pq_topk body."""
    dim = len(embeddings.select("embedding").head()[0])
    if dim % m:
        raise ValueError(f"m={m} must divide dim={dim}")
    d = dim // m

    q = embeddings.select(
        "vec_id",
        F.expr(
            f"transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * {scale}) AS BIGINT))"
        ).alias("qe"),
    )
    sub = q.select(
        "vec_id",
        F.posexplode(
            F.array(*[F.slice("qe", s * d + 1, d) for s in range(m)])
        ).alias("sub", "sv"),
    ).localCheckpoint()

    codes, cent = _pq_lloyd(sub, k_codes, iters)
    qsub = sub.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), "sub", F.col("sv").alias("qv")
    )
    dtable = qsub.join(F.broadcast(cent), "sub").select(
        "query_id", "sub", "cid", _pq_d2(F.col("qv"), F.col("cv")).alias("d2q")
    )
    return codes, dtable


def _pq_idot(u, v):
    return F.aggregate(
        F.zip_with(u, v, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )


def _pq_d2(a, b):
    return _pq_idot(a, a) - 2 * _pq_idot(a, b) + _pq_idot(b, b)


def _pq_lloyd(sub: DataFrame, k_codes: int, iters: int):
    """Per-subspace exact-integer Lloyd on a (vec_id, sub, sv) relation:
    init = the first ``k_codes`` vec_ids' subvectors, ``iters`` rounds of
    (argmin assign vs broadcast centroids, truncating integer mean
    update), then a final assignment. Returns (codes: (vec_id, sub,
    code), cent: (sub, cid, cv)). Shared by the plain-PQ and
    residual-PQ paths — identical construction to the original inline
    pq_topk body."""
    cent = (
        sub.filter(F.col("vec_id") < k_codes)
        .select("sub", F.col("vec_id").cast("int").alias("cid"), F.col("sv").alias("cv"))
        .localCheckpoint()
    )

    def _assign(c):
        scored = sub.join(F.broadcast(c), "sub").select(
            "vec_id", "sub", _pq_d2(F.col("sv"), F.col("cv")).alias("d2"), "cid"
        )
        return (
            scored.groupBy("vec_id", "sub")
            .agg(F.min(F.struct("d2", "cid")).alias("mn"))
            .select("vec_id", "sub", F.col("mn.cid").alias("code"))
        )

    for _ in range(iters):
        asg = _assign(cent).join(sub, ["vec_id", "sub"])
        dims = asg.select(
            "sub", F.col("code").alias("cid"), F.posexplode("sv").alias("dim", "v")
        )
        cent = (
            dims.groupBy("sub", "cid", "dim")
            .agg(F.expr("sum(v) div count(*)").alias("cval"))
            .groupBy("sub", "cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "cval"))),
                    lambda s: s["cval"],
                ).alias("cv")
            )
            .localCheckpoint()
        )
    return _assign(cent), cent


def ivf_pq_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    nprobe: int = 2,
    centroid_ids: tuple[int, ...] = DEFAULT_IVF_CENTROID_IDS,
    m: int = 4,
    k_codes: int = 4,
    iters: int = 2,
    topk: int = 10,
    scale: int = 10**6,
) -> DataFrame:
    """(query_id, neighbor_id, rank, ad2): the IVF-PQ COMPOSITE — the
    production billion-scale ANN shape (Faiss IVFPQ; Jégou et al. PAMI
    2011 §V): IVF's coarse cells prune the scan to the query's
    ``nprobe`` nearest cells, PQ's codes compress what remains, distances
    are the same broadcast ADC table lookups as ``pq_topk``. The two
    halves are the existing oracle-gated operators composed unchanged —
    ``ivf_assign`` decides WHO is scanned, ``_pq_codes_dtable`` decides
    WHAT a scan costs. (This variant shares one global codebook set
    rather than encoding per-cell residuals; residual encoding slots
    into the same plumbing by subtracting the broadcast cell centroid
    before ``_pq_codes_dtable``.)

    Scale shape: candidates = code rows whose cell is in the query's
    broadcast probe set — the corpus-sized pass is over m-int codes
    RESTRICTED to probed cells (both the IVF file-pruning win and the PQ
    memory win at once; at 10^10 vectors the cell is the Iceberg
    partition key, so the probe join prunes file scans). Joins: codes ->
    cells keyed on vec_id (co-partitioned), probes and distance table
    broadcast; the only aggregation is the per-(query, vec) ADC sum.
    Everything integer-exact with (ad2, vec_id) rank ties, so the
    composed DuckDB oracle matches bit-for-bit.
    """
    from pyspark.sql import Window

    codes, dtable = _pq_codes_dtable(embeddings, query_ids, m, k_codes, iters, scale)
    cells = ivf_assign(embeddings, centroid_ids)
    probes = _ivf_probes(embeddings, query_ids, nprobe, centroid_ids).select(
        "query_id", "cell"
    )
    cand = (
        codes.withColumnRenamed("code", "cid")
        .join(cells, "vec_id")
        .join(F.broadcast(probes), "cell")
        .join(F.broadcast(dtable), ["query_id", "sub", "cid"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("d2q").cast("long").alias("ad2"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("ad2"), F.asc("vec_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "rank", "ad2")
    )


def ivf_pq_residual_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    nprobe: int = 2,
    centroid_ids: tuple[int, ...] = DEFAULT_IVF_CENTROID_IDS,
    m: int = 4,
    k_codes: int = 4,
    iters: int = 2,
    topk: int = 10,
    scale: int = 10**6,
) -> DataFrame:
    """(query_id, neighbor_id, rank, ad2): TEXTBOOK IVFPQ — residual
    encoding (Jégou et al. PAMI 2011 §V-A; what Faiss IVFPQ actually
    stores). Where ``ivf_pq_topk`` trains one global codebook set over
    raw vectors, this encodes r_x = x − c(cell(x)) — the vector MINUS
    its coarse centroid — so the sub-codebooks spend their bits on the
    residual distribution (tighter than the raw one: the coarse step
    already explained the between-cell variance). ADC then approximates
    ||q − x||² = ||r_q − r_x||² with r_q = q − c(cell) computed PER
    PROBED CELL, so the distance table is keyed (query, cell, sub, cid)
    — nprobe× larger than the global-codebook table, still tiny and
    broadcast.

    Integer-exact throughout: coarse centroids are corpus vectors, so
    c(cell) is the same floor-quantized integer vector as everything
    else and the residual subtraction is exact; cell assignment reuses
    ``ivf_assign``/``_ivf_probes`` (cosine argmax — deterministic,
    oracle-matched) unchanged.

    Scale shape: identical to ivf_pq_topk — the corpus-sized pass is the
    residual code scan restricted to probed cells (codes->cells keyed on
    vec_id, probes + distance table broadcast, one (query, vec) keyed
    ADC sum). Residual encode adds one broadcast join of the m×k-row
    quantized-centroid table against the corpus — no new shuffle.
    """
    from pyspark.sql import Window

    dim = len(embeddings.select("embedding").head()[0])
    if dim % m:
        raise ValueError(f"m={m} must divide dim={dim}")
    d = dim // m

    q = embeddings.select(
        "vec_id",
        F.expr(
            f"transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * {scale}) AS BIGINT))"
        ).alias("qe"),
    )
    cells = ivf_assign(embeddings, centroid_ids)
    spark = embeddings.sparkSession
    cellmap = spark.createDataFrame(
        [(c, int(vid)) for c, vid in enumerate(centroid_ids)], "cell int, vec_id long"
    )
    centq = cellmap.join(q, "vec_id").select("cell", F.col("qe").alias("ce"))

    def _subsplit(df, veccol, keep):
        return df.select(
            *keep,
            F.posexplode(
                F.array(*[F.slice(veccol, s * d + 1, d) for s in range(m)])
            ).alias("sub", "sv"),
        )

    resid = (
        q.join(cells, "vec_id")
        .join(F.broadcast(centq), "cell")
        .select(
            "vec_id",
            F.zip_with("qe", "ce", lambda x, y: x - y).alias("re"),
        )
    )
    sub = _subsplit(resid, "re", ["vec_id"]).localCheckpoint()
    codes, cent = _pq_lloyd(sub, k_codes, iters)

    probes = _ivf_probes(embeddings, query_ids, nprobe, centroid_ids).select(
        "query_id", "cell"
    )
    qres = (
        probes.join(
            q.select(F.col("vec_id").alias("query_id"), "qe"), "query_id"
        )
        .join(F.broadcast(centq), "cell")
        .select(
            "query_id",
            "cell",
            F.zip_with("qe", "ce", lambda x, y: x - y).alias("re"),
        )
    )
    qsub = _subsplit(qres, "re", ["query_id", "cell"]).withColumnRenamed("sv", "qv")
    dtable = qsub.join(F.broadcast(cent), "sub").select(
        "query_id", "cell", "sub", "cid",
        _pq_d2(F.col("qv"), F.col("cv")).alias("d2q"),
    )
    cand = (
        codes.withColumnRenamed("code", "cid")
        .join(cells, "vec_id")
        .join(F.broadcast(dtable), ["cell", "sub", "cid"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("d2q").cast("long").alias("ad2"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("ad2"), F.asc("vec_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "rank", "ad2")
    )


def l2_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    scale: int = 10**6,
) -> DataFrame:
    """(query_id, neighbor_id, rank, d2): EXACT L2 top-k on the quantized
    coordinates — the denominator relation for ``pq_recall`` (same metric
    and same quantization as the PQ index, so the recall number isolates
    what PQ's code compression loses, not metric disagreement with the
    cosine path). Integer-exact, (d2, neighbor_id) rank ties.

    Shape: queries broadcast, corpus never shuffles — one scan + a
    per-query window over candidate rows (same as cosine_topk).
    """
    from pyspark.sql import Window

    q = embeddings.select(
        "vec_id",
        F.expr(
            f"transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * {scale}) AS BIGINT))"
        ).alias("qe"),
    )

    def _idot(u, v):
        return F.aggregate(
            F.zip_with(u, v, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, t: acc + t,
        )

    qs = q.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("qe").alias("qv")
    )
    scored = (
        q.crossJoin(F.broadcast(qs))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (
                _idot(F.col("qe"), F.col("qe"))
                - 2 * _idot(F.col("qe"), F.col("qv"))
                + _idot(F.col("qv"), F.col("qv"))
            ).alias("d2"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("d2"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "d2")
    )


def pq_recall(
    embeddings: DataFrame,
    query_ids: list[int],
    m: int = 4,
    k_codes: int = 4,
    iters: int = 2,
    topk: int = 10,
    scale: int = 10**6,
) -> DataFrame:
    """(query_id, n_exact, n_hit, recall_pct): measured recall@k of the PQ
    ADC search against the exact L2 top-k on the same quantized vectors —
    the number that prices PQ's compression (m codes vs full vectors), on
    the same metric so codebook coarseness is the ONLY source of loss.
    Same contract as ann_recall (LSH) and ivf_recall; together the three
    give the index-selection table a curation run publishes.

    Shape: both sides end in (queries x k)-row relations; the compare is
    a join + aggregation over that tiny product.
    """
    exact = l2_topk(embeddings, query_ids, topk, scale).select(
        "query_id", "neighbor_id"
    )
    approx = pq_topk(embeddings, query_ids, m, k_codes, iters, topk, scale).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit")
    )
    return (
        exact.join(approx, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("*").alias("n_exact"),
            F.sum(F.coalesce("hit", F.lit(0))).alias("n_hit"),
        )
        .select(
            "query_id",
            F.col("n_exact").cast("long").alias("n_exact"),
            F.col("n_hit").cast("long").alias("n_hit"),
            F.expr("(100 * n_hit) DIV n_exact").alias("recall_pct"),
        )
    )
