"""Large-scale document deduplication operators.

The crawl engine dedups *URLs* (operators/dedup.py); a training-data
pipeline additionally dedups *content*. Four standard families, all
Spark-native (JVM expressions, no Python in the hot path) and all designed
to hash-partition by content key so they scale linearly:

- exact:      md5(text) group-by (one shuffle on the content hash)
- minhash:    shingle -> H independent min-hashes -> banded LSH buckets ->
              candidate pairs via bucket self-join (never all-pairs)
- simhash:    per-token 32-bit hash sign-sum -> 16-bit fingerprint
- ngram jaccard: inverted shingle index join; the >=threshold test is kept
              in exact integer arithmetic (t*union <= (t_den)*inter) so no
              float comparisons are involved.

Determinism contract (shared with the DuckDB oracles in __spark_entry__):
tokens = non-empty pieces of lower(text) split on single spaces; shingles =
k consecutive tokens joined by one space; hashes = md5 hex (lexicographic
min is well-defined and engine-independent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tokens: split on whitespace runs, drop empties (parity with DuckDB
# string_split_regex + list_filter)
def tokens_col(text_col: str = "text"):
    return F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")


def shingles_col(toks, k: int = 3):
    """k-token shingles joined by ' '; empty when fewer than k tokens.

    NOTE: lambda higher-order functions are evaluated INTERPRETED per
    element (outside whole-stage codegen); measured ~40us per shingle on
    this host vs ~2us for the window-lead construction in
    ``_shingle_instances`` below. Kept only as the semantic definition /
    fallback for array-shaped callers."""
    n = F.size(toks)
    return F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.concat_ws(
                " ", F.transform(F.sequence(F.lit(0), F.lit(k - 1)), lambda j: toks[i + j])
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _shingle_instances(documents: DataFrame, k: int = 3) -> DataFrame:
    """(doc_id, shingle) rows — one per shingle POSITION (duplicates kept).

    Construction: posexplode tokens -> window lead(1..k-1) partitioned by
    doc_id — everything JVM-side and 15x faster than the transform-lambda
    variant (HOFs are interpreted per element). Docs with < k tokens emit
    nothing (trailing positions with a null lead are dropped). The window
    leaves the relation hash-partitioned by doc_id, which downstream
    per-doc aggregations (distinct, sizes, minhash mins) reuse shuffle-free
    (HashPartitioning(doc_id) satisfies any grouping that includes doc_id).
    """
    from pyspark.sql.window import Window

    tok = documents.select(
        "doc_id", F.posexplode(tokens_col()).alias("pos", "t")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    parts = [F.col("t")] + [F.lead("t", j).over(w) for j in range(1, k)]
    return (
        tok.select(
            "doc_id",
            F.concat_ws(" ", *parts).alias("shingle"),
            F.lead("t", k - 1).over(w).isNotNull().alias("_full"),
        )
        .where("_full")
        .drop("_full")
    )


def exact_dedup(documents: DataFrame) -> DataFrame:
    """Exact content dedup: one row per distinct body, min doc_id kept."""
    return (
        documents.groupBy(F.md5("text").alias("fp"))
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_docs"))
    )


def doc_shingles(documents: DataFrame, k: int = 3) -> DataFrame:
    """(doc_id, shingle) with per-doc DISTINCT shingles. The dedup is a
    hash-aggregate on (doc_id, shingle) that reuses the window's
    HashPartitioning(doc_id) — no additional exchange."""
    return _shingle_instances(documents, k).dropDuplicates(["doc_id", "shingle"])


def doc_shingle_sets(documents: DataFrame, k: int = 3) -> DataFrame:
    """(doc_id, sh: array<string>) — the DISTINCT shingle set per doc.

    collect_set dedups inside the aggregation buffer in the same pass, and
    the groupBy reuses the window's HashPartitioning(doc_id), so the whole
    thing is still the single posexplode shuffle. Set sizes (F.size) and
    the inverted index (F.explode) both derive from the one row per doc
    without re-aggregating. Docs with < k tokens emit no row (they have no
    shingles and cannot intersect anything)."""
    return (
        _shingle_instances(documents, k)
        .groupBy("doc_id")
        .agg(F.collect_set("shingle").alias("sh"))
    )


def minhash_signatures(documents: DataFrame, num_hashes: int = 128, k: int = 3) -> DataFrame:
    """doc_id + minhash_i = lexicographic min of md5(i || ':' || shingle).

    min() is insensitive to duplicates, so the signatures aggregate the RAW
    shingle instances — no distinct step at all. The whole pipeline is one
    shuffle (the posexplode->window exchange on doc_id); the H min()
    aggregates run codegen'd on already-partitioned data."""
    sh = _shingle_instances(documents, k)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_band_keys(
    documents: DataFrame, num_hashes: int = 128, band_size: int = 8, k: int = 3
) -> DataFrame:
    """(doc_id, band, band_key) — the LSH bucket assignment, shared by the
    pair self-join and the incremental index join."""
    sig = minhash_signatures(documents, num_hashes, k)
    return _band_keys_from_sig(sig, num_hashes, band_size)


def _band_keys_from_sig(sig: DataFrame, num_hashes: int, band_size: int) -> DataFrame:
    """Band keys from a precomputed signature table (mh0..mh{H-1} columns).

    Split out so lsh_band_sweep can derive every config's bands from ONE
    signature pass: mh_i is the same hash family regardless of how many
    hashes a config uses, so a table computed at max(num_hashes) serves
    smaller configs as a column-prefix subset."""
    n_bands = num_hashes // band_size
    return sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat(
                                *[F.col(f"mh{b * band_size + j}") for j in range(band_size)]
                            )
                        ).alias("band_key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.band_key")


def minhash_lsh_pairs(
    documents: DataFrame, num_hashes: int = 128, band_size: int = 8, k: int = 3
) -> DataFrame:
    """Candidate near-dup pairs: docs sharing any LSH band bucket.

    Scale path: the self-join is on (band, band_key) — each bucket is tiny,
    so the join never goes quadratic in the corpus.

    Defaults (128 hashes / 16 bands of 8, S-curve midpoint ~0.71) are the
    MEASURED winner of ``lsh_band_sweep`` on the sf0.1 corpus at a
    J>=0.8 near-dup truth set: full recall with zero false candidates,
    where 32 bands of 2 blew candidates up 16.7x (precision 0.060) and
    8 bands of 16 lost recall (0.969). Numbers in SCALE.md ("LSH banding
    defaults"). The oracle-gated registry queries pin the toy 9/3 config
    explicitly so the DuckDB oracles stay tractable.
    """
    bands = minhash_band_keys(documents, num_hashes, band_size, k)
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(b, ["band", "band_key"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def simhash(documents: DataFrame, bits: int = 64) -> DataFrame:
    """SimHash fingerprint of ``bits`` width (1..64): sign of per-bit sums
    of token-instance hashes.

    Per-token hash bits come from md5 32-bit words (hex chars 1-8 → bits
    0-31, chars 9-16 → bits 32-63), identical to the DuckDB oracle's
    ('0x'||substr(md5(t),...))::BIGINT. Widths over 32 are emitted as two
    32-bit halves (simhash_hi, simhash_lo) so both engines stay in exact
    signed-64 arithmetic — no 1<<63 sign traps on either side. The round-1
    default of 16 bits collides massively at corpus scale (2^16 buckets);
    64-bit is the production default for near-dup keying.
    """
    if not 1 <= bits <= 64:
        raise ValueError("bits must be in 1..64")
    toks = tokens_col()
    inst = documents.select("doc_id", F.explode(toks).alias("tok"))
    h_lo = F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long")
    h_hi = F.conv(F.substring(F.md5("tok"), 9, 8), 16, 10).cast("long")
    inst = inst.select("doc_id", h_lo.alias("h_lo"), h_hi.alias("h_hi"))

    def bit(b: int):
        col, off = ("h_lo", b) if b < 32 else ("h_hi", b - 32)
        return F.shiftright(col, off).bitwiseAND(F.lit(1))

    sums = inst.groupBy("doc_id").agg(
        *[
            F.sum(F.when(bit(b) == 1, 1).otherwise(-1)).alias(f"s{b}")
            for b in range(bits)
        ]
    )

    def pack(lo: int, hi_excl: int):
        fp = None
        for b in range(lo, hi_excl):
            term = F.when(F.col(f"s{b}") > 0, F.lit(1 << (b - lo))).otherwise(F.lit(0))
            fp = term if fp is None else fp + term
        return fp.cast("long")

    if bits <= 32:
        return sums.select("doc_id", pack(0, bits).alias("simhash"))
    return sums.select(
        "doc_id",
        pack(32, bits).alias("simhash_hi"),
        pack(0, 32).alias("simhash_lo"),
    )


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 50,
) -> DataFrame:
    """(node, label) — label = min node id of each connected component.

    Min-label propagation to a fixpoint: each iteration joins the
    (undirected) edge list against the current labels and takes the min of
    a node's own label and its neighbors' labels. Iterations = graph
    diameter; near-dup components are dense and shallow (LSH buckets link
    every member of a duplicate family to the minhash-minimal one), so
    this converges in 2-4 rounds in practice where the textbook worst case
    (a path graph) would need O(n). Each iteration is one shuffle join +
    one aggregation, both on the node key; ``localCheckpoint`` truncates
    the lineage so plan size stays constant across iterations. For
    adversarial graph shapes the two-phase large-star/small-star algorithm
    (Kiveris et al., "Connected Components in MapReduce and Beyond") drops
    rounds to O(log n); not needed for dedup-shaped graphs.

    Deterministic: the fixpoint (min reachable id) is unique; the loop
    exits only when an iteration changes nothing. ``max_iter`` is a
    runaway bound, not a tuning knob — hitting it raises rather than
    silently emitting a non-converged labeling.
    """
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(pairs.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .cache()
    )
    labels = edges.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    labels = labels.localCheckpoint()
    for _ in range(max_iter):
        nbr_min = (
            edges.join(
                labels.select(F.col("node").alias("v"), F.col("label").alias("vlab")),
                "v",
            )
            .groupBy("u")
            .agg(F.min("vlab").alias("nmin"))
        )
        new_labels = (
            labels.join(nbr_min, labels["node"] == nbr_min["u"], "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nmin", "label")).alias("label"),
            )
            .localCheckpoint()  # eager: also materializes the iteration
        )
        changed = (
            new_labels.withColumnRenamed("label", "nl")
            .join(labels, "node")
            .filter(F.col("nl") != F.col("label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            edges.unpersist()
            return labels
    edges.unpersist()
    raise RuntimeError(f"connected_components did not converge in {max_iter} iterations")


def neardup_clusters(
    documents: DataFrame, num_hashes: int = 128, band_size: int = 8, k: int = 3
) -> DataFrame:
    """(doc_id, cluster_id, keep) — the production dedup decision.

    Pair detection alone (``minhash_lsh_pairs``) is not a dedup policy:
    near-duplication is transitive in practice (A~B, B~C) and keeping
    "one of each pair" over-deletes. This operator closes the pairs into
    connected components and keeps exactly one survivor per component —
    the min doc_id — assigning every OTHER corpus document its own id
    (singleton cluster). Output is a full keep/drop decision per document,
    joinable back onto the corpus as the dedup filter.
    """
    pairs = minhash_lsh_pairs(documents, num_hashes, band_size, k)
    labels = connected_components(pairs)
    return (
        documents.select("doc_id")
        .join(labels.withColumnRenamed("node", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("label", F.col("doc_id")).alias("cluster_id"),
        )
        .withColumn("keep", F.col("doc_id") == F.col("cluster_id"))
    )


def winnow_signatures(documents: DataFrame, k: int = 3, w: int = 4) -> DataFrame:
    """MOSS-style winnowed fingerprint set per document (Schleimer et al.,
    SIGMOD'03) — the robust-fingerprinting dedup used for code corpora.

    Shingle hashes are computed positionally; each length-``w`` window of
    consecutive hashes contributes its minimum, and the distinct minima are
    the document's fingerprint set (density ~2/(w+1) of the shingle count,
    so the inverted index downstream is ~w/2 times smaller than the full
    ngram index while still guaranteeing detection of any match of length
    >= w+k-1 tokens). Entirely array-side arithmetic per row — no shuffle,
    no Python; a doc with fewer than ``w`` shingles contributes the single
    global minimum (the classic short-doc rule).

    Hash = first 15 hex chars of md5 as a 60-bit integer — the same
    engine-portable construction as assemble._hash_bucket, mirrored exactly
    by the DuckDB oracle.

    NOTE: this array-lambda form is the semantic definition (kept for
    array-shaped callers and as the parity spec, like ``shingles_col``);
    higher-order lambdas are interpreted per element, so the hot path is
    ``_winnow_instance_fps`` — posexplode + windowed sliding min, fully
    codegen (measured ~50x faster). Equality of the two forms is pinned by
    tests/test_dedup_clusters.py.
    """
    base = documents.select("doc_id", tokens_col().alias("toks")).select(
        "doc_id",
        F.expr(
            f"""
            CASE WHEN size(toks) < {k} THEN CAST(array() AS array<bigint>)
            ELSE transform(sequence(0, size(toks) - {k}),
              i -> CAST(conv(substring(md5(concat_ws(' ', slice(toks, i + 1, {k}))), 1, 15), 16, 10) AS BIGINT))
            END
            """
        ).alias("h"),
    )
    return base.select(
        "doc_id",
        F.expr(
            f"""
            CASE
              WHEN size(h) = 0 THEN h
              WHEN size(h) < {w} THEN array(array_min(h))
              ELSE array_distinct(transform(sequence(0, size(h) - {w}),
                j -> array_min(slice(h, j + 1, {w}))))
            END
            """
        ).alias("fps"),
    )


def _winnow_instance_fps(documents: DataFrame, k: int = 3, w: int = 4) -> DataFrame:
    """(doc_id, fp) DISTINCT winnowed fingerprints — the codegen hot path.

    posexplode tokens -> lead() shingles (one window keyed on doc_id) ->
    sliding min over the next ``w`` shingle hashes (a second frame on the
    SAME (doc_id, pos) sort, so no extra shuffle) -> keep window starts
    (pos <= m-w, or pos=0 when m<w: the rowsBetween frame clips to the doc
    end, which IS the short-doc global-min rule) -> distinct. Everything
    whole-stage-codegen; one shuffle keyed on doc_id.
    """
    from pyspark.sql.window import Window

    tok = documents.select("doc_id", F.posexplode(tokens_col()).alias("pos", "t"))
    wnd = Window.partitionBy("doc_id").orderBy("pos")
    parts = [F.col("t")] + [F.lead("t", j).over(wnd) for j in range(1, k)]
    sh = (
        tok.select(
            "doc_id",
            "pos",
            F.concat_ws(" ", *parts).alias("shingle"),
            F.lead("t", k - 1).over(wnd).isNotNull().alias("_full"),
        )
        .where("_full")
        .select(
            "doc_id",
            "pos",
            F.expr(
                "CAST(conv(substring(md5(shingle), 1, 15), 16, 10) AS BIGINT)"
            ).alias("h"),
        )
    )
    frame = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    whole = Window.partitionBy("doc_id")
    return (
        sh.select(
            "doc_id",
            "pos",
            F.min("h").over(frame).alias("win_min"),
            F.count("*").over(whole).alias("m"),
            F.min("pos").over(whole).alias("pos0"),
        )
        .where(F.col("pos") - F.col("pos0") <= F.greatest(F.col("m") - w, F.lit(0)))
        .select("doc_id", F.col("win_min").alias("fp"))
        .distinct()
    )


def winnow_pairs(
    documents: DataFrame,
    k: int = 3,
    w: int = 4,
    min_shared: int = 2,
    max_df: int = 100,
) -> DataFrame:
    """Candidate near-dup pairs sharing >= min_shared winnowed fingerprints.

    Same bounded inverted-index shape as ngram_jaccard_pairs (hot-key cap
    at ``max_df`` before the self-join) but over the winnowed set — ~w/2x
    fewer index entries for the same guarantee window, which is the point
    of winnowing at 100 TB.
    """
    inst = _winnow_instance_fps(documents, k, w)
    hot = (
        inst.groupBy("fp")
        .agg(F.count("*").alias("_df"))
        .filter(F.col("_df") > max_df)
        .select("fp")
    )
    cold = inst.join(hot, "fp", "left_anti")
    a = cold.alias("a")
    b = cold.alias("b")
    return (
        a.join(b, "fp")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def ngram_jaccard_pairs(
    documents: DataFrame,
    k: int = 3,
    threshold_num: int = 4,
    threshold_den: int = 5,
    max_df: int = 100,
) -> DataFrame:
    """Pairs with shingle-Jaccard >= num/den, exact integer test.

    jaccard >= n/d  <=>  d*inter >= n*(|A|+|B|-inter) — no floats, so the
    Spark result hashes identically to the SQL oracle.

    ``max_df`` caps the inverted index by shingle document-frequency: a
    shingle shared by d documents contributes d^2 rows to the self-join,
    so one boilerplate shingle across 10^6 docs would create 10^12 join
    rows. Shingles with df > max_df are dropped from the INTERSECTION only
    (set sizes keep the full shingle sets), bounding the join at
    max_df^2 per shingle. Recall trade-off: a pair whose overlap lives
    exclusively in ultra-common shingles is missed — precisely the pairs
    that are near-dups of boilerplate, not of content (the minhash path
    de-weights them the same way). The DuckDB oracle mirrors the cap
    exactly, so correctness comparison is unaffected.
    """
    sets_ = doc_shingle_sets(documents, k)
    sizes = sets_.select("doc_id", F.size("sh").alias("n"))
    sh = sets_.select("doc_id", F.explode("sh").alias("shingle"))
    # hot-shingle cap, two-phase so memory stays bounded: (1) a narrow count
    # aggregate finds shingles with df > max_df (a tiny relation for any real
    # corpus — bounded by |instances|/max_df); (2) an anti-join drops their
    # instances BEFORE the collect, so no group ever materializes more than
    # max_df doc_ids. AQE picks broadcast for the anti-join when hot is small
    # (always, in practice) and falls back to shuffle join if it is not.
    hot = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("_df"))
        .filter(F.col("_df") > max_df)
        .select("shingle")
    )
    cold = sh.join(hot, "shingle", "left_anti")
    # instance-level self-join on shingle, bounded at max_df^2 rows per
    # shingle by the anti-join above; whole-stage codegen end-to-end (an
    # in-row pair-generation variant via collect_list + nested transform/
    # filter lambdas was measured 5x slower — higher-order functions are
    # interpreted per element).
    a = cold.alias("a")
    b = cold.alias("b")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    # sizes is one narrow row per doc; no broadcast hint — AQE broadcasts it
    # at bench scale and switches to a shuffle join at 10^10-doc scale.
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("un", F.col("na") + F.col("nb") - F.col("inter"))
        .filter(
            F.lit(threshold_den) * F.col("inter") >= F.lit(threshold_num) * F.col("un")
        )
        .select("doc_a", "doc_b", "inter", "un")
    )


def incremental_dedup(
    new_docs: DataFrame,
    corpus: DataFrame,
    num_hashes: int = 128,
    band_size: int = 8,
    k: int = 3,
) -> DataFrame:
    """(doc_id, verdict, matched): dedup a NEW batch against an existing
    corpus index, verdict in {'exact_dup', 'near_dup', 'fresh'}.

    The production shape: daily crawl deltas are deduped against the
    historical index, NOT by re-self-joining the whole corpus. Exact dups
    via an md5 index join; near-dups via the minhash band buckets — a new
    doc matches if it shares ANY band bucket with an indexed doc. Exact
    wins over near; ``matched`` is the minimal matching corpus doc_id
    (deterministic).

    Scale shape: the corpus side collapses to two bounded indexes BEFORE
    any join touches the batch — (fp -> min doc) and (band, band_key ->
    min doc) — so a boilerplate bucket with 10^6 corpus members costs one
    row, not 10^6 join partners (the same hot-key discipline as the df
    cap). Both joins are keyed; at 10^10 corpus scale the indexes live
    bucketed on their key and the delta join is shuffle-free on the batch
    side. Nothing ever self-joins the corpus.
    """
    cfp = corpus.groupBy(F.md5("text").alias("fp")).agg(
        F.min("doc_id").alias("match_exact")
    )
    nfp = new_docs.select("doc_id", F.md5("text").alias("fp"))
    ex = nfp.join(cfp, "fp", "left").select("doc_id", "match_exact")
    nb = minhash_band_keys(new_docs, num_hashes, band_size, k)
    cb_min = (
        minhash_band_keys(corpus, num_hashes, band_size, k)
        .groupBy("band", "band_key")
        .agg(F.min("doc_id").alias("cdoc"))
    )
    near = (
        nb.join(cb_min, ["band", "band_key"])
        .groupBy("doc_id")
        .agg(F.min("cdoc").alias("match_near"))
    )
    return (
        new_docs.select("doc_id")
        .join(ex, "doc_id", "left")
        .join(near, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("match_exact").isNotNull(), F.lit("exact_dup"))
            .when(F.col("match_near").isNotNull(), F.lit("near_dup"))
            .otherwise(F.lit("fresh"))
            .alias("verdict"),
            F.coalesce("match_exact", "match_near").alias("matched"),
        )
    )


def containment_pairs(
    documents: DataFrame,
    k: int = 3,
    threshold_num: int = 4,
    threshold_den: int = 5,
    max_df: int = 100,
) -> DataFrame:
    """Directional containment pairs: C(A->B) = |A ∩ B| / |A| >= num/den.

    Jaccard misses the asymmetric dup family — a short page quoted inside
    a long one, a partial scrape, boilerplate wrapping real content —
    because the union in the denominator dilutes the overlap. Containment
    normalizes by the SMALLER side's set only (Broder's original resemblance
    vs containment distinction), so "A is inside B" fires even when B is
    10x longer. Output rows are directional: (contained, container, inter,
    n_contained) with den*inter >= num*n_contained, in exact integer
    arithmetic (hash-identical to the SQL oracle).

    Scale shape: identical to ngram_jaccard_pairs — df-capped inverted
    shingle index (hot boilerplate shingles dropped from the intersection,
    keeping the self-join bounded at max_df^2 per shingle), sizes joined
    back from the per-doc aggregate. Each unordered pair's intersection is
    computed ONCE; the two directional tests are projections of that row.
    """
    sets_ = doc_shingle_sets(documents, k)
    sizes = sets_.select("doc_id", F.size("sh").cast("long").alias("n"))
    sh = sets_.select("doc_id", F.explode("sh").alias("shingle"))
    hot = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("_df"))
        .filter(F.col("_df") > max_df)
        .select("shingle")
    )
    cold = sh.join(hot, "shingle", "left_anti")
    a = cold.alias("a")
    b = cold.alias("b")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").cast("long").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    both = inter.join(sa, "doc_a").join(sb, "doc_b")
    fwd = both.filter(
        F.lit(threshold_den) * F.col("inter") >= F.lit(threshold_num) * F.col("na")
    ).select(
        F.col("doc_a").alias("contained"),
        F.col("doc_b").alias("container"),
        "inter",
        F.col("na").alias("n_contained"),
    )
    rev = both.filter(
        F.lit(threshold_den) * F.col("inter") >= F.lit(threshold_num) * F.col("nb")
    ).select(
        F.col("doc_b").alias("contained"),
        F.col("doc_a").alias("container"),
        "inter",
        F.col("nb").alias("n_contained"),
    )
    return fwd.unionByName(rev)


def lsh_pair_quality(
    documents: DataFrame,
    num_hashes: int = 128,
    band_size: int = 8,
    k: int = 3,
    threshold_num: int = 1,
    threshold_den: int = 5,
    max_df: int = 100,
) -> DataFrame:
    """Confusion matrix of MinHash-LSH candidate pairs vs exact Jaccard.

    LSH parameters (H hashes, b bands) trade recall for candidate volume;
    tuning them blind at corpus scale is how dedup quietly loses 10% of its
    near-dups. This diagnostic measures the trade on a sample: the truth
    set is ``ngram_jaccard_pairs`` (exact integer Jaccard >= num/den over
    the df-capped inverted index — the same bounded-join shape, so the
    diagnostic itself never goes quadratic), the candidate set is
    ``minhash_lsh_pairs``, and the output is one row per (in_lsh, is_true)
    cell with pair counts: (true,true) = hits, (true,false) = LSH false
    positives a verifier pass must re-check, (false,true) = recall loss.
    Precision = tt/(tt+tf), recall = tt/(tt+ft) — derivable from the cells;
    counts are emitted rather than ratios to keep the result hash-exact.

    Scale shape: both pair generators are bucket-bounded (LSH bands / df
    cap); the comparison is one full-outer join on the pair key followed by
    a <=3-row aggregation. Nothing here is heavier than the dedup passes it
    diagnoses.
    """
    cand = minhash_lsh_pairs(documents, num_hashes, band_size, k).select(
        "doc_a", "doc_b", F.lit(True).alias("in_lsh")
    )
    truth = ngram_jaccard_pairs(
        documents, k, threshold_num, threshold_den, max_df
    ).select("doc_a", "doc_b", F.lit(True).alias("is_true"))
    return (
        cand.join(truth, ["doc_a", "doc_b"], "full_outer")
        .select(
            F.coalesce("in_lsh", F.lit(False)).alias("in_lsh"),
            F.coalesce("is_true", F.lit(False)).alias("is_true"),
        )
        .groupBy("in_lsh", "is_true")
        .agg(F.count("*").cast("long").alias("n_pairs"))
    )


def dedup_agreement(documents: DataFrame) -> DataFrame:
    """Agreement matrix between the exact and simhash dup detectors.

    Curation tuning wants to know how often the cheap exact hash and the
    near-dup fingerprint agree before picking thresholds: per document,
    ``exact_dup`` (its md5(text) group has >1 member) and ``simhash_dup``
    (its 64-bit simhash group has >1 member), rolled up to the 2x2 matrix
    (exact implies simhash up to sign-boundary noise; the off-diagonal
    cell simhash-only is the near-dup yield, exact-only should be ~0).

    Scale shape: each detector's dup flag is a count window PARTITIONED BY
    its key (one keyed exchange, group size bounded by the dup family, and
    the expensive simhash aggregation is computed ONCE — a group-count +
    join-back would evaluate it twice), then one join on doc_id and a
    final 4-row aggregation. Every exchange keyed, nothing quadratic.
    """
    from pyspark.sql import Window

    exflag = documents.select("doc_id", F.md5("text").alias("fp")).select(
        "doc_id",
        (F.count("*").over(Window.partitionBy("fp")) > 1).alias("exact_dup"),
    )
    shflag = simhash(documents, bits=64).select(
        "doc_id",
        (
            F.count("*").over(Window.partitionBy("simhash_hi", "simhash_lo")) > 1
        ).alias("simhash_dup"),
    )
    return (
        exflag.join(shflag, "doc_id")
        .groupBy("exact_dup", "simhash_dup")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )


def survivorship(
    documents: DataFrame, num_hashes: int = 128, band_size: int = 8, k: int = 3
) -> DataFrame:
    """(doc_id, cluster_id, keep) — near-dup clusters with a QUALITY-based
    survivor instead of min-id.

    ``neardup_clusters`` keeps the minimal doc_id per component — fine for
    determinism, wrong for curation: among near-identical copies you want
    the best one (mirror pages differ in boilerplate, truncation, ads).
    Survivor = max over the component of the key
    (stop_bp, n_tokens, -doc_id): the stopword-ratio basis point score
    from quality_score (higher = more natural prose), token count as the
    truncation tie-break, and doc_id DESCENDING last so the order is
    total (the -doc_id trick keeps the whole key a single max() — exact
    integers, no floats).

    Scale shape: the component labeling is the existing LSH -> connected-
    components path; the survivor pick is ONE max(struct) aggregation
    keyed on cluster_id (group size = family size) joined back on
    cluster_id. Singletons never enter the aggregation — they are their
    own survivor by construction.
    """
    from crawler_spark.pipeline.textstats import quality_score

    clusters = neardup_clusters(documents, num_hashes, band_size, k)
    qual = quality_score(documents).select("doc_id", "stop_bp", "n_tokens")
    labeled = clusters.select("doc_id", "cluster_id").join(qual, "doc_id")
    fam = (
        labeled.groupBy("cluster_id")
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") > 1)
        .select("cluster_id")
    )
    best = (
        labeled.join(fam, "cluster_id")
        .groupBy("cluster_id")
        .agg(
            F.max(
                F.struct(
                    F.col("stop_bp"),
                    F.col("n_tokens"),
                    (-F.col("doc_id")).alias("neg_id"),
                )
            ).alias("m")
        )
        .select("cluster_id", (-F.col("m.neg_id")).alias("surv"))
    )
    return (
        labeled.select("doc_id", "cluster_id")
        .join(best, "cluster_id", "left")
        .select(
            "doc_id",
            "cluster_id",
            F.when(F.col("surv").isNull(), F.lit(True))
            .otherwise(F.col("doc_id") == F.col("surv"))
            .alias("keep"),
        )
    )


def simhash_hamming_pairs(
    documents: DataFrame, max_dist: int = 3, n_bands: int = 4
) -> DataFrame:
    """(doc_a, doc_b, dist): document pairs whose 64-bit simhash Hamming
    distance is <= max_dist — Manku/Jain/Sarma's web-crawl near-dup
    detection (WWW'07), the algorithm Google's crawler used for exactly
    this table shape.

    Pigeonhole principle: split the fingerprint into ``n_bands`` bit
    bands; any pair within distance d < n_bands must agree EXACTLY on at
    least one band. So candidates = pairs sharing any band value (an
    equi-join per band — never all-pairs), then one exact popcount verify
    (bit_count(xor) over the two 32-bit halves) keeps true near-dups.
    With the default 4 bands of 16 bits the guarantee covers d <= 3.

    Scale shape: the band join is keyed on (band, 16-bit value); band
    buckets are ~N/2^16 for random fingerprints — hot buckets mean real
    near-dup families (the thing being found), same story as minhash LSH
    buckets; dedup of candidate pairs found via several bands happens
    BEFORE the verify so popcount runs once per pair. Everything
    whole-stage codegen (shiftright/AND/xor/bit_count) — no Python.
    """
    if not 1 <= max_dist < n_bands:
        raise ValueError("need 1 <= max_dist < n_bands (pigeonhole guarantee)")
    fp = simhash(documents, bits=64)
    width = 64 // n_bands

    def band_val(b: int):
        # bands 0..(n_bands//2 - 1) come from the lo half, the rest from hi
        half, off = ("simhash_lo", b * width) if b * width < 32 else (
            "simhash_hi", b * width - 32
        )
        return F.shiftright(F.col(half), off).bitwiseAND(F.lit((1 << width) - 1))

    bands = fp.select(
        "doc_id",
        "simhash_hi",
        "simhash_lo",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), band_val(b).alias("bv"))
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "simhash_hi", "simhash_lo", "bk.band", "bk.bv")
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(b, ["band", "bv"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash_hi").alias("ah"),
            F.col("a.simhash_lo").alias("al"),
            F.col("b.simhash_hi").alias("bh"),
            F.col("b.simhash_lo").alias("bl"),
        )
        .distinct()
    )
    dist = F.expr("bit_count(ah ^ bh) + bit_count(al ^ bl)")
    return (
        cand.withColumn("dist", dist.cast("int"))
        .filter(F.col("dist") <= max_dist)
        .select("doc_a", "doc_b", "dist")
    )


def dedup_cascade(
    documents: DataFrame, num_hashes: int = 128, band_size: int = 8, k: int = 3
) -> DataFrame:
    """(stage, n_in, n_removed, n_out): per-stage accounting of the
    production dedup cascade — exact (content-hash) first, then
    minhash-LSH near-dup components over the exact survivors. The cheap
    stage runs first so the expensive one sees a smaller corpus; the
    report is what a curation run publishes next to its dataset card
    (how much was removed, by which detector — and the removal totals
    compose: n_out of one stage is n_in of the next).

    Shape: the stage populations are 1-row aggregates composed by
    crossJoin (no collect); the near-dup stage reuses neardup_clusters
    unchanged on the semi-joined survivor corpus, so its scale story
    (banded bucket join, component closure) is inherited, not rebuilt.
    """
    ex = exact_dedup(documents)
    n0 = documents.agg(F.count("*").cast("long").alias("n0"))
    n1 = ex.agg(F.count("*").cast("long").alias("n1"))
    survivors = documents.join(
        ex.select(F.col("keep_id").alias("doc_id")), "doc_id", "left_semi"
    )
    n2 = (
        neardup_clusters(survivors, num_hashes, band_size, k)
        .filter(F.col("keep"))
        .agg(F.count("*").cast("long").alias("n2"))
    )
    base = n0.crossJoin(n1).crossJoin(n2)
    exact_row = base.select(
        F.lit("1_exact").alias("stage"),
        F.col("n0").alias("n_in"),
        (F.col("n0") - F.col("n1")).alias("n_removed"),
        F.col("n1").alias("n_out"),
    )
    near_row = base.select(
        F.lit("2_near_dup").alias("stage"),
        F.col("n1").alias("n_in"),
        (F.col("n1") - F.col("n2")).alias("n_removed"),
        F.col("n2").alias("n_out"),
    )
    return exact_row.unionByName(near_row)


def lsh_band_sweep(
    documents: DataFrame,
    configs: tuple[tuple[int, int], ...] = ((6, 3), (9, 3), (12, 4)),
    k: int = 3,
    threshold_num: int = 1,
    threshold_den: int = 5,
    max_df: int = 100,
) -> DataFrame:
    """(config, in_lsh, is_true, n_pairs): the banding-parameter TUNING
    TABLE — lsh_pair_quality's confusion matrix swept over several
    (num_hashes, band_size) configurations against the one exact-Jaccard
    truth set, so precision/recall per config read off one result and the
    (bands, rows) S-curve trade is measured instead of guessed.

    Shape: the expensive inputs are config-INDEPENDENT and computed once —
    the exact-Jaccard truth set (one df-capped inverted-index join) and
    the minhash signature table built at max(num_hashes) (mh_i is the
    same hash family for every config, so smaller configs read a column
    prefix of the one table). Both are localCheckpoint-materialized, so
    each config adds only its band explode + bucket self-join + a
    <=4-row compare. len(configs) signature passes collapse to one.
    """
    max_hashes = max(h for h, _ in configs)
    sig = minhash_signatures(documents, max_hashes, k).localCheckpoint()
    truth = (
        ngram_jaccard_pairs(documents, k, threshold_num, threshold_den, max_df)
        .select("doc_a", "doc_b", F.lit(True).alias("is_true"))
        .localCheckpoint()
    )
    frames = []
    for num_hashes, band_size in configs:
        bands = _band_keys_from_sig(sig, num_hashes, band_size)
        a = bands.alias("a")
        b = bands.alias("b")
        cand = (
            a.join(b, ["band", "band_key"])
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
            .distinct()
            .withColumn("in_lsh", F.lit(True))
        )
        m = (
            cand.join(truth, ["doc_a", "doc_b"], "full_outer")
            .select(
                F.coalesce("in_lsh", F.lit(False)).alias("in_lsh"),
                F.coalesce("is_true", F.lit(False)).alias("is_true"),
            )
            .groupBy("in_lsh", "is_true")
            .agg(F.count("*").cast("long").alias("n_pairs"))
        )
        frames.append(
            m.select(
                F.lit(f"h{num_hashes}_b{band_size}").alias("config"),
                "in_lsh", "is_true", "n_pairs",
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def cluster_size_histogram(
    documents: DataFrame, num_hashes: int = 128, band_size: int = 8, k: int = 3
) -> DataFrame:
    """(cluster_size, n_clusters, n_docs): the near-dup family-size
    distribution — the dedup health report (a fat head of large families
    means boilerplate or a mirror site; a long singleton tail means the
    banding is too strict). Singletons are counted too, so the histogram
    partitions the whole corpus and n_docs sums back to it.

    Shape: neardup_clusters unchanged, then two tiny keyed aggregations
    (cluster_id -> size, size -> count) — nothing beyond the dedup pass
    it diagnoses.
    """
    labels = neardup_clusters(documents, num_hashes, band_size, k)
    sizes = labels.groupBy("cluster_id").agg(F.count("*").cast("long").alias("sz"))
    return (
        sizes.groupBy(F.col("sz").alias("cluster_size"))
        .agg(F.count("*").cast("long").alias("n_clusters"))
        .withColumn("n_docs", (F.col("cluster_size") * F.col("n_clusters")).cast("long"))
    )
