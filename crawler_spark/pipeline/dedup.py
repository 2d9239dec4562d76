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
    """k-token shingles joined by ' '; empty when fewer than k tokens."""
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


def exact_dedup(documents: DataFrame) -> DataFrame:
    """Exact content dedup: one row per distinct body, min doc_id kept."""
    return (
        documents.groupBy(F.md5("text").alias("fp"))
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_docs"))
    )


def doc_shingles(documents: DataFrame, k: int = 3) -> DataFrame:
    toks = tokens_col()
    return (
        documents.select("doc_id", F.explode(shingles_col(toks, k)).alias("shingle"))
        .distinct()
    )


def minhash_signatures(documents: DataFrame, num_hashes: int = 9, k: int = 3) -> DataFrame:
    """doc_id + minhash_i = lexicographic min of md5(i || ':' || shingle)."""
    sh = doc_shingles(documents, k)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(
    documents: DataFrame, num_hashes: int = 9, band_size: int = 3, k: int = 3
) -> DataFrame:
    """Candidate near-dup pairs: docs sharing any LSH band bucket.

    Scale path: the self-join is on (band, band_key) — each bucket is tiny,
    so the join never goes quadratic in the corpus.
    """
    sig = minhash_signatures(documents, num_hashes, k)
    n_bands = num_hashes // band_size
    bands = sig.select(
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
    sh = doc_shingles(documents, k)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    rare = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("_df"))
        .filter(F.col("_df") <= max_df)
        .select("shingle")
    )
    sh = sh.join(rare, "shingle")
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    return (
        inter.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .withColumn("un", F.col("na") + F.col("nb") - F.col("inter"))
        .filter(
            F.lit(threshold_den) * F.col("inter") >= F.lit(threshold_num) * F.col("un")
        )
        .select("doc_a", "doc_b", "inter", "un")
    )
