"""Dense, deterministic FIFO sequence assignment without a global sort.

The frontier's FIFO tie-break needs a total order consistent with discovery
order: new links ranked by (parent_seq, match_idx) (SURVEY.md §7.3 hard
part 3). A single un-partitioned window would serialize the whole delta
through one partition (WindowExec "No Partition Defined"); instead a
two-level prefix sum:

1. range-repartition on the (unique, total) order key and sort within
   partitions — a fully parallel shuffle that makes partition p hold
   exactly the p-th contiguous slice of the global order;
2. ``monotonically_increasing_id`` encodes (partition_id << 33 | local_row)
   for free — no window, no per-partition sort beyond step 1;
3. per-partition counts (≤ #partitions rows to the driver) → cumulative
   offsets, broadcast-joined back:
   ``seq = base + offset[pid] + local_row + 1``.

Exactly the dense ranks of ORDER BY (order key), with the only serial work
being a #partitions-row cumulative sum on the driver. Correctness does not
depend on the sampled range bounds (any non-overlapping ordered
partitioning yields the same global ranks because the key is unique).

The prepare/finalize split lets the engine fuse the per-partition counts
into its single round-accounting job (the counts are just rows in a shared
union-aggregate) instead of paying one barrier per seq assignment:

    prep = prepare_dense_seq(df, cols)        # cached, still lazy
    ... count rows of pid_tags(prep, 'lpid') in the accounting job ...
    out = finalize_dense_seq(prep, sizes, base)

``assign_link_seqs`` / ``assign_retry_seqs`` wrap the pair for standalone
use (tests, non-fused callers) at the cost of one collect each.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_LOCAL_MASK = (1 << 33) - 1  # monotonically_increasing_id: pid << 33 | row


def prepare_dense_seq(df: DataFrame, order_cols: list[str]) -> DataFrame:
    """Range-partition + local sort + encoded (pid, row) ids; cached, lazy.

    order_cols must form a total (duplicate-free) order.
    """
    spark = df.sparkSession
    n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    return (
        df.repartitionByRange(n, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_mid", F.monotonically_increasing_id())
        .cache()
    )


def pid_col() -> F.Column:
    return F.shiftright("_mid", 33)


def finalize_dense_seq(
    with_id: DataFrame, sizes: dict[int, int], base_seq: int
) -> DataFrame:
    """Attach the dense ``seq`` given per-partition row counts.

    ``sizes``: {partition_id: row_count} as counted from ``with_id`` (e.g.
    via the engine's fused accounting job, or count_partition_sizes below).
    """
    spark = with_id.sparkSession
    offsets, acc = [], 0
    for pid in sorted(sizes):
        offsets.append((int(pid), acc))
        acc += int(sizes[pid])
    if not offsets:
        offsets = [(0, 0)]
    off_df = F.broadcast(spark.createDataFrame(offsets, "_pid long, _off long"))
    out = (
        with_id.withColumn("_pid", pid_col())
        .join(off_df, "_pid")
        .withColumn(
            "seq",
            F.lit(base_seq)
            + F.col("_off")
            + F.col("_mid").bitwiseAND(F.lit(_LOCAL_MASK))
            + 1,
        )
        .drop("_pid", "_mid", "_off")
    )
    out._ranked = with_id  # for caller-side unpersist
    out._total = acc  # row count, free by-product of the offsets pass
    return out


def count_partition_sizes(with_id: DataFrame) -> dict[int, int]:
    rows = with_id.groupBy(pid_col().alias("_pid")).agg(
        F.count("*").alias("_n")
    ).collect()
    return {int(r["_pid"]): int(r["_n"]) for r in rows}


def _dense_seq(df: DataFrame, order_cols: list[str], base_seq: int) -> DataFrame:
    with_id = prepare_dense_seq(df, order_cols)
    return finalize_dense_seq(with_id, count_partition_sizes(with_id), base_seq)


def assign_link_seqs(links: DataFrame, base_seq: int) -> DataFrame:
    """links must carry parent_seq + match_idx; returns with dense `seq` col.

    (parent_seq, match_idx) is unique per link row (match_idx is the
    within-parent match ordinal; robots filtering may leave gaps but never
    duplicates), so the discovery order is total.
    """
    return _dense_seq(links, ["parent_seq", "match_idx"], base_seq)


def assign_retry_seqs(retries: DataFrame, base_seq: int) -> DataFrame:
    """Retries re-enqueue after the round's links, ordered by original seq
    (unique per frontier row)."""
    slim = retries.withColumnRenamed("seq", "_oseq")
    out = _dense_seq(slim, ["_oseq"], base_seq)
    dropped = out.drop("_oseq")
    dropped._ranked = out._ranked  # DataFrame ops don't carry attributes over
    dropped._total = out._total
    return dropped
