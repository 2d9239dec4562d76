"""Dense, deterministic FIFO sequence assignment without a global sort.

The frontier's FIFO tie-break needs a total order consistent with discovery
order: new links ranked by (parent_seq, match_idx) (SURVEY.md §7.3 hard
part 3). A single un-partitioned window would serialize the whole delta
through one partition; instead:

1. rank links *within* each parent by match_idx (partitioned window —
   parallel; match_idx may have gaps after robots filtering),
2. per-parent counts -> cumulative offsets via one tiny window over only
   |wave| rows (bounded by the politeness budget, not the frontier),
3. broadcast-join offsets back: seq = base + offset + within_parent_rank.

Exactly the dense ranks of ORDER BY (parent_seq, match_idx), computed with
one small-shuffle pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_link_seqs(links: DataFrame, base_seq: int) -> DataFrame:
    """links must carry parent_seq + match_idx; returns with dense `seq` col.

    ``ranked`` is cached and materialized before the offsets subquery runs:
    the offsets branch is a broadcast-exchange job, and without the eager
    cache it would re-execute the whole upstream fetch+parse+canonicalize
    pipeline a second time. The caller should unpersist ``result._ranked``
    when the round's frontier is committed."""
    w_parent = Window.partitionBy("parent_seq").orderBy("match_idx")
    ranked = links.withColumn("_pr", F.row_number().over(w_parent)).cache()
    ranked.count()  # materialize once
    counts = ranked.groupBy("parent_seq").agg(F.max("_pr").alias("_n"))
    w_cum = Window.orderBy("parent_seq").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn("_off", F.coalesce(F.sum("_n").over(w_cum), F.lit(0)))
    out = (
        ranked.join(F.broadcast(offsets.select("parent_seq", "_off")), "parent_seq")
        .withColumn("seq", F.lit(base_seq) + F.col("_off") + F.col("_pr"))
        .drop("_pr", "_off")
    )
    out._ranked = ranked  # for caller-side unpersist
    return out


def assign_retry_seqs(retries: DataFrame, base_seq: int) -> DataFrame:
    """Retries re-enqueue after the round's links, ordered by original seq.

    The retry set is bounded by the wave (politeness budget), so one small
    window is fine.
    """
    w = Window.orderBy("seq")
    return retries.withColumn("seq", F.lit(base_seq) + F.row_number().over(w))
