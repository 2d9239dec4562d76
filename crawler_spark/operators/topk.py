"""Scalable budgeted top-k per group (the priority-queue pop).

Reproduces the reference's priority-first FIFO dispatch
(engine/schedule.go:248-290) as a *budgeted wave pop*: for each group
(task, or host) take the first ``k`` rows ordered by (-priority, seq).

Scale design — the naive ``Window.partitionBy(group)`` funnels each
group's entire candidate set through one partition; for a hot host with a
10^5-row wave that is a single-task sort (measured ~10-20s serial per
round). Three-way split instead:

1. per-group counts (one parallel aggregate, broadcast back);
2. groups whose candidate count fits their budget PASS THROUGH with no
   window and no shuffle — the common case for fat steady-state waves;
3. only groups that actually need cutting are ranked, and those are first
   pruned per physical partition to their own budget (partition-parallel),
   so the single-partition global rank sees at most
   budget x num_partitions rows — bounded by the politeness budget, not
   the frontier.

All three paths are deterministic and together equal the global top-k.
The counts broadcast is O(#distinct groups); with extreme group
cardinality (10^7+ hosts) the aggregate itself stays parallel and only
the broadcast needs revisiting (e.g. pre-bucketed budgets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _order_cols():
    # priority-class-first, FIFO within class (engine/schedule.go:254-264)
    return [F.col("priority").desc(), F.col("seq").asc()]


def budgeted_topk(
    df: DataFrame,
    group_col: str,
    budgets: dict[str, int],
    default_budget: int,
    local_prune: bool = True,
) -> DataFrame:
    """Rows of df ranked within group_col by (-priority, seq); keep rank <= budget(group)."""
    budget_expr = F.lit(default_budget)
    for g, k in budgets.items():
        budget_expr = F.when(F.col(group_col) == F.lit(g), F.lit(k)).otherwise(budget_expr)

    counts = df.groupBy(group_col).agg(F.count("*").alias("_gn"))
    tagged = df.join(F.broadcast(counts), group_col).withColumn("_gb", budget_expr)

    passed = tagged.filter(F.col("_gn") <= F.col("_gb")).drop("_gn", "_gb")
    to_cut = tagged.filter(F.col("_gn") > F.col("_gb")).drop("_gn")
    if local_prune:
        local = Window.partitionBy(group_col, F.spark_partition_id()).orderBy(*_order_cols())
        to_cut = (
            to_cut.withColumn("_lrank", F.row_number().over(local))
            .filter(F.col("_lrank") <= F.col("_gb"))
            .drop("_lrank")
        )
    w = Window.partitionBy(group_col).orderBy(*_order_cols())
    cut = (
        to_cut.withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= F.col("_gb"))
        .drop("_rank", "_gb")
    )
    return passed.unionByName(cut)
