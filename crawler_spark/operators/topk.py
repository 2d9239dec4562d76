"""Scalable budgeted top-k per group (the priority-queue pop).

Reproduces the reference's priority-first FIFO dispatch
(engine/schedule.go:248-290) as a *budgeted wave pop*: for each group
(task, or host) take the first ``k`` rows ordered by (-priority, seq).

Scale design: a plain ``Window.partitionBy(group)`` funnels each group's
entire candidate set through one partition — with a handful of tasks over a
10^10-row frontier that is THE bottleneck. Since k (the politeness budget)
is small, we first prune each *physical partition* to its local top-k
(partition-parallel), then rank globally over at most k × num_partitions
survivors. Both passes are deterministic; the result is exactly the global
top-k.
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
    """Rows of df ranked within group_col by (-priority, seq); keep rank <= budget(group).

    budgets maps group value -> k. Returns df columns + ``_rank``.
    """
    max_k = max(list(budgets.values()) + [default_budget]) if budgets else default_budget
    out = df
    if local_prune and max_k < (1 << 30):
        local = Window.partitionBy(group_col, F.spark_partition_id()).orderBy(*_order_cols())
        out = (
            out.withColumn("_lrank", F.row_number().over(local))
            .filter(F.col("_lrank") <= F.lit(max_k))
            .drop("_lrank")
        )
    w = Window.partitionBy(group_col).orderBy(*_order_cols())
    out = out.withColumn("_rank", F.row_number().over(w))
    budget_expr = F.lit(default_budget)
    for g, k in budgets.items():
        budget_expr = F.when(F.col(group_col) == F.lit(g), F.lit(k)).otherwise(budget_expr)
    return out.filter(F.col("_rank") <= budget_expr).drop("_rank")
