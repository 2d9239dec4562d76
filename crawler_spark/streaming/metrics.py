"""Watermarked windowed fetch-metrics over a fetch-event stream.

The batch engine writes one ``metrics`` delta per round (engine.py:
round_metrics; north_rule "per-partition lineage + fetch metrics"). A
production deployment additionally tails the fetch-event firehose for
continuous per-host/per-task dashboards. That is a classic Structured
Streaming shape:

    readStream -> withWatermark(ts) -> groupBy(window(ts), task, host)
               -> agg(counts) -> writeStream

Late fetch events (stragglers from slow executors) are folded in up to the
watermark delay, then their window finalizes — the streaming analog of the
reference's log-line counters (parse/doubanbook/book.go:77,106) with
correct event-time semantics instead of arrival order.

All aggregation is JVM-side (no Python in the stream); state is bounded by
(watermark delay / window) x |hosts| windows, so the query is stable on an
unbounded stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# One row per completed fetch attempt (streaming counterpart of a `fetched`
# wave row — operators/fetch.py).
FETCH_EVENT = StructType(
    [
        StructField("ts", TimestampType(), False),
        StructField("task", StringType(), False),
        StructField("host", StringType(), False),
        StructField("ok", BooleanType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("latency_ms", IntegerType(), False),
    ]
)


def windowed_fetch_metrics(
    events: DataFrame,
    window_s: int = 60,
    watermark_s: int = 120,
) -> DataFrame:
    """Tumbling-window fetch metrics per (window, task, host).

    ``events`` may be a streaming or a batch DataFrame with FETCH_EVENT
    columns — the same plan serves both, which is how the tests establish
    stream/batch parity (a Structured Streaming guarantee we lean on).
    """
    src = events
    if src.isStreaming:
        src = src.withWatermark("ts", f"{watermark_s} seconds")
    return (
        src.groupBy(
            F.window("ts", f"{window_s} seconds").alias("win"),
            "task",
            "host",
        )
        .agg(
            F.count("*").alias("n_fetches"),
            F.sum(F.col("ok").cast("long")).alias("n_ok"),
            F.sum((~F.col("ok")).cast("long")).alias("n_failed"),
            F.sum("n_bytes").alias("sum_bytes"),
            F.max("latency_ms").alias("max_latency_ms"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "task",
            "host",
            "n_fetches",
            "n_ok",
            "n_failed",
            "sum_bytes",
            "max_latency_ms",
        )
    )
