"""Streaming hot-key threshold alerting (``applyInPandasWithState``).

The crawl-ops shape: a stream of fetches keyed by host, and the scheduler
needs to know THE MOMENT a host's cumulative count crosses its budget —
not at end-of-day rollup. State is ONE long per key (the exact running
count — keyed state stores exist precisely so per-key counters are O(1));
a key emits exactly once, on the batch where its cumulative count first
reaches ``threshold``, and never again (the crossed flag rides in the same
state row, so re-emission is impossible across restarts too).

Parity gate: the emitted key set is provably batching- and
order-independent — a key's total count is a sum, sums are associative,
and "total >= T" does not depend on WHICH batch crossed — so the sink
equals the batch ``GROUP BY key HAVING count(*) >= T`` key set exactly.
That equality is the driver gate (`stream_hot_hosts` vs the batch SQL
oracle); ``n_at_cross`` additionally records the count at the crossing
batch boundary (>= T, < T + that batch's key volume).

Reference analog: the per-host token-bucket budgets (limit/limit.go) gate
the wave BEFORE fetching; this is the monitoring mirror — detect budget
exhaustion from the fetch log itself, one integer of state per host.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType(), True),
        StructField("crossed", BooleanType(), True),
    ]
)
_OUT_SCHEMA = StructType(
    [
        StructField("key", StringType(), False),
        StructField("n_at_cross", LongType(), False),
    ]
)


def _make_counter(threshold: int):
    def _count(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, crossed = state.get if state.exists else (0, False)
        for pdf in pdfs:
            n += len(pdf)
        state.update((n, bool(crossed or n >= threshold)))
        if not crossed and n >= threshold:
            yield pd.DataFrame({"key": [key[0]], "n_at_cross": [n]})

    return _count


def streaming_hot_keys(keyed: DataFrame, threshold: int) -> DataFrame:
    """Emit ``(key, n_at_cross)`` once per key whose cumulative row count
    reaches ``threshold``; input is a streaming DataFrame with a ``key``
    string column. The sink needs no fold — each key appears at most
    once by construction."""
    return keyed.select(F.col("key").cast("string").alias("key")).groupBy(
        "key"
    ).applyInPandasWithState(
        _make_counter(threshold),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
