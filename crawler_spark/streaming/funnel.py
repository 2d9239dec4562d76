"""Stateful streaming funnel (``applyInPandasWithState``).

Streaming form of the batch funnel (pipeline/events.py funnel): a
continuous per-user event stream is folded into the strictly-ordered
3-step completion state. State per user is four integers — the stage
reached and the first qualifying completion micros of each step — O(1)
bytes per key regardless of event volume, the canonical
sessionization-state shape.

Determinism contract: within a micro-batch rows are sorted by
(ts_us, event_id) before folding, so the fold sees each user's events in
the same total order the batch window frame uses; processing row i after
row j<i is exactly the "strictly earlier in (ts, event_id) order"
qualification rule. Cross-batch the fold assumes per-user event-time
order between batches (an out-of-order straggler arriving after its
successor batch is ignored if a later step already consumed the slot) —
the same in-order-delivery caveat as the rate limiter; the production
hardening is a watermark-delayed source. With a single AvailableNow
batch (how the driver gate runs it) the result equals the batch funnel
exactly, which is the DuckDB oracle.

Emission: one row per user per micro-batch carrying the post-batch state
(append mode) — the incremental dashboard row a funnel monitor upserts.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

_STATE_SCHEMA = StructType(
    [
        StructField("t1", LongType(), True),
        StructField("t2", LongType(), True),
        StructField("t3", LongType(), True),
    ]
)
_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("t1_us", LongType(), True),
        StructField("t2_us", LongType(), True),
        StructField("t3_us", LongType(), True),
        StructField("reached", IntegerType(), False),
    ]
)


def _make_funnel(steps: tuple[str, str, str]):
    s1, s2, s3 = steps

    def _fold_user(
        user_key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        t1, t2, t3 = state.get if state.exists else (None, None, None)
        saw = False
        for pdf in pdfs:
            if not len(pdf):
                continue
            saw = True
            pdf = pdf.sort_values(["ts_us", "event_id"], kind="mergesort")
            # vectorized per batch: first s1; first s2 strictly after it;
            # first s3 strictly after that. "Strictly after" carries across
            # batches because stored t's come from earlier batches.
            for typ, ts in zip(pdf["event_type"], pdf["ts_us"]):
                ts = int(ts)
                if t1 is None:
                    if typ == s1:
                        t1 = ts
                elif t2 is None:
                    if typ == s2 and ts >= t1:
                        # rows are in total order: a same-ts s2 row folding
                        # AFTER the s1 row is strictly later in that order
                        t2 = ts
                elif t3 is None and typ == s3 and ts >= t2:
                    t3 = ts
        if saw:
            reached = 3 if t3 is not None else 2 if t2 is not None else (
                1 if t1 is not None else 0
            )
            yield pd.DataFrame(
                {
                    "user_id": [user_key[0]],
                    "t1_us": pd.array([t1], dtype="Int64"),
                    "t2_us": pd.array([t2], dtype="Int64"),
                    "t3_us": pd.array([t3], dtype="Int64"),
                    "reached": [reached],
                }
            )
        state.update(
            (
                None if t1 is None else int(t1),
                None if t2 is None else int(t2),
                None if t3 is None else int(t3),
            )
        )

    return _fold_user


def streaming_funnel(
    events: DataFrame,
    steps: tuple[str, str, str] = ("view", "click", "purchase"),
) -> DataFrame:
    """Per-user funnel state over an event stream.

    ``events`` is a streaming DataFrame with (user_id: long, event_id:
    long, event_type: string, ts_us: long — event-time micros). Emits one
    row per user per micro-batch with the post-batch completion state.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _make_funnel(steps),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
