"""Stateful streaming sessionization (``applyInPandasWithState``).

Streaming form of the batch sessionizer (__spark_entry__.q_events_sessionize:
lag + running sum over a user window): a continuous per-user event stream
is folded into gap-based sessions — a new session starts when the gap
from the previous event exceeds ``gap_s``. State per user is three
integers (last event-time micros, current session ordinal, events in the
current session) — O(1) bytes per key regardless of event volume, the
canonical web-analytics session state.

Determinism contract: within a micro-batch rows are sorted by
(ts_us, event_id) before folding — the same total order the batch window
uses — so one AvailableNow batch reproduces the batch sessionizer
exactly, which is the DuckDB oracle. Cross-batch the fold assumes
per-user event-time order between batches (same in-order-delivery caveat
as the funnel; production hardening is a watermark-delayed source), and
each micro-batch re-emits the current count of every session it touched
— the upsert record a session dashboard applies (a session spanning two
batches emits twice, last write wins downstream).

Scale shape: state store is keyed by user — one shuffle on user_id per
micro-batch, no global ordering anywhere; per-key work is linear in that
user's events in the batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

_STATE_SCHEMA = StructType(
    [
        StructField("last_us", LongType(), True),
        StructField("sess_id", LongType(), True),
        StructField("n_in_sess", LongType(), True),
    ]
)
_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("sess_id", LongType(), False),
        StructField("n_events", LongType(), False),
    ]
)


def _make_sessionizer(gap_s: int):
    gap_us = int(gap_s) * 1_000_000

    def _fold_user(
        user_key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        last_us, sess_id, n_in_sess = (
            state.get if state.exists else (None, 0, 0)
        )
        touched: dict[int, int] = {}
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values(["ts_us", "event_id"], kind="mergesort")
            for ts in pdf["ts_us"]:
                ts = int(ts)
                if last_us is None or ts - last_us > gap_us:
                    sess_id += 1
                    n_in_sess = 0
                n_in_sess += 1
                last_us = ts
                touched[sess_id] = n_in_sess
        if touched:
            yield pd.DataFrame(
                {
                    "user_id": [user_key[0]] * len(touched),
                    "sess_id": list(touched.keys()),
                    "n_events": list(touched.values()),
                }
            )
        state.update(
            (
                None if last_us is None else int(last_us),
                int(sess_id),
                int(n_in_sess),
            )
        )

    return _fold_user


def streaming_sessionize(events: DataFrame, gap_s: int = 1800) -> DataFrame:
    """Per-user gap-based sessions over an event stream.

    ``events`` is a streaming DataFrame with (user_id: long, event_id:
    long, ts_us: long — event-time micros). Emits one row per session
    touched in the micro-batch with its post-batch event count.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _make_sessionizer(gap_s),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
