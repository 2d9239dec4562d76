"""Stateful streaming per-host politeness rate limiter
(``applyInPandasWithState``).

Streaming analog of the engine's per-host round caps (engine.py derives
floor(round_s*1000/crawl_delay_ms) budgets from the robots table; reference
politeness: limiter.Multi in engine/schedule.go + textcore token-bucket
math): a continuous stream of fetch *requests* is admission-controlled to
at most ``cap`` requests per host per tumbling ``window_s`` window. Rows
are emitted with an ``allowed`` verdict rather than dropped, so the
deferred stream can be re-queued — the streaming form of the batch wave
pop's budget cut (operators/topk.py).

State per host is two integers (current window ordinal, used count) — O(1)
bytes per key, no growth, no timeout sensitivity: an idle host's state is
one stale pair that the next request overwrites. Decisions are computed
vectorized per Arrow batch (ordinal arithmetic + per-window cumcount), and
depend only on the DATA ORDER (epoch_s, req_id), not batch arrival order
within a micro-batch, so a batch SQL replay over the same rows produces
byte-identical verdicts (the driver's DuckDB oracle relies on this).
Cross-batch: state carries (window, used) forward, so a window split
across micro-batches still admits exactly ``cap`` total (pinned by
tests/test_streaming.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
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
        StructField("win", LongType(), True),
        StructField("used", LongType(), True),
    ]
)
_OUT_SCHEMA = StructType(
    [
        StructField("host", StringType(), False),
        StructField("req_id", LongType(), False),
        StructField("epoch_s", LongType(), False),
        StructField("win_start", LongType(), False),
        StructField("allowed", BooleanType(), False),
    ]
)


def _make_limiter(cap: int, window_s: int):
    def _limit_host(
        host_key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        win, used = state.get if state.exists else (-1, 0)
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values(["epoch_s", "req_id"], kind="mergesort")
            w = pdf["epoch_s"] // window_s
            # admitted-so-far offset: carries only into the FIRST window if
            # it continues the stored one; later windows start fresh
            rank = w.groupby(w).cumcount()
            offset = pd.Series(0, index=pdf.index)
            offset[w == win] = used
            allowed = (rank + offset) < cap
            out = pd.DataFrame(
                {
                    "host": pdf["host"],
                    "req_id": pdf["req_id"],
                    "epoch_s": pdf["epoch_s"],
                    "win_start": w * window_s,
                    "allowed": allowed,
                }
            )
            # roll state forward to the last window seen
            last_w = int(w.iloc[-1])
            admitted_last = int(allowed[w == last_w].sum()) + (
                used if last_w == win else 0
            )
            win, used = last_w, min(admitted_last, cap)
            yield out
        state.update((int(win), int(used)))

    return _limit_host


def streaming_rate_limit(
    requests: DataFrame, cap: int = 3, window_s: int = 600
) -> DataFrame:
    """Admission verdicts for a fetch-request stream, ``cap`` per host per
    tumbling ``window_s`` window.

    ``requests`` is a streaming DataFrame with (host: string, req_id: long,
    epoch_s: long). Output carries every input row plus its window start
    and the allowed/deferred verdict.
    """
    return requests.groupBy("host").applyInPandasWithState(
        _make_limiter(cap, window_s),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
