"""Streaming HLL-register cardinality sketch (``applyInPandasWithState``).

Streaming analog of ``pipeline/textstats.hll_registers``: an unbounded
stream of pre-hashed values folds into the m-register table of an
HLL-style distinct-count sketch. State is ONE integer per register (the
running max rank) — the smallest possible stateful-streaming footprint,
and the canonical example of a sketch whose streaming and batch results
are provably identical: each register's value is ``max`` over the set of
observed ranks, which is order- and batching-independent. That equality
IS the driver gate (`stream_hll` vs the batch SQL oracle).

Emission: a register row is emitted only when its max rank INCREASES
(at most ``bits_w + 1`` emissions per register ever, regardless of stream
length); the consumer folds the emitted log with a trivial
``groupBy(register).max`` — the same merge rule the batch sketch uses
across shards, so sink-side folding is not a correctness workaround but
the sketch's own merge operator.

The hash → (register, rank) split runs JVM-side before the stateful
operator, so Python sees only (register, rank) int pairs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import IntegerType, StructField, StructType

_STATE_SCHEMA = StructType([StructField("max_rank", IntegerType(), True)])
_OUT_SCHEMA = StructType(
    [
        StructField("register", IntegerType(), False),
        StructField("max_rank", IntegerType(), False),
    ]
)


def _fold_register(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    cur = state.get[0] if state.exists else 0
    best = cur
    for pdf in pdfs:
        if len(pdf):
            m = int(pdf["rank"].max())
            if m > best:
                best = m
    if best > cur or not state.exists:
        state.update((best,))
    if best > cur:
        yield pd.DataFrame({"register": [key[0]], "max_rank": [best]})


def streaming_hll(hashes: DataFrame, m: int = 256) -> DataFrame:
    """Fold a streaming DataFrame of 60-bit hashes (column ``h``, BIGINT —
    produced with the same md5-conv expression as the batch sketch) into
    the m-register HLL table. Emits (register, max_rank) rows on register
    increase; fold the sink with groupBy(register).max(max_rank)."""
    if m & (m - 1):
        raise ValueError("m must be a power of two")
    bits_w = 60 - m.bit_length() + 1
    reg = (F.col("h") % m).cast("int").alias("register")
    rank = (
        F.when(F.expr(f"h div {m}") == 0, F.lit(bits_w + 1))
        .otherwise(F.lit(bits_w + 1) - F.length(F.bin(F.expr(f"h div {m}"))))
        .cast("int")
        .alias("rank")
    )
    return (
        hashes.select(reg, rank)
        .groupBy("register")
        .applyInPandasWithState(
            _fold_register,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
