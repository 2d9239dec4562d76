"""Stateful streaming URL-seen dedup (``applyInPandasWithState``).

Streaming analog of the reference's visited map
(engine/schedule.go:412-429): a continuous stream of discovered URLs is
reduced to first-ever occurrences, with the seen-set held as Spark-managed
keyed state instead of a driver-side ``map[string]bool``.

Sharding: state is keyed by ``shard = pmod(xxhash64(key), n_shards)`` so the
seen-set is spread across ``n_shards`` state partitions — the same sharding
story as the batch Bloom shards (operators/dedup.py). Each shard's state is
the concatenation of its 16-byte md5 keys (fixed width -> O(1) slicing, no
pickling); production state store is RocksDB, so per-shard state never
transits the driver.

Emission within a micro-batch keeps the first arrival of each new key
(batch order), matching the reference's mark-before-fetch race winner
(engine/schedule.go:343-351).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
)

_STATE_SCHEMA = StructType([StructField("blob", BinaryType(), True)])
_OUT_SCHEMA = StructType(
    [
        StructField("key", StringType(), False),
        StructField("url", StringType(), False),
    ]
)


def _dedup_shard(
    shard_key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    blob: bytes = state.get[0] if state.exists else b""
    seen = {blob[i : i + 16] for i in range(0, len(blob), 16)}
    for pdf in pdfs:
        raw = pdf["key"].map(bytes.fromhex)
        fresh_mask = []
        for kb in raw:
            if kb in seen:
                fresh_mask.append(False)
            else:
                seen.add(kb)
                fresh_mask.append(True)
        out = pdf.loc[fresh_mask, ["key", "url"]]
        if len(out):
            yield out
    state.update((b"".join(sorted(seen)),))


def streaming_seen_dedup(urls: DataFrame, n_shards: int = 64) -> DataFrame:
    """First-ever occurrence per ``key`` over an unbounded URL stream.

    ``urls`` is a streaming DataFrame with (key: md5-hex string, url). The
    output stream carries exactly the rows whose key was never seen in any
    earlier micro-batch (nor earlier in the same batch).
    """
    shard = F.pmod(F.xxhash64("key"), F.lit(n_shards)).alias("shard")
    return (
        urls.select(shard, "key", "url")
        .groupBy("shard")
        .applyInPandasWithState(
            _dedup_shard,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
