"""Streaming layer tests (SURVEY.md §5.2): windowed metrics stream/batch
parity and stateful streaming URL-seen dedup across micro-batches."""

from __future__ import annotations

import hashlib
import os
from datetime import datetime

import pandas as pd

from crawler_spark.streaming.dedup import streaming_seen_dedup
from crawler_spark.streaming.metrics import FETCH_EVENT, windowed_fetch_metrics


def _k(url: str) -> str:
    return hashlib.md5((url + "GET").encode()).hexdigest()


def test_windowed_metrics_stream_batch_parity(spark, tmpdir_):
    rows = []
    for m in range(5):
        for i in range(10):
            rows.append(
                (
                    datetime(2026, 1, 1, 0, m, i),
                    "book" if i % 2 == 0 else "group",
                    f"h{i % 3}.example.com",
                    i % 4 != 0,
                    100 + i,
                    10 * i,
                )
            )
    src = f"{tmpdir_}/events"
    spark.createDataFrame(rows, FETCH_EVENT).write.parquet(src)

    batch = windowed_fetch_metrics(spark.read.parquet(src), window_s=60)
    expect = sorted(map(tuple, batch.collect()))

    stream = spark.readStream.schema(FETCH_EVENT).parquet(src)
    q = (
        windowed_fetch_metrics(stream, window_s=60, watermark_s=120)
        .writeStream.format("memory")
        .queryName("winmetrics")
        .outputMode("complete")
        .option("checkpointLocation", f"{tmpdir_}/ckpt_m")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.sql("SELECT * FROM winmetrics").collect()))
    assert got == expect
    assert len(got) > 0


def test_streaming_dedup_exactly_once_across_batches(spark, tmpdir_):
    src = f"{tmpdir_}/urls"
    os.makedirs(src)
    f1 = [("http://a.com/1",), ("http://a.com/2",), ("http://a.com/1",)]
    f2 = [("http://a.com/2",), ("http://a.com/3",), ("http://a.com/3",)]
    for name, rows in (("f1", f1), ("f2", f2)):
        pdf = pd.DataFrame({"url": [r[0] for r in rows]})
        pdf["key"] = pdf["url"].map(_k)
        spark.createDataFrame(pdf[["key", "url"]]).coalesce(1).write.parquet(
            f"{src}/{name}.parquet"
        )

    stream = (
        spark.readStream.schema("key string, url string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*.parquet")
    )
    q = (
        streaming_seen_dedup(stream, n_shards=8)
        .writeStream.format("memory")
        .queryName("dedupout")
        .outputMode("append")
        .option("checkpointLocation", f"{tmpdir_}/ckpt_d")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT key, url FROM dedupout").collect()
    urls = sorted(r.url for r in out)
    # exactly one emission per distinct URL, across micro-batch boundaries
    assert urls == ["http://a.com/1", "http://a.com/2", "http://a.com/3"]
    assert all(r.key == _k(r.url) for r in out)


def test_streaming_rate_limit_state_carries_across_batches(spark, tmpdir_):
    from crawler_spark.streaming.ratelimit import streaming_rate_limit

    src = f"{tmpdir_}/req"
    os.makedirs(src)
    # batch 1: three window-0 requests for host A exhaust its cap
    f1 = [("A", 1, 0), ("A", 2, 10), ("A", 3, 20)]
    # batch 2: two more window-0 requests (must be denied: state carries
    # used=3 across the batch boundary) + one window-1 request (fresh cap)
    f2 = [("A", 4, 30), ("A", 5, 40), ("A", 6, 650)]
    import time as _time

    for name, rows in (("f1", f1), ("f2", f2)):
        spark.createDataFrame(
            rows, "host string, req_id long, epoch_s long"
        ).coalesce(1).write.parquet(f"{src}/{name}.parquet")
        _time.sleep(1.1)  # distinct mtimes pin micro-batch order f1 -> f2

    stream = (
        spark.readStream.schema("host string, req_id long, epoch_s long")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*.parquet")
    )
    q = (
        streaming_rate_limit(stream, cap=3, window_s=600)
        .writeStream.format("memory")
        .queryName("rlout")
        .outputMode("append")
        .option("checkpointLocation", f"{tmpdir_}/ckpt_rl")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.req_id: (r.win_start, r.allowed)
        for r in spark.sql("SELECT * FROM rlout").collect()
    }
    assert got == {
        1: (0, True),
        2: (0, True),
        3: (0, True),
        4: (0, False),
        5: (0, False),
        6: (600, True),
    }


def test_streaming_funnel_state_carries_across_batches(spark, tmpdir_):
    from crawler_spark.streaming.funnel import streaming_funnel

    src = f"{tmpdir_}/fev"
    os.makedirs(src)
    # batch 1: user 7 views; user 8 clicks (no prior view -> no progress)
    f1 = [(7, 1, "view", 100), (8, 2, "click", 100)]
    # batch 2: user 7 clicks then purchases (completes the funnel; the
    # qualifying view lives in batch 1's state); user 8 views (step 1 only
    # — the batch-1 click must NOT retroactively count)
    f2 = [(7, 3, "click", 200), (7, 4, "purchase", 300), (8, 5, "view", 200)]
    import time as _time

    for name, rows in (("f1", f1), ("f2", f2)):
        spark.createDataFrame(
            rows, "user_id long, event_id long, event_type string, ts_us long"
        ).coalesce(1).write.parquet(f"{src}/{name}.parquet")
        _time.sleep(1.1)

    stream = (
        spark.readStream.schema(
            "user_id long, event_id long, event_type string, ts_us long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*.parquet")
    )
    q = (
        streaming_funnel(stream)
        .writeStream.format("memory")
        .queryName("fnout")
        .outputMode("append")
        .option("checkpointLocation", f"{tmpdir_}/ckpt_fn")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM fnout").collect()
    # one row per user per batch they appeared in
    per_batch = {}
    for r in rows:
        per_batch.setdefault(r.user_id, []).append(
            (r.reached, r.t1_us, r.t2_us, r.t3_us)
        )
    assert per_batch[7] == [(1, 100, None, None), (3, 100, 200, 300)]
    assert per_batch[8] == [(0, None, None, None), (1, 200, None, None)]


def test_streaming_sessionize_state_carries_across_batches(spark, tmpdir_):
    from crawler_spark.streaming.sessionize import streaming_sessionize

    src = f"{tmpdir_}/sev"
    os.makedirs(src)
    us = 1_000_000
    # batch 1: user 7 two events 10s apart (one session); user 8 one event
    s1 = [(7, 1, 0 * us), (7, 2, 10 * us), (8, 3, 0 * us)]
    # batch 2: user 7 continues the session (gap 20s < 1800s) then breaks
    # it (gap 5000s); user 8 breaks immediately (gap 3600s)
    s2 = [(7, 4, 30 * us), (7, 5, 5030 * us), (8, 6, 3600 * us)]
    import time as _time

    for name, rows in (("s1", s1), ("s2", s2)):
        spark.createDataFrame(
            rows, "user_id long, event_id long, ts_us long"
        ).coalesce(1).write.parquet(f"{src}/{name}.parquet")
        _time.sleep(1.1)

    stream = (
        spark.readStream.schema("user_id long, event_id long, ts_us long")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*.parquet")
    )
    q = (
        streaming_sessionize(stream, gap_s=1800)
        .writeStream.format("memory")
        .queryName("sessout")
        .outputMode("append")
        .option("checkpointLocation", f"{tmpdir_}/ckpt_sess")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM sessout").collect()
    per_user = {}
    for r in rows:
        per_user.setdefault(r.user_id, []).append((r.sess_id, r.n_events))
    # user 7: batch 1 emits session 1 @ 2 events; batch 2 re-emits session
    # 1 at its final count 3 (cross-batch continuation) AND the new
    # session 2 @ 1 event
    assert sorted(per_user[7]) == [(1, 2), (1, 3), (2, 1)]
    # user 8: session 1 @ 1, then the 3600s gap opens session 2
    assert sorted(per_user[8]) == [(1, 1), (2, 1)]


def test_streaming_hll_matches_batch_across_batches(spark, tmpdir_):
    from crawler_spark.pipeline.textstats import hll_registers
    from crawler_spark.streaming.hll import streaming_hll

    src = f"{tmpdir_}/hll"
    os.makedirs(src)
    vals = list(range(200))
    batch_df = spark.createDataFrame([(v,) for v in vals], "user_id long")
    h_expr = (
        "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 15), 16, 10) AS BIGINT)"
    )
    hashes = batch_df.selectExpr(f"{h_expr} AS h")
    # split the same values into two files -> two micro-batches
    half = len(vals) // 2
    for name, lo, hi in (("f1", 0, half), ("f2", half, len(vals))):
        spark.createDataFrame([(v,) for v in vals[lo:hi]], "user_id long").selectExpr(
            f"{h_expr} AS h"
        ).coalesce(1).write.parquet(f"{src}/{name}.parquet")

    stream = (
        spark.readStream.schema("h long")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*.parquet")
    )
    q = (
        streaming_hll(stream, m=64)
        .writeStream.format("memory")
        .queryName("hllout")
        .outputMode("append")
        .option("checkpointLocation", f"{tmpdir_}/ckpt_h")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    folded = {
        r["register"]: r["mx"]
        for r in spark.sql(
            "SELECT register, max(max_rank) AS mx FROM hllout GROUP BY register"
        ).collect()
    }
    want = {
        r["register"]: r["max_rank"]
        for r in hll_registers(batch_df, "user_id", m=64).collect()
    }
    # stream fold == batch sketch, across micro-batch boundaries
    assert folded == want


def test_streaming_hot_keys_once_only_across_batches(spark, tmpdir_):
    """A key emits exactly once — on the micro-batch where its cumulative
    count first crosses the threshold — and the emitted key set equals the
    batch HAVING-count filter regardless of how rows split into batches."""
    from crawler_spark.streaming.hotkeys import streaming_hot_keys

    src = f"{tmpdir_}/hot"
    os.makedirs(src)
    # a: 2+2 rows (crosses in batch 2), b: 3+0 (crosses in batch 1),
    # c: 1+1 (never crosses), d: 0+3 (crosses in batch 2)
    b1 = [("a",)] * 2 + [("b",)] * 3 + [("c",)]
    b2 = [("a",)] * 2 + [("c",)] + [("d",)] * 3
    for name, rows in (("f1", b1), ("f2", b2)):
        spark.createDataFrame(rows, "key string").coalesce(1).write.parquet(
            f"{src}/{name}.parquet"
        )
    stream = (
        spark.readStream.schema("key string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*.parquet")
    )
    q = (
        streaming_hot_keys(stream, threshold=3)
        .writeStream.format("memory")
        .queryName("hotout")
        .outputMode("append")
        .option("checkpointLocation", f"{tmpdir_}/ckpt_hot")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT key, n_at_cross FROM hotout").collect()
    got = {r["key"]: r["n_at_cross"] for r in rows}
    assert len(rows) == len(got), "a key emitted more than once"
    # b crossed inside batch 1 at 3; a and d crossed at their batch-2 totals
    assert got == {"a": 4, "b": 3, "d": 3}
