"""Host DRAM-bandwidth ceiling measurement (the 4->16 scaling exhibit).

The N->4N scaling criterion's supplementary 4->16 pair runs on ONE socket;
BENCH/BASELINE.md argues that pair is DRAM-bandwidth-capped (a real
cluster's 4N executors bring 4N sockets of bandwidth). This script turns
that argument into a measurement with no Spark in the loop: T threads each
stream np.copyto over a 256 MB buffer pair (far beyond LLC, GIL released),
and the aggregate GB/s is reported per thread count. A plateau by 8-16
threads is the socket's bandwidth ceiling; any pipeline stage that streams
page bodies (scan+parse+write moves ~3 GB/round) inherits that cap at 16
threads regardless of engine design, bounding achievable 4->16 efficiency
at plateau_bw / bw(4) / 4.

Usage: python tools/membw.py [threads ...]   (default 1 2 4 8 16 32)
Prints one JSON line: {"threads": {T: GB_s, ...}}
"""

from __future__ import annotations

import json
import sys
import threading
import time

import numpy as np

BUF_MB = 256
SECONDS = 3.0


def worker(ready, start, stop, out, idx):
    src = np.ones(BUF_MB * 1024 * 1024 // 8, dtype=np.int64)
    dst = np.empty_like(src)
    np.copyto(dst, src)  # pre-touch both buffers (lazy-memory VM: first-
    ready.release()      # touch faults must stay outside the timed window)
    start.wait()
    n = 0
    while not stop.is_set():
        np.copyto(dst, src)
        n += 1
    out[idx] = n


def measure(threads: int) -> float:
    ready = threading.Semaphore(0)
    start = threading.Event()
    stop = threading.Event()
    out = [0] * threads
    ts = [
        threading.Thread(target=worker, args=(ready, start, stop, out, i))
        for i in range(threads)
    ]
    for t in ts:
        t.start()
    for _ in ts:
        ready.acquire()
    t0 = time.time()
    start.set()
    time.sleep(SECONDS)
    stop.set()
    for t in ts:
        t.join()
    wall = time.time() - t0
    # each copy reads BUF_MB and writes BUF_MB -> 2x bytes moved
    gb = sum(out) * 2 * BUF_MB / 1024
    return round(gb / wall, 2)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    repeat = 3
    for a in sys.argv[1:]:
        if a.startswith("--repeat="):
            repeat = int(a.split("=")[1])
    counts = [int(a) for a in args] or [1, 2, 4, 8, 16, 32]
    res: dict[str, float] = {}
    # interleave thread counts across repeats (same decorrelation rationale
    # as the scaling protocol) and keep the MAX per count: hypervisor
    # interference only ever subtracts bandwidth, so max is the consistent
    # estimator of the host's true ceiling at that concurrency
    for r in range(repeat):
        for c in counts:
            bw = measure(c)
            res[str(c)] = max(res.get(str(c), 0.0), bw)
            print(f"# rep {r} {c} threads: {bw} GB/s", file=sys.stderr)
    print(json.dumps({"threads": res, "buf_mb": BUF_MB, "repeat": repeat}))


if __name__ == "__main__":
    main()
