"""Snapshot-per-round commit protocol (checkpoint/resume).

Replaces the reference's etcd control plane (master/master.go) with a
driver-owned table store. Production target is Iceberg (snapshot commits,
MERGE for frontier updates); this sandbox has no Iceberg runtime, so the
same protocol is realized on plain parquet:

- mutable state (``frontier``) is rewritten per round under
  ``rounds/r{N}/frontier`` — the Iceberg equivalent is a MERGE producing a
  new snapshot;
- monotone state (``seen``, ``failed_once``) and outputs (``documents``,
  ``results``, ``order``, ``metrics``, ``failures``, ``lineage``) are
  append-only, written under ``<table>/round=N/`` — Iceberg appends;
- a round is visible only after its ``commit.json`` (written via tmp+rename,
  atomic on POSIX) exists. Resume = max committed round; uncommitted
  round directories are ignored and overwritten, which is exactly
  read-committed snapshot isolation.

The manifest also carries the scalar round state: politeness-bucket carries
(exact integer numerators), max assigned seq, and the running fetch count —
the full resume state besides the tables.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession


class SnapshotStore:
    APPEND_TABLES = (
        "seen",
        "failed_once",
        "documents",
        "results",
        "order",
        "metrics",
        "failures",
        "lineage",
    )

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- commit protocol ----------------------------------------------------

    def _round_dir(self, rnd: int) -> str:
        return os.path.join(self.root, "rounds", f"r{rnd:05d}")

    def _manifest_path(self, rnd: int) -> str:
        return os.path.join(self._round_dir(rnd), "commit.json")

    def latest_round(self) -> int | None:
        base = os.path.join(self.root, "rounds")
        if not os.path.isdir(base):
            return None
        committed = [
            int(d[1:])
            for d in os.listdir(base)
            if d.startswith("r") and os.path.exists(self._manifest_path(int(d[1:])))
        ]
        return max(committed, default=None)

    def manifest(self, rnd: int) -> dict:
        with open(self._manifest_path(rnd)) as f:
            return json.load(f)

    def write_frontier(self, rnd: int, frontier: DataFrame) -> None:
        frontier.write.mode("overwrite").parquet(
            os.path.join(self._round_dir(rnd), "frontier")
        )

    def read_frontier(self, rnd: int) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self._round_dir(rnd), "frontier"))

    def append(self, table: str, rnd: int, df: DataFrame) -> None:
        path = os.path.join(self.root, table, f"round={rnd}")
        if os.path.exists(path):  # crashed, uncommitted attempt — overwrite
            shutil.rmtree(path)
        df.write.mode("overwrite").parquet(path)

    def clean_round(self, rnd: int) -> None:
        """Remove ALL uncommitted leftovers of round ``rnd``.

        Called at round start: a prior crashed attempt may have written any
        subset of the round's table deltas before dying, and the re-run may
        legitimately skip some of those writes (empty deltas are gated) —
        without this sweep a torn ``round=rnd`` directory would stay visible
        to ``read_through`` forever. No-op when the round committed.
        """
        if os.path.exists(self._manifest_path(rnd)):
            return
        for table in self.APPEND_TABLES:
            path = os.path.join(self.root, table, f"round={rnd}")
            if os.path.exists(path):
                shutil.rmtree(path)
        # per-task typed result tables are dynamic (lazy-created on first
        # item, sqlstorage.go:43-61) — sweep whatever exists under typed/
        typed_base = os.path.join(self.root, "typed")
        if os.path.isdir(typed_base):
            for d in os.listdir(typed_base):
                path = os.path.join(typed_base, d, f"round={rnd}")
                if os.path.exists(path):
                    shutil.rmtree(path)
        rd = self._round_dir(rnd)
        if os.path.exists(rd):
            shutil.rmtree(rd)

    def read_through(self, table: str, rnd: int) -> DataFrame | None:
        """Union of committed deltas round<=rnd (read-committed view)."""
        base = os.path.join(self.root, table)
        if not os.path.isdir(base):
            return None
        dirs = [
            os.path.join(base, d)
            for d in os.listdir(base)
            if d.startswith("round=") and int(d.split("=")[1]) <= rnd
        ]
        if not dirs:
            return None
        return self.spark.read.parquet(*dirs)

    def commit(self, rnd: int, manifest: dict) -> None:
        os.makedirs(self._round_dir(rnd), exist_ok=True)
        tmp = self._manifest_path(rnd) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self._manifest_path(rnd))
