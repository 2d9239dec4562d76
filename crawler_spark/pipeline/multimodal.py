"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The crawl produces media spans (kind='media' with a media_ref); a training
pipeline then fetches/decodes those assets. This module implements the
Spark-side plumbing for that at scale — schema, partitioning, Arrow batch
shape — with the actual codec calls stubbed (this container has no
image/audio libraries): ``decode_image`` raises NotImplementedError unless
``fake=True``, in which case a deterministic fake decoder produces stable
metadata so the distributed path is testable end-to-end.

Design for 100 TB: assets are stored as (asset_id, media_ref, payload:binary,
meta struct) partitioned by bucket(asset_id); decode/feature-extract runs
via mapInPandas so one Arrow batch holds many payloads and the decoder
amortizes per-batch setup; frame-sampling emits multiple rows per asset
(iterator-of-batches out), which mapInPandas expresses naturally.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ASSET_SCHEMA = (
    "asset_id string, media_ref string, payload binary, "
    "kind string, declared_w int, declared_h int"
)

DECODED_SCHEMA = (
    "asset_id string, media_ref string, kind string, "
    "width int, height int, n_bytes long, sha1 string, ok boolean"
)

FRAME_SCHEMA = "asset_id string, frame_idx int, t_ms int, frame_sha1 string"


def synth_assets(spark, media_refs: DataFrame) -> DataFrame:
    """Deterministic fake binary payloads for media refs (sandbox stand-in
    for an object-store fetch of the crawled media)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs = pdf["media_ref"]
            payloads = [
                hashlib.sha256(r.encode()).digest() * 8 for r in refs
            ]  # 256 fake bytes
            yield pd.DataFrame(
                {
                    "asset_id": [hashlib.md5(r.encode()).hexdigest() for r in refs],
                    "media_ref": refs,
                    "payload": payloads,
                    "kind": ["image"] * len(refs),
                    "declared_w": [(len(r) * 7) % 640 + 1 for r in refs],
                    "declared_h": [(len(r) * 13) % 480 + 1 for r in refs],
                }
            )

    return media_refs.select("media_ref").distinct().mapInPandas(gen, ASSET_SCHEMA)


def decode_assets(assets: DataFrame, fake: bool = False) -> DataFrame:
    """Decode/inspect binary payloads (image decode stubbed; fake=True uses
    a deterministic stand-in so the distributed plumbing is testable)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real image decode needs PIL/ffmpeg (not in this container); "
                    "pass fake=True for the deterministic stand-in"
                )
            out = {
                "asset_id": pdf["asset_id"],
                "media_ref": pdf["media_ref"],
                "kind": pdf["kind"],
                "width": pdf["declared_w"],
                "height": pdf["declared_h"],
                "n_bytes": pdf["payload"].map(len).astype("int64"),
                "sha1": pdf["payload"].map(lambda b: hashlib.sha1(b).hexdigest()),
                "ok": pdf["payload"].map(lambda b: len(b) > 0),
            }
            yield pd.DataFrame(out)

    return assets.mapInPandas(decode, DECODED_SCHEMA)


RESIZED_SCHEMA = (
    "asset_id string, media_ref string, width int, height int, "
    "payload binary, ok boolean"
)

FEATURE_SCHEMA = "asset_id string, embedding array<float>, norm float"


def resize_assets(
    assets: DataFrame, max_w: int = 224, max_h: int = 224, fake: bool = False
) -> DataFrame:
    """Resize payloads to fit (max_w, max_h) preserving aspect ratio —
    real resampling stubbed (no image libs here); fake=True emits the
    clamped dimensions plus a deterministic payload digest so the batch
    shape, schema, and aspect math are testable end-to-end."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real resampling needs PIL/ffmpeg (not in this container); "
                    "pass fake=True for the deterministic stand-in"
                )
            w = pdf["declared_w"].astype("int64").clip(lower=1)
            h = pdf["declared_h"].astype("int64").clip(lower=1)
            scale = pd.concat([max_w / w, max_h / h], axis=1).min(axis=1).clip(upper=1.0)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_ref": pdf["media_ref"],
                    "width": (w * scale).astype("int64").clip(lower=1).astype("int32"),
                    "height": (h * scale).astype("int64").clip(lower=1).astype("int32"),
                    "payload": pdf["payload"].map(
                        lambda b: hashlib.sha1(b"resized:" + b).digest()
                    ),
                    "ok": pdf["payload"].map(lambda b: len(b) > 0),
                }
            )

    return assets.mapInPandas(resize, RESIZED_SCHEMA)


def extract_features(assets: DataFrame, dim: int = 16, fake: bool = False) -> DataFrame:
    """Feature-extract an embedding per asset (vision encoder stubbed);
    fake=True derives a deterministic unit-free vector from md5 bytes of
    the payload — the Arrow batch shape (one batch, many payloads, one
    array column out) is exactly what a real encoder needs."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real feature extraction needs a vision encoder; "
                    "pass fake=True for the deterministic stand-in"
                )
            embs, norms = [], []
            for b in pdf["payload"]:
                raw = b"".join(
                    hashlib.md5(b + i.to_bytes(2, "big")).digest()
                    for i in range(-(-dim // 16))
                )
                v = (np.frombuffer(raw, dtype=np.uint8)[:dim].astype(np.float32) - 127.5)
                embs.append(v.tolist())
                norms.append(float(np.sqrt((v * v).sum())))
            yield pd.DataFrame(
                {"asset_id": pdf["asset_id"], "embedding": embs, "norm": norms}
            )

    return assets.mapInPandas(feats, FEATURE_SCHEMA)


def sample_frames(assets: DataFrame, every_ms: int = 1000, n_frames: int = 3) -> DataFrame:
    """Frame-sampling shape: one input asset -> n output frame rows."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"asset_id": [], "frame_idx": [], "t_ms": [], "frame_sha1": []}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                for i in range(n_frames):
                    rows["asset_id"].append(aid)
                    rows["frame_idx"].append(i)
                    rows["t_ms"].append(i * every_ms)
                    rows["frame_sha1"].append(
                        hashlib.sha1(payload + i.to_bytes(4, "big")).hexdigest()
                    )
            yield pd.DataFrame(rows)

    return assets.mapInPandas(sample, FRAME_SCHEMA)
