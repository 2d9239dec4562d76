"""Multimodal binary-column plumbing (pipeline/multimodal.py).

The codecs are stubbed (no image/audio libs in this container — fake=True
substitutes deterministic math), so these tests pin what IS real: the
Arrow batch shapes, schemas, row multiplicities, determinism across runs,
the aspect-ratio clamp arithmetic, and the stub contract (fake=False
raises instead of silently fabricating)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler_spark.pipeline.multimodal import (
    decode_assets,
    extract_features,
    resize_assets,
    sample_frames,
    synth_assets,
)


@pytest.fixture(scope="module")
def assets(spark):
    refs = spark.createDataFrame(
        [(f"img://s/{i}",) for i in range(40)], "media_ref string"
    )
    return synth_assets(spark, refs).cache()


def test_resize_clamps_aspect_ratio(spark, assets):
    out = resize_assets(assets, max_w=100, max_h=50, fake=True)
    rows = out.collect()
    assert len(rows) == 40
    src = {r["asset_id"]: (r["declared_w"], r["declared_h"]) for r in assets.collect()}
    for r in rows:
        assert 1 <= r["width"] <= 100 and 1 <= r["height"] <= 50
        w0, h0 = src[r["asset_id"]]
        if w0 <= 100 and h0 <= 50:  # already fits: untouched
            assert (r["width"], r["height"]) == (w0, h0)
        else:  # aspect preserved within integer truncation
            assert abs(r["width"] / w0 - r["height"] / h0) < 0.05
        assert r["ok"] and len(r["payload"]) == 20  # sha1 digest stand-in


def test_extract_features_shape_and_determinism(spark, assets):
    a = extract_features(assets, dim=16, fake=True).collect()
    b = extract_features(assets, dim=16, fake=True).collect()
    assert {r["asset_id"]: r["embedding"] for r in a} == {
        r["asset_id"]: r["embedding"] for r in b
    }
    assert all(len(r["embedding"]) == 16 for r in a)
    assert all(r["norm"] > 0 for r in a)
    # wider dim: the md5-block chaining must extend, not repeat
    w = extract_features(assets, dim=32, fake=True).collect()[0]
    assert len(w["embedding"]) == 32
    assert w["embedding"][:16] != w["embedding"][16:]


def test_frame_sampling_multiplicity(spark, assets):
    frames = sample_frames(assets, every_ms=500, n_frames=4)
    assert frames.count() == 40 * 4
    per = frames.groupBy("asset_id").agg(
        F.count("*").alias("n"), F.countDistinct("frame_sha1").alias("nd")
    )
    assert per.filter("n != 4 OR nd != 4").count() == 0


def test_real_codec_paths_raise(spark, assets):
    for op in (
        lambda: decode_assets(assets).count(),
        lambda: resize_assets(assets).count(),
        lambda: extract_features(assets).count(),
    ):
        with pytest.raises(Exception) as ei:
            op()
        assert "NotImplementedError" in str(ei.value) or isinstance(
            ei.value, NotImplementedError
        )
