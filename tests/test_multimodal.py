"""Multimodal stage plumbing (decode stubbed; Ray-side shape real)."""

from __future__ import annotations

import numpy as np
import pytest

from quichash_ray.stages.multimodal import (
    ImageFeatureActor,
    audio_frame_digests,
    image_features,
    media_schema,
    synthetic_media,
)


def test_schema_shape():
    s = media_schema()
    assert s.names == [
        "media_id", "kind", "mime", "payload", "width", "height",
        "duration_ms",
    ]
    assert str(s.field("payload").type) == "large_binary"


def test_image_features_pipeline(ray_session):
    ds = synthetic_media(60, seed=42)
    out = image_features(ds, out_dim=32, concurrency=2, batch_size=8)
    df = out.to_pandas()
    assert len(df) == 60
    assert "payload" not in df.columns  # fat column dropped post-extract
    assert all(len(v) == 32 for v in df["features"])


def test_features_deterministic(ray_session):
    a = image_features(synthetic_media(20), concurrency=2).to_pandas()
    b = image_features(synthetic_media(20), concurrency=2).to_pandas()
    fa = {m: tuple(v) for m, v in zip(a["media_id"], a["features"])}
    fb = {m: tuple(v) for m, v in zip(b["media_id"], b["features"])}
    assert fa == fb


def test_audio_frame_digests(ray_session):
    out = audio_frame_digests(synthetic_media(30), concurrency=2).to_pandas()
    assert len(out) == 30
    assert out["frame_digest"].str.len().eq(64).all()
    assert "payload" not in out.columns


def test_strict_mode_raises_without_codecs():
    with pytest.raises(NotImplementedError):
        ImageFeatureActor(strict=True)
