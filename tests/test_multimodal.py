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
    out = image_features(ds, concurrency=2, batch_size=8)
    df = out.to_pandas()
    assert len(df) == 60
    assert "payload" not in df.columns  # fat column dropped post-extract
    from quichash_ray.stages.multimodal import IMAGE_FEATURE_DIM

    assert all(len(v) == IMAGE_FEATURE_DIM for v in df["features"])


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


def test_video_frame_features_pipeline(ray_session):
    from quichash_ray.stages.multimodal import (
        IMAGE_FEATURE_DIM,
        video_frame_features,
    )

    ds = synthetic_media(30, seed=42).filter(expr="kind == 'video'")
    out = video_frame_features(ds, concurrency=2, n_sample=4).to_pandas()
    assert len(out) == 10
    assert "payload" not in out.columns
    assert all(len(v) == 4 * IMAGE_FEATURE_DIM for v in out["frame_features"])
    assert out["frame_digest"].str.len().eq(64).all()
    assert (out["n_frames"] >= 3).all()
    # the synthetic clips have a per-frame brightness drift → nonzero
    # scene-change score on every multi-frame clip
    assert (out["scene_change"] > 0).all()


def test_video_scene_change_semantics():
    import pyarrow as pa

    from quichash_ray.stages.multimodal import VideoFrameSampleActor

    w = h = 8
    static = np.full((4, h, w, 3), 100, np.uint8).tobytes()
    flicker = np.stack(
        [np.full((h, w, 3), 255 * (i % 2), np.uint8) for i in range(4)]
    ).tobytes()
    batch = pa.table(
        {
            "media_id": pa.array([0, 1], pa.int64()),
            "payload": pa.array([static, flicker], pa.large_binary()),
            "width": pa.array([w, w], pa.int32()),
            "height": pa.array([h, h], pa.int32()),
        }
    )
    out = VideoFrameSampleActor(n_sample=4)(batch)
    scene = out["scene_change"].to_pylist()
    assert scene[0] == 0.0  # identical frames
    assert scene[1] > 0.9  # black↔white flips every frame
    assert out["n_frames"].to_pylist() == [4, 4]


def test_video_codec_magic_raises():
    from quichash_ray.stages.multimodal import _decode_video

    mp4 = b"\x00\x00\x00\x18ftypmp42" + b"\x00" * 64
    with pytest.raises(NotImplementedError):
        _decode_video(mp4, 8, 8)
    mkv = b"\x1aE\xdf\xa3" + b"\x00" * 64
    with pytest.raises(NotImplementedError):
        _decode_video(mkv, 8, 8)
    # raw stream of 2 frames decodes fine
    raw = np.zeros((2, 8, 8, 3), np.uint8).tobytes()
    assert _decode_video(raw, 8, 8).shape == (2, 8, 8, 3)


def test_strict_mode_raises_without_codecs():
    with pytest.raises(NotImplementedError):
        ImageFeatureActor(strict=True)


def test_image_feature_vector_semantics():
    """The descriptor is real signal statistics, not a hash fake."""
    import numpy as np
    import pytest as _pt

    from quichash_ray.stages.multimodal import image_feature_vector

    img = np.zeros((8, 8, 3), np.uint8)
    img[:, :, 0] = 255  # solid red
    v = image_feature_vector(img)
    assert v[0] == _pt.approx(1.0) and v[1] == 0.0 and v[2] == 0.0  # means
    assert v[3] == _pt.approx(0.0)  # std of a constant channel
    hist = v[6:14]
    assert hist.sum() == _pt.approx(1.0)
    assert hist[2] == _pt.approx(1.0)  # luminance 0.299 → bin 2 of 8
    thumb = v[14:30]
    assert np.allclose(thumb, 0.299, atol=1e-3)


def test_audio_frame_rms_semantics(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from quichash_ray.stages.multimodal import audio_frame_digests

    # constant-amplitude sine: every frame RMS ≈ 0.5/sqrt(2)
    t = np.arange(8192, dtype=np.float32)
    wave = 0.5 * np.sin(2 * np.pi * 0.05 * t)
    payload = (wave * 32767).astype("<i2").tobytes()
    ds = ray.data.from_arrow(
        pa.table(
            {
                "media_id": pa.array([0], pa.int64()),
                "payload": pa.array([payload], pa.large_binary()),
            }
        )
    )
    row = audio_frame_digests(ds, concurrency=1, batch_size=4).take_all()[0]
    rms = np.array(row["frame_rms"])
    assert np.allclose(rms, 0.5 / np.sqrt(2), atol=0.02)
    assert 0.0 < row["zcr"] < 0.5
