"""Multimodal columns — image/audio/video as opaque binary + typed metadata.

The decode/resize/frame-sample kernels require codec libraries (PIL, soundfile,
av) that are NOT in this container, so the *codec step* is stubbed behind a
deterministic fake (or raises when strictness is requested). Everything
Ray-side is real and tested: schema, actor-pool stage shape, batch sizing for
large binary payloads, metadata extraction, and output layout.

Design notes for 100 TB media:
- binary payloads stay in ``large_binary`` columns; batches MUST be small
  (``batch_size`` 8-32) so batch × concurrency fits worker heap;
- decoders are actor pools (model/codec init in ``__init__``) —
  ``map_batches(ImageDecodeActor, concurrency=N, batch_size=16, num_cpus=1)``;
- decoded features are fixed-size numeric columns; the binary column is
  dropped immediately after feature extraction (wide-record discipline).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa
from ray.data import Dataset

try:  # pragma: no cover - not in this container
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


def media_schema() -> pa.Schema:
    """The canonical multimodal table schema."""
    return pa.schema(
        [
            ("media_id", pa.int64()),
            ("kind", pa.string()),  # image | audio | video
            ("mime", pa.string()),
            ("payload", pa.large_binary()),
            ("width", pa.int32()),
            ("height", pa.int32()),
            ("duration_ms", pa.int32()),
        ]
    )


def _fake_decode(payload: bytes, out_dim: int) -> np.ndarray:
    """Deterministic stand-in for a real decoder: a feature vector derived
    from the payload digest. Replaces PIL/librosa decoding in this container;
    the real kernel drops in behind the same signature."""
    h = hashlib.sha256(payload).digest()
    seed = struct.unpack("<Q", h[:8])[0]
    rng = np.random.Generator(np.random.Philox(key=[seed % (1 << 63), 1]))
    return rng.standard_normal(out_dim).astype(np.float32)


class ImageFeatureActor:
    """Actor-pool stage: binary image payloads → feature vectors.

    ``__init__`` is where a real model/codec loads once per actor; with no
    codec libs installed it configures the deterministic fake (or raises if
    ``strict``)."""

    def __init__(self, out_dim: int = 64, strict: bool = False):
        self.out_dim = out_dim
        if strict and not _HAS_PIL:
            raise NotImplementedError(
                "image decoding requires PIL, which is not installed in "
                "this container — the stage stub runs with strict=False"
            )
        self.use_real = _HAS_PIL and strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for payload in batch["payload"].to_pylist():
            feats.append(
                _fake_decode(payload or b"", self.out_dim)
            )
        mat = np.stack(feats) if feats else np.empty((0, self.out_dim), np.float32)
        out = batch.drop_columns(["payload"])  # drop the fat column NOW
        return out.append_column(
            "features",
            pa.FixedSizeListArray.from_arrays(
                pa.array(mat.reshape(-1), pa.float32()), self.out_dim
            ),
        )


class AudioFrameSampleActor:
    """Actor-pool stage: audio payloads → fixed count of sampled 'frames'
    (deterministic byte-range sampling — the fast-mode sampling pattern
    applied to media; real decode drops in per actor)."""

    def __init__(self, n_frames: int = 8, frame_bytes: int = 256):
        self.n_frames = n_frames
        self.frame_bytes = frame_bytes

    def __call__(self, batch: pa.Table) -> pa.Table:
        digests = []
        for payload in batch["payload"].to_pylist():
            p = payload or b""
            n = len(p)
            step = max(1, n // self.n_frames)
            frames = [
                p[i * step : i * step + self.frame_bytes]
                for i in range(self.n_frames)
            ]
            digests.append(hashlib.sha256(b"".join(frames)).hexdigest())
        out = batch.drop_columns(["payload"])
        return out.append_column(
            "frame_digest", pa.array(digests, pa.string())
        )


def image_features(
    ds: Dataset, out_dim: int = 64, concurrency: int = 4, batch_size: int = 16
) -> Dataset:
    """Media table → (media_id, kind, ..., features) via an actor pool with
    media-sized batches."""
    return ds.map_batches(
        ImageFeatureActor,
        fn_constructor_kwargs={"out_dim": out_dim},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


def audio_frame_digests(
    ds: Dataset, concurrency: int = 4, batch_size: int = 16
) -> Dataset:
    return ds.map_batches(
        AudioFrameSampleActor,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


def synthetic_media(n: int, seed: int = 42):
    """Deterministic fake media table matching :func:`media_schema`."""
    import ray.data

    rng = np.random.Generator(np.random.Philox(key=[seed, 9]))
    kinds = ["image", "audio", "video"]
    rows = {
        "media_id": list(range(n)),
        "kind": [kinds[i % 3] for i in range(n)],
        "mime": ["application/octet-stream"] * n,
        "payload": [
            rng.integers(0, 256, size=int(rng.integers(100, 5000)), dtype=np.uint8)
            .tobytes()
            for _ in range(n)
        ],
        "width": [int(rng.integers(16, 4096)) for _ in range(n)],
        "height": [int(rng.integers(16, 4096)) for _ in range(n)],
        "duration_ms": [int(rng.integers(0, 60000)) for _ in range(n)],
    }
    t = pa.table(
        {name: pa.array(rows[name], typ) for name, typ in
         zip(media_schema().names, media_schema().types)}
    )
    return ray.data.from_arrow(t)
