"""Multimodal columns — image/audio/video as opaque binary + typed metadata.

The *codec* tier is wired behind optional imports: compressed payloads
(JPEG/PNG/GIF/BMP; WAV/OGG/FLAC; MP4/MKV/AVI — detected by magic bytes)
decode through PIL / soundfile / PyAV when those libraries are installed.
When they are not (this container ships none), the formats that need no
codec library decode through pure-stdlib fallbacks — PNG (zlib inflate +
defilter), BMP (24/32-bit BI_RGB), and RIFF/WAVE PCM/float — while the
genuinely codec-bound formats (JPEG/GIF; OGG/FLAC; MP4/MKV/AVI) raise a
clearly-marked ``NotImplementedError``. Uncompressed raw layouts — images as
``width × height × 3`` uint8 RGB buffers, audio as int16 mono PCM, video
as consecutive raw-RGB frames — decode everywhere via numpy
reinterpretation and are the test fixture. Everything
downstream of decode is REAL signal processing on the raw arrays
(vectorized channel statistics, luminance histograms, block-mean
thumbnails, per-frame RMS energy, zero-crossing rates), and everything
Ray-side is real and tested: schema, actor-pool stage shape, batch sizing
for large binary payloads, and output layout.

Design notes for 100 TB media:
- binary payloads stay in ``large_binary`` columns; batches MUST be small
  (``batch_size`` 8-32) so batch × concurrency fits worker heap;
- decoders are actor pools (model/codec init in ``__init__``) —
  ``map_batches(ImageFeatureActor, concurrency=N, batch_size=16, num_cpus=1)``;
- decoded features are fixed-size numeric columns; the binary column is
  dropped immediately after feature extraction (wide-record discipline).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
from ray.data import Dataset

try:  # pragma: no cover - not in this container
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False

try:  # pragma: no cover - not in this container
    import soundfile as _soundfile  # noqa: F401

    _HAS_SOUNDFILE = True
except ImportError:
    _HAS_SOUNDFILE = False

try:  # pragma: no cover - not in this container
    import av as _av  # noqa: F401

    _HAS_AV = True
except ImportError:
    _HAS_AV = False

# magic prefixes of compressed formats the codec tier handles when its
# library is present (JPEG / PNG / GIF / BMP; WAV-RIFF / OGG / FLAC)
_IMG_MAGICS = (b"\xff\xd8\xff", b"\x89PNG\r\n\x1a\n", b"GIF8", b"BM")


def _is_codec_image(payload: bytes, width: int, height: int) -> bool:
    """Codec route iff a compressed-format magic matches AND the payload is
    not exactly the raw w×h×3 layout — random raw bytes can start with a
    short magic (BM is 2 bytes), and a well-formed raw payload must never
    mis-route."""
    return len(payload) != width * height * 3 and any(
        payload.startswith(m) for m in _IMG_MAGICS
    )


def _is_codec_video(payload: bytes) -> bool:
    """MP4/MOV (ftyp box at offset 4), Matroska/WebM (EBML), AVI (RIFF)."""
    if payload[4:8] == b"ftyp":
        return True
    if payload.startswith(b"\x1aE\xdf\xa3"):
        return True
    return payload.startswith(b"RIFF") and payload[8:12] == b"AVI "


def _is_codec_audio(payload: bytes) -> bool:
    # RIFF requires the WAVE fourcc too — 12 matched bytes, not 4
    if payload.startswith(b"RIFF"):
        return payload[8:12] == b"WAVE"
    return payload.startswith((b"OggS", b"fLaC"))


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


def _png_defilter(
    raw: bytes, height: int, stride: int, bpp: int
) -> np.ndarray:
    """Reverse PNG scanline filters (types 0-4) → (height, stride) uint8.

    Up/None rows are fully vectorized; Sub/Average/Paeth carry a
    left-pixel dependency so those rows run a per-byte loop — acceptable
    for the fallback tier (this path exists for correctness when PIL is
    absent; PIL, when installed, wins the hot path)."""
    out = np.empty((height, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    pos = 0
    for y in range(height):
        ft = raw[pos]
        pos += 1
        cur = np.frombuffer(raw, np.uint8, stride, pos).astype(np.int32)
        pos += stride
        if ft == 0:
            pass
        elif ft == 2:  # Up
            cur = (cur + prev) & 0xFF
        elif ft == 1:  # Sub
            cur = cur.copy()
            for i in range(bpp, stride):
                cur[i] = (cur[i] + cur[i - bpp]) & 0xFF
        elif ft == 3:  # Average
            cur = cur.copy()
            for i in range(stride):
                left = cur[i - bpp] if i >= bpp else 0
                cur[i] = (cur[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            cur = cur.copy()
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc) else (b if pb <= pc else c)
                cur[i] = (cur[i] + pred) & 0xFF
        else:
            raise ValueError(f"invalid PNG filter type {ft}")
        prev = cur
        out[y] = cur.astype(np.uint8)
    return out


def _decode_png_pure(payload: bytes) -> np.ndarray:
    """Pure-stdlib PNG decode (zlib inflate + defilter) → (h, w, 3) uint8.

    Supports the overwhelmingly common profile: 8-bit depth, color types
    0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA), no
    interlace. Alpha is dropped (composited on black is wrong for
    features; the descriptor stage wants the raw channels). Anything
    outside the profile raises ValueError — loud, never silently wrong.
    PNG spec is public (RFC 2083); no external codec needed: the only
    compression is DEFLATE, which is stdlib zlib."""
    import struct
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG signature")
    pos = 8
    ihdr = None
    idat = []
    palette = None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            palette = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("truncated PNG: missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG profile (depth={depth}, interlace={interlace})"
        )
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if channels is None:
        raise ValueError(f"unsupported PNG color type {color}")
    raw = zlib.decompress(b"".join(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    px = _png_defilter(raw, h, stride, channels).reshape(h, w, channels)
    if color == 2:
        return px
    if color == 6:
        return np.ascontiguousarray(px[:, :, :3])
    if color == 0:
        return np.repeat(px, 3, axis=2)
    if color == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    # color == 3: palette
    if palette is None:
        raise ValueError("palette PNG without PLTE chunk")
    return palette[px[:, :, 0]]


def _decode_bmp_pure(payload: bytes) -> np.ndarray:
    """Pure-stdlib BMP decode → (h, w, 3) uint8. Uncompressed 24/32-bit
    BI_RGB only (the common case); BGR(A) rows, 4-byte padded, bottom-up
    unless height is negative. Out-of-profile raises ValueError."""
    import struct

    if payload[:2] != b"BM" or len(payload) < 54:
        raise ValueError("not a BMP header")
    (data_off,) = struct.unpack("<I", payload[10:14])
    w, h = struct.unpack("<ii", payload[18:26])
    bits, compression = struct.unpack("<HI", payload[28:34])
    if compression != 0 or bits not in (24, 32):
        raise ValueError(f"unsupported BMP (bits={bits}, comp={compression})")
    flip = h > 0
    h = abs(h)
    bypp = bits // 8
    row_stride = (w * bypp + 3) & ~3
    need = data_off + row_stride * h
    if len(payload) < need:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(
        payload, np.uint8, row_stride * h, data_off
    ).reshape(h, row_stride)
    px = rows[:, : w * bypp].reshape(h, w, bypp)
    rgb = px[:, :, 2::-1]  # BGR(A) → RGB
    if flip:
        rgb = rgb[::-1]
    return np.ascontiguousarray(rgb)


def _decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """→ (h, w, 3) uint8.

    Compressed payloads (JPEG/PNG/GIF/BMP magic) decode through PIL when
    it is installed. Without PIL, PNG and BMP decode through the
    pure-stdlib fallbacks (both formats need nothing beyond zlib/struct);
    JPEG/GIF genuinely need a codec library and raise — loud, not a
    silently wrong raw reinterpretation. Everything else is the raw-RGB
    layout: a width×height×3 uint8 buffer (uncompressed PPM-style); short
    buffers tile deterministically so metadata-driven shapes always
    decode."""
    if _is_codec_image(payload, width, height):
        if _HAS_PIL:
            import io

            img = Image.open(io.BytesIO(payload)).convert("RGB")
            return np.asarray(img, dtype=np.uint8)
        if payload.startswith(b"\x89PNG\r\n\x1a\n"):
            return _decode_png_pure(payload)
        if payload.startswith(b"BM"):
            return _decode_bmp_pure(payload)
        raise NotImplementedError(
            "JPEG/GIF image payload (codec magic detected) needs PIL, "
            "which is not installed in this container"
        )
    need = width * height * 3
    buf = np.frombuffer(payload, dtype=np.uint8)
    if len(buf) == 0:
        buf = np.zeros(1, np.uint8)
    if len(buf) < need:
        buf = np.tile(buf, need // len(buf) + 1)
    return buf[:need].reshape(height, width, 3)


def _decode_wav_pure(payload: bytes) -> np.ndarray:
    """Pure-stdlib RIFF/WAVE decode → float32 mono in [-1, 1].

    PCM 8/16/24/32-bit and IEEE float32 (format tags 1, 3, and the
    WAVE_FORMAT_EXTENSIBLE wrapper 0xFFFE), any channel count
    (mono-mixed). The WAV container is a trivial public chunk format —
    no codec needed. Out-of-profile (ADPCM, µ-law, …) raises ValueError."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + clen]
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
            if fmt is not None:
                break
    if fmt is None or data is None or len(fmt) < 16:
        raise ValueError("truncated WAV: missing fmt/data chunk")
    tag, n_ch, _rate, _bps, _align, bits = struct.unpack("<HHIIHH", fmt[:16])
    if tag == 0xFFFE and len(fmt) >= 26:
        (tag,) = struct.unpack("<H", fmt[24:26])  # extensible: real tag
    if tag == 3 and bits == 32:
        wave = np.frombuffer(
            data[: len(data) - len(data) % 4], "<f4"
        ).astype(np.float32)
    elif tag == 1 and bits == 16:
        wave = (
            np.frombuffer(data[: len(data) - len(data) % 2], "<i2").astype(
                np.float32
            )
            / 32768.0
        )
    elif tag == 1 and bits == 8:  # 8-bit WAV is unsigned
        wave = (
            np.frombuffer(data, np.uint8).astype(np.float32) - 128.0
        ) / 128.0
    elif tag == 1 and bits == 32:
        wave = (
            np.frombuffer(data[: len(data) - len(data) % 4], "<i4").astype(
                np.float32
            )
            / 2147483648.0
        )
    elif tag == 1 and bits == 24:
        b3 = np.frombuffer(
            data[: len(data) - len(data) % 3], np.uint8
        ).reshape(-1, 3)
        ints = (
            b3[:, 0].astype(np.int32)
            | (b3[:, 1].astype(np.int32) << 8)
            | (b3[:, 2].astype(np.int32) << 16)
        )
        ints = np.where(ints >= 1 << 23, ints - (1 << 24), ints)
        wave = ints.astype(np.float32) / 8388608.0
    else:
        raise ValueError(f"unsupported WAV format tag={tag} bits={bits}")
    if n_ch > 1:
        n = len(wave) - len(wave) % n_ch
        wave = wave[:n].reshape(-1, n_ch).mean(axis=1)
    return np.ascontiguousarray(wave, dtype=np.float32)


def _decode_audio(payload: bytes) -> np.ndarray:
    """→ float32 mono waveform in [-1, 1].

    Compressed/container payloads (RIFF/OGG/FLAC magic) decode through
    soundfile when installed. Without it, RIFF/WAVE decodes through the
    pure-stdlib fallback (PCM/float WAV needs no codec); OGG/FLAC
    genuinely need a codec and raise. Everything else is raw int16
    little-endian mono PCM."""
    if _is_codec_audio(payload):
        if _HAS_SOUNDFILE:
            import io

            wave, _sr = _soundfile.read(io.BytesIO(payload), dtype="float32")
            if wave.ndim > 1:
                wave = wave.mean(axis=1)
            return np.ascontiguousarray(wave, dtype=np.float32)
        if payload.startswith(b"RIFF"):
            return _decode_wav_pure(payload)
        raise NotImplementedError(
            "OGG/FLAC audio payload (codec magic detected) needs "
            "soundfile, which is not installed in this container"
        )
    n = len(payload) - (len(payload) % 2)
    if n == 0:
        return np.zeros(1, np.float32)
    return (
        np.frombuffer(payload[:n], dtype="<i2").astype(np.float32) / 32768.0
    )


def _decode_video(payload: bytes, width: int, height: int) -> np.ndarray:
    """→ (n_frames, h, w, 3) uint8.

    Container payloads (MP4/MKV/AVI magic) decode through PyAV when it is
    installed; without it they raise — loud, never a silently wrong raw
    reinterpretation. Everything else is the raw layout: consecutive
    uncompressed width×height×3 RGB frames (a raw video elementary
    stream); a short buffer tiles deterministically to one frame."""
    if _is_codec_video(payload):
        if not _HAS_AV:
            raise NotImplementedError(
                "container video payload (codec magic detected) needs PyAV, "
                "which is not installed in this container"
            )
        import io

        frames = []
        with _av.open(io.BytesIO(payload)) as container:  # pragma: no cover
            for frame in container.decode(video=0):
                frames.append(frame.to_ndarray(format="rgb24"))
        return np.stack(frames)
    frame_bytes = width * height * 3
    buf = np.frombuffer(payload, dtype=np.uint8)
    if len(buf) < frame_bytes:
        if len(buf) == 0:
            buf = np.zeros(1, np.uint8)
        buf = np.tile(buf, frame_bytes // len(buf) + 1)[:frame_bytes]
    n_frames = len(buf) // frame_bytes
    return buf[: n_frames * frame_bytes].reshape(n_frames, height, width, 3)


_THUMB = 4  # thumbnail side
_HIST_BINS = 8

# feature layout: 3 channel means + 3 channel stds + 8-bin luminance
# histogram + 4x4 gray thumbnail = 30 dims
IMAGE_FEATURE_DIM = 3 + 3 + _HIST_BINS + _THUMB * _THUMB


def image_feature_vector(img: np.ndarray) -> np.ndarray:
    """(h, w, 3) uint8 → 30-dim float32 descriptor — real, vectorized
    statistics (means/stds per channel, normalized luminance histogram,
    block-mean gray thumbnail)."""
    f = img.astype(np.float32) / 255.0
    means = f.mean(axis=(0, 1))
    stds = f.std(axis=(0, 1))
    lum = 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
    hist, _ = np.histogram(lum, bins=_HIST_BINS, range=(0.0, 1.0))
    hist = hist.astype(np.float32) / max(1, lum.size)
    h, w = lum.shape
    ys = np.linspace(0, h, _THUMB + 1, dtype=np.int64)
    xs = np.linspace(0, w, _THUMB + 1, dtype=np.int64)
    thumb = np.empty((_THUMB, _THUMB), np.float32)
    for i in range(_THUMB):
        for j in range(_THUMB):
            block = lum[ys[i] : max(ys[i + 1], ys[i] + 1),
                        xs[j] : max(xs[j + 1], xs[j] + 1)]
            thumb[i, j] = block.mean() if block.size else 0.0
    return np.concatenate([means, stds, hist, thumb.reshape(-1)]).astype(
        np.float32
    )


class ImageFeatureActor:
    """Actor-pool stage: binary image payloads → 30-dim feature vectors.

    ``__init__`` is where a real model/codec loads once per actor; without
    codec libs the raw-RGB decoder runs (``strict=True`` raises instead,
    making the missing-codec condition explicit)."""

    def __init__(self, strict: bool = False):
        self.out_dim = IMAGE_FEATURE_DIM
        if strict and not _HAS_PIL:
            raise NotImplementedError(
                "codec image decoding requires PIL, which is not installed "
                "in this container — raw-RGB payloads decode with "
                "strict=False"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths = batch["width"].to_pylist()
        heights = batch["height"].to_pylist()
        feats = []
        for payload, w, h in zip(
            batch["payload"].to_pylist(), widths, heights
        ):
            img = _decode_image(payload or b"", max(1, w or 1), max(1, h or 1))
            feats.append(image_feature_vector(img))
        mat = (
            np.stack(feats)
            if feats
            else np.empty((0, self.out_dim), np.float32)
        )
        out = batch.drop_columns(["payload"])  # drop the fat column NOW
        return out.append_column(
            "features",
            pa.FixedSizeListArray.from_arrays(
                pa.array(mat.reshape(-1), pa.float32()), self.out_dim
            ),
        )


class AudioFrameSampleActor:
    """Actor-pool stage: PCM audio payloads → per-frame RMS energy +
    zero-crossing rate (real DSP over evenly sampled frames) plus a
    deterministic frame digest (the fast-mode sampling pattern applied to
    media)."""

    def __init__(self, n_frames: int = 8, frame_samples: int = 512):
        self.n_frames = n_frames
        self.frame_samples = frame_samples

    def __call__(self, batch: pa.Table) -> pa.Table:
        rms_rows, zcr, digests = [], [], []
        for payload in batch["payload"].to_pylist():
            wave = _decode_audio(payload or b"")
            n = len(wave)
            step = max(1, n // self.n_frames)
            frames = [
                wave[i * step : i * step + self.frame_samples]
                for i in range(self.n_frames)
            ]
            rms_rows.append(
                np.array(
                    [
                        float(np.sqrt(np.mean(fr**2))) if len(fr) else 0.0
                        for fr in frames
                    ],
                    np.float32,
                )
            )
            zcr.append(
                float(np.mean(np.abs(np.diff(np.signbit(wave))))) if n > 1 else 0.0
            )
            digests.append(
                hashlib.sha256(
                    b"".join(fr.tobytes() for fr in frames)
                ).hexdigest()
            )
        out = batch.drop_columns(["payload"])
        mat = (
            np.stack(rms_rows)
            if rms_rows
            else np.empty((0, self.n_frames), np.float32)
        )
        out = out.append_column(
            "frame_rms",
            pa.FixedSizeListArray.from_arrays(
                pa.array(mat.reshape(-1), pa.float32()), self.n_frames
            ),
        )
        out = out.append_column("zcr", pa.array(zcr, pa.float64()))
        return out.append_column(
            "frame_digest", pa.array(digests, pa.string())
        )


class VideoFrameSampleActor:
    """Actor-pool stage: video payloads → K evenly-sampled frames, each
    reduced to the 30-dim image descriptor (real per-frame statistics),
    plus a scene-change score (mean absolute luminance delta between
    consecutive sampled frames) and a deterministic sampled-frame digest.

    The frame-sample pattern is the media analog of fast-mode digesting
    (reference ``src/hash.rs`` sampling: head/tail/stride windows instead
    of the full stream)."""

    def __init__(self, n_sample: int = 4):
        self.n_sample = n_sample
        self.out_dim = n_sample * IMAGE_FEATURE_DIM

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, scene, n_frames_col, digests = [], [], [], []
        widths = batch["width"].to_pylist()
        heights = batch["height"].to_pylist()
        for payload, w, h in zip(
            batch["payload"].to_pylist(), widths, heights
        ):
            vid = _decode_video(
                payload or b"", max(1, w or 1), max(1, h or 1)
            )
            n = vid.shape[0]
            idx = np.unique(
                np.linspace(0, n - 1, self.n_sample).round().astype(np.int64)
            )
            sampled = vid[idx]
            per_frame = [image_feature_vector(fr) for fr in sampled]
            # pad by repeating the last frame's descriptor when the clip
            # has fewer than n_sample distinct frames — fixed-size output
            while len(per_frame) < self.n_sample:
                per_frame.append(per_frame[-1])
            feats.append(np.concatenate(per_frame).astype(np.float32))
            lum = (
                0.299 * sampled[:, :, :, 0].astype(np.float32)
                + 0.587 * sampled[:, :, :, 1]
                + 0.114 * sampled[:, :, :, 2]
            ) / 255.0
            scene.append(
                float(np.abs(np.diff(lum, axis=0)).mean())
                if lum.shape[0] > 1
                else 0.0
            )
            n_frames_col.append(n)
            digests.append(hashlib.sha256(sampled.tobytes()).hexdigest())
        out = batch.drop_columns(["payload"])
        mat = (
            np.stack(feats)
            if feats
            else np.empty((0, self.out_dim), np.float32)
        )
        out = out.append_column(
            "frame_features",
            pa.FixedSizeListArray.from_arrays(
                pa.array(mat.reshape(-1), pa.float32()), self.out_dim
            ),
        )
        out = out.append_column(
            "n_frames", pa.array(n_frames_col, pa.int32())
        )
        out = out.append_column("scene_change", pa.array(scene, pa.float64()))
        return out.append_column(
            "frame_digest", pa.array(digests, pa.string())
        )


def image_features(
    ds: Dataset, concurrency: int = 4, batch_size: int = 16
) -> Dataset:
    """Media table → (media_id, kind, ..., features) via an actor pool with
    media-sized batches."""
    return ds.map_batches(
        ImageFeatureActor,
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


def video_frame_features(
    ds: Dataset,
    concurrency: int = 4,
    batch_size: int = 8,
    n_sample: int = 4,
) -> Dataset:
    """Media table → per-clip sampled-frame descriptors + scene-change
    score. Smaller default batch than images: a clip payload is
    n_frames × the image size."""
    return ds.map_batches(
        VideoFrameSampleActor,
        fn_constructor_kwargs={"n_sample": n_sample},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


def synthetic_media(n: int, seed: int = 42):
    """Deterministic fake media table matching :func:`media_schema` —
    image payloads are true raw-RGB buffers sized width×height×3; video
    payloads are raw elementary streams of consecutive RGB frames with a
    per-frame brightness drift; audio payloads are int16 PCM
    sine-plus-noise."""
    import ray.data

    rng = np.random.Generator(np.random.Philox(key=[seed, 9]))
    kinds = ["image", "audio", "video"]
    payloads, widths, heights, durations = [], [], [], []
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "image":
            w = int(rng.integers(8, 48))
            h = int(rng.integers(8, 48))
            payloads.append(
                rng.integers(0, 256, size=w * h * 3, dtype=np.uint8).tobytes()
            )
            widths.append(w)
            heights.append(h)
            durations.append(0)
        elif kind == "video":
            w = int(rng.integers(8, 24))
            h = int(rng.integers(8, 24))
            n_frames = int(rng.integers(3, 11))
            base = rng.integers(0, 200, size=(h, w, 3), dtype=np.uint8)
            drift = np.minimum(
                base[None].astype(np.int32)
                + (np.arange(n_frames, dtype=np.int32) * 5)[:, None, None, None],
                255,
            ).astype(np.uint8)
            payloads.append(drift.tobytes())
            widths.append(w)
            heights.append(h)
            durations.append(n_frames * 40)
        else:
            n_samp = int(rng.integers(500, 4000))
            t = np.arange(n_samp, dtype=np.float32)
            freq = float(rng.uniform(0.01, 0.2))
            wave = 0.5 * np.sin(2 * np.pi * freq * t) + 0.1 * rng.standard_normal(
                n_samp
            ).astype(np.float32)
            payloads.append(
                np.clip(wave * 32767, -32768, 32767)
                .astype("<i2")
                .tobytes()
            )
            widths.append(0)
            heights.append(0)
            durations.append(int(n_samp / 16))
    t = pa.table(
        {
            "media_id": pa.array(list(range(n)), pa.int64()),
            "kind": pa.array([kinds[i % 3] for i in range(n)], pa.string()),
            "mime": pa.array(["application/octet-stream"] * n, pa.string()),
            "payload": pa.array(payloads, pa.large_binary()),
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
            "duration_ms": pa.array(durations, pa.int32()),
        }
    )
    return ray.data.from_arrow(t)
