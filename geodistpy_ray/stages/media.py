"""Multimodal (image/audio/video) stages — actor-pool plumbing + codecs.

Two decode modes per actor:

- ``real_codec=True`` — REAL pure-NumPy decoders for the public-spec-simple
  containers (BMP images, PCM16 WAV audio; ``kernels/codecs.py``). Decoded
  images resample to the actor's fixed (h, w) model-input shape
  (nearest-neighbor); decoded audio takes channel 0 and pads/truncates to
  ``n_samples``. Formats beyond BMP/WAV (JPEG/MP3/...) still need external
  libraries that this container lacks and raise a descriptive ValueError
  from the decoder.
- ``real_codec=False`` (default) — deterministic fake seeded from the
  payload hash, for payloads that aren't real containers (e.g. raw text
  bytes standing in for media at test scale).

Everything around the decode — opaque ``binary`` payload columns with typed
metadata, actor-pool ``map_batches`` with small batch sizes for wide rows,
fixed-shape output columns — is identical in both modes.

Scale notes baked in: payload-carrying stages default to small
``batch_size`` (wide rows), and feature outputs are fixed-shape
``list<float>`` columns that downstream ANN stages consume directly.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def _fake_decode(payload: bytes, h: int, w: int) -> np.ndarray:
    """Deterministic stand-in for an image decoder: bytes → (h, w) grayscale."""
    seed = int.from_bytes(hashlib.blake2b(payload or b"", digest_size=8).digest(), "little")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w), dtype=np.uint8)


class ImageDecodeActor:
    """binary payload → fixed-shape decoded image + metadata columns.

    Real pipeline shape: the codec state (here: none; in production, e.g. a
    libjpeg/ffmpeg context or a GPU decoder) is initialized once per actor.
    """

    def __init__(self, payload_col: str = "html", height: int = 16, width: int = 16, real_codec: bool = False):
        self.payload_col = payload_col
        self.h, self.w = height, width
        if real_codec:
            # real decode state binds once per actor (the per-batch hot path
            # only calls the bound kernels)
            from ..kernels.codecs import decode_bmp, resize_nearest

            def decode(p: bytes) -> np.ndarray:
                return resize_nearest(decode_bmp(p), self.h, self.w)

            self._decode = decode
        else:
            self._decode = lambda p: _fake_decode(p, self.h, self.w)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.payload_col).to_pylist()
        if not payloads:
            batch = batch.append_column("image", pa.array([], pa.list_(pa.uint8())))
            batch = batch.append_column("img_h", pa.array([], pa.int32()))
            batch = batch.append_column("img_w", pa.array([], pa.int32()))
            return batch.append_column("payload_bytes", pa.array([], pa.int64()))
        imgs = np.stack([self._decode(p) for p in payloads])
        sizes = np.fromiter((len(p or b"") for p in payloads), dtype=np.int64, count=len(payloads))
        batch = batch.append_column(
            "image", pa.array(list(imgs.reshape(len(payloads), -1)), pa.list_(pa.uint8()))
        )
        batch = batch.append_column("img_h", pa.array(np.full(len(payloads), self.h), pa.int32()))
        batch = batch.append_column("img_w", pa.array(np.full(len(payloads), self.w), pa.int32()))
        return batch.append_column("payload_bytes", pa.array(sizes, pa.int64()))


def _uniform_dim(batch: pa.Table, col: str) -> int:
    """First-row read of a per-batch dimension column, VALIDATED uniform:
    Ray can re-batch a union of differently-configured decodes into one
    mixed batch, where a silent first-row read would reinterpret pixels at
    the wrong stride (or crash the reshape with a size mismatch)."""
    import pyarrow.compute as pc

    mm = pc.min_max(batch.column(col)).as_py()
    if mm["min"] != mm["max"]:
        raise ValueError(
            f"mixed {col} values in one batch ({mm['min']} vs {mm['max']}) — "
            "repartition per decode configuration before feature extraction"
        )
    return int(mm["min"])


class ImageFeatureActor:
    """Decoded image → small feature vector (mean-pooled patches).

    Stands in for batched model inference: weights would load in __init__.
    """

    def __init__(self, pool: int = 4):
        self.pool = pool

    def __call__(self, batch: pa.Table) -> pa.Table:
        imgs = batch.column("image").combine_chunks()
        if len(imgs) == 0:
            return batch.append_column("img_feat", pa.array([], pa.list_(pa.float64())))
        h = _uniform_dim(batch, "img_h")
        w = _uniform_dim(batch, "img_w")
        flat = imgs.values.to_numpy(zero_copy_only=False).reshape(len(imgs), h, w)
        p = self.pool
        hh, ww = h // p, w // p
        if hh == 0 or ww == 0:
            raise ValueError(f"pool {p} exceeds image dims ({h}x{w})")
        # truncate to the pool-divisible region (same rule as resize_images)
        feat = flat[:, : hh * p, : ww * p].reshape(len(imgs), hh, p, ww, p).mean(axis=(2, 4))
        feat = (feat / 255.0).reshape(len(imgs), -1).astype(np.float32)
        return batch.append_column(
            "img_feat", pa.array([row for row in feat.astype(np.float64)], pa.list_(pa.float64()))
        )


def decode_images(
    ds,
    payload_col: str = "html",
    concurrency=(1, 2),
    batch_size: int = 1024,
    height: int = 16,
    width: int = 16,
    real_codec: bool = False,
):
    """Actor-pool decode stage; small batch_size because payload rows are wide."""
    return ds.map_batches(
        ImageDecodeActor,
        fn_constructor_kwargs={
            "payload_col": payload_col,
            "height": height,
            "width": width,
            "real_codec": real_codec,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        batch_size=batch_size,
    )


def extract_image_features(ds, concurrency=(1, 2), batch_size: int = 1024):
    return ds.map_batches(
        ImageFeatureActor,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        batch_size=batch_size,
    )


def sample_frames(ds, every_n: int = 2, frame_col: str = "image"):
    """Frame-sampling stage: keep every n-th row (video-frame idiom).

    For a real video table the key would be (video_id, frame_no); here the
    semantics — a cheap vectorized row filter that never touches payloads of
    dropped rows — are what matters.
    """

    def fn(batch: pa.Table) -> pa.Table:
        idx = np.arange(batch.num_rows)
        return batch.take(pa.array(idx[idx % every_n == 0]))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True, batch_size=1024)


class AudioDecodeActor:
    """binary payload → fixed-length PCM samples + metadata.

    Mirrors the image path: ``real_codec=True`` decodes RIFF/WAVE PCM16
    (``kernels/codecs.py``), takes channel 0, and pads/truncates to
    ``n_samples`` (the fixed model-input length); ``audio_sr`` then reports
    the FILE's sample rate. The default fake emits ``n_samples`` int16
    samples seeded from the payload hash.
    """

    def __init__(
        self,
        payload_col: str = "html",
        sample_rate: int = 8000,
        n_samples: int = 2048,
        real_codec: bool = False,
    ):
        self.payload_col = payload_col
        self.sr = sample_rate
        self.n = n_samples
        if real_codec:
            from ..kernels.codecs import decode_wav

            def decode(p: bytes) -> tuple[np.ndarray, int]:
                samples, rate = decode_wav(p)
                mono = samples[:, 0]
                if mono.size >= self.n:
                    return mono[: self.n], rate
                out = np.zeros(self.n, dtype=np.int16)
                out[: mono.size] = mono
                return out, rate

            self._decode = decode
        else:

            def fake(p: bytes) -> tuple[np.ndarray, int]:
                seed = int.from_bytes(
                    hashlib.blake2b(p or b"", digest_size=8).digest(), "little"
                )
                wave = np.random.default_rng(seed).integers(
                    -32768, 32768, size=self.n, dtype=np.int16
                )
                return wave, self.sr

            self._decode = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.payload_col).to_pylist()
        waves = np.empty((len(payloads), self.n), dtype=np.int16)
        rates = np.empty(len(payloads), dtype=np.int32)
        for i, p in enumerate(payloads):
            waves[i], rates[i] = self._decode(p)
        batch = batch.append_column(
            "pcm", pa.array(list(waves), pa.list_(pa.int16()))
        )
        batch = batch.append_column("audio_sr", pa.array(rates, pa.int32()))
        return batch.append_column(
            "n_samples", pa.array(np.full(len(payloads), self.n), pa.int64())
        )


class AudioFeatureActor:
    """PCM → per-window RMS energy feature vector (real DSP, vectorized)."""

    def __init__(self, n_windows: int = 16):
        self.n_windows = n_windows

    def __call__(self, batch: pa.Table) -> pa.Table:
        pcm = batch.column("pcm").combine_chunks()
        if len(pcm) == 0:
            return batch.append_column("audio_feat", pa.array([], pa.list_(pa.float64())))
        n = _uniform_dim(batch, "n_samples")
        flat = pcm.values.to_numpy(zero_copy_only=False).reshape(len(pcm), n)
        w = n // self.n_windows
        if w == 0:
            # same guard as ImageFeatureActor: an empty window axis would
            # silently emit all-NaN features (mean over an empty slice)
            raise ValueError(
                f"n_windows {self.n_windows} exceeds n_samples ({n}); "
                "decode with more samples or fewer windows"
            )
        x = flat[:, : w * self.n_windows].reshape(len(pcm), self.n_windows, w)
        rms = np.sqrt((x.astype(np.float64) ** 2).mean(axis=2)) / 32768.0
        return batch.append_column(
            "audio_feat", pa.array([row for row in rms], pa.list_(pa.float64()))
        )


def decode_audio(
    ds,
    payload_col: str = "html",
    concurrency=(1, 2),
    batch_size: int = 1024,
    n_samples: int = 2048,
    real_codec: bool = False,
):
    """Actor-pool audio decode stage (WAV when ``real_codec``, else fake)."""
    return ds.map_batches(
        AudioDecodeActor,
        fn_constructor_kwargs={
            "payload_col": payload_col,
            "n_samples": n_samples,
            "real_codec": real_codec,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        batch_size=batch_size,
    )


def extract_audio_features(ds, concurrency=(1, 2), batch_size: int = 1024):
    return ds.map_batches(
        AudioFeatureActor,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        batch_size=batch_size,
    )


def resize_images(ds, factor: int = 2, batch_size: int = 1024):
    """Block-mean downsample of decoded images by ``factor`` (real kernel —
    no codec needed; operates on the fixed-shape ``image`` column)."""

    def fn(batch: pa.Table) -> pa.Table:
        imgs = batch.column("image").combine_chunks()
        if len(imgs) == 0:
            return batch
        h = _uniform_dim(batch, "img_h")
        w = _uniform_dim(batch, "img_w")
        flat = imgs.values.to_numpy(zero_copy_only=False).reshape(len(imgs), h, w)
        h2, w2 = h // factor, w // factor
        if h2 == 0 or w2 == 0:
            raise ValueError(
                f"resize factor {factor} exceeds image dims ({h}x{w}); "
                f"result would be empty"
            )
        small = (
            flat[:, : h2 * factor, : w2 * factor]
            .reshape(len(imgs), h2, factor, w2, factor)
            .mean(axis=(2, 4))
            .astype(np.uint8)
        )
        names = batch.column_names
        batch = batch.set_column(
            names.index("image"),
            "image",
            pa.array(list(small.reshape(len(imgs), -1)), pa.list_(pa.uint8())),
        )
        batch = batch.set_column(
            names.index("img_h"), "img_h", pa.array(np.full(len(imgs), h2), pa.int32())
        )
        return batch.set_column(
            names.index("img_w"), "img_w", pa.array(np.full(len(imgs), w2), pa.int32())
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size)


def sample_frames_keyed(ds, frame_no_col: str, every_n: int = 2):
    """Keep frames whose ``frame_no % every_n == 0`` — deterministic per-video
    frame sampling (position-independent, safe under any block split)."""

    def fn(batch: pa.Table) -> pa.Table:
        fno = batch.column(frame_no_col).to_numpy(zero_copy_only=False)
        return batch.take(pa.array(np.nonzero(fno % every_n == 0)[0]))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True, batch_size=1024)
