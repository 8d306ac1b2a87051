"""Multimodal (image/audio/video) stages — Ray-side plumbing, stubbed codecs.

Image/audio libraries are not available in this container, so the *decode*
kernels are deterministic fakes behind a clearly-marked switch
(``real_codec=True`` raises ``NotImplementedError``). Everything around
them — opaque ``binary`` payload columns with typed metadata, actor-pool
``map_batches`` with small batch sizes for wide rows, fixed-shape output
columns — is real and tested, so swapping in a real codec is a one-function
change.

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
        if real_codec:
            raise NotImplementedError(
                "No image codec available in this environment; "
                "run with real_codec=False for the deterministic fake."
            )
        self.payload_col = payload_col
        self.h, self.w = height, width

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.payload_col).to_pylist()
        imgs = np.stack([_fake_decode(p, self.h, self.w) for p in payloads])
        sizes = np.fromiter((len(p or b"") for p in payloads), dtype=np.int64, count=len(payloads))
        batch = batch.append_column(
            "image", pa.array(list(imgs.reshape(len(payloads), -1)), pa.list_(pa.uint8()))
        )
        batch = batch.append_column("img_h", pa.array(np.full(len(payloads), self.h), pa.int32()))
        batch = batch.append_column("img_w", pa.array(np.full(len(payloads), self.w), pa.int32()))
        return batch.append_column("payload_bytes", pa.array(sizes, pa.int64()))


class ImageFeatureActor:
    """Decoded image → small feature vector (mean-pooled patches).

    Stands in for batched model inference: weights would load in __init__.
    """

    def __init__(self, pool: int = 4):
        self.pool = pool

    def __call__(self, batch: pa.Table) -> pa.Table:
        imgs = batch.column("image").combine_chunks()
        h = batch.column("img_h")[0].as_py()
        w = batch.column("img_w")[0].as_py()
        flat = imgs.values.to_numpy(zero_copy_only=False).reshape(len(imgs), h, w)
        p = self.pool
        feat = flat.reshape(len(imgs), h // p, p, w // p, p).mean(axis=(2, 4))
        feat = (feat / 255.0).reshape(len(imgs), -1).astype(np.float32)
        return batch.append_column(
            "img_feat", pa.array([row for row in feat.astype(np.float64)], pa.list_(pa.float64()))
        )


def decode_images(ds, payload_col: str = "html", concurrency=2, batch_size: int = 1024):
    """Actor-pool decode stage; small batch_size because payload rows are wide."""
    return ds.map_batches(
        ImageDecodeActor,
        fn_constructor_kwargs={"payload_col": payload_col},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        batch_size=batch_size,
    )


def extract_image_features(ds, concurrency=2, batch_size: int = 1024):
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
