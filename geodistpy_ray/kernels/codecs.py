"""Pure-NumPy media codecs: BMP (image) and PCM WAV (audio).

No media library exists in this environment, so the multimodal stages'
``real_codec=True`` path decodes the two container formats whose public
specs are simple enough to implement exactly from scratch:

- **BMP** (Windows ``BITMAPINFOHEADER``, uncompressed): 8-bpp palette and
  24-bpp BGR variants, bottom-up or top-down row order, 4-byte row padding.
- **WAV** (RIFF ``WAVE`` with a PCM ``fmt `` chunk): 16-bit integer
  samples, any channel count, chunk-walked so extra chunks (LIST, fact)
  are skipped correctly.

Encoders exist so tests can round-trip synthetic payloads byte-for-byte.
Like every ``kernels`` module this file is import-clean of Ray — plain
``bytes``/``ndarray`` in and out (consumed by ``stages/media.py`` actors).

Color→grayscale uses integer BT.601 luma ``(299R + 587G + 114B + 500) //
1000`` so decode results are exactly reproducible across platforms.
"""

from __future__ import annotations

import struct

import numpy as np


def _luma(r: np.ndarray, g: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Integer BT.601 luma, rounded half-up — deterministic uint8."""
    y = (
        299 * r.astype(np.uint32) + 587 * g.astype(np.uint32) + 114 * b.astype(np.uint32) + 500
    ) // 1000
    return y.astype(np.uint8)


def encode_bmp(img: np.ndarray) -> bytes:
    """Encode a uint8 image as an uncompressed BMP.

    ``(h, w)`` grayscale → 8-bpp with a 256-entry gray palette;
    ``(h, w, 3)`` RGB → 24-bpp (stored BGR). Rows are written bottom-up
    with standard 4-byte padding.
    """
    img = np.asarray(img)
    if img.dtype != np.uint8:
        raise ValueError(f"encode_bmp expects uint8 pixels, got {img.dtype}")
    if img.ndim == 2:
        h, w = img.shape
        bpp = 8
        palette = bytearray()
        for i in range(256):  # BGRA quads, gray ramp
            palette += bytes((i, i, i, 0))
        rows = img
    elif img.ndim == 3 and img.shape[2] == 3:
        h, w = img.shape[:2]
        bpp = 24
        palette = bytearray()
        rows = img[:, :, ::-1]  # RGB → BGR storage order
    else:
        raise ValueError(f"encode_bmp expects (h, w) or (h, w, 3), got {img.shape}")
    row_bytes = (w * bpp) // 8
    stride = (row_bytes + 3) & ~3
    pix = bytearray()
    pad = bytes(stride - row_bytes)
    for y in range(h - 1, -1, -1):  # bottom-up
        pix += rows[y].tobytes() + pad
    offset = 14 + 40 + len(palette)
    header = struct.pack("<2sIHHI", b"BM", offset + len(pix), 0, 0, offset)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, bpp, 0, len(pix), 2835, 2835,
        256 if bpp == 8 else 0, 0,
    )
    return header + dib + bytes(palette) + bytes(pix)


def decode_bmp(data: bytes) -> np.ndarray:
    """Decode an uncompressed 8-bpp-palette or 24-bpp BMP → (h, w) uint8
    grayscale (palette/BGR mapped through integer BT.601 luma)."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    offset = struct.unpack_from("<I", data, 10)[0]
    dib_size = struct.unpack_from("<I", data, 14)[0]
    if dib_size < 40:
        raise ValueError(f"unsupported BMP DIB header size {dib_size} (need >= 40)")
    w, h_signed = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    compression = struct.unpack_from("<I", data, 30)[0]
    if compression != 0:
        raise ValueError(f"unsupported BMP compression {compression} (BI_RGB only)")
    if w <= 0 or h_signed == 0:
        raise ValueError(f"bad BMP dimensions {w}x{h_signed}")
    top_down = h_signed < 0
    h = -h_signed if top_down else h_signed
    row_bytes = (w * bpp) // 8
    stride = (row_bytes + 3) & ~3
    if offset + stride * h > len(data):
        raise ValueError("truncated BMP pixel data")
    raw = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=offset)
    rows = raw.reshape(h, stride)[:, :row_bytes]
    if not top_down:
        rows = rows[::-1]
    if bpp == 8:
        n_colors = struct.unpack_from("<I", data, 46)[0] or 256
        pal_off = 14 + dib_size
        pal = np.frombuffer(
            data, dtype=np.uint8, count=4 * n_colors, offset=pal_off
        ).reshape(n_colors, 4)
        # palette quads are BGRA
        if n_colors < 256 and int(rows.max(initial=0)) >= n_colors:
            raise ValueError(
                f"BMP pixel index {int(rows.max())} out of palette range "
                f"({n_colors} colors)"
            )
        gray = _luma(pal[:, 2], pal[:, 1], pal[:, 0])
        return gray[rows]
    if bpp == 24:
        bgr = rows.reshape(h, w, 3)
        return _luma(bgr[:, :, 2], bgr[:, :, 1], bgr[:, :, 0])
    raise ValueError(f"unsupported BMP bit depth {bpp} (8 or 24 only)")


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode int16 PCM samples — ``(n,)`` mono or ``(n, ch)`` interleaved —
    as a canonical RIFF/WAVE file."""
    samples = np.asarray(samples)
    if samples.dtype != np.int16:
        raise ValueError(f"encode_wav expects int16 samples, got {samples.dtype}")
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.ndim != 2:
        raise ValueError(f"encode_wav expects (n,) or (n, ch), got {samples.shape}")
    n, ch = samples.shape
    data = samples.astype("<i2").tobytes()
    block_align = ch * 2
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, sample_rate * block_align, block_align, 16
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    if len(data) % 2:  # RIFF chunks are word-aligned
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a 16-bit PCM RIFF/WAVE payload → ``((n, ch) int16, rate)``.

    Walks the chunk list (skipping LIST/fact/etc.), so files written by
    other tools decode as long as the audio itself is integer PCM16.
    """
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV payload (missing RIFF/WAVE magic)")
    pos = 12
    fmt = None
    pcm = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        body_at = pos + 8
        if cid == b"fmt ":
            # body_at + 16 bounds-check keeps the error contract: a chunk
            # size that runs past the buffer would raise struct.error from
            # unpack_from, escaping callers' `except ValueError` handlers
            if size < 16 or body_at + 16 > len(data):
                raise ValueError("malformed WAV fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", data, body_at)
        elif cid == b"data":
            pcm = (body_at, size)
        pos = body_at + size + (size & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise ValueError("WAV payload missing fmt or data chunk")
    audio_format, ch, rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(
            f"unsupported WAV encoding (format={audio_format}, bits={bits}); "
            "integer PCM16 only"
        )
    if ch < 1:
        raise ValueError(f"malformed WAV fmt chunk: channels={ch}")
    body_at, size = pcm
    size = min(size, len(data) - body_at)
    n = size // (2 * ch)
    samples = (
        np.frombuffer(data, dtype="<i2", count=n * ch, offset=body_at)
        .reshape(n, ch)
        .astype(np.int16)
    )
    return samples, int(rate)


def resize_nearest(img: np.ndarray, h: int, w: int) -> np.ndarray:
    """Nearest-neighbor resample of a (H, W) image to (h, w) — the
    deterministic decode→model-input-shape step (no interpolation libs)."""
    src_h, src_w = img.shape[:2]
    yi = ((np.arange(h) + 0.5) * src_h / h).astype(np.int64).clip(0, src_h - 1)
    xi = ((np.arange(w) + 0.5) * src_w / w).astype(np.int64).clip(0, src_w - 1)
    return img[yi][:, xi]
