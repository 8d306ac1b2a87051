"""Pure-NumPy BMP/WAV codec round-trips (kernels/codecs.py) — no Ray."""

import struct

import numpy as np
import pytest

from geodistpy_ray.kernels.codecs import (
    decode_bmp,
    decode_wav,
    encode_bmp,
    encode_wav,
    resize_nearest,
)


class TestBmp:
    def test_gray_roundtrip_odd_width(self):
        # width 13 → 3-byte row padding exercises the stride logic
        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, size=(9, 13), dtype=np.uint8)
        got = decode_bmp(encode_bmp(img))
        np.testing.assert_array_equal(got, img)

    def test_rgb_decodes_to_luma(self):
        img = np.zeros((4, 5, 3), dtype=np.uint8)
        img[:, :, 0] = 255  # pure red
        got = decode_bmp(encode_bmp(img))
        # BT.601 integer luma of (255, 0, 0)
        assert got.shape == (4, 5)
        assert (got == (299 * 255 + 500) // 1000).all()

    def test_top_down_rows(self):
        img = np.zeros((6, 4), dtype=np.uint8)
        img[0] = 250  # bright FIRST row
        data = bytearray(encode_bmp(img))
        # flip stored row order and negate height → identical decode
        h = struct.unpack_from("<i", data, 22)[0]
        offset = struct.unpack_from("<I", data, 10)[0]
        stride = 4  # width 4, 8bpp → already 4-aligned
        rows = [bytes(data[offset + i * stride : offset + (i + 1) * stride]) for i in range(h)]
        struct.pack_into("<i", data, 22, -h)
        data[offset:] = b"".join(reversed(rows))
        got = decode_bmp(bytes(data))
        np.testing.assert_array_equal(got, img)

    def test_rejects_garbage_and_truncation(self):
        with pytest.raises(ValueError, match="BMP"):
            decode_bmp(b"PNG not really")
        ok = encode_bmp(np.zeros((8, 8), dtype=np.uint8))
        with pytest.raises(ValueError, match="truncated"):
            decode_bmp(ok[:-20])

    def test_rejects_compressed(self):
        data = bytearray(encode_bmp(np.zeros((4, 4), dtype=np.uint8)))
        struct.pack_into("<I", data, 30, 1)  # BI_RLE8
        with pytest.raises(ValueError, match="compression"):
            decode_bmp(bytes(data))

    def test_rejects_pixel_past_palette(self):
        # biClrUsed=16 but pixel bytes reach 255: must fail with the
        # codec's typed error, not a bare numpy IndexError
        img = np.full((4, 4), 255, dtype=np.uint8)
        data = bytearray(encode_bmp(img))
        struct.pack_into("<I", data, 46, 16)  # shrink declared palette
        with pytest.raises(ValueError, match="palette"):
            decode_bmp(bytes(data))


class TestWav:
    def test_mono_roundtrip(self):
        t = np.arange(500)
        wave = (12_000 * np.sin(2 * np.pi * t / 50)).astype(np.int16)
        got, rate = decode_wav(encode_wav(wave, 22_050))
        assert rate == 22_050
        np.testing.assert_array_equal(got[:, 0], wave)
        assert got.shape == (500, 1)

    def test_stereo_roundtrip(self):
        rng = np.random.default_rng(11)
        wave = rng.integers(-30_000, 30_000, size=(301, 2), dtype=np.int16)
        got, rate = decode_wav(encode_wav(wave, 44_100))
        assert rate == 44_100
        np.testing.assert_array_equal(got, wave)

    def test_odd_byte_data_chunk_padding(self):
        # 301 mono samples → 602-byte data chunk; follow it with another
        # chunk to prove the word-alignment walk lands correctly
        wave = np.arange(301, dtype=np.int16)
        raw = encode_wav(wave, 8000)
        got, _ = decode_wav(raw)
        np.testing.assert_array_equal(got[:, 0], wave)

    def test_skips_foreign_chunks(self):
        wave = np.arange(64, dtype=np.int16)
        raw = bytearray(encode_wav(wave, 8000))
        # inject a LIST chunk between WAVE magic and fmt
        extra = b"LIST" + struct.pack("<I", 6) + b"INFOab"
        raw[12:12] = extra
        struct.pack_into("<I", raw, 4, len(raw) - 8)
        got, rate = decode_wav(bytes(raw))
        assert rate == 8000
        np.testing.assert_array_equal(got[:, 0], wave)

    def test_truncated_fmt_chunk_raises_valueerror(self):
        # a fmt chunk whose declared size runs past the buffer must raise
        # the documented ValueError, not struct.error (which would escape
        # callers' `except ValueError` handlers)
        raw = encode_wav(np.zeros(4, dtype=np.int16), 8000)
        fmt_at = raw.index(b"fmt ")
        truncated = raw[: fmt_at + 8 + 8]  # header + half the fmt body
        with pytest.raises(ValueError, match="fmt"):
            decode_wav(truncated)

    def test_rejects_non_pcm16(self):
        raw = bytearray(encode_wav(np.zeros(10, dtype=np.int16), 8000))
        struct.pack_into("<H", raw, 20, 3)  # IEEE float format tag
        with pytest.raises(ValueError, match="PCM16"):
            decode_wav(bytes(raw))
        with pytest.raises(ValueError, match="WAV"):
            decode_wav(b"RIFFxxxx not wave")


def test_resize_nearest_identity_and_downscale():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    np.testing.assert_array_equal(resize_nearest(img, 8, 8), img)
    half = resize_nearest(img, 4, 4)
    assert half.shape == (4, 4)
    # each target pixel samples the source center of its 2x2 cell
    np.testing.assert_array_equal(half, img[1::2, 1::2])
