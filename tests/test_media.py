"""Multimodal stage plumbing: deterministic fake decode, features, sampling."""

import numpy as np
import pyarrow as pa
import pytest

from geodistpy_ray.stages.media import ImageDecodeActor, _fake_decode


class TestDecode:
    def test_deterministic(self):
        a = _fake_decode(b"payload", 16, 16)
        b = _fake_decode(b"payload", 16, 16)
        np.testing.assert_array_equal(a, b)
        c = _fake_decode(b"other", 16, 16)
        assert not np.array_equal(a, c)

    def test_real_codec_decodes_bmp(self):
        from geodistpy_ray.kernels.codecs import encode_bmp

        img = np.arange(256, dtype=np.uint8).reshape(16, 16)
        actor = ImageDecodeActor(payload_col="payload", real_codec=True)
        out = actor(pa.table({"payload": [encode_bmp(img)]}))
        got = np.asarray(out.column("image")[0].as_py(), dtype=np.uint8).reshape(16, 16)
        np.testing.assert_array_equal(got, img)  # same dims → exact round-trip

    def test_real_codec_resizes_to_model_shape(self):
        from geodistpy_ray.kernels.codecs import encode_bmp

        img = np.zeros((32, 48), dtype=np.uint8)
        img[16:, :] = 200  # bottom half bright
        actor = ImageDecodeActor(payload_col="payload", height=16, width=16, real_codec=True)
        out = actor(pa.table({"payload": [encode_bmp(img)]}))
        got = np.asarray(out.column("image")[0].as_py(), dtype=np.uint8).reshape(16, 16)
        assert (got[:8] == 0).all() and (got[8:] == 200).all()

    def test_real_codec_rejects_non_bmp(self):
        actor = ImageDecodeActor(payload_col="payload", real_codec=True)
        with pytest.raises(ValueError, match="BMP"):
            actor(pa.table({"payload": [b"not an image"]}))

    def test_stage_schema(self, ray_session):
        import ray.data as rd

        from geodistpy_ray.stages.media import decode_images, extract_image_features

        ds = rd.from_arrow(
            pa.table(
                {
                    "doc_id": [0, 1, 2, 3],
                    "payload": [b"aa", b"bb", b"cc", b"dd"],
                }
            )
        )
        out = extract_image_features(decode_images(ds, payload_col="payload", concurrency=1), concurrency=1)
        df = out.to_pandas()
        assert len(df) == 4
        assert df["payload_bytes"].tolist() == [2, 2, 2, 2]
        assert all(len(v) == 16 * 16 for v in df["image"])
        assert all(len(v) == 16 for v in df["img_feat"])  # (16/4)^2 pooled
        assert (df["img_h"] == 16).all()

    def test_frame_sampling(self, ray_session):
        import ray.data as rd

        from geodistpy_ray.stages.media import sample_frames

        ds = rd.from_arrow(pa.table({"frame_no": list(range(10))}))
        out = sample_frames(ds, every_n=2).to_pandas()
        assert len(out) == 5


def test_audio_pipeline_plumbing(ray_session):
    import ray.data as rd

    from geodistpy_ray.stages.media import decode_audio, extract_audio_features

    tbl = pa.table(
        {"doc_id": [0, 1, 2], "payload": [b"aa", b"bb", b""]}
    )
    ds = decode_audio(rd.from_arrow(tbl), payload_col="payload", concurrency=1)
    ds = extract_audio_features(ds, concurrency=1)
    got = ds.to_pandas().sort_values("doc_id", ignore_index=True)
    assert got["audio_sr"].tolist() == [8000] * 3
    assert all(len(f) == 16 for f in got["audio_feat"])
    # deterministic: same payload → same features
    ds2 = extract_audio_features(
        decode_audio(rd.from_arrow(tbl), payload_col="payload", concurrency=1), concurrency=1
    )
    got2 = ds2.to_pandas().sort_values("doc_id", ignore_index=True)
    assert np.allclose(np.stack(got["audio_feat"]), np.stack(got2["audio_feat"]))
    # uniform-random int16 PCM → RMS near 1/sqrt(3)
    assert abs(float(np.stack(got["audio_feat"]).mean()) - 0.577) < 0.05


def test_audio_real_codec_decodes_wav():
    from geodistpy_ray.kernels.codecs import encode_wav
    from geodistpy_ray.stages.media import AudioDecodeActor

    t = np.arange(3000)
    wave = (10_000 * np.sin(2 * np.pi * 440 * t / 16_000)).astype(np.int16)
    actor = AudioDecodeActor(payload_col="payload", n_samples=2048, real_codec=True)
    out = actor(pa.table({"payload": [encode_wav(wave, 16_000)]}))
    assert out.column("audio_sr")[0].as_py() == 16_000  # FILE rate, not default
    got = np.asarray(out.column("pcm")[0].as_py(), dtype=np.int16)
    np.testing.assert_array_equal(got, wave[:2048])  # truncate to n_samples
    # shorter-than-n payloads zero-pad
    out2 = actor(pa.table({"payload": [encode_wav(wave[:100], 8_000)]}))
    got2 = np.asarray(out2.column("pcm")[0].as_py(), dtype=np.int16)
    np.testing.assert_array_equal(got2[:100], wave[:100])
    assert (got2[100:] == 0).all()


def test_resize_images_halves_dims(ray_session):
    import ray.data as rd

    from geodistpy_ray.stages.media import decode_images, resize_images

    tbl = pa.table({"doc_id": [0, 1], "payload": [b"x", b"y"]})
    ds = decode_images(rd.from_arrow(tbl), payload_col="payload", concurrency=1)
    got = resize_images(ds, factor=2).to_pandas()
    assert got["img_h"].tolist() == [8, 8] and got["img_w"].tolist() == [8, 8]
    assert all(len(i) == 64 for i in got["image"])


def test_sample_frames_keyed(ray_session):
    import ray.data as rd

    from geodistpy_ray.stages.media import sample_frames_keyed

    tbl = pa.table(
        {
            "video_id": np.repeat([0, 1], 10),
            "frame_no": np.tile(np.arange(10, dtype=np.int64), 2),
        }
    )
    got = sample_frames_keyed(rd.from_arrow(tbl).repartition(4), "frame_no", every_n=3).to_pandas()
    # position-independent: exactly frames 0,3,6,9 per video regardless of blocks
    assert sorted(got[got.video_id == 0]["frame_no"].tolist()) == [0, 3, 6, 9]
    assert sorted(got[got.video_id == 1]["frame_no"].tolist()) == [0, 3, 6, 9]
