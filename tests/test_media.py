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

    def test_real_codec_gate(self):
        with pytest.raises(NotImplementedError):
            ImageDecodeActor(real_codec=True)

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
