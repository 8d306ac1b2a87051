"""Distributed k-means: recovery, monotonicity, partition independence."""

import numpy as np
import pyarrow as pa
import pytest


def _blob_table(seed=3, n_per=60, d=4):
    rng = np.random.default_rng(seed)
    centers = np.array(
        [[8.0, 0, 0, 0], [0, 8.0, 0, 0], [0, 0, 8.0, 0]], dtype=np.float64
    )
    pts = np.concatenate(
        [c + rng.normal(0, 0.3, size=(n_per, d)) for c in centers]
    )
    ids = np.arange(pts.shape[0], dtype=np.int64)
    perm = rng.permutation(ids.size)
    return centers, pa.table(
        {
            "vec_id": ids[perm],
            "embedding": pa.array(
                [row for row in pts[perm].astype(np.float32)],
                pa.list_(pa.float32()),
            ),
        }
    )


@pytest.fixture(scope="module")
def blobs(ray_session):
    import ray.data as rd

    centers, tab = _blob_table()
    return centers, rd.from_arrow(tab)


class TestKMeans:
    def test_recovers_planted_centers(self, blobs):
        from geodistpy_ray.stages.cluster import kmeans_fit

        centers, ds = blobs
        c, inertia = kmeans_fit(ds, k=3, iters=6)
        # each true center has a fitted centroid within the blob scatter
        for t in centers:
            assert np.min(np.linalg.norm(c - t, axis=1)) < 0.25
        # inertia non-increasing across Lloyd iterations
        assert all(b <= a + 1e-9 for a, b in zip(inertia, inertia[1:]))

    def test_assign_matches_blobs(self, blobs):
        from geodistpy_ray.stages.cluster import kmeans_assign, kmeans_fit

        centers, ds = blobs
        c, _ = kmeans_fit(ds, k=3, iters=6)
        out = kmeans_assign(ds, c).take_all()
        # points of one blob share one label; blobs get 3 distinct labels
        by_blob = {}
        for r in out:
            blob = r["vec_id"] // 60
            by_blob.setdefault(blob, set()).add(r["cluster"])
            assert r["cluster_sq"] >= 0.0
        assert all(len(s) == 1 for s in by_blob.values())
        assert len(set().union(*by_blob.values())) == 3

    def test_partition_independent(self, blobs, ray_session):
        import ray.data as rd

        from geodistpy_ray.stages.cluster import kmeans_fit

        centers, _ = blobs
        _, tab = _blob_table()
        a, _ = kmeans_fit(rd.from_arrow(tab).repartition(1), k=3, iters=3)
        b, _ = kmeans_fit(rd.from_arrow(tab).repartition(7), k=3, iters=3)
        # hash-rank init is partition-independent; only float summation
        # order differs across block splits
        assert np.allclose(a, b, atol=1e-9)

    def test_too_few_rows_raises(self, ray_session):
        import ray.data as rd

        from geodistpy_ray.stages.cluster import kmeans_fit

        _, tab = _blob_table(n_per=1)
        with pytest.raises(ValueError, match="need >= 9"):
            kmeans_fit(rd.from_arrow(tab.slice(0, 3)), k=9, iters=1)
