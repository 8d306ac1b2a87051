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


def _semdedup_reference(ids, vecs, centroids, eps):
    """Scalar SemDeDup oracle: per cluster, order by similarity-to-centroid
    ascending (= squared distance DESC, id ASC), drop i iff any earlier j
    has cosine sim >= eps."""
    x = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    d2 = ((vecs[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
    cl = np.argmin(d2, axis=1)
    sq = d2[np.arange(len(ids)), cl]
    keep = {}
    for c in np.unique(cl):
        idx = np.flatnonzero(cl == c)
        order = idx[np.lexsort((ids[idx], -sq[idx]))]
        for pos, i in enumerate(order):
            earlier = order[:pos]
            keep[int(ids[i])] = (
                True
                if pos == 0
                else bool((x[earlier] @ x[i]).max() < eps)
            )
    return cl, keep


class TestSemanticDedup:
    def _corpus(self, seed=11):
        """Two anchor clusters; each contains a planted trio of
        near-identical vectors plus distinct fillers."""
        rng = np.random.default_rng(seed)
        anchors = np.array([[10.0, 0, 0, 0], [0, 10.0, 0, 0]])
        rows, ids = [], []
        nid = 0
        for a in anchors:
            base = a + rng.normal(0, 0.5, size=4)
            for _ in range(3):  # near-identical trio (cos ~ 1)
                rows.append(base + rng.normal(0, 1e-4, size=4))
                ids.append(nid)
                nid += 1
            for _ in range(5):  # distinct fillers
                rows.append(a + rng.normal(0, 1.5, size=4))
                ids.append(nid)
                nid += 1
        return np.array(ids, dtype=np.int64), np.stack(rows), anchors

    def test_matches_scalar_reference_and_partitioning(self, ray_session):
        import ray.data as rd

        from geodistpy_ray.stages.cluster import semantic_dedup

        EPS = 0.9995
        ids, vecs, anchors = self._corpus()
        # the fixture must separate: trios are near-identical (sim ~ 1),
        # everything else stays below EPS (cosine near a radius-10 anchor
        # is high even for "distinct" fillers — hence the tight threshold)
        x = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        sims = x @ x.T
        trio_mask = (ids % 8) < 3
        same_trio = trio_mask[:, None] & trio_mask[None, :] & (
            (ids[:, None] // 8) == (ids[None, :] // 8)
        )
        off_diag = ~np.eye(len(ids), dtype=bool)
        assert sims[same_trio & off_diag].min() > EPS
        assert sims[~same_trio & off_diag].max() < EPS
        _, ref_keep = _semdedup_reference(ids, vecs, anchors, eps=EPS)
        tab = pa.table(
            {
                "vec_id": ids,
                "embedding": pa.array(list(vecs), pa.list_(pa.float64())),
            }
        )
        outs = []
        for parts in (1, 7):
            out = (
                semantic_dedup(
                    rd.from_arrow(tab).repartition(parts), anchors, eps=EPS
                )
                .to_pandas()
                .sort_values("vec_id", ignore_index=True)
            )
            outs.append(out)
            got = dict(zip(out["vec_id"], out["keep"]))
            assert got == ref_keep
        assert outs[0].equals(outs[1])
        # exactly one survivor per planted trio, and it is the trio member
        # FARTHEST from its centroid (the paper's keep-edge-examples rule)
        keep0 = outs[0]
        for trio in (np.array([0, 1, 2]), np.array([8, 9, 10])):
            kept = keep0[keep0["vec_id"].isin(trio) & keep0["keep"]]
            assert len(kept) == 1
            c = anchors[np.argmin(((anchors - vecs[trio[0]]) ** 2).sum(axis=1))]
            d = ((vecs[trio] - c) ** 2).sum(axis=1)
            assert kept["vec_id"].iloc[0] == trio[np.lexsort((trio, -d))[0]]
        # fillers are mutually distinct at EPS -> all kept
        fillers = keep0[~keep0["vec_id"].isin([0, 1, 2, 8, 9, 10])]
        assert fillers["keep"].all()

    def test_composes_with_kmeans_fit(self, blobs):
        from geodistpy_ray.stages.cluster import kmeans_fit, semantic_dedup

        centers, ds = blobs
        c, _ = kmeans_fit(ds, k=3, iters=4)
        out = semantic_dedup(ds, c, eps=0.999999).to_pandas()
        assert len(out) == 180 and out["keep"].all()  # nothing that similar

    def test_mega_cluster_guard(self, ray_session):
        import ray.data as rd

        from geodistpy_ray.stages.cluster import semantic_dedup

        ids, vecs, anchors = self._corpus()
        tab = pa.table(
            {
                "vec_id": ids,
                "embedding": pa.array(list(vecs), pa.list_(pa.float64())),
            }
        )
        import ray

        with pytest.raises(ray.exceptions.RayTaskError, match="larger k"):
            semantic_dedup(
                rd.from_arrow(tab), anchors, eps=0.9, max_cluster_rows=3
            ).to_pandas()
