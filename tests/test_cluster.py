"""Distributed k-means: recovery, monotonicity, partition independence."""

import numpy as np
import pandas as pd
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


class TestGeoDbscan:
    def _ref(self, ids, lat, lon, eps_m, min_pts):
        """Scalar DBSCAN with the engine's deterministic rules: density
        counts the point itself; core labels = min id of the core-core
        component; borders take the MIN core-neighbor label; noise absent."""
        from geodistpy_ray.kernels import haversine

        n = ids.size
        adj = [set() for _ in range(n)]
        for i in range(n):
            d = haversine(
                np.full(n, lat[i]), np.full(n, lon[i]), lat, lon
            )
            for j in np.flatnonzero(d <= eps_m):
                if j != i:
                    adj[i].add(int(j))
        core = {i for i in range(n) if len(adj[i]) + 1 >= min_pts}
        # union-find over core-core edges
        parent = {i: i for i in core}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for i in core:
            for j in adj[i]:
                if j in core:
                    ra, rb = find(i), find(j)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
        comp = {}
        for i in core:
            comp.setdefault(find(i), []).append(i)
        lbl = {}
        for members in comp.values():
            m = min(ids[i] for i in members)
            for i in members:
                lbl[i] = int(m)
        rows = [(int(ids[i]), lbl[i], True) for i in core]
        for i in range(n):
            if i in core:
                continue
            cn = [lbl[j] for j in adj[i] if j in core]
            if cn:
                rows.append((int(ids[i]), min(cn), False))
        return (
            pd.DataFrame(rows, columns=["doc_id", "cluster_id", "is_core"])
            .sort_values("doc_id", ignore_index=True)
        )

    def _points(self, seed=5, n=60):
        # dense blobs (cores) each with a meridional tail: the mid point
        # still reaches the blob (core), the tip reaches only the mid
        # (border, deg 1) — plus scattered singles/pairs (noise); degrees
        # span the min_pts boundary. eps in tests = 60 km ≈ 0.54° lat.
        rng = np.random.default_rng(seed)
        lat, lon = [], []
        for _ in range(4):
            c = rng.uniform(-60, 60, 2)
            m = int(rng.integers(4, 8))
            lat += list(c[0] + rng.normal(0, 0.1, m))
            lon += list(c[1] + rng.normal(0, 0.1, m))
            lat += [c[0] + 0.45, c[0] + 0.95]  # mid (core), tip (border)
            lon += [c[1], c[1]]
        while len(lat) < n:  # scattered singles/pairs
            c = rng.uniform(-70, 70, 2)
            m = int(rng.integers(1, 3))
            lat += list(c[0] + rng.normal(0, 0.4, m))
            lon += list(c[1] + rng.normal(0, 0.4, m))
        lat, lon = np.array(lat[:n]), np.array(lon[:n])
        ids = rng.permutation(lat.size).astype(np.int64) + 100
        return ids, lat, lon

    def _run(self, ids, lat, lon, eps_m, min_pts, parts=4):
        import ray.data as rd

        from geodistpy_ray.stages.cluster import geo_dbscan

        tab = pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "lat": pa.array(lat, pa.float64()),
                "lon": pa.array(lon, pa.float64()),
            }
        )
        return (
            geo_dbscan(
                rd.from_arrow(tab).repartition(parts), eps_m, min_pts,
                kernel="haversine",
            )
            .to_pandas()
            .sort_values("doc_id", ignore_index=True)
        )

    def test_vs_reference(self, ray_session):
        ids, lat, lon = self._points()
        eps, mp = 60_000.0, 3
        got = self._run(ids, lat, lon, eps, mp)
        exp = self._ref(ids, lat, lon, eps, mp)
        assert (~exp["is_core"]).sum() >= 1  # borders exercised
        assert exp["is_core"].sum() >= 10
        assert len(exp) < len(ids)  # noise exercised
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    def test_border_takes_min_cluster(self, ray_session):
        # two arm-shaped core blobs; point 42 sits between the arm tips,
        # within eps of core 11 (cluster 3) AND core 30 (cluster 8) but
        # with only 2 neighbors (< min_pts=4) -> non-core, deterministic
        # MIN cluster (geometry verified: deg(42)=2, both nbrs core)
        lat = np.array([10.0, 10.0, 10.0, 10.1, 10.0, 10.0, 10.0, 10.0, 10.1, 10.0, 10.0])
        lon = np.array([20.0, 20.1, 19.9, 20.0, 20.45, 21.9, 21.8, 22.0, 21.9, 21.45, 20.95])
        ids = np.array([7, 3, 9, 20, 11, 12, 8, 15, 22, 30, 42], dtype=np.int64)
        got = self._run(ids, lat, lon, 58_000.0, 4)
        exp = self._ref(ids, lat, lon, 58_000.0, 4)
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)
        border = got[got["doc_id"] == 42]
        assert len(border) == 1 and not border["is_core"].iloc[0]
        assert border["cluster_id"].iloc[0] == 3  # min of clusters {3, 8}
        # the two blobs stay separate clusters (42 is non-core, no bridge)
        assert set(got["cluster_id"]) == {3, 8}

    def test_isolated_core_is_singleton_cluster(self, ray_session):
        # a 2-point pair at min_pts=2: both core, each other's neighbor
        # -> one cluster; plus one isolated point -> absent (noise)
        lat = np.array([0.0, 0.1, 50.0])
        lon = np.array([0.0, 0.0, 50.0])
        ids = np.array([5, 2, 30], dtype=np.int64)
        got = self._run(ids, lat, lon, 20_000.0, 2)
        assert got["doc_id"].tolist() == [2, 5]
        assert got["cluster_id"].tolist() == [2, 2]
        assert got["is_core"].all()

    def test_partition_independence(self, ray_session):
        ids, lat, lon = self._points(seed=9)
        a = self._run(ids, lat, lon, 60_000.0, 3, parts=1)
        b = self._run(ids, lat, lon, 60_000.0, 3, parts=7)
        pd.testing.assert_frame_equal(a, b)

    def test_min_pts_validation(self, ray_session):
        import ray.data as rd

        from geodistpy_ray.stages.cluster import geo_dbscan

        tab = pa.table({"doc_id": [1], "lat": [0.0], "lon": [0.0]})
        with pytest.raises(ValueError, match="min_pts"):
            geo_dbscan(rd.from_arrow(tab), 10.0, 0)
