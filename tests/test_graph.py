"""Connected components + n-gram overlap pair tests."""

import numpy as np
import pyarrow as pa
import pytest


def _edges(pairs):
    import ray.data as rd

    a, b = zip(*pairs) if pairs else ((), ())
    return rd.from_arrow(
        pa.table(
            {
                "id_a": pa.array(list(a), pa.int64()),
                "id_b": pa.array(list(b), pa.int64()),
            }
        )
    )


class TestConnectedComponents:
    def test_chain_clique_pair(self, ray_session):
        from geodistpy_ray.stages.graph import connected_components

        # chain 1-2-3 (transitive), clique 10-11-12, disjoint pair (20,21)
        cc = (
            connected_components(_edges([(2, 1), (3, 2), (10, 11), (10, 12), (11, 12), (20, 21)]))
            .to_pandas()
            .set_index("node")["cluster_id"]
            .to_dict()
        )
        assert cc == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}

    def test_long_chain_converges_and_cap_raises(self, ray_session):
        from geodistpy_ray.stages.graph import connected_components

        chain = [(i, i + 1) for i in range(12)]
        cc = connected_components(_edges(chain)).to_pandas()
        assert set(cc["cluster_id"]) == {0} and len(cc) == 13
        # a cap below what even pointer-jumping needs must refuse loudly,
        # not return a wrong fixpoint
        with pytest.raises(RuntimeError, match="pointer-jumping"):
            connected_components(_edges(chain), max_iters=1)

    def test_path_graph_converges_logarithmically(self, ray_session):
        """Pointer-jumping contract: a 10k-node PATH (diameter 9999) must
        converge in O(log n) rounds, not O(n) — the old propagation-only
        loop hit max_iters=50 here."""
        import ray.data as rd

        from geodistpy_ray.stages.graph import connected_components

        n = 10_000
        edges = rd.from_arrow(
            pa.table(
                {
                    "id_a": pa.array(np.arange(n - 1), pa.int64()),
                    "id_b": pa.array(np.arange(1, n), pa.int64()),
                }
            )
        )
        out, rounds = connected_components(edges, n_parts=16, return_rounds=True)
        df = out.to_pandas()
        assert len(df) == n and set(df["cluster_id"]) == {0}
        # log2(10000) ≈ 13.3; allow slack for the prop/jump interleave
        assert rounds <= 24, rounds

    def test_python_reference_random_graph(self, ray_session):
        from geodistpy_ray.stages.graph import connected_components

        rng = np.random.default_rng(5)
        pairs = {tuple(sorted(p)) for p in rng.integers(0, 60, size=(80, 2)) if p[0] != p[1]}
        # union-find reference
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        exp = {n: find(n) for n in parent}
        got = (
            connected_components(_edges(sorted(pairs)))
            .to_pandas()
            .set_index("node")["cluster_id"]
            .to_dict()
        )
        assert got == exp

    def test_empty_edges(self, ray_session):
        from geodistpy_ray.stages.graph import connected_components

        assert connected_components(_edges([])).count() == 0


class TestShingleOverlapPairs:
    @staticmethod
    def _docs(texts):
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string()),
                }
            )
        )

    @staticmethod
    def _reference(texts, shingle, min_common):
        def sset(t):
            toks = t.lower().split()
            return {tuple(toks[i : i + shingle]) for i in range(len(toks) - shingle + 1)}

        sets = [sset(t) for t in texts]
        out = {}
        for i in range(len(texts)):
            for j in range(i + 1, len(texts)):
                c = len(sets[i] & sets[j])
                if c >= min_common:
                    out[(i, j)] = c
        return out

    def test_matches_python_reference(self, ray_session):
        from geodistpy_ray.stages.dedup import shingle_overlap_pairs

        texts = [
            "a b c d e f",
            "x a b c d y",  # shares abc, bcd with 0 (3-grams)
            "a b c q r s",  # shares abc with 0 and 1
            "unrelated words only here",
            "a b c d e f",  # exact dup of 0
        ]
        got = (
            shingle_overlap_pairs(self._docs(texts), shingle=3, min_common=1)
            .to_pandas()
            .set_index(["id_a", "id_b"])["n_common"]
            .to_dict()
        )
        assert got == self._reference(texts, 3, 1)

    def test_min_common_threshold(self, ray_session):
        from geodistpy_ray.stages.dedup import shingle_overlap_pairs

        texts = ["a b c d e f", "x a b c d y", "a b c q r s"]
        got = (
            shingle_overlap_pairs(self._docs(texts), shingle=3, min_common=2)
            .to_pandas()
            .set_index(["id_a", "id_b"])["n_common"]
            .to_dict()
        )
        assert got == {(0, 1): 2}

    def test_max_df_drops_boilerplate_windows(self, ray_session):
        from geodistpy_ray.stages.dedup import shingle_overlap_pairs

        # the window "p q r" occurs in ALL four docs (df=4 > cap) and must
        # not generate pairs; "m n o" (df=2) survives
        texts = ["p q r m n o", "p q r m n o", "p q r zz ww", "p q r aa bb"]
        got = (
            shingle_overlap_pairs(self._docs(texts), shingle=3, min_common=1, max_df=3)
            .to_pandas()
            .set_index(["id_a", "id_b"])["n_common"]
            .to_dict()
        )
        # docs 0/1 share "q r m", "r m n", "m n o" (each df=2); every other
        # pair shared only the dropped boilerplate window
        assert got == {(0, 1): 3}

    def test_random_corpus_matches_reference(self, ray_session):
        from geodistpy_ray.stages.dedup import shingle_overlap_pairs

        rng = np.random.default_rng(17)
        vocab = np.array(list("abcdefghij"))
        texts = [" ".join(rng.choice(vocab, size=rng.integers(4, 25))) for _ in range(120)]
        got = (
            shingle_overlap_pairs(self._docs(texts), shingle=4, min_common=2)
            .to_pandas()
            .set_index(["id_a", "id_b"])["n_common"]
            .to_dict()
        )
        assert got == self._reference(texts, 4, 2)


class TestCapPerKey:
    def test_cap_respected_and_partition_independent(self, ray_session):
        import ray.data as rd

        from geodistpy_ray.stages.text import cap_per_key

        t = pa.table(
            {
                "doc_id": pa.array(range(300), pa.int64()),
                "source": pa.array([f"s{i % 7}" for i in range(300)], pa.string()),
            }
        )
        a = cap_per_key(rd.from_arrow(t), "source", k=5).to_pandas()
        b = cap_per_key(rd.from_arrow(t).repartition(13), "source", k=5).to_pandas()
        assert a["source"].value_counts().max() == 5 and len(a) == 35
        assert sorted(a["doc_id"]) == sorted(b["doc_id"])  # membership is id-pure

    def test_matches_sql_mirror(self, ray_session):
        import duckdb
        import ray.data as rd

        from geodistpy_ray.stages.text import cap_per_key, cap_rank_sql

        t = pa.table(
            {
                "doc_id": pa.array([3, -8, 17, 21, 1000004, 5, -2, 7, 11, 13], pa.int64()),
                "source": pa.array(["a"] * 5 + ["b"] * 5, pa.string()),
            }
        )
        got = sorted(
            cap_per_key(rd.from_arrow(t), "source", k=3).to_pandas()["doc_id"]
        )
        con = duckdb.connect()
        con.register("docs", t)
        exp = sorted(
            r[0]
            for r in con.execute(
                "SELECT doc_id FROM (SELECT doc_id, ROW_NUMBER() OVER ("
                f"PARTITION BY source ORDER BY {cap_rank_sql('doc_id')}, doc_id) AS rn "
                "FROM docs) WHERE rn <= 3"
            ).fetchall()
        )
        assert got == exp

    def test_keys_below_cap_untouched(self, ray_session):
        import ray.data as rd

        from geodistpy_ray.stages.text import cap_per_key

        t = pa.table(
            {
                "doc_id": pa.array(range(4), pa.int64()),
                "source": pa.array(["x", "x", "y", "z"], pa.string()),
            }
        )
        out = cap_per_key(rd.from_arrow(t), "source", k=10).to_pandas()
        assert sorted(out["doc_id"]) == [0, 1, 2, 3]


class TestPagerank:
    @staticmethod
    def _ref(edges, n_iters=10, d=0.85):
        nodes = sorted({u for e in edges for u in e})
        idx = {u: i for i, u in enumerate(nodes)}
        N = len(nodes)
        outdeg = {u: 0 for u in nodes}
        for s, _ in edges:
            outdeg[s] += 1
        r = np.full(N, 1.0 / N)
        for _ in range(n_iters):
            new = np.zeros(N)
            dangling = sum(r[idx[u]] for u in nodes if outdeg[u] == 0)
            for s, t in edges:
                new[idx[t]] += r[idx[s]] / outdeg[s]
            r = (1.0 - d) / N + d * (new + dangling / N)
        return {u: r[idx[u]] for u in nodes}

    def test_matches_dense_reference(self, ray_session):
        import ray.data as rd

        from geodistpy_ray.stages.graph import pagerank

        # cycle + dangling node 4 + an extra source; node 5 has no in-edges
        edges = [(1, 2), (2, 3), (3, 1), (3, 4), (5, 1), (5, 3)]
        tbl = pa.table(
            {
                "src": pa.array([a for a, _ in edges], pa.int64()),
                "dst": pa.array([b for _, b in edges], pa.int64()),
            }
        )
        got = (
            pagerank(rd.from_arrow(tbl).repartition(3), n_iters=12)
            .to_pandas()
            .set_index("node")["rank"]
        )
        want = self._ref(edges, n_iters=12)
        assert set(got.index) == set(want)
        for u, r in want.items():
            assert got[u] == pytest.approx(r, abs=1e-12), u
        assert got.sum() == pytest.approx(1.0, abs=1e-9)

    def test_partition_independence_and_scale_graph(self, ray_session):
        import ray.data as rd

        from geodistpy_ray.stages.graph import pagerank

        rng = np.random.default_rng(29)
        n = 2000
        src = rng.integers(0, n, 6000)
        dst = (src * 7 + rng.integers(1, 5, 6000) * 13 + 1) % n
        tbl = pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
        a = (
            pagerank(rd.from_arrow(tbl).repartition(2), n_iters=5, n_parts=8)
            .to_pandas()
            .sort_values("node", ignore_index=True)
        )
        b = (
            pagerank(rd.from_arrow(tbl).repartition(9), n_iters=5, n_parts=32)
            .to_pandas()
            .sort_values("node", ignore_index=True)
        )
        assert a["node"].tolist() == b["node"].tolist()
        np.testing.assert_allclose(a["rank"], b["rank"], rtol=1e-12)
        assert a["rank"].sum() == pytest.approx(1.0, abs=1e-9)


class TestHits:
    @staticmethod
    def _ref(edges, n_iters=10):
        nodes = sorted({u for e in edges for u in e})
        idx = {u: i for i, u in enumerate(nodes)}
        N = len(nodes)
        hub = np.full(N, 1.0 / np.sqrt(N))
        auth = np.zeros(N)
        for _ in range(n_iters):
            auth = np.zeros(N)
            for s, t in edges:
                auth[idx[t]] += hub[idx[s]]
            auth /= np.linalg.norm(auth) or 1.0
            hub = np.zeros(N)
            for s, t in edges:
                hub[idx[s]] += auth[idx[t]]
            hub /= np.linalg.norm(hub) or 1.0
        return (
            {u: hub[idx[u]] for u in nodes},
            {u: auth[idx[u]] for u in nodes},
        )

    def test_matches_dense_reference(self, ray_session):
        import ray.data as rd

        from geodistpy_ray.stages.graph import hits

        # hub node 5, authority node 1, a cycle, and a sink
        edges = [(1, 2), (2, 3), (3, 1), (3, 4), (5, 1), (5, 3), (5, 4)]
        tbl = pa.table(
            {
                "src": pa.array([a for a, _ in edges], pa.int64()),
                "dst": pa.array([b for _, b in edges], pa.int64()),
            }
        )
        got = (
            hits(rd.from_arrow(tbl).repartition(3), n_iters=4, n_parts=8)
            .to_pandas()
            .set_index("node")
        )
        hub, auth = self._ref(edges, n_iters=4)
        assert set(got.index) == set(hub)
        for u in hub:
            assert got.loc[u, "hub"] == pytest.approx(hub[u], abs=1e-10), u
            assert got.loc[u, "auth"] == pytest.approx(auth[u], abs=1e-10), u
        # node 5 is a pure hub (no in-edges): auth exactly 0
        assert got.loc[5, "auth"] == 0.0
        # node 4 is a pure sink: hub exactly 0
        assert got.loc[4, "hub"] == 0.0

    def test_partition_independence(self, ray_session):
        import ray.data as rd

        from geodistpy_ray.stages.graph import hits

        rng = np.random.default_rng(31)
        n = 300
        src = rng.integers(0, n, 900)
        dst = (src * 11 + rng.integers(1, 4, 900) * 7 + 1) % n
        tbl = pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
        a = (
            hits(rd.from_arrow(tbl).repartition(2), n_iters=2, n_parts=8)
            .to_pandas()
            .sort_values("node", ignore_index=True)
        )
        b = (
            hits(rd.from_arrow(tbl).repartition(7), n_iters=2, n_parts=3)
            .to_pandas()
            .sort_values("node", ignore_index=True)
        )
        assert a["node"].tolist() == b["node"].tolist()
        np.testing.assert_allclose(a["hub"], b["hub"], atol=1e-12)
        np.testing.assert_allclose(a["auth"], b["auth"], atol=1e-12)
        assert np.linalg.norm(a["hub"]) == pytest.approx(1.0, abs=1e-9)
        assert np.linalg.norm(a["auth"]) == pytest.approx(1.0, abs=1e-9)


class TestBfsHops:
    def test_matches_python_bfs(self, ray_session):
        from collections import deque

        import ray.data as rd

        from geodistpy_ray.stages.graph import bfs_hops

        rng = np.random.default_rng(101)
        n = 400
        src = rng.integers(0, n, 1000)
        dst = rng.integers(0, n, 1000)
        # an island unreachable from the seeds (nodes 500..509 in a cycle)
        isl = np.arange(500, 510)
        src = np.concatenate([src, isl])
        dst = np.concatenate([dst, np.roll(isl, -1)])
        tbl = pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
        seeds = [3, 77]
        got = (
            bfs_hops(rd.from_arrow(tbl).repartition(4), seeds, n_parts=8)
            .to_pandas()
            .set_index("node")["hops"]
            .to_dict()
        )
        adj = {}
        for a, b in zip(src, dst):
            adj.setdefault(int(a), []).append(int(b))
        dist = {s: 0 for s in seeds}
        q = deque(seeds)
        while q:
            u = q.popleft()
            for v in adj.get(u, ()):  # directed
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        assert got == dist
        # the unreachable island must be absent
        assert not any(500 <= k < 510 for k in got)
        with pytest.raises(ValueError, match="seed"):
            bfs_hops(rd.from_arrow(tbl), [])

    def test_isolated_seed_is_reached_at_zero(self, ray_session):
        # a seed in NO edge row is still reached (hops 0) by definition —
        # the node state built from edge endpoints alone used to drop it,
        # indistinguishable from unreachable (SQL anchors seeds directly)
        import ray.data as rd

        from geodistpy_ray.stages.graph import bfs_hops

        tbl = pa.table(
            {"src": pa.array([1, 2], pa.int64()), "dst": pa.array([2, 3], pa.int64())}
        )
        got = (
            bfs_hops(rd.from_arrow(tbl), seeds=[1, 99], n_parts=4)
            .to_pandas()
            .set_index("node")["hops"]
            .to_dict()
        )
        assert got == {1: 0, 2: 1, 3: 2, 99: 0}


def test_graph_op_guards(ray_session):
    import ray.data as rd

    from geodistpy_ray.stages.graph import hits
    from geodistpy_ray.stages.pairs import colocation_pairs

    empty = pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
    out = hits(rd.from_arrow(empty), n_iters=1).to_pandas()
    # Ray drops the schema of all-empty datasets (known behavior, see the
    # verify skill note) — the guarantee here is just "empty, no crash"
    assert len(out) == 0

    pts = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "user_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array([0, 1], pa.timestamp("us")),
            "lat": pa.array([0.0, 0.1]),
            "lon": pa.array([0.0, 0.1]),
        }
    )
    with pytest.raises(ValueError, match="window_us"):
        colocation_pairs(rd.from_arrow(pts), 1000.0, 0)

    # a cell_deg fine enough to push cell ids past 2^23 would silently
    # collide unrelated (cell << 40) + bucket group keys — must refuse
    with pytest.raises(Exception, match="2\\^23|cell_deg"):
        colocation_pairs(
            rd.from_arrow(pts), 1000.0, 1_000_000, cell_deg=0.01
        ).to_pandas()


def test_hits_rejects_zero_iters(ray_session):
    import ray.data as rd

    from geodistpy_ray.stages.graph import hits

    e = pa.table({"src": [1], "dst": [2]})
    with pytest.raises(ValueError, match="n_iters"):
        hits(rd.from_arrow(e), n_iters=0)


def test_null_edge_endpoint_raises(ray_session):
    """A null int64 endpoint would launder through float64/NaN into
    INT64_MIN — a phantom minimum-label node — so graph stages refuse."""
    import ray.data as rd

    from geodistpy_ray.stages.graph import bfs_hops, connected_components, pagerank

    e = rd.from_arrow(
        pa.table(
            {
                "id_a": pa.array([1, None], pa.int64()),
                "id_b": pa.array([2, 3], pa.int64()),
            }
        )
    )
    with pytest.raises(Exception, match="null"):
        connected_components(e).to_pandas()
    with pytest.raises(Exception, match="null"):
        pagerank(e, src_col="id_a", dst_col="id_b", n_iters=1).to_pandas()
    with pytest.raises(Exception, match="null"):
        bfs_hops(e, [1], src_col="id_a", dst_col="id_b").to_pandas()


def test_pagerank_hits_block_growth_clamped(ray_session):
    """Iterative state must not gain ~|edge blocks| per round (the CC/BFS
    clamp, extended to pagerank/hits): with a 40-block edge table and 6
    rounds, unclamped state would exceed 200 blocks."""
    import ray.data as rd

    from geodistpy_ray.stages.graph import hits, pagerank

    rng = np.random.default_rng(23)
    src = rng.integers(0, 60, 400)
    dst = (src + 1 + rng.integers(0, 5, 400)) % 60
    edges = rd.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    ).repartition(40)
    n_parts = 8
    pr = pagerank(edges, n_iters=6, n_parts=n_parts).materialize()
    assert pr.num_blocks() <= 4 * n_parts
    assert pr.count() == 60
    h = hits(edges, n_iters=4, n_parts=n_parts).materialize()
    assert h.count() == 60
