"""Embedding similarity search: exact vs brute force, LSH recall properties."""

import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb_data(ray_session):
    import duckdb

    df = duckdb.sql(
        f"SELECT vec_id, embedding FROM read_parquet('{SF}/embeddings.parquet') ORDER BY vec_id"
    ).df()
    ids = df["vec_id"].to_numpy()
    m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    return ids, m


def _emb_ds():
    import ray.data as rd

    return rd.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])


class TestAnnTopK:
    def test_vs_brute_force(self, emb_data):
        from geodistpy_ray.stages.ann import ann_topk

        ids, m = emb_data
        q = m[:3]
        res = ann_topk(_emb_ds(), q, k=5).to_pandas()
        for j in range(3):
            sims = m @ q[j]
            order = np.lexsort((ids, np.round(-sims, 6)))[:5]
            got = res[res.query_id == j].sort_values("rank")["vec_id"].to_numpy()
            np.testing.assert_array_equal(ids[order], got)

    def test_self_is_top1(self, emb_data):
        from geodistpy_ray.stages.ann import ann_topk

        ids, m = emb_data
        res = ann_topk(_emb_ds(), m[:4], k=1).to_pandas()
        assert res.sort_values("query_id")["vec_id"].tolist() == ids[:4].tolist()


class TestLshAnn:
    def test_results_subset_and_self_found(self, emb_data):
        from geodistpy_ray.stages.ann import lsh_ann_topk

        ids, m = emb_data
        res = lsh_ann_topk(_emb_ds(), m[:4], k=5, n_bits=4).to_pandas()
        # the query vector usually shares its own bucket → rank 1 is itself;
        # fp32 rounding at a hyperplane boundary can flip one query's bucket,
        # so require self-retrieval for most queries (recall<1 is the LSH
        # contract) and valid nearest-first ordering for all.
        top1 = res[res["rank"] == 1].sort_values("query_id")["vec_id"].tolist()
        hits = sum(1 for a, b in zip(top1, ids[:4].tolist()) if a == b)
        assert hits >= 3
        assert (res["sim"] <= 1.0 + 1e-6).all()
        for qid_, g in res.groupby("query_id"):
            s = g.sort_values("rank")["sim"].to_numpy()
            assert (np.diff(s) <= 1e-9).all()


class TestNearDup:
    def test_exact_pairs_vs_brute(self, emb_data):
        from geodistpy_ray.stages.ann import exact_near_dup_pairs

        ids, m = emb_data
        t = 0.40
        res = exact_near_dup_pairs(_emb_ds(), t).to_pandas()
        sims = m @ m.T
        ii, jj = np.nonzero((sims >= t) & (ids[:, None] < ids[None, :]))
        expect = set(zip(ids[ii].tolist(), ids[jj].tolist()))
        got = set(zip(res["id_a"].tolist(), res["id_b"].tolist()))
        assert expect == got

    def test_lsh_pairs_subset_of_exact(self, emb_data):
        from geodistpy_ray.stages.ann import embedding_near_dup_pairs

        ids, m = emb_data
        t = 0.40
        res = embedding_near_dup_pairs(_emb_ds(), threshold=t, n_bits=4).to_pandas()
        sims = m @ m.T
        ii, jj = np.nonzero((sims >= t - 1e-6) & (ids[:, None] < ids[None, :]))
        exact = set(zip(ids[ii].tolist(), ids[jj].tolist()))
        got = set(zip(res["id_a"].tolist(), res["id_b"].tolist()))
        assert got <= exact
        # multi-table banding dedups pairs found in several tables exactly
        assert not res.duplicated(["id_a", "id_b"]).any()

    def test_blocked_matches_brute_and_exact(self, emb_data):
        from geodistpy_ray.stages.ann import exact_near_dup_pairs_blocked

        ids, m = emb_data
        t = 0.40
        res = (
            exact_near_dup_pairs_blocked(_emb_ds(), t, n_blocks=4)
            .to_pandas()
            .sort_values(["id_a", "id_b"], ignore_index=True)
        )
        sims = m @ m.T
        ii, jj = np.nonzero((sims >= t) & (ids[:, None] < ids[None, :]))
        expect = set(zip(ids[ii].tolist(), ids[jj].tolist()))
        got = set(zip(res["id_a"].tolist(), res["id_b"].tolist()))
        assert expect == got
        # sims match the dense product to fp-dot reassociation tolerance
        ref = {(a, b): sims[np.searchsorted(ids, a), np.searchsorted(ids, b)] for a, b in expect}
        for a, b, sv in zip(res["id_a"], res["id_b"], res["sim"]):
            assert abs(sv - ref[(a, b)]) < 1e-9

    def test_blocked_single_block_degenerate(self, emb_data):
        from geodistpy_ray.stages.ann import exact_near_dup_pairs_blocked

        ids, m = emb_data
        res = exact_near_dup_pairs_blocked(_emb_ds(), 0.4, n_blocks=1).to_pandas()
        sims = m @ m.T
        n_expect = int(((sims >= 0.4) & (ids[:, None] < ids[None, :])).sum())
        assert len(res) == n_expect

    def test_broadcast_budget_guard(self, emb_data):
        from geodistpy_ray.stages.ann import exact_near_dup_pairs

        with pytest.raises(ValueError, match="broadcast budget"):
            exact_near_dup_pairs(_emb_ds(), 0.4, broadcast_budget_bytes=64)

    def test_chunked_corpus_sweep_matches_unchunked(self, emb_data):
        """The worker-memory chunking of the (B, N) sims matrix must not
        change the pair set or sims: a sweep_chunk smaller than one corpus
        row forces step=1 (maximal chunking) and must reproduce the
        default run exactly (same dot products, just sliced)."""
        from geodistpy_ray.stages.ann import exact_near_dup_pairs

        base = (
            exact_near_dup_pairs(_emb_ds(), 0.4)
            .to_pandas()
            .sort_values(["id_a", "id_b"], ignore_index=True)
        )
        chunked = (
            exact_near_dup_pairs(_emb_ds(), 0.4, sweep_chunk=1)
            .to_pandas()
            .sort_values(["id_a", "id_b"], ignore_index=True)
        )
        assert base[["id_a", "id_b"]].values.tolist() == chunked[["id_a", "id_b"]].values.tolist()
        np.testing.assert_allclose(base["sim"].to_numpy(), chunked["sim"].to_numpy(), atol=1e-12)

    def test_lsh_cross_check_vs_exact_sf001(self, ray_session):
        """The scale path vs its exact twin on the driver's own table at
        sf0.01: every LSH pair must be an exact pair (precision 1.0 — the
        within-bucket compare is exact) and 16x4-bit tables must recall
        >= 0.9 of them at the driver query's threshold."""
        import ray.data as rd

        from geodistpy_ray.stages.ann import (
            embedding_near_dup_pairs,
            exact_near_dup_pairs,
        )

        SF = "/root/testdata/sf0.01"
        emb = lambda: rd.read_parquet(
            f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        t = 0.40
        ex = exact_near_dup_pairs(emb(), t).to_pandas()
        ls = embedding_near_dup_pairs(
            emb(), threshold=t, n_bits=4, n_tables=16
        ).to_pandas()
        E = set(zip(ex["id_a"], ex["id_b"]))
        L = set(zip(ls["id_a"], ls["id_b"]))
        assert len(E) > 0
        assert L <= E
        assert len(L & E) / len(E) >= 0.9


def test_ivf_ann_recall_vs_exact(ray_session):
    import duckdb
    import ray.data as rd

    from geodistpy_ray.stages.ann import ann_topk, ivf_ann_topk

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    q = con.execute(
        f"SELECT embedding FROM read_parquet('{sf}/embeddings.parquet') WHERE vec_id < 5 ORDER BY vec_id"
    ).fetchall()
    con.close()
    qm = np.array([r[0] for r in q], dtype=np.float64)
    emb = rd.read_parquet(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    exact = ann_topk(emb, qm, k=10).to_pandas()
    kw = dict(k=10, n_centroids=8, n_probe=4, n_assign=3, train_sample=512)
    ivf = ivf_ann_topk(emb, qm, **kw).to_pandas()
    # deterministic across runs
    ivf2 = ivf_ann_topk(emb, qm, **kw).to_pandas()
    import pandas as pd
    pd.testing.assert_frame_equal(
        ivf.sort_values(["query_id", "rank"], ignore_index=True),
        ivf2.sort_values(["query_id", "rank"], ignore_index=True),
    )

    def mean_recall(approx):
        recalls = []
        for j in range(5):
            e = set(exact[exact.query_id == j]["vec_id"])
            a = set(approx[approx.query_id == j]["vec_id"])
            recalls.append(len(e & a) / len(e))
        return float(np.mean(recalls))

    # the recall_bench configuration (farthest-point init + multi-assign)
    # must clear the documented floor
    assert mean_recall(ivf) >= 0.9, ivf
    # multi-assignment is the recall lever: dropping to single assignment
    # with the same probes must not beat it
    ivf1 = ivf_ann_topk(
        emb, qm, k=10, n_centroids=8, n_probe=4, n_assign=1, train_sample=512
    ).to_pandas()
    assert mean_recall(ivf1) <= mean_recall(ivf) + 1e-9
    # each query's own vector is its nearest neighbor and must survive probing
    for j in range(5):
        top = ivf[(ivf.query_id == j) & (ivf["rank"] == 1)]["vec_id"].iloc[0]
        assert top == j


def test_ivf_train_requires_enough_samples(ray_session):
    from geodistpy_ray.stages.ann import train_ivf_centroids

    with pytest.raises(ValueError, match="sample rows"):
        train_ivf_centroids(np.ones((4, 8)), n_centroids=8)


def test_recall_floors_vs_exact(ray_session):
    """Measured recall of the approximate search paths vs the exact oracle
    must not regress below pinned floors (measured values at sf0.01:
    lsh(6 bits, 8 tables)=0.44, lsh(4,16)=0.92, ivf(8 cent, 3 probe)=0.92 —
    see scripts/recall_bench.py and BASELINE.md)."""
    import duckdb
    import numpy as np
    import ray.data as rd

    from geodistpy_ray.stages.ann import ann_topk, ivf_ann_topk, lsh_ann_topk

    SF = "/root/testdata/sf0.001"
    q = duckdb.sql(
        f"SELECT vec_id, embedding FROM read_parquet('{SF}/embeddings.parquet') "
        "WHERE vec_id < 5 ORDER BY vec_id"
    ).fetchall()
    qm = np.array([r[1] for r in q], dtype=np.float64)
    emb = lambda: rd.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])

    def sets(ds):
        df = ds.to_pandas()
        return {int(k): set(g["vec_id"]) for k, g in df.groupby("query_id")}

    exact = sets(ann_topk(emb(), qm, k=10))

    def recall(ds):
        ap = sets(ds)
        return float(np.mean([len(exact[i] & ap.get(i, set())) / 10 for i in exact]))

    assert recall(lsh_ann_topk(emb(), qm, k=10, n_bits=6, n_tables=8)) >= 0.30
    assert recall(lsh_ann_topk(emb(), qm, k=10, n_bits=4, n_tables=16)) >= 0.80
    assert recall(ivf_ann_topk(emb(), qm, k=10, n_centroids=8, n_probe=3)) >= 0.80


def test_grouped_vector_mean_matches_numpy(emb_data, ray_session):
    import duckdb

    from geodistpy_ray.stages.ann import grouped_vector_mean

    df = duckdb.sql(
        f"SELECT label, embedding FROM read_parquet('{SF}/embeddings.parquet')"
    ).df()
    out = grouped_vector_mean(
        _lbl_ds().repartition(5), key_col="label"
    ).to_pandas()
    labels = sorted(df["label"].unique())
    for lbl in labels:
        m = np.stack(df[df["label"] == lbl]["embedding"].to_numpy()).astype(np.float64)
        exp = np.round(m.mean(axis=0), 6)
        got = out[out["label"] == lbl].sort_values("dim")["mean_v"].to_numpy()
        assert np.allclose(got, exp, atol=1e-9)


def _lbl_ds():
    import ray.data as rd

    return rd.read_parquet(f"{SF}/embeddings.parquet", columns=["label", "embedding"])


class TestQuantizedAnn:
    def test_quantization_error_bound(self, ray_session):
        import ray.data as rd

        from geodistpy_ray.stages.ann import _emb_matrix, _normalize, quantize_embeddings

        rng = np.random.default_rng(13)
        m = rng.standard_normal((200, 32))
        tbl = pa.table(
            {
                "vec_id": np.arange(200, dtype=np.int64),
                "embedding": [row for row in m],
            }
        )
        out = quantize_embeddings(rd.from_arrow(tbl)).to_pandas().sort_values("vec_id")
        assert "embedding" not in out.columns  # float column replaced
        codes = np.stack(out["emb_q"].to_numpy())
        scale = out["emb_scale"].to_numpy().astype(np.float64)
        recon = codes.astype(np.float64) * scale[:, None]
        want = _normalize(m)
        # per-dimension error bounded by scale/2 (+ float32 scale rounding)
        assert np.abs(recon - want).max() <= (scale.max() / 2) * 1.01
        assert codes.dtype == np.int8 and np.abs(codes).max() == 127

    def test_recall_vs_exact_and_partition_independence(self, ray_session):
        import duckdb
        import ray.data as rd

        from geodistpy_ray.stages.ann import ann_topk, ann_topk_quantized, quantize_embeddings

        SF = "/root/testdata/sf0.001"
        q = duckdb.sql(
            f"SELECT vec_id, embedding FROM read_parquet('{SF}/embeddings.parquet') "
            "WHERE vec_id < 5 ORDER BY vec_id"
        ).fetchall()
        qm = np.array([r[1] for r in q], dtype=np.float64)
        emb = lambda n: rd.read_parquet(
            f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"]
        ).repartition(n)

        def sets(ds):
            df = ds.to_pandas()
            return {int(k): set(g["vec_id"]) for k, g in df.groupby("query_id")}

        exact = sets(ann_topk(emb(2), qm, k=10))
        got1 = sets(ann_topk_quantized(quantize_embeddings(emb(2)), qm, k=10))
        got7 = sets(ann_topk_quantized(quantize_embeddings(emb(7)), qm, k=10))
        assert got1 == got7  # partitioning cannot change the result set
        recall = float(np.mean([len(exact[i] & got1[i]) / 10 for i in exact]))
        assert recall >= 0.9, recall


class TestEmbeddingPca:
    def test_matches_full_numpy_pca(self, ray_session):
        import ray.data as rd

        from geodistpy_ray.stages.ann import embedding_pca

        rng = np.random.default_rng(67)
        n, d = 400, 16
        # anisotropic cloud: two dominant directions
        base = rng.normal(size=(n, d)) @ np.diag(np.linspace(3.0, 0.1, d))
        tbl = pa.table(
            {
                "vec_id": pa.array(np.arange(n), pa.int64()),
                "embedding": pa.array(list(base.astype(np.float32)), pa.list_(pa.float32())),
            }
        )
        proj, evr = embedding_pca(
            rd.from_arrow(tbl).repartition(5), n_components=3, round_to=None
        )
        got = proj.to_pandas().sort_values("vec_id", ignore_index=True)
        x = base.astype(np.float32).astype(np.float64)
        xc = x - x.mean(axis=0)
        cov = xc.T @ xc / (n - 1)
        evals, evecs = np.linalg.eigh(cov)
        order = np.argsort(evals)[::-1][:3]
        w = evecs[:, order]
        for j in range(3):
            i = int(np.argmax(np.abs(w[:, j])))
            if w[i, j] < 0:
                w[:, j] = -w[:, j]
        want = xc @ w
        for j, nm in enumerate(["pc1", "pc2", "pc3"]):
            np.testing.assert_allclose(got[nm].to_numpy(), want[:, j], atol=1e-8)
        np.testing.assert_allclose(
            evr, np.maximum(evals[order], 0) / np.trace(cov), atol=1e-12
        )
        assert evr[0] >= evr[1] >= evr[2] > 0

    def test_partition_independence(self, ray_session):
        import ray.data as rd

        from geodistpy_ray.stages.ann import embedding_pca

        rng = np.random.default_rng(71)
        n, d = 200, 8
        x = rng.normal(size=(n, d))
        tbl = pa.table(
            {
                "vec_id": pa.array(np.arange(n), pa.int64()),
                "embedding": pa.array(list(x), pa.list_(pa.float64())),
            }
        )
        a = embedding_pca(rd.from_arrow(tbl).repartition(2))[0].to_pandas()
        b = embedding_pca(rd.from_arrow(tbl).repartition(9))[0].to_pandas()
        a = a.sort_values("vec_id", ignore_index=True)
        b = b.sort_values("vec_id", ignore_index=True)
        np.testing.assert_allclose(a["pc1"], b["pc1"], atol=1e-9)
        np.testing.assert_allclose(a["pc2"], b["pc2"], atol=1e-9)
        with pytest.raises(ValueError, match=">= 2 vectors"):
            embedding_pca(rd.from_arrow(tbl.slice(0, 1)))


def test_knn_graph_matches_bruteforce_and_guards(ray_session):
    import ray.data as rd

    from geodistpy_ray.stages.ann import knn_graph

    rng = np.random.default_rng(109)
    n, d, k = 120, 8, 4
    x = rng.normal(size=(n, d))
    ids = rng.permutation(n).astype(np.int64) * 7 + 3  # non-contiguous ids
    tbl = pa.table(
        {
            "vec_id": pa.array(ids),
            "embedding": pa.array(list(x), pa.list_(pa.float64())),
        }
    )
    got = (
        knn_graph(rd.from_arrow(tbl).repartition(5), k=k)
        .to_pandas()
        .sort_values(["vec_id", "rank"], ignore_index=True)
    )
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    sims = xn @ xn.T
    for i in range(n):
        order = sorted(
            (j for j in range(n) if j != i),
            key=lambda j: (-round(sims[j, i], 6), ids[j]),
        )[:k]
        want = [ids[j] for j in order]
        rows = got[got["vec_id"] == ids[i]].sort_values("rank")
        assert rows["nbr_id"].tolist() == want, ids[i]
    assert (got.groupby("vec_id").size() == k).all()
    # self never appears
    assert (got["vec_id"] != got["nbr_id"]).all()
    # over budget: "raise" keeps the hard error; the default auto-delegates
    # to the blocked path and must return the IDENTICAL edge list
    with pytest.raises(ValueError, match="budget"):
        knn_graph(rd.from_arrow(tbl), k=2, max_rows=10, over_budget="raise")
    auto = (
        knn_graph(rd.from_arrow(tbl).repartition(5), k=k, max_rows=10)
        .to_pandas()
        .sort_values(["vec_id", "rank"], ignore_index=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(auto[got.columns], got)


def test_knn_graph_blocked_matches_broadcast_above_budget(ray_session):
    """The distributed path must (a) produce the broadcast path's exact edge
    list, and (b) keep working on a corpus ABOVE knn_graph's broadcast
    budget, where the broadcast path refuses."""
    import pandas as pd
    import ray.data as rd

    from geodistpy_ray.stages.ann import knn_graph, knn_graph_blocked

    rng = np.random.default_rng(211)
    n, d, k = 400, 8, 3
    x = rng.normal(size=(n, d))
    ids = rng.permutation(n).astype(np.int64) * 3 + 11
    tbl = pa.table(
        {
            "vec_id": pa.array(ids),
            "embedding": pa.array(list(x), pa.list_(pa.float64())),
        }
    )
    ds = rd.from_arrow(tbl).repartition(7)
    a = (
        knn_graph(ds, k=k)
        .to_pandas()
        .sort_values(["vec_id", "rank"], ignore_index=True)
    )
    b = (
        knn_graph_blocked(ds, k=k, n_blocks=5)
        .to_pandas()
        .sort_values(["vec_id", "rank"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(a, b[a.columns])

    # above the broadcast budget: explicit "raise" refuses, blocked answers
    # — and matches a local numpy brute force
    with pytest.raises(ValueError, match="budget"):
        knn_graph(ds, k=k, max_rows=n - 1, over_budget="raise")
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    sims = xn @ xn.T
    for vid in ids[:20]:
        i = int(np.flatnonzero(ids == vid)[0])
        order = sorted(
            (j for j in range(n) if j != i),
            key=lambda j: (-round(sims[j, i], 6), ids[j]),
        )[:k]
        rows = b[b["vec_id"] == vid].sort_values("rank")
        assert rows["nbr_id"].tolist() == [ids[j] for j in order]
    # degenerate block counts still work (everything in one block / n=1)
    one = knn_graph_blocked(ds, k=k, n_blocks=1).to_pandas()
    pd.testing.assert_frame_equal(
        a, one.sort_values(["vec_id", "rank"], ignore_index=True)[a.columns]
    )


def test_ann_join_blocked_matches_broadcast_and_blocking(ray_session):
    """ann_join_blocked must (a) equal ann_topk on the same queries and
    (b) be independent of block-count choices (every (query, candidate)
    pair lives in exactly one pair-group regardless)."""
    import pandas as pd
    import ray.data as rd

    from geodistpy_ray.stages.ann import ann_join_blocked, ann_topk

    rng = np.random.default_rng(41)
    n, d, k = 300, 16, 4
    emb = rng.standard_normal((n, d))
    # non-contiguous ids on both sides: positions must never leak out
    cids = np.arange(n, dtype=np.int64) * 7 + 3
    corpus = pa.table({"vec_id": cids, "embedding": list(emb)})
    qpos = np.array([5, 17, 42, 160, 299])
    queries = pa.table(
        {"query_id": cids[qpos], "embedding": list(emb[qpos])}
    )

    def run(qb, cb):
        return (
            ann_join_blocked(
                rd.from_arrow(queries).repartition(3),
                rd.from_arrow(corpus).repartition(5),
                k=k,
                n_query_blocks=qb,
                n_corpus_blocks=cb,
            )
            .to_pandas()
            .sort_values(["query_id", "rank"], ignore_index=True)
        )

    got = run(4, 8)
    # broadcast reference on the identical inputs; ann_topk query ids are
    # ROW POSITIONS of the query matrix — map them to the real ids
    ref = ann_topk(rd.from_arrow(corpus), emb[qpos], k=k).to_pandas()
    ref["query_id"] = cids[qpos][ref["query_id"].to_numpy()]
    ref = ref.sort_values(["query_id", "rank"], ignore_index=True)
    pd.testing.assert_frame_equal(
        got[["query_id", "vec_id", "rank"]], ref[["query_id", "vec_id", "rank"]]
    )
    # blocking-independence incl. the degenerate single-block case
    pd.testing.assert_frame_equal(got, run(1, 1))
    pd.testing.assert_frame_equal(got, run(2, 3))


def test_ann_join_blocked_reserved_columns(ray_session):
    import ray.data as rd

    from geodistpy_ray.stages.ann import ann_join_blocked

    t = pa.table({"__pair": [1], "embedding": [[1.0, 0.0]]})
    with pytest.raises(ValueError, match="reserved"):
        ann_join_blocked(
            rd.from_arrow(t), rd.from_arrow(t), k=1, query_id_col="__pair", id_col="__pair"
        )


class TestIvfAnnJoin:
    @pytest.fixture(scope="class")
    def blob_fixture(self):
        """Clustered blobs (IVF's home turf) with non-contiguous ids."""
        rng = np.random.default_rng(97)
        n_blobs, per, d = 6, 50, 12
        centers = rng.standard_normal((n_blobs, d)) * 4.0
        x = np.concatenate(
            [c + 0.3 * rng.standard_normal((per, d)) for c in centers]
        )
        n = n_blobs * per
        ids = rng.permutation(n).astype(np.int64) * 5 + 2
        corpus = pa.table({"vec_id": ids, "embedding": list(x)})
        qpos = np.arange(0, n, 17)
        queries = pa.table(
            {"query_id": ids[qpos] + 1_000_000, "embedding": list(x[qpos])}
        )
        return corpus, queries, x, ids, qpos

    def _exact(self, corpus, queries, k):
        import ray.data as rd

        from geodistpy_ray.stages.ann import ann_join_blocked

        return (
            ann_join_blocked(
                rd.from_arrow(queries), rd.from_arrow(corpus), k=k,
                n_query_blocks=2, n_corpus_blocks=3,
            )
            .to_pandas()
            .sort_values(["query_id", "rank"], ignore_index=True)
        )

    def test_full_probe_degenerates_to_exact(self, ray_session, blob_fixture):
        """n_probe=n_centroids with n_assign=1 covers every (q, c) pair
        exactly once -> identical edge list to the exact blocked join,
        independent of sub-blocking."""
        import pandas as pd
        import ray.data as rd

        from geodistpy_ray.stages.ann import ivf_ann_join

        corpus, queries, *_ = blob_fixture
        k = 4
        exact = self._exact(corpus, queries, k)[["query_id", "vec_id", "rank"]]

        def run(ns):
            return (
                ivf_ann_join(
                    rd.from_arrow(queries).repartition(3),
                    rd.from_arrow(corpus).repartition(4),
                    k=k, n_centroids=6, n_probe=6, n_assign=1,
                    n_sub_blocks=ns,
                )
                .to_pandas()
                .sort_values(["query_id", "rank"], ignore_index=True)
            )

        got = run(1)
        pd.testing.assert_frame_equal(got[["query_id", "vec_id", "rank"]], exact)
        pd.testing.assert_frame_equal(run(3), got)

    def test_overlapping_lists_dedup(self, ray_session, blob_fixture):
        """Max overlap (every list probed AND multi-assignment) floods the
        merge with duplicate pairs; the dedup must still produce the exact
        edge list with contiguous ranks and no repeated (query, vec)."""
        import pandas as pd
        import ray.data as rd

        from geodistpy_ray.stages.ann import ivf_ann_join

        corpus, queries, *_ = blob_fixture
        k = 3
        got = (
            ivf_ann_join(
                rd.from_arrow(queries), rd.from_arrow(corpus), k=k,
                n_centroids=4, n_probe=4, n_assign=4,
            )
            .to_pandas()
            .sort_values(["query_id", "rank"], ignore_index=True)
        )
        assert not got.duplicated(["query_id", "vec_id"]).any()
        assert (got.groupby("query_id")["rank"].agg(list)
                .apply(lambda r: r == list(range(1, len(r) + 1))).all())
        exact = self._exact(corpus, queries, k)[["query_id", "vec_id", "rank"]]
        pd.testing.assert_frame_equal(got[["query_id", "vec_id", "rank"]], exact)

    def test_partial_probe_recall_floor(self, ray_session, blob_fixture):
        """The pruned configuration must keep recall >= 0.9 on the blob
        fixture while scanning ~n_probe*n_assign/n_centroids of the corpus."""
        import ray.data as rd

        from geodistpy_ray.stages.ann import ivf_ann_join

        corpus, queries, *_ = blob_fixture
        k = 5
        exact = self._exact(corpus, queries, k)
        got = ivf_ann_join(
            rd.from_arrow(queries), rd.from_arrow(corpus), k=k,
            n_centroids=8, n_probe=3, n_assign=2,
        ).to_pandas()
        truth = set(map(tuple, exact[["query_id", "vec_id"]].to_numpy()))
        found = set(map(tuple, got[["query_id", "vec_id"]].to_numpy()))
        recall = len(truth & found) / len(truth)
        assert recall >= 0.9, recall

    def test_reserved_columns(self, ray_session):
        import ray.data as rd

        from geodistpy_ray.stages.ann import ivf_ann_join

        t = pa.table({"__key": [1], "embedding": [[1.0, 0.0]]})
        with pytest.raises(ValueError, match="reserved"):
            ivf_ann_join(
                rd.from_arrow(t), rd.from_arrow(t), k=1,
                query_id_col="__key", id_col="__key",
            )


def test_two_sided_join_mixed_embedding_types(ray_session):
    """A float32 query table joined against a float64 corpus must not break
    the union shuffle — the tag step harmonizes both to list<float64>."""
    import pandas as pd
    import ray.data as rd

    from geodistpy_ray.stages.ann import ann_join_blocked, ivf_ann_join

    rng = np.random.default_rng(53)
    n, d, k = 60, 8, 3
    x = rng.standard_normal((n, d))
    ids = np.arange(n, dtype=np.int64) * 3 + 1
    corpus = pa.table({"vec_id": ids, "embedding": list(x)})
    qpos = np.array([2, 11, 40])
    q32 = pa.table(
        {
            "query_id": pa.array(ids[qpos]),
            "embedding": pa.array(
                [row.astype(np.float32) for row in x[qpos]],
                pa.list_(pa.float32()),
            ),
        }
    )
    q64 = pa.table({"query_id": ids[qpos], "embedding": list(x[qpos])})

    def norm(ds):
        return (
            ds.to_pandas()
            .sort_values(["query_id", "rank"], ignore_index=True)[
                ["query_id", "vec_id", "rank"]
            ]
        )

    got32 = norm(ann_join_blocked(rd.from_arrow(q32), rd.from_arrow(corpus), k=k))
    got64 = norm(ann_join_blocked(rd.from_arrow(q64), rd.from_arrow(corpus), k=k))
    # float32 queries may flip a >6-decimal tie, but on random data the edge
    # lists must agree
    pd.testing.assert_frame_equal(got32, got64)
    ivf32 = norm(
        ivf_ann_join(
            rd.from_arrow(q32), rd.from_arrow(corpus), k=k,
            n_centroids=4, n_probe=4, n_assign=1, train_sample=60,
        )
    )
    pd.testing.assert_frame_equal(ivf32, got64)


def test_two_sided_join_output_name_collision(ray_session):
    import ray.data as rd

    from geodistpy_ray.stages.ann import ann_join_blocked, ivf_ann_join

    t = pa.table({"query_id": [1], "embedding": [[1.0, 0.0]]})
    for fn in (ann_join_blocked, ivf_ann_join):
        with pytest.raises(ValueError, match="collides with an output"):
            fn(rd.from_arrow(t), rd.from_arrow(t), k=1, id_col="query_id")


def test_knn_graph_over_budget_validation(ray_session):
    import ray.data as rd

    from geodistpy_ray.stages.ann import knn_graph

    t = pa.table({"vec_id": [1, 2], "embedding": [[1.0, 0.0], [0.0, 1.0]]})
    with pytest.raises(ValueError, match="over_budget must be"):
        knn_graph(rd.from_arrow(t), k=1, over_budget="Raise")


def test_knn_graph_tiny_corpus_excludes_self(ray_session):
    """n <= k: the masked self-pair must vanish (emitting n-1 ranks), not
    survive as a phantom -2.0-sim edge — on both graph paths."""
    import ray.data as rd

    from geodistpy_ray.stages.ann import knn_graph, knn_graph_blocked

    x = np.eye(3) + 0.1  # 3 distinct, well-separated vectors
    tbl = pa.table(
        {"vec_id": pa.array([10, 20, 30], pa.int64()), "embedding": list(x)}
    )
    for got in (
        knn_graph(rd.from_arrow(tbl), k=3).to_pandas(),
        knn_graph_blocked(rd.from_arrow(tbl), k=3, n_blocks=2).to_pandas(),
    ):
        assert (got["vec_id"] != got["nbr_id"]).all()
        # each vector has only 2 real candidates -> exactly 2 ranks
        assert (got.groupby("vec_id").size() == 2).all()
        assert set(got["rank"]) == {1, 2}


def test_ivf_centroid_init_survives_zero_vector(ray_session):
    """A zero-norm sample row (nulls/padding) has similarity 0 to everything
    including itself; farthest-point init must not re-select it forever."""
    from geodistpy_ray.stages.ann import train_ivf_centroids

    rng = np.random.default_rng(3)
    x = np.abs(rng.standard_normal((64, 8)))  # non-negative pairwise sims
    x[7] = 0.0  # the degenerate row
    c = train_ivf_centroids(x, n_centroids=6)
    assert c.shape == (6, 8)
    # seeds must be distinct: 6 effective centroids, not a collapsed pair
    assert len(np.unique(np.round(c, 9), axis=0)) == 6


def test_id_col_output_collision_raises(ray_session):
    """An id_col named like a fixed output column would silently collapse
    the pa.table dict literal in the top-k sweeps — must refuse up front."""
    import ray.data as rd

    from geodistpy_ray.stages.ann import ann_topk, knn_graph, lsh_ann_topk

    tbl = pa.table(
        {
            "sim": pa.array([1, 2], pa.int64()),
            "nbr_id": pa.array([3, 4], pa.int64()),
            "embedding": pa.array([[1.0, 0.0], [0.0, 1.0]], pa.list_(pa.float64())),
        }
    )
    q = np.eye(2)
    with pytest.raises(ValueError, match="id_col"):
        ann_topk(rd.from_arrow(tbl), q, k=1, id_col="sim")
    with pytest.raises(ValueError, match="id_col"):
        lsh_ann_topk(rd.from_arrow(tbl), q, k=1, id_col="sim")
    with pytest.raises(ValueError, match="id_col"):
        knn_graph(rd.from_arrow(tbl), k=1, id_col="nbr_id")


def test_knn_graph_broadcast_chunked_sweep_parity(ray_session):
    """Corpus large enough that one batch × query count exceeds _SWEEP_CHUNK:
    the broadcast partial must sweep the query matrix in column chunks
    (cache-resident, no 0.8 GB sims transient) and still emit the exact
    brute-force edge list with the (-round(sim), id) tie-break."""
    import ray.data as rd

    from geodistpy_ray.stages.ann import _SWEEP_CHUNK, knn_graph

    rng = np.random.default_rng(311)
    n, d, k = 1500, 6, 3
    x = rng.normal(size=(n, d))
    ids = (rng.permutation(n).astype(np.int64) * 11 + 5)
    tbl = pa.table(
        {
            "vec_id": pa.array(ids),
            "embedding": pa.array(list(x), pa.list_(pa.float64())),
        }
    )
    ds = rd.from_arrow(tbl).repartition(2)  # ~750-row batches → multi-chunk
    assert (n // 2) * n > _SWEEP_CHUNK  # the fixture actually forces chunking
    got = (
        knn_graph(ds, k=k, max_rows=n)
        .to_pandas()
        .sort_values(["vec_id", "rank"], ignore_index=True)
    )
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    sims = np.round(xn @ xn.T, 6)
    want_rows = []
    for i in range(n):
        order = np.lexsort((ids, -sims[:, i]))
        order = order[order != i][:k]
        want_rows.append(ids[order])
    want = np.concatenate(want_rows)
    assert (got.groupby("vec_id").size() == k).all()
    by_id = got.sort_values(["vec_id", "rank"]).groupby("vec_id", sort=True)
    got_mat = np.stack([g["nbr_id"].to_numpy() for _, g in by_id])
    want_mat = np.stack(want_rows)[np.argsort(ids)]
    np.testing.assert_array_equal(got_mat, want_mat)


def test_ann_topk_int32_ids_with_empty_block(ray_session):
    """An int32 id corpus where one block is EMPTY: the typed-empty partial
    is int64, so the non-empty partials must pin ids to int64 too — mixed
    block schemas would otherwise dtype-launder in the merge shuffle."""
    import ray.data as rd

    from geodistpy_ray.stages.ann import ann_topk

    rng = np.random.default_rng(41)
    n, d = 40, 4
    x = rng.normal(size=(n, d))
    t1 = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int32), pa.int32()),
            "embedding": pa.array(list(x), pa.list_(pa.float64())),
        }
    )
    empty = t1.slice(0, 0)
    ds = rd.from_arrow([t1, empty])
    q = x[:2] + rng.normal(scale=1e-3, size=(2, d))
    out = ann_topk(ds, q, k=3).to_pandas()
    assert len(out) == 6
    assert out["vec_id"].dtype == np.int64
    # nearest neighbor of a barely-perturbed corpus vector is itself
    top = out[out["rank"] == 1].sort_values("query_id")
    assert top["vec_id"].tolist() == [0, 1]
