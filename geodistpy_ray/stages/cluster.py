"""Distributed k-means over an embedding column — the engine's iterative-
algorithm pattern (corpus-level document clustering for mixture balancing /
semantic dedup cohorts; the same loop shape a 100 TB run needs).

Each Lloyd iteration is ONE streaming pass expressed in Ray Data:

1. the current centroids are broadcast once (``ray.put`` + the per-worker
   ``get_broadcast`` cache — never re-shipped per batch);
2. ``map_batches`` assigns every vector (one matmul per batch) and emits a
   PARTIAL row per (centroid × batch): packed float64 sum vector + count +
   squared-error sum — the classic combiner, so the shuffle moves
   ``batches × k`` small rows, never the vectors;
3. the partials reduce in one bounded exchange — ``cluster_id`` is a
   bounded key domain (k ≤ a few thousand), exactly the case CLAUDE.md
   allows for a direct small groupby — and the k reduced rows land on the
   driver (k × d floats, independent of input size).

Initial centroids come from a bounded deterministic hash-rank sample
(one pass, driver holds ≤ 2·sample × d floats) refined by maximin
farthest-point seeding: partition-independent, reproducible across any
block split, no RNG (the `cap_per_key` / split-hash convention). Empty
clusters keep their previous centroid (the IVF convention in
`ann.train_ivf_centroids`).

The input Dataset re-executes per iteration (it is lazy); callers doing
many iterations over a small cleaned subset may ``materialize()`` it first
— at full corpus scale the re-read streams and the object store holds no
corpus-sized pin.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .ann import _emb_matrix
from .broadcast import get_broadcast
from .grouping import partitioned_map_groups

_RANK_MULT = np.uint64(0x9E3779B97F4A7C15)


def _id_rank(ids: np.ndarray) -> np.ndarray:
    """Deterministic per-row rank in [0, 2^64): stable across processes and
    partitionings (never Python's salted hash)."""
    return pd.util.hash_array(ids.astype(np.int64), categorize=False) * _RANK_MULT


def _init_centroids(ds, id_col: str, vec_col: str, k: int, sample: int) -> np.ndarray:
    """k seed vectors: a bounded hash-rank sample (one streaming pass —
    each batch ships at most its local top-``sample`` rows, merged
    incrementally so peak driver memory is 2·sample × d, independent of
    input size), then deterministic MAXIMIN (farthest-point) seeding on
    the sample: the smallest-rank row first, then repeatedly the sample
    row farthest from the chosen set. Plain smallest-rank seeding is
    effectively uniform-random w.r.t. cluster structure and routinely
    drops two seeds in one cluster (a Lloyd local minimum that never
    recovers); maximin is the deterministic analogue of k-means++'s
    spread objective and the same bounded-sample practice as
    `ann.train_ivf_centroids`."""

    def local(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"rank": pa.array([], pa.uint64()), "vec": pa.array([], pa.binary())})
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        x = _emb_matrix(batch, vec_col)
        r = _id_rank(ids)
        take = np.argsort(r, kind="mergesort")[:sample]
        return pa.table(
            {
                "rank": pa.array(r[take], pa.uint64()),
                "vec": pa.array([x[i].tobytes() for i in take], pa.binary()),
            }
        )

    best_r = np.empty(0, dtype=np.uint64)
    best_v: list[bytes] = []
    for b in (
        ds.map_batches(local, batch_format="pyarrow", zero_copy_batch=True)
        .iter_batches(batch_size=None, batch_format="pyarrow")
    ):
        if b.num_rows == 0:
            continue
        r = np.concatenate([best_r, b.column("rank").to_numpy(zero_copy_only=False)])
        v = best_v + b.column("vec").to_pylist()
        order = np.argsort(r, kind="mergesort")[:sample]
        best_r = r[order]
        best_v = [v[i] for i in order]
    if len(best_v) < k:
        raise ValueError(f"kmeans: need >= {k} rows, got {len(best_v)}")
    s = np.stack([np.frombuffer(v, dtype=np.float64) for v in best_v])
    chosen = [0]  # smallest rank
    d2 = np.einsum("ij,ij->i", s - s[0], s - s[0])
    for _ in range(1, k):
        nxt = int(np.argmax(d2))
        chosen.append(nxt)
        dn = np.einsum("ij,ij->i", s - s[nxt], s - s[nxt])
        np.minimum(d2, dn, out=d2)
    return s[chosen]


def _assign(x: np.ndarray, c: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """argmin_j ||x - c_j||² per row + that squared distance — one matmul;
    ||x||² is dropped from the argmin (constant per row) and restored for
    the error term."""
    cross = x @ c.T  # (n, k)
    c2 = np.einsum("ij,ij->i", c, c)
    scores = c2[None, :] - 2.0 * cross
    a = np.argmin(scores, axis=1)
    x2 = np.einsum("ij,ij->i", x, x)
    sq = np.maximum(scores[np.arange(x.shape[0]), a] + x2, 0.0)
    return a, sq


def kmeans_fit(
    ds,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 8,
    n_parts: int = 16,
    init_sample: int | None = None,
):
    """Lloyd's k-means → (centroids (k, d) float64, per-iteration inertia).

    Deterministic end to end: hash-rank sample + maximin init, exact
    integer bookkeeping; only float summation order varies with
    partitioning (asserted ~1e-9 in tests). Inertia is the SSE of the
    assignment step that produced each iteration's update (so
    ``inertia[0]`` scores the seed centroids)."""
    c = _init_centroids(ds, id_col, vec_col, k, init_sample or max(8 * k, 256))
    d = c.shape[1]
    proj = ds.select_columns([id_col, vec_col])
    inertia = []

    def reduce_part(g: pd.DataFrame) -> pd.DataFrame:
        mat = np.frombuffer(b"".join(g["sums"].tolist()), dtype=np.float64).reshape(
            len(g), d
        )
        out = (
            g.assign(_row=range(len(g)))
            .groupby("cluster_id", sort=False)
            .agg(n=("n", "sum"), sq=("sq", "sum"), _rows=("_row", list))
            .reset_index()
        )
        out["sums"] = [mat[rows].sum(axis=0).tobytes() for rows in out["_rows"]]
        return out.drop(columns="_rows")

    import ray

    for _ in range(iters):
        c_ref = ray.put(c)

        def partial(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table(
                    {
                        "cluster_id": pa.array([], pa.int64()),
                        "n": pa.array([], pa.int64()),
                        "sq": pa.array([], pa.float64()),
                        "sums": pa.array([], pa.binary()),
                    }
                )
            cc = get_broadcast(c_ref)
            x = _emb_matrix(batch, vec_col)
            a, sq = _assign(x, cc)
            order = np.argsort(a, kind="mergesort")
            sa, sx, ssq = a[order], x[order], sq[order]
            starts = np.flatnonzero(np.r_[True, sa[1:] != sa[:-1]])
            ends = np.r_[starts[1:], sa.size]
            sums = np.add.reduceat(sx, starts, axis=0)
            return pa.table(
                {
                    "cluster_id": pa.array(sa[starts], pa.int64()),
                    "n": pa.array((ends - starts).astype(np.int64), pa.int64()),
                    "sq": pa.array(np.add.reduceat(ssq, starts), pa.float64()),
                    "sums": pa.array([s.tobytes() for s in sums], pa.binary()),
                }
            )

        reduced = partitioned_map_groups(
            proj.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
            "cluster_id",
            reduce_part,
            n_parts=n_parts,
        ).take_all()
        new_c = c.copy()  # empty clusters keep their previous centroid
        sse = 0.0
        for row in reduced:
            cid, n = int(row["cluster_id"]), int(row["n"])
            sse += float(row["sq"])
            if n > 0:
                new_c[cid] = np.frombuffer(row["sums"], dtype=np.float64) / n
        inertia.append(sse)
        c = new_c
    return c, inertia


def kmeans_assign(
    ds, centroids: np.ndarray, vec_col: str = "embedding", out_col: str = "cluster"
):
    """Append each row's nearest-centroid id (and its squared distance as
    ``{out_col}_sq``) — centroids broadcast once, one matmul per batch."""
    import ray

    c_ref = ray.put(np.ascontiguousarray(centroids, dtype=np.float64))

    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column(out_col, pa.array([], pa.int64())).append_column(
                f"{out_col}_sq", pa.array([], pa.float64())
            )
        cc = get_broadcast(c_ref)
        a, sq = _assign(_emb_matrix(batch, vec_col), cc)
        return batch.append_column(out_col, pa.array(a.astype(np.int64), pa.int64())).append_column(
            f"{out_col}_sq", pa.array(sq, pa.float64())
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def semantic_dedup(
    ds,
    centroids: np.ndarray,
    eps: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_parts: int = 64,
    max_cluster_rows: int = 50_000,
    sweep_chunk: int | None = None,
):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540) keep/drop flags →
    Dataset ``(id_col, cluster, keep)``.

    The published algorithm: assign every embedding to its nearest
    centroid, order each cluster by similarity to the centroid ASCENDING
    (so the survivor of a duplicate chain is the cluster's most "edge-like"
    example, the paper's keep rule; ties broken by id for determinism), and
    drop a row iff ANY earlier row of its cluster has cosine similarity
    ≥ ``eps`` — the triu-max rule of the reference implementation, which is
    embarrassingly parallel within a cluster (no sequential keep-set
    dependence).

    Scale shape: centroids broadcast once (``kmeans_assign``), then ONE
    hash-partition shuffle on the bounded cluster id; inside a partition
    each cluster is swept vectorized in cache-resident chunks (peak
    ``sweep_chunk`` sim elements per matmul). Per-cluster work is O(m²d/2)
    — the paper's own cost — so ``max_cluster_rows`` raises with
    increase-k guidance before a mega-cluster can quadratically blow up a
    task (the LSH mega-bucket convention, stages/dedup.py).
    """
    from .ann import _SWEEP_CHUNK, _normalize

    if sweep_chunk is None:
        sweep_chunk = _SWEEP_CHUNK
    assigned = kmeans_assign(
        ds.select_columns([id_col, vec_col]), centroids, vec_col=vec_col
    )

    def part_fn(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "cluster": pa.array([], pa.int64()),
                "keep": pa.array([], pa.bool_()),
            }
        )
        if t.num_rows == 0:
            return empty
        # cluster_sq DESCENDING == similarity-to-centroid ascending (the
        # sweep order the keep rule is defined over)
        t = t.sort_by(
            [("cluster", "ascending"), ("cluster_sq", "descending"), (id_col, "ascending")]
        )
        cl = t.column("cluster").to_numpy(zero_copy_only=False)
        x = _normalize(_emb_matrix(t, vec_col))
        keep = np.ones(t.num_rows, dtype=bool)
        starts = np.flatnonzero(np.r_[True, cl[1:] != cl[:-1]])
        ends = np.r_[starts[1:], cl.size]
        for s, e in zip(starts, ends):
            m = e - s
            if m > max_cluster_rows:
                raise ValueError(
                    f"semantic_dedup: cluster {int(cl[s])} has {m} rows "
                    f"(> max_cluster_rows={max_cluster_rows}); the per-cluster "
                    f"sweep is O(m²·d) — refit with a larger k so clusters "
                    f"shrink, or raise max_cluster_rows explicitly"
                )
            xx = x[s:e]
            step = max(1, sweep_chunk // m)
            for a in range(1, m, step):
                b = min(a + step, m)
                sims = xx[a:b] @ xx[:b].T  # (b-a, b)
                # only strictly-earlier rows count
                sims[np.arange(b)[None, :] >= np.arange(a, b)[:, None]] = -np.inf
                keep[s + a : s + b] = sims.max(axis=1) < eps
        return pa.table(
            {
                id_col: t.column(id_col),
                "cluster": t.column("cluster"),
                "keep": pa.array(keep),
            }
        )

    return partitioned_map_groups(
        assigned, "cluster", part_fn, n_parts=n_parts, part_format="pyarrow"
    )


def geo_dbscan(
    ds,
    eps_m: float,
    min_pts: int,
    id_col: str = "doc_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    cell_deg: float | None = None,
    kernel: str = "haversine",
    n_parts: int = 64,
    salt: int | str = 1,
):
    """Geodesic DBSCAN over a lat/lon point Dataset → ``(id_col,
    cluster_id, is_core)``: density clusters under the ``eps_m`` geodesic
    radius and ``min_pts`` density bar (the neighborhood COUNTS THE POINT
    ITSELF, the scikit-learn ``min_samples`` convention). Noise points —
    neither core nor within ``eps_m`` of a core — are absent from the
    output (like :func:`~.graph.connected_components`, whose singleton
    convention this inherits).

    DBSCAN's one order-dependence is border assignment (a border point in
    two clusters' reach goes to whichever core claims it first in the
    scan). This engine makes it DETERMINISTIC: a border point joins the
    MINIMUM ``cluster_id`` among its core neighbors — partition- and
    order-independent, and exactly SQL ``MIN()`` (the oracle relies on it).
    Core labels are the component MINIMUM id, inherited from
    connected_components.

    Composition (every exchange a proven bounded primitive):

    1. ``close_pairs`` — the exactly-once cell-bucketed ε-pair table
       (ONE shuffle, hot-cell salting via ``salt``);
    2. symmetrize → per-node neighbor COUNT (``grouped_sum``,
       partitioned final — node domain is corpus-scale);
    3. core flags filter; core-core edges by two bucketed SEMI-joins of
       the pair table; PLUS (core, core) self-loops so isolated cores
       (no core neighbor) surface as their own single-core clusters;
    4. ``connected_components`` over the core subgraph —
       O(log diameter) bounded rounds;
    5. borders: non-core endpoints of symmetric edges whose neighbor is a
       labeled core — one bucketed ANTI-join (vs cores) + one bucketed
       INNER join (label lookup) + a partitioned MIN.

    Never materializes points or pairs on the driver; shuffle volume is
    O(|pairs|) throughout — the ε-graph itself, which any DBSCAN must ship.
    """
    from ..cells import DEFAULT_CELL_DEG
    from .graph import connected_components
    from .joins import shuffle_equi_join
    from .pairs import close_pairs
    from .relational import grouped_minmax, grouped_sum

    if min_pts < 1:
        raise ValueError("geo_dbscan: min_pts must be >= 1")
    if cell_deg is None:
        cell_deg = DEFAULT_CELL_DEG

    # The ε-pair table feeds FOUR consumers (degree count, two semi-joins,
    # the border sweep); a lazy Dataset re-executes the whole ε-join per
    # consumer, so pin it once — O(|pairs|) of two int64 columns, the
    # unavoidable DBSCAN artifact (the `hits` materialize-for-reuse
    # convention, stages/graph.py).
    def narrow(batch: pa.Table) -> pa.Table:
        # per-batch select, NOT Dataset.select_columns: the lazy Project
        # skips the pair sweep's empty blocks, leaving a mixed-schema block
        # stream (stale `dist` column) that breaks the joins' side-padding
        return batch.select(["id_left", "id_right"])

    pairs = (
        close_pairs(
            ds,
            eps_m,
            id_col=id_col,
            lat_col=lat_col,
            lon_col=lon_col,
            cell_deg=cell_deg,
            kernel=kernel,
            salt=salt,
        )
        .map_batches(narrow, batch_format="pyarrow", zero_copy_batch=True)
        .materialize()
    )

    def symmetrize(batch: pa.Table) -> pa.Table:
        l = batch.column("id_left").combine_chunks()
        r = batch.column("id_right").combine_chunks()
        return pa.table(
            {"node": pa.concat_arrays([l, r]), "nbr": pa.concat_arrays([r, l])}
        )

    sym = pairs.map_batches(symmetrize, batch_format="pyarrow", zero_copy_batch=True)

    deg = grouped_sum(sym, ["node"], count_col="n_nbrs", final="partitioned")

    def core_filter(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = batch.column("n_nbrs")
        # neighborhood includes the point itself (sklearn min_samples)
        keep = pc.greater_equal(pc.add(n, 1), min_pts)
        return batch.filter(keep).select(["node"])

    # cores is consumed three times (two semi-joins, the self-loop emit)
    # and again by the border anti-join — O(#cores) of one int64 column
    cores = deg.map_batches(
        core_filter, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    # core-core edges: two bucketed semi-joins of the (narrow) pair table
    cc_edges = shuffle_equi_join(
        pairs, cores, left_key="id_left", right_key="node", join_type="left semi"
    )
    cc_edges = shuffle_equi_join(
        cc_edges, cores, left_key="id_right", right_key="node", join_type="left semi"
    )

    def self_loops(batch: pa.Table) -> pa.Table:
        n = batch.column("node")
        return pa.table({"id_left": n, "id_right": n})

    loops = cores.map_batches(self_loops, batch_format="pyarrow", zero_copy_batch=True)
    labels = connected_components(
        cc_edges.union(loops),
        src_col="id_left",
        dst_col="id_right",
        node_col=id_col,
        out_col="cluster_id",
        n_parts=n_parts,
    )

    # borders: symmetric edges whose NODE is non-core — label lookup on the
    # nbr side keeps only rows whose neighbor is a labeled core
    non_core = shuffle_equi_join(
        sym, cores, left_key="node", right_key="node", join_type="left anti"
    )
    reached = shuffle_equi_join(
        non_core, labels, left_key="nbr", right_key=id_col, join_type="inner"
    )
    border_min = grouped_minmax(
        reached, ["node"], "cluster_id", final="partitioned"
    )

    def finish_core(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: batch.column(id_col).cast(pa.int64()),
                "cluster_id": batch.column("cluster_id").cast(pa.int64()),
                "is_core": pa.array(np.ones(batch.num_rows, dtype=bool)),
            }
        )

    def finish_border(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: batch.column("node").cast(pa.int64()),
                "cluster_id": batch.column("min_value").cast(pa.int64()),
                "is_core": pa.array(np.zeros(batch.num_rows, dtype=bool)),
            }
        )

    out_core = labels.map_batches(finish_core, batch_format="pyarrow", zero_copy_batch=True)
    out_border = border_min.map_batches(
        finish_border, batch_format="pyarrow", zero_copy_batch=True
    )
    return out_core.union(out_border)
