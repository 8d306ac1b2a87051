"""Close-pair table: the scalable replacement for pdist/cdist matrices.

The reference materializes O(N²) distance matrices
(``/root/reference/geodistpy/geodesic.py:243-276``) — its stated scalability
wall. Here ``geodist_matrix`` semantics become a *pair table*
``(id_left, id_right, dist)`` restricted to pairs within ``max_dist_m``,
produced by a cell-bucketed self-join:

1. every point is replicated to the cells of its ``disc_cover(max_dist_m)``
   (flat-map, marking the row's own cell as *primary*),
2. ``groupby(cell)`` co-groups each point with every point that could be
   within range,
3. inside each group, distances are computed primaries × members
   vectorized, and a pair (i, j) is emitted **only** from the group that is
   i's own cell with ``id_i < id_j`` — each unordered pair lands in exactly
   one group, so no dedup shuffle is needed (proof: if d(i,j) ≤ r, then j's
   disc cover includes i's own cell).

Skew note (SURVEY.md §7.5): hot cells (cities) bound group size; pick
``cell_deg`` ≤ the max-dist scale and cap per-group work by chunking the
member axis inside the group function (local, no extra shuffle).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..cells import DEFAULT_CELL_DEG, cell_id, disc_cover
from ..kernels import resolve_ellipsoid, unit_factor
from .geo import col_np, distance_kernel


def close_pairs(
    ds,
    max_dist_m: float,
    id_col: str = "doc_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    cell_deg: float = DEFAULT_CELL_DEG,
    kernel: str = "vincenty",
    metric: str = "meter",
    ellipsoid="WGS-84",
    member_chunk: int = 4096,
    salt: int = 1,
):
    """All pairs with geodesic distance ≤ max_dist_m → (id_left, id_right, dist).

    ``salt`` splits every cell's *primary* rows into ``salt`` hash subgroups
    and replicates the candidate side into each — the explicit hot-cell
    (city) skew treatment the north rule requires: a cell with C points
    costs max(P/S)·C per group instead of P·C in one. Exactly-once pair
    emission is preserved (a pair is still owned by the left point's unique
    (cell, salt-of-left) group). Candidate replication is ×S, so production
    applies salting per-cell from a stats pass; here it is a global knob.
    """
    a, f = resolve_ellipsoid(ellipsoid)
    conv = unit_factor(metric)
    kfn = distance_kernel(kernel)
    salt = int(salt)
    if salt < 1:
        raise ValueError("salt must be >= 1")

    def _salt_of(ids: np.ndarray) -> np.ndarray:
        return ((ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(32)).astype(
            np.int64
        ) % salt

    def replicate(batch: pa.Table) -> pa.Table:
        lat = col_np(batch, lat_col)
        lon = col_np(batch, lon_col)
        ids = col_np(batch, id_col)
        own = cell_id(lat, lon, cell_deg)
        src, cover = disc_cover(lat, lon, max_dist_m, cell_deg)
        if salt == 1:
            return pa.table(
                {
                    "cell": cover,
                    id_col: ids[src],
                    lat_col: lat[src],
                    lon_col: lon[src],
                    "is_primary": own[src] == cover,
                }
            )
        # replicate each covered (row, cell) into all salt subgroups;
        # primary only in the row's own (cell, salt-of-id) subgroup
        s_of = _salt_of(ids)
        reps = np.arange(salt, dtype=np.int64)
        n = src.size
        src_r = np.repeat(src, salt)
        cover_r = np.repeat(cover, salt)
        salt_r = np.tile(reps, n)
        return pa.table(
            {
                "cell": cover_r * salt + salt_r,
                id_col: ids[src_r],
                lat_col: lat[src_r],
                lon_col: lon[src_r],
                "is_primary": (own[src_r] == cover_r) & (s_of[src_r] == salt_r),
            }
        )

    replicated = ds.map_batches(replicate, batch_format="pyarrow", zero_copy_batch=True)

    def group_pairs(g: pd.DataFrame) -> pd.DataFrame:
        prim = g[g["is_primary"].to_numpy()]
        if prim.empty:
            return pd.DataFrame({"id_left": [], "id_right": [], "dist": []}).astype(
                {"id_left": np.int64, "id_right": np.int64, "dist": np.float64}
            )
        p_ids = prim[id_col].to_numpy()
        p_lat = prim[lat_col].to_numpy()
        p_lon = prim[lon_col].to_numpy()
        m_ids = g[id_col].to_numpy()
        m_lat = g[lat_col].to_numpy()
        m_lon = g[lon_col].to_numpy()
        thr = max_dist_m * conv
        out_l, out_r, out_d = [], [], []
        # (P, chunk) fully-vectorized distance blocks; member_chunk caps peak
        # memory in hot (city) cells without an extra shuffle.
        for s in range(0, m_ids.size, member_chunk):
            mi = m_ids[s : s + member_chunk]
            ml = m_lat[s : s + member_chunk]
            mo = m_lon[s : s + member_chunk]
            d = kfn(p_lat[:, None], p_lon[:, None], ml[None, :], mo[None, :], a, f) * conv
            mask = (d <= thr) & (p_ids[:, None] < mi[None, :])
            li, ri = np.nonzero(mask)
            if li.size:
                out_l.append(p_ids[li])
                out_r.append(mi[ri])
                out_d.append(d[li, ri])
        if not out_l:
            return pd.DataFrame({"id_left": [], "id_right": [], "dist": []}).astype(
                {"id_left": np.int64, "id_right": np.int64, "dist": np.float64}
            )
        return pd.DataFrame(
            {
                "id_left": np.concatenate(out_l),
                "id_right": np.concatenate(out_r),
                "dist": np.concatenate(out_d),
            }
        )

    # group on a hash PARTITION of cell (bounded group count, see
    # stages/grouping.py): each partition sorts by cell once and runs the
    # per-cell pair sweep over plain slices
    from .grouping import map_key_spans, partitioned_map_groups

    return partitioned_map_groups(
        replicated, "cell", lambda g: map_key_spans(g, "cell", group_pairs), n_parts=128
    )


def distance_table(
    ds,
    point_ids,
    point_lats,
    point_lons,
    id_col: str = "doc_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    kernel: str = "vincenty",
    metric: str = "meter",
    ellipsoid="WGS-84",
):
    """D2 ``cdist`` as a streaming pair table: every row × every broadcast
    point → (query_id, {id_col}, dist). The reference materializes the
    (n1, n2) matrix (`/root/reference/geodistpy/geodesic.py:261-276`); here
    the left side streams and only the small side is dense — output is rows,
    never a matrix. For two LARGE sides use the cell-bucketed joins instead.
    """
    from ..kernels import resolve_ellipsoid, unit_factor
    from .geo import col_np, distance_kernel

    qid = np.asarray(point_ids, dtype=np.int64)
    qlat = np.asarray(point_lats, dtype=np.float64)
    qlon = np.asarray(point_lons, dtype=np.float64)
    a, f = resolve_ellipsoid(ellipsoid)
    conv = unit_factor(metric)
    kfn = distance_kernel(kernel)

    def fn(batch: pa.Table) -> pa.Table:
        lat = col_np(batch, lat_col)
        lon = col_np(batch, lon_col)
        ids = col_np(batch, id_col)
        n, q = ids.size, qid.size
        d = kfn(lat[:, None], lon[:, None], qlat[None, :], qlon[None, :], a, f) * conv
        return pa.table(
            {
                "query_id": np.tile(qid, n),
                id_col: np.repeat(ids, q),
                "dist": d.ravel(),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
