"""Geodesic radius join (reference P8 ``point_in_radius``, ``distance.py:390-457``).

Centers are broadcast into the map closure; each candidate batch is filtered
vectorized with **boundary-inclusive** semantics (``dist <= radius``,
``distance.py:453``). A cheap bounding-box prune (conservative
degrees-per-meter bound, same math as ``cells.disc_cover``) skips the exact
kernel for candidates that cannot be in range — at 100 TB scale this is the
difference between one exact geodesic solve per (row × center) and one per
plausible pair.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..cells import prune_band
from ..kernels import resolve_ellipsoid, unit_factor
from .geo import col_np, distance_kernel


def radius_join(
    ds,
    center_ids,
    center_lats,
    center_lons,
    radius,
    id_col: str = "doc_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    kernel: str = "vincenty",
    metric: str = "meter",
    ellipsoid="WGS-84",
):
    """Rows within ``radius`` of each center → Dataset (query_id, {id_col}, dist)."""
    radius = float(radius)
    if radius < 0:
        raise ValueError("radius must be non-negative")
    cid = np.asarray(center_ids, dtype=np.int64)
    clat = np.asarray(center_lats, dtype=np.float64)
    clon = np.asarray(center_lons, dtype=np.float64)
    a, f = resolve_ellipsoid(ellipsoid)
    conv = unit_factor(metric)
    kfn = distance_kernel(kernel)
    radius_m = radius / conv
    # Conservative prune box in degrees (superset of the geodesic disc) —
    # ONE derivation shared with cells.disc_cover (the two copies drifted
    # once; see cells.prune_band). Without the longitude bound, a 10 km
    # query runs the exact kernel on every point worldwide inside a
    # 0.2°-tall, 360°-wide strip.
    dlat_deg, dlon_deg, full_ring = prune_band(clat, radius_m)

    def fn(batch: pa.Table) -> pa.Table:
        lat = col_np(batch, lat_col)
        lon = col_np(batch, lon_col)
        ids = col_np(batch, id_col)
        out_q, out_i, out_d = [], [], []
        for j in range(cid.size):
            near = np.abs(lat - clat[j]) <= dlat_deg
            if not full_ring[j]:
                dlon = np.abs(((lon - clon[j] + 180.0) % 360.0) - 180.0)
                near &= dlon <= dlon_deg[j]
            if not near.any():
                continue
            d = kfn(lat[near], lon[near], clat[j], clon[j], a, f) * conv
            m = d <= radius
            if not m.any():
                continue
            out_q.append(np.full(int(m.sum()), cid[j], dtype=np.int64))
            out_i.append(ids[near][m])
            out_d.append(d[m])
        if not out_q:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    id_col: pa.array([], pa.int64()),
                    "dist": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "query_id": np.concatenate(out_q),
                id_col: np.concatenate(out_i),
                "dist": np.concatenate(out_d),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def radius_join_cells(
    ds,
    queries_ds,
    radius,
    id_col: str = "doc_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    cell_deg: float | None = None,
    kernel: str = "vincenty",
    metric: str = "meter",
    ellipsoid="WGS-84",
):
    """Cell-routed radius join for *large* query sets (both sides Datasets).

    The scale path for P8: candidates are tagged into their own grid cell;
    each query is replicated to every cell of its ``disc_cover`` (a
    guaranteed superset of the geodesic disc), and ONE ``groupby(cell)``
    co-groups them. The exact boundary-inclusive test (``dist <= radius``,
    reference ``distance.py:453``) runs vectorized inside each cell group.
    No second pass and no pair dedup are needed: a candidate lives in
    exactly one cell, so each (query, candidate) pair is tested exactly once.

    ``queries_ds``: Dataset with columns (query_id, lat, lon).
    Returns (query_id, {id_col}, dist).
    """
    from ..cells import DEFAULT_CELL_DEG, cell_id, disc_cover

    radius = float(radius)
    if radius < 0:
        raise ValueError("radius must be non-negative")
    cell_deg = cell_deg if cell_deg is not None else DEFAULT_CELL_DEG
    a, f = resolve_ellipsoid(ellipsoid)
    conv = unit_factor(metric)
    kfn = distance_kernel(kernel)
    radius_m = radius / conv

    def cand_rows(batch: pa.Table) -> pa.Table:
        lat = col_np(batch, lat_col)
        lon = col_np(batch, lon_col)
        return pa.table(
            {
                "cell": cell_id(lat, lon, cell_deg),
                "rid": col_np(batch, id_col),
                "rlat": lat,
                "rlon": lon,
                "is_query": np.zeros(batch.num_rows, dtype=bool),
            }
        )

    def query_rows(batch: pa.Table) -> pa.Table:
        lat = col_np(batch, "lat")
        lon = col_np(batch, "lon")
        qid = col_np(batch, "query_id")
        src, cover = disc_cover(lat, lon, radius_m, cell_deg)
        return pa.table(
            {
                "cell": cover,
                "rid": qid[src],
                "rlat": lat[src],
                "rlon": lon[src],
                "is_query": np.ones(src.size, dtype=bool),
            }
        )

    import pandas as pd

    both = ds.map_batches(cand_rows, batch_format="pyarrow", zero_copy_batch=True).union(
        queries_ds.map_batches(query_rows, batch_format="pyarrow", zero_copy_batch=True)
    )

    member_chunk = 4096

    def local_filter(g: pd.DataFrame) -> pd.DataFrame:
        isq = g["is_query"].to_numpy()
        q, c = g[isq], g[~isq]
        empty = pd.DataFrame({"query_id": [], id_col: [], "dist": []}).astype(
            {"query_id": np.int64, id_col: np.int64, "dist": np.float64}
        )
        if q.empty or c.empty:
            return empty
        clat, clon, cids = c["rlat"].to_numpy(), c["rlon"].to_numpy(), c["rid"].to_numpy()
        qlat, qlon, qids = q["rlat"].to_numpy(), q["rlon"].to_numpy(), q["rid"].to_numpy()
        # chunked (query × candidate) kernel blocks, cache-resident (~256k
        # elements) on both axes — the knn.py local_topk idiom; one kernel
        # call per block instead of one call + one DataFrame PER QUERY
        q_chunk = max(1, int(256_000 // member_chunk))
        out_q, out_i, out_d = [], [], []
        for cs in range(0, cids.size, member_chunk):
            ce = min(cs + member_chunk, cids.size)
            for q0 in range(0, qids.size, q_chunk):
                qi = slice(q0, q0 + q_chunk)
                # candidates stay the FIRST kernel operand (as the per-query
                # loop had it): the SQL mirror fixes that fp orientation
                d = kfn(
                    clat[cs:ce][None, :], clon[cs:ce][None, :],
                    qlat[qi][:, None], qlon[qi][:, None], a, f,
                ) * conv
                ri, ci = np.nonzero(d <= radius)
                if ri.size:
                    out_q.append(qids[qi][ri])
                    out_i.append(cids[cs:ce][ci])
                    out_d.append(d[ri, ci])
        if not out_q:
            return empty
        return pd.DataFrame(
            {
                "query_id": np.concatenate(out_q),
                id_col: np.concatenate(out_i),
                "dist": np.concatenate(out_d),
            }
        )

    # hash-partition the cells (bounded group count, see stages/grouping.py)
    # and sweep each cell's span inside the partition
    from .grouping import map_key_spans, partitioned_map_groups

    return partitioned_map_groups(
        both, "cell", lambda g: map_key_spans(g, "cell", local_filter), n_parts=128
    )
