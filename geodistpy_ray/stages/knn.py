"""Distributed geodesic kNN (reference P9, ``distance.py:463-540``).

Strategy for a small/medium query set (the reference's own shape — one or a
few query points against a large candidate table): broadcast the query
coordinates into the map task closure, compute a vectorized candidates×Q
distance block per batch, reduce each batch to its per-query partial top-k
(k·Q rows out of B·Q computed — the combiner), then a single small
``groupby(query_id).map_groups`` merge produces the global nearest-first
top-k. The shuffle moves only ``k × Q × n_batches`` rows, never the
candidate table.

For query sets too large to broadcast, the cell-routed path applies (assign
queries and candidates to cells, ``groupby(cell)`` with boundary-ring
expansion — see ``stages/pairs.py`` for the cover-based co-grouping idiom).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..kernels import resolve_ellipsoid, unit_factor
from .geo import col_np, distance_kernel


def knn_join(
    ds,
    query_ids,
    query_lats,
    query_lons,
    k: int,
    id_col: str = "doc_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    kernel: str = "vincenty",
    metric: str = "meter",
    ellipsoid="WGS-84",
    tie_round: int | None = 6,
):
    """k nearest candidates per query → Dataset (query_id, {id_col}, dist, rank).

    ``rank`` is 1-based nearest-first (the reference's ordering contract,
    ``distance.py:533-537``). Ties are broken deterministically by
    (round(dist, tie_round), id).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    qid = np.asarray(query_ids, dtype=np.int64)
    qlat = np.asarray(query_lats, dtype=np.float64)
    qlon = np.asarray(query_lons, dtype=np.float64)
    a, f = resolve_ellipsoid(ellipsoid)
    conv = unit_factor(metric)
    kfn = distance_kernel(kernel)

    # Exact-kernel runs get a cheap haversine prune first. Provably safe:
    # haversine (mean radius) and the geodesic differ by < 0.56% relative, so
    # any true top-k candidate has haversine <= kth_haversine * 1.0056**2;
    # we keep everything within 1.013 (+1 m for degenerate zeros) and run the
    # exact kernel only on that sliver.
    prefilter = kernel in ("vincenty", "karney")

    def partial_topk(batch: pa.Table) -> pa.Table:
        from ..kernels import haversine

        lat = col_np(batch, lat_col)
        lon = col_np(batch, lon_col)
        ids = col_np(batch, id_col)
        n = lat.size
        out_q, out_i, out_d = [], [], []
        # (n, Q) distance block, one query column at a time keeps peak memory
        # at n floats regardless of Q.
        kk = min(k, n)
        for j in range(qid.size):
            if prefilter and n > 4 * kk:
                hav = haversine(lat, lon, qlat[j], qlon[j])
                hk = np.partition(hav, kk - 1)[kk - 1]
                cand = np.flatnonzero(hav <= hk * 1.013 + 1.0)
                d = kfn(lat[cand], lon[cand], qlat[j], qlon[j], a, f) * conv
                sub = np.argpartition(d, kk - 1)[:kk] if kk < cand.size else np.arange(cand.size)
                part = cand[sub]
                dpart = d[sub]
            else:
                d = kfn(lat, lon, qlat[j], qlon[j], a, f) * conv
                part = np.argpartition(d, kk - 1)[:kk] if kk < n else np.arange(n)
                dpart = d[part]
            out_q.append(np.full(part.size, qid[j], dtype=np.int64))
            out_i.append(ids[part])
            out_d.append(dpart)
        return pa.table(
            {
                "query_id": np.concatenate(out_q),
                id_col: np.concatenate(out_i),
                "dist": np.concatenate(out_d).astype(np.float64),
            }
        )

    partials = ds.map_batches(partial_topk, batch_format="pyarrow", zero_copy_batch=True)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        key = g["dist"].round(tie_round) if tie_round is not None else g["dist"]
        g = g.assign(_key=key).sort_values(["_key", id_col]).head(k).drop(columns="_key")
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")
