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


#: Sliver-safety constants — ONE spelling of the haversine-vs-kernel proof
#: (this math has drifted between copies before: cells.prune_band exists
#: because the pole-clamp fix had to land twice). The spherical and exact
#: ellipsoid distances differ by < 0.56% relative (_KERNEL_GAP). A SPHERE
#: kth converts to a window provably containing the KERNEL top-k by paying
#: the gap twice (the sphere kth under-bounds the kernel kth, and each
#: candidate's sphere distance is off by the gap again), so the window
#: multiplier must be >= (1 + _KERNEL_GAP)^2 ~ 1.0112 — 1.013 is used.
#: Rounding-tie margins travel the gap once: inflate by >= 1 + _KERNEL_GAP
#: (1.006 is used).
_KERNEL_GAP = 0.0056
_SLIVER_WINDOW = 1.013
_TIE_INFLATE = 1.006

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

    # batch-local selections keep a rounding-margin window past the raw kth
    # (mirrors ann_topk): a candidate whose distance ROUNDS equal to the kth
    # but sits just above it must survive to the merge, which tie-breaks on
    # (round(dist, tie_round), id) — dropping it batch-locally could pick the
    # wrong id when rounded ties straddle the kth boundary.
    margin = 10.0 ** -tie_round if tie_round is not None else 0.0

    def partial_topk(batch: pa.Table) -> pa.Table:
        """Per-batch partial top-k, vectorized ACROSS queries.

        For every kernel but great_circle the candidate scan is the
        spherical LAW OF COSINES over per-batch precomputed trig (one cos
        per pair, monotone in distance → selection needs only one scalar
        arccos per query), computed for a CHUNK of queries at once — chunks
        stay ~256k matrix elements so temporaries are cache-resident (4M-
        element chunks measured 2x slower from memory-bandwidth contention).
        Selected slivers from every query in the chunk feed ONE kernel
        call; only the tiny per-query tie-window selection loops in Python.
        Sliver cuts carry +1 m absolute slack so cos/arccos rounding can
        never drop a true top-k or rounding-tie candidate.
        """
        from ..kernels.ellipsoids import EARTH_RADIUS_M

        lat = col_np(batch, lat_col)
        lon = col_np(batch, lon_col)
        ids = col_np(batch, id_col)
        n = lat.size
        kk = min(k, n)
        if n == 0 or qid.size == 0:
            # Q == 0 must short-circuit too: the chunk loop would never run
            # and np.concatenate([]) raises on the empty output lists.
            # id column: SOURCE-typed empty (slice, not a hardcoded int64) —
            # a non-int64 id corpus with one empty block would otherwise
            # mix block schemas in the merge shuffle
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    id_col: batch.column(id_col).combine_chunks().slice(0, 0),
                    "dist": pa.array([], pa.float64()),
                }
            )
        out_q, out_i, out_d = [], [], []
        chunk = max(1, int(256_000 // n))
        margin_m = margin / conv
        use_cos = kernel != "great_circle"
        if use_cos:
            latr = np.radians(lat)
            lonr = np.radians(lon)
            coslat, sinlat = np.cos(latr), np.sin(latr)
        for q0 in range(0, qid.size, chunk):
            ql = qlat[q0 : q0 + chunk]
            qo = qlon[q0 : q0 + chunk]
            qi = qid[q0 : q0 + chunk]
            c = ql.size
            if use_cos:
                qlr = np.radians(ql)[:, None]
                qor = np.radians(qo)[:, None]
                cosc = np.cos(lonr[None, :] - qor)
                cosc *= coslat[None, :] * np.cos(qlr)
                cosc += sinlat[None, :] * np.sin(qlr)
                if kk < n:
                    kth_c = np.partition(cosc, n - kk, axis=1)[:, n - kk]
                else:
                    kth_c = cosc.min(axis=1)
                kth_h = EARTH_RADIUS_M * np.arccos(np.clip(kth_c, -1.0, 1.0))
                if prefilter:
                    # exact-kernel sliver: 1.013x kth-sphere window (the
                    # <0.56% kernel-vs-sphere gap squared) + tie margin
                    cut_m = kth_h * _SLIVER_WINDOW + 1.0 + margin_m * _TIE_INFLATE
                else:
                    # kernel IS the sphere distance: kth + tie margin
                    cut_m = kth_h + margin_m + 1.0
                cut_c = np.cos(np.minimum(cut_m / EARTH_RADIUS_M, np.pi))
                qrow, ci = np.nonzero(cosc >= cut_c[:, None])
                d = kfn(lat[ci], lon[ci], ql[qrow], qo[qrow], a, f) * conv
            else:
                # broadcast, don't tile (the file's own rule): tiling
                # materializes four c·n inputs before the kernel runs
                dm = kfn(lat[None, :], lon[None, :], ql[:, None], qo[:, None], a, f) * conv
                if kk < n:
                    kth = np.partition(dm, kk - 1, axis=1)[:, kk - 1]
                    qrow, ci = np.nonzero(dm <= kth[:, None] + margin)
                else:
                    # full grid without the throwaway (c, n) bool matrix
                    qrow, ci = np.divmod(np.arange(c * n, dtype=np.int64), n)
                d = dm[qrow, ci]
            # per-query exact tie-window selection over the (superset) sliver
            counts = np.bincount(qrow, minlength=c)
            starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
            sel_parts = []
            for r in np.flatnonzero(counts):
                s, e = starts[r], starts[r] + counts[r]
                dj = d[s:e]
                if kk < dj.size:
                    kth = np.partition(dj, kk - 1)[kk - 1]
                    sel_parts.append(np.flatnonzero(dj <= kth + margin) + s)
                else:
                    sel_parts.append(np.arange(s, e))
            sel = (
                np.concatenate(sel_parts) if sel_parts else np.array([], dtype=np.int64)
            )
            out_q.append(qi[qrow[sel]])
            out_i.append(ids[ci[sel]])
            out_d.append(d[sel])
        return pa.table(
            {
                "query_id": np.concatenate(out_q),
                id_col: np.concatenate(out_i),
                "dist": np.concatenate(out_d).astype(np.float64),
            }
        )

    partials = ds.map_batches(partial_topk, batch_format="pyarrow", zero_copy_batch=True)

    # merge groups on a hash PARTITION of query_id (bounded group count —
    # see stages/grouping.py) and ranks every query in the partition with
    # one vectorized sort + cumcount
    from .grouping import partitioned_map_groups, topk_per_group_part

    def merge_part(g: pd.DataFrame) -> pd.DataFrame:
        key = g["dist"].round(tie_round) if tie_round is not None else g["dist"]
        return topk_per_group_part(
            g.assign(_key=key), "query_id", ["_key", id_col], [True, True], k, drop=["_key"]
        )

    return partitioned_map_groups(partials, "query_id", merge_part)


def _query_cell_salts(
    queries_ds,
    cell_deg: float,
    ring: int,
    target_rows: int,
    max_salt: int,
    frac_threshold: float = 0.01,
    top_n: int = 64,
) -> dict[int, int]:
    """Hot-cell salt factors for the QUERY side of the cell-routed kNN —
    the ``pairs.cell_salt_stats`` idiom, but counted over the REPLICATED
    neighbor-cell rows (each query lands in (2r+1)² cells, and that
    replicated count is the actual per-group load). Returns
    ``{cell: n_subgroups}`` for cells above both thresholds; cold cells
    stay unsalted so candidate replication is paid only where queries
    cluster. Shares :func:`~.grouping.hot_key_salts` with
    ``pairs.cell_salt_stats`` — only the per-batch key function differs."""
    from ..cells import cell_id, neighbor_cells
    from .grouping import hot_key_salts

    def batch_keys(batch: pa.Table) -> np.ndarray:
        own = cell_id(col_np(batch, "lat"), col_np(batch, "lon"), cell_deg)
        _, neigh = neighbor_cells(own, cell_deg, ring=ring)
        return neigh

    return hot_key_salts(
        queries_ds,
        ["query_id", "lat", "lon"],
        batch_keys,
        target_rows=target_rows,
        max_salt=max_salt,
        frac_threshold=frac_threshold,
        top_n=top_n,
    )


_SALT_PACK = 64  # (cell, salt) packs as cell*_SALT_PACK + salt; salts < 64


def knn_join_cells(
    ds,
    queries_ds,
    k: int,
    id_col: str = "doc_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    cell_deg: float = None,
    kernel: str = "vincenty",
    metric: str = "meter",
    ellipsoid="WGS-84",
    tie_round: int | None = 6,
    max_ring: int = 2,
    broadcast_tail_max: int = 65536,
    query_salt: int | str | None = None,
    salt_target_rows: int = 2048,
    max_salt: int = 16,
):
    """Cell-routed kNN for *large* query sets (both sides are Datasets).

    The scale path (SURVEY.md §3.2): queries and candidates are co-grouped
    by grid cell, each query gets a local top-k from its own (2r+1)²-cell
    neighborhood, and only the queries whose kth-neighbor radius crosses the
    neighborhood boundary (or that found < k locally) continue. Membership
    is decided with a conservative lower bound on the geodesic distance from
    the query to the neighborhood edge, so results are exact.

    **Expansion ladder** (nothing unbounded ever lands on the driver): the
    incomplete tail after the ring-1 pass is usually rare, but a query set
    clustered on cell boundaries (or k above typical cell population) can
    make it O(Q). So: while the tail exceeds ``broadcast_tail_max`` and
    rings remain (≤ ``max_ring``), run another cell-routed pass at the next
    ring over just the incomplete queries — the tail stays a Dataset.
    Once small, the tail is collected in ``broadcast_tail_max``-sized
    chunks through :func:`knn_join`'s broadcast-queries path (candidates
    still stream; only query coordinates are driver-held, and only a
    bounded chunk at a time).

    **Query-side skew** (``query_salt``): ``"auto"`` runs a cheap stats
    pre-pass over the replicated query cells and subgroups every hot cell
    into ``ceil(load / salt_target_rows)`` (≤ ``max_salt``) groups — queries
    split by id hash, candidates replicated per subgroup, results identical
    (each subgroup sees the full candidate set; the merge dedups ring
    overlap as before). An int applies that salt to every cell; ``None``
    (default) disables salting.

    ``queries_ds``: Dataset with columns (query_id, lat, lon).
    Returns (query_id, {id_col}, dist, rank), nearest-first.
    """
    from ..cells import (
        DEFAULT_CELL_DEG,
        MIN_M_PER_DEG_LAT,
        cell_id,
        expand_by_counts,
        neighbor_cells,
    )

    if k < 1:
        raise ValueError("k must be >= 1")
    cell_deg = cell_deg if cell_deg is not None else DEFAULT_CELL_DEG
    a, f = resolve_ellipsoid(ellipsoid)
    conv = unit_factor(metric)
    kfn = distance_kernel(kernel)
    # tie_round is interpreted in OUTPUT units on every kNN path (standalone
    # knn_join and KnnIndexActor round converted distances); internal dists
    # here ride in raw meters, so the sliver margin converts back to meters
    tie_margin_m = (10.0 ** -tie_round) / conv if tie_round is not None else 0.0

    # ── query-side skew (a hot city routes all of its queries to one cell
    # group and serializes the scan): subgroup hot cells. A query lands in
    # exactly ONE subgroup per cell (hash of query_id); candidates REPLICATE
    # into every subgroup of their cell, so each subgroup still sees the
    # full candidate set and results are identical to the unsalted run.
    if max_salt < 1 or max_salt >= _SALT_PACK:
        raise ValueError(f"max_salt must be in [1, {_SALT_PACK - 1}]")
    salt_of = None
    if query_salt == "auto":
        per_salt = _query_cell_salts(
            queries_ds, cell_deg, ring=1, target_rows=salt_target_rows, max_salt=max_salt
        )
        if per_salt:
            hot_cells = np.array(sorted(per_salt), dtype=np.int64)
            hot_salts = np.array([per_salt[int(c)] for c in hot_cells], dtype=np.int64)

            def salt_of(cells: np.ndarray) -> np.ndarray:
                out = np.ones(cells.size, dtype=np.int64)
                pos = np.minimum(
                    np.searchsorted(hot_cells, cells), hot_cells.size - 1
                )
                m = hot_cells[pos] == cells
                out[m] = hot_salts[pos[m]]
                return out

    elif isinstance(query_salt, int) and query_salt > 1:
        if query_salt >= _SALT_PACK:
            raise ValueError(f"query_salt must be < {_SALT_PACK}")
        _gs = int(query_salt)

        def salt_of(cells: np.ndarray) -> np.ndarray:
            return np.full(cells.size, _gs, dtype=np.int64)

    elif query_salt not in (None, "auto") and query_salt != 1:
        raise ValueError("query_salt must be None, 1, an int > 1, or 'auto'")

    # candidates tagged into their own cell (replicated per subgroup when
    # salted); queries replicated to ring-1 neighborhoods
    def cand_rows(batch: pa.Table) -> pa.Table:
        lat = col_np(batch, lat_col)
        lon = col_np(batch, lon_col)
        ids = col_np(batch, id_col)
        own = cell_id(lat, lon, cell_deg)
        if salt_of is None:
            key = own
        else:
            idx, salts = expand_by_counts(salt_of(own))
            key = own[idx] * _SALT_PACK + salts
            lat, lon, ids = lat[idx], lon[idx], ids[idx]
        return pa.table(
            {
                "cell": key,
                "rid": ids,
                "rlat": lat,
                "rlon": lon,
                "is_query": np.zeros(ids.size, dtype=bool),
            }
        )

    def query_rows(ring: int):
        def fn(batch: pa.Table) -> pa.Table:
            lat = col_np(batch, "lat")
            lon = col_np(batch, "lon")
            qid = col_np(batch, "query_id")
            own = cell_id(lat, lon, cell_deg)
            src, neigh = neighbor_cells(own, cell_deg, ring=ring)
            if salt_of is None:
                key = neigh
            else:
                s = salt_of(neigh)
                h = pd.util.hash_array(qid[src].astype(np.int64), categorize=False)
                key = neigh * _SALT_PACK + (h % s.astype(np.uint64)).astype(np.int64)
            return pa.table(
                {
                    "cell": key,
                    "rid": qid[src],
                    "rlat": lat[src],
                    "rlon": lon[src],
                    "is_query": np.ones(src.size, dtype=bool),
                }
            )

        return fn

    from .grouping import partitioned_map_groups, topk_per_group_part

    def local_topk_part(g: pd.DataFrame) -> pd.DataFrame:
        """Per-cell local top-k over one hash PARTITION of cells (bounded
        group count — see stages/grouping.py): the partition is sorted by
        cell once and each cell's span processed with plain array slices."""
        from .grouping import key_spans

        g = g.sort_values("cell", kind="mergesort")
        cells = g["cell"].to_numpy()
        isq_a = g["is_query"].to_numpy()
        rid_a = g["rid"].to_numpy()
        rlat_a = g["rlat"].to_numpy()
        rlon_a = g["rlon"].to_numpy()
        out_q, out_i, out_d, out_la, out_lo = [], [], [], [], []
        for s, e in zip(*key_spans(cells)):
            isq = isq_a[s:e]
            if not isq.any():
                continue
            cm = np.flatnonzero(~isq)
            qm = np.flatnonzero(isq)
            clat, clon, cids = rlat_a[s:e][cm], rlon_a[s:e][cm], rid_a[s:e][cm]
            qids_c = rid_a[s:e][qm]
            qlats_c = rlat_a[s:e][qm]
            qlons_c = rlon_a[s:e][qm]
            nc = cids.size
            if nc == 0:
                # sentinels (id -1, dist inf): keep zero-candidate queries
                # visible downstream so the expansion test can catch them
                # WITHOUT a driver-side scan of the full query set
                out_q.append(qids_c.astype(np.int64))
                out_i.append(np.full(qm.size, -1, dtype=np.int64))
                out_d.append(np.full(qm.size, np.inf))
                out_la.append(qlats_c)
                out_lo.append(qlons_c)
                continue
            kk = min(k, nc)
            # ONE kernel call per (cell × query-chunk): the same total
            # kernel work as per-query calls, minus their fixed setup
            # overhead; chunks keep the distance matrix cache-resident at
            # ~256k elements (4M-element chunks measured 2x slower from
            # memory-bandwidth contention — see CLAUDE.md), which also caps
            # hot-cell worker memory
            step = max(1, int(256_000 // nc))
            for c0 in range(0, qm.size, step):
                ql = qlats_c[c0 : c0 + step]
                qo = qlons_c[c0 : c0 + step]
                qi_ids = qids_c[c0 : c0 + step]
                cq = ql.size
                # broadcast, don't tile: materializing tiled inputs costs
                # O(nc) EXTRA per chunk, which compounds as chunks shrink
                # (the kernels broadcast natively — same idiom as
                # pairs.close_pairs)
                d = kfn(clat[None, :], clon[None, :], ql[:, None], qo[:, None], a, f)
                if kk < nc:
                    # kth-margin tie window (see knn_join.partial_topk);
                    # dist here is raw meters and tie_margin_m is the
                    # output-unit tie window converted back to meters
                    kth = np.partition(d, kk - 1, axis=1)[:, kk - 1]
                    qrow, ci = np.nonzero(d <= kth[:, None] + tie_margin_m)
                else:
                    # full grid without the throwaway (cq, nc) bool matrix
                    qrow, ci = np.divmod(np.arange(cq * nc, dtype=np.int64), nc)
                out_q.append(qi_ids[qrow].astype(np.int64))
                out_i.append(cids[ci])
                out_d.append(d[qrow, ci])
                out_la.append(ql[qrow])
                out_lo.append(qo[qrow])
        if not out_q:
            return pd.DataFrame(
                {
                    "query_id": pd.Series(dtype=np.int64),
                    id_col: pd.Series(dtype=np.int64),
                    "dist": pd.Series(dtype=np.float64),
                    "qlat": pd.Series(dtype=np.float64),
                    "qlon": pd.Series(dtype=np.float64),
                }
            )
        return pd.DataFrame(
            {
                "query_id": np.concatenate(out_q),
                id_col: np.concatenate(out_i),
                "dist": np.concatenate(out_d),
                "qlat": np.concatenate(out_la),
                "qlon": np.concatenate(out_lo),
            }
        )

    def merge_part(g: pd.DataFrame) -> pd.DataFrame:
        """Per-query merge over one hash partition of query_ids — one
        vectorized sort/cumcount for every query in the partition."""
        g = g.drop_duplicates(subset=["query_id", id_col])
        # dist is raw meters here; the tie KEY rounds in output units so the
        # cell-routed path resolves rounded ties identically to knn_join and
        # KnnIndexActor under any metric (dist itself converts downstream)
        key = (g["dist"] * conv).round(tie_round) if tie_round is not None else g["dist"]
        out = topk_per_group_part(
            g.assign(_key=key), "query_id", ["_key", id_col], [True, True], k, drop=["_key"]
        )
        # per-query completeness stats carried on every row (a sentinel in
        # the top-k means < k real neighbors were found → kth == inf)
        out["__kth"] = out.groupby("query_id", sort=False)["dist"].transform("last")
        fin = pd.Series(np.isfinite(out["dist"].to_numpy()), index=out.index)
        out["__nf"] = (
            fin.groupby(out["query_id"], sort=False).transform("sum").astype(np.int64)
        )
        return out

    from ..cells import cell_bounds

    def flag(ring: int):
        def fn(batch: pa.Table) -> pa.Table:
            qlat = batch.column("qlat").to_numpy()
            qlon = batch.column("qlon").to_numpy()
            kth = batch.column("__kth").to_numpy()
            own = cell_id(qlat, qlon, cell_deg)
            mn_lat, mx_lat, mn_lon, mx_lon = cell_bounds(own, cell_deg)
            ext = ring * cell_deg
            lat_margin = np.minimum(qlat - (mn_lat - ext), (mx_lat + ext) - qlat)
            lon_margin = np.minimum(qlon - (mn_lon - ext), (mx_lon + ext) - qlon)
            cos_lat = np.cos(np.radians(np.abs(qlat)))
            # Longitude margin uses the EXACT spherical distance from latitude
            # qlat to a meridian Δλ away — R·arcsin(sin(Δλ)·cos(φ)) — on the
            # minimum-radius sphere (a geodesic lower bound given the <0.56%
            # sphere-vs-ellipsoid gap; MIN_M_PER_DEG_LAT embeds that radius).
            # A linearized Δλ·m_per_deg·cos(φ) would OVERSTATE the bound once
            # (2r+1)·cell_deg exceeds ~10.5°, silently skipping expansion for
            # high-latitude queries on coarse grids.
            lon_rad = np.radians(np.minimum(lon_margin, 90.0))
            lon_margin_m = (
                np.arcsin(np.clip(np.sin(lon_rad) * cos_lat, 0.0, 1.0))
                * MIN_M_PER_DEG_LAT
                * (180.0 / np.pi)
            )
            margin_m = np.minimum(lat_margin * MIN_M_PER_DEG_LAT, lon_margin_m)
            # near-pole blocks don't wrap the full lon ring → force expansion
            margin_m = np.where(
                np.abs(qlat) > 90.0 - (ring + 1) * cell_deg, 0.0, margin_m
            )
            # a query is incomplete if its kth-known distance — EXTENDED by
            # the rounding-tie window, so an outside candidate that rounds
            # equal to the kth can't hide — could be beaten outside the
            # block, OR it simply found < k real neighbors inside
            # (possible with no sentinel whenever the block holds 1..k-1 rows)
            nf = batch.column("__nf").to_numpy()
            expand = (kth + tie_margin_m > margin_m) | (nf < k)
            return batch.append_column("__expand", pa.array(expand, pa.bool_()))

        return fn

    def complete_rows(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = batch.filter(pc.invert(batch.column("__expand")))
        return pa.table(
            {
                "query_id": keep.column("query_id"),
                id_col: keep.column(id_col),
                "dist": pa.array(keep.column("dist").to_numpy() * conv, pa.float64()),
                "rank": keep.column("rank"),
            }
        )

    def expansion_queries(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = pc.and_(batch.column("__expand"), pc.equal(batch.column("rank"), 1))
        e = batch.filter(m)
        return pa.table(
            {
                "query_id": e.column("query_id"),
                "lat": e.column("qlat"),
                "lon": e.column("qlon"),
            }
        )

    cands = ds.map_batches(cand_rows, batch_format="pyarrow", zero_copy_batch=True)

    def cell_pass(qds, ring: int):
        """One cell-routed pass → (complete Dataset, incomplete-query Dataset).

        The returned flagged set is materialized once because two consumers
        (complete rows + expansion tail) read it — without pinning, the whole
        pass shuffle would execute twice.
        """
        qreps = qds.map_batches(query_rows(ring), batch_format="pyarrow", zero_copy_batch=True)
        partials = partitioned_map_groups(
            cands.union(qreps), "cell", local_topk_part, n_parts=128
        )
        phase = partitioned_map_groups(partials, "query_id", merge_part)
        flagged = phase.map_batches(
            flag(ring), batch_format="pyarrow", zero_copy_batch=True
        ).materialize()
        complete = flagged.map_batches(complete_rows, batch_format="pyarrow", zero_copy_batch=True)
        exp = flagged.map_batches(expansion_queries, batch_format="pyarrow", zero_copy_batch=True)
        return complete, exp

    completes = []
    pending = queries_ds
    ring = 1
    while True:
        complete, exp = cell_pass(pending, ring)
        completes.append(complete)
        n_exp = exp.count()
        if n_exp == 0:
            out = completes[0]
            for c in completes[1:]:
                out = out.union(c)
            return out
        if n_exp > broadcast_tail_max and ring < max_ring:
            ring += 1
            pending = exp
            continue
        break

    # bounded tail: STREAM the remaining queries to the driver one
    # broadcast_tail_max-sized chunk at a time (never a full to_pandas —
    # the driver holds one chunk of (query_id, lat, lon) triples even if
    # rings were exhausted with a large tail) and run each chunk through
    # the broadcast-queries exact path. Each chunk is one extra candidate
    # scan; broadcast_tail_max trades closure size against re-scans, and
    # knn_join itself chunks queries internally so per-batch memory is
    # bounded regardless.
    for chunk in exp.iter_batches(batch_size=broadcast_tail_max, batch_format="pyarrow"):
        # metric passes through UNCHANGED: tie keys round in OUTPUT units on
        # every kNN path (a metric="meter" redo here would round ties in
        # meters and could pick a different neighbor than the cell path for
        # the same query — path-dependent output)
        redo = knn_join(
            ds,
            chunk.column("query_id").to_numpy(),
            chunk.column("lat").to_numpy(),
            chunk.column("lon").to_numpy(),
            k,
            id_col=id_col,
            lat_col=lat_col,
            lon_col=lon_col,
            kernel=kernel,
            metric=metric,
            ellipsoid=ellipsoid,
            tie_round=tie_round,
        )
        completes.append(redo)
    out = completes[0]
    for c in completes[1:]:
        out = out.union(c)
    return out



class KnnIndexActor:
    """Per-worker stateful kNN index: a sorted-latitude candidate index is
    built ONCE in ``__init__`` (from a broadcast ref), then each *query*
    batch is answered exactly via expanding latitude-band search.

    This is the SURVEY §2.4 "per-tile index actor" pattern: expensive setup
    per actor, cheap vectorized work per batch. The stream is the QUERY
    table (arbitrarily large); the candidate side must fit a worker's heap
    (broadcast), exactly like the reference's in-memory candidate array
    (``distance.py:463-540``) but answered with index pruning instead of a
    full scan per query.

    Exactness: spherical-law bound — any point within geodesic distance d of
    the query lies within ``d * (1 + SLOP) / MIN_M_PER_DEG_LAT`` degrees of
    latitude. The band expands until the kth-best distance certifies the
    remaining latitudes can't compete.
    """

    SLOP = _TIE_INFLATE - 1.0  # one-gap inflation (module constant)

    def __init__(self, cand_ref, k, kernel="vincenty", metric="meter", ellipsoid="WGS-84", tie_round=6):
        import ray

        from ..cells import MIN_M_PER_DEG_LAT

        ids, lats, lons = ray.get(cand_ref)
        order = np.argsort(lats, kind="mergesort")
        self.ids = ids[order]
        self.lats = lats[order]
        self.lons = lons[order]
        # precomputed per-candidate trig for the law-of-cosines band scan
        # (one cos() per row per query instead of a full haversine)
        latr = np.radians(self.lats)
        self.lonr = np.radians(self.lons)
        self.coslat = np.cos(latr)
        self.sinlat = np.sin(latr)
        self.k = k
        self.a, self.f = resolve_ellipsoid(ellipsoid)
        self.conv = unit_factor(metric)
        self.kfn = distance_kernel(kernel)
        self.kernel_name = kernel
        self.tie_round = tie_round
        self.m_per_deg = MIN_M_PER_DEG_LAT
        # sliver slack: +1 m absolute (degenerate zero-distance guard) plus
        # the rounding-tie margin inflated by the haversine gap, so the
        # sliver provably contains every rounding-tie candidate even at
        # coarse tie_round values
        tie_m = 10.0 ** -tie_round / self.conv if tie_round is not None else 0.0
        self._tie_m = tie_m
        self._slack = 1.0 + tie_m * _TIE_INFLATE

    #: haversine-vs-kernel relative gap (same 0.56% bound the prune uses) —
    #: converts a haversine kth into an upper bound on the kernel kth for the
    #: band-completeness certificate.
    GAP = _KERNEL_GAP

    def _sliver(self, qlat, qlon):
        """Certified candidate sliver indices for one query.

        Expands the latitude band until (a) it holds ≥ k rows and (b) the
        spherical kth — inflated by GAP to upper-bound the kernel kth —
        certifies nothing outside the band can enter the top-k. The band is
        scanned with the spherical law of cosines over precomputed trig
        (cos c is MONOTONE in distance, so kth selection and the window cut
        need no per-row arccos; one scalar arccos converts the kth to
        meters). The returned sliver (1.013× kth window, +1 m + tie-margin
        slack) is a provable superset of the kernel top-k AND its rounding
        -tie window, so the exact kernel never needs to re-certify.
        """
        from ..kernels.ellipsoids import EARTH_RADIUS_M

        n = self.ids.size
        qlatr, qlonr = np.radians(qlat), np.radians(qlon)
        qcos, qsin = np.cos(qlatr), np.sin(qlatr)
        band_deg = 2.0
        while True:
            lo = np.searchsorted(self.lats, qlat - band_deg, side="left")
            hi = np.searchsorted(self.lats, qlat + band_deg, side="right")
            if hi - lo >= min(self.k, n):
                cosc = np.cos(self.lonr[lo:hi] - qlonr)
                cosc *= self.coslat[lo:hi] * qcos
                cosc += self.sinlat[lo:hi] * qsin
                kk = min(self.k, cosc.size)
                kth_c = (
                    np.partition(cosc, cosc.size - kk)[cosc.size - kk]
                    if kk < cosc.size
                    else cosc.min(initial=1.0)
                )
                kth_h = EARTH_RADIUS_M * np.arccos(np.clip(kth_c, -1.0, 1.0))
                # certificate covers the ROUNDING-TIE window too: a
                # candidate outside the band at kernel distance within
                # tie_m of the kth must not exist, or the (round, id)
                # tie-break could pick the wrong id
                if (hi - lo == n) or (kth_h * (1.0 + self.GAP) + self._tie_m) * (
                    1.0 + self.SLOP
                ) <= band_deg * self.m_per_deg:
                    cut = min((kth_h * _SLIVER_WINDOW + self._slack) / EARTH_RADIUS_M, np.pi)
                    keep = np.flatnonzero(cosc >= np.cos(cut))
                    return keep + lo
            # hi-lo == n always certifies above, so widening is productive
            band_deg *= 2.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids = col_np(batch, "query_id")
        qlats = col_np(batch, "lat")
        qlons = col_np(batch, "lon")
        empty = pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
                "dist": pa.array([], pa.float64()),
                "rank": pa.array([], pa.int64()),
            }
        )
        if qids.size == 0 or self.ids.size == 0:
            return empty
        tie_margin = self._tie_m
        out_i, out_d, out_q = [], [], []

        def flush(jj: list[int], idx_parts: list[np.ndarray]):
            """Phases B+C for one bounded group of queries: one batched
            kernel pass over the group's slivers, then per-query top-k with
            the (round(dist), id) tie contract."""
            counts = np.fromiter((x.size for x in idx_parts), dtype=np.int64, count=len(jj))
            idx = np.concatenate(idx_parts)
            qlat_rep = np.repeat(qlats[jj], counts)
            qlon_rep = np.repeat(qlons[jj], counts)
            d_all = self.kfn(
                self.lats[idx], self.lons[idx], qlat_rep, qlon_rep, self.a, self.f
            )
            starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
            for pos, j in enumerate(jj):
                d = d_all[starts[pos] : starts[pos] + counts[pos]]
                ids = self.ids[idx_parts[pos]]
                kk = min(self.k, d.size)
                if kk == 0:
                    continue
                if kk < d.size:
                    kth = np.partition(d, kk - 1)[kk - 1]
                    part = np.flatnonzero(d <= kth + tie_margin)
                    d, ids = d[part], ids[part]
                dd = d * self.conv
                key = np.round(dd, self.tie_round) if self.tie_round is not None else dd
                order = np.lexsort((ids, key))[:kk]
                out_i.append(ids[order])
                out_d.append(dd[order])
                out_q.append(np.full(kk, qids[j], dtype=np.int64))

        # phase A (certified spherical band search) feeds bounded groups:
        # TOTAL sliver rows per flush are capped, so degenerate slivers
        # (k ≈ n, coarse tie_round) bound EVERY per-flush array — gather
        # inputs, kernel temporaries, and distances alike — instead of
        # growing with the whole query batch.
        ROW_BUDGET = 1_000_000
        pend_j: list[int] = []
        pend_idx: list[np.ndarray] = []
        rows = 0
        for j in range(qids.size):
            sliver = self._sliver(qlats[j], qlons[j])
            pend_j.append(j)
            pend_idx.append(sliver)
            rows += sliver.size
            if rows >= ROW_BUDGET:
                flush(pend_j, pend_idx)
                pend_j, pend_idx, rows = [], [], 0
        if pend_j:
            flush(pend_j, pend_idx)
        if not out_q:
            return empty
        ranks = np.concatenate([np.arange(1, x.size + 1, dtype=np.int64) for x in out_i])
        return pa.table(
            {
                "query_id": np.concatenate(out_q),
                "doc_id": np.concatenate(out_i),
                "dist": np.concatenate(out_d),
                "rank": ranks,
            }
        )


def knn_join_indexed(
    queries_ds,
    cand_ids,
    cand_lats,
    cand_lons,
    k: int,
    kernel: str = "vincenty",
    metric: str = "meter",
    ellipsoid="WGS-84",
    tie_round: int | None = 6,
    concurrency=(1, 2),
    batch_size: int = 1024,
):
    """Actor-pool kNN over a streaming QUERY Dataset: the candidate index is
    broadcast once and built per actor in ``__init__``; each query batch is
    answered by :class:`KnnIndexActor`'s exact band-pruned search."""
    import ray

    if k < 1:
        # same up-front guard as knn_join/knn_join_cells: k=0 would either
        # crash deep in the actor's np.partition (opaque, retried) or
        # silently return an empty dataset depending on the query's band
        raise ValueError("k must be >= 1")
    ref = ray.put(
        (
            np.asarray(cand_ids, dtype=np.int64),
            np.asarray(cand_lats, dtype=np.float64),
            np.asarray(cand_lons, dtype=np.float64),
        )
    )
    return queries_ds.map_batches(
        KnnIndexActor,
        fn_constructor_kwargs={
            "cand_ref": ref,
            "k": k,
            "kernel": kernel,
            "metric": metric,
            "ellipsoid": ellipsoid,
            "tie_round": tie_round,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        batch_size=batch_size,
    )
