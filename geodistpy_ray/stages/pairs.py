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
import pyarrow.compute as pc

from ..cells import DEFAULT_CELL_DEG, cell_id, disc_cover, expand_by_counts
from ..kernels import resolve_ellipsoid, unit_factor
from .geo import col_np, distance_kernel


def cell_salt_stats(
    ds,
    lat_col: str = "lat",
    lon_col: str = "lon",
    cell_deg: float = DEFAULT_CELL_DEG,
    target_rows: int = 2048,
    max_salt: int = 16,
    frac_threshold: float = 0.01,
    top_n: int = 64,
) -> dict[int, int]:
    """Hot-cell salt factors from a cheap stats pre-pass → {cell_id: salt}.

    The :func:`~.joins.detect_hot_keys` idiom applied to grid cells, via
    the shared :func:`~.grouping.hot_key_salts` engine: each block emits
    its top-``top_n`` own-cell counts (and one total), the driver merges
    the tiny partials, and every cell holding at least ``frac_threshold``
    of all rows gets ``ceil(rows / target_rows)`` salt subgroups (capped
    at ``max_salt``). Cold cells stay unsalted — the candidate replication
    cost is paid only where a city actually is.
    """
    from .grouping import hot_key_salts

    return hot_key_salts(
        ds,
        [lat_col, lon_col],
        lambda batch: cell_id(col_np(batch, lat_col), col_np(batch, lon_col), cell_deg),
        target_rows=target_rows,
        max_salt=max_salt,
        frac_threshold=frac_threshold,
        top_n=top_n,
    )


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
    salt: int | str = 1,
):
    """All pairs with geodesic distance ≤ max_dist_m → (id_left, id_right, dist).

    ``salt`` splits a cell's *primary* rows into hash subgroups and
    replicates the candidate side into each — the explicit hot-cell (city)
    skew treatment the north rule requires: a cell with C points costs
    max(P/S)·C per group instead of P·C in one. Exactly-once pair emission
    is preserved (a pair is still owned by the left point's unique
    (cell, salt-of-left) group).

    - ``salt=N`` (int): a global knob — every cell gets N subgroups and the
      candidate replication is ×N everywhere.
    - ``salt="auto"``: one :func:`cell_salt_stats` pre-pass sizes the salt
      PER CELL (``ceil(rows / 2048)``, capped 16), so only actual hot cells
      pay replication; cold cells keep factor 1. This is the production
      setting — the global knob stays for oracle parity and tests.
    """
    a, f = resolve_ellipsoid(ellipsoid)
    conv = unit_factor(metric)
    kfn = distance_kernel(kernel)
    if salt == "auto":
        per_cell = cell_salt_stats(ds, lat_col, lon_col, cell_deg)
        global_salt = 1
        max_s = max(per_cell.values(), default=1)
    else:
        global_salt = int(salt)
        if global_salt < 1:
            raise ValueError("salt must be >= 1 or 'auto'")
        per_cell = {}
        max_s = global_salt

    def _salt_hash(ids: np.ndarray) -> np.ndarray:
        return (
            (ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(32)
        ).astype(np.int64)

    def replicate(batch: pa.Table) -> pa.Table:
        lat = col_np(batch, lat_col)
        lon = col_np(batch, lon_col)
        ids = col_np(batch, id_col)
        own = cell_id(lat, lon, cell_deg)
        src, cover = disc_cover(lat, lon, max_dist_m, cell_deg)
        if max_s == 1:
            return pa.table(
                {
                    "cell": cover,
                    id_col: ids[src],
                    lat_col: lat[src],
                    lon_col: lon[src],
                    "is_primary": own[src] == cover,
                }
            )
        # per-(row, covered-cell) salt factor: the DESTINATION cell's —
        # primaries of cell c split into s_c subgroups, so candidates must
        # replicate into the same s_c
        if per_cell:
            s_arr = np.ones(cover.size, dtype=np.int64)
            for c, sc in per_cell.items():  # ≤ top_n tiny vector passes
                s_arr[cover == c] = sc
        else:
            s_arr = np.full(cover.size, global_salt, dtype=np.int64)
        idx, salt_r = expand_by_counts(s_arr)
        src_r = src[idx]
        cover_r = cover[idx]
        s_r = s_arr[idx]
        return pa.table(
            {
                "cell": cover_r * max_s + salt_r,
                id_col: ids[src_r],
                lat_col: lat[src_r],
                lon_col: lon[src_r],
                "is_primary": (own[src_r] == cover_r)
                & (_salt_hash(ids)[src_r] % s_r == salt_r),
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
        # BOTH axes chunk: member_chunk bounds the secondary axis, and the
        # primary axis chunks so each distance block stays cache-resident
        # (~256k elements — see CLAUDE.md) regardless of P. Without it a
        # hot city cell at salt=1 allocates a (P × member_chunk) block —
        # 100k primaries × 4096 = 3.3 GB of float64 per chunk.
        p_chunk = max(1, int(256_000 // member_chunk))
        for s in range(0, m_ids.size, member_chunk):
            mi = m_ids[s : s + member_chunk]
            ml = m_lat[s : s + member_chunk]
            mo = m_lon[s : s + member_chunk]
            for p0 in range(0, p_ids.size, p_chunk):
                pi = slice(p0, p0 + p_chunk)
                d = kfn(
                    p_lat[pi][:, None], p_lon[pi][:, None], ml[None, :], mo[None, :], a, f
                ) * conv
                mask = (d <= thr) & (p_ids[pi][:, None] < mi[None, :])
                li, ri = np.nonzero(mask)
                if li.size:
                    out_l.append(p_ids[pi][li])
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


def colocation_pairs(
    ds,
    max_dist_m: float,
    window_us: int,
    id_col: str = "event_id",
    user_col: str = "user_id",
    ts_col: str = "ts",
    lat_col: str = "lat",
    lon_col: str = "lon",
    cell_deg: float = DEFAULT_CELL_DEG,
    kernel: str = "haversine",
    member_chunk: int = 4096,
):
    """Spatiotemporal co-location self-join: unordered pairs of events from
    DIFFERENT users within ``max_dist_m`` meters AND ``window_us`` µs of
    each other → (id_left, id_right, dist, dt_us). The "who was near whom,
    when" join (contact networks, rendezvous detection).

    Scale shape — the :func:`close_pairs` exactly-once idiom extended with
    a time axis: points replicate spatially to their ``disc_cover`` cells
    and temporally to time buckets {b−1, b, b+1} (b = ts // window);
    groups are (cell, bucket) composites, so a burst hour in one city is
    ONE bounded group, not a corpus-wide bucket. A pair is emitted only
    from the group that is the LEFT point's own (cell, bucket) with
    ``id_left < id_right`` — any in-range pair has |Δbucket| ≤ 1, so the
    right point's ±1 replicas guarantee presence there and nowhere else.
    One shuffle, no dedup pass; the time check is exact integer µs.
    """
    a, f = resolve_ellipsoid(None)
    kfn = distance_kernel(kernel)
    if window_us <= 0:
        raise ValueError("window_us must be > 0")

    def replicate(batch: pa.Table) -> pa.Table:
        # SQL inner self-join semantics: a NULL in ANY predicate operand
        # (ts, user, id, lat, lon) never satisfies the join, so the row
        # drops. Filtering up front also keeps the numpy columns in their
        # native dtypes — ONE null ts would launder the whole batch's ts
        # to float64, and the packed (cell << 40) + bucket key computed in
        # float64 loses low bits above 2^53 (cell ids shifted by 40 reach
        # ~9e18), silently colliding unrelated groups.
        cols = (ts_col, user_col, id_col, lat_col, lon_col)
        if any(batch.column(c).null_count for c in cols):
            valid = None
            for c in cols:
                v = pc.is_valid(batch.column(c))
                valid = v if valid is None else pc.and_(valid, v)
            batch = batch.filter(valid)
        lat = col_np(batch, lat_col)
        lon = col_np(batch, lon_col)
        ids = col_np(batch, id_col)
        users = col_np(batch, user_col)
        ts = (
            batch.column(ts_col)
            .combine_chunks()
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        own = cell_id(lat, lon, cell_deg)
        tb = ts // window_us
        src, cover = disc_cover(lat, lon, max_dist_m, cell_deg)
        # 3x time replication of every spatial replica
        n = src.size
        src3 = np.repeat(src, 3)
        cover3 = np.repeat(cover, 3)
        off = np.tile(np.array([-1, 0, 1], dtype=np.int64), n)
        tb3 = tb[src3] + off
        if (tb < 0).any() or (tb + 1 >= (1 << 40)).any():
            raise ValueError(
                "colocation_pairs: time bucket out of the packable range "
                "[0, 2^40) — timestamps must be non-negative epoch µs"
            )
        if cover3.size and int(cover3.max()) >= (1 << 23):
            # the <<40 pack leaves 23 high bits for the cell id; a fine
            # cell_deg (e.g. 0.01°) exceeds that and would silently collide
            # unrelated (cell, bucket) groups — refuse instead
            raise ValueError(
                "colocation_pairs: cell id >= 2^23 — cell_deg is too fine "
                "for the packed (cell << 40) + bucket group key; use a "
                "coarser cell_deg (cell ids must stay below 8,388,608)"
            )
        # a bucket −1 replica (the b−1 copy of bucket-0 points) can never
        # meet a primary — no real bucket is negative — so drop it rather
        # than widen the key range
        keep = tb3 >= 0
        src3, cover3, tb3, off = src3[keep], cover3[keep], tb3[keep], off[keep]
        return pa.table(
            {
                # EXACT packed composite key (cell < 2^23, bucket < 2^40):
                # no collision, so each (cell, bucket) group is one key span
                "__gkey": pa.array((cover3 << 40) + tb3, pa.int64()),
                id_col: pa.array(ids[src3]),
                user_col: pa.array(users[src3]),
                "__ts": pa.array(ts[src3], pa.int64()),
                lat_col: pa.array(lat[src3], pa.float64()),
                lon_col: pa.array(lon[src3], pa.float64()),
                "is_primary": pa.array(
                    (own[src3] == cover3) & (off == 0), pa.bool_()
                ),
            }
        )

    replicated = ds.map_batches(replicate, batch_format="pyarrow", zero_copy_batch=True)

    def part_fn(g: pd.DataFrame) -> pd.DataFrame:
        # one numpy conversion + one sort per PARTITION; the span loop is
        # pure-numpy slices (a (cell, bucket) domain has far more —and far
        # smaller— groups than a cell domain, so per-span pandas frames
        # would dominate wall time; measured 50 s → <1 s on the sf0.01 run)
        from .grouping import key_spans

        gk = g["__gkey"].to_numpy()
        order = np.argsort(gk, kind="stable")
        gk = gk[order]
        ids = g[id_col].to_numpy()[order]
        users = g[user_col].to_numpy()[order]
        ts = g["__ts"].to_numpy()[order]
        lat = g[lat_col].to_numpy()[order]
        lon = g[lon_col].to_numpy()[order]
        prim = g["is_primary"].to_numpy()[order]
        out_l, out_r, out_d, out_t = [], [], [], []
        # BOTH axes chunk (the close_pairs.group_pairs idiom): member_chunk
        # bounds the candidate axis and p_chunk the primary axis so every
        # distance/dt block stays cache-resident (~256k elements) — a burst
        # (cell, bucket) group with 100k primaries would otherwise allocate
        # 100k × member_chunk float64 blocks (GBs of temporaries per chunk)
        p_chunk = max(1, int(256_000 // member_chunk))
        for s, e in zip(*key_spans(gk, min_size=2)):
            pm = prim[s:e]
            if not pm.any():
                continue
            p = np.flatnonzero(pm) + s
            p_ids, p_lat, p_lon = ids[p], lat[p], lon[p]
            p_ts, p_users = ts[p], users[p]
            for cs in range(s, e, member_chunk):
                ce = min(cs + member_chunk, e)
                for p0 in range(0, p_ids.size, p_chunk):
                    pi = slice(p0, p0 + p_chunk)
                    d = kfn(
                        p_lat[pi][:, None], p_lon[pi][:, None],
                        lat[cs:ce][None, :], lon[cs:ce][None, :], a, f,
                    )
                    dt = np.abs(p_ts[pi][:, None] - ts[cs:ce][None, :])
                    mask = (
                        (d <= max_dist_m)
                        & (dt <= window_us)
                        & (p_ids[pi][:, None] < ids[cs:ce][None, :])
                        & (p_users[pi][:, None] != users[cs:ce][None, :])
                    )
                    li, ri = np.nonzero(mask)
                    if li.size:
                        out_l.append(p_ids[pi][li])
                        out_r.append(ids[cs:ce][ri])
                        out_d.append(d[li, ri])
                        out_t.append(dt[li, ri])
        if not out_l:
            return pd.DataFrame(
                {
                    "id_left": pd.Series(dtype=np.int64),
                    "id_right": pd.Series(dtype=np.int64),
                    "dist": pd.Series(dtype=np.float64),
                    "dt_us": pd.Series(dtype=np.int64),
                }
            )
        return pd.DataFrame(
            {
                "id_left": np.concatenate(out_l),
                "id_right": np.concatenate(out_r),
                "dist": np.concatenate(out_d),
                "dt_us": np.concatenate(out_t).astype(np.int64),
            }
        )

    from .grouping import partitioned_map_groups

    return partitioned_map_groups(replicated, "__gkey", part_fn, n_parts=128)
