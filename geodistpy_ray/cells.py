"""Homegrown hierarchical grid-cell index (H3/S2 stand-in, pure NumPy).

The engine's one shuffle currency: every wide op (spatial join, kNN, radius
join, tile aggregation) partitions by ``cell`` (SURVEY.md §7.4). Neither H3
nor S2 is installable in this environment (SURVEY.md §4.3), so cells are an
equiangular lat/lon grid at a configurable resolution:

    lat_idx = floor((lat + 90) / cell_deg)   clamped to [0, nlat-1]
    lon_idx = floor((lon + 180) / cell_deg)  clamped to [0, nlon-1]
    cell    = lat_idx * nlon + lon_idx       (int64, row-major)

Row-major int ids keep the encoding trivially expressible in ANSI SQL (the
DuckDB correctness oracle recomputes it exactly — see
``geodistpy_ray.functions.geocode.cell_sql``), while
``parent`` / ``neighbors`` / ``disc_cover`` provide the hierarchy and ring
ops the query layer needs. At 100 TB scale the partitioning story is: pick
``cell_deg`` so hot cells stay under the per-group row cap, then salt the
remaining hot cells (``stages/``) — latitude-band locality of row-major ids
makes range partitioning by ``cell`` geographically contiguous.
"""

from __future__ import annotations

import numpy as np

#: meters per degree of latitude, lower bound — every conservative cover
#: (latitude AND longitude margins) divides by this; using the smaller
#: constant for longitude keeps the superset guarantee at all latitudes.
MIN_M_PER_DEG_LAT = 110_567.0

DEFAULT_CELL_DEG = 2.0


def prune_band(lat, radius_m):
    """Conservative lat/lon degree band around each center →
    ``(dlat_deg, dlon_deg, full_ring)``.

    THE shared prune-box derivation (this math drifted between
    :func:`disc_cover` and ``stages/radius.py`` once — commit 28a2c1a had
    to fix the pole clamp in both copies): a latitude half-height from the
    meters-per-degree lower bound, a longitude half-width shrunk by cos at
    the band's EXTREME latitude, and a ``full_ring`` flag that wraps every
    longitude once the extreme reaches the 89.999° cos clamp — past it the
    clamp would INFLATE cos and under-size the lon box, silently pruning
    true in-radius points near the pole. Guaranteed a superset of the
    geodesic disc; callers apply the exact kernel afterwards.
    """
    lat = np.asarray(lat, dtype=np.float64)
    radius_m = np.asarray(radius_m, dtype=np.float64)
    dlat_deg = radius_m / MIN_M_PER_DEG_LAT
    extreme = np.minimum(np.abs(lat) + dlat_deg, 90.0)
    cos_lat = np.cos(np.radians(np.minimum(extreme, 89.999)))
    dlon_deg = radius_m / (MIN_M_PER_DEG_LAT * cos_lat)
    full_ring = (dlon_deg >= 180.0) | (extreme >= 89.999)
    return dlat_deg, dlon_deg, full_ring


def grid_shape(cell_deg: float = DEFAULT_CELL_DEG) -> tuple[int, int]:
    nlat = int(round(180.0 / cell_deg))
    nlon = int(round(360.0 / cell_deg))
    return nlat, nlon


def cell_id(lat, lon, cell_deg: float = DEFAULT_CELL_DEG):
    """Encode lat/lon degree columns to int64 cell ids (vectorized)."""
    nlat, nlon = grid_shape(cell_deg)
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    lat_idx = np.minimum(np.floor((lat + 90.0) / cell_deg), nlat - 1).astype(np.int64)
    lon_idx = np.minimum(np.floor((lon + 180.0) / cell_deg), nlon - 1).astype(np.int64)
    lat_idx = np.maximum(lat_idx, 0)
    lon_idx = np.maximum(lon_idx, 0)
    return lat_idx * nlon + lon_idx


def cell_indices(cell, cell_deg: float = DEFAULT_CELL_DEG):
    """Decode int64 cell ids back to (lat_idx, lon_idx)."""
    _, nlon = grid_shape(cell_deg)
    cell = np.asarray(cell, dtype=np.int64)
    return cell // nlon, cell % nlon


def cell_center(cell, cell_deg: float = DEFAULT_CELL_DEG):
    """Center (lat, lon) of each cell."""
    lat_idx, lon_idx = cell_indices(cell, cell_deg)
    lat = lat_idx * cell_deg - 90.0 + cell_deg / 2.0
    lon = lon_idx * cell_deg - 180.0 + cell_deg / 2.0
    return lat, lon


def cell_bounds(cell, cell_deg: float = DEFAULT_CELL_DEG):
    """(min_lat, max_lat, min_lon, max_lon) of each cell."""
    lat_idx, lon_idx = cell_indices(cell, cell_deg)
    min_lat = lat_idx * cell_deg - 90.0
    min_lon = lon_idx * cell_deg - 180.0
    return min_lat, min_lat + cell_deg, min_lon, min_lon + cell_deg


def cell_area_km2(cell, cell_deg: float = DEFAULT_CELL_DEG, radius_km: float = 6371.009):
    """Spherical surface area of each cell in km²: R²·Δλ·(sinφ_hi − sinφ_lo).

    Exact on the sphere (the lat/lon cell is a spherical rectangle bounded
    by two parallels and two meridians), so a whole latitude row sums to its
    ring area and the full grid sums to 4πR². fp ordering is mirrored
    term-for-term by the SQL oracle (CLAUDE.md convention) — consumers round
    to 3 decimals of km² (the squared-magnitude rounding rule).
    """
    lat_idx, _ = cell_indices(cell, cell_deg)
    lat0 = lat_idx * cell_deg - 90.0
    lat1 = lat0 + cell_deg
    return (
        (radius_km * radius_km)
        * np.radians(cell_deg)
        * (np.sin(np.radians(lat1)) - np.sin(np.radians(lat0)))
    )


def parent_cell(cell, cell_deg: float, factor: int):
    """Coarsen cells by an integer factor (hierarchical tile aggregation).

    ``factor`` must divide the grid shape (e.g. cell_deg=1 → factor 2/3/4...).
    """
    nlat, nlon = grid_shape(cell_deg)
    if nlon % factor or nlat % factor:
        raise ValueError(f"factor {factor} must divide grid {nlat}x{nlon}")
    lat_idx, lon_idx = cell_indices(cell, cell_deg)
    return (lat_idx // factor) * (nlon // factor) + (lon_idx // factor)


def neighbor_cells(cell, cell_deg: float = DEFAULT_CELL_DEG, ring: int = 1):
    """All cells within ``ring`` steps (Chebyshev) of each input cell.

    Longitude wraps; latitude clamps at the poles (a cell touching a pole
    treats the pole row as its own neighborhood — disc covers near poles are
    handled by :func:`disc_cover` with full-ring expansion instead).

    Returns ``(src_positions, neighbor_ids)`` flattened pairs so callers can
    build an exploded (cell → neighbor) table without ragged arrays.
    """
    nlat, nlon = grid_shape(cell_deg)
    cell = np.atleast_1d(np.asarray(cell, dtype=np.int64))
    lat_idx, lon_idx = cell // nlon, cell % nlon
    offs = np.arange(-ring, ring + 1)
    dlat, dlon = np.meshgrid(offs, offs, indexing="ij")
    dlat, dlon = dlat.ravel(), dlon.ravel()
    la = lat_idx[:, None] + dlat[None, :]
    lo = (lon_idx[:, None] + dlon[None, :]) % nlon
    valid = (la >= 0) & (la < nlat)
    src = np.broadcast_to(np.arange(cell.size)[:, None], la.shape)[valid]
    neigh = (la * nlon + lo)[valid]
    return src, neigh


def expand_by_counts(counts: np.ndarray):
    """``(src, within)`` expansion of rows by per-row counts — row ``i``
    repeats ``counts[i]`` times and ``within`` counts 0..counts[i]-1 inside
    each run. The shared ragged-replication primitive behind
    :func:`disc_cover`, the salted replicas in ``pairs.close_pairs`` and
    ``knn.knn_join_cells`` (the index arithmetic is subtle enough that the
    three hand-rolled copies had started to drift)."""
    counts = np.asarray(counts, dtype=np.int64)
    total = int(counts.sum())
    if total == 0:
        e = np.array([], dtype=np.int64)
        return e, e.copy()
    src = np.repeat(np.arange(counts.size, dtype=np.int64), counts)
    starts = np.cumsum(counts) - counts
    within = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
    return src, within


def disc_cover(lat, lon, radius_m, cell_deg: float = DEFAULT_CELL_DEG):
    """Conservative cell cover of geodesic discs (vectorized, ragged output).

    Returns ``(src_positions, cell_ids)`` — for each input point i, the set of
    cells that could contain a point within ``radius_m`` of it. Guaranteed a
    superset (uses a lower bound on meters-per-degree); callers apply the
    exact geodesic test afterwards (radius-join semantics, SURVEY.md §2 P8).
    """
    nlat, nlon = grid_shape(cell_deg)
    lat = np.atleast_1d(np.asarray(lat, dtype=np.float64))
    lon = np.atleast_1d(np.asarray(lon, dtype=np.float64))
    radius_m = np.broadcast_to(np.asarray(radius_m, dtype=np.float64), lat.shape)

    dlat_deg, dlon_deg, full_ring = prune_band(lat, radius_m)
    lat_lo = np.maximum(lat - dlat_deg, -90.0)
    lat_hi = np.minimum(lat + dlat_deg, 90.0)

    lat_idx_lo = np.clip(np.floor((lat_lo + 90.0) / cell_deg), 0, nlat - 1).astype(np.int64)
    lat_idx_hi = np.clip(np.floor((lat_hi + 90.0) / cell_deg), 0, nlat - 1).astype(np.int64)
    lon_idx = np.clip(np.floor((lon + 180.0) / cell_deg), 0, nlon - 1).astype(np.int64)
    half_w = np.where(
        full_ring,
        nlon // 2,
        np.minimum(np.ceil(dlon_deg / cell_deg), nlon // 2).astype(np.int64),
    ).astype(np.int64)

    # Fully vectorized ragged expansion: per point i the cover is the
    # n_lat_rows[i] × n_lon_cols[i] grid; enumerate all covers with one
    # repeat + within-run counter (no Python loop — this sits on the hot
    # replicate path of close_pairs / radius_join_cells / kNN).
    n_lat_rows = (lat_idx_hi - lat_idx_lo + 1).astype(np.int64)
    n_lon_cols = np.minimum(2 * half_w + 1, nlon)
    counts = n_lat_rows * n_lon_cols
    src, j = expand_by_counts(counts)
    if src.size == 0:
        return src, j
    w = n_lon_cols[src]
    row = lat_idx_lo[src] + j // w
    col = (lon_idx[src] - half_w[src] + j % w) % nlon
    return src, row * nlon + col


def zorder_key(lat, lon, bits: int = 16):
    """Z-order (Morton) spatial key: interleave the ``bits``-bit lat/lon
    grid indices into one int64 — the locality-preserving linearization
    used for spatial range partitioning and file clustering (the H3/S2
    alternative when ranges, not cells, drive the layout). Pure integer
    arithmetic, mirrored bit-for-bit in SQL by :func:`zorder_sql`.

    lat occupies the even bit positions, lon the odd ones (lon has one
    more significant bit in the classic geohash layout, matched here).
    """
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    n = np.int64(1) << bits
    lat_i = np.minimum(np.floor((lat + 90.0) / 180.0 * n), n - 1).astype(np.int64)
    lon_i = np.minimum(np.floor((lon + 180.0) / 360.0 * n), n - 1).astype(np.int64)
    lat_i = np.maximum(lat_i, 0)
    lon_i = np.maximum(lon_i, 0)
    out = np.zeros(lat_i.shape, dtype=np.int64)
    for k in range(bits):
        out |= ((lat_i >> k) & 1) << (2 * k)
        out |= ((lon_i >> k) & 1) << (2 * k + 1)
    return out


def zorder_sql(lat_expr: str, lon_expr: str, bits: int = 16) -> str:
    """SQL mirroring :func:`zorder_key` bit-for-bit: the quantization via
    FLOOR/LEAST/GREATEST, the interleave as a sum of FLOOR(x / 2^k) % 2
    terms (no bit operators needed — pure integer arithmetic)."""
    n = 1 << bits
    lat_i = (
        f"GREATEST(LEAST(CAST(FLOOR(({lat_expr} + 90.0) / 180.0 * {n}.0) AS BIGINT), "
        f"{n - 1}), 0)"
    )
    lon_i = (
        f"GREATEST(LEAST(CAST(FLOOR(({lon_expr} + 180.0) / 360.0 * {n}.0) AS BIGINT), "
        f"{n - 1}), 0)"
    )
    terms = []
    for k in range(bits):
        terms.append(f"(la // {1 << k}) % 2 * {1 << (2 * k)}")
        terms.append(f"(lo // {1 << k}) % 2 * {1 << (2 * k + 1)}")
    total = " + ".join(terms)
    return (
        f"(SELECT CAST({total} AS BIGINT) "
        f"FROM (SELECT {lat_i} AS la, {lon_i} AS lo) AS __z)"
    )
