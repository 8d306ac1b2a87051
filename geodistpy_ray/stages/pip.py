"""Point-in-polygon spatial join: cell-bucketed ray casting.

The polygon side is preprocessed driver-side into cell buckets and broadcast
**once** via ``ray.put`` (the classic small-side broadcast join — no shuffle
of the big point table). Each map task:

1. looks up candidate polygons by the point's grid cell (prune),
2. runs an exact vectorized even-odd ray-casting test per candidate polygon,
3. emits ``(id, poly_id)`` match rows.

Antimeridian-crossing polygons are supported by expressing their rings in
continuing longitudes (>180) and remapping candidate point longitudes into
the ring's frame. Pole-containing polygons are out of scope for the planar
even-odd rule and documented as such (use a polar-cap predicate instead).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ..cells import DEFAULT_CELL_DEG, grid_shape
from .geo import col_np


def _ring_contains(lat: np.ndarray, lon: np.ndarray, rlats: np.ndarray, rlons: np.ndarray):
    """Vectorized even-odd ray casting: points (n,) vs one closed ring (v,)."""
    y1, y2 = rlats[:-1, None], rlats[1:, None]
    x1, x2 = rlons[:-1, None], rlons[1:, None]
    cond = (y1 > lat[None, :]) != (y2 > lat[None, :])
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x1 + (lat[None, :] - y1) / (y2 - y1) * (x2 - x1)
    cross = cond & (lon[None, :] < xint)
    return (cross.sum(axis=0) % 2) == 1


def build_polygon_index(polygons: pa.Table, cell_deg: float = DEFAULT_CELL_DEG):
    """Driver-side: polygon table → (rings, bboxes, cell→poly bucket dict)."""
    nlat, nlon = grid_shape(cell_deg)
    rings = []
    n = polygons.num_rows
    min_lat = polygons.column("min_lat").to_numpy()
    max_lat = polygons.column("max_lat").to_numpy()
    min_lon = polygons.column("min_lon").to_numpy()
    max_lon = polygons.column("max_lon").to_numpy()
    poly_ids = polygons.column("poly_id").to_numpy()
    lats_list = polygons.column("ring_lats").to_pylist()
    lons_list = polygons.column("ring_lons").to_pylist()
    buckets: dict[int, list[int]] = {}
    for i in range(n):
        rings.append(
            (np.asarray(lats_list[i], dtype=np.float64), np.asarray(lons_list[i], dtype=np.float64))
        )
        la_lo = int(np.clip(np.floor((min_lat[i] + 90.0) / cell_deg), 0, nlat - 1))
        la_hi = int(np.clip(np.floor((max_lat[i] + 90.0) / cell_deg), 0, nlat - 1))
        lo_lo = int(np.floor((min_lon[i] + 180.0) / cell_deg))
        lo_hi = int(np.floor((max_lon[i] + 180.0) / cell_deg))
        for la in range(la_lo, la_hi + 1):
            for lo in range(lo_lo, lo_hi + 1):
                buckets.setdefault(la * nlon + (lo % nlon), []).append(i)
    buckets_np = {c: np.asarray(v, dtype=np.int64) for c, v in buckets.items()}
    return {
        "rings": rings,
        "poly_ids": poly_ids,
        "min_lon": min_lon,
        "max_lon": max_lon,
        "buckets": buckets_np,
    }


class PolygonJoiner:
    """Actor-pool map stage holding the broadcast polygon index.

    ``__init__`` fetches the ``ray.put`` index once per actor (zero-copy from
    the local object store); ``__call__`` tests one Arrow batch.
    """

    def __init__(self, index_ref, id_col: str, cell_deg: float):
        from .broadcast import get_broadcast

        self.idx = get_broadcast(index_ref)
        self.id_col = id_col
        self.cell_deg = cell_deg

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..cells import cell_id

        if batch.num_rows == 0:
            # type the id from the INPUT schema: a hardcoded int64 here
            # would emit blocks whose schema conflicts with the non-empty
            # branch for string/int32 id columns
            return pa.table(
                {
                    self.id_col: pa.array([], batch.schema.field(self.id_col).type),
                    "poly_id": pa.array([], pa.int64()),
                }
            )
        lat = col_np(batch, "lat")
        lon = col_np(batch, "lon")
        ids = col_np(batch, self.id_col)
        cells = cell_id(lat, lon, self.cell_deg)
        out_ids, out_pids = [], []
        order = np.argsort(cells, kind="stable")
        cells_s = cells[order]
        bounds = np.flatnonzero(np.diff(cells_s)) + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [cells_s.size]])
        buckets = self.idx["buckets"]
        for s, e in zip(starts, ends):
            cand = buckets.get(int(cells_s[s]))
            if cand is None:
                continue
            sel = order[s:e]
            plat, plon = lat[sel], lon[sel]
            for pi in cand:
                rlats, rlons = self.idx["rings"][pi]
                lon_t = plon
                if self.idx["max_lon"][pi] > 180.0:
                    # ring uses continuing longitudes; map points into its frame
                    lon_t = np.where(plon < self.idx["min_lon"][pi], plon + 360.0, plon)
                hit = _ring_contains(plat, lon_t, rlats, rlons)
                if hit.any():
                    out_ids.append(ids[sel][hit])
                    out_pids.append(
                        np.full(int(hit.sum()), self.idx["poly_ids"][pi], dtype=np.int64)
                    )
        if not out_ids:
            return pa.table(
                {self.id_col: pa.array([], pa.int64()), "poly_id": pa.array([], pa.int64())}
            )
        return pa.table(
            {self.id_col: np.concatenate(out_ids), "poly_id": np.concatenate(out_pids)}
        )


def point_in_polygon_join(
    ds,
    polygons: pa.Table,
    id_col: str = "doc_id",
    cell_deg: float = DEFAULT_CELL_DEG,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int | None = None,
):
    """Spatial join → Dataset (id, poly_id); points must carry lat/lon.

    Default is stateless-task mode with whole-block batches: the broadcast
    index is fetched once per worker (``broadcast.get_broadcast``), the
    stage scales elastically to every CPU, and leaving ``batch_size=None``
    lets Ray fuse this map with its neighbors (setting 16384 here measured
    +70% wall time at 8 CPUs from lost fusion). Pass ``concurrency`` to pin
    an actor pool instead (an actor pool also fuses upstream maps into its
    fixed pool, capping their parallelism — tasks won 5x on the bench).
    """
    index_ref = ray.put(build_polygon_index(polygons, cell_deg))
    if concurrency is not None:
        return ds.map_batches(
            PolygonJoiner,
            fn_constructor_kwargs={"index_ref": index_ref, "id_col": id_col, "cell_deg": cell_deg},
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=concurrency,
            batch_size=batch_size,
        )

    def joiner(batch: pa.Table) -> pa.Table:
        return PolygonJoiner(index_ref, id_col, cell_deg)(batch)

    return ds.map_batches(
        joiner, batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size
    )


def polar_cap_join(ds, caps: pa.Table, id_col: str = "doc_id", lat_col: str = "lat"):
    """Membership join against polar caps — the predicate the planar
    even-odd rule can't express (module docstring): a cap is
    ``(cap_id, pole ∈ {1,-1}, colat_deg)`` and contains every point within
    ``colat_deg`` of its pole (inclusive). Pure latitude comparison —
    stateless vectorized map, broadcast caps, no shuffle."""
    cap_ids = caps.column("cap_id").to_numpy()
    poles = caps.column("pole").to_numpy()
    colat = caps.column("colat_deg").to_numpy()

    def fn(batch: pa.Table) -> pa.Table:
        lat = col_np(batch, lat_col)
        ids = col_np(batch, id_col)
        out_i, out_c = [], []
        for j in range(cap_ids.size):
            m = (90.0 - poles[j] * lat) <= colat[j] if poles[j] == 1 else (90.0 + lat) <= colat[j]
            if m.any():
                out_i.append(ids[m])
                out_c.append(np.full(int(m.sum()), cap_ids[j], dtype=np.int64))
        if not out_i:
            return pa.table(
                {id_col: pa.array([], pa.int64()), "cap_id": pa.array([], pa.int64())}
            )
        return pa.table({id_col: np.concatenate(out_i), "cap_id": np.concatenate(out_c)})

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def add_ring_area(
    ds,
    lats_col: str = "ring_lats",
    lons_col: str = "ring_lons",
    out_col: str = "area_km2",
    radius_km: float = 6371.009,
    round_to: int | None = 3,
):
    """Spherical ring area (km²) per polygon row — the Chamberlain–Duquette
    line-integral (JPL 2007, the turf.js estimator):

        A = R²/2 · |Σ_j (λ_{j+1} − λ_j)(2 + sin φ_j + sin φ_{j+1})|

    over CLOSED rings (first vertex repeated last). Exact for rings whose
    edges follow parallels/meridians (it reduces to R²·Δλ·(sinφ_hi−sinφ_lo),
    cross-checked against ``cells.cell_area_km2`` in tests); the standard
    estimator elsewhere. Vectorized over the Arrow list offsets — flat
    value arrays, one consecutive-pair term vector with ring-boundary terms
    zeroed, ``np.add.reduceat`` per ring; no Python per row. fp ordering is
    mirrored term-for-term by the SQL oracle (CLAUDE.md convention);
    consumers round (default 3 decimals — the km² magnitude rule).
    """

    def fn(batch: pa.Table) -> pa.Table:
        return _ring_area_batch(batch, lats_col, lons_col, out_col, radius_km, round_to)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def _ring_area_batch(
    batch: pa.Table,
    lats_col: str,
    lons_col: str,
    out_col: str,
    radius_km: float,
    round_to: int | None,
) -> pa.Table:
    lats = batch.column(lats_col).combine_chunks()
    lons = batch.column(lons_col).combine_chunks()
    off = np.asarray(lats.offsets)
    flat_lat = np.asarray(lats.values, dtype=np.float64)
    flat_lon = np.asarray(lons.values, dtype=np.float64)
    n = batch.num_rows
    total = flat_lat.size
    area = np.zeros(n, dtype=np.float64)
    if total >= 2:
        rlat = np.radians(flat_lat)
        rlon = np.radians(flat_lon)
        t = np.zeros(total, dtype=np.float64)
        t[:-1] = (rlon[1:] - rlon[:-1]) * (2.0 + np.sin(rlat[:-1]) + np.sin(rlat[1:]))
        t[np.clip(off[1:] - 1, 0, total - 1)] = 0.0  # cross-ring pairs
        # On a SLICED list column, .values is the FULL child array, so the
        # final reduceat segment runs to len(t) — zero everything past the
        # view so out-of-view trailing values can't leak into the last row.
        t[off[-1] :] = 0.0
        starts = off[:-1]
        nonempty = off[1:] > starts  # reduceat misreads empty segments
        if nonempty.any():
            sums = np.add.reduceat(t, starts[nonempty])
            area[nonempty] = np.abs(sums) * (radius_km * radius_km) / 2.0
    if round_to is not None:
        area = np.round(area, round_to)
    return batch.append_column(out_col, pa.array(area, pa.float64()))


def add_ring_perimeter(
    ds,
    lats_col: str = "ring_lats",
    lons_col: str = "ring_lons",
    out_col: str = "perimeter_mm",
):
    """Geodesic ring perimeter per polygon row, as INTEGER millimeters
    (haversine per edge, ``floor(m·1000 + 0.5)`` — the same order-
    independent integer-sum convention as ``geodesic_track_length``).
    Vectorized over the Arrow list offsets like :func:`add_ring_area`."""
    def fn(batch: pa.Table) -> pa.Table:
        return _ring_perimeter_batch(batch, lats_col, lons_col, out_col)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def _ring_perimeter_batch(
    batch: pa.Table, lats_col: str, lons_col: str, out_col: str
) -> pa.Table:
    from ..kernels.sphere import haversine

    lats = batch.column(lats_col).combine_chunks()
    lons = batch.column(lons_col).combine_chunks()
    off = np.asarray(lats.offsets)
    flat_lat = np.asarray(lats.values, dtype=np.float64)
    flat_lon = np.asarray(lons.values, dtype=np.float64)
    n = batch.num_rows
    total = flat_lat.size
    per = np.zeros(n, dtype=np.int64)
    if total >= 2:
        d = haversine(flat_lat[:-1], flat_lon[:-1], flat_lat[1:], flat_lon[1:])
        t = np.zeros(total, dtype=np.int64)
        t[:-1] = np.floor(d * 1000.0 + 0.5).astype(np.int64)
        t[np.clip(off[1:] - 1, 0, total - 1)] = 0  # cross-ring pairs
        t[off[-1] :] = 0  # sliced view: see _ring_area_batch
        starts = off[:-1]
        nonempty = off[1:] > starts
        if nonempty.any():
            per[nonempty] = np.add.reduceat(t, starts[nonempty])
    return batch.append_column(out_col, pa.array(per, pa.int64()))
