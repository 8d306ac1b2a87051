"""Core geo stages: geocode, cell assignment, distance columns.

Every stage is ``Dataset -> Dataset`` built on
``map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)`` — Arrow
columns are viewed as NumPy arrays without copying, kernels run vectorized,
and payload columns (``html``/``text``) pass through untouched
(byte-identity invariant, BASELINE.json input_hint).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..cells import DEFAULT_CELL_DEG, cell_id
from ..functions.geocode import geocode_ids
from ..kernels import (
    geodesic_inverse,
    great_circle,
    haversine,
    resolve_ellipsoid,
    unit_factor,
)


def col_np(batch: pa.Table, name: str) -> np.ndarray:
    """Arrow column → NumPy view (zero-copy for non-null numeric columns)."""
    return batch.column(name).combine_chunks().to_numpy(zero_copy_only=False)


def micro_deg(x: np.ndarray) -> np.ndarray:
    """Degrees → integer micro-degrees, ``floor(deg·1e6 + 0.5)`` int64.

    THE oracle-critical centroid quantization (one copy — a tie-rule fix
    here reaches every centroid consumer): integer partials make per-key
    sums order-independent, and FLOOR(x + 0.5) is the same fp op on both
    engine and SQL sides (np.round half-even vs SQL ROUND half-away
    disagree exactly on the .5 boundary integer ratios land on)."""
    return np.floor(np.asarray(x) * 1e6 + 0.5).astype(np.int64)


def micro_mean(usum, n) -> np.ndarray:
    """µdeg integer sums → degree mean, ``floor(sum/n + 0.5) / 1e6``.

    FLOOR(x + 0.5), not ROUND: integer-ratio means land EXACTLY on the
    half-µdeg boundary whenever ``sum % n == n/2``, where np.round
    (half-even) and SQL ROUND (half-away) disagree — floor+0.5 is the same
    fp op on both sides (CLAUDE.md tie rule)."""
    return np.floor(np.asarray(usum) / np.asarray(n) + 0.5) / 1e6


def add_geocode(ds, id_col: str = "doc_id", lat_col: str = "lat", lon_col: str = "lon"):
    """Append deterministic (lat, lon) derived from an integer key column.

    Stateless fast path of the geocoder (the actor-pool variant with loaded
    state is :class:`GeocoderActor`).
    """

    def fn(batch: pa.Table) -> pa.Table:
        lat, lon = geocode_ids(col_np(batch, id_col))
        batch = batch.append_column(lat_col, pa.array(lat, pa.float64()))
        return batch.append_column(lon_col, pa.array(lon, pa.float64()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


class GeocoderActor:
    """Stateful geocoder for actor pools: lookup state built once per actor.

    Mirrors the north-star's "IP/URL-derived lat-lon in a stateful actor-pool
    stage": ``__init__`` builds the city-center lookup table (standing in for
    loading a real GeoIP database — done once per actor, not per batch);
    ``__call__`` vectorizes over the batch. Use as::

        ds.map_batches(GeocoderActor, fn_constructor_kwargs={"id_col": "doc_id"},
                       batch_format="pyarrow", concurrency=(1, 4), batch_size=8192)
    """

    def __init__(self, id_col: str = "doc_id"):
        from ..functions.geocode import N_CENTERS, center_latlon

        self.id_col = id_col
        centers = np.arange(N_CENTERS, dtype=np.int64)
        self.center_lat, self.center_lon = center_latlon(centers)

    def __call__(self, batch: pa.Table) -> pa.Table:
        # delegate to the ONE jitter implementation (overflow-safe, SQL-
        # mirrored) — a re-derived formula here drifted once already; the
        # per-actor center table rides in as an indexed lookup (same
        # float64 values, so parity with the SQL mirror is untouched)
        from ..functions.geocode import geocode_ids

        d = col_np(batch, self.id_col).astype(np.int64)
        lat, lon = geocode_ids(d, center_table=(self.center_lat, self.center_lon))
        batch = batch.append_column("lat", pa.array(lat, pa.float64()))
        return batch.append_column("lon", pa.array(lon, pa.float64()))


def add_cell(ds, cell_deg: float = DEFAULT_CELL_DEG, lat_col="lat", lon_col="lon", out_col="cell"):
    """Append the int64 grid-cell id (the shuffle key for all wide geo ops)."""

    def fn(batch: pa.Table) -> pa.Table:
        c = cell_id(col_np(batch, lat_col), col_np(batch, lon_col), cell_deg)
        return batch.append_column(out_col, pa.array(c, pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


_KERNELS = {
    "haversine": lambda la1, lo1, la2, lo2, a, f: haversine(la1, lo1, la2, lo2),
    "great_circle": lambda la1, lo1, la2, lo2, a, f: great_circle(la1, lo1, la2, lo2, a, f),
    "vincenty": geodesic_inverse,
    "karney": None,  # resolved lazily below
}


def distance_kernel(name: str):
    """Kernel registry: haversine | great_circle | vincenty | karney.

    Mirrors the reference's method split (``geodesic.py``): haversine = cheap
    pre-filter, great_circle = Andoyer-Lambert mid-accuracy, vincenty =
    exact fast path with Karney patching, karney = exact always.
    """
    if name == "karney":
        from ..kernels import karney_inverse

        return lambda la1, lo1, la2, lo2, a, f: karney_inverse(la1, lo1, la2, lo2, a, f)[0]
    try:
        return _KERNELS[name]
    except KeyError:
        raise ValueError(
            f"Unknown kernel '{name}'. Available: haversine, great_circle, vincenty, karney"
        ) from None


def add_distance_to_point(
    ds,
    point: tuple[float, float],
    kernel: str = "vincenty",
    metric: str = "meter",
    ellipsoid="WGS-84",
    lat_col="lat",
    lon_col="lon",
    out_col="dist",
):
    """Append distance from every row to a fixed point (D4 one-to-many as a map).

    The origin is a broadcast scalar closed over by the task — shipped once
    per task by Ray's closure serialization, never per batch.
    """
    a, f = resolve_ellipsoid(ellipsoid)
    conv = unit_factor(metric)
    kfn = distance_kernel(kernel)
    qlat, qlon = float(point[0]), float(point[1])

    def fn(batch: pa.Table) -> pa.Table:
        d = kfn(col_np(batch, lat_col), col_np(batch, lon_col), qlat, qlon, a, f) * conv
        return batch.append_column(out_col, pa.array(d, pa.float64()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def add_elementwise_distance(
    ds,
    lat1_col: str,
    lon1_col: str,
    lat2_col: str,
    lon2_col: str,
    kernel: str = "vincenty",
    metric: str = "meter",
    ellipsoid="WGS-84",
    out_col="dist",
):
    """dist[i] = d(A[i], B[i]) over two coordinate pairs carried in each row
    (the reference's ``geodist`` elementwise semantics, ``distance.py:94-163``)."""
    a, f = resolve_ellipsoid(ellipsoid)
    conv = unit_factor(metric)
    kfn = distance_kernel(kernel)

    def fn(batch: pa.Table) -> pa.Table:
        d = (
            kfn(
                col_np(batch, lat1_col),
                col_np(batch, lon1_col),
                col_np(batch, lat2_col),
                col_np(batch, lon2_col),
                a,
                f,
            )
            * conv
        )
        return batch.append_column(out_col, pa.array(d, pa.float64()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def add_destination(
    ds,
    bearing,
    distance,
    metric: str = "meter",
    ellipsoid="WGS-84",
    lat_col="lat",
    lon_col="lon",
    out_lat="lat2",
    out_lon="lon2",
):
    """Vincenty-direct destination per row (the reference's ``destination``,
    ``/root/reference/geodistpy/distance.py:220-273``, as a batch map).

    ``bearing`` / ``distance`` are either scalars or column names; distance
    is converted from ``metric`` to meters BEFORE the solve (matching
    ``distance.py:261-262``); output longitude is normalized to [-180, 180].
    """
    from ..kernels import geodesic_direct

    a, f = resolve_ellipsoid(ellipsoid)
    conv = unit_factor(metric)

    def fn(batch: pa.Table) -> pa.Table:
        lat = col_np(batch, lat_col)
        lon = col_np(batch, lon_col)
        brg = col_np(batch, bearing) if isinstance(bearing, str) else np.full(len(lat), float(bearing))
        dist_m = (
            col_np(batch, distance) if isinstance(distance, str) else np.full(len(lat), float(distance))
        ) / conv
        la2, lo2 = geodesic_direct(lat, lon, brg, dist_m, a, f)
        lo2 = ((np.asarray(lo2) + 540.0) % 360.0) - 180.0
        batch = batch.append_column(out_lat, pa.array(np.atleast_1d(la2), pa.float64()))
        return batch.append_column(out_lon, pa.array(np.atleast_1d(lo2), pa.float64()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def interpolate_waypoints(
    ds,
    n_points: int,
    lat1_col="lat1",
    lon1_col="lon1",
    lat2_col="lat2",
    lon2_col="lon2",
    ellipsoid="WGS-84",
    seq_col="seq",
    out_lat="lat",
    out_lon="lon",
):
    """``n_points`` evenly-spaced interior waypoints per row, exploded to one
    output row per waypoint with a ``seq`` column (the reference's
    ``interpolate``, ``distance.py:279-356``, vectorized ACROSS rows for each
    step — the step loop is over ``n_points``, not rows).

    Coincident endpoints repeat the point (``distance.py:332-343``).
    """
    from ..kernels import geodesic_direct, geodesic_inverse

    a, f = resolve_ellipsoid(ellipsoid)

    def fn(batch: pa.Table) -> pa.Table:
        la1, lo1 = col_np(batch, lat1_col), col_np(batch, lon1_col)
        la2, lo2 = col_np(batch, lat2_col), col_np(batch, lon2_col)
        n = len(la1)
        total, az_fwd, _ = geodesic_inverse(la1, lo1, la2, lo2, a, f, with_azimuths=True)
        total = np.atleast_1d(total)
        az_fwd = np.atleast_1d(az_fwd)
        seg = total / (n_points + 1)
        coincident = total == 0.0
        out_las = np.empty((n_points, n))
        out_los = np.empty((n_points, n))
        for i in range(1, n_points + 1):  # loop over steps, vectorized over rows
            wla, wlo = geodesic_direct(la1, lo1, az_fwd, seg * i, a, f)
            wlo = ((np.asarray(wlo) + 540.0) % 360.0) - 180.0
            out_las[i - 1] = np.where(coincident, la1, np.atleast_1d(wla))
            out_los[i - 1] = np.where(coincident, lo1, wlo)
        idx = np.tile(np.arange(n, dtype=np.int64), n_points)
        out = batch.take(pa.array(idx))
        out = out.append_column(
            seq_col,
            pa.array(np.repeat(np.arange(n_points, dtype=np.int64), n), pa.int64()),
        )
        out = out.append_column(out_lat, pa.array(out_las.ravel(), pa.float64()))
        return out.append_column(out_lon, pa.array(out_los.ravel(), pa.float64()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
