"""Reference-parity public API over NumPy arrays / DataFrames.

Drop-in surface for users of the reference engine
(``/root/reference/geodistpy/distance.py`` signatures, validation messages
and return conventions), implemented on this package's vectorized kernels —
no Numba, no geographiclib. The Ray Data pipelines in ``stages/`` are the
scale path; this module is the local/array path and the semantic contract
the pipelines are tested against.

Distance matrices (``geodist_matrix``/``greatcircle_matrix``) materialize
O(n·m) like the reference does — by design for API parity. The scalable
equivalent is the cell-bucketed pair table (``stages.pairs.close_pairs``).
"""

from __future__ import annotations

import numpy as np

from . import frames
from .kernels import (
    geodesic_direct,
    geodesic_inverse,
    great_circle as _great_circle_kernel,
    karney_inverse,
    resolve_ellipsoid,
    unit_factor,
)

__all__ = [
    "geodist",
    "geodist_matrix",
    "geodist_to_many",
    "bearing",
    "destination",
    "interpolate",
    "midpoint",
    "point_in_radius",
    "geodesic_knn",
    "greatcircle",
    "greatcircle_matrix",
    "geodist_dimwise",
    "geodist_dimwise_haversine",
    "karney",
]

_LAT_MSG = "Latitude values must be in the range [-90, 90]"
_LON_MSG = "Longitude values must be in the range [-180, 180]"
_SHAPE_MSG = "coords1 and coords2 must have two dimensions: Latitude, Longitude"
_BOTH_MSG = (
    "Latitude values must be in the range [-90, 90] and Longitude values "
    "must be in the range [-180, 180]."
)


def _validate_ranges(coords):
    if (np.abs(coords[:, 0]) > 90).any():
        raise ValueError(_LAT_MSG)
    if (np.abs(coords[:, 1]) > 180).any():
        raise ValueError(_LON_MSG)


def _validate_ranges_pair(coords1, coords2):
    """Reference validation ORDER (``distance.py:155-158``): both arrays'
    LATITUDES first, then both longitudes — a bad lon in coords1 alongside
    a bad lat in coords2 must raise the latitude message."""
    if (np.abs(coords1[:, 0]) > 90).any() or (np.abs(coords2[:, 0]) > 90).any():
        raise ValueError(_LAT_MSG)
    if (np.abs(coords1[:, 1]) > 180).any() or (np.abs(coords2[:, 1]) > 180).any():
        raise ValueError(_LON_MSG)


def geodist(coords1, coords2, metric="meter", ellipsoid="WGS-84"):
    """Elementwise distances ``dist[i] = d(coords1[i], coords2[i])``.

    Single pair → float; (n, 2) arrays → (n,) ndarray. Parity:
    ``distance.py:94-163``.
    """
    coords1 = np.asarray(coords1, dtype=np.float64)
    coords2 = np.asarray(coords2, dtype=np.float64)
    assert coords1.shape == coords2.shape

    conv = unit_factor(metric)
    a, f = resolve_ellipsoid(ellipsoid)

    if np.size(coords1) == 2:
        if coords1.shape[0] != 2 or coords2.shape[0] != 2:
            raise ValueError(_SHAPE_MSG)
        if abs(coords1[0]) > 90 or abs(coords2[0]) > 90:
            raise ValueError(_LAT_MSG)
        if abs(coords1[1]) > 180 or abs(coords2[1]) > 180:
            raise ValueError(_LON_MSG)
        return float(
            geodesic_inverse(coords1[0], coords1[1], coords2[0], coords2[1], a, f)[0]
            * conv
        )

    if coords1.shape[1] != 2:
        raise ValueError(_SHAPE_MSG)
    _validate_ranges_pair(coords1, coords2)
    d = geodesic_inverse(coords1[:, 0], coords1[:, 1], coords2[:, 0], coords2[:, 1], a, f)
    return d * conv


def geodist_matrix(coords1, coords2=None, metric="meter", ellipsoid="WGS-84"):
    """Full pdist/cdist distance matrix (parity: ``distance.py:600-681``)."""
    conv = unit_factor(metric)
    coords1 = np.asarray(coords1, dtype=np.float64)
    if coords1.ndim != 2 or coords1.shape[1] != 2:
        raise ValueError(_SHAPE_MSG)
    if (np.abs(coords1[:, 0]) > 90).any() or (np.abs(coords1[:, 1]) > 180).any():
        raise ValueError(_BOTH_MSG)
    a, f = resolve_ellipsoid(ellipsoid)

    if coords2 is None:
        coords2m = coords1
    else:
        coords2m = np.asarray(coords2, dtype=np.float64)
        if coords2m.ndim != 2 or coords2m.shape[1] != 2:
            raise ValueError(_SHAPE_MSG)
        if (np.abs(coords2m[:, 0]) > 90).any() or (np.abs(coords2m[:, 1]) > 180).any():
            raise ValueError(_BOTH_MSG)

    d = geodesic_inverse(
        coords1[:, 0][:, None],
        coords1[:, 1][:, None],
        coords2m[:, 0][None, :],
        coords2m[:, 1][None, :],
        a,
        f,
    )
    if coords2 is None:
        np.fill_diagonal(d, 0.0)
    return d * conv


def geodist_to_many(origin, points, metric="meter", ellipsoid="WGS-84", lat_col=None, lon_col=None):
    """One origin → distances to each point (parity: ``distance.py:546-597``)."""
    origin = np.asarray(origin, dtype=np.float64).reshape(1, 2)
    if abs(origin[0, 0]) > 90:
        raise ValueError(_LAT_MSG)
    if abs(origin[0, 1]) > 180:
        raise ValueError(_LON_MSG)
    pts, index = frames.as_coords(points, lat_col=lat_col, lon_col=lon_col)
    _validate_ranges(pts)
    conv = unit_factor(metric)
    a, f = resolve_ellipsoid(ellipsoid)
    d = geodesic_inverse(origin[0, 0], origin[0, 1], pts[:, 0], pts[:, 1], a, f) * conv
    if index is not None and frames.pd is not None:
        return frames.pd.Series(d, index=index)
    return d


def bearing(point1, point2, ellipsoid="WGS-84"):
    """Initial forward azimuth degrees [0, 360) (parity: ``distance.py:169-214``)."""
    point1 = tuple(float(x) for x in point1)
    point2 = tuple(float(x) for x in point2)
    if abs(point1[0]) > 90 or abs(point2[0]) > 90:
        raise ValueError(_LAT_MSG)
    if abs(point1[1]) > 180 or abs(point2[1]) > 180:
        raise ValueError(_LON_MSG)
    a, f = resolve_ellipsoid(ellipsoid)
    _, az_fwd, _ = geodesic_inverse(
        point1[0], point1[1], point2[0], point2[1], a, f, with_azimuths=True
    )
    return float(np.atleast_1d(az_fwd)[0])


def destination(point, bearing_deg, distance, metric="meter", ellipsoid="WGS-84"):
    """Vincenty-direct destination, lon normalized to [-180, 180]
    (parity: ``distance.py:220-273``)."""
    point = tuple(float(x) for x in point)
    if abs(point[0]) > 90:
        raise ValueError(_LAT_MSG)
    if abs(point[1]) > 180:
        raise ValueError(_LON_MSG)
    conv = unit_factor(metric)
    distance_m = float(distance) / conv
    a, f = resolve_ellipsoid(ellipsoid)
    lat, lon = geodesic_direct(point[0], point[1], float(bearing_deg), distance_m, a, f)
    lat = float(np.atleast_1d(lat)[0])
    lon = float(np.atleast_1d(lon)[0])
    lon = ((lon + 180.0) % 360.0) - 180.0
    return (lat, lon)


def interpolate(point1, point2, n_points=1, ellipsoid="WGS-84"):
    """Evenly-spaced interior waypoints along the geodesic
    (parity: ``distance.py:279-356``; vectorized over the step index)."""
    if n_points < 1:
        raise ValueError("n_points must be >= 1")
    point1 = tuple(float(x) for x in point1)
    point2 = tuple(float(x) for x in point2)
    if abs(point1[0]) > 90 or abs(point2[0]) > 90:
        raise ValueError(_LAT_MSG)
    if abs(point1[1]) > 180 or abs(point2[1]) > 180:
        raise ValueError(_LON_MSG)
    a, f = resolve_ellipsoid(ellipsoid)

    dist, az_fwd, _ = geodesic_inverse(
        point1[0], point1[1], point2[0], point2[1], a, f, with_azimuths=True
    )
    total = float(np.atleast_1d(dist)[0])
    if total == 0.0:
        return [point1] * n_points
    fwd = float(np.atleast_1d(az_fwd)[0])
    seg = total / (n_points + 1)
    steps = seg * np.arange(1, n_points + 1, dtype=np.float64)
    lats, lons = geodesic_direct(point1[0], point1[1], fwd, steps, a, f)
    lons = ((np.asarray(lons) + 180.0) % 360.0) - 180.0
    return [(float(la), float(lo)) for la, lo in zip(np.atleast_1d(lats), np.atleast_1d(lons))]


def midpoint(point1, point2, ellipsoid="WGS-84"):
    """Geodesic midpoint (parity: ``distance.py:359-384``)."""
    return interpolate(point1, point2, n_points=1, ellipsoid=ellipsoid)[0]


def point_in_radius(center, candidates, radius, metric="meter", ellipsoid="WGS-84", lat_col=None, lon_col=None):
    """Candidates within radius, boundary-inclusive
    (parity: ``distance.py:390-457``). Returns (indices, distances)."""
    if radius < 0:
        raise ValueError("radius must be non-negative")
    center = np.asarray(center, dtype=np.float64).reshape(1, 2)
    if abs(center[0, 0]) > 90:
        raise ValueError(_LAT_MSG)
    if abs(center[0, 1]) > 180:
        raise ValueError(_LON_MSG)
    cands, index = frames.as_coords(candidates, lat_col=lat_col, lon_col=lon_col)
    _validate_ranges(cands)
    conv = unit_factor(metric)
    a, f = resolve_ellipsoid(ellipsoid)
    d = geodesic_inverse(center[0, 0], center[0, 1], cands[:, 0], cands[:, 1], a, f) * conv
    mask = d <= radius
    indices = np.where(mask)[0]
    if index is not None:
        indices = index[indices].values
    return indices, d[mask]


def geodesic_knn(point, candidates, k=1, metric="meter", ellipsoid="WGS-84", lat_col=None, lon_col=None):
    """Exact k nearest by geodesic distance, nearest-first
    (parity: ``distance.py:463-540``). Returns (indices, distances)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    point = np.asarray(point, dtype=np.float64).reshape(1, 2)
    if abs(point[0, 0]) > 90:
        raise ValueError(_LAT_MSG)
    if abs(point[0, 1]) > 180:
        raise ValueError(_LON_MSG)
    cands, index = frames.as_coords(candidates, lat_col=lat_col, lon_col=lon_col)
    _validate_ranges(cands)
    n = len(cands)
    if k > n:
        raise ValueError(f"k={k} is greater than the number of candidates ({n})")
    conv = unit_factor(metric)
    a, f = resolve_ellipsoid(ellipsoid)
    d = geodesic_inverse(point[0, 0], point[0, 1], cands[:, 0], cands[:, 1], a, f) * conv
    if k == n:
        order = np.argsort(d)
    else:
        order = np.argpartition(d, k - 1)[:k]
        order = order[np.argsort(d[order])]
    out_indices = index[order].values if index is not None else order
    return out_indices, d[order]


def greatcircle(coords1, coords2, metric="meter"):
    """Andoyer-Lambert great-circle distances (parity: ``distance.py:684-737``)."""
    coords1 = np.asarray(coords1, dtype=np.float64)
    coords2 = np.asarray(coords2, dtype=np.float64)
    assert coords1.shape == coords2.shape
    conv = unit_factor(metric)
    if np.size(coords1) == 2:
        return float(_great_circle_kernel(coords1[0], coords1[1], coords2[0], coords2[1]) * conv)
    if coords1.shape[1] != 2:
        raise ValueError(_SHAPE_MSG)
    _validate_ranges_pair(coords1, coords2)
    return _great_circle_kernel(coords1[:, 0], coords1[:, 1], coords2[:, 0], coords2[:, 1]) * conv


def greatcircle_matrix(coords1, coords2=None, metric="meter"):
    """Great-circle pdist/cdist matrix (parity: ``distance.py:740-814``)."""
    conv = unit_factor(metric)
    coords1 = np.asarray(coords1, dtype=np.float64)
    if coords1.ndim != 2 or coords1.shape[1] != 2:
        raise ValueError(_SHAPE_MSG)
    if (np.abs(coords1[:, 0]) > 90).any() or (np.abs(coords1[:, 1]) > 180).any():
        raise ValueError(_BOTH_MSG)
    if coords2 is None:
        coords2m = coords1
    else:
        coords2m = np.asarray(coords2, dtype=np.float64)
        if coords2m.ndim != 2 or coords2m.shape[1] != 2:
            raise ValueError(_SHAPE_MSG)
        if (np.abs(coords2m[:, 0]) > 90).any() or (np.abs(coords2m[:, 1]) > 180).any():
            raise ValueError(_BOTH_MSG)
    d = _great_circle_kernel(
        coords1[:, 0][:, None],
        coords1[:, 1][:, None],
        coords2m[:, 0][None, :],
        coords2m[:, 1][None, :],
    )
    if coords2 is None:
        np.fill_diagonal(d, 0.0)
    return d * conv


def geodist_dimwise(X):
    """(n, n, d-1) tensor: geodesic for dims 0-1, signed deltas for the rest
    (parity: ``geodesic.py:386-428``)."""
    X = np.asarray(X, dtype=np.float64)
    dist = np.zeros((X.shape[0], X.shape[0], X.shape[1] - 1))
    dist[:, :, 0] = geodist_matrix(X[:, :2])
    dist[:, :, 1:] = X[:, np.newaxis, 2:] - X[np.newaxis, :, 2:]
    return dist


def geodist_dimwise_haversine(X):
    """(n, n, d) squared per-dimension haversine/Euclidean tensor
    (parity: ``geodesic.py:856-919``, including its name's semantics)."""
    from .kernels.sphere import haversine_dimwise_sq

    X = np.asarray(X, dtype=np.float64)
    sdist = np.zeros((X.shape[0], X.shape[0], X.shape[1]))
    dlat_sq, dlon_sq = haversine_dimwise_sq(
        X[:, np.newaxis, 0], X[:, np.newaxis, 1], X[np.newaxis, :, 0], X[np.newaxis, :, 1]
    )
    sdist[:, :, 0] = dlat_sq
    sdist[:, :, 1] = dlon_sq
    sdist[:, :, 2:] = (X[:, np.newaxis, 2:] - X[np.newaxis, :, 2:]) ** 2
    return sdist


def karney(point1, point2, metric="meter", ellipsoid="WGS-84"):
    """Exact Karney distance (the oracle kernel exposed as API)."""
    _validate_ranges(np.asarray([point1, point2], dtype=np.float64))
    conv = unit_factor(metric)
    a, f = resolve_ellipsoid(ellipsoid)
    s, _, _ = karney_inverse(point1[0], point1[1], point2[0], point2[1], a, f)
    return float(np.atleast_1d(s)[0]) * conv
