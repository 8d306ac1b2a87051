"""Polyline simplification on the sphere (Douglas–Peucker), pure NumPy.

The reference has no simplification op (its API stops at distance /
bearing / interpolation); tracks at web scale want the classic DP pass
before storage or rendering. Deviation is the great-circle distance to the
anchor SEGMENT (``gc_segment_distance``: endpoint distance when the point
projects behind/beyond the chord, cross-track otherwise), degenerating to
plain point distance when a segment's endpoints coincide. NOT the infinite
great-circle cross-track formula alone — that has zero deviation along the
anchor line, so an out-and-back spur on the same great circle would be
silently deleted (the bug class pinned in tests/test_kernels.py).

Import-clean of Ray (CLAUDE.md kernels rule); the distributed stage wraps
:func:`simplify_mask` per key span inside one co-located partition
(``stages/windows.py:simplify_tracks``).
"""

from __future__ import annotations

import numpy as np

from .ellipsoids import EARTH_RADIUS_M
from .sphere import haversine, initial_bearing_sphere


def cross_track_distance(lat, lon, lat1, lon1, lat2, lon2, radius: float = EARTH_RADIUS_M):
    """|cross-track| distance (meters) of points from the great circle
    through (lat1, lon1) → (lat2, lon2); coincident anchors degenerate to
    the distance to the anchor point. Vectorized over the points."""
    d13 = haversine(lat1, lon1, lat, lon, radius=radius)
    b13 = np.radians(initial_bearing_sphere(lat1, lon1, lat, lon))
    b12 = np.radians(initial_bearing_sphere(lat1, lon1, lat2, lon2))
    dxt = np.abs(np.arcsin(np.sin(d13 / radius) * np.sin(b13 - b12))) * radius
    degenerate = (lat1 == lat2) & (lon1 == lon2)
    return np.where(degenerate, d13, dxt)


def simplify_mask(lat, lon, tol_m: float, radius: float = EARTH_RADIUS_M) -> np.ndarray:
    """Douglas–Peucker keep-mask for one ordered polyline.

    Iterative stack form (no recursion depth limit); each split evaluates
    the whole open segment's deviations in one vectorized call. Endpoints
    are always kept; a 0/1-point line is kept whole.

    Deviation is the distance to the anchor SEGMENT
    (:func:`gc_segment_distance`), not the infinite great circle: a point
    that backtracks ALONG the anchor line (an out-and-back spur) has zero
    cross-track deviation but a large segment distance — the
    infinite-circle variant silently deletes arbitrarily long spurs.
    """
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    n = lat.size
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = keep[-1] = True
    if n <= 2:
        return keep
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j - i < 2:
            continue
        sl = slice(i + 1, j)
        dev = gc_segment_distance(
            lat[sl], lon[sl], lat[i], lon[i], lat[j], lon[j], radius=radius
        )
        k = int(np.argmax(dev))
        if dev[k] > tol_m:
            m = i + 1 + k
            keep[m] = True
            stack.append((i, m))
            stack.append((m, j))
    return keep


def gc_segment_distance(lat, lon, lat1, lon1, lat2, lon2, radius: float = EARTH_RADIUS_M):
    """Distance (meters) from points to a great-circle SEGMENT (not the
    infinite circle): the standard along-track decomposition —

    - behind the start (cos(θ13−θ12) < 0): distance to the start point,
    - beyond the end (along-track > segment length): distance to the end,
    - else |cross-track|.

    Vectorized over the points; mirrored term-for-term in SQL by the
    corridor queries. Degenerate zero-length segments fall back to the
    point distance.
    """
    d13 = haversine(lat1, lon1, lat, lon, radius=radius)
    b13 = np.radians(initial_bearing_sphere(lat1, lon1, lat, lon))
    b12 = np.radians(initial_bearing_sphere(lat1, lon1, lat2, lon2))
    dxt = np.arcsin(np.sin(d13 / radius) * np.sin(b13 - b12)) * radius
    # along-track via the spherical Pythagoras; clip guards |cos ratio| > 1
    # by 1 ulp at dxt ≈ d13
    cos_ratio = np.cos(d13 / radius) / np.cos(dxt / radius)
    dat = np.arccos(np.clip(cos_ratio, -1.0, 1.0)) * radius
    d12 = haversine(lat1, lon1, lat2, lon2, radius=radius)
    d2p = haversine(lat2, lon2, lat, lon, radius=radius)
    behind = np.cos(b13 - b12) < 0.0
    beyond = dat > d12
    out = np.where(behind, d13, np.where(beyond, d2p, np.abs(dxt)))
    # far-field guard: past ~a quarter circumference the asin/acos
    # decomposition folds and can overestimate — but the segment distance
    # is by definition ≤ the distance to each endpoint, so clamp (exact
    # for the near field, where corridor queries live)
    out = np.minimum(out, np.minimum(d13, d2p))
    degenerate = (lat1 == lat2) & (lon1 == lon2)
    return np.where(degenerate, d13, out)
