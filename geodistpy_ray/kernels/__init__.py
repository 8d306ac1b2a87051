"""Pure-NumPy geodesic kernel layer (no Ray imports).

Batch-first re-derivations of the reference's scalar/Numba kernels
(``/root/reference/geodistpy/geodesic.py``), plus a from-scratch Karney
solver standing in for geographiclib. The two-pass fast/slow idiom —
vectorized Vincenty, then exact re-solve of the rare non-converged lanes —
mirrors the reference's sentinel + fallback design (``geodesic.py:243-358``)
but runs entirely inside one ``map_batches`` call per batch.
"""

from __future__ import annotations

import numpy as np

from .ellipsoids import (
    EARTH_RADIUS_M,
    ELLIPSOIDS,
    UNIT_FACTORS,
    WGS84_A,
    WGS84_F,
    resolve_ellipsoid,
    unit_factor,
)
from .karney import karney_direct, karney_inverse
from .sphere import (
    great_circle,
    haversine,
    haversine_dimwise_sq,
    initial_bearing_sphere,
)
from .vincenty import vincenty_direct, vincenty_inverse

__all__ = [
    "EARTH_RADIUS_M",
    "ELLIPSOIDS",
    "UNIT_FACTORS",
    "WGS84_A",
    "WGS84_F",
    "resolve_ellipsoid",
    "unit_factor",
    "haversine",
    "haversine_dimwise_sq",
    "great_circle",
    "initial_bearing_sphere",
    "vincenty_inverse",
    "vincenty_direct",
    "karney_inverse",
    "karney_direct",
    "geodesic_inverse",
    "geodesic_direct",
]


def geodesic_inverse(
    lat1,
    lon1,
    lat2,
    lon2,
    a: float = WGS84_A,
    f: float = WGS84_F,
    with_azimuths: bool = False,
):
    """Exact geodesic distance: vectorized Vincenty + Karney patch pass.

    The canonical per-batch kernel: runs the fast vectorized Vincenty inverse
    over all lanes, then re-solves the (rare, near-antipodal) ``-1.0``
    sentinel lanes with the exact Karney solver — the same two-pass split the
    reference implements across ``geodesic.py:204-240`` and ``:311-358``.
    """
    if with_azimuths:
        dist, az_fwd, az_back = vincenty_inverse(
            lat1, lon1, lat2, lon2, a, f, with_azimuths=True
        )
        bad = np.atleast_1d(dist) < 0.0
        if bad.any():
            d1 = np.atleast_1d(dist)
            a1 = np.atleast_1d(az_fwd)
            a2 = np.atleast_1d(az_back)
            l1 = np.broadcast_to(np.atleast_1d(np.asarray(lat1, float)), d1.shape)
            o1 = np.broadcast_to(np.atleast_1d(np.asarray(lon1, float)), d1.shape)
            l2 = np.broadcast_to(np.atleast_1d(np.asarray(lat2, float)), d1.shape)
            o2 = np.broadcast_to(np.atleast_1d(np.asarray(lon2, float)), d1.shape)
            s, azf, azb = karney_inverse(l1[bad], o1[bad], l2[bad], o2[bad], a, f)
            d1[bad] = s
            a1[bad] = azf
            # Karney returns the forward azimuth at point 2; Vincenty's "back
            # azimuth" is the same direction-of-travel convention (geodesic
            # continues through point 2), so they align.
            a2[bad] = azb
            dist, az_fwd, az_back = (
                d1.reshape(np.shape(dist)),
                a1.reshape(np.shape(az_fwd)),
                a2.reshape(np.shape(az_back)),
            )
        return dist, az_fwd, az_back

    dist = vincenty_inverse(lat1, lon1, lat2, lon2, a, f)
    bad = np.atleast_1d(dist) < 0.0
    if bad.any():
        d1 = np.atleast_1d(dist)
        l1 = np.broadcast_to(np.atleast_1d(np.asarray(lat1, float)), d1.shape)
        o1 = np.broadcast_to(np.atleast_1d(np.asarray(lon1, float)), d1.shape)
        l2 = np.broadcast_to(np.atleast_1d(np.asarray(lat2, float)), d1.shape)
        o2 = np.broadcast_to(np.atleast_1d(np.asarray(lon2, float)), d1.shape)
        d1[bad] = karney_inverse(l1[bad], o1[bad], l2[bad], o2[bad], a, f)[0]
        dist = d1.reshape(np.shape(dist))
    return dist


def geodesic_direct(lat, lon, azimuth_deg, distance_m, a: float = WGS84_A, f: float = WGS84_F):
    """Destination point: vectorized Vincenty direct + Karney patch pass.

    Returns ``(lat2, lon2)`` in degrees with ``lon2`` un-normalized (callers
    normalize, matching the reference's ``distance.py:272``).
    """
    lat2, lon2 = vincenty_direct(lat, lon, azimuth_deg, distance_m, a, f)
    bad = np.isnan(np.atleast_1d(lat2))
    if bad.any():
        l2 = np.atleast_1d(lat2)
        o2 = np.atleast_1d(lon2)
        l1 = np.broadcast_to(np.atleast_1d(np.asarray(lat, float)), l2.shape)
        o1 = np.broadcast_to(np.atleast_1d(np.asarray(lon, float)), l2.shape)
        az = np.broadcast_to(np.atleast_1d(np.asarray(azimuth_deg, float)), l2.shape)
        dm = np.broadcast_to(np.atleast_1d(np.asarray(distance_m, float)), l2.shape)
        kl, ko, _ = karney_direct(l1[bad], o1[bad], az[bad], dm[bad], a, f)
        l2[bad] = kl
        o2[bad] = ko
        lat2, lon2 = l2.reshape(np.shape(lat2)), o2.reshape(np.shape(lon2))
    return lat2, lon2
