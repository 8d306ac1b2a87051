"""Spherical / quasi-spherical distance kernels, fully vectorized.

These are batch-first re-derivations of the reference's scalar kernels:

- :func:`haversine` — the spherical law used by the reference's dimwise
  pre-filter metric (``/root/reference/geodistpy/geodesic.py:893-915``).
- :func:`great_circle` — spherical central angle (Vincenty special case for
  numerical stability) plus the Andoyer-Lambert first-order flattening
  correction (``geodesic.py:676-853``). ~19 m mean error vs exact geodesics,
  no iteration — the cheap mid-accuracy kernel.
- :func:`initial_bearing_sphere` — spherical forward azimuth (the engine's
  SQL-checkable bearing variant; the exact ellipsoidal azimuth comes from
  :mod:`.vincenty`).

All functions take separate ``lat``/``lon`` column arrays in degrees
(broadcastable) and return float64 arrays — they are designed to run inside
``Dataset.map_batches`` on zero-copy Arrow columns.
"""

from __future__ import annotations

import numpy as np

from .ellipsoids import EARTH_RADIUS_M, WGS84_A, WGS84_F


def haversine(lat1, lon1, lat2, lon2, radius: float = EARTH_RADIUS_M):
    """Spherical haversine distance in meters (vectorized, broadcastable)."""
    lat1 = np.radians(np.asarray(lat1, dtype=np.float64))
    lon1 = np.radians(np.asarray(lon1, dtype=np.float64))
    lat2 = np.radians(np.asarray(lat2, dtype=np.float64))
    lon2 = np.radians(np.asarray(lon2, dtype=np.float64))
    dlat = lat2 - lat1
    dlon = lon2 - lon1
    h = np.sin(dlat / 2.0) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2.0) ** 2
    # Clip guards fastmath-free rounding at antipodes (h can exceed 1 by 1 ulp).
    return 2.0 * radius * np.arcsin(np.sqrt(np.clip(h, 0.0, 1.0)))


def great_circle(lat1, lon1, lat2, lon2, a: float = WGS84_A, f: float = WGS84_F):
    """Great-circle distance with Andoyer-Lambert flattening correction (meters).

    Matches the reference's ``great_circle`` scalar semantics including the
    degenerate-case guards (coincident → 0; ``S == 0`` or ``C == 0`` →
    ``2·ω·a``, e.g. pole-to-pole / equatorial antipodes;
    ``geodesic.py:735-767``), but evaluated lane-wise over whole columns.
    """
    lat1 = np.radians(np.asarray(lat1, dtype=np.float64))
    lon1 = np.radians(np.asarray(lon1, dtype=np.float64))
    lat2 = np.radians(np.asarray(lat2, dtype=np.float64))
    lon2 = np.radians(np.asarray(lon2, dtype=np.float64))

    dlon = np.abs(lon2 - lon1)

    mean_lat = (lat1 + lat2) / 2.0
    half_dlat = (lat1 - lat2) / 2.0
    half_dlon = dlon / 2.0

    sinF2, cosF2 = np.sin(mean_lat) ** 2, np.cos(mean_lat) ** 2
    sinG2, cosG2 = np.sin(half_dlat) ** 2, np.cos(half_dlat) ** 2
    sinL2, cosL2 = np.sin(half_dlon) ** 2, np.cos(half_dlon) ** 2

    S = sinG2 * cosL2 + cosF2 * sinL2
    C = cosG2 * cosL2 + sinF2 * sinL2
    omega = np.arctan2(np.sqrt(S), np.sqrt(C))

    # The zero guards must also catch SUBNORMAL S/C: a near-coincident pair
    # (dlon ~ 1e-157 deg) gives S ~ 1e-318 != 0, H2 = (3R+1)/(2S) overflows
    # to inf, and inf * (sinG2 == 0) lands NaN. Below `tiny` the pair sits
    # within ~1e-154 rad of the exact degenerate case the reference returns
    # 2*omega*a for, so widening the guard changes nothing measurable.
    tiny = np.finfo(np.float64).tiny
    degenerate = (S < tiny) | (C < tiny) | (omega == 0.0)
    S_safe = np.where(S < tiny, 1.0, S)
    C_safe = np.where(C < tiny, 1.0, C)
    omega_safe = np.where(omega == 0.0, 1.0, omega)

    R = np.sqrt(S * C) / omega_safe
    D = 2.0 * omega * a
    H1 = (3.0 * R - 1.0) / (2.0 * C_safe)
    H2 = (3.0 * R + 1.0) / (2.0 * S_safe)
    corrected = D * (1.0 + f * (H1 * sinF2 * cosG2 - H2 * cosF2 * sinG2))

    # coincident points hit S == 0 → degenerate → D = 2·0·a = 0, so no
    # separate zero-angle guard is needed (the old Vincenty-form sigma was
    # computed only for that guard — ~40% of the kernel's trig for a no-op)
    return np.where(degenerate, D, corrected)


def initial_bearing_sphere(lat1, lon1, lat2, lon2):
    """Spherical initial bearing in degrees [0, 360), vectorized."""
    lat1 = np.radians(np.asarray(lat1, dtype=np.float64))
    lon1 = np.radians(np.asarray(lon1, dtype=np.float64))
    lat2 = np.radians(np.asarray(lat2, dtype=np.float64))
    lon2 = np.radians(np.asarray(lon2, dtype=np.float64))
    dlon = lon2 - lon1
    y = np.sin(dlon) * np.cos(lat2)
    x = np.cos(lat1) * np.sin(lat2) - np.sin(lat1) * np.cos(lat2) * np.cos(dlon)
    return np.degrees(np.arctan2(y, x)) % 360.0


def haversine_dimwise_sq(lat1, lon1, lat2, lon2, radius: float = EARTH_RADIUS_M):
    """Per-dimension squared haversine components in meters² (vectorized).

    Returns ``(dlat_m_sq, dlon_m_sq)`` — the split-dimension squared metric
    the reference exposes as ``geodist_dimwise_harvesine``
    (``geodesic.py:856-919``), broadcastable instead of materializing (n,n,d).
    """
    lat1 = np.asarray(lat1, dtype=np.float64)
    lon1 = np.asarray(lon1, dtype=np.float64)
    lat2 = np.asarray(lat2, dtype=np.float64)
    lon2 = np.asarray(lon2, dtype=np.float64)
    dlat = np.abs(np.radians(lat1 - lat2))
    dlng = np.abs(np.radians(lon1 - lon2))
    sin_half_dlat = np.sin(dlat / 2.0)
    dlat_m_sq = (radius * 2.0 * np.arcsin(np.abs(sin_half_dlat))) ** 2
    inner = (
        1.0 - sin_half_dlat**2 - np.sin(np.radians(lat1 + lat2) / 2.0) ** 2
    ) * np.sin(dlng / 2.0) ** 2
    dlon_m_sq = (radius * 2.0 * np.arcsin(np.sqrt(np.clip(inner, 0.0, None)))) ** 2
    return dlat_m_sq, dlon_m_sq


def rhumb_inverse(lat1, lon1, lat2, lon2, radius: float = EARTH_RADIUS_M):
    """Rhumb-line (loxodrome, constant-bearing) distance and forward
    bearing between points — the navigation twin of the great circle
    (public formulas: Mercator-stretched latitude Δψ, E-W stretch factor
    q = Δφ/Δψ, distance R·√(Δφ² + q²Δλ²), bearing atan2(Δλ, Δψ)).

    Returns ``(dist_m, bearing_deg)`` with the bearing normalized to
    [0, 360). The near-parallel branch (|Δψ| < 1e-12 → q = cos φ1) is an
    exact conditional, mirrorable in SQL on bit-identical inputs.
    """
    lat1 = np.radians(np.asarray(lat1, dtype=np.float64))
    lon1 = np.radians(np.asarray(lon1, dtype=np.float64))
    lat2 = np.radians(np.asarray(lat2, dtype=np.float64))
    lon2 = np.radians(np.asarray(lon2, dtype=np.float64))
    dlat = lat2 - lat1
    dpsi = np.log(
        np.tan(np.pi / 4.0 + lat2 / 2.0) / np.tan(np.pi / 4.0 + lat1 / 2.0)
    )
    # anti-meridian wrap: take the shorter E-W direction
    dlon = lon2 - lon1
    dlon = dlon - np.floor(dlon / (2.0 * np.pi) + 0.5) * (2.0 * np.pi)
    q = np.where(np.abs(dpsi) > 1e-12, dlat / np.where(dpsi == 0.0, 1.0, dpsi), np.cos(lat1))
    dist = radius * np.sqrt(dlat * dlat + q * q * dlon * dlon)
    brg_raw = np.degrees(np.arctan2(dlon, dpsi))
    brg = brg_raw - np.floor(brg_raw / 360.0) * 360.0
    return dist, brg


def destination_sphere(lat, lon, bearing_deg, dist_m, radius: float = EARTH_RADIUS_M):
    """Spherical direct problem: destination after ``dist_m`` on initial
    ``bearing_deg`` (the great-circle twin of the ellipsoidal Vincenty
    direct — SQL-mirrorable, unlike the iterative ellipsoidal form).
    Returns ``(lat2, lon2)`` degrees, lon wrapped to [-180, 180)."""
    lat1 = np.radians(np.asarray(lat, dtype=np.float64))
    lon1 = np.radians(np.asarray(lon, dtype=np.float64))
    brg = np.radians(np.asarray(bearing_deg, dtype=np.float64))
    delta = np.asarray(dist_m, dtype=np.float64) / radius
    sin_lat2 = np.sin(lat1) * np.cos(delta) + np.cos(lat1) * np.sin(delta) * np.cos(brg)
    lat2 = np.arcsin(np.clip(sin_lat2, -1.0, 1.0))
    lon2 = lon1 + np.arctan2(
        np.sin(brg) * np.sin(delta) * np.cos(lat1),
        np.cos(delta) - np.sin(lat1) * sin_lat2,
    )
    lat2d = np.degrees(lat2)
    lon2d = np.degrees(lon2)
    lon2d = (lon2d + 540.0) % 360.0 - 180.0
    return lat2d, lon2d


def midpoint_sphere(lat1, lon1, lat2, lon2):
    """Spherical great-circle midpoint (degrees), the standard Bx/By form;
    lon wrapped to [-180, 180). SQL-mirrorable."""
    p1 = np.radians(np.asarray(lat1, dtype=np.float64))
    l1 = np.radians(np.asarray(lon1, dtype=np.float64))
    p2 = np.radians(np.asarray(lat2, dtype=np.float64))
    l2 = np.radians(np.asarray(lon2, dtype=np.float64))
    dlon = l2 - l1
    bx = np.cos(p2) * np.cos(dlon)
    by = np.cos(p2) * np.sin(dlon)
    latm = np.arctan2(
        np.sin(p1) + np.sin(p2),
        np.sqrt((np.cos(p1) + bx) * (np.cos(p1) + bx) + by * by),
    )
    lonm = l1 + np.arctan2(by, np.cos(p1) + bx)
    latd = np.degrees(latm)
    lond = np.degrees(lonm)
    lond = (lond + 540.0) % 360.0 - 180.0
    return latd, lond
