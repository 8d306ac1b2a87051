"""From-scratch Karney-style geodesic solver (accuracy oracle + fallback).

The reference delegates its rare Vincenty non-convergence cases and its
accuracy benchmark to ``geographiclib`` (``/root/reference/geodistpy/
geodesic.py:33,204-240``, ``benchmark.py:204-265``). That package is not
installable here, so this module re-implements the *exact* geodesic problem
following the construction in:

    Karney, C. F. F. (2013). "Algorithms for geodesics".
    Journal of Geodesy 87(1):43-55. arXiv:1109.4448.

Design choice vs both geographiclib and the paper: instead of 6th-order
series expansions for the geodesic integrals, we evaluate them **numerically**
with fixed-order Gauss-Legendre quadrature (the integrands are analytic and
nearly constant for terrestrial flattenings, so 64 nodes reach machine
precision), and solve the inverse problem's root-find with a **vectorized
bisection** on alpha1 over the canonical arrangement, where lambda12(alpha1)
is monotone (Karney §4). This trades a constant factor of speed (irrelevant —
this kernel is only the accuracy oracle and the <0.01% Vincenty-fallback
path) for implementation robustness.

All angles in degrees at the API boundary, meters for distances.
Vectorized over 1-D lanes.
"""

from __future__ import annotations

import numpy as np

from .ellipsoids import WGS84_A, WGS84_F

_GL_NODES, _GL_WEIGHTS = np.polynomial.legendre.leggauss(64)
_TINY = 1e-154
_BISECT_ITERS = 85


def _norm_lon_deg(lon):
    """Normalize degrees to (-180, 180]."""
    out = np.remainder(np.asarray(lon, dtype=np.float64) + 180.0, 360.0) - 180.0
    return np.where(out == -180.0, 180.0, out)


def _sincosd(deg):
    r = np.radians(deg)
    return np.sin(r), np.cos(r)


def _i1(sigma, k2):
    """I1(sigma) = ∫₀^σ sqrt(1 + k2 sin²t) dt, vectorized over lanes."""
    sigma = np.asarray(sigma, dtype=np.float64)
    k2 = np.asarray(k2, dtype=np.float64)
    half = sigma[..., None] / 2.0
    t = half * (_GL_NODES + 1.0)
    vals = np.sqrt(1.0 + k2[..., None] * np.sin(t) ** 2)
    return (vals * _GL_WEIGHTS).sum(axis=-1) * half[..., 0]


def _i2(sigma, k2):
    """I2(sigma) = ∫₀^σ dt / sqrt(1 + k2 sin²t)."""
    sigma = np.asarray(sigma, dtype=np.float64)
    k2 = np.asarray(k2, dtype=np.float64)
    half = sigma[..., None] / 2.0
    t = half * (_GL_NODES + 1.0)
    vals = 1.0 / np.sqrt(1.0 + k2[..., None] * np.sin(t) ** 2)
    return (vals * _GL_WEIGHTS).sum(axis=-1) * half[..., 0]


def _i3(sigma, k2, f):
    """I3(sigma) = ∫₀^σ (2-f) / (1 + (1-f) sqrt(1 + k2 sin²t)) dt (Karney eq. 8/25)."""
    sigma = np.asarray(sigma, dtype=np.float64)
    k2 = np.asarray(k2, dtype=np.float64)
    half = sigma[..., None] / 2.0
    t = half * (_GL_NODES + 1.0)
    vals = (2.0 - f) / (1.0 + (1.0 - f) * np.sqrt(1.0 + k2[..., None] * np.sin(t) ** 2))
    return (vals * _GL_WEIGHTS).sum(axis=-1) * half[..., 0]


def _beta_sincos(lat_deg, f):
    """Normalized (sin, cos) of the reduced latitude beta."""
    slat, clat = _sincosd(lat_deg)
    sbet = (1.0 - f) * slat
    cbet = clat
    h = np.hypot(sbet, cbet)
    return sbet / h, np.maximum(cbet / h, _TINY)


def _lambda12(salp1, calp1, sbet1, cbet1, sbet2, cbet2, f, ep2):
    """lambda12 and helper quantities for a trial alpha1 (canonical arrangement).

    Returns (lam12, salp0, calp0, sig1, sig2, salp2, calp2, k2).
    """
    salp0 = salp1 * cbet1
    calp0 = np.hypot(calp1, salp1 * sbet1)
    k2 = ep2 * calp0 * calp0

    ssig1, csig1 = sbet1, cbet1 * calp1
    sig1 = np.arctan2(ssig1, csig1)
    omg1 = np.arctan2(salp0 * ssig1, csig1)

    # alpha2 in [0, pi/2] in the canonical arrangement (Karney §4).
    salp2 = salp0 / cbet2
    calp2 = np.sqrt(np.maximum((calp1 * cbet1) ** 2 + (cbet2**2 - cbet1**2), 0.0)) / cbet2
    ssig2, csig2 = sbet2, cbet2 * calp2
    sig2 = np.arctan2(ssig2, csig2)
    omg2 = np.arctan2(salp0 * ssig2, csig2)

    lam12 = (omg2 - omg1) - f * salp0 * (_i3(sig2, k2, f) - _i3(sig1, k2, f))
    return lam12, salp0, calp0, sig1, sig2, salp2, calp2, k2


def karney_inverse(lat1, lon1, lat2, lon2, a: float = WGS84_A, f: float = WGS84_F):
    """Exact inverse geodesic problem, vectorized.

    Returns ``(s12, azi1, azi2)`` — distance in meters, forward azimuth at
    point 1 and *forward* azimuth at point 2 (geographiclib convention),
    both in degrees normalized to [0, 360).
    """
    lat1 = np.atleast_1d(np.asarray(lat1, dtype=np.float64))
    lon1 = np.atleast_1d(np.asarray(lon1, dtype=np.float64))
    lat2 = np.atleast_1d(np.asarray(lat2, dtype=np.float64))
    lon2 = np.atleast_1d(np.asarray(lon2, dtype=np.float64))
    shape = np.broadcast_shapes(lat1.shape, lon1.shape, lat2.shape, lon2.shape)
    lat1, lon1, lat2, lon2 = (
        np.broadcast_to(x, shape).ravel().copy() for x in (lat1, lon1, lat2, lon2)
    )
    n = lat1.size
    b = a * (1.0 - f)
    ep2 = f * (2.0 - f) / (1.0 - f) ** 2

    # ── Canonicalize: |bet1| >= |bet2|, bet1 <= 0, lam12 in [0, pi] ──
    lon12 = _norm_lon_deg(lon2 - lon1)
    lonsign = np.where(lon12 >= 0.0, 1.0, -1.0)
    lon12 = np.abs(lon12)

    swapp = np.where(np.abs(lat1) < np.abs(lat2), -1.0, 1.0)
    sw = swapp < 0
    lat1_c = np.where(sw, lat2, lat1)
    lat2_c = np.where(sw, lat1, lat2)
    lonsign = np.where(sw, -lonsign, lonsign)

    latsign = np.where(lat1_c < 0.0, 1.0, -1.0)
    lat1_c = lat1_c * latsign
    lat2_c = lat2_c * latsign

    sbet1, cbet1 = _beta_sincos(lat1_c, f)
    sbet2, cbet2 = _beta_sincos(lat2_c, f)
    # Guard roundoff when |lat1| == |lat2| (keep |bet1| >= |bet2| exactly;
    # canonically cbet1 <= cbet2, so only clamp when roundoff inverts it).
    fix = cbet2 < cbet1
    cbet2 = np.where(fix, cbet1, cbet2)
    sbet2 = np.where(fix, np.sign(sbet2) * np.abs(sbet1), sbet2)

    lam12 = np.radians(lon12)
    slam12, clam12 = _sincosd(lon12)

    s12 = np.zeros(n)
    salp1 = np.zeros(n)
    calp1 = np.ones(n)
    salp2 = np.zeros(n)
    calp2 = np.ones(n)

    coincident = (lat1_c == lat2_c) & (lon12 == 0.0) & (sbet1 == sbet2)
    meridian = (~coincident) & ((lat1_c == -90.0) | (slam12 == 0.0))
    equatorial = (
        (~coincident)
        & (~meridian)
        & (sbet1 == 0.0)
        & (sbet2 == 0.0)
        & (lam12 <= (1.0 - f) * np.pi)
    )

    # ── Meridional candidates (incl. lam12 == pi over-the-pole paths) ──
    if meridian.any():
        m = meridian
        ca1 = clam12[m]
        sa1 = slam12[m]
        ssig1, csig1 = sbet1[m], ca1 * cbet1[m]
        ssig2, csig2 = sbet2[m], cbet2[m]
        sig1 = np.arctan2(ssig1, csig1)
        sig12 = np.arctan2(
            np.maximum(csig1 * ssig2 - ssig1 * csig2, 0.0),
            csig1 * csig2 + ssig1 * ssig2,
        )
        k2m = np.full(sig1.shape, ep2)
        i1_1 = _i1(sig1, k2m)
        i1_2 = _i1(sig1 + sig12, k2m)
        s_merid = b * (i1_2 - i1_1)
        # Reduced length m12 >= 0 test (conjugate-point check, Karney §4):
        # J(sig) = I1(sig) - I2(sig).
        j1 = i1_1 - _i2(sig1, k2m)
        j2 = i1_2 - _i2(sig1 + sig12, k2m)
        sig2v = sig1 + sig12
        m12 = b * (
            np.sqrt(1.0 + k2m * np.sin(sig2v) ** 2) * np.cos(sig1) * np.sin(sig2v)
            - np.sqrt(1.0 + k2m * np.sin(sig1) ** 2) * np.sin(sig1) * np.cos(sig2v)
            - np.cos(sig1) * np.cos(sig2v) * (j2 - j1)
        )
        ok = (sig12 < 1.0) | (m12 >= 0.0)
        gi = np.flatnonzero(m)
        acc = gi[ok]
        s12[acc] = s_merid[ok]
        salp1[acc] = sa1[ok]
        calp1[acc] = ca1[ok]
        salp2[acc] = 0.0
        calp2[acc] = 1.0
        meridian = np.zeros(n, dtype=bool)
        meridian[acc] = True

    # ── Equatorial: geodesic runs along the equator ──
    if equatorial.any():
        e = equatorial
        s12[e] = a * lam12[e]
        salp1[e] = 1.0
        calp1[e] = 0.0
        salp2[e] = 1.0
        calp2[e] = 0.0

    general = ~(coincident | meridian | equatorial)
    if general.any():
        g = np.flatnonzero(general)
        sb1 = sbet1[g].copy()
        cb1 = cbet1[g]
        sb2, cb2 = sbet2[g], cbet2[g]
        # Perturb equatorial starts off the equator so sigma quadrants resolve
        # (geographiclib does the same with -tiny).
        sb1 = np.where(sb1 == 0.0, -_TINY, sb1)
        target = lam12[g]

        lo = np.full(g.size, 1e-12)
        hi = np.full(g.size, np.pi - 1e-12)
        for _ in range(_BISECT_ITERS):
            mid = 0.5 * (lo + hi)
            lam_mid = _lambda12(
                np.sin(mid), np.cos(mid), sb1, cb1, sb2, cb2, f, ep2
            )[0]
            take_hi = lam_mid < target
            lo = np.where(take_hi, mid, lo)
            hi = np.where(take_hi, hi, mid)
        alp1 = 0.5 * (lo + hi)
        _, salp0, calp0, sig1, sig2, sa2, ca2, k2 = _lambda12(
            np.sin(alp1), np.cos(alp1), sb1, cb1, sb2, cb2, f, ep2
        )
        s12[g] = b * (_i1(sig2, k2) - _i1(sig1, k2))
        salp1[g] = np.sin(alp1)
        calp1[g] = np.cos(alp1)
        salp2[g] = sa2
        calp2[g] = ca2

    # ── Map azimuths back through the canonical transforms ──
    t_s, t_c = salp1.copy(), calp1.copy()
    salp1 = np.where(sw, salp2, salp1)
    calp1 = np.where(sw, calp2, calp1)
    salp2 = np.where(sw, t_s, salp2)
    calp2 = np.where(sw, t_c, calp2)

    salp1 *= swapp * lonsign
    calp1 *= swapp * latsign
    salp2 *= swapp * lonsign
    calp2 *= swapp * latsign

    azi1 = np.degrees(np.arctan2(salp1, calp1)) % 360.0
    azi2 = np.degrees(np.arctan2(salp2, calp2)) % 360.0
    azi1 = np.where(coincident, 0.0, azi1)
    azi2 = np.where(coincident, 0.0, azi2)
    return s12.reshape(shape), azi1.reshape(shape), azi2.reshape(shape)


def karney_direct(lat1, lon1, azi1, s12, a: float = WGS84_A, f: float = WGS84_F):
    """Exact direct geodesic problem, vectorized.

    Returns ``(lat2, lon2, azi2)`` in degrees; lon2 normalized to (-180, 180].
    """
    lat1 = np.atleast_1d(np.asarray(lat1, dtype=np.float64))
    lon1 = np.atleast_1d(np.asarray(lon1, dtype=np.float64))
    azi1 = np.atleast_1d(np.asarray(azi1, dtype=np.float64))
    s12 = np.atleast_1d(np.asarray(s12, dtype=np.float64))
    shape = np.broadcast_shapes(lat1.shape, lon1.shape, azi1.shape, s12.shape)
    lat1, lon1, azi1, s12 = (
        np.broadcast_to(x, shape).ravel() for x in (lat1, lon1, azi1, s12)
    )
    b = a * (1.0 - f)
    ep2 = f * (2.0 - f) / (1.0 - f) ** 2

    salp1, calp1 = _sincosd(azi1)
    sbet1, cbet1 = _beta_sincos(lat1, f)

    salp0 = salp1 * cbet1
    calp0 = np.hypot(calp1, salp1 * sbet1)
    k2 = ep2 * calp0 * calp0

    ssig1, csig1 = sbet1, cbet1 * calp1
    sig1 = np.arctan2(ssig1, csig1)
    omg1 = np.arctan2(salp0 * ssig1, csig1)

    # Solve I1(sig2) - I1(sig1) = s12 / b by Newton (monotone, derivative in
    # [1, sqrt(1+k2)] — converges in a handful of steps from the flat guess).
    i1_sig1 = _i1(sig1, k2)
    rhs = s12 / b + i1_sig1
    sig2 = sig1 + (s12 / b) / np.sqrt(1.0 + k2 * 0.5)
    for _ in range(30):
        fval = _i1(sig2, k2) - rhs
        deriv = np.sqrt(1.0 + k2 * np.sin(sig2) ** 2)
        step = fval / deriv
        sig2 = sig2 - step
        if np.max(np.abs(step)) < 1e-15:
            break

    ssig2, csig2 = np.sin(sig2), np.cos(sig2)
    sbet2 = calp0 * ssig2
    cbet2 = np.hypot(salp0, calp0 * csig2)
    lat2 = np.degrees(np.arctan2(sbet2, (1.0 - f) * cbet2))

    # omega advances with sigma; unwrap the atan2 branch to stay continuous.
    omg2_raw = np.arctan2(salp0 * ssig2, csig2)
    omg2 = omg2_raw + 2.0 * np.pi * np.round((sig2 - omg2_raw) / (2.0 * np.pi))

    lam12 = (omg2 - omg1) - f * salp0 * (_i3(sig2, k2, f) - _i3(sig1, k2, f))
    lon2 = _norm_lon_deg(lon1 + np.degrees(lam12))

    azi2 = np.degrees(np.arctan2(salp0, calp0 * csig2)) % 360.0
    return lat2.reshape(shape), lon2.reshape(shape), azi2.reshape(shape)
