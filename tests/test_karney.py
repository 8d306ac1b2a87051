"""Karney oracle validation: agreement with Vincenty, goldens, roundtrips.

This is the engine's stand-in for the reference's geographiclib accuracy
benchmark (``/root/reference/benchmark.py:204-307``): two independent
implementations (iterative Vincenty vs quadrature-based Karney) agreeing at
the micrometer level over seeded random pairs is the sub-millimeter accuracy
evidence required by BASELINE.md.
"""

import numpy as np
import pytest

from geodistpy_ray.kernels import (
    geodesic_inverse,
    karney_direct,
    karney_inverse,
    vincenty_inverse,
)
from geodistpy_ray.kernels.karney import _norm_lon_deg


class TestKarneyAccuracy:
    def test_random_pairs_sub_mm(self):
        # Same seed protocol as the reference benchmark (seeds 100/200,
        # benchmark.py:33-37,210-212); sub-mm = mean < 1e-3 m.
        rng = np.random.default_rng(100)
        n = 5000
        lat1 = rng.uniform(-90, 90, n)
        lon1 = rng.uniform(-180, 180, n)
        lat2 = rng.uniform(-90, 90, n)
        lon2 = rng.uniform(-180, 180, n)
        dv = vincenty_inverse(lat1, lon1, lat2, lon2)
        ok = dv >= 0
        dk, _, _ = karney_inverse(lat1, lon1, lat2, lon2)
        err = np.abs(dv[ok] - dk[ok])
        assert err.mean() < 1e-3  # sub-millimeter mean
        assert err.max() < 5e-3  # reference class: max 108 µm

    def test_goldens(self):
        assert karney_inverse(52.52, 13.405, 48.8566, 2.3522)[0] == pytest.approx(
            879699.316, rel=1e-6
        )
        assert karney_inverse(90, 0, -90, 0)[0] == pytest.approx(
            20003931.458623, rel=1e-9
        )
        # Sydney → New York, the reference's worst edge case (README.md:98-112)
        assert karney_inverse(-33.8688, 151.2093, 40.7128, -74.006)[0] == pytest.approx(
            15988007.485, abs=0.01
        )

    def test_antipodal_cases_where_vincenty_fails(self):
        # Equatorial antipodes: shortest path goes over the pole (meridian
        # half-circumference), NOT along the equator.
        s, _, _ = karney_inverse(0.0, 0.0, 0.0, 180.0)
        assert s == pytest.approx(20003931.46, abs=0.1)
        s, _, _ = karney_inverse(0.5, 0.0, -0.5, 179.9)
        assert 19_900_000 < s < 20_010_000

    def test_fallback_composition(self):
        # geodesic_inverse patches Vincenty sentinels with Karney transparently.
        lat1 = np.array([52.52, 0.0, 0.5])
        lon1 = np.array([13.405, 0.0, 0.0])
        lat2 = np.array([48.8566, 0.0, -0.5])
        lon2 = np.array([2.3522, 180.0, 179.9])
        d = geodesic_inverse(lat1, lon1, lat2, lon2)
        assert (d >= 0).all()
        assert d[0] == pytest.approx(879699.316, rel=1e-6)
        assert d[1] == pytest.approx(20003931.46, abs=0.1)

    def test_equatorial_short(self):
        s, az1, az2 = karney_inverse(0.0, 0.0, 0.0, 10.0)
        assert s == pytest.approx(6378137.0 * np.radians(10.0), rel=1e-12)
        assert az1 == pytest.approx(90.0)
        assert az2 == pytest.approx(90.0)

    def test_meridional(self):
        s, az1, _ = karney_inverse(10.0, 5.0, 40.0, 5.0)
        dv = vincenty_inverse(10.0, 5.0, 40.0, 5.0)
        assert s == pytest.approx(dv, abs=1e-4)
        assert az1 == pytest.approx(0.0, abs=1e-9) or az1 == pytest.approx(360.0, abs=1e-9)


class TestKarneyDirect:
    def test_inverse_direct_roundtrip(self):
        rng = np.random.default_rng(200)
        n = 1000
        lat1 = rng.uniform(-90, 90, n)
        lon1 = rng.uniform(-180, 180, n)
        lat2 = rng.uniform(-90, 90, n)
        lon2 = rng.uniform(-180, 180, n)
        s, az1, _ = karney_inverse(lat1, lon1, lat2, lon2)
        la, lo, _ = karney_direct(lat1, lon1, az1, s)
        # positional error in meters (1 deg ≈ 111 km)
        derr = np.hypot(la - lat2, _norm_lon_deg(lo - lon2) * np.cos(np.radians(lat2)))
        assert np.max(derr) * 111_000 < 1e-2  # < 1 cm everywhere

    def test_azimuth_consistency(self):
        # azi2 of inverse == azi2 of direct continuation
        s, az1, az2 = karney_inverse(52.52, 13.405, 48.8566, 2.3522)
        _, _, az2d = karney_direct(52.52, 13.405, az1, s)
        assert az2d == pytest.approx(az2, abs=1e-6)


def _meridian_arc(lat_deg_from: float, lat_deg_to: float) -> float:
    """Independent meridian arc length (meters) on WGS-84 by 64-node
    Gauss-Legendre quadrature of a(1-e²)(1-e² sin²φ)^(-3/2) — machine
    precision for the one geodesic family with a closed integral form,
    used as the external oracle for over-the-pole near-antipodal cases
    (geographiclib is not available in this environment)."""
    from geodistpy_ray.kernels.ellipsoids import WGS84_A, WGS84_F

    e2 = WGS84_F * (2.0 - WGS84_F)
    lo, hi = np.radians(lat_deg_from), np.radians(lat_deg_to)
    x, w = np.polynomial.legendre.leggauss(64)
    t = 0.5 * (hi - lo) * x + 0.5 * (hi + lo)
    integrand = (1.0 - e2 * np.sin(t) ** 2) ** -1.5
    return float(WGS84_A * (1.0 - e2) * 0.5 * (hi - lo) * np.dot(w, integrand))


class TestKarneyNearAntipodal:
    """Stress suite for the inverse bisection at the antipodal boundary —
    the regime where Vincenty sentinels (fails to converge) and Karney is
    the engine's only answer. Oracles: the independent meridian-arc
    quadrature for over-the-pole cases, and inverse↔direct self-consistency
    (the direct solver never bisects, so a roundtrip is a genuine check).
    Mirrors the reference's antipodal stress case
    (/root/reference/tests/test_geodist.py:142-145) at golden precision.
    """

    def test_over_the_pole_vs_meridian_quadrature(self):
        # Δlon = 180°: the geodesic runs along the meridian pair over the
        # nearer pole; exact distance = arc(lat1→90) + arc(lat2→90).
        cases = []
        for lat1 in (80.0, 60.0, 45.0, 20.0, 5.0, 0.5):
            for gap in (1.0, 2.0, 5.0):
                lat2 = -lat1 + gap  # lat1+lat2 = gap > 0 → north pole path
                for lon1 in (0.0, 13.4, -77.0, 179.0):
                    cases.append((lat1, lon1, lat2, lon1 + 180.0))
        lat1, lon1, lat2, lon2 = map(np.asarray, zip(*cases))
        lon2 = np.where(lon2 > 180.0, lon2 - 360.0, lon2)
        s, _, _ = karney_inverse(lat1, lon1, lat2, lon2)
        expected = np.array(
            [_meridian_arc(a, 90.0) + _meridian_arc(b, 90.0) for a, b in zip(lat1, lat2)]
        )
        err = np.abs(s - expected)
        assert err.max() < 1e-3, err.max()  # sub-millimeter vs the quadrature

    def test_pole_to_antipode_sweep(self):
        # pole → antipodal pole is exactly the half meridian, for ANY
        # longitude pair (the azimuth is degenerate at the pole)
        half = _meridian_arc(-90.0, 90.0)
        lons = np.linspace(-180.0, 179.0, 25)
        s, _, _ = karney_inverse(
            np.full(lons.size, 90.0), lons, np.full(lons.size, -90.0), -lons
        )
        assert np.abs(s - half).max() < 1e-3

    def test_reference_near_antipodal_case_pinned(self):
        # the reference's own stress case asserts only > 19000 km; pin the
        # engine's value so a solver regression can't hide inside the bound
        s, az1, az2 = karney_inverse(0.0, 0.0, 0.5, 179.5)
        assert s > 19_000_000  # the reference's bound
        assert s == pytest.approx(19936288.579, abs=0.5)  # engine golden ±0.5 m
        # the lane-masked Vincenty still converges on THIS case — two
        # independent solvers (iterative Vincenty, quadrature+bisection
        # Karney) agreeing sub-mm is the strongest check available here
        dv = float(vincenty_inverse(0.0, 0.0, 0.5, 179.5))
        assert dv >= 0 and abs(dv - s) < 1e-3
        # the composed kernel returns the Vincenty lane here (it converged);
        # sub-mm against Karney either way
        gd = float(
            geodesic_inverse(
                np.array([0.0]), np.array([0.0]), np.array([0.5]), np.array([179.5])
            )[0]
        )
        assert abs(gd - s) < 1e-3

    def test_random_near_antipodal_roundtrip_and_symmetry(self):
        rng = np.random.default_rng(300)
        n = 400
        lat1 = rng.uniform(-88.0, 88.0, n)
        lon1 = rng.uniform(-180.0, 180.0, n)
        lat2 = -lat1 + rng.uniform(-0.4, 0.4, n)
        lon2 = _norm_lon_deg(lon1 + 180.0 + rng.uniform(-0.4, 0.4, n))
        # this band is exactly where Vincenty gives up — make sure the
        # sweep actually exercises the bisection, not the easy path
        assert (vincenty_inverse(lat1, lon1, lat2, lon2) < 0).mean() > 0.5
        s, az1, _ = karney_inverse(lat1, lon1, lat2, lon2)
        s_sw, _, _ = karney_inverse(lat2, lon2, lat1, lon1)
        # endpoint swap takes an independent bisection path; distances
        # must still agree sub-millimeter
        assert np.abs(s - s_sw).max() < 1e-3
        # inverse → direct roundtrip lands on the target sub-millimeter
        la, lo, _ = karney_direct(lat1, lon1, az1, s)
        derr_deg = np.hypot(la - lat2, _norm_lon_deg(lo - lon2) * np.cos(np.radians(lat2)))
        assert derr_deg.max() * 111_000.0 < 1e-3
