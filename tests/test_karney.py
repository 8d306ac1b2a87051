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
