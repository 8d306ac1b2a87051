"""Kernel conformance vs the reference's golden values and metric-space laws.

Golden constants are pinned from the reference's test suite
(``/root/reference/tests/test_geodist.py:42-74,136-139,358-403``) — NOT its
docstrings, which are stale (SURVEY.md §0).
"""

import numpy as np
import pytest

from geodistpy_ray.kernels import (
    geodesic_direct,
    geodesic_inverse,
    great_circle,
    haversine,
    initial_bearing_sphere,
    resolve_ellipsoid,
    unit_factor,
    vincenty_direct,
    vincenty_inverse,
)

BERLIN = (52.5200, 13.4050)
PARIS = (48.8566, 2.3522)
MILE = 1609.344


class TestGoldenValues:
    def test_berlin_paris_km(self):
        d = vincenty_inverse(*BERLIN, *PARIS)
        assert d * 1e-3 == pytest.approx(879.699316, rel=1e-6)

    def test_us_cities_miles(self):
        d = vincenty_inverse(
            np.array([37.7749, 34.0522]),
            np.array([-122.4194, -118.2437]),
            np.array([40.7128, 41.8781]),
            np.array([-74.0060, -87.6298]),
        )
        np.testing.assert_allclose(
            d / MILE, [2571.945757, 1745.768063], rtol=1e-6
        )

    def test_pole_to_pole(self):
        assert vincenty_inverse(90.0, 0.0, -90.0, 0.0) == pytest.approx(
            20003931.458623, rel=1e-9
        )

    def test_antimeridian(self):
        d = vincenty_inverse(0.0, 179.0, 0.0, -179.0)
        assert d * 1e-3 == pytest.approx(222.4, rel=0.01)

    def test_coincident_zero(self):
        assert vincenty_inverse(37.7749, -122.4194, 37.7749, -122.4194) == 0.0

    def test_great_circle_equator_to_pole(self):
        assert great_circle(0.0, 0.0, 90.0, 0.0) == pytest.approx(
            10001965.729, rel=1e-3
        )

    def test_great_circle_close_to_vincenty(self):
        gc = great_circle(*BERLIN, *PARIS)
        vi = vincenty_inverse(*BERLIN, *PARIS)
        assert abs(gc - vi) < 50.0  # Andoyer-Lambert ~19 m mean error class

    def test_haversine_sane(self):
        h = haversine(*BERLIN, *PARIS)
        assert abs(h - 879699.0) < 5000.0

    def test_great_circle_subnormal_separation_not_nan(self):
        # hypothesis-found: dlon ~ 2e-157 deg makes S subnormal (!= 0), the
        # exact-zero guard missed it and (3R+1)/(2S) overflowed to inf ->
        # inf * 0 = NaN. Both S-side (coincident) and C-side (antipodal).
        d = great_circle(0.0, 0.0, 0.0, 2.0701568411718013e-157)
        assert d >= 0.0 and np.isfinite(d) and d < 1e-140
        d2 = great_circle(0.0, 0.0, 0.0, 180.0 - 1e-155)
        assert np.isfinite(d2) and d2 == pytest.approx(2.0015e7, rel=1e-2)
        # symmetry on the repro pair
        assert great_circle(0.0, 2.0701568411718013e-157, 0.0, 0.0) == d


class TestMetricProperties:
    @pytest.fixture(scope="class")
    def pts(self):
        rng = np.random.default_rng(42)
        n = 200
        return (
            rng.uniform(-85, 85, n),
            rng.uniform(-180, 180, n),
            rng.uniform(-85, 85, n),
            rng.uniform(-180, 180, n),
        )

    def test_symmetry(self, pts):
        lat1, lon1, lat2, lon2 = pts
        d12 = geodesic_inverse(lat1, lon1, lat2, lon2)
        d21 = geodesic_inverse(lat2, lon2, lat1, lon1)
        np.testing.assert_allclose(d12, d21, rtol=1e-9)

    def test_non_negative(self, pts):
        lat1, lon1, lat2, lon2 = pts
        assert (geodesic_inverse(lat1, lon1, lat2, lon2) >= 0).all()

    def test_triangle_inequality(self, pts):
        lat1, lon1, lat2, lon2 = pts
        latm = np.zeros_like(lat1)
        lonm = np.full_like(lon1, 10.0)
        d12 = geodesic_inverse(lat1, lon1, lat2, lon2)
        d1m = geodesic_inverse(lat1, lon1, latm, lonm)
        dm2 = geodesic_inverse(latm, lonm, lat2, lon2)
        assert (d12 <= d1m + dm2 + 1e-6).all()


class TestInverseFull:
    def test_bearing_berlin_paris(self):
        _, az, _ = vincenty_inverse(*BERLIN, *PARIS, with_azimuths=True)
        assert 240.0 < az < 250.0

    def test_cardinal_bearings(self):
        _, az_e, _ = vincenty_inverse(0.0, 0.0, 0.0, 1.0, with_azimuths=True)
        _, az_n, _ = vincenty_inverse(0.0, 0.0, 1.0, 0.0, with_azimuths=True)
        _, az_s, _ = vincenty_inverse(1.0, 0.0, 0.0, 0.0, with_azimuths=True)
        _, az_w, _ = vincenty_inverse(0.0, 1.0, 0.0, 0.0, with_azimuths=True)
        assert az_e == pytest.approx(90.0, abs=0.01)
        assert az_n == pytest.approx(0.0, abs=0.01) or az_n == pytest.approx(360.0, abs=0.01)
        assert az_s == pytest.approx(180.0, abs=0.01)
        assert az_w == pytest.approx(270.0, abs=0.01)

    def test_spherical_bearing_close(self):
        _, az, _ = vincenty_inverse(*BERLIN, *PARIS, with_azimuths=True)
        sb = initial_bearing_sphere(*BERLIN, *PARIS)
        assert abs(az - sb) < 0.5


class TestDirect:
    def test_roundtrip(self):
        rng = np.random.default_rng(7)
        n = 500
        lat1 = rng.uniform(-80, 80, n)
        lon1 = rng.uniform(-180, 180, n)
        lat2 = rng.uniform(-80, 80, n)
        lon2 = rng.uniform(-180, 180, n)
        d, az, _ = vincenty_inverse(lat1, lon1, lat2, lon2, with_azimuths=True)
        ok = d > 0
        la, lo = vincenty_direct(lat1[ok], lon1[ok], az[ok], d[ok])
        lo = ((lo + 180.0) % 360.0) - 180.0
        np.testing.assert_allclose(la, lat2[ok], atol=1e-8)
        np.testing.assert_allclose(lo, lon2[ok], atol=1e-8)

    def test_equator_east_degree(self):
        # 111.32 km east on the equator lands at ~(0, 1)
        la, lo = geodesic_direct(0.0, 0.0, 90.0, 111320.0)
        assert la == pytest.approx(0.0, abs=1e-6)
        assert lo == pytest.approx(1.0, abs=0.01)


class TestEllipsoidsUnits:
    def test_named_ellipsoids_all_resolve(self):
        from geodistpy_ray.kernels import ELLIPSOIDS

        for name in ELLIPSOIDS:
            a, f = resolve_ellipsoid(name)
            d = vincenty_inverse(*BERLIN, *PARIS, a=a, f=f)
            assert 870e3 < d < 890e3

    def test_clarke_differs(self):
        a, f = resolve_ellipsoid("Clarke (1880)")
        d_clarke = vincenty_inverse(*BERLIN, *PARIS, a=a, f=f)
        d_wgs = vincenty_inverse(*BERLIN, *PARIS)
        assert abs(d_clarke - d_wgs) > 10.0

    def test_custom_tuple(self):
        a, f = resolve_ellipsoid((6378137.0, 1 / 298.257223563))
        assert a == 6378137.0

    def test_bad_ellipsoid(self):
        with pytest.raises(ValueError):
            resolve_ellipsoid("Mars")
        with pytest.raises(ValueError):
            resolve_ellipsoid((-1.0, 0.003))
        with pytest.raises(ValueError):
            resolve_ellipsoid((6378137.0, 1.5))

    def test_unit_factors(self):
        assert unit_factor("meter") == 1.0
        assert unit_factor("km") == 1e-3
        assert unit_factor("mile") == 1 / 1609.344
        assert unit_factor("nmi") == 1 / 1852.0
        with pytest.raises(ValueError):
            unit_factor("furlong")

    def test_unit_consistency(self):
        d_m = vincenty_inverse(*BERLIN, *PARIS)
        assert d_m * unit_factor("km") * 1000 == pytest.approx(d_m)
        assert d_m * unit_factor("mile") * MILE == pytest.approx(d_m)


class TestSimplify:
    @staticmethod
    def _ref_keep(lat, lon, tol):
        """Scalar recursive Douglas–Peucker (the textbook form: deviation
        is distance to the anchor SEGMENT)."""
        from geodistpy_ray.kernels.simplify import gc_segment_distance

        n = len(lat)
        keep = set([0, n - 1])

        def rec(i, j):
            if j - i < 2:
                return
            best, bk = -1.0, None
            for m in range(i + 1, j):
                d = float(
                    gc_segment_distance(
                        lat[m], lon[m], lat[i], lon[i], lat[j], lon[j]
                    )
                )
                if d > best:
                    best, bk = d, m
            if best > tol:
                keep.add(bk)
                rec(i, bk)
                rec(bk, j)

        rec(0, n - 1)
        return sorted(keep)

    def test_mask_matches_scalar_reference(self):
        from geodistpy_ray.kernels.simplify import simplify_mask

        rng = np.random.default_rng(53)
        lat = np.cumsum(rng.uniform(-0.5, 0.5, 60)) + 40.0
        lon = np.cumsum(rng.uniform(-0.5, 0.5, 60)) + 10.0
        for tol in (1_000.0, 10_000.0, 60_000.0):
            got = np.flatnonzero(simplify_mask(lat, lon, tol)).tolist()
            assert got == self._ref_keep(lat, lon, tol), tol

    def test_deviation_bound_and_idempotence(self):
        from geodistpy_ray.kernels.simplify import (
            gc_segment_distance,
            simplify_mask,
        )

        rng = np.random.default_rng(59)
        lat = np.cumsum(rng.uniform(-0.3, 0.3, 120)) - 20.0
        lon = np.cumsum(rng.uniform(-0.3, 0.3, 120)) + 100.0
        tol = 20_000.0
        keep = simplify_mask(lat, lon, tol)
        kept = np.flatnonzero(keep)
        assert kept[0] == 0 and kept[-1] == lat.size - 1
        # every dropped point deviates <= tol from its simplified segment
        for a, b in zip(kept[:-1], kept[1:]):
            if b - a > 1:
                sl = slice(a + 1, b)
                dev = gc_segment_distance(
                    lat[sl], lon[sl], lat[a], lon[a], lat[b], lon[b]
                )
                assert float(dev.max()) <= tol
        # idempotence: simplifying the kept subset keeps everything
        keep2 = simplify_mask(lat[kept], lon[kept], tol)
        assert keep2.all()
        # degenerate sizes
        assert simplify_mask(np.array([1.0]), np.array([2.0]), tol).tolist() == [True]
        assert simplify_mask(np.array([]), np.array([]), tol).size == 0

    def test_out_and_back_spur_is_kept(self):
        """A point that backtracks ALONG the anchor line has zero
        cross-track deviation but a huge segment distance — the spur must
        survive simplification (the infinite-circle metric deleted an
        ~890 km excursion at a 1 m tolerance)."""
        from geodistpy_ray.kernels.simplify import simplify_mask

        lat = np.array([0.0, 0.0, 0.0])
        lon = np.array([0.0, 10.0, 2.0])
        assert simplify_mask(lat, lon, 1.0).tolist() == [True, True, True]
        # spur BEHIND the start too
        assert simplify_mask(
            np.array([0.0, 0.0, 0.0]), np.array([0.0, -10.0, 2.0]), 1.0
        ).tolist() == [True, True, True]

    def test_distributed_stage_matches_kernel(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from geodistpy_ray.kernels.simplify import simplify_mask
        from geodistpy_ray.stages.windows import simplify_tracks

        rng = np.random.default_rng(61)
        n = 300
        df = pd.DataFrame(
            {
                "k": rng.integers(0, 5, n),
                "t": np.arange(n, dtype=np.int64),
                "lat": np.cumsum(rng.uniform(-0.4, 0.4, n)),
                "lon": np.cumsum(rng.uniform(-0.4, 0.4, n)) + 30.0,
            }
        )
        tol = 15_000.0
        got = (
            simplify_tracks(rd.from_pandas(df).repartition(4), "k", "t", tol)
            .to_pandas()
            .sort_values(["k", "t"], ignore_index=True)
        )
        s = df.sort_values(["k", "t"], ignore_index=True)
        want = []
        for key, g in s.groupby("k"):
            m = simplify_mask(g["lat"].to_numpy(), g["lon"].to_numpy(), tol)
            want.append(g.loc[m])
        want = pd.concat(want, ignore_index=True)
        assert got["t"].tolist() == want["t"].tolist()


def test_rhumb_inverse_properties():
    from geodistpy_ray.kernels.sphere import haversine, rhumb_inverse

    R = 6371009.0
    # along a meridian the rhumb IS the great circle (course 0 or 180)
    d, b = rhumb_inverse(10.0, 5.0, 50.0, 5.0)
    assert float(d) == pytest.approx(float(haversine(10.0, 5.0, 50.0, 5.0)), rel=1e-12)
    assert float(b) == 0.0
    d, b = rhumb_inverse(50.0, 5.0, 10.0, 5.0)
    assert float(b) == 180.0
    # along a parallel the rhumb follows it: d = R·cosφ·Δλ, course 90/270
    d, b = rhumb_inverse(45.0, 0.0, 45.0, 90.0)
    assert float(d) == pytest.approx(R * np.cos(np.radians(45.0)) * np.pi / 2, rel=1e-12)
    assert float(b) == 90.0
    # antimeridian wrap takes the short way
    d, b = rhumb_inverse(0.0, 179.0, 0.0, -179.0)
    assert float(d) == pytest.approx(R * np.radians(2.0), rel=1e-9)
    assert float(b) == 90.0
    # rhumb is never shorter than the geodesic
    rng = np.random.default_rng(73)
    la1, lo1 = rng.uniform(-80, 80, 2000), rng.uniform(-180, 180, 2000)
    la2, lo2 = rng.uniform(-80, 80, 2000), rng.uniform(-180, 180, 2000)
    dr, _ = rhumb_inverse(la1, lo1, la2, lo2)
    dg = haversine(la1, lo1, la2, lo2)
    assert (dr >= dg - 1e-6).all()


def test_destination_and_midpoint_sphere_properties():
    from geodistpy_ray.kernels.sphere import (
        destination_sphere,
        haversine,
        initial_bearing_sphere,
        midpoint_sphere,
    )

    rng = np.random.default_rng(83)
    lat = rng.uniform(-80, 80, 1000)
    lon = rng.uniform(-180, 180, 1000)
    brg = rng.uniform(0, 360, 1000)
    dist = rng.uniform(1e3, 2e6, 1000)
    la2, lo2 = destination_sphere(lat, lon, brg, dist)
    # roundtrip: distance back equals the requested range
    np.testing.assert_allclose(haversine(lat, lon, la2, lo2), dist, rtol=1e-9)
    # initial bearing of the produced leg matches the request
    b = initial_bearing_sphere(lat, lon, la2, lo2)
    db = np.abs((b - brg + 180.0) % 360.0 - 180.0)
    assert float(db.max()) < 1e-6
    # midpoint: equidistant and collinear (on the same great circle)
    lat2 = rng.uniform(-80, 80, 1000)
    lon2 = rng.uniform(-180, 180, 1000)
    mla, mlo = midpoint_sphere(lat, lon, lat2, lon2)
    d1 = haversine(lat, lon, mla, mlo)
    d2 = haversine(lat2, lon2, mla, mlo)
    np.testing.assert_allclose(d1, d2, rtol=1e-6, atol=1e-3)
    total = haversine(lat, lon, lat2, lon2)
    np.testing.assert_allclose(d1 + d2, total, rtol=1e-6, atol=1e-3)


def test_gc_segment_distance_cases():
    from geodistpy_ray.kernels.simplify import gc_segment_distance
    from geodistpy_ray.kernels.sphere import haversine

    # abeam the middle → |cross-track|; behind → to start; beyond → to end
    d = float(gc_segment_distance(1.0, 5.0, 0.0, 0.0, 0.0, 10.0))
    assert d == pytest.approx(float(haversine(1.0, 5.0, 0.0, 5.0)), rel=1e-4)
    d = float(gc_segment_distance(0.0, -5.0, 0.0, 0.0, 0.0, 10.0))
    assert d == float(haversine(0.0, -5.0, 0.0, 0.0))
    d = float(gc_segment_distance(0.0, 15.0, 0.0, 0.0, 0.0, 10.0))
    assert d == float(haversine(0.0, 15.0, 0.0, 10.0))
    assert float(gc_segment_distance(0.0, 5.0, 0.0, 0.0, 0.0, 10.0)) < 1e-6
    # degenerate zero-length segment → plain point distance
    d = float(gc_segment_distance(3.0, 4.0, 10.0, 10.0, 10.0, 10.0))
    assert d == float(haversine(3.0, 4.0, 10.0, 10.0))
    # never exceeds the distance to either endpoint (vectorized sweep)
    rng = np.random.default_rng(107)
    lat = rng.uniform(-80, 80, 2000)
    lon = rng.uniform(-180, 180, 2000)
    seg = gc_segment_distance(lat, lon, 40.0, -5.0, 48.0, 10.0)
    to_a = haversine(lat, lon, 40.0, -5.0)
    to_b = haversine(lat, lon, 48.0, 10.0)
    assert (seg <= np.minimum(to_a, to_b) + 1e-6).all()
