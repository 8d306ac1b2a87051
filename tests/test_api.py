"""Reference-parity API conformance (ported test semantics from
``/root/reference/tests/test_geodist.py`` — golden values, property laws,
cross-operator consistency, validation errors)."""

import numpy as np
import pandas as pd
import pytest

from geodistpy_ray import (
    bearing,
    destination,
    geodesic_knn,
    geodist,
    geodist_dimwise,
    geodist_dimwise_haversine,
    geodist_matrix,
    geodist_to_many,
    greatcircle,
    greatcircle_matrix,
    interpolate,
    midpoint,
    point_in_radius,
)

BERLIN = (52.5200, 13.4050)
PARIS = (48.8566, 2.3522)
NYC = (40.7128, -74.0060)
LONDON = (51.5074, -0.1278)


class TestGeodist:
    def test_berlin_paris_km(self):
        assert geodist(BERLIN, PARIS, metric="km") == pytest.approx(879.699316, rel=1e-6)

    def test_elementwise(self):
        c1 = [(37.7749, -122.4194), (34.0522, -118.2437)]
        c2 = [(40.7128, -74.0060), (41.8781, -87.6298)]
        d = geodist(c1, c2, metric="mile")
        np.testing.assert_allclose(d, [2571.945757, 1745.768063], rtol=1e-6)

    def test_same_point_zero(self):
        assert geodist((37.7749, -122.4194), (37.7749, -122.4194)) == 0.0

    def test_pole_to_pole(self):
        assert geodist((90.0, 0.0), (-90.0, 0.0)) == pytest.approx(20003931.458623, rel=1e-9)

    def test_unit_conversion_consistency(self):
        m = geodist(BERLIN, PARIS, metric="meter")
        km = geodist(BERLIN, PARIS, metric="km")
        mile = geodist(BERLIN, PARIS, metric="mile")
        nmi = geodist(BERLIN, PARIS, metric="nmi")
        assert m == pytest.approx(km * 1000)
        assert mile * 1609.344 == pytest.approx(nmi * 1852.0)

    def test_validation(self):
        with pytest.raises(ValueError, match=r"Latitude"):
            geodist((91.0, 0.0), (0.0, 0.0))
        with pytest.raises(ValueError, match=r"Longitude"):
            geodist((0.0, 181.0), (0.0, 0.0))
        with pytest.raises(ValueError, match="not supported"):
            geodist(BERLIN, PARIS, metric="parsec")
        with pytest.raises(ValueError, match="Unknown ellipsoid"):
            geodist(BERLIN, PARIS, ellipsoid="Pluto")


class TestMatrix:
    def test_pdist_properties(self):
        rng = np.random.default_rng(3)
        pts = np.column_stack([rng.uniform(-80, 80, 30), rng.uniform(-180, 180, 30)])
        m = geodist_matrix(pts)
        assert m.shape == (30, 30)
        np.testing.assert_allclose(m, m.T, rtol=1e-9)
        assert (np.diag(m) == 0).all()

    def test_matrix_matches_pairwise(self):
        pts = np.array([BERLIN, PARIS, NYC])
        m = geodist_matrix(pts, metric="km")
        assert m[0, 1] == pytest.approx(geodist(BERLIN, PARIS, metric="km"), rel=1e-9)
        assert m[0, 2] == pytest.approx(geodist(BERLIN, NYC, metric="km"), rel=1e-9)

    def test_cdist(self):
        c1 = np.array([BERLIN, PARIS])
        c2 = np.array([NYC, LONDON, (35.0, 139.0)])
        m = geodist_matrix(c1, c2)
        assert m.shape == (2, 3)
        assert m[1, 1] == pytest.approx(geodist(PARIS, LONDON), rel=1e-9)

    def test_to_many_matches_matrix_row(self):
        pts = np.array([PARIS, NYC, LONDON])
        row = geodist_matrix(np.array([BERLIN]), pts)[0]
        many = geodist_to_many(BERLIN, pts)
        np.testing.assert_allclose(row, many, rtol=1e-12)

    def test_validation(self):
        with pytest.raises(ValueError):
            geodist_matrix(np.array([[1.0, 2.0, 3.0]]))
        with pytest.raises(ValueError):
            geodist_matrix(np.array([[95.0, 0.0]]))


class TestBearingDestination:
    def test_bearing_berlin_paris(self):
        assert 240.0 < bearing(BERLIN, PARIS) < 250.0

    def test_cardinals(self):
        assert bearing((0.0, 0.0), (0.0, 1.0)) == pytest.approx(90.0, abs=0.01)
        assert bearing((1.0, 0.0), (0.0, 0.0)) == pytest.approx(180.0, abs=0.01)
        assert bearing((0.0, 1.0), (0.0, 0.0)) == pytest.approx(270.0, abs=0.01)

    def test_destination_east_equator(self):
        lat, lon = destination((0.0, 0.0), 90.0, 111.32, metric="km")
        assert lat == pytest.approx(0.0, abs=1e-6)
        assert lon == pytest.approx(1.0, abs=0.01)

    def test_destination_roundtrip(self):
        d = geodist(BERLIN, PARIS)
        b = bearing(BERLIN, PARIS)
        lat, lon = destination(BERLIN, b, d)
        assert lat == pytest.approx(PARIS[0], abs=1e-6)
        assert lon == pytest.approx(PARIS[1], abs=1e-6)

    def test_validation(self):
        with pytest.raises(ValueError):
            bearing((95.0, 0.0), (0.0, 0.0))
        with pytest.raises(ValueError):
            destination((0.0, 200.0), 90.0, 100.0)


class TestInterpolate:
    def test_midpoint_equator(self):
        lat, lon = midpoint((0.0, 0.0), (0.0, 10.0))
        assert lat == pytest.approx(0.0, abs=1e-9)
        assert lon == pytest.approx(5.0, abs=1e-6)

    def test_waypoints_equispaced_and_ordered(self):
        wps = interpolate(BERLIN, PARIS, n_points=4)
        assert len(wps) == 4
        pts = [BERLIN] + wps + [PARIS]
        segs = [geodist(pts[i], pts[i + 1]) for i in range(5)]
        np.testing.assert_allclose(segs, segs[0], rtol=1e-6)

    def test_coincident(self):
        assert interpolate(BERLIN, BERLIN, n_points=3) == [BERLIN] * 3

    def test_validation(self):
        with pytest.raises(ValueError):
            interpolate(BERLIN, PARIS, n_points=0)


class TestRadiusKnn:
    def test_point_in_radius_inclusive(self):
        pts = [PARIS, NYC, LONDON]
        idx, dists = point_in_radius(BERLIN, pts, 1000, metric="km")
        np.testing.assert_array_equal(idx, [0, 2])
        # boundary-inclusive: radius exactly equal to a distance keeps it
        d = geodist(BERLIN, PARIS, metric="km")
        idx2, _ = point_in_radius(BERLIN, pts, d, metric="km")
        assert 0 in idx2

    def test_radius_distances_match_geodist(self):
        pts = [PARIS, NYC, LONDON]
        _, dists = point_in_radius(BERLIN, pts, 10000, metric="km")
        expect = [geodist(BERLIN, p, metric="km") for p in pts]
        np.testing.assert_allclose(dists, expect, rtol=1e-9)

    def test_knn_order(self):
        pts = [PARIS, NYC, LONDON]
        idx, dists = geodesic_knn(BERLIN, pts, k=2, metric="km")
        np.testing.assert_array_equal(idx, [0, 2])
        assert dists[0] < dists[1]
        assert dists[0] == pytest.approx(879.699316, rel=1e-6)

    def test_knn_k_equals_n(self):
        idx, dists = geodesic_knn(BERLIN, [PARIS, NYC, LONDON], k=3)
        assert list(idx) == [0, 2, 1]

    def test_knn_validation(self):
        with pytest.raises(ValueError, match="k must be >= 1"):
            geodesic_knn(BERLIN, [PARIS], k=0)
        with pytest.raises(ValueError, match="greater than the number"):
            geodesic_knn(BERLIN, [PARIS], k=5)
        with pytest.raises(ValueError, match="radius must be non-negative"):
            point_in_radius(BERLIN, [PARIS], -1.0)

    def test_dataframe_index_labels(self):
        df = pd.DataFrame(
            {"lat": [PARIS[0], NYC[0], LONDON[0]], "lon": [PARIS[1], NYC[1], LONDON[1]]},
            index=["paris", "nyc", "london"],
        )
        idx, _ = geodesic_knn(BERLIN, df, k=2)
        assert list(idx) == ["paris", "london"]
        s = geodist_to_many(BERLIN, df, metric="km")
        assert isinstance(s, pd.Series)
        assert list(s.index) == ["paris", "nyc", "london"]
        ridx, _ = point_in_radius(BERLIN, df, 1000, metric="km")
        assert list(ridx) == ["paris", "london"]


class TestGreatCircle:
    def test_matches_vincenty_class(self):
        gc = greatcircle(BERLIN, PARIS, metric="km")
        assert gc == pytest.approx(879.699, abs=1.0)

    def test_matrix(self):
        pts = np.array([BERLIN, PARIS, NYC])
        m = greatcircle_matrix(pts, metric="km")
        np.testing.assert_allclose(m, m.T, rtol=1e-9)
        assert (np.diag(m) == 0).all()
        m2 = greatcircle_matrix(pts, np.array([LONDON]), metric="km")
        assert m2.shape == (3, 1)


class TestDimwise:
    def test_shapes(self):
        X = np.array([[52.52, 13.405, 100.0], [48.8566, 2.3522, 200.0], [40.7128, -74.006, 300.0]])
        d = geodist_dimwise(X)
        assert d.shape == (3, 3, 2)
        assert d[0, 1, 0] == pytest.approx(879699.316, rel=1e-6)
        assert d[0, 1, 1] == pytest.approx(-100.0)
        sq = geodist_dimwise_haversine(X)
        assert sq.shape == (3, 3, 3)
        assert (np.diag(sq[:, :, 0]) == 0).all()
        # squared-meters magnitude sanity on the lat dimension
        assert sq[0, 1, 0] == pytest.approx((abs(52.52 - 48.8566) * 111195) ** 2, rel=0.01)

    def test_dimwise_symmetric_dist(self):
        X = np.array([[10.0, 20.0, 1.0], [30.0, 40.0, 2.0]])
        d = geodist_dimwise(X)
        assert d[0, 1, 0] == pytest.approx(d[1, 0, 0], rel=1e-12)
        assert d[0, 1, 1] == -d[1, 0, 1]


def test_driver_contract_registry_consistency():
    """Every oracle_sql key must name a queries() entry, every entry is
    callable, and the registry sizes match COVERAGE.md's running totals
    (update both together)."""
    import __ray_entry__ as m

    q = m.queries()
    o = m.oracle_sql()
    assert set(o) <= set(q), sorted(set(o) - set(q))
    assert all(callable(f) for f in q.values())
    # keep the documented tallies honest
    import re

    cov = open("/root/repo/COVERAGE.md").read()
    mt = re.search(r"Totals: (\d+) queries — (\d+) oracle-matched, (\d+) rows-only", cov)
    assert mt, "COVERAGE.md totals line missing"
    n_q, n_o, n_r = map(int, mt.groups())
    assert len(q) == n_q, (len(q), n_q)
    assert len(o) == n_o, (len(o), n_o)
    assert n_q - n_o == n_r, (n_q, n_o, n_r)


def test_link_triangles_non_contiguous_doc_ids(ray_session, tmp_path):
    """The triangle-close SEMI join packs (a, b) -> a*base + b; the base
    must exceed every endpoint, not just COUNT(docs). doc_id = 7i + 3
    (i < 48) is a fixture where a count-derived base collides packed keys
    and fabricates a phantom triangle at node 4 (verified divergence)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as m

    ids = np.arange(48, dtype=np.int64) * 7 + 3
    pq.write_table(
        pa.table({"doc_id": pa.array(ids), "text": pa.array(["x"] * ids.size)}),
        tmp_path / "documents.parquet",
    )

    n = ids.size
    edges = set()
    for i in ids:
        for j in range(3):
            d = (i * 7 + 13 * j + 1) % n
            a, b = min(int(i), int(d)), max(int(i), int(d))
            if a != b:
                edges.add((a, b))
    adj: dict[int, set] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want: dict[int, int] = {}
    for a, b in edges:
        for c in adj[a] & adj[b]:
            if c > b:
                want[a] = want.get(a, 0) + 1

    got = m.queries()["link_triangles"](str(tmp_path)).to_pandas()
    assert dict(zip(got["node"], got["n_triangles"])) == want


def test_geodist_pair_validation_order_matches_reference():
    """Reference checks BOTH arrays' latitudes before any longitude
    (distance.py:155-158): bad lon in coords1 + bad lat in coords2 must
    raise the latitude message."""
    import numpy as np
    import pytest

    from geodistpy_ray.api import geodist, greatcircle

    c1 = np.array([[10.0, 200.0], [0.0, 0.0]])
    c2 = np.array([[95.0, 10.0], [0.0, 0.0]])
    for fn in (geodist, greatcircle):
        with pytest.raises(ValueError, match="Latitude"):
            fn(c1, c2)
