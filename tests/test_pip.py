"""Point-in-polygon: ray-casting kernel vs NumPy oracle, join vs formula."""

import numpy as np
import pyarrow as pa
import pytest

from geodistpy_ray.stages.pip import _ring_contains, build_polygon_index


def _oracle_contains(lat, lon, rlats, rlons):
    """Independent scalar even-odd implementation (different formulation)."""
    inside = np.zeros(lat.shape, dtype=bool)
    for p in range(lat.size):
        x, y = lon[p], lat[p]
        c = False
        for i in range(len(rlats) - 1):
            y1, y2 = rlats[i], rlats[i + 1]
            x1, x2 = rlons[i], rlons[i + 1]
            if (y1 > y) != (y2 > y):
                if x < (x2 - x1) * (y - y1) / (y2 - y1) + x1:
                    c = not c
        inside[p] = c
    return inside


class TestRingContains:
    def test_vs_scalar_oracle_irregular(self):
        from geodistpy_ray.sources.polygons import test_polygons

        polys = test_polygons()
        rng = np.random.default_rng(11)
        for i in range(polys.num_rows):
            rlats = np.asarray(polys["ring_lats"][i].as_py())
            rlons = np.asarray(polys["ring_lons"][i].as_py())
            lat = rng.uniform(rlats.min() - 2, rlats.max() + 2, 400)
            lon = rng.uniform(rlons.min() - 2, rlons.max() + 2, 400)
            got = _ring_contains(lat, lon, rlats, rlons)
            exp = _oracle_contains(lat, lon, rlats, rlons)
            np.testing.assert_array_equal(got, exp)

    def test_square(self):
        rlats = np.array([0.0, 0.0, 10.0, 10.0, 0.0])
        rlons = np.array([0.0, 10.0, 10.0, 0.0, 0.0])
        lat = np.array([5.0, 15.0, -1.0, 9.9])
        lon = np.array([5.0, 5.0, 5.0, 9.9])
        np.testing.assert_array_equal(
            _ring_contains(lat, lon, rlats, rlons), [True, False, False, True]
        )

    def test_antimeridian_crossing_box(self):
        # box lon [170, 190] (i.e. 170..180 and -180..-170)
        rlats = np.array([-10.0, 10.0, 10.0, -10.0, -10.0])
        rlons = np.array([170.0, 170.0, 190.0, 190.0, 170.0])
        lat = np.array([0.0, 0.0, 0.0])
        lon = np.array([175.0, -175.0, 160.0])
        # remap into ring frame as PolygonJoiner does
        lon_t = np.where(lon < 170.0, lon + 360.0, lon)
        got = _ring_contains(lat, lon_t, rlats, rlons)
        np.testing.assert_array_equal(got, [True, True, False])


class TestJoin:
    def test_join_vs_diamond_formula(self, ray_session):
        import ray.data as rd

        from geodistpy_ray.functions.geocode import geocode_ids
        from geodistpy_ray.sources.polygons import diamond_polygons
        from geodistpy_ray.stages import add_geocode, point_in_polygon_join

        sf = "/root/testdata/sf0.001"
        ds = add_geocode(rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id"]))
        polys = diamond_polygons()
        res = point_in_polygon_join(ds, polys, id_col="doc_id").to_pandas()

        import duckdb

        ids = (
            duckdb.sql(f"SELECT doc_id FROM read_parquet('{sf}/documents.parquet')")
            .df()["doc_id"]
            .to_numpy()
        )
        lat, lon = geocode_ids(ids)
        pid = polys["poly_id"].to_numpy()
        clat = (polys["max_lat"].to_numpy() + polys["min_lat"].to_numpy()) / 2
        clon = (polys["max_lon"].to_numpy() + polys["min_lon"].to_numpy()) / 2
        hlat = (polys["max_lat"].to_numpy() - polys["min_lat"].to_numpy()) / 2
        hlon = (polys["max_lon"].to_numpy() - polys["min_lon"].to_numpy()) / 2
        expect = set()
        for i in range(pid.size):
            m = np.abs(lat - clat[i]) / hlat[i] + np.abs(lon - clon[i]) / hlon[i] < 1.0
            expect.update((int(d), int(pid[i])) for d in ids[m])
        got = set(zip(res["doc_id"].tolist(), res["poly_id"].tolist()))
        assert expect == got

    def test_index_buckets_cover_bbox(self):
        from geodistpy_ray.sources.polygons import diamond_polygons

        idx = build_polygon_index(diamond_polygons(), 2.0)
        # every polygon must appear in at least one bucket
        seen = set()
        for cand in idx["buckets"].values():
            seen.update(cand.tolist())
        assert len(seen) == len(idx["poly_ids"])


def _winding_number_contains(px, py, ring_x, ring_y):
    """Independent oracle: winding-number point-in-polygon (different
    algorithm family than the stage's even-odd ray casting)."""
    wn = 0
    n = len(ring_x) - 1
    for i in range(n):
        x1, y1, x2, y2 = ring_x[i], ring_y[i], ring_x[i + 1], ring_y[i + 1]
        if y1 <= py:
            if y2 > py and (x2 - x1) * (py - y1) - (px - x1) * (y2 - y1) > 0:
                wn += 1
        elif y2 <= py and (x2 - x1) * (py - y1) - (px - x1) * (y2 - y1) < 0:
            wn -= 1
    return wn != 0


def test_concave_star_polygon_conformance(ray_session):
    import ray.data as rd

    from geodistpy_ray.stages import point_in_polygon_join

    # 5-pointed star (concave) centered at (10, 20)
    ang = np.linspace(0.5 * np.pi, 2.5 * np.pi, 11)[:-1]
    r = np.where(np.arange(10) % 2 == 0, 6.0, 2.5)
    ring_lats = list(10.0 + r * np.sin(ang)) + [10.0 + r[0] * np.sin(ang[0])]
    ring_lons = list(20.0 + r * np.cos(ang)) + [20.0 + r[0] * np.cos(ang[0])]
    polys = pa.table(
        {
            "poly_id": pa.array([0], pa.int64()),
            "ring_lats": pa.array([ring_lats], pa.list_(pa.float64())),
            "ring_lons": pa.array([ring_lons], pa.list_(pa.float64())),
            "min_lat": pa.array([min(ring_lats)], pa.float64()),
            "max_lat": pa.array([max(ring_lats)], pa.float64()),
            "min_lon": pa.array([min(ring_lons)], pa.float64()),
            "max_lon": pa.array([max(ring_lons)], pa.float64()),
        }
    )
    rng = np.random.default_rng(41)
    n = 3000
    plat = rng.uniform(2, 18, n)
    plon = rng.uniform(12, 28, n)
    pts = rd.from_arrow(
        pa.table({"doc_id": np.arange(n, dtype=np.int64), "lat": plat, "lon": plon})
    ).repartition(3)
    got = set(
        point_in_polygon_join(pts, polys, id_col="doc_id", cell_deg=4.0)
        .to_pandas()["doc_id"]
    )
    want = {
        i
        for i in range(n)
        if _winding_number_contains(plon[i], plat[i], ring_lons, ring_lats)
    }
    assert got == want
    # a concave star must exclude points between its arms: the bounding-box
    # hull minus the star is non-empty, so got must be a strict subset
    bbox = {
        i
        for i in range(n)
        if min(ring_lats) <= plat[i] <= max(ring_lats)
        and min(ring_lons) <= plon[i] <= max(ring_lons)
    }
    assert len(got) < len(bbox)


def test_ring_area_matches_cell_area_on_grid_rectangles(ray_session):
    """The Chamberlain–Duquette line integral is EXACT on rectangles whose
    edges follow parallels/meridians — it must agree with the closed-form
    spherical cell area to fp noise, in either ring orientation."""
    import ray.data as rd

    from geodistpy_ray.cells import cell_area_km2, cell_bounds
    from geodistpy_ray.stages.pip import add_ring_area

    cells = np.array([0, 5000, 8100, 16199], dtype=np.int64)  # pole→equator→pole
    lo_lat, hi_lat, lo_lon, hi_lon = cell_bounds(cells, 2.0)
    lats, lons = [], []
    for i in range(cells.size):
        ring_lat = [lo_lat[i], lo_lat[i], hi_lat[i], hi_lat[i], lo_lat[i]]
        ring_lon = [lo_lon[i], hi_lon[i], hi_lon[i], lo_lon[i], lo_lon[i]]
        if i % 2:  # reversed orientation must give the same |area|
            ring_lat, ring_lon = ring_lat[::-1], ring_lon[::-1]
        lats.append(ring_lat)
        lons.append(ring_lon)
    # a degenerate 1-vertex ring must come out 0, not crash reduceat
    lats.append([10.0])
    lons.append([20.0])
    tbl = pa.table(
        {
            "poly_id": pa.array(list(range(len(lats))), pa.int64()),
            "ring_lats": pa.array(lats, pa.list_(pa.float64())),
            "ring_lons": pa.array(lons, pa.list_(pa.float64())),
        }
    )
    got = (
        add_ring_area(rd.from_arrow(tbl).repartition(2), round_to=None)
        .to_pandas()
        .sort_values("poly_id", ignore_index=True)
    )
    want = cell_area_km2(cells, 2.0)
    np.testing.assert_allclose(got["area_km2"][: cells.size], want, rtol=1e-12)
    assert got["area_km2"].iloc[-1] == 0.0


def test_ring_area_perimeter_on_sliced_list_view():
    """A zero-copy Arrow batch can be a SLICE of a larger list array whose
    `.values` child keeps trailing out-of-view rings — the final reduceat
    segment must not run past `offsets[-1]` into them (silently corrupting
    the last visible row)."""
    from geodistpy_ray.stages.pip import _ring_area_batch, _ring_perimeter_batch

    rings_lat = [
        [10.0, 10.0, 12.0, 12.0, 10.0],
        [0.0, 0.0, 2.0, 2.0, 0.0],
        [-45.0, -45.0, -40.0, -40.0, -45.0],  # out-of-view trailing ring
    ]
    rings_lon = [
        [20.0, 24.0, 24.0, 20.0, 20.0],
        [5.0, 6.0, 6.0, 5.0, 5.0],
        [100.0, 110.0, 110.0, 100.0, 100.0],
    ]
    full = pa.table(
        {
            "poly_id": pa.array([0, 1, 2], pa.int64()),
            "ring_lats": pa.array(rings_lat, pa.list_(pa.float64())),
            "ring_lons": pa.array(rings_lon, pa.list_(pa.float64())),
        }
    )
    view = full.slice(0, 2)  # sliced list columns, child arrays untouched
    fresh = pa.table(
        {
            "poly_id": pa.array([0, 1], pa.int64()),
            "ring_lats": pa.array(rings_lat[:2], pa.list_(pa.float64())),
            "ring_lons": pa.array(rings_lon[:2], pa.list_(pa.float64())),
        }
    )
    for fn, col in (
        (lambda t: _ring_area_batch(t, "ring_lats", "ring_lons", "a", 6371.009, None), "a"),
        (lambda t: _ring_perimeter_batch(t, "ring_lats", "ring_lons", "p"), "p"),
    ):
        got = fn(view).column(col).to_pylist()
        want = fn(fresh).column(col).to_pylist()
        assert got == want, f"sliced view diverged for {col}: {got} != {want}"
    # tail slice too: offsets start mid-child
    tail_view = full.slice(1, 2)
    tail_fresh = pa.table(
        {
            "poly_id": pa.array([1, 2], pa.int64()),
            "ring_lats": pa.array(rings_lat[1:], pa.list_(pa.float64())),
            "ring_lons": pa.array(rings_lon[1:], pa.list_(pa.float64())),
        }
    )
    got = _ring_area_batch(tail_view, "ring_lats", "ring_lons", "a", 6371.009, None)
    want = _ring_area_batch(tail_fresh, "ring_lats", "ring_lons", "a", 6371.009, None)
    assert got.column("a").to_pylist() == want.column("a").to_pylist()
