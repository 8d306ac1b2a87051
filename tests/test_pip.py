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
