"""Ray Data geo stages vs brute-force NumPy oracles (sf0.001, small + fast)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from geodistpy_ray.functions.geocode import geocode_ids, query_points
from geodistpy_ray.kernels import geodesic_inverse, haversine

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_geo(ray_session):
    import ray.data as rd

    from geodistpy_ray.stages import add_geocode

    return add_geocode(rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"]))


@pytest.fixture(scope="module")
def truth():
    import duckdb

    ids = (
        duckdb.sql(f"SELECT doc_id FROM read_parquet('{SF}/documents.parquet') ORDER BY doc_id")
        .df()["doc_id"]
        .to_numpy()
    )
    lat, lon = geocode_ids(ids)
    return ids, lat, lon


class TestGeocodeCell:
    def test_geocode_matches_model(self, docs_geo, truth):
        ids, lat, lon = truth
        df = docs_geo.to_pandas().sort_values("doc_id")
        np.testing.assert_array_equal(df["lat"].to_numpy(), lat)
        np.testing.assert_array_equal(df["lon"].to_numpy(), lon)

    def test_actor_geocoder_identical(self, ray_session, truth):
        import ray.data as rd

        from geodistpy_ray.stages import GeocoderActor

        ids, lat, lon = truth
        ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"]).map_batches(
            GeocoderActor,
            fn_constructor_kwargs={"id_col": "doc_id"},
            batch_format="pyarrow",
            concurrency=2,
            batch_size=256,
        )
        df = ds.to_pandas().sort_values("doc_id")
        np.testing.assert_array_equal(df["lat"].to_numpy(), lat)

    def test_cell_stage(self, docs_geo, truth):
        from geodistpy_ray.cells import cell_id
        from geodistpy_ray.stages import add_cell

        ids, lat, lon = truth
        df = add_cell(docs_geo, 2.0).to_pandas().sort_values("doc_id")
        np.testing.assert_array_equal(df["cell"].to_numpy(), cell_id(lat, lon, 2.0))


class TestKnnStage:
    def test_vs_brute_force(self, docs_geo, truth):
        from geodistpy_ray.stages import knn_join

        ids, lat, lon = truth
        qid, qlat, qlon = query_points(6)
        res = knn_join(docs_geo, qid, qlat, qlon, k=4, kernel="vincenty").to_pandas()
        for j in range(6):
            d = geodesic_inverse(lat, lon, qlat[j], qlon[j])
            order = np.lexsort((ids, np.round(d, 6)))[:4]
            got = res[res.query_id == j].sort_values("rank")["doc_id"].to_numpy()
            np.testing.assert_array_equal(ids[order], got)

    def test_k_validation(self, docs_geo):
        from geodistpy_ray.stages import knn_join

        with pytest.raises(ValueError):
            knn_join(docs_geo, [0], [0.0], [0.0], k=0)


class TestRadiusStage:
    def test_vs_brute_force_inclusive(self, docs_geo, truth):
        from geodistpy_ray.stages import radius_join

        ids, lat, lon = truth
        qid, qlat, qlon = query_points(4)
        r = 800_000.0
        res = radius_join(docs_geo, qid, qlat, qlon, r, kernel="haversine").to_pandas()
        for j in range(4):
            d = haversine(lat, lon, qlat[j], qlon[j])
            expect = set(ids[d <= r].tolist())
            got = set(res[res.query_id == j]["doc_id"].tolist())
            assert expect == got

    def test_negative_radius(self, docs_geo):
        from geodistpy_ray.stages import radius_join

        with pytest.raises(ValueError):
            radius_join(docs_geo, [0], [0.0], [0.0], -5.0)


class TestTiles:
    def test_counts_match(self, ray_session, docs_geo, truth):
        import collections

        from geodistpy_ray.cells import cell_id
        from geodistpy_ray.stages import add_cell, tile_aggregate

        ids, lat, lon = truth
        out = tile_aggregate(add_cell(docs_geo, 2.0)).to_pandas()
        cnt = collections.Counter(cell_id(lat, lon, 2.0).tolist())
        assert dict(zip(out["cell"], out["n"])) == dict(cnt)

    def test_coarsened_counts(self, ray_session, docs_geo, truth):
        import collections

        from geodistpy_ray.cells import cell_id
        from geodistpy_ray.stages import add_cell, tile_aggregate

        ids, lat, lon = truth
        out = tile_aggregate(add_cell(docs_geo, 1.0), cell_deg=1.0, coarsen_factor=4).to_pandas()
        cnt = collections.Counter(cell_id(lat, lon, 4.0).tolist())
        assert dict(zip(out["cell"], out["n"])) == dict(cnt)


class TestClosePairs:
    def test_vs_brute_force(self, docs_geo, truth):
        from geodistpy_ray.stages.pairs import close_pairs

        ids, lat, lon = truth
        r = 200_000.0
        res = close_pairs(docs_geo, r, kernel="haversine", cell_deg=2.0).to_pandas()
        D = haversine(lat[:, None], lon[:, None], lat[None, :], lon[None, :])
        ii, jj = np.nonzero((D <= r) & (ids[:, None] < ids[None, :]))
        expect = set(zip(ids[ii].tolist(), ids[jj].tolist()))
        got = set(zip(res["id_left"].tolist(), res["id_right"].tolist()))
        assert expect == got

    def test_exactly_once_emission(self, docs_geo):
        from geodistpy_ray.stages.pairs import close_pairs

        res = close_pairs(docs_geo, 200_000.0, kernel="haversine", cell_deg=2.0).to_pandas()
        assert not res.duplicated(subset=["id_left", "id_right"]).any()


class TestRelational:
    def test_grouped_sum_driver_vs_shuffle(self, ray_session):
        import ray.data as rd

        from geodistpy_ray.stages.relational import grouped_sum

        li = rd.read_parquet(
            f"{SF}/lineitem.parquet", columns=["l_returnflag", "l_quantity"]
        )
        a = grouped_sum(
            li, ["l_returnflag"], int_sum_cols={"l_quantity": "sq"}, final="driver"
        ).sort_values("l_returnflag", ignore_index=True)
        b = (
            grouped_sum(li, ["l_returnflag"], int_sum_cols={"l_quantity": "sq"}, final="shuffle")
            .to_pandas()
            .sort_values("l_returnflag", ignore_index=True)
        )
        assert a[["l_returnflag", "sq", "n"]].equals(b[["l_returnflag", "sq", "n"]])

    def test_cents_matches_sql_formula(self):
        # determinism contract: identical to DuckDB's
        # CAST(FLOOR(x*100.0 + 0.5) AS BIGINT) bit for bit
        import duckdb

        from geodistpy_ray.stages.relational import cents

        rng = np.random.default_rng(9)
        x = np.round(rng.uniform(0, 10000, 500), 4)
        con = duckdb.connect()
        con.register("t", pd.DataFrame({"x": x}))
        sql = con.execute(
            "SELECT CAST(FLOOR(x * 100.0 + 0.5) AS BIGINT) FROM t"
        ).fetchnumpy()
        con.close()
        np.testing.assert_array_equal(cents(x), list(sql.values())[0])
