"""Grid-cell index: encode/decode roundtrips, covers are supersets, parents."""

import numpy as np
import pyarrow as pa
import pytest

from geodistpy_ray.cells import (
    cell_bounds,
    cell_center,
    cell_id,
    cell_indices,
    disc_cover,
    grid_shape,
    neighbor_cells,
    parent_cell,
)
from geodistpy_ray.kernels import haversine


class TestEncode:
    def test_roundtrip_center(self):
        rng = np.random.default_rng(5)
        lat = rng.uniform(-90, 90, 500)
        lon = rng.uniform(-180, 180, 500)
        c = cell_id(lat, lon, 2.0)
        mn_lat, mx_lat, mn_lon, mx_lon = cell_bounds(c, 2.0)
        assert ((lat >= mn_lat) & (lat <= mx_lat)).all()
        assert ((lon >= mn_lon) & (lon <= mx_lon)).all()

    def test_poles_and_antimeridian(self):
        c = cell_id(np.array([90.0, -90.0, 0.0]), np.array([180.0, -180.0, 0.0]), 2.0)
        nlat, nlon = grid_shape(2.0)
        assert (c >= 0).all() and (c < nlat * nlon).all()

    def test_indices_decode(self):
        c = cell_id(10.0, 20.0, 2.0)
        la, lo = cell_indices(c, 2.0)
        assert la == int((10.0 + 90) / 2.0)
        assert lo == int((20.0 + 180) / 2.0)


class TestHierarchy:
    def test_parent_consistent(self):
        rng = np.random.default_rng(6)
        lat = rng.uniform(-90, 90, 200)
        lon = rng.uniform(-180, 180, 200)
        fine = cell_id(lat, lon, 1.0)
        parent = parent_cell(fine, 1.0, 4)
        coarse = cell_id(lat, lon, 4.0)
        np.testing.assert_array_equal(parent, coarse)

    def test_parent_bad_factor(self):
        with pytest.raises(ValueError):
            parent_cell(np.array([0]), 1.0, 7)


class TestNeighbors:
    def test_ring1_size_interior(self):
        c = cell_id(0.0, 0.0, 2.0)
        src, neigh = neighbor_cells(c, 2.0, ring=1)
        assert neigh.size == 9
        assert c in neigh

    def test_lon_wrap(self):
        c = cell_id(0.0, -179.9, 2.0)
        _, neigh = neighbor_cells(c, 2.0, ring=1)
        other_side = cell_id(0.0, 179.9, 2.0)
        assert other_side in neigh

    def test_pole_clamp(self):
        c = cell_id(89.9, 0.0, 2.0)
        _, neigh = neighbor_cells(c, 2.0, ring=1)
        assert neigh.size == 6  # top row clipped


class TestDiscCover:
    def test_cover_is_superset(self):
        # every point within radius must land in a covered cell
        rng = np.random.default_rng(7)
        centers_lat = rng.uniform(-85, 85, 20)
        centers_lon = rng.uniform(-180, 180, 20)
        radius = 300_000.0
        for i in range(20):
            src, cover = disc_cover(centers_lat[i], centers_lon[i], radius, 2.0)
            cover = set(cover.tolist())
            # sample points on the disc rim and inside
            for ang in np.linspace(0, 360, 36):
                for frac in (0.3, 0.9, 1.0):
                    dlat = frac * radius / 111_000 * np.cos(np.radians(ang))
                    dlon = (
                        frac
                        * radius
                        / (111_000 * max(np.cos(np.radians(centers_lat[i])), 0.05))
                        * np.sin(np.radians(ang))
                    )
                    plat = np.clip(centers_lat[i] + dlat, -90, 90)
                    plon = ((centers_lon[i] + dlon + 540) % 360) - 180
                    if haversine(centers_lat[i], centers_lon[i], plat, plon) <= radius:
                        assert cell_id(plat, plon, 2.0) in cover

    def test_polar_cover_full_ring(self):
        src, cover = disc_cover(89.5, 0.0, 500_000.0, 2.0)
        # near-pole discs cover the full longitude ring at the top band
        nlat, nlon = grid_shape(2.0)
        top_band = set(range((nlat - 1) * nlon, nlat * nlon))
        assert top_band.issubset(set(cover.tolist()))


def test_tile_aggregate_partitioned_final_equals_shuffle(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from geodistpy_ray.stages.tiles import tile_aggregate

    rng = np.random.default_rng(13)
    tab = pa.table(
        {
            "cell": pa.array(rng.integers(0, 200, 3000), pa.int64()),
            "v": rng.uniform(0, 10, 3000),
        }
    )
    ds = rd.from_arrow(tab).repartition(6)
    a = (
        tile_aggregate(ds, value_cols=("v",), final="shuffle")
        .to_pandas()
        .sort_values("cell", ignore_index=True)
    )
    b = (
        tile_aggregate(ds, value_cols=("v",), final="partitioned")
        .to_pandas()
        .sort_values("cell", ignore_index=True)
    )
    assert a["cell"].tolist() == b["cell"].tolist()
    assert a["n"].tolist() == b["n"].tolist()
    assert np.allclose(a["sum_v"], b["sum_v"])


def test_cell_area_km2_partitions_the_sphere():
    from geodistpy_ray.cells import cell_area_km2, grid_shape

    for deg in (2.0, 5.0):
        nlat, nlon = grid_shape(deg)
        cells = np.arange(nlat * nlon, dtype=np.int64)
        a = cell_area_km2(cells, deg)
        assert (a > 0).all()
        # exact spherical partition: full grid sums to 4πR²
        total = 4.0 * np.pi * 6371.009**2
        assert abs(a.sum() - total) / total < 1e-12
        # within a latitude row every cell has the same area
        row = a.reshape(nlat, nlon)
        assert np.allclose(row, row[:, :1])
        # equatorial cells are the largest
        assert a.max() == row[nlat // 2, 0]


def test_zorder_key_locality_and_sql_mirror():
    import duckdb
    import pandas as pd

    from geodistpy_ray.cells import zorder_key, zorder_sql

    rng = np.random.default_rng(79)
    lat = np.concatenate([rng.uniform(-90, 90, 500), [90.0, -90.0, 0.0]])
    lon = np.concatenate([rng.uniform(-180, 180, 500), [180.0, -180.0, 0.0]])
    z = zorder_key(lat, lon)
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"lat": lat, "lon": lon}))
    got = con.execute(f"SELECT {zorder_sql('lat', 'lon')} AS z FROM t").df()["z"]
    assert (got.to_numpy() == z).all()
    # locality: nearby points share a long key prefix (same high bits)
    za = zorder_key(np.array([40.0]), np.array([10.0]))[0]
    zb = zorder_key(np.array([40.001]), np.array([10.001]))[0]
    zc = zorder_key(np.array([-40.0]), np.array([-170.0]))[0]
    assert (za >> 18) == (zb >> 18)
    assert (za >> 18) != (zc >> 18)
    with pytest.raises(ValueError, match="bits"):
        zorder_key(lat, lon, bits=0)


def test_near_pole_band_is_full_ring():
    """A disc whose latitude band ends in (89.999, 90): the cos clamp would
    inflate cos(extreme) and under-size the lon box — such bands must wrap
    every longitude so no covered cell (or in-radius point) is pruned."""
    from geodistpy_ray.cells import DEFAULT_CELL_DEG, disc_cover, grid_shape

    nlat, nlon = grid_shape(DEFAULT_CELL_DEG)
    # center 89.9996N: radius 2 m keeps |lat|+dlat below 90-1e-9 (the old
    # full-ring trigger) but inside the clamp zone
    src, cells = disc_cover(89.9996, 0.0, 2.0)
    # the candidate at lon 2.5 deg is ~1.94 m away -> its cell MUST be covered
    row = int(np.floor((89.9996 + 90.0) / DEFAULT_CELL_DEG))
    col = int(np.floor((2.5 + 180.0) / DEFAULT_CELL_DEG))
    assert row * nlon + col in set(cells.tolist())


def test_tile_aggregate_partitioned_keeps_null_cell_group(ray_session):
    """A null-laundered cell key (NaN) is one SQL NULL group: the
    partitioned final's pandas merge must keep it (dropna=False) exactly
    like the shuffle final does."""
    import ray.data as rd

    from geodistpy_ray.stages.tiles import tile_aggregate

    tbl = pa.table(
        {
            "cell": pa.array([7, 7, None, None, 9], pa.int64()),
            "v": pa.array([1.0, 2.0, 4.0, 8.0, 16.0]),
        }
    )
    ds = rd.from_arrow(tbl).repartition(2)
    for final in ("shuffle", "partitioned"):
        out = tile_aggregate(ds, "cell", ("v",), final=final).to_pandas()
        assert len(out) == 3, final
        null_row = out[out["cell"].isna()]
        assert len(null_row) == 1, final
        assert null_row["n"].iloc[0] == 2 and null_row["sum_v"].iloc[0] == 12.0
        assert out[out["cell"] == 7]["sum_v"].iloc[0] == 3.0


def test_tile_aggregate_null_values_follow_grouped_sum_convention(ray_session):
    """NULL VALUES in a sum column must never reach the bincount, where one
    NaN weight silently poisons the whole cell's sum (SQL SUM ignores
    NULLs): default raises naming nulls='zero'; 'zero' gives COALESCE
    semantics while n still counts every row (COUNT(*))."""
    import ray
    import ray.data as rd

    from geodistpy_ray.stages.tiles import tile_aggregate

    tbl = pa.table(
        {
            "cell": pa.array([7, 7, 9], pa.int64()),
            "v": pa.array([1.0, None, 16.0]),
        }
    )
    ds = rd.from_arrow(tbl)
    with pytest.raises(ray.exceptions.RayTaskError, match="nulls='zero'"):
        tile_aggregate(ds, "cell", ("v",), final="shuffle").to_pandas()
    out = (
        tile_aggregate(ds, "cell", ("v",), final="shuffle", nulls="zero")
        .to_pandas()
        .set_index("cell")
    )
    assert out.loc[7, "sum_v"] == 1.0 and out.loc[7, "n"] == 2
    assert out.loc[9, "sum_v"] == 16.0
    with pytest.raises(ValueError, match="nulls must be"):
        tile_aggregate(ds, "cell", ("v",), nulls="bogus")
