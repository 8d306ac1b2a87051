"""frames.py contract tests, incl. the reference's monkeypatch ImportError
suite (``/root/reference/tests/test_pandas_support.py:235-290``) — geopandas
is not installable here, so the GeoDataFrame branch is exercised through fake
modules exactly the way the reference covers it."""

import numpy as np
import pandas as pd
import pytest

from geodistpy_ray import frames
from geodistpy_ray.frames import as_coords, coordinates_from_df


class TestColumnResolution:
    def test_auto_priority_order(self):
        df = pd.DataFrame(
            {"latitude": [1.0], "longitude": [2.0], "lat": [3.0], "lon": [4.0]}
        )
        coords, _ = coordinates_from_df(df)
        np.testing.assert_array_equal(coords, [[3.0, 4.0]])  # lat/lon wins

    def test_each_auto_pair(self):
        for la, lo in [("lat", "lon"), ("latitude", "longitude"), ("Lat", "Lon"), ("LAT", "LON")]:
            df = pd.DataFrame({la: [9.0], lo: [8.0], "other": ["x"]})
            coords, _ = coordinates_from_df(df)
            np.testing.assert_array_equal(coords, [[9.0, 8.0]])

    def test_explicit_columns(self):
        df = pd.DataFrame({"a": [1.5], "b": [2.5]})
        coords, idx = coordinates_from_df(df, lat_col="a", lon_col="b")
        np.testing.assert_array_equal(coords, [[1.5, 2.5]])
        assert list(idx) == [0]

    def test_missing_explicit_lat_col(self):
        df = pd.DataFrame({"a": [1.0], "b": [2.0]})
        with pytest.raises(ValueError, match="lat_col 'zz' not in DataFrame columns"):
            coordinates_from_df(df, lat_col="zz", lon_col="b")

    def test_missing_explicit_lon_col(self):
        df = pd.DataFrame({"a": [1.0], "b": [2.0]})
        with pytest.raises(ValueError, match="lon_col 'zz' not in DataFrame columns"):
            coordinates_from_df(df, lat_col="a", lon_col="zz")

    def test_no_inferable_columns(self):
        df = pd.DataFrame({"x": [1.0], "y": [2.0]})
        with pytest.raises(ValueError, match="Could not infer lat/lon columns"):
            coordinates_from_df(df)

    def test_index_carried_through(self):
        df = pd.DataFrame({"lat": [1.0, 2.0], "lon": [3.0, 4.0]}, index=["p", "q"])
        _, idx = coordinates_from_df(df)
        assert list(idx) == ["p", "q"]


class TestImportErrorContracts:
    """Ported from the reference's monkeypatch suite — the duck-typed
    fallbacks must raise the library-install hints, and a fake gpd module
    must drive the geometry branch (x=lon, y=lat)."""

    def test_dataframe_like_when_pandas_missing(self, monkeypatch):
        class FakeDataFrame:
            iloc = None
            columns = ["lat", "lon"]

        monkeypatch.setattr(frames, "pd", None)
        with pytest.raises(ImportError, match="pandas is required"):
            coordinates_from_df(FakeDataFrame())

    def test_geodataframe_like_when_geopandas_missing(self, monkeypatch):
        class FakeGeoDataFrame:
            geometry = []

        monkeypatch.setattr(frames, "gpd", None)
        with pytest.raises(ImportError, match="geopandas is required"):
            coordinates_from_df(FakeGeoDataFrame())

    def test_geodataframe_branch_with_fake_gpd(self, monkeypatch):
        class FakePoint:
            def __init__(self, x, y):
                self.x = x
                self.y = y

        class FakeGeoDataFrame:
            def __init__(self):
                self.geometry = [FakePoint(2.35, 48.85), FakePoint(-0.12, 51.50)]
                self.index = [10, 20]

        class FakeGpd:
            GeoDataFrame = FakeGeoDataFrame

        monkeypatch.setattr(frames, "gpd", FakeGpd)
        coords, index = coordinates_from_df(FakeGeoDataFrame())
        np.testing.assert_allclose(coords, [[48.85, 2.35], [51.50, -0.12]])
        assert list(index) == [10, 20]

    def test_geodataframe_branch_empty_geometry_raises(self, monkeypatch):
        class FakeGeoDataFrame:
            def __init__(self):
                self.geometry = []
                self.index = []

        class FakeGpd:
            GeoDataFrame = FakeGeoDataFrame

        monkeypatch.setattr(frames, "gpd", FakeGpd)
        with pytest.raises(ValueError, match="no geometry column or is empty"):
            coordinates_from_df(FakeGeoDataFrame())

    def test_non_frame_type_error(self):
        with pytest.raises(TypeError, match="got dict"):
            coordinates_from_df({"lat": [1.0]})


class TestAsCoords:
    def test_pair_promoted_to_row(self):
        arr, idx = as_coords((52.52, 13.405))
        assert arr.shape == (1, 2) and idx is None

    def test_n_by_2_passthrough(self):
        arr, idx = as_coords([[1.0, 2.0], [3.0, 4.0]])
        assert arr.shape == (2, 2) and idx is None

    def test_bad_shape(self):
        with pytest.raises(ValueError, match=r"shape \(n, 2\)"):
            as_coords([1.0, 2.0, 3.0])

    def test_dataframe_dispatch(self):
        df = pd.DataFrame({"lat": [5.0], "lon": [6.0]}, index=[42])
        arr, idx = as_coords(df)
        np.testing.assert_array_equal(arr, [[5.0, 6.0]])
        assert list(idx) == [42]
