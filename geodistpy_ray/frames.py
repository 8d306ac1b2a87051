"""DataFrame coordinate extraction (parity with the reference's pandas layer).

Behavior contract from ``/root/reference/geodistpy/pandas_support.py``:
auto-detection order lat/lon → latitude/longitude → Lat/Lon → LAT/LON,
explicit ``lat_col``/``lon_col`` validated against columns, index labels
carried through for result alignment, GeoDataFrame point geometry
(x=lon, y=lat) when geopandas is importable.
"""

from __future__ import annotations

import numpy as np

try:
    import pandas as pd
except ImportError:  # pragma: no cover
    pd = None

try:
    import geopandas as gpd  # noqa: F401  (not installable here; kept for parity)
except ImportError:
    gpd = None

_AUTO_PAIRS = [("lat", "lon"), ("latitude", "longitude"), ("Lat", "Lon"), ("LAT", "LON")]


def coordinates_from_df(df, lat_col=None, lon_col=None):
    """DataFrame/GeoDataFrame → ((n, 2) float64 coords, index)."""
    if gpd is not None and isinstance(df, gpd.GeoDataFrame):
        geom = df.geometry
        if geom is None or len(geom) == 0:
            raise ValueError("GeoDataFrame has no geometry column or is empty")
        lats = np.array([g.y for g in geom], dtype=np.float64)
        lons = np.array([g.x for g in geom], dtype=np.float64)
        return np.column_stack([lats, lons]), df.index

    if pd is not None and isinstance(df, pd.DataFrame):
        if lat_col is not None and lon_col is not None:
            lat_col, lon_col = str(lat_col), str(lon_col)
            if lat_col not in df.columns:
                raise ValueError(
                    f"lat_col '{lat_col}' not in DataFrame columns: {list(df.columns)}"
                )
            if lon_col not in df.columns:
                raise ValueError(
                    f"lon_col '{lon_col}' not in DataFrame columns: {list(df.columns)}"
                )
        else:
            for la, lo in _AUTO_PAIRS:
                if la in df.columns and lo in df.columns:
                    lat_col, lon_col = la, lo
                    break
            else:
                raise ValueError(
                    "Could not infer lat/lon columns. Provide lat_col and lon_col, "
                    "or use columns named 'lat'/'lon' or 'latitude'/'longitude'."
                )
        coords = np.column_stack(
            [
                df[lat_col].values.astype(np.float64),
                df[lon_col].values.astype(np.float64),
            ]
        )
        return coords, df.index

    if hasattr(df, "iloc") and hasattr(df, "columns"):
        raise ImportError("pandas is required to use DataFrame input.")
    if hasattr(df, "geometry"):
        raise ImportError("geopandas is required to use GeoDataFrame input.")
    raise TypeError(
        "coordinates_from_df expects a pandas DataFrame or GeoPandas GeoDataFrame, "
        f"got {type(df).__name__}"
    )


def as_coords(points, lat_col=None, lon_col=None):
    """Array-like or DataFrame → ((n, 2) array, index-or-None)."""
    if (pd is not None and isinstance(points, pd.DataFrame)) or (
        gpd is not None and isinstance(points, gpd.GeoDataFrame)
    ):
        return coordinates_from_df(points, lat_col=lat_col, lon_col=lon_col)
    arr = np.asarray(points, dtype=np.float64)
    if arr.ndim == 1 and arr.size == 2:
        arr = arr.reshape(1, 2)
    elif arr.ndim != 2 or arr.shape[1] != 2:
        raise ValueError("points must have shape (n, 2) or be a DataFrame/GeoDataFrame")
    return arr, None
