"""DataFrame coordinate extraction (parity with the reference's pandas layer).

Behavior contract from ``/root/reference/geodistpy/pandas_support.py`` (the
error STRINGS and detection ORDER are asserted by the reference's own test
suite, so they are preserved verbatim; the implementation is this engine's
own): auto-detection order lat/lon → latitude/longitude → Lat/Lon →
LAT/LON, explicit ``lat_col``/``lon_col`` validated against columns, index
labels carried through for result alignment, GeoDataFrame point geometry
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

#: auto-detection candidates, tried in priority order (lat keys → lon twin)
_LON_FOR = {"lat": "lon", "latitude": "longitude", "Lat": "Lon", "LAT": "LON"}


def _pick_columns(df, lat_col, lon_col) -> tuple[str, str]:
    """Resolve the (lat, lon) column names or raise the contract errors."""
    if lat_col is not None and lon_col is not None:
        pair = (str(lat_col), str(lon_col))
        for role, name in zip(("lat_col", "lon_col"), pair):
            if name not in df.columns:
                raise ValueError(
                    f"{role} '{name}' not in DataFrame columns: {list(df.columns)}"
                )
        return pair
    have = set(df.columns)
    for la, lo in _LON_FOR.items():
        if {la, lo} <= have:
            return la, lo
    raise ValueError(
        "Could not infer lat/lon columns. Provide lat_col and lon_col, "
        "or use columns named 'lat'/'lon' or 'latitude'/'longitude'."
    )


def _geometry_coords(df) -> np.ndarray:
    """Point geometry → (n, 2) [lat, lon]; shapely points are (x=lon, y=lat)."""
    geom = df.geometry
    if geom is None or len(geom) == 0:
        raise ValueError("GeoDataFrame has no geometry column or is empty")
    out = np.empty((len(geom), 2), dtype=np.float64)
    for i, point in enumerate(geom):
        out[i, 0] = point.y
        out[i, 1] = point.x
    return out


def coordinates_from_df(df, lat_col=None, lon_col=None):
    """DataFrame/GeoDataFrame → ((n, 2) float64 coords, index)."""
    if gpd is not None and isinstance(df, gpd.GeoDataFrame):
        return _geometry_coords(df), df.index
    if pd is not None and isinstance(df, pd.DataFrame):
        la, lo = _pick_columns(df, lat_col, lon_col)
        return df.loc[:, [la, lo]].to_numpy(dtype=np.float64), df.index
    # duck-typed frames whose library is missing get the install hint; the
    # DataFrame check comes first (a GeoDataFrame also has iloc/columns)
    if hasattr(df, "iloc") and hasattr(df, "columns"):
        raise ImportError(
            "pandas is required to use DataFrame input. "
            "Install with: pip install geodistpy[pandas]"
        )
    if hasattr(df, "geometry"):
        raise ImportError(
            "geopandas is required to use GeoDataFrame input. "
            "Install with: pip install geodistpy[geopandas]"
        )
    raise TypeError(
        "coordinates_from_df expects a pandas DataFrame or GeoPandas GeoDataFrame, "
        f"got {type(df).__name__}"
    )


def _frame_types() -> tuple:
    return tuple(
        t
        for t in (
            pd.DataFrame if pd is not None else None,
            gpd.GeoDataFrame if gpd is not None else None,
        )
        if t is not None
    )


def as_coords(points, lat_col=None, lon_col=None):
    """Array-like or DataFrame → ((n, 2) array, index-or-None).

    A bare (2,) pair is promoted to one row; anything else must already be
    (n, 2).
    """
    if isinstance(points, _frame_types()):
        return coordinates_from_df(points, lat_col=lat_col, lon_col=lon_col)
    arr = np.atleast_2d(np.asarray(points, dtype=np.float64))
    if arr.ndim != 2 or arr.shape[1] != 2:
        raise ValueError("points must have shape (n, 2) or be a DataFrame/GeoDataFrame")
    return arr, None
