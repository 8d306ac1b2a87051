"""Synthetic polygon sets for the point-in-polygon spatial join (fixture F4).

Two families:

- :func:`diamond_polygons` — axis-aligned diamonds around the synthetic city
  centers, generated with *pure integer/float arithmetic* so the DuckDB
  oracle regenerates them bit-identically (:func:`diamond_polygons_sql`).
  These are the correctness-gated join's right side.
- :func:`test_polygons` — irregular rings (star shapes, an
  antimeridian-crossing box, near-polar rings (true pole caps use stages.pip.polar_cap_join)) used by the pytest-only
  ray-casting conformance tests against a brute-force NumPy oracle.

Schema: ``poly_id:int64, ring_lats:list<f64>, ring_lons:list<f64>,
min_lat/max_lat/min_lon/max_lon:f64`` (prune box).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.geocode import N_CENTERS, center_latlon

N_POLYS = 40


def _diamond_params(n: int = N_POLYS):
    p = np.arange(n, dtype=np.int64)
    clat, clon = center_latlon((p * 17) % N_CENTERS)
    half_lat = 1.0 + (p % 7).astype(np.float64) * 0.5
    half_lon = 1.0 + (p % 5).astype(np.float64) * 0.75
    # Keep the SQL-checked set away from the antimeridian and the poles so
    # the planar half-plane formula is valid (hard cases live in
    # test_polygons and are exercised in pytest instead).
    keep = (np.abs(clon) < 175.0) & (np.abs(clat) < 84.0)
    return p[keep], clat[keep], clon[keep], half_lat[keep], half_lon[keep]


def diamond_polygons(n: int = N_POLYS) -> pa.Table:
    """Diamond (4-vertex) polygon table around city centers."""
    pid, clat, clon, hlat, hlon = _diamond_params(n)
    ring_lats, ring_lons = [], []
    for i in range(pid.size):
        ring_lats.append(
            [clat[i] + hlat[i], clat[i], clat[i] - hlat[i], clat[i], clat[i] + hlat[i]]
        )
        ring_lons.append(
            [clon[i], clon[i] + hlon[i], clon[i], clon[i] - hlon[i], clon[i]]
        )
    return pa.table(
        {
            "poly_id": pa.array(pid, pa.int64()),
            "ring_lats": pa.array(ring_lats, pa.list_(pa.float64())),
            "ring_lons": pa.array(ring_lons, pa.list_(pa.float64())),
            "min_lat": pa.array(clat - hlat, pa.float64()),
            "max_lat": pa.array(clat + hlat, pa.float64()),
            "min_lon": pa.array(clon - hlon, pa.float64()),
            "max_lon": pa.array(clon + hlon, pa.float64()),
        }
    )


def diamond_polygons_sql(n: int = N_POLYS) -> str:
    """SQL relation (poly_id, clat, clon, half_lat, half_lon) ≡ the NumPy gen."""
    from ..functions.geocode import _LAT_MUL, _LON_MUL  # noqa: PLC0415

    c = f"((p * 17) % {N_CENTERS})"
    clat = f"(CAST(({c} * {_LAT_MUL}) % 160 AS DOUBLE) - 79.5)"
    clon = f"(CAST(({c} * {_LON_MUL}) % 360 AS DOUBLE) - 179.5)"
    return (
        f"(SELECT p AS poly_id, {clat} AS clat, {clon} AS clon, "
        f"1.0 + CAST(p % 7 AS DOUBLE) * 0.5 AS half_lat, "
        f"1.0 + CAST(p % 5 AS DOUBLE) * 0.75 AS half_lon "
        f"FROM (SELECT CAST(UNNEST(RANGE({n})) AS BIGINT) AS p) "
        f"WHERE ABS({clon}) < 175.0 AND ABS({clat}) < 84.0)"
    )


def test_polygons() -> pa.Table:
    """Irregular rings incl. the documented hard cases (pytest-only)."""
    rng = np.random.default_rng(42)
    polys = []

    # star-ish rings around a few centers, incl. the documented NEAR-POLAR
    # cases (|lat| up to ~88°, where the lon/cos(lat) stretch is extreme;
    # rings still don't ENCLOSE a pole — true pole caps use
    # stages.pip.polar_cap_join)
    for i, (clat, clon, rad) in enumerate(
        [
            (40.0, -100.0, 8.0),
            (-20.0, 30.0, 6.0),
            (55.0, 10.0, 4.0),
            (86.0, 45.0, 1.5),
            (-85.5, -120.0, 2.0),
        ]
    ):
        k = 16
        ang = np.linspace(0.0, 2 * np.pi, k, endpoint=False)
        r = rad * (0.6 + 0.4 * rng.random(k))
        lats = clat + r * np.sin(ang)
        lons = clon + r * np.cos(ang) / np.cos(np.radians(clat))
        polys.append((i, np.append(lats, lats[0]), np.append(lons, lons[0])))

    # antimeridian-crossing box (lons expressed continuing past 180)
    lats = np.array([-10.0, 10.0, 10.0, -10.0, -10.0])
    lons = np.array([170.0, 170.0, 190.0, 190.0, 170.0])
    polys.append((100, lats, lons))

    rows = {
        "poly_id": [],
        "ring_lats": [],
        "ring_lons": [],
        "min_lat": [],
        "max_lat": [],
        "min_lon": [],
        "max_lon": [],
    }
    for pid, lats, lons in polys:
        rows["poly_id"].append(pid)
        rows["ring_lats"].append(list(lats))
        rows["ring_lons"].append(list(lons))
        rows["min_lat"].append(float(np.min(lats)))
        rows["max_lat"].append(float(np.max(lats)))
        rows["min_lon"].append(float(np.min(lons)))
        rows["max_lon"].append(float(np.max(lons)))
    return pa.table(
        {
            "poly_id": pa.array(rows["poly_id"], pa.int64()),
            "ring_lats": pa.array(rows["ring_lats"], pa.list_(pa.float64())),
            "ring_lons": pa.array(rows["ring_lons"], pa.list_(pa.float64())),
            "min_lat": pa.array(rows["min_lat"], pa.float64()),
            "max_lat": pa.array(rows["max_lat"], pa.float64()),
            "min_lon": pa.array(rows["min_lon"], pa.float64()),
            "max_lon": pa.array(rows["max_lon"], pa.float64()),
        }
    )
