"""Deterministic synthetic geocoder — the engine's pages→(lat, lon) model.

The reference has no geocoder (its inputs are already coordinates); the
north-star pipeline geocodes Common-Crawl-style pages in a stateful stage.
Since no external geo data exists in this sandbox, geocoding is a
deterministic *arithmetic* model over the record key: records cluster around
``N_CENTERS`` synthetic "city" centers (driving realistic cell skew), with a
per-record jitter. Every formula below is pure int64/float64 arithmetic so
the DuckDB correctness oracle can recompute it **bit-identically** — the SQL
renderings in this module are kept in lockstep with the NumPy ones; tests
assert equality.

Latitudes land in [-81, 81] by construction (no clamp branch); longitudes
are wrapped with an always-positive-dividend mod so NumPy and SQL agree.
"""

from __future__ import annotations

import numpy as np

N_CENTERS = 211  # prime → doc_id % N_CENTERS cycles through all centers
_LAT_MUL = 7919
_LON_MUL = 104729
_JLAT_MUL = 2654435761
_JLON_MUL = 998244353
_JMOD = 2000001
_JDIV = 1000000.0


def center_latlon(center_id):
    """City-center coordinates for integer center ids (vectorized)."""
    c = np.asarray(center_id, dtype=np.int64)
    clat = ((c * _LAT_MUL) % 160).astype(np.float64) - 79.5
    clon = ((c * _LON_MUL) % 360).astype(np.float64) - 179.5
    return clat, clon


def geocode_ids(doc_id, center_table=None):
    """doc_id column → (lat, lon) float64 columns, bit-reproducible in SQL.

    ``center_table`` is an optional precomputed ``center_latlon(arange(
    N_CENTERS))`` pair (the GeocoderActor's per-actor state): looking the
    centers up by index yields the SAME float64 values as recomputing
    them, so the fast path stays bit-identical to the SQL mirror.
    """
    d = np.asarray(doc_id, dtype=np.int64)
    c = d % N_CENTERS
    if center_table is not None:
        clat, clon = center_table[0][c], center_table[1][c]
    else:
        clat, clon = center_latlon(c)
    # mod BEFORE multiply: (d*m) mod M == ((d mod M)*m) mod M, and the
    # reduced product stays < 2^63 for any int64 id (a straight multiply
    # silently wraps in numpy and overflows in DuckDB for ids >= ~3.5e9)
    jlat = (((d % _JMOD) * _JLAT_MUL) % _JMOD).astype(np.float64) / _JDIV - 1.0
    jlon = (((d % _JMOD) * _JLON_MUL) % _JMOD).astype(np.float64) / _JDIV - 1.0
    lat = clat + 1.5 * jlat
    lon = clon + 1.5 * jlon
    lon = ((lon + 540.0) % 360.0) - 180.0
    return lat, lon


def _nn_mod(x: str, m: int) -> str:
    """Non-negative SQL mod: numpy's % follows the divisor's sign (always
    >= 0 here) while SQL % follows the dividend's — they diverge for
    negative ids unless wrapped as ((x % m) + m) % m."""
    # CAST → BIGINT so the subsequent multiply never overflows a narrower
    # inferred type (e.g. INT32 literals)
    return f"CAST(((({x}) % {m} + {m}) % {m}) AS BIGINT)"


def geocode_sql(id_col: str = "doc_id") -> tuple[str, str]:
    """(lat_expr, lon_expr) SQL mirroring :func:`geocode_ids` bit-for-bit
    (including negative ids — see :func:`_nn_mod`)."""
    c = _nn_mod(id_col, N_CENTERS)
    clat = f"(CAST(({c} * {_LAT_MUL}) % 160 AS DOUBLE) - 79.5)"
    clon = f"(CAST(({c} * {_LON_MUL}) % 360 AS DOUBLE) - 179.5)"
    jlat = f"(CAST(({_nn_mod(id_col, _JMOD)} * {_JLAT_MUL}) % {_JMOD} AS DOUBLE) / {_JDIV} - 1.0)"
    jlon = f"(CAST(({_nn_mod(id_col, _JMOD)} * {_JLON_MUL}) % {_JMOD} AS DOUBLE) / {_JDIV} - 1.0)"
    lat = f"({clat} + 1.5 * {jlat})"
    lon = f"((({clon} + 1.5 * {jlon}) + 540.0) % 360.0 - 180.0)"
    return lat, lon


def cell_sql(lat_expr: str, lon_expr: str, cell_deg: float) -> str:
    """SQL for ``geodistpy_ray.cells.cell_id`` over the given lat/lon exprs."""
    nlat = int(round(180.0 / cell_deg))
    nlon = int(round(360.0 / cell_deg))
    lat_idx = (
        f"GREATEST(LEAST(CAST(FLOOR(({lat_expr} + 90.0) / {cell_deg}) AS BIGINT), "
        f"{nlat - 1}), 0)"
    )
    lon_idx = (
        f"GREATEST(LEAST(CAST(FLOOR(({lon_expr} + 180.0) / {cell_deg}) AS BIGINT), "
        f"{nlon - 1}), 0)"
    )
    return f"({lat_idx} * {nlon} + {lon_idx})"


def haversine_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """SQL haversine (meters, R=6371009) matching ``kernels.haversine``.

    Trig results may differ from NumPy's by ulps — consumers must round
    (typically to 1e-3 m) before comparing/hashing.
    """
    # fp ordering mirrors kernels.sphere.haversine exactly: radians each
    # operand FIRST, then subtract (CLAUDE.md oracle-gate convention)
    h = (
        f"(POW(SIN((RADIANS({lat2}) - RADIANS({lat1})) / 2), 2) + "
        f"COS(RADIANS({lat1})) * COS(RADIANS({lat2})) * "
        f"POW(SIN((RADIANS({lon2}) - RADIANS({lon1})) / 2), 2))"
    )
    return f"(2.0 * 6371009.0 * ASIN(SQRT(LEAST(GREATEST({h}, 0.0), 1.0))))"


def haversine_dimwise_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> tuple[str, str]:
    """(dlat_m², dlon_m²) SQL mirroring ``kernels.haversine_dimwise_sq``
    (the reference's ``geodist_dimwise_harvesine`` split-dimension squared
    metric, ``geodesic.py:856-919``). R=6371009."""
    R = "6371009.0"
    shd = f"SIN(ABS(RADIANS(({lat1}) - ({lat2}))) / 2.0)"
    dlat_m = f"(2.0 * {R} * ASIN(ABS({shd})))"
    inner = (
        f"((1.0 - POW({shd}, 2) - POW(SIN(RADIANS(({lat1}) + ({lat2})) / 2.0), 2)) "
        f"* POW(SIN(ABS(RADIANS(({lon1}) - ({lon2}))) / 2.0), 2))"
    )
    dlon_m = f"(2.0 * {R} * ASIN(SQRT(GREATEST({inner}, 0.0))))"
    return f"POW({dlat_m}, 2)", f"POW({dlon_m}, 2)"


def great_circle_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """SQL Andoyer-Lambert great-circle distance (meters) matching
    ``kernels.great_circle`` for non-degenerate pairs (coincident /
    pole-to-pole guard branches are omitted — callers compare rounded
    values over general-position points). WGS-84 a/f baked in."""
    a = "6378137.0"
    f = "(1.0 / 298.257223563)"
    F = f"((RADIANS({lat1}) + RADIANS({lat2})) / 2.0)"
    G = f"((RADIANS({lat1}) - RADIANS({lat2})) / 2.0)"
    L = f"(ABS(RADIANS({lon2}) - RADIANS({lon1})) / 2.0)"
    sF2, cF2 = f"POW(SIN({F}), 2)", f"POW(COS({F}), 2)"
    sG2, cG2 = f"POW(SIN({G}), 2)", f"POW(COS({G}), 2)"
    sL2, cL2 = f"POW(SIN({L}), 2)", f"POW(COS({L}), 2)"
    S = f"({sG2} * {cL2} + {cF2} * {sL2})"
    C = f"({cG2} * {cL2} + {sF2} * {sL2})"
    omega = f"ATAN2(SQRT({S}), SQRT({C}))"
    R = f"(SQRT({S} * {C}) / {omega})"
    D = f"(2.0 * {omega} * {a})"
    H1 = f"((3.0 * {R} - 1.0) / (2.0 * {C}))"
    H2 = f"((3.0 * {R} + 1.0) / (2.0 * {S}))"
    return f"({D} * (1.0 + {f} * ({H1} * {sF2} * {cG2} - {H2} * {cF2} * {sG2})))"


# ── Fixed query points for the kNN / radius correctness pipelines ─────────
N_QUERIES = 24
_QLAT_MUL = 6151
_QLON_MUL = 3571


def query_points(n: int = N_QUERIES):
    """Deterministic query set: half near city centers, half elsewhere."""
    q = np.arange(n, dtype=np.int64)
    near = q % 2 == 0
    clat, clon = center_latlon((q * 13) % N_CENTERS)
    alat = ((q * _QLAT_MUL) % 140).astype(np.float64) - 69.5
    alon = ((q * _QLON_MUL) % 360).astype(np.float64) - 179.5
    lat = np.where(near, clat + 0.25, alat)
    lon = np.where(near, clon - 0.25, alon)
    return q, lat, lon


def query_points_sql(n: int = N_QUERIES) -> str:
    """SQL relation (query_id, qlat, qlon) mirroring :func:`query_points`."""
    c = f"((q * 13) % {N_CENTERS})"
    clat = f"(CAST(({c} * {_LAT_MUL}) % 160 AS DOUBLE) - 79.5)"
    clon = f"(CAST(({c} * {_LON_MUL}) % 360 AS DOUBLE) - 179.5)"
    alat = f"(CAST((q * {_QLAT_MUL}) % 140 AS DOUBLE) - 69.5)"
    alon = f"(CAST((q * {_QLON_MUL}) % 360 AS DOUBLE) - 179.5)"
    return (
        f"(SELECT q AS query_id, "
        f"CASE WHEN q % 2 = 0 THEN {clat} + 0.25 ELSE {alat} END AS qlat, "
        f"CASE WHEN q % 2 = 0 THEN {clon} - 0.25 ELSE {alon} END AS qlon "
        f"FROM (SELECT CAST(UNNEST(RANGE({n})) AS BIGINT) AS q))"
    )
