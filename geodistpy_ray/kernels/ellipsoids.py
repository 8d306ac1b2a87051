"""Ellipsoid models and unit conversions.

Semantics mirror the reference engine (``/root/reference/geodistpy/geodesic.py:36-81``
for the ellipsoid registry and ``distance.py:60-83`` for unit factors); the
implementation here is independent and columnar-first.
"""

from __future__ import annotations

WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563

#: Named ellipsoid models as (semi-major axis [m], flattening).
ELLIPSOIDS: dict[str, tuple[float, float]] = {
    "WGS-84": (6378137.0, 1.0 / 298.257223563),
    "GRS-80": (6378137.0, 1.0 / 298.257222101),
    "Airy (1830)": (6377563.396, 1.0 / 299.3249646),
    "Intl 1924": (6378388.0, 1.0 / 297.0),
    "Clarke (1880)": (6378249.145, 1.0 / 293.465),
    "GRS-67": (6378160.0, 1.0 / 298.25),
}

#: Multiplicative factors converting meters to the target unit.
UNIT_FACTORS: dict[str, float] = {
    "meter": 1.0,
    "km": 1e-3,
    "mile": 1.0 / 1609.344,
    "nmi": 1.0 / 1852.0,
}

#: Mean Earth radius used by the haversine kernel (meters), as in the
#: reference's dimwise haversine (``geodesic.py:898``).
EARTH_RADIUS_M = 6371009.0


def unit_factor(metric: str) -> float:
    """Meters → *metric* conversion factor; raises on unknown units."""
    try:
        return UNIT_FACTORS[metric]
    except KeyError:
        raise ValueError(f"Metric {metric} not supported") from None


def resolve_ellipsoid(ellipsoid) -> tuple[float, float]:
    """Resolve a name or ``(a, f)`` pair to validated floats.

    Accepts ``None`` / ``'WGS-84'`` / any key of :data:`ELLIPSOIDS` / a
    two-element sequence. Validation contract matches the reference
    (``geodesic.py:50-81``): ``a > 0`` and ``0 < f < 1``.
    """
    if ellipsoid is None or ellipsoid == "WGS-84":
        return (WGS84_A, WGS84_F)
    if isinstance(ellipsoid, str):
        try:
            return ELLIPSOIDS[ellipsoid]
        except KeyError as err:
            raise ValueError(
                f"Unknown ellipsoid '{ellipsoid}'. "
                f"Available: {list(ELLIPSOIDS.keys())}"
            ) from err
    a, f = float(ellipsoid[0]), float(ellipsoid[1])
    if a <= 0:
        raise ValueError(f"Semi-major axis a must be positive, got {a}")
    if not (0 < f < 1):
        raise ValueError(f"Flattening f must be in (0, 1), got {f}")
    return (a, f)
