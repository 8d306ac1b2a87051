"""geodistpy_ray — a Ray-Data-native geodesic spatial + data-processing engine.

Brand-new engine (not a port) with the query surface of the reference
``pawangeek/geodistpy`` re-expressed Ray-Data-first:

- ``kernels/`` — pure vectorized NumPy geodesic math (Vincenty, Karney,
  Andoyer-Lambert, haversine); no Ray imports.
- ``cells`` — grid-cell spatial index (the shuffle key).
- ``api`` — reference-parity array/DataFrame API (``geodist``,
  ``geodist_matrix``, ``geodesic_knn``, ...).
- ``stages/`` — Dataset → Dataset pipeline stages (geocode, cell assign,
  kNN / radius / point-in-polygon joins, tile aggregation, close pairs,
  dedup, text analysis, ANN, media).
- ``sources/`` — pages-table synthesis and readers; polygon sets.
- ``state/`` — per-partition lineage and resumable execution.
- ``pipelines/`` — composed end-to-end pipelines.

Never calls ``ray.init``/``ray.shutdown`` — session ownership belongs to the
caller (driver contract).
"""

from .api import (  # noqa: F401
    bearing,
    destination,
    geodesic_knn,
    geodist,
    geodist_dimwise,
    geodist_dimwise_haversine,
    karney,
    geodist_matrix,
    geodist_to_many,
    greatcircle,
    greatcircle_matrix,
    interpolate,
    midpoint,
    point_in_radius,
)
from .frames import coordinates_from_df  # noqa: F401
from .kernels import ELLIPSOIDS, WGS84_A, WGS84_F  # noqa: F401

__version__ = "0.1.0"
