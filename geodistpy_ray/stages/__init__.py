"""Ray Data pipeline stages (each is a function Dataset -> Dataset)."""

from .geo import (  # noqa: F401
    GeocoderActor,
    add_cell,
    add_distance_to_point,
    add_geocode,
)
from .joins import (  # noqa: F401
    asof_join,
    broadcast_join,
    range_join_broadcast,
    shuffle_equi_join,
)
from .knn import knn_join  # noqa: F401
from .pip import point_in_polygon_join  # noqa: F401
from .radius import radius_join  # noqa: F401
from .tiles import tile_aggregate  # noqa: F401
