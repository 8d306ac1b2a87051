"""Sources & sinks: pages-table synthesis/reading, polygon sets."""

from .pages import generate_pages, read_pages, write_pages  # noqa: F401
from .polygons import diamond_polygons, diamond_polygons_sql, test_polygons  # noqa: F401
