"""Flagship pipeline: the north-star shape end to end.

documents/pages → geocode (actor pool) → cell assign → point-in-polygon
spatial join (broadcast cell-bucketed polygons) → per-cell tile roll-up of
match counts. Every stage streams; the only materialization is the final
small per-cell aggregate.
"""

from __future__ import annotations

import pyarrow as pa

from ray.data.aggregate import Count

from ..sources.polygons import diamond_polygons
from ..stages.geo import GeocoderActor
from ..stages.pip import point_in_polygon_join


def flagship_pipeline(sf_dir: str, cell_deg: float = 2.0):
    """Returns a Dataset (cell, n_matches) of spatial-join matches per cell."""
    from ..sources.io import read_parquet_sized

    docs = read_parquet_sized(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return flagship_transform(docs, cell_deg=cell_deg)


def flagship_transform(docs, cell_deg: float = 2.0):
    """The flagship as a ``Dataset -> Dataset`` transform (geocode → PIP
    join → per-cell match counts), so a checkpointing runner
    (``state/lineage.py``) can apply it per input fragment; per-fragment
    counts are partial aggregates that a final per-cell SUM rolls up."""
    docs = docs.map_batches(
        GeocoderActor,
        fn_constructor_kwargs={"id_col": "doc_id"},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 2),
        batch_size=8192,
    )
    matches = point_in_polygon_join(docs, diamond_polygons(), id_col="doc_id", cell_deg=cell_deg)

    # join matches back to coordinates for the tile roll-up: re-derive lat/lon
    # from doc_id arithmetically (cheaper than a shuffle join at this scale)
    from ..cells import cell_id as _cell_id
    from ..functions.geocode import geocode_ids

    def with_cell(batch: pa.Table) -> pa.Table:
        from ..stages.geo import col_np

        ids = col_np(batch, "doc_id")
        lat, lon = geocode_ids(ids)
        return batch.append_column("cell", pa.array(_cell_id(lat, lon, cell_deg), pa.int64()))

    matches = matches.map_batches(with_cell, batch_format="pyarrow", zero_copy_batch=True)
    return matches.groupby("cell").aggregate(Count(alias_name="n_matches"))
