"""Raster↔vector tile aggregation over grid cells.

Partial-then-final pattern: each batch pre-aggregates its rows per cell
(``np.unique`` + grouped sums — the combiner), the shuffle then moves one
row per (cell × batch) instead of one per input row, and a small
``groupby(cell).aggregate(Sum...)`` finishes. This is the reference's
missing aggregation layer re-expressed for scale (SURVEY.md §2.4).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data.aggregate import Sum

from ..cells import DEFAULT_CELL_DEG, parent_cell
from .geo import col_np


def tile_aggregate(
    ds,
    cell_col: str = "cell",
    value_cols: tuple[str, ...] = (),
    cell_deg: float = DEFAULT_CELL_DEG,
    coarsen_factor: int | None = None,
    final: str = "shuffle",
    nulls: str = "raise",
):
    """Per-cell counts (plus optional value sums) → Dataset (cell, n, sum_*).

    With ``coarsen_factor`` the aggregation happens at the parent resolution
    (hierarchical raster roll-up).

    ``nulls`` follows :func:`~.relational.grouped_sum`'s convention for NULL
    VALUES in ``value_cols`` (null cells are fine — they form the SQL NULL
    group): ``"raise"`` (default) fails loudly — a NaN weight would silently
    poison the whole cell's ``bincount`` sum where SQL SUM ignores NULLs;
    ``"zero"`` counts them as 0, i.e. ``COALESCE(SUM(x), 0)``.

    ``final="shuffle"`` (default) is Ray's sort-aggregate — fine while the
    occupied-cell count is modest (coarse grids), but it pays per-GROUP
    machinery per occupied cell; a fine grid at planetary coverage (0.1° ≈
    6.5M cells) wants ``final="partitioned"``: the same partials merged on
    64 hash partitions of the cell id with one vectorized pandas groupby
    each (see stages/grouping.py).
    """
    if nulls not in ("raise", "zero"):
        raise ValueError(f"nulls must be 'raise' or 'zero', got {nulls!r}")

    def partial(batch: pa.Table) -> pa.Table:
        cells = col_np(batch, cell_col)
        if coarsen_factor:
            cells = parent_cell(cells, cell_deg, coarsen_factor)
        uniq, inv, counts = np.unique(cells, return_inverse=True, return_counts=True)
        cols = {"cell": uniq, "part_n": counts.astype(np.int64)}
        for vc in value_cols:
            v = col_np(batch, vc).astype(np.float64)
            nan = np.isnan(v)
            if nan.any():
                if nulls == "raise":
                    raise ValueError(
                        f"tile_aggregate: column {vc!r} has {int(nan.sum())} "
                        f"null(s); pass nulls='zero' for COALESCE(SUM(x), 0) "
                        f"semantics"
                    )
                v = np.where(nan, 0.0, v)
            cols[f"part_sum_{vc}"] = np.bincount(inv, weights=v, minlength=uniq.size)
        return pa.table(cols)

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    if final == "partitioned":
        import pandas as pd

        from .grouping import partitioned_map_groups

        ren = {"part_n": "n", **{f"part_sum_{vc}": f"sum_{vc}" for vc in value_cols}}

        def merge(g: pd.DataFrame) -> pd.DataFrame:
            # dropna=False: a null-laundered cell key (NaN) is one SQL NULL
            # group — the default would silently delete those rows from the
            # partitioned final while the shuffle final keeps them
            out = g.groupby("cell", as_index=False, sort=False, dropna=False).sum()
            return out.rename(columns=ren)

        return partitioned_map_groups(partials, "cell", merge)
    aggs = [Sum("part_n", alias_name="n")]
    for vc in value_cols:
        aggs.append(Sum(f"part_sum_{vc}", alias_name=f"sum_{vc}"))
    return partials.groupby("cell").aggregate(*aggs)
