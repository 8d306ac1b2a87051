"""Driver contract for the geodistpy_ray engine.

``entry()`` runs the flagship pipeline on sf0.001. ``queries()`` exposes one
callable per implemented operator/pipeline (SURVEY.md §2 + the
training-data extensions); ``oracle_sql()`` gives the DuckDB-equivalent SQL
for every SQL-expressible query — column names match exactly, float outputs
are either bit-reproducible arithmetic (geocode/cell/ppm ratios/integer
cents) or rounded trig (documented per query).

Never calls ray.init/shutdown (driver owns the session).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa

CELL_DEG = 2.0
ORIGIN = (52.52, 13.405)  # Berlin, the reference's canonical test point
RADIUS_M = 750_000.0
PAIR_DIST_M = 150_000.0
KNN_K = 5
ANN_K = 10
NEAR_DUP_T = 0.40
STAY_EPS_M = 600_000.0  # stay-point leg radius (jitter is ±~350 km per axis)
STAY_MIN_DUR_US = 6 * 3600 * 1_000_000  # stays must span >= 6 h


def _round_col(ds, col, digits, out=None, div=1.0):
    """round(col / div, digits) — division (not reciprocal multiply) so the
    float path is bit-identical to the oracle's ``ROUND(x / div, n)``."""
    out = out or col

    def fn(batch: pa.Table) -> pa.Table:
        import numpy as _np

        v = _np.round(batch.column(col).to_numpy(zero_copy_only=False) / div, digits)
        i = batch.schema.get_field_index(col)
        return batch.set_column(i, out, pa.array(v, pa.float64()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# ── entry ────────────────────────────────────────────────────────────────


def _read(path, columns=None):
    """All driver-contract reads go through the size-aware reader: blocks
    carry >= ~40k rows so small-sf inputs stop splitting into micro-blocks
    (per-block fixed costs dominated the small-table aggregates); big inputs
    fall through to Ray's own sizing — see sources/io.py:read_parquet_sized."""
    from geodistpy_ray.sources.io import read_parquet_sized

    return read_parquet_sized(path, columns=columns)


def entry() -> Any:
    """Flagship pipeline THROUGH the sink contract: each input fragment runs
    geocode → PIP join → per-cell counts and checkpoints to a manifested
    parquet partition (``state/lineage.py``); a second runner pass proves
    resume is a byte-identical no-op; the returned Dataset is the per-cell
    roll-up over the written partitions (fragment counts are partial
    aggregates, so the final SUM is exact), MATERIALIZED so the scratch
    sink can be removed before returning."""
    import glob
    import hashlib
    import tempfile

    import ray.data as rd
    from ray.data.aggregate import Sum

    from geodistpy_ray.pipelines import flagship_transform
    from geodistpy_ray.state.lineage import FragmentRunner

    frag_glob = "/root/testdata/sf0.001/documents.parquet"
    out_dir = tempfile.mkdtemp(prefix="geodist_flagship_")
    runner = FragmentRunner(
        lambda ds: flagship_transform(ds, cell_deg=CELL_DEG),
        out_dir,
        read_columns=["doc_id"],
    )
    runner.run(frag_glob)

    def _sig() -> dict[str, str]:
        return {
            p: hashlib.blake2b(open(p, "rb").read(), digest_size=16).hexdigest()
            for p in sorted(glob.glob(f"{out_dir}/fragment=*/*.parquet"))
        }

    sig1 = _sig()
    second = runner.run(frag_glob)
    if second["ran_now"] != 0 or _sig() != sig1:
        raise RuntimeError(
            "lineage resume must be a byte-identical no-op "
            f"(reran {second['ran_now']} fragments)"
        )
    parts = rd.read_parquet(sorted(glob.glob(f"{out_dir}/fragment=*")))
    rollup = parts.groupby("cell").aggregate(Sum("n_matches", alias_name="n_matches"))
    # the roll-up is tiny (one row per cell) — materialize it (blocks pinned
    # in the object store, exact Arrow schema preserved) so the scratch sink
    # can be removed NOW; returning a lazy reader over out_dir would leak
    # one table-sized /tmp directory per invocation
    out = rollup.materialize()
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    return out


# ── query implementations ────────────────────────────────────────────────


def _docs_geo(sf_dir, columns=("doc_id",)):

    from geodistpy_ray.stages import add_geocode

    return add_geocode(_read(f"{sf_dir}/documents.parquet", columns=list(columns)))


def q_geocode_cells(sf_dir):
    from geodistpy_ray.stages import add_cell

    return add_cell(_docs_geo(sf_dir), CELL_DEG)


def q_cell_counts(sf_dir):
    from geodistpy_ray.stages import add_cell
    from geodistpy_ray.stages.relational import grouped_sum

    ds = add_cell(_docs_geo(sf_dir, ("doc_id", "n_chars")), CELL_DEG)
    return grouped_sum(ds, ["cell"], int_sum_cols={"n_chars": "sum_chars"}, count_col="n_docs")


def q_tile_coarse(sf_dir):
    from geodistpy_ray.cells import parent_cell
    from geodistpy_ray.stages import add_cell
    from geodistpy_ray.stages.relational import grouped_sum

    ds = add_cell(_docs_geo(sf_dir), 1.0)

    def coarsen(batch: pa.Table) -> pa.Table:
        c4 = parent_cell(batch.column("cell").to_numpy(), 1.0, 4)
        return batch.append_column("cell4", pa.array(c4, pa.int64()))

    ds = ds.map_batches(coarsen, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_sum(ds, ["cell4"], count_col="n_docs")


def q_zorder_keys(sf_dir):
    """Z-order (Morton) spatial keys: the locality-preserving
    linearization for range partitioning / file clustering — bit-for-bit
    SQL-mirrored integer arithmetic (no bit operators needed)."""
    from geodistpy_ray.cells import zorder_key

    def fn(batch: pa.Table) -> pa.Table:
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "zkey": pa.array(zorder_key(lat, lon), pa.int64()),
            }
        )

    return _docs_geo(sf_dir).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


def q_cell_focal(sf_dir):
    """Focal (3×3 neighborhood) raster statistics: per occupied cell, the
    doc count summed over itself + its 8 grid neighbors (lon wraps, lat
    edge rows drop out-of-grid neighbors) — the raster-convolution /
    kernel-smoothing op, expressed as a neighbor EXPLODE over the per-cell
    partials and one more bounded rollup, then an inner join back to the
    occupied set."""
    import pyarrow.compute as pc

    from geodistpy_ray.cells import neighbor_cells
    from geodistpy_ray.stages import add_cell
    from geodistpy_ray.stages.joins import shuffle_equi_join
    from geodistpy_ray.stages.relational import grouped_sum

    ds = add_cell(_docs_geo(sf_dir), CELL_DEG).select_columns(["cell"])
    counts = grouped_sum(ds, ["cell"], count_col="n", final="partitioned")

    def spread(batch: pa.Table) -> pa.Table:
        c = batch.column("cell").to_numpy(zero_copy_only=False)
        n = batch.column("n").to_numpy(zero_copy_only=False)
        src, nbr = neighbor_cells(c, CELL_DEG, ring=1)
        return pa.table(
            {"cell": pa.array(nbr, pa.int64()), "n": pa.array(n[src], pa.int64())}
        )

    nb = counts.map_batches(spread, batch_format="pyarrow", zero_copy_batch=True)
    focal = grouped_sum(
        nb, ["cell"], int_sum_cols={"n": "focal_n"}, count_col="n_nbrs", final="partitioned"
    )

    def prune(batch: pa.Table) -> pa.Table:
        return batch.select(["cell", "focal_n"])

    focal = focal.map_batches(prune, batch_format="pyarrow", zero_copy_batch=True)
    return shuffle_equi_join(focal, counts, "cell", n_buckets=16)


def q_cell_lang_entropy(sf_dir):
    """Spatial diversity map: Shannon entropy of the language mix per
    occupied cell (0 = monolingual cell) — the (cell × lang) rollup is the
    distributed pass; the ≤5-term entropy fold runs on the driver's
    bounded result."""
    from geodistpy_ray.stages import add_cell
    from geodistpy_ray.stages.relational import grouped_sum

    ds = add_cell(_docs_geo(sf_dir, ("doc_id", "lang")), CELL_DEG)
    counts = grouped_sum(ds, ["cell", "lang"], count_col="c")
    tot = counts.groupby("cell")["c"].transform("sum")
    p = counts["c"] / tot
    counts["t"] = -(p * np.log(p))
    out = counts.groupby("cell", as_index=False).agg(
        n_docs=("c", "sum"), lang_entropy=("t", "sum")
    )
    out["n_docs"] = out["n_docs"].astype(np.int64)
    out["lang_entropy"] = out["lang_entropy"].round(6)
    return out


def q_tile_pyramid(sf_dir):
    """Tile pyramid: per-cell counts at three resolutions (1°, 2°, 4° via
    integer coarsening) in ONE output keyed by (level, cell) — the
    multi-zoom raster a tile server precomputes. The finest level is the
    only corpus pass; coarser levels re-aggregate its partials."""
    import pandas as pd

    from geodistpy_ray.cells import parent_cell
    from geodistpy_ray.stages import add_cell
    from geodistpy_ray.stages.relational import grouped_sum

    ds = add_cell(_docs_geo(sf_dir), 1.0)
    fine = grouped_sum(ds, ["cell"], count_col="n_docs")  # bounded driver DF
    levels = [fine.assign(level=np.int64(1))]
    for lvl, factor in ((2, 2), (4, 4)):
        up = fine.copy()
        up["cell"] = parent_cell(up["cell"].to_numpy(), 1.0, factor)
        up = up.groupby("cell", as_index=False)["n_docs"].sum()
        up["level"] = np.int64(lvl)
        levels.append(up)
    out = pd.concat(levels, ignore_index=True)
    out["n_docs"] = out["n_docs"].astype(np.int64)
    return out[["level", "cell", "n_docs"]]


def q_cell_areas(sf_dir):
    """Occupied-cell raster with true spherical areas: geocode → cell →
    count per cell → exact spherical-rectangle area per cell (km², the
    raster-side geometry a tile layer needs for density normalization)."""
    from geodistpy_ray.cells import cell_area_km2
    from geodistpy_ray.stages import add_cell
    from geodistpy_ray.stages.relational import grouped_sum

    ds = add_cell(_docs_geo(sf_dir), CELL_DEG)
    counts = grouped_sum(ds, ["cell"], count_col="n_docs")  # bounded-domain driver merge
    counts["area_km2"] = np.round(
        cell_area_km2(counts["cell"].to_numpy(), CELL_DEG), 3
    )
    return counts


def q_cell_polygons(sf_dir):
    """Raster→vector export: the occupied-cell raster back to vector rings —
    distinct occupied cells exploded to closed ring vertex rows
    (cell, j, vlat, vlon), the hand-off from tile aggregates to any
    polygon consumer (PIP join, area, rendering). Exact half-degree
    arithmetic, so the oracle needs no rounding."""
    from geodistpy_ray.cells import cell_bounds
    from geodistpy_ray.stages import add_cell
    from geodistpy_ray.stages.relational import distinct

    ds = add_cell(_docs_geo(sf_dir), CELL_DEG).select_columns(["cell"])
    cells = distinct(ds, ["cell"])

    def explode(batch: pa.Table) -> pa.Table:
        c = batch.column("cell").to_numpy(zero_copy_only=False)
        lo_lat, hi_lat, lo_lon, hi_lon = cell_bounds(c, CELL_DEG)
        n = c.size
        j = np.tile(np.arange(5, dtype=np.int64), n)
        vlat = np.stack([lo_lat, lo_lat, hi_lat, hi_lat, lo_lat], 1).ravel()
        vlon = np.stack([lo_lon, hi_lon, hi_lon, lo_lon, lo_lon], 1).ravel()
        return pa.table(
            {
                "cell": pa.array(np.repeat(c, 5), pa.int64()),
                "j": pa.array(j, pa.int64()),
                "vlat": pa.array(vlat, pa.float64()),
                "vlon": pa.array(vlon, pa.float64()),
            }
        )

    return cells.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)


def q_polygon_areas(sf_dir):
    """Vector-side polygon geometry: spherical ring area of every
    SQL-checked join polygon (Chamberlain–Duquette line integral over the
    Arrow list columns — `stages/pip.py:add_ring_area`). The oracle
    regenerates the diamond vertices arithmetically and folds the SAME
    term formula through a LEAD window."""
    import ray.data as rd

    from geodistpy_ray.sources.polygons import diamond_polygons
    from geodistpy_ray.stages.pip import add_ring_area

    polys = rd.from_arrow(diamond_polygons())
    out = add_ring_area(polys)
    return out.select_columns(["poly_id", "area_km2"])


def q_sphere_destinations(sf_dir):
    """Spherical direct problem over the corpus: per-doc destination at a
    deterministic bearing (doc_id%360) and range (100–590 km) — the
    SQL-mirrorable twin of the Vincenty-direct `destinations` query, so
    the destination FAMILY gets a value-hash check too."""
    from geodistpy_ray.kernels.sphere import destination_sphere
    from geodistpy_ray.stages.geo import col_np

    def fn(batch: pa.Table) -> pa.Table:
        ids = col_np(batch, "doc_id")
        brg = (ids % 360).astype(np.float64)
        dist = 100000.0 + (ids % 50).astype(np.float64) * 10000.0
        la, lo = destination_sphere(col_np(batch, "lat"), col_np(batch, "lon"), brg, dist)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "dest_lat": pa.array(np.round(la, 6), pa.float64()),
                "dest_lon": pa.array(np.round(lo, 6), pa.float64()),
            }
        )

    return _docs_geo(sf_dir).map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def q_midpoints_origin(sf_dir):
    """Spherical great-circle midpoint between every doc and the origin —
    the SQL-mirrorable member of the midpoint family (P7)."""
    from geodistpy_ray.kernels.sphere import midpoint_sphere
    from geodistpy_ray.stages.geo import col_np

    def fn(batch: pa.Table) -> pa.Table:
        la, lo = midpoint_sphere(
            col_np(batch, "lat"), col_np(batch, "lon"), ORIGIN[0], ORIGIN[1]
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "mid_lat": pa.array(np.round(la, 6), pa.float64()),
                "mid_lon": pa.array(np.round(lo, 6), pa.float64()),
            }
        )

    return _docs_geo(sf_dir).map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def q_bbox_scan(sf_dir):
    """Z-order clustered layout + statistics-pruned bbox scan: export the
    geocoded corpus spatially clustered (Morton-key range partitioning),
    then answer a bounding-box query reading ONLY the files whose parquet
    footer statistics intersect the box. The oracle checks the exact bbox
    semantics; the pruning ratio is pinned in tests/test_sort.py."""
    import shutil
    import tempfile

    from geodistpy_ray.stages.sort import bbox_scan, zorder_export

    out = tempfile.mkdtemp(prefix="geodist_zorder_")
    try:
        zorder_export(_docs_geo(sf_dir), out, n_parts=16)
        ds, _read_n, _tot = bbox_scan(out, 20.0, 60.0, -40.0, 40.0)
        return ds.select_columns(["doc_id"]).to_pandas()
    finally:
        shutil.rmtree(out, ignore_errors=True)


def q_reverse_geocode(sf_dir):
    """Reverse geocode: nearest synthetic city center per doc (broadcast
    211-center argmin per batch — the nearest_centroid shape on geodesic
    distance). Ties break to the smaller center id on both sides."""
    from geodistpy_ray.functions.geocode import N_CENTERS, center_latlon
    from geodistpy_ray.kernels import haversine
    from geodistpy_ray.stages.geo import col_np

    cid = np.arange(N_CENTERS, dtype=np.int64)
    clat, clon = center_latlon(cid)

    def fn(batch: pa.Table) -> pa.Table:
        lat = col_np(batch, "lat")
        lon = col_np(batch, "lon")
        d = haversine(lat[:, None], lon[:, None], clat[None, :], clon[None, :])
        # rank on the ROUND-6 km value (the repo's tie convention): argmin
        # over raw meters could disagree with the oracle's ORDER BY on a
        # numpy-vs-DuckDB trig ulp near-tie; at 1e-6 km both sides see the
        # same key (trig values never land exactly on the boundary)
        dkm = np.round(d / 1000.0, 6)
        best = np.argmin(dkm, axis=1)  # first min → smallest center id
        dk = dkm[np.arange(lat.size), best]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "center_id": pa.array(cid[best], pa.int64()),
                "center_km": pa.array(dk, pa.float64()),
            }
        )

    return _docs_geo(sf_dir).map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def q_idw_estimate(sf_dir):
    """Inverse-distance-weighted spatial interpolation: estimate n_chars
    at 8 query points from all docs within 750 km — Σ(v/d²)/Σ(1/d²) over
    the radius join's neighbor set (the geostatistics estimator). The
    neighbor set is corpus-scale (every doc within radius), so the weighted
    sums combine PER BATCH inside map_batches; only the (8 query_ids ×
    n_blocks) partial rows reach the driver. The 1e-6 rounding absorbs
    cross-engine/cross-order float-sum noise (the oracle compare was
    already order-insensitive: pandas, DuckDB and the partials each sum in
    a different order)."""
    import pandas as pd

    from geodistpy_ray.functions.geocode import query_points
    from geodistpy_ray.stages import radius_join
    from geodistpy_ray.stages.joins import broadcast_join

    qid, qlat, qlon = query_points(8)
    neighbors = radius_join(
        _docs_geo(sf_dir), qid, qlat, qlon, RADIUS_M, kernel="haversine"
    )

    def to_pairs(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["query_id", "doc_id", "dist"])

    neighbors = neighbors.map_batches(to_pairs, batch_format="pyarrow", zero_copy_batch=True)
    import pyarrow.parquet as pq

    j = broadcast_join(
        neighbors, pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]),
        "doc_id",
    )
    def partial(batch: pa.Table) -> pa.Table:
        d = batch.column("dist").to_numpy(zero_copy_only=False)
        q = batch.column("query_id").to_numpy(zero_copy_only=False)
        v = batch.column("n_chars").to_numpy(zero_copy_only=False).astype(np.float64)
        m = d > 0  # the d=0 singularity (both sides drop it)
        q, d, v = q[m], d[m], v[m]
        uq, inv = np.unique(q, return_inverse=True)
        w = 1.0 / (d * d)
        wv = np.zeros(uq.size)
        np.add.at(wv, inv, w * v)
        ws = np.zeros(uq.size)
        np.add.at(ws, inv, w)
        return pa.table(
            {
                "query_id": pa.array(uq.astype(np.int64), pa.int64()),
                "_wv": pa.array(wv, pa.float64()),
                "_w": pa.array(ws, pa.float64()),
                "n": pa.array(np.bincount(inv).astype(np.int64), pa.int64()),
            }
        )

    partials = j.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    df = partials.to_pandas()  # bounded: ≤ |queries| × n_blocks rows
    agg = df.groupby("query_id", as_index=False).agg(
        _wv=("_wv", "sum"), _w=("_w", "sum"), n_neighbors=("n", "sum")
    )
    agg["idw_chars"] = (agg["_wv"] / agg["_w"]).round(6)
    agg["n_neighbors"] = agg["n_neighbors"].astype(np.int64)
    return agg[["query_id", "idw_chars", "n_neighbors"]]


ROUTE = ((40.0, -5.0), (48.0, 10.0), (52.0, 20.0), (55.0, 35.0))
CORRIDOR_M = 800_000.0


def q_corridor_docs(sf_dir):
    """Corridor join: docs within 800 km of a 3-segment great-circle route
    (kernels/simplify.py:gc_segment_distance — along-track decomposition
    with endpoint clamping), min over segments. The route-search /
    near-a-path query class."""
    from geodistpy_ray.kernels.simplify import gc_segment_distance
    from geodistpy_ray.stages.geo import col_np

    def fn(batch: pa.Table) -> pa.Table:
        lat = col_np(batch, "lat")
        lon = col_np(batch, "lon")
        d = None
        for (a1, o1), (a2, o2) in zip(ROUTE[:-1], ROUTE[1:]):
            seg = gc_segment_distance(lat, lon, a1, o1, a2, o2)
            d = seg if d is None else np.minimum(d, seg)
        keep = d <= CORRIDOR_M
        return pa.table(
            {
                "doc_id": batch.column("doc_id").filter(pa.array(keep)),
                "corridor_km": pa.array(np.round(d[keep] / 1000.0, 6), pa.float64()),
            }
        )

    return _docs_geo(sf_dir).map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def _corridor_sql(lat: str, lon: str) -> str:
    """Per-segment along-track CASE mirror of gc_segment_distance; the
    segment constants (forward bearing b12 in radians, length d12) are
    embedded as exact repr literals of the engine's own float64 values,
    so both sides branch on bit-identical comparisons."""
    from geodistpy_ray.functions.geocode import haversine_sql
    from geodistpy_ray.kernels.sphere import haversine, initial_bearing_sphere

    R = "6371009.0"
    segs = []
    for (a1, o1), (a2, o2) in zip(ROUTE[:-1], ROUTE[1:]):
        b12 = float(np.radians(initial_bearing_sphere(a1, o1, a2, o2)))
        d12 = float(haversine(a1, o1, a2, o2))
        d13 = haversine_sql(str(a1), str(o1), lat, lon)
        d2p = haversine_sql(str(a2), str(o2), lat, lon)
        y13 = f"(SIN(RADIANS({lon}) - RADIANS({o1})) * COS(RADIANS({lat})))"
        x13 = (
            f"(COS(RADIANS({a1})) * SIN(RADIANS({lat})) - "
            f"SIN(RADIANS({a1})) * COS(RADIANS({lat})) * "
            f"COS(RADIANS({lon}) - RADIANS({o1})))"
        )
        raw = f"DEGREES(ATAN2({y13}, {x13}))"
        b13 = f"RADIANS({raw} - FLOOR({raw} / 360.0) * 360.0)"
        dxt = f"(ASIN(SIN({d13} / {R}) * SIN({b13} - {b12!r})) * {R})"
        cosr = f"(COS({d13} / {R}) / COS({dxt} / {R}))"
        dat = f"(ACOS(LEAST(GREATEST({cosr}, -1.0), 1.0)) * {R})"
        segs.append(
            # the trailing LEAST is the kernel's far-field endpoint clamp
            f"LEAST((CASE WHEN COS({b13} - {b12!r}) < 0.0 THEN {d13} "
            f"WHEN {dat} > {d12!r} THEN {d2p} ELSE ABS({dxt}) END), "
            f"LEAST({d13}, {d2p}))"
        )
    mind = f"LEAST({', '.join(segs)})"
    return (
        f"SELECT doc_id, ROUND({mind} / 1000.0, 6) AS corridor_km "
        f"FROM documents WHERE {mind} <= {CORRIDOR_M}"
    )


def q_rhumb_to_origin(sf_dir):
    """Rhumb-line (constant-bearing loxodrome) distance and course from
    every doc to the origin — the navigation twin of `dist_to_origin` /
    `bearing_origin`, mirrored term-for-term in SQL (Mercator-stretched
    Δψ, E-W stretch q, atan2 course)."""
    from geodistpy_ray.kernels.sphere import rhumb_inverse
    from geodistpy_ray.stages.geo import col_np

    def fn(batch: pa.Table) -> pa.Table:
        d, b = rhumb_inverse(
            col_np(batch, "lat"), col_np(batch, "lon"), ORIGIN[0], ORIGIN[1]
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "rhumb_km": pa.array(np.round(d / 1000.0, 6), pa.float64()),
                "course": pa.array(np.round(b, 6), pa.float64()),
            }
        )

    return _docs_geo(sf_dir).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


def q_polygon_perimeters(sf_dir):
    """Geodesic perimeter of every SQL-checked join polygon — haversine
    per ring edge summed as integer millimeters (order-independent), the
    perimeter twin of `polygon_areas`."""
    import ray.data as rd

    from geodistpy_ray.sources.polygons import diamond_polygons
    from geodistpy_ray.stages.pip import add_ring_perimeter

    polys = rd.from_arrow(diamond_polygons())
    return add_ring_perimeter(polys).select_columns(["poly_id", "perimeter_mm"])


def _micro_centroid_sums(ds, key_col: str, count_col: str, final: str):
    """Shared micro-degree centroid partials (cell_centroids /
    track_centroids): floor(deg·1e6 + 0.5) integer partials so the per-key
    SUM is order-independent and both sides divide exactly the same
    integers, summed per ``key_col`` by :func:`grouped_sum`. ONE copy of
    the oracle-critical arithmetic — a tie-rule fix here reaches every
    centroid query at once."""
    from geodistpy_ray.stages.geo import micro_deg
    from geodistpy_ray.stages.relational import grouped_sum

    def to_micro(batch: pa.Table) -> pa.Table:
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                key_col: batch.column(key_col),
                "ulat": pa.array(micro_deg(lat), pa.int64()),
                "ulon": pa.array(micro_deg(lon), pa.int64()),
            }
        )

    ds = ds.map_batches(to_micro, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_sum(
        ds,
        [key_col],
        int_sum_cols={"ulat": "sum_ulat", "ulon": "sum_ulon"},
        count_col=count_col,
        final=final,
    )


def _micro_mean(usum, n) -> np.ndarray:
    """µdeg sums → degree mean (delegates to the ONE shared copy of the
    oracle-critical formula, stages/geo.py:micro_mean)."""
    from geodistpy_ray.stages.geo import micro_mean

    return micro_mean(usum, n)


def q_cell_centroids(sf_dir):
    """Per-cell doc centroid: mean lat/lon of the docs in each occupied
    cell, via INTEGER micro-degree sums (floor(deg·1e6 + 0.5)) so the
    per-cell SUM is order-independent and the mean divides exactly the
    same integers on both sides — the raster density-centroid op."""
    from geodistpy_ray.stages import add_cell

    ds = add_cell(_docs_geo(sf_dir), CELL_DEG)
    out = _micro_centroid_sums(ds, "cell", "n_docs", final="driver")
    out["clat"] = _micro_mean(out["sum_ulat"], out["n_docs"])
    out["clon"] = _micro_mean(out["sum_ulon"], out["n_docs"])
    return out[["cell", "n_docs", "clat", "clon"]]


def q_dist_to_origin(sf_dir):
    from geodistpy_ray.stages import add_distance_to_point

    ds = add_distance_to_point(_docs_geo(sf_dir), ORIGIN, kernel="haversine", out_col="dist_km")
    ds = _round_col(ds, "dist_km", 6, div=1000.0)
    return ds.select_columns(["doc_id", "dist_km"])


def q_radius(sf_dir):
    from geodistpy_ray.functions.geocode import query_points
    from geodistpy_ray.stages import radius_join

    qid, qlat, qlon = query_points(8)
    ds = radius_join(_docs_geo(sf_dir), qid, qlat, qlon, RADIUS_M, kernel="haversine")
    ds = _round_col(ds, "dist", 6, out="dist", div=1000.0)

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["query_id", "doc_id", "dist_km"])

    return ds.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True)


def q_radius_cells(sf_dir):
    import ray.data as rd

    from geodistpy_ray.functions.geocode import query_points
    from geodistpy_ray.stages.radius import radius_join_cells

    qid, qlat, qlon = query_points(16)
    queries = rd.from_arrow(pa.table({"query_id": qid, "lat": qlat, "lon": qlon}))
    ds = radius_join_cells(
        _docs_geo(sf_dir), queries, RADIUS_M, kernel="haversine", cell_deg=CELL_DEG
    )
    ds = _round_col(ds, "dist", 6, out="dist", div=1000.0)

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["query_id", "doc_id", "dist_km"])

    return ds.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True)


def q_knn(sf_dir):
    from geodistpy_ray.functions.geocode import query_points
    from geodistpy_ray.stages import knn_join

    qid, qlat, qlon = query_points(12)
    ds = knn_join(_docs_geo(sf_dir), qid, qlat, qlon, k=KNN_K, kernel="haversine", tie_round=6)
    return ds.select_columns(["query_id", "doc_id", "rank"])


def q_knn_cells(sf_dir):
    import pyarrow as _pa
    import ray.data as rd

    from geodistpy_ray.functions.geocode import query_points
    from geodistpy_ray.stages.knn import knn_join_cells

    qid, qlat, qlon = query_points(16)
    queries = rd.from_arrow(
        _pa.table({"query_id": qid, "lat": qlat, "lon": qlon})
    )
    ds = knn_join_cells(
        _docs_geo(sf_dir),
        queries,
        k=KNN_K,
        kernel="haversine",
        tie_round=6,
        query_salt="auto",  # exercises hot-cell query subgrouping; results identical
    )
    return ds.select_columns(["query_id", "doc_id", "rank"])


def q_knn_indexed(sf_dir):
    import duckdb
    import ray.data as rd

    from geodistpy_ray.functions.geocode import geocode_ids, query_points
    from geodistpy_ray.stages.knn import knn_join_indexed

    con = duckdb.connect()
    ids = con.execute(
        f"SELECT doc_id FROM read_parquet('{sf_dir}/documents.parquet') ORDER BY doc_id"
    ).df()["doc_id"].to_numpy()
    con.close()
    clat, clon = geocode_ids(ids)
    qid, qlat, qlon = query_points(20)
    queries = rd.from_arrow(pa.table({"query_id": qid, "lat": qlat, "lon": qlon}))
    ds = knn_join_indexed(queries, ids, clat, clon, k=KNN_K, kernel="haversine", tie_round=6)
    return ds.select_columns(["query_id", "doc_id", "rank"])


def q_pip(sf_dir):
    from geodistpy_ray.sources.polygons import diamond_polygons
    from geodistpy_ray.stages import point_in_polygon_join

    return point_in_polygon_join(_docs_geo(sf_dir), diamond_polygons(), id_col="doc_id", cell_deg=CELL_DEG)


def q_polar_caps(sf_dir):
    from geodistpy_ray.stages.pip import polar_cap_join

    caps = pa.table(
        {
            "cap_id": np.array([0, 1], dtype=np.int64),
            "pole": np.array([1, -1], dtype=np.int64),
            "colat_deg": np.array([15.0, 20.0]),
        }
    )
    return polar_cap_join(_docs_geo(sf_dir), caps)


def q_bearing(sf_dir):
    from geodistpy_ray.kernels import initial_bearing_sphere
    from geodistpy_ray.stages.geo import col_np

    def fn(batch: pa.Table) -> pa.Table:
        b = initial_bearing_sphere(col_np(batch, "lat"), col_np(batch, "lon"), ORIGIN[0], ORIGIN[1])
        return batch.append_column("brg", pa.array(np.round(b, 6), pa.float64()))

    return _docs_geo(sf_dir).map_batches(fn, batch_format="pyarrow", zero_copy_batch=True).select_columns(["doc_id", "brg"])


def q_dist_table(sf_dir):
    from geodistpy_ray.functions.geocode import query_points
    from geodistpy_ray.stages.pairs import distance_table

    qid, qlat, qlon = query_points(6)
    ds = distance_table(_docs_geo(sf_dir), qid, qlat, qlon, kernel="haversine")
    ds = _round_col(ds, "dist", 6, out="dist", div=1000.0)

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["query_id", "doc_id", "dist_km"])

    return ds.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True)


def q_close_pairs(sf_dir):
    from geodistpy_ray.stages.pairs import close_pairs

    ds = close_pairs(_docs_geo(sf_dir), PAIR_DIST_M, kernel="haversine", cell_deg=CELL_DEG)
    ds = _round_col(ds, "dist", 6, out="dist", div=1000.0)

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["id_left", "id_right", "dist_km"])

    return ds.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True)


def q_dedup_exact(sf_dir):

    from geodistpy_ray.stages.dedup import exact_dedup

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return exact_dedup(docs)


def q_token_counts(sf_dir):

    from geodistpy_ray.stages.text import add_token_count

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return add_token_count(docs).select_columns(["doc_id", "n_tokens"])


def q_quality(sf_dir):

    from geodistpy_ray.stages.text import add_quality_score, space_ratio_ppm

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    ds = add_quality_score(docs)

    def ppm(batch: pa.Table) -> pa.Table:
        v = space_ratio_ppm(
            batch.column("n_spaces").to_numpy(), batch.column("n_chars_q").to_numpy()
        )
        return batch.append_column("space_ratio_ppm", pa.array(v, pa.int64()))

    return ds.map_batches(ppm, batch_format="pyarrow", zero_copy_batch=True).select_columns(
        ["doc_id", "n_chars_q", "n_spaces", "space_ratio_ppm"]
    )


def q_source_stats(sf_dir):

    from geodistpy_ray.stages.relational import grouped_sum

    docs = _read(f"{sf_dir}/documents.parquet", columns=["source", "n_chars"])
    return grouped_sum(docs, ["source"], int_sum_cols={"n_chars": "sum_chars"}, count_col="n_docs")


def q_lang_counts(sf_dir):

    from geodistpy_ray.stages.relational import grouped_sum

    docs = _read(f"{sf_dir}/documents.parquet", columns=["lang"])
    return grouped_sum(docs, ["lang"], count_col="n_docs")


def q_fingerprints(sf_dir):

    from geodistpy_ray.stages.text import add_fingerprint

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return add_fingerprint(docs).select_columns(["doc_id", "fingerprint"])


def q_lang_id(sf_dir):

    from geodistpy_ray.stages.text import add_lang_id

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return add_lang_id(docs).select_columns(["doc_id", "lang_pred"])


def q_minhash_pairs(sf_dir):

    from geodistpy_ray.stages.dedup import minhash_lsh_pairs

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    ds = minhash_lsh_pairs(docs, threshold=0.5)
    return _round_col(ds, "jaccard", 6)


def q_simhash_pairs(sf_dir):

    from geodistpy_ray.stages.dedup import simhash_near_pairs

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return simhash_near_pairs(docs, max_hamming=3)


def _query_vectors(sf_dir):
    import duckdb

    con = duckdb.connect()
    q = con.execute(
        f"SELECT vec_id, embedding FROM read_parquet('{sf_dir}/embeddings.parquet') "
        "WHERE vec_id < 5 ORDER BY vec_id"
    ).fetchall()
    con.close()
    return np.array([row[1] for row in q], dtype=np.float64)


def q_ann_topk(sf_dir):

    from geodistpy_ray.stages.ann import ann_topk

    emb = _read(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ds = ann_topk(emb, _query_vectors(sf_dir), k=ANN_K, tie_round=6)
    return ds.select_columns(["query_id", "vec_id", "rank"])


def q_knn_graph(sf_dir):
    """k-NN graph over the embedding corpus: each vector's top-3 cosine
    neighbors, self excluded — the edge list graph-dedup / HNSW builds
    consume (stages/ann.py:knn_graph, budget-guarded broadcast with the
    streamed windowed-top-k combiner)."""
    from geodistpy_ray.stages.ann import knn_graph

    emb = _read(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return knn_graph(emb, k=3)


def q_knn_graph_blocked(sf_dir):
    """Distributed exact k-NN graph (stages/ann.py:knn_graph_blocked):
    block-replicated cartesian — one shuffle, per-query local top-k windows
    per block pair, hash-partitioned global merge — no take_all/driver
    matrix, so it runs past knn_graph's broadcast budget. Same ROW_NUMBER
    oracle as knn_graph: both paths must produce the identical edge list."""
    from geodistpy_ray.stages.ann import knn_graph_blocked

    emb = _read(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return knn_graph_blocked(emb, k=3, n_blocks=8)


def q_ann_join(sf_dir):
    """Two-sided blocked exact ANN JOIN (stages/ann.py:ann_join_blocked):
    the query side is a Dataset too (here: vec_id < 50 of the corpus), not
    a driver-side matrix — query rows hash into blocks and ship once per
    corpus block, one shuffle, per-group submatrix products, hash-
    partitioned top-k merge. Same (-round(sim,6), id) rank contract as
    ann_topk, mirrored by the same ROW_NUMBER oracle."""
    import pyarrow.compute as _pc

    from geodistpy_ray.stages.ann import ann_join_blocked

    emb = _read(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def to_queries(b):
        t = b.filter(_pc.less(b.column("vec_id"), 50))
        return t.rename_columns(["query_id", "embedding"])

    q = _read(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]).map_batches(
        to_queries, batch_format="pyarrow", zero_copy_batch=True
    )
    ds = ann_join_blocked(q, emb, k=5, n_query_blocks=4, n_corpus_blocks=8)
    return ds.select_columns(["query_id", "vec_id", "rank"])


def q_ivf_ann_join(sf_dir):
    """IVF-pruned two-sided ANN join (stages/ann.py:ivf_ann_join) — the
    approximate complement to `ann_join` when |Q|·|C| exact FLOPs are not
    affordable: rows-only (candidate pruning is the point; recall floors
    and the exact-degeneracy at full probe are pinned in test_ann.py).
    Same query construction as q_ann_join so the two paths are directly
    comparable."""
    import pyarrow.compute as _pc

    from geodistpy_ray.stages.ann import ivf_ann_join

    emb = _read(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def to_queries(b):
        t = b.filter(_pc.less(b.column("vec_id"), 50))
        return t.rename_columns(["query_id", "embedding"])

    q = _read(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]).map_batches(
        to_queries, batch_format="pyarrow", zero_copy_batch=True
    )
    ds = ivf_ann_join(
        q, emb, k=5, n_centroids=8, n_probe=4, n_assign=2, train_sample=512
    )
    return ds.select_columns(["query_id", "vec_id", "rank"])


def q_ann_topk_q8(sf_dir):
    """Int8-quantized ANN (rows-only: sims carry ≤ scale/2 rounding, recall
    vs the exact path pinned in tests + recall_bench): quantize the corpus
    to 1/4 the bytes, then cosine top-k against the same query matrix."""

    from geodistpy_ray.stages.ann import ann_topk_quantized, quantize_embeddings

    emb = _read(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ds = ann_topk_quantized(quantize_embeddings(emb), _query_vectors(sf_dir), k=ANN_K)
    return ds.select_columns(["query_id", "vec_id", "rank"])


def q_lsh_ann(sf_dir):

    from geodistpy_ray.stages.ann import lsh_ann_topk

    emb = _read(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return lsh_ann_topk(emb, _query_vectors(sf_dir), k=ANN_K, n_bits=6)


def q_ivf_ann(sf_dir):

    from geodistpy_ray.stages.ann import ivf_ann_topk

    emb = _read(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return ivf_ann_topk(
        emb, _query_vectors(sf_dir), k=ANN_K, n_centroids=8, n_probe=4, n_assign=3
    )


def q_embed_near_dup(sf_dir):

    from geodistpy_ray.stages.ann import exact_near_dup_pairs

    emb = _read(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ds = exact_near_dup_pairs(emb, NEAR_DUP_T)
    return _round_col(ds, "sim", 6)


def q_label_centroids(sf_dir):
    """Per-label embedding centroids (class prototypes), exploded to
    (label, dim, mean_v) for the SQL mirror. Fp caveat: double partial
    sums reassociate across batches vs DuckDB's sequential AVG — both are
    ~1e-15 relative, so the shared round-6 cannot flip."""

    from geodistpy_ray.stages.ann import grouped_vector_mean

    emb = _read(f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"])
    return grouped_vector_mean(emb, key_col="label")


def q_value_histogram(sf_dir):
    """Fixed-bin histogram of event values (bin width 5, left-closed —
    floor(value/5)): one arithmetic map + the partial+final count
    combiner. The profiling op behind every 'distribution of X' check."""
    import pyarrow.compute as pc

    from geodistpy_ray.stages.relational import grouped_sum

    ev = _read(f"{sf_dir}/events.parquet", columns=["value"])

    def binned(t: pa.Table) -> pa.Table:
        b = pc.floor(pc.divide(t.column("value"), 5.0))
        return pa.table({"bin": pc.cast(b, pa.int64())})

    bins = ev.map_batches(binned, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_sum(bins, ["bin"], count_col="n")


def q_snapshot_diff(sf_dir):
    """SCD-style snapshot delta: two versions of the orders table (the
    'old' snapshot drops every 7th order and perturbs every 3rd total —
    deterministic rules, mirrored in SQL) full-outer-joined by key, each
    row tagged added / removed / changed / same. The change-data-capture
    op a periodic recrawl pipeline runs between dumps."""
    import pyarrow.compute as pc

    from geodistpy_ray.stages.joins import shuffle_equi_join

    base = _read(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"])

    def old_snap(t: pa.Table) -> pa.Table:
        k = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(k % 7 != 0))
        k = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        cents_ = np.floor(
            t.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        bump = np.where(k % 3 == 0, 100, 0)
        return pa.table(
            {"key_old": pa.array(k, pa.int64()), "cents_old": pa.array(cents_ + bump, pa.int64())}
        )

    def new_snap(t: pa.Table) -> pa.Table:
        cents_ = pc.cast(
            pc.floor(pc.add(pc.multiply(t.column("o_totalprice"), 100.0), 0.5)),
            pa.int64(),
        )
        return pa.table({"o_orderkey": t.column("o_orderkey"), "cents_new": cents_})

    old = base.map_batches(old_snap, batch_format="pyarrow", zero_copy_batch=True)
    new = base.map_batches(new_snap, batch_format="pyarrow", zero_copy_batch=True)
    j = shuffle_equi_join(new, old, "o_orderkey", "key_old", join_type="full outer")

    def tag(t: pa.Table) -> pa.Table:
        import numpy as np

        cn = t.column("cents_new").to_numpy(zero_copy_only=False)
        co = t.column("cents_old").to_numpy(zero_copy_only=False)
        new_null = np.isnan(cn)
        old_null = np.isnan(co)
        status = np.where(
            old_null, "added", np.where(new_null, "removed", np.where(cn != co, "changed", "same"))
        )
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "status": pa.array(status.tolist(), pa.string()),
            }
        )

    tagged = j.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    from geodistpy_ray.stages.relational import grouped_sum

    return grouped_sum(tagged, ["status"], count_col="n")


def q_user_value_quartiles(sf_dir):
    """Per-user NTILE(4) over event values — the per-stratum percentile
    bucketing a curation pipeline uses to tag rows by within-group rank
    (e.g. quality quartiles per language). Exact SQL NTILE semantics
    (first count%4 buckets one row larger), ties broken by event_id."""
    from geodistpy_ray.stages.relational import grouped_ntile

    ev = _read(f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "value"])
    out = grouped_ntile(ev, "user_id", "value", n=4, tiebreak_col="event_id")

    def project(t: pa.Table) -> pa.Table:
        return t.select(["user_id", "event_id", "ntile"])

    return out.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)


def q_funnel_users(sf_dir):
    """Two-step funnel: users with a purchase within 1 h at-or-after a
    view. Pure composition of existing operators — asof-FORWARD join
    (the first purchase ≥ each view IS the minimal one, so "exists within
    T" ⇔ "the as-of match is within T"), a streaming Δt filter, and a
    distributed distinct. No new shuffle machinery."""
    import pyarrow.compute as pc

    from geodistpy_ray.stages.joins import asof_join
    from geodistpy_ray.stages.relational import distinct

    ev = _read(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"])

    def split(kind, extra):
        def fn(t: pa.Table) -> pa.Table:
            t = t.filter(pc.equal(t.column("event_type"), kind))
            us = pc.cast(pc.cast(t.column("ts"), pa.timestamp("us")), pa.int64())
            cols = {"user_id": t.column("user_id"), "ts": us}
            if extra:
                cols[extra] = us  # right-side ts must survive as a VALUE col
            return pa.table(cols)

        return ev.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)

    views = split("view", None)
    buys = split("purchase", "buy_ts")
    j = asof_join(views, buys, key="user_id", ts="ts", direction="forward")

    def within(t: pa.Table) -> pa.Table:
        keep = pc.less_equal(
            pc.subtract(t.column("buy_ts"), t.column("ts")), 3_600_000_000
        )
        return t.filter(keep).select(["user_id"])

    hits = j.map_batches(within, batch_format="pyarrow", zero_copy_batch=True)
    return distinct(hits, ["user_id"])


def q_nearest_centroid(sf_dir):
    """Nearest-class-mean assignment: every embedding labeled by its
    most-cosine-similar class centroid (the assignment step of k-means /
    a prototype classifier). Centroids are the bounded-domain result of
    grouped_vector_mean, broadcast once; per batch ONE matmul against the
    centroid matrix. Tie contract mirrors ROW_NUMBER: round(-sim, 6)
    then smallest label."""
    import ray

    from geodistpy_ray.stages.ann import _emb_matrix, _normalize, grouped_vector_mean
    from geodistpy_ray.stages.broadcast import get_broadcast

    emb = _read(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "label", "embedding"])
    cent_tab = grouped_vector_mean(
        emb.select_columns(["label", "embedding"]), key_col="label", round_to=None
    ).to_pandas()
    labels = np.sort(cent_tab["label"].unique())
    cmat = np.stack(
        [
            cent_tab[cent_tab["label"] == l].sort_values("dim")["mean_v"].to_numpy()
            for l in labels
        ]
    )
    ref = ray.put((labels, _normalize(cmat)))

    def assign(t: pa.Table) -> pa.Table:
        labs, cn = get_broadcast(ref)
        if t.num_rows == 0:
            return pa.table(
                {"vec_id": pa.array([], pa.int64()), "assigned": pa.array([], pa.int64())}
            )
        e = _normalize(_emb_matrix(t, "embedding", np.float64))
        sims = np.round(e @ cn.T, 6)
        # argmax with smallest-label ties: argmax returns the FIRST max and
        # labs is sorted ascending
        best = labs[np.argmax(sims, axis=1)]
        ids = t.column("vec_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {"vec_id": pa.array(ids, pa.int64()), "assigned": pa.array(best, pa.int64())}
        )

    return emb.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


def q_embed_near_dup_blocked(sf_dir):
    """The distributed exact twin of embed_near_dup: block-replicated
    cartesian (one shuffle, B copies/vector, bounded pair-groups) instead
    of the broadcast driver matrix — same pairs, same sims, value-checked
    against the same SQL."""

    from geodistpy_ray.stages.ann import exact_near_dup_pairs_blocked

    emb = _read(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ds = exact_near_dup_pairs_blocked(emb, NEAR_DUP_T, n_blocks=8)
    return _round_col(ds, "sim", 6)


def q_embed_near_dup_lsh(sf_dir):
    """LSH-bucketed near-dup pairs — the scale path when exact_near_dup's
    broadcast budget guard trips. Approximate (multi-table recall knob) →
    rows-only; cross-checked against the exact twin in tests/test_ann.py
    and scripts/recall_bench.py."""

    from geodistpy_ray.stages.ann import embedding_near_dup_pairs

    emb = _read(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ds = embedding_near_dup_pairs(emb, threshold=NEAR_DUP_T, n_bits=4, n_tables=16)
    return _round_col(ds, "sim", 6)


def q_image_features(sf_dir):

    from geodistpy_ray.stages.media import decode_images, extract_image_features

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def to_payload(batch: pa.Table) -> pa.Table:
        # (t or "") keeps a NULL text deterministic (empty payload) instead
        # of crashing the actor pool on t.encode()
        payload = [(t or "").encode() for t in batch.column("text").to_pylist()]
        return batch.append_column("payload", pa.array(payload, pa.binary()))

    ds = docs.map_batches(to_payload, batch_format="pyarrow", zero_copy_batch=True)
    ds = decode_images(ds, payload_col="payload", concurrency=(1, 2))
    ds = extract_image_features(ds, concurrency=(1, 2))
    return ds.select_columns(["doc_id", "payload_bytes", "img_h", "img_w", "img_feat"])


def q_image_features_bmp(sf_dir):
    """REAL-decode variant: each doc's text bytes are framed as an actual
    8-bpp BMP container (kernels/codecs.py encoder), decoded by the
    pure-NumPy BMP decoder (real_codec=True), resampled to the model input
    shape, and feature-pooled — the same actor plumbing as the fake path
    but with a genuine parse of the payload bytes."""

    from geodistpy_ray.kernels.codecs import encode_bmp
    from geodistpy_ray.stages.media import decode_images, extract_image_features

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def to_bmp(batch: pa.Table) -> pa.Table:
        payloads = []
        for t in batch.column("text").to_pylist():
            raw = np.frombuffer((t or "").encode() or b"\x00", dtype=np.uint8)
            img = np.resize(raw, (24, 24))  # tile/truncate to a fixed canvas
            payloads.append(encode_bmp(img))
        return pa.table(
            {"doc_id": batch.column("doc_id"), "payload": pa.array(payloads, pa.binary())}
        )

    ds = docs.map_batches(to_bmp, batch_format="pyarrow", zero_copy_batch=True)
    ds = decode_images(ds, payload_col="payload", concurrency=(1, 2), real_codec=True)
    ds = extract_image_features(ds, concurrency=(1, 2))
    return ds.select_columns(["doc_id", "payload_bytes", "img_h", "img_w", "img_feat"])


def _synth_link_pages(sf_dir):
    """(url, html) pages with 3 deterministic outgoing links per doc —
    targets are modular arithmetic over doc_id, so SQL oracles reproduce
    the EDGE LIST without parsing. Shared by the web-graph queries."""
    import pyarrow.compute as pc

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    n_docs = docs.count()

    def url_arr(t):
        host = pc.cast(pa.array(t % 50), pa.string())
        tid = pc.cast(pa.array(t), pa.string())
        return pc.binary_join_element_wise(
            "https://host", host, ".example.com/d/", tid, ""
        )

    def synth(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        pieces = ["<html><body>"]
        for j in range(3):
            t = (ids * 7 + 13 * j + 1) % n_docs
            pieces.extend(['<a href="', url_arr(t), '">x</a>'])
        pieces.append("<p>body</p></body></html>")
        html = pc.binary_join_element_wise(*pieces, "")
        return pa.table({"url": url_arr(ids), "html": html})

    return docs.map_batches(synth, batch_format="pyarrow", zero_copy_batch=True)


def q_link_degrees(sf_dir):
    """Web-graph in-degree: synthesize linked pages, parse the links back
    out of the html with `extract_links` (Arrow list-kernel multi-match),
    and count per-target in-degree. A parse that drops or garbles any edge
    fails the value-hash."""
    from geodistpy_ray.stages.relational import grouped_sum
    from geodistpy_ray.stages.text import extract_links

    pages = _synth_link_pages(sf_dir)
    edges = extract_links(pages, html_col="html", url_col="url")
    # href is an unbounded key domain (~one per page): partitioned final,
    # not Ray's native sort-aggregate (per-group machinery ~0.1 ms/key)
    # and never the driver
    return grouped_sum(edges, ["href"], count_col="n_links", final="partitioned")


def q_link_components(sf_dir):
    """Intra-domain link clusters: parse the link graph out of html, keep
    only SAME-HOST edges (both endpoint hosts parsed back out of the url
    strings — a host-parse error changes the kept edge set and fails the
    hash), and run distributed min-label connected components over the
    int64 page-id edge list. Oracle: the same arithmetic edge list closed
    under a recursive min-reachable CTE."""
    import pyarrow.compute as pc

    from geodistpy_ray.stages.graph import connected_components
    from geodistpy_ray.stages.text import extract_links

    pages = _synth_link_pages(sf_dir)
    edges = extract_links(pages, html_col="html", url_col="url")

    def parse_ids(batch: pa.Table) -> pa.Table:
        def host_and_id(col):
            host = pc.struct_field(
                pc.extract_regex(col, r"^https://host(?P<h>\d+)\."), "h"
            )
            pid = pc.struct_field(pc.extract_regex(col, r"/d/(?P<i>\d+)$"), "i")
            return pc.cast(host, pa.int64()), pc.cast(pid, pa.int64())

        sh, sid = host_and_id(batch.column("url"))
        dh, did = host_and_id(batch.column("href"))
        t = pa.table({"src": sid, "dst": did})
        return t.filter(pc.equal(sh, dh))

    ie = edges.map_batches(parse_ids, batch_format="pyarrow", zero_copy_batch=True)
    return connected_components(ie, src_col="src", dst_col="dst")


def q_canonical_urls(sf_dir):
    """Canonical-URL dedup keys: deterministically messy urls (mixed-case
    scheme/host, default ports, lone-slash paths, empty queries, fragments)
    built from doc_id, canonicalized with chained Arrow RE2 kernels, and
    counted per canonical form. The oracle builds the SAME url strings in
    SQL and applies the exact mirror (`canonicalize_urls_sql`)."""
    from geodistpy_ray.stages.text import canonicalize_urls

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def synth(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        urls = [
            ("HTTPS://" if i % 2 == 0 else "https://")
            + f"Host{i % 25}.Example.com"
            + (":443" if i % 3 == 0 else "")
            + ("/" if i % 4 == 0 else f"/d/{i % 100}")
            + ("?" if i % 7 == 0 else "")
            + ("#Sec" if i % 5 == 0 else "")
            for i in ids
        ]
        return pa.table({"url": pa.array(urls, pa.string())})

    ds = docs.map_batches(synth, batch_format="pyarrow", zero_copy_batch=True)
    ds = canonicalize_urls(ds)
    from ray.data.aggregate import Count

    return ds.groupby("canonical_url").aggregate(Count(alias_name="n"))


_CANON_URL_BUILD_SQL = (
    "(CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://' ELSE 'https://' END) "
    "|| 'Host' || CAST(doc_id % 25 AS VARCHAR) || '.Example.com' "
    "|| (CASE WHEN doc_id % 3 = 0 THEN ':443' ELSE '' END) "
    "|| (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '/d/' || CAST(doc_id % 100 AS VARCHAR) END) "
    "|| (CASE WHEN doc_id % 7 = 0 THEN '?' ELSE '' END) "
    "|| (CASE WHEN doc_id % 5 = 0 THEN '#Sec' ELSE '' END)"
)


def _synth_link_edges(sf_dir):
    """The deterministic 3-out doc link graph shared by every link-graph
    query: dst = (id*7 + 13j + 1) % n_docs for j in 0..2 — ONE builder so
    the engine sites can't drift from each other (the SQL mirrors re-derive
    the same arithmetic; change both together)."""
    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    n_docs = docs.count()

    def edges(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        src = np.concatenate([ids, ids, ids])
        dst = np.concatenate([(ids * 7 + 13 * j + 1) % n_docs for j in range(3)])
        return pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})

    return docs.map_batches(edges, batch_format="pyarrow", zero_copy_batch=True)


def q_link_hops(sf_dir):
    """Distributed BFS over the directed link graph: minimum hop count
    from the seed pages {0, 1, 2} — the crawl-frontier / influence-radius
    op (graph.py:bfs_hops, the CC idiom with a min-plus semilattice).
    Oracle: a depth-capped recursive CTE taking MIN(d) per node."""
    from geodistpy_ray.stages.graph import bfs_hops

    return bfs_hops(_synth_link_edges(sf_dir), seeds=[0, 1, 2], n_parts=16)


def q_link_triangles(sf_dir):
    """Distributed triangle count over the undirected link graph — the
    canonical wedge-close algorithm as TWO bucketed joins: canonical
    edges (a<b) join themselves on the middle vertex to form wedges
    (a<b<c), then a SEMI join against the edge set keeps closed wedges.
    Per-wedge work never leaves its hash bucket; output is the count per
    smallest vertex (so the row set, not just one scalar, is verified)."""
    import pandas as pd
    import pyarrow.compute as pc

    from geodistpy_ray.stages.joins import shuffle_equi_join
    from geodistpy_ray.stages.relational import distinct, grouped_sum

    def canonical(batch: pa.Table) -> pa.Table:
        src = batch.column("src").to_numpy(zero_copy_only=False)
        dst = batch.column("dst").to_numpy(zero_copy_only=False)
        a = np.minimum(src, dst)
        b = np.maximum(src, dst)
        keep = a != b  # drop self-loops
        return pa.table({"a": pa.array(a[keep], pa.int64()), "b": pa.array(b[keep], pa.int64())})

    e = distinct(
        _synth_link_edges(sf_dir).map_batches(
            canonical, batch_format="pyarrow", zero_copy_batch=True
        ),
        ["a", "b"],
    ).materialize()
    # pair-packing base for the SEMI join below: strictly greater than any
    # endpoint (b = max(src,dst) bounds both), so (a, b) -> a*base + b is
    # injective even on fixtures whose doc_ids are NOT contiguous from 0 —
    # a count()-derived base collides packed keys there. e is materialized,
    # so this max is a cheap scan of the small edge table.
    base = int(e.max("b")) + 1
    if base >= 3_000_000_000:  # a*base + b needs a,b < ~3.03e9 for int64
        raise ValueError(f"link_triangles: packed pair key would overflow int64 (base={base})")

    # wedges a<b<c: e(a,b) ⋈ e(b,c) on the middle vertex b
    def rn(cols):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.rename_columns(cols)

        return fn

    left = e.map_batches(rn(["wa", "b"]), batch_format="pyarrow", zero_copy_batch=True)
    right = e.map_batches(rn(["b", "wc"]), batch_format="pyarrow", zero_copy_batch=True)
    wedges = shuffle_equi_join(left, right, "b", n_buckets=16)
    # close the wedge: SEMI join (wa, wc) against the edge set
    w = wedges.map_batches(
        lambda t: t.select(["wa", "wc"]).rename_columns(["a", "b"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def tag_pair(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        return batch.append_column("pair", pa.array(a * np.int64(base) + b, pa.int64()))

    w = w.map_batches(tag_pair, batch_format="pyarrow", zero_copy_batch=True)
    ek = e.map_batches(tag_pair, batch_format="pyarrow", zero_copy_batch=True).select_columns(["pair"])
    closed = shuffle_equi_join(w, ek, "pair", join_type="left semi", n_buckets=16)
    out = grouped_sum(closed, ["a"], count_col="n_triangles", final="partitioned")
    return out.map_batches(
        lambda t: t.select(["a", "n_triangles"]).rename_columns(["node", "n_triangles"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def q_domain_stats(sf_dir):
    """Per-registrable-domain page counts — the web-corpus rollup key op:
    urls with subdomain depth 0–2 and both plain and multi-label public
    suffixes (.com/.org/.net/.co.uk), eTLD+1 extracted with
    `add_registrable_domain` (Arrow RE2), counted per domain. The oracle
    builds the SAME urls and applies the exact mirror."""
    from ray.data.aggregate import Count

    from geodistpy_ray.stages.text import add_registrable_domain

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def synth(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        pre = ["www.", "blog.", "a.b.", ""]
        suf = [".com", ".co.uk", ".org", ".net"]
        urls = [
            f"https://{pre[i % 4]}site{i % 37}{suf[i % 4]}/p/{i}" for i in ids
        ]
        return pa.table({"url": pa.array(urls, pa.string())})

    ds = docs.map_batches(synth, batch_format="pyarrow", zero_copy_batch=True)
    ds = add_registrable_domain(ds)
    return ds.groupby("domain").aggregate(Count(alias_name="n_pages"))


_DOMAIN_URL_BUILD_SQL = (
    "'https://' || (CASE doc_id % 4 WHEN 0 THEN 'www.' WHEN 1 THEN 'blog.' "
    "WHEN 2 THEN 'a.b.' ELSE '' END) || 'site' || CAST(doc_id % 37 AS VARCHAR) "
    "|| (CASE doc_id % 4 WHEN 0 THEN '.com' WHEN 1 THEN '.co.uk' "
    "WHEN 2 THEN '.org' ELSE '.net' END) || '/p/' || CAST(doc_id AS VARCHAR)"
)


def q_embed_pca(sf_dir):
    """Distributed 2-component PCA projection of the embeddings corpus —
    one moment-partial pass (d×d Gram per batch), O(d²) driver fold,
    broadcast projection. Rows-only: eigendecomposition isn't
    SQL-expressible; numpy full-matrix parity is pinned in
    tests/test_ann.py."""
    from geodistpy_ray.stages.ann import embedding_pca

    emb = _read(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    proj, _ = embedding_pca(emb, n_components=2)
    return proj


def q_pagerank_links(sf_dir):
    """Distributed PageRank over the deterministic doc link graph (same
    modular-arithmetic edges as link_degrees, int node ids). Rows-only:
    iterative damped power method isn't SQL-expressible; the dense-matrix
    reference parity (1e-12) is pinned in tests/test_graph.py."""
    from geodistpy_ray.stages.graph import pagerank

    ranks = pagerank(_synth_link_edges(sf_dir), n_iters=5, n_parts=32)
    return _round_col(ranks, "rank", 9)


def q_hits_links(sf_dir):
    """HITS hubs & authorities over the deterministic doc link graph.
    Rows-only: the mutually-recursive normalized iteration isn't
    SQL-expressible; dense-reference parity (1e-10) is pinned in
    tests/test_graph.py::TestHits."""
    from geodistpy_ray.stages.graph import hits

    scores = hits(_synth_link_edges(sf_dir), n_iters=3, n_parts=16)
    scores = _round_col(scores, "hub", 9)
    return _round_col(scores, "auth", 9)


def q_pages_pipeline(sf_dir):
    """North-rule pages path (BASELINE.json input_hint): deterministic
    Common-Crawl-style pages fixture (url, warc_ts, html, text, lang) →
    html→text extraction with the per-url BYTE-IDENTITY invariant enforced
    inline (any mismatch raises) → url→host → per-lang rollup. Rows-only:
    the fixture is engine-synthesized, not derivable from the sf tables in
    SQL; byte-identity is the in-query oracle."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from geodistpy_ray.sources.pages import generate_pages
    from geodistpy_ray.stages.text import (
        add_host,
        add_token_count,
        count_column_mismatches,
        extract_text,
    )

    pages = rd.from_arrow(generate_pages(4000, seed=42)).repartition(8)
    ext = extract_text(pages).materialize()  # two consumers: invariant + rollup
    bad = count_column_mismatches(ext, "extracted_text", "text")
    if bad:
        raise RuntimeError(f"pages text byte-identity violated on {bad} rows")
    hosted = add_host(ext, url_col="url")
    toks = add_token_count(hosted, text_col="extracted_text")
    return (
        toks.groupby("lang")
        .aggregate(Count(alias_name="n_pages"), Sum("n_tokens", alias_name="n_tokens"))
        .sort("lang")
    )


def q_sorted_export(sf_dir):
    """Ordered-export sink (rows-only: ordering is a file-layout property,
    checked by tests/test_sort.py): events globally range-sorted by
    (value, event_id) into name-ordered parquet files; returns the
    per-range stats table (always n_parts rows)."""
    import tempfile

    from geodistpy_ray.stages.sort import sorted_export

    import shutil

    ev = _read(f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "value"])
    out_dir = tempfile.mkdtemp(prefix="geodist_sorted_")
    try:
        return sorted_export(
            ev,
            out_dir,
            "value",
            extra_order=["event_id"],
            n_parts=16,
            # file-backed input: seed range boundaries from the parquet
            # row-group footers — one full read instead of two
            stats_paths=f"{sf_dir}/events.parquet",
        ).to_pandas()  # 16 stats rows — materialize so the sink can go
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def q_audio_features_wav(sf_dir):
    """REAL-decode variant: text bytes become int16 PCM framed as RIFF/WAVE,
    decoded by the pure-NumPy WAV decoder (real_codec=True; audio_sr reports
    the file's rate), then RMS-windowed."""

    from geodistpy_ray.kernels.codecs import encode_wav
    from geodistpy_ray.stages.media import decode_audio, extract_audio_features

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def to_wav(batch: pa.Table) -> pa.Table:
        payloads = []
        for t in batch.column("text").to_pylist():
            raw = np.frombuffer((t or "").encode() or b"\x00", dtype=np.uint8)
            pcm = (np.resize(raw, 1024).astype(np.int16) - 128) * 256
            payloads.append(encode_wav(pcm, 16_000))
        return pa.table(
            {"doc_id": batch.column("doc_id"), "payload": pa.array(payloads, pa.binary())}
        )

    ds = docs.map_batches(to_wav, batch_format="pyarrow", zero_copy_batch=True)
    ds = decode_audio(ds, payload_col="payload", concurrency=(1, 2), n_samples=1024, real_codec=True)
    ds = extract_audio_features(ds, concurrency=(1, 2))
    return ds.select_columns(["doc_id", "audio_sr", "n_samples", "audio_feat"])


MIN_TOKENS = 40
MAX_SPACE_PPM = 180_000


def q_clean_corpus(sf_dir):
    """The canonical training-data cleaning pipeline, composed from engine
    stages: exact dedup (keep lowest doc_id) → language filter → quality
    gate (token count + space-ratio band) → surviving doc stats. Fully
    SQL-expressible, so the whole composition is oracle-checked."""
    import pyarrow.compute as pc

    from geodistpy_ray.stages.dedup import exact_dedup
    from geodistpy_ray.stages.joins import shuffle_equi_join
    from geodistpy_ray.stages.text import add_quality_score, add_token_count

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"])
    keep = exact_dedup(docs.select_columns(["doc_id", "text"])).select_columns(["keep_id"])
    docs_en = docs.map_batches(
        lambda t: t.filter(pc.equal(t["lang"], "en")),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    # distributed semi-join against the dedup survivors (no driver collect)
    ds = shuffle_equi_join(docs_en, keep, "doc_id", "keep_id", join_type="left semi")
    ds = add_token_count(ds)
    ds = add_quality_score(ds)

    def gate(batch: pa.Table) -> pa.Table:
        from geodistpy_ray.stages.text import space_ratio_ppm

        nt = batch.column("n_tokens").to_numpy()
        ppm = space_ratio_ppm(
            batch.column("n_spaces").to_numpy(), batch.column("n_chars_q").to_numpy()
        )
        mask = (nt >= MIN_TOKENS) & (ppm <= MAX_SPACE_PPM)
        return batch.filter(pa.array(mask)).select(["doc_id", "n_tokens"])

    return ds.map_batches(gate, batch_format="pyarrow", zero_copy_batch=True)


def q_user_value_range(sf_dir):

    from geodistpy_ray.stages.relational import grouped_minmax

    ev = _read(f"{sf_dir}/events.parquet", columns=["user_id", "value"])
    # user_id is the canonical UNBOUNDED key domain: the final merge must be
    # distributed — and partitioned (64 bounded groups), not Ray's
    # per-distinct-key sort-aggregate
    return grouped_minmax(ev, ["user_id"], "value", final="partitioned")


def q_cell_doc_lists(sf_dir):
    from geodistpy_ray.stages import add_cell
    from geodistpy_ray.stages.relational import grouped_string_agg

    ds = add_cell(_docs_geo(sf_dir), 8.0)
    return grouped_string_agg(ds, "cell", "doc_id", out_col="doc_list")


def q_dataset_splits(sf_dir):
    """Deterministic train/val/test split + per-split doc and token totals."""

    from geodistpy_ray.stages.relational import grouped_sum
    from geodistpy_ray.stages.text import add_split, add_token_count

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    ds = add_token_count(add_split(docs))
    return grouped_sum(ds, ["split"], int_sum_cols={"n_tokens": "sum_tokens"}, count_col="n_docs")


def q_sample_10pct(sf_dir):

    from geodistpy_ray.stages.text import sample_fraction

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"])
    return sample_fraction(docs, pct=10)


SAMPLE_K = 1000


def q_sample_exact_k(sf_dir):
    """Exactly-SAMPLE_K uniform event sample by splitmix64(event_id) order —
    the fixed-size eval-subset op; partition-independent and SQL-mirrored
    bit-for-bit (splitmix64 via 32-bit split multiplication in DuckDB)."""

    from geodistpy_ray.stages.text import sample_exact_k

    ev = _read(f"{sf_dir}/events.parquet", columns=["event_id", "user_id"])
    return sample_exact_k(ev, k=SAMPLE_K, id_col="event_id")


def _sample_exact_k_sql() -> str:
    from geodistpy_ray.stages.text import splitmix64_sql

    steps, final = splitmix64_sql("event_id")
    ctes, prev = [], "events"
    for i, expr in enumerate(steps, 1):
        ctes.append(f"s{i} AS (SELECT event_id, user_id, {expr} AS z{i} FROM {prev})")
        prev = f"s{i}"
    return (
        "WITH " + ", ".join(ctes)
        + f" SELECT event_id, user_id FROM {prev} "
        + f"ORDER BY {final}, event_id LIMIT {SAMPLE_K}"
    )


def q_user_p90_value(sf_dir):

    from geodistpy_ray.stages.relational import grouped_quantile

    ev = _read(f"{sf_dir}/events.parquet", columns=["user_id", "value"])
    ds = grouped_quantile(ev, "user_id", "value", q=0.9, out_col="p90_value")
    return _round_col(ds, "p90_value", 6)


def q_token_df(sf_dir):
    """Corpus document-frequency table (the IDF side of TF-IDF): per-batch
    distinct-(token, doc) combiner → hash-partitioned token sum."""

    from geodistpy_ray.stages.text import token_doc_frequency

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return token_doc_frequency(docs)


def q_tfidf_top3(sf_dir):
    """Top-3 TF-IDF terms per document — tf rows join the df table on the
    token (one bucketed shuffle; vocabulary is unbounded at web scale, so
    no broadcast), per-doc top-k on a hash partition of doc_id."""

    from geodistpy_ray.stages.text import tfidf_topk

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return tfidf_topk(docs, k=3)


def q_rep_stats(sf_dir):
    """Gopher-style repetition features per document (distinct-token ratio,
    top-token and top-bigram coverage) as exact INTEGER counts — a per-batch
    local pass, no shuffle (each document's text lives in one row)."""

    from geodistpy_ray.stages.text import repetition_stats

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return repetition_stats(docs)


def q_contaminated(sf_dir):
    """Benchmark decontamination: distinct full 3-gram token windows each
    corpus doc shares with the 'benchmark' subset (doc_id % 101 == 7 —
    deterministic stand-in for an eval suite). Benchmark shingle hashes are
    collected once (the small side by nature) and broadcast; the corpus
    streams through one membership-probe pass — no shuffle. shingle=3 here
    because the synthetic ~30-word vocabulary needs short n-grams for
    non-trivial overlap; production decontamination uses 8-13."""

    from geodistpy_ray.stages.dedup import contamination_hits

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def split(batch, want_bench):
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        mask = (ids % 101 == 7) == want_bench
        return batch.filter(pa.array(mask))

    bench = docs.map_batches(
        lambda b: split(b, True), batch_format="pyarrow", zero_copy_batch=True
    )
    corpus = docs.map_batches(
        lambda b: split(b, False), batch_format="pyarrow", zero_copy_batch=True
    )
    return contamination_hits(corpus, bench, shingle=3)


def q_jaccard_pairs(sf_dir):
    """Exact n-gram JACCARD similarity join: pairs with
    |A∩B|/|A∪B| >= 0.2 over distinct 4-gram windows — the threshold form
    of the overlap join (the quantity MinHash approximates, computed
    exactly and SQL-verified; the division is exact integer→float64, so
    no rounding convention is needed)."""

    from geodistpy_ray.stages.dedup import jaccard_pair_join

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return jaccard_pair_join(docs, shingle=4, threshold=0.2)


def q_token_entropy(sf_dir):
    """Per-doc Shannon entropy of the token distribution (nats) — the
    repetition-vs-diversity quality signal; batch-local over the shared
    Arrow token front-end."""
    from geodistpy_ray.stages.text import token_entropy

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return token_entropy(docs)


def q_shingle_pairs(sf_dir):
    """Exact n-gram-overlap dedup join: doc pairs sharing >= 2 distinct
    full 4-gram token windows, with the exact shared-window count. Two
    bounded partitioned shuffles (window rows, then pair partials); pairs
    pre-aggregated before leaving the window partition. shingle=4 against
    the synthetic ~30-word vocabulary keeps the pair graph sparse
    (production corpora use 8-13-gram windows for the same reason)."""

    from geodistpy_ray.stages.dedup import shingle_overlap_pairs

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return shingle_overlap_pairs(docs, shingle=4, min_common=2)


def q_dup_clusters(sf_dir):
    """Near-dup pair graph → dedup CLUSTERS via distributed min-label
    propagation (the transitive-closure step every pair-emitting dedup
    stage needs before dropping rows). Edges: docs sharing >= 3 distinct
    4-gram windows; output labels each clustered doc with its component's
    minimum doc_id. Oracle: the same edge set closed under a recursive
    min-reachable CTE."""

    from geodistpy_ray.stages.dedup import shingle_overlap_pairs
    from geodistpy_ray.stages.graph import connected_components

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    edges = shingle_overlap_pairs(docs, shingle=4, min_common=3)
    return connected_components(edges, node_col="doc_id")


def q_seq_packing(sf_dir):
    """Concat-and-chunk sequence packing: documents concatenate in doc_id
    order and slice into 512-token packs; each non-empty doc's global token
    offset and pack span come from a distributed two-level ordered prefix
    sum (per-range partials → driver folds n_parts scalars → per-range
    scan) — the scalable form of SQL's ``SUM() OVER (ORDER BY ...)``."""
    from geodistpy_ray.stages.pack import pack_assignments

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return pack_assignments(docs, seq_len=512)


def q_capped_sources(sf_dir):
    """Cap over-represented sources: at most 10 docs per source, selected
    by deterministic id-hash rank (partition-independent, bit-reproducible
    — never arrival order). One bounded partitioned shuffle."""

    from geodistpy_ray.stages.text import cap_per_key

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "source"])
    return cap_per_key(docs, "source", k=10)


def q_dedup_lines(sf_dir):
    """Line/paragraph-level exact dedup (CCNet / RefinedWeb boilerplate
    removal): drop every text segment occurring in >= 2 distinct documents,
    keep surviving segments in order; docs whose every segment was
    boilerplate vanish. The synthetic corpus carries no newlines, so the
    query synthesizes line structure deterministically (every ' data '
    separator becomes a newline — mirrored verbatim by SQL ``replace``,
    both engines scan left-to-right non-overlapping) and the stage itself
    stays general."""
    import pyarrow.compute as pc

    from geodistpy_ray.stages.dedup import dedup_lines

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def with_lines(batch: pa.Table) -> pa.Table:
        t = pc.replace_substring(pc.fill_null(batch.column("text"), ""), " data ", "\n")
        return batch.set_column(batch.schema.get_field_index("text"), "text", t)

    docs = docs.map_batches(with_lines, batch_format="pyarrow", zero_copy_batch=True)
    return dedup_lines(docs, min_docs=2)


def q_dedup_spans(sf_dir):
    """Exact substring-span dedup (Lee et al. 2022, token-granular): every
    token covered by a 5-token window occurring in >= 2 distinct docs is
    removed from EVERY holder; survivors of lower(text) reassemble in
    order; fully-covered docs drop."""

    from geodistpy_ray.stages.dedup import dedup_spans

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return dedup_spans(docs, k=5, min_docs=2)


def q_balanced_langs(sf_dir):
    """Mixture balancing: deterministically downsample the dominant 'en'
    stratum to 20% while keeping every other language — same id-hash as
    sample_10pct, so stratum samples nest and never depend on
    partitioning."""

    from geodistpy_ray.stages.text import stratified_sample

    docs = _read(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    )
    return stratified_sample(docs, rates={"en": 20}, key_col="lang")


def q_lang_source_pivot(sf_dir):
    """Contingency pivot: per source, one count column per listed language
    + other_n + total — widened 0/1 columns ride the grouped_sum combiner,
    one short row per (key × batch) in the shuffle."""

    from geodistpy_ray.stages.relational import pivot_counts

    docs = _read(f"{sf_dir}/documents.parquet", columns=["source", "lang"])
    return pivot_counts(docs, key_col="source", pivot_col="lang", values=["en", "de", "fr"])


def q_pricing_rollup(sf_dir):
    """GROUP BY ROLLUP(l_returnflag, l_linestatus): finest level from ONE
    corpus pass (the grouped_sum combiner), coarser levels re-aggregate the
    finest RESULT — work proportional to distinct key combos."""

    from geodistpy_ray.stages.relational import rollup_sum

    li = _read(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity"],
    )
    return rollup_sum(
        li, ["l_returnflag", "l_linestatus"], int_sum_cols={"l_quantity": "sum_qty"}
    )


def q_qty_price_corr(sf_dir):
    """Per-returnflag Pearson correlation of quantity vs extended price —
    Chan-merged centered moments (the naive power-sum formula overflows
    double precision's useful range at this row count; see
    grouped_corr)."""

    from geodistpy_ray.stages.relational import grouped_corr

    li = _read(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )
    return grouped_corr(li, ["l_returnflag"], "l_quantity", "l_extendedprice")


def q_qty_price_covar(sf_dir):
    """Per-returnflag sample covariance (COVAR_SAMP parity) — rounded to
    2 decimals: covariance carries the data's squared magnitude (O(1e5)
    here), so 6 decimals would sit below the fp-accumulation noise floor
    of two differently-ordered exact computations."""

    from geodistpy_ray.stages.relational import grouped_covar

    li = _read(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )
    return grouped_covar(
        li, ["l_returnflag"], "l_quantity", "l_extendedprice", round_to=2
    )


def q_event_gaps(sf_dir):
    """Per-user inter-event gap in µs (NULL on each user's first event) —
    the LAG-delta feature behind session statistics; one bounded-partition
    co-location, vectorized diff with key-change positions nulled."""
    import pyarrow.compute as pc

    from geodistpy_ray.stages.windows import add_lag_delta

    ev = _read(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id"])
    out = add_lag_delta(ev, "user_id", "ts", tiebreak_col="event_id", out_col="gap_us")

    def project(t: pa.Table) -> pa.Table:
        gap = pc.cast(t.column("gap_us"), pa.int64())
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "event_id": t.column("event_id"),
                "gap_us": gap,
            }
        )

    return out.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)


def q_track_length(sf_dir):
    """Per-user geodesic track length — the LAG×kernel window composition:
    geocode each event (deterministic from event_id), order each user's
    points by (ts, event_id), haversine per consecutive leg, and sum legs
    as INTEGER millimeters (order-independent, exactly the SQL mirror's
    SUM over LAG pairs). One bounded-partition co-location; Arrow in/out."""
    from geodistpy_ray.stages import add_geocode
    from geodistpy_ray.stages.windows import geodesic_track_length

    ev = _read(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id"])
    pts = add_geocode(ev, id_col="event_id")
    return geodesic_track_length(
        pts, "user_id", "ts", tiebreak_col="event_id", kernel="haversine"
    )


def q_top_return_customers(sf_dir):
    """TPC-H Q10 shape: revenue of RETURNED line items per customer, top 20
    by revenue — returned lines reduce to (key, cents) at the read, ONE
    bucketed shuffle to orders, a PARTITIONED per-customer final (unbounded
    key domain), then the top-k combiner (never a global sort); names
    attach to the 20 survivors via a driver-bounded dimension lookup."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from geodistpy_ray.stages.joins import shuffle_equi_join
    from geodistpy_ray.stages.relational import global_topk, grouped_sum

    li = _read(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"],
    )

    def gate(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch.column("l_returnflag"), "R"))
        ep = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = t.column("l_discount").to_numpy(zero_copy_only=False)
        cents = np.floor(ep * (1.0 - disc) * 100.0 + 0.5).astype(np.int64)
        return pa.table(
            {"l_orderkey": t.column("l_orderkey"), "rev_cents": pa.array(cents, pa.int64())}
        )

    li = li.map_batches(gate, batch_format="pyarrow", zero_copy_batch=True)
    orders = _read(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    j = shuffle_equi_join(li, orders, "l_orderkey", "o_orderkey")
    per_cust = grouped_sum(
        j,
        ["o_custkey"],
        int_sum_cols={"rev_cents": "revenue_cents"},
        count_col="n_lines",
        final="partitioned",
    )
    top = global_topk(
        per_cust, ["revenue_cents", "o_custkey"], 20, descending=[True, False]
    )
    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"])
    out = top.merge(cust.to_pandas(), left_on="o_custkey", right_on="c_custkey")
    return out[["o_custkey", "c_name", "revenue_cents", "n_lines"]]


def q_geo_curated(sf_dir):
    """Geo×text curation capstone: geocode → polygon containment gate
    (PIP pairs → distinct ids → bucketed SEMI join carries the text
    payload only for survivors) → lang gate → exact dedup (keep-min-id
    per text) → per-cell counts of the kept docs. Every stage is
    SQL-mirrored, so the WHOLE composition is one value-hash check."""
    import pyarrow.compute as pc

    from geodistpy_ray.sources.polygons import diamond_polygons
    from geodistpy_ray.stages import add_cell, add_geocode, point_in_polygon_join
    from geodistpy_ray.stages.dedup import exact_dedup
    from geodistpy_ray.stages.joins import shuffle_equi_join
    from geodistpy_ray.stages.relational import distinct, grouped_sum

    pairs = point_in_polygon_join(
        _docs_geo(sf_dir), diamond_polygons(), id_col="doc_id", cell_deg=CELL_DEG
    )
    ids = distinct(pairs.select_columns(["doc_id"]), ["doc_id"])
    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])
    filtered = shuffle_equi_join(docs, ids, "doc_id", join_type="left semi")

    def lang_gate(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(batch.column("lang"), value_set=pa.array(["en", "de"]))
        return batch.filter(keep).drop_columns(["lang"])

    gated = filtered.map_batches(lang_gate, batch_format="pyarrow", zero_copy_batch=True)
    kept = exact_dedup(gated)  # (text_hash, keep_id, n_dups)
    cells = add_cell(
        add_geocode(kept.select_columns(["keep_id"]), id_col="keep_id"), CELL_DEG
    )
    return grouped_sum(cells, ["cell"], count_col="n_docs")


def q_value_outliers(sf_dir):
    """Per-user anomaly flags: events whose value deviates more than 2.5
    sample standard deviations from the user's mean — mean/std and the
    z-scores all computed inside ONE user-co-located partition (no
    cross-partition accumulation), users with a degenerate std dropped
    like the SQL mirror's NULLIF."""
    import pandas as pd

    from geodistpy_ray.stages.grouping import partitioned_map_groups

    ev = _read(f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "value"])

    def part_fn(g: pd.DataFrame) -> pd.DataFrame:
        grp = g.groupby("user_id")["value"]
        mu = grp.transform("mean")
        sd = grp.transform("std")  # ddof=1 == STDDEV_SAMP
        z = (g["value"] - mu) / sd
        keep = sd.gt(0) & z.abs().gt(2.5)
        out = g.loc[keep, ["user_id", "event_id"]].copy()
        out["z"] = z[keep].round(6)
        return out

    return partitioned_map_groups(ev, "user_id", part_fn)


def q_lang_samples(sf_dir):
    """EXACTLY-5 uniform docs per language — the per-stratum fixed-size
    eval-subset op (`sample_exact_k_per_key`): k smallest splitmix64 ids
    within each lang, partition-independent, within-stratum rank emitted."""
    from geodistpy_ray.stages.text import sample_exact_k_per_key

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])
    return sample_exact_k_per_key(docs, k=5, key_col="lang", id_col="doc_id")


def _lang_samples_sql() -> str:
    from geodistpy_ray.stages.text import splitmix64_sql

    steps, final = splitmix64_sql("doc_id")
    ctes, prev = [], "documents"
    for i, expr in enumerate(steps, 1):
        ctes.append(f"s{i} AS (SELECT doc_id, lang, {expr} AS z{i} FROM {prev})")
        prev = f"s{i}"
    return (
        "WITH " + ", ".join(ctes)
        + f" SELECT doc_id, lang, rank FROM (SELECT doc_id, lang, "
        f"CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY {final}, doc_id) "
        f"AS BIGINT) AS rank FROM {prev}) WHERE rank <= 5"
    )


def q_session_spans(sf_dir):
    """Full sessionization: per user, every 30-min-gap session's index,
    start/end µs and event count — the span form of the session COUNT op
    (`windows.py:session_spans`; one co-located sort + diff + cumsum)."""
    from geodistpy_ray.stages.windows import session_spans

    ev = _read(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id"])
    return session_spans(
        ev, "user_id", "ts", gap_us=1_800_000_000, tiebreak_col="event_id"
    )


def q_global_median(sf_dir):
    """Exact GLOBAL median via distributed selection (iterative histogram
    refinement, stages/relational.py:exact_order_stats) — ~2 streaming
    passes folding O(bins) driver scalars, never a global sort; SQL MEDIAN
    parity including the even-count two-middle average."""
    import pandas as pd

    from geodistpy_ray.stages.relational import global_median

    ev = _read(f"{sf_dir}/events.parquet", columns=["value"])
    return pd.DataFrame({"median_value": [global_median(ev, "value")]})


def q_source_dedup_ratio(sf_dir):
    """Per-source duplication profile: docs vs DISTINCT texts per source
    and the exact dup count — the corpus-health diagnostic before a dedup
    pass. Distinct (source, text-hash) rides the distributed distinct;
    the per-source rollup is bounded-domain."""
    import pandas as pd

    from geodistpy_ray.stages.dedup import add_text_hash
    from geodistpy_ray.stages.relational import distinct, grouped_sum

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"])
    hashed = add_text_hash(docs).select_columns(["source", "text_hash"])
    n_docs = grouped_sum(hashed, ["source"], count_col="n_docs")
    d = distinct(hashed, ["source", "text_hash"])
    n_uniq = grouped_sum(d, ["source"], count_col="n_distinct")
    out = n_docs.merge(n_uniq, on="source")
    out["n_dups"] = (out["n_docs"] - out["n_distinct"]).astype(np.int64)
    return out[["source", "n_docs", "n_distinct", "n_dups"]]


def q_user_first_last(sf_dir):
    """Per-user FIRST and LAST event (by ts, event_id) — the
    FIRST_VALUE/LAST_VALUE window pair, computed in one co-located
    partition per key span."""
    import pandas as pd

    from geodistpy_ray.stages.grouping import partitioned_map_groups

    ev = _read(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id"])

    def part_fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        agg = g.groupby("user_id", as_index=False).agg(
            first_event=("event_id", "first"), last_event=("event_id", "last")
        )
        agg["first_event"] = agg["first_event"].astype(np.int64)
        agg["last_event"] = agg["last_event"].astype(np.int64)
        return agg

    return partitioned_map_groups(ev, "user_id", part_fn)


def q_weekly_actives(sf_dir):
    """Rolling 7-day distinct active users per day — the windowed
    COUNT(DISTINCT) that does NOT decompose into partials: distinct
    (user, day) rows replicate to the 7 days they keep active (bounded
    ×7), then one day-partitioned exact distinct-count. Days are epoch
    day indices (integer µs // 86400e6), immune to calendar boundaries."""
    import pandas as pd

    from geodistpy_ray.stages.grouping import partitioned_map_groups
    from geodistpy_ray.stages.relational import distinct

    ev = _read(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def to_day(batch: pa.Table) -> pa.Table:
        us = batch.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
        day = us.to_numpy(zero_copy_only=False) // 86_400_000_000
        return pa.table(
            {"user_id": batch.column("user_id"), "day": pa.array(day, pa.int64())}
        )

    pairs = distinct(
        ev.map_batches(to_day, batch_format="pyarrow", zero_copy_batch=True),
        ["user_id", "day"],
    )
    active_days = set(
        r["day"]
        for r in pairs.map_batches(
            lambda t: pa.table(
                {"day": pa.array(np.unique(t.column("day").to_numpy(zero_copy_only=False)))}
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).take_all()
    )  # bounded: the day domain

    active_arr = np.array(sorted(active_days), dtype=np.int64)

    def spread(batch: pa.Table) -> pa.Table:
        u = batch.column("user_id").to_numpy(zero_copy_only=False)
        d = batch.column("day").to_numpy(zero_copy_only=False)
        n = u.size
        u7 = np.repeat(u, 7)
        d7 = np.repeat(d, 7) + np.tile(np.arange(7, dtype=np.int64), n)
        keep = np.isin(d7, active_arr)  # only report days with activity
        return pa.table(
            {"user_id": pa.array(u7[keep]), "day": pa.array(d7[keep], pa.int64())}
        )

    spreaded = pairs.map_batches(spread, batch_format="pyarrow", zero_copy_batch=True)

    def count_part(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("day", as_index=False)["user_id"].nunique()
        agg.columns = ["day", "n_active_7d"]
        agg["n_active_7d"] = agg["n_active_7d"].astype(np.int64)
        return agg

    return partitioned_map_groups(spreaded, "day", count_part)


def q_trending_daily(sf_dir):
    """Daily trending event types: the windowed top-k composition —
    day-keyed counts (partitioned final) → per-day top-3 with the exact
    deterministic tie-break."""
    from geodistpy_ray.stages.relational import add_day_key, grouped_sum, top_k_per_group

    ev = _read(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])
    ds = add_day_key(ev, "ts", "ymd").select_columns(["ymd", "event_type"])
    counts = grouped_sum(ds, ["ymd", "event_type"], count_col="n", final="partitioned")
    return top_k_per_group(
        counts, "ymd", "n", k=3, ascending=False, tiebreak_col="event_type"
    )


def q_cohort_retention(sf_dir):
    """Cohort retention matrix: users grouped by FIRST-event day, distinct
    active users per (cohort_day, activity_day). One distributed
    distinct on (user, day), then cohort assignment and the pair emit
    happen inside ONE user-co-located partition (min + transform — no
    second shuffle), finished by a bounded-domain day rollup."""
    import pandas as pd

    from geodistpy_ray.stages.grouping import partitioned_map_groups
    from geodistpy_ray.stages.relational import add_day_key, distinct, grouped_sum

    ev = _read(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    ds = add_day_key(ev, "ts", "ymd").select_columns(["user_id", "ymd"])
    d = distinct(ds, ["user_id", "ymd"])

    def part_fn(g: pd.DataFrame) -> pd.DataFrame:
        cm = g.groupby("user_id")["ymd"].transform("min")
        return pd.DataFrame(
            {"cohort_day": cm.to_numpy(), "activity_day": g["ymd"].to_numpy()}
        )

    pairs = partitioned_map_groups(d, "user_id", part_fn)
    return grouped_sum(pairs, ["cohort_day", "activity_day"], count_col="n_users")


def q_event_ranks(sf_dir):
    """Per-user ROW_NUMBER over the event log (ts, event_id ordering) —
    the rank-column window op behind "nth event per user" features."""
    from geodistpy_ray.stages.windows import add_rank

    ev = _read(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id"])
    out = add_rank(ev, "user_id", "ts", tiebreak_col="event_id", out_col="rnk")
    return out.select_columns(["user_id", "event_id", "rnk"])


def q_zonal_stats(sf_dir):
    """Zonal statistics — the vector-side raster↔vector aggregate: PIP
    join assigns each doc its polygon, one bucketed shuffle joins the
    doc payload back, a bounded rollup sums per polygon zone."""
    from geodistpy_ray.sources.polygons import diamond_polygons
    from geodistpy_ray.stages import point_in_polygon_join
    from geodistpy_ray.stages.joins import shuffle_equi_join
    from geodistpy_ray.stages.relational import grouped_sum

    pairs = point_in_polygon_join(
        _docs_geo(sf_dir), diamond_polygons(), id_col="doc_id", cell_deg=CELL_DEG
    )
    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"])
    joined = shuffle_equi_join(pairs, docs, "doc_id")
    return grouped_sum(
        joined, ["poly_id"], int_sum_cols={"n_chars": "sum_chars"}, count_col="n_docs"
    )


def q_simplified_tracks(sf_dir):
    """Douglas–Peucker simplification of each user's geocoded event track
    (50 km cross-track tolerance). Rows-only: the recursive split isn't
    SQL-expressible; the scalar-reference parity, deviation bound, and
    idempotence properties are pinned in tests/test_kernels.py."""
    from geodistpy_ray.stages import add_geocode
    from geodistpy_ray.stages.windows import simplify_tracks

    ev = _read(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id"])
    pts = add_geocode(ev, id_col="event_id")
    out = simplify_tracks(
        pts, "user_id", "ts", tol_m=50_000.0, tiebreak_col="event_id"
    )
    return out.select_columns(["user_id", "event_id"])


def q_densified_tracks(sf_dir):
    """Geodesic track densification (the distributed interpolate): legs
    over 5000 km gain slerp waypoints every ≤5000 km. The oracle rebuilds
    the ordered legs with ROW_NUMBER/LEAD and folds the SAME slerp trig
    term-for-term — the great-circle interpolation formula itself is
    value-hash-checked, not just row counts."""
    from geodistpy_ray.stages import add_geocode
    from geodistpy_ray.stages.windows import densify_tracks

    ev = _read(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id"])
    pts = add_geocode(ev, id_col="event_id")
    return densify_tracks(
        pts, "user_id", "ts", max_leg_m=5_000_000.0, tiebreak_col="event_id"
    )


def q_track_centroids(sf_dir):
    """Per-user track centroid (mean lat/lon) over an UNBOUNDED key domain
    — the partitioned-final twin of `cell_centroids`: integer micro-degree
    partials (order-independent sums) merged on hash partitions of the
    user, FLOOR(x+0.5) mean on both sides (the CLAUDE.md tie rule)."""
    from geodistpy_ray.stages import add_geocode

    ev = _read(f"{sf_dir}/events.parquet", columns=["user_id", "event_id"])
    pts = add_geocode(ev, id_col="event_id")
    out = _micro_centroid_sums(pts, "user_id", "n_pts", final="partitioned")

    def finish(batch: pa.Table) -> pa.Table:
        su = batch.column("sum_ulat").to_numpy(zero_copy_only=False)
        so = batch.column("sum_ulon").to_numpy(zero_copy_only=False)
        n = batch.column("n_pts").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "n_pts": batch.column("n_pts"),
                "clat": pa.array(_micro_mean(su, n), pa.float64()),
                "clon": pa.array(_micro_mean(so, n), pa.float64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def q_track_envelopes(sf_dir):
    """Per-user track bounding box + its geodesic diagonal — envelope
    min/max are fp-EXACT (no accumulation), so only the diagonal needs
    the rounding convention. One user-co-located partition, vectorized
    group min/max inside."""
    import pandas as pd

    from geodistpy_ray.kernels import haversine
    from geodistpy_ray.stages import add_geocode
    from geodistpy_ray.stages.grouping import partitioned_map_groups

    ev = _read(f"{sf_dir}/events.parquet", columns=["user_id", "event_id"])
    pts = add_geocode(ev, id_col="event_id")

    def part_fn(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("user_id", as_index=False, sort=False).agg(
            min_lat=("lat", "min"),
            max_lat=("lat", "max"),
            min_lon=("lon", "min"),
            max_lon=("lon", "max"),
        )
        diag = haversine(
            agg["min_lat"].to_numpy(),
            agg["min_lon"].to_numpy(),
            agg["max_lat"].to_numpy(),
            agg["max_lon"].to_numpy(),
        )
        agg["diag_km"] = np.round(diag / 1000.0, 6)
        return agg

    return partitioned_map_groups(pts, "user_id", part_fn)


def q_qty_price_fit(sf_dir):
    """Per-returnflag least-squares line price = slope·qty + intercept
    (REGR_SLOPE / REGR_INTERCEPT parity) from the same Chan-merged moments
    as the correlation row."""

    from geodistpy_ray.stages.relational import grouped_linfit

    li = _read(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )
    out = grouped_linfit(
        li, ["l_returnflag"], "l_quantity", "l_extendedprice", round_to=None
    )
    # rounding tracks magnitude: slope is O(1e4) → 6 decimals is fine;
    # intercept is O(1e5), where 6 decimals sits below the fp-accumulation
    # noise floor of two differently-ordered exact computations → cents
    out["slope"] = out["slope"].round(6)
    out["intercept"] = out["intercept"].round(2)
    return out


def q_pricing_cube(sf_dir):
    """GROUP BY CUBE(l_returnflag, l_linestatus): every SUBSET of the key
    columns from the one finest corpus pass (2^k grouping sets re-aggregate
    the finest result), GROUPING bitmask parity with DuckDB."""

    from geodistpy_ray.stages.relational import cube_sum

    li = _read(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity"],
    )
    return cube_sum(
        li, ["l_returnflag", "l_linestatus"], int_sum_cols={"l_quantity": "sum_qty"}
    )


def q_user_event_types(sf_dir):
    """Exact COUNT(DISTINCT ...) per key — the exact twin of the HLL
    per-key sketch (`approx_distinct`'s family): distributed distinct on
    (user_id, event_type), then a count per user with a DISTRIBUTED final
    (user_id is the canonical unbounded key — never a driver merge)."""

    from geodistpy_ray.stages.relational import distinct, grouped_sum

    ev = _read(f"{sf_dir}/events.parquet", columns=["user_id", "event_type"])
    return grouped_sum(
        distinct(ev, ["user_id", "event_type"]),
        ["user_id"],
        count_col="n_types",
        final="partitioned",
    )


def q_user_top_event(sf_dir):
    """Per-key mode: each user's most frequent event type (ties → smallest
    value, mirroring ROW_NUMBER ... ORDER BY COUNT(*) DESC, value). The
    shuffle moves pre-counted (key, value) pair rows, never raw events."""

    from geodistpy_ray.stages.relational import grouped_mode

    ev = _read(f"{sf_dir}/events.parquet", columns=["user_id", "event_type"])
    return grouped_mode(ev, "user_id", "event_type")


def q_longest_docs(sf_dir):
    """Global ORDER BY ... LIMIT k via the per-batch top-k combiner — never
    a corpus-wide sort shuffle; the order is total (id tie-break) so the
    result is deterministic."""

    from geodistpy_ray.stages.relational import global_topk

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"])
    return global_topk(docs, ["n_chars", "doc_id"], k=20, descending=[True, False])


def _curated_balanced(sf_dir):
    """Shared front of the curation compositions: language filter →
    quality gate (length + space-ratio band) → line-level boilerplate
    dedup → lang re-attach (bucketed join) → stratified mixture balance
    (en → 50%). Returns the balanced (doc_id, lang, clean_text) Dataset;
    SQL twin = ``_CURATED_CTE``'s ``bal``."""
    import pyarrow.compute as pc

    from geodistpy_ray.stages.dedup import dedup_lines
    from geodistpy_ray.stages.joins import shuffle_equi_join
    from geodistpy_ray.stages.text import add_quality_score, stratified_sample

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"])

    def lang_gate(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t.column("lang"), value_set=pa.array(["en", "de", "fr"])))

    gated = add_quality_score(
        docs.map_batches(lang_gate, batch_format="pyarrow", zero_copy_batch=True)
    )

    def quality_gate(t: pa.Table) -> pa.Table:
        from geodistpy_ray.stages.text import space_ratio_ppm

        nc = t.column("n_chars_q").to_numpy()
        ppm = space_ratio_ppm(t.column("n_spaces").to_numpy(), nc)
        mask = (nc >= 50) & (ppm >= 120000) & (ppm <= 250000)
        return t.filter(pa.array(mask)).select(["doc_id", "lang", "text"])

    gated = gated.map_batches(quality_gate, batch_format="pyarrow", zero_copy_batch=True)

    def with_lines(t: pa.Table) -> pa.Table:
        lines = pc.replace_substring(pc.fill_null(t.column("text"), ""), " data ", "\n")
        return t.set_column(t.schema.get_field_index("text"), "text", lines)

    clean = dedup_lines(
        gated.map_batches(with_lines, batch_format="pyarrow", zero_copy_batch=True)
        .select_columns(["doc_id", "text"]),
        min_docs=2,
    )
    labeled = shuffle_equi_join(
        clean, gated.select_columns(["doc_id", "lang"]), "doc_id", join_type="inner"
    )
    return stratified_sample(labeled, rates={"en": 50}, key_col="lang")


def q_curated_corpus(sf_dir):
    """The full RefinedWeb-style curation pipeline end to end, every stage
    streaming and every stage SQL-mirrored, so the WHOLE composition is
    value-hash-checked: the shared curated front (see _curated_balanced)
    → deterministic split assignment."""
    from geodistpy_ray.stages.text import add_split

    balanced = _curated_balanced(sf_dir)
    return add_split(balanced).select_columns(["doc_id", "lang", "split", "clean_text"])


def q_curated_packed(sf_dir):
    """The capstone composition: raw documents → curated corpus →
    training-pack assignments. The curated clean_text stream (every stage
    SQL-mirrored) concatenates in doc_id order and slices into 256-token
    packs via the distributed ordered prefix-sum — the whole raw-to-packs
    path is one value-hash check."""
    from geodistpy_ray.stages.pack import pack_assignments

    balanced = _curated_balanced(sf_dir).select_columns(["doc_id", "clean_text"])
    return pack_assignments(balanced, seq_len=256, text_col="clean_text")


def q_props_by_type(sf_dir):
    """JSON property-bag projection + aggregate: extract the integer ``k``
    field from the events ``props`` JSON column (one Arrow RE2 kernel,
    typed null when absent), then per-type sums via the partial+final
    combiner — the "parse once, aggregate typed" event-pipeline pattern."""
    from geodistpy_ray.stages.relational import grouped_sum
    from geodistpy_ray.stages.text import add_json_int_field

    ev = _read(f"{sf_dir}/events.parquet", columns=["event_type", "props"])
    ev = add_json_int_field(ev, "props", "k")
    return grouped_sum(
        ev, ["event_type"], int_sum_cols={"k": "sum_k"}, count_col="n"
    )


def q_first_event_hourly(sf_dir):
    """Windowed dedup: the FIRST event per (user, hour) — keep-one-per-
    window throttling (dedupe retries, one impression per user per window).
    Composite-key top-1 via the per-key combiner + partitioned rank final;
    ties on ts break by event_id, mirroring ROW_NUMBER ORDER BY ts,
    event_id."""
    import pyarrow.compute as pc

    from geodistpy_ray.stages.relational import top_k_per_group

    ev = _read(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id"])

    def with_hour(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t.column("ts"), pa.timestamp("us")), pa.int64())
        return t.append_column("hour", pc.divide(us, 3_600_000_000))

    ev = ev.map_batches(with_hour, batch_format="pyarrow", zero_copy_batch=True)

    def to_us(t: pa.Table) -> pa.Table:
        # int64 µs output column (the oracle's epoch_us) — drop rank
        us = pc.cast(pc.cast(t.column("ts"), pa.timestamp("us")), pa.int64())
        t = t.set_column(t.schema.get_field_index("ts"), "ts_us", us)
        return t.select(["user_id", "hour", "ts_us", "event_id"])

    first = top_k_per_group(
        ev, ["user_id", "hour"], "ts", k=1, ascending=True, tiebreak_col="event_id"
    )
    return first.map_batches(to_us, batch_format="pyarrow", zero_copy_batch=True)


def q_weighted_sample(sf_dir):
    """Quality-weighted deterministic downsampling: keep probability rises
    with document length (rate_ppm = min(1e6, n_chars·2000), i.e. certain
    keep at ≥ 500 chars) — the mixture op that biases a training sample
    toward higher-signal documents without an RNG. Integer-ppm rates keep
    the SQL mirror bit-exact."""
    import pyarrow.compute as pc

    from geodistpy_ray.stages.text import sample_by_rate

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"])

    def rate(t: pa.Table) -> pa.Table:
        r = pc.min_element_wise(
            pc.multiply_checked(pc.cast(t.column("n_chars"), pa.int64()), 2000),
            1_000_000,
        )
        return t.append_column("rate_ppm", r)

    rated = docs.map_batches(rate, batch_format="pyarrow", zero_copy_batch=True)
    return sample_by_rate(rated, "rate_ppm").select_columns(["doc_id", "n_chars"])


def q_above_median_docs(sf_dir):
    """Filter by a computed per-stratum threshold: per-language exact median
    of n_chars (co-located median stage — languages are a bounded key
    domain, so the ~6-row result is driver-collected and broadcast), then a
    streaming keep-above-threshold filter. The two-pass "dynamic cutoff"
    pattern a curation pipeline uses for quality gates."""
    import ray

    from geodistpy_ray.stages.broadcast import get_broadcast
    from geodistpy_ray.stages.relational import grouped_median

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"])
    med = grouped_median(
        docs.select_columns(["lang", "n_chars"]), "lang", "n_chars", out_col="med"
    )
    med_map = {r["lang"]: r["med"] for r in med.take_all()}
    ref = ray.put(med_map)

    def keep(t: pa.Table) -> pa.Table:
        import pandas as pd

        m = get_broadcast(ref)
        # null-lang rows map to NaN thresholds → comparison False → dropped,
        # matching the SQL inner join on lang
        thr = pd.Series(t.column("lang").to_numpy(zero_copy_only=False)).map(m)
        nc = t.column("n_chars").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(nc > thr.to_numpy(dtype=np.float64)))

    return docs.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def q_near_dedup(sf_dir):
    """End-to-end near-dedup: overlap pair graph → connected components →
    anti-join drops every non-representative (keeps each cluster's minimum
    doc_id). The drop side is O(duplicates) — at web scale that is a large
    fraction of the corpus, so the removal is a bucketed ANTI-JOIN shuffle,
    not a broadcast filter."""
    import pyarrow.compute as pc

    from geodistpy_ray.stages.dedup import shingle_overlap_pairs
    from geodistpy_ray.stages.graph import connected_components
    from geodistpy_ray.stages.joins import shuffle_equi_join

    docs = _read(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "n_chars"]
    )
    edges = shingle_overlap_pairs(docs, shingle=4, min_common=3)
    cc = connected_components(edges, node_col="doc_id")
    drops = cc.map_batches(
        lambda b: b.filter(pc.not_equal(b.column("cluster_id"), b.column("doc_id"))),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).select_columns(["doc_id"])
    return shuffle_equi_join(
        docs.select_columns(["doc_id", "n_chars"]), drops, "doc_id", join_type="left anti"
    )


def q_doc_clusters(sf_dir):
    """Distributed k-means over the embeddings table (document clustering
    for mixture balancing): bounded hash-rank sample + maximin seeding,
    then Lloyd iterations where each pass broadcasts the centroids and
    shuffles only (centroid × batch) partial-sum rows. Iterative algorithm
    → no SQL oracle; convergence, recovery and partition independence are
    pinned in tests/test_cluster.py."""

    from geodistpy_ray.stages.cluster import kmeans_assign, kmeans_fit

    emb = _read(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    c, _ = kmeans_fit(emb, k=8, iters=4)
    return kmeans_assign(emb, c).select_columns(["vec_id", "cluster"])


def q_semdedup(sf_dir):
    """SemDeDup (Abbas et al. 2023): k-means the embedding corpus, then
    within each cluster drop every row whose cosine similarity to an
    earlier-ordered row (similarity-to-centroid ascending — keep the
    edge examples) reaches the threshold. Centroids broadcast once, ONE
    bounded hash-partition shuffle on the cluster id, per-cluster sweeps
    vectorized in cache-resident chunks with a mega-cluster guard.
    k-means is iterative → no SQL oracle; the keep rule is pinned against
    a scalar reference and partition-independence in tests/test_cluster.py
    (rows-only here: every input row returns with a keep flag)."""

    from geodistpy_ray.stages.cluster import kmeans_fit, semantic_dedup

    emb = _read(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    c, _ = kmeans_fit(emb, k=8, iters=4)
    return semantic_dedup(emb, c, eps=NEAR_DUP_T)


def q_geo_dbscan(sf_dir):
    """Geodesic DBSCAN over the geocoded documents: density clusters under
    a 150 km ε-radius and min_pts=3 (neighborhood counts the point itself,
    the sklearn convention). Border assignment is DETERMINISTIC (minimum
    core-neighbor cluster id — exactly SQL MIN, unlike sklearn's
    scan-order rule); noise is absent. Composed entirely from proven
    bounded exchanges: close_pairs ε-graph → partitioned degree count →
    two semi-joins (core subgraph) → connected_components →
    anti+inner join + partitioned MIN (borders). Oracle: O(n²) ε-self-join
    + recursive min-reachable CTE over the core subgraph."""
    from geodistpy_ray.stages.cluster import geo_dbscan

    return geo_dbscan(
        _docs_geo(sf_dir), PAIR_DIST_M, 3, kernel="haversine", cell_deg=CELL_DEG
    )


def q_stay_points(sf_dir):
    """Trajectory stay-point detection over each user's geocoded event
    stream: maximal runs of consecutive points whose every leg stays
    within 600 km, kept when the run spans >= 6 h and >= 2 points —
    start/end/duration (exact int64 µs) + the run centroid (shared integer
    micro-degree tie rule). Legs compare in integer millimeters on both
    sides, so the break decision is bit-identical to the SQL LAG mirror."""
    from geodistpy_ray.stages import add_geocode
    from geodistpy_ray.stages.windows import stay_points

    ev = _read(f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "ts"])
    pts = add_geocode(ev, id_col="event_id")
    return stay_points(
        pts,
        STAY_EPS_M,
        STAY_MIN_DUR_US,
        key_col="user_id",
        ts_col="ts",
        tiebreak_col="event_id",
    )


def q_user_p90_sketch(sf_dir):
    """Per-key quantile via the FIXED-SIZE mergeable summary (the scale
    path for unbounded per-key cardinality — shuffles <= 16·b bytes per
    (key × batch) instead of every raw value). Approximate within a
    documented rank bound → rows-only; the exact twin is user_p90_value."""

    from geodistpy_ray.stages.sketches import grouped_quantile_sketch

    ev = _read(f"{sf_dir}/events.parquet", columns=["user_id", "value"])
    ds = grouped_quantile_sketch(ev, "user_id", "value", q=0.9, b=64, out_col="p90_approx")
    return _round_col(ds, "p90_approx", 6)


def q_user_median_value(sf_dir):

    from geodistpy_ray.stages.relational import grouped_median

    ev = _read(f"{sf_dir}/events.parquet", columns=["user_id", "value"])
    ds = grouped_median(ev, "user_id", "value", out_col="median_value")
    return _round_col(ds, "median_value", 6)


def q_rolling_counts(sf_dir):
    import pyarrow.compute as pc

    from geodistpy_ray.stages.windows import rolling_count

    ev = _read(f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "ts"])
    small = ev.map_batches(
        lambda t: t.filter(pc.less(t["user_id"], 30)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    ds = rolling_count(small, "user_id", "ts", 6 * 3_600_000_000, tiebreak_col="event_id")
    return ds.select_columns(["user_id", "event_id", "n_in_window"])


def q_running_totals(sf_dir):
    import pyarrow.compute as pc

    from geodistpy_ray.stages.relational import running_total

    ev = _read(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "ts", "value"]
    )
    small = ev.map_batches(
        lambda t: t.filter(pc.less(t["user_id"], 20)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    ds = running_total(small, "user_id", "ts", "value", tiebreak_col="event_id")
    return ds.select_columns(["user_id", "event_id", "running_cents"])


def q_events_union(sf_dir):
    """Explicit Dataset.union of two filtered streams (clicks ∪ purchases)."""
    joined = _events_by_type(sf_dir, "click").union(_events_by_type(sf_dir, "purchase"))
    return joined.select_columns(["event_id", "user_id"])


DIMWISE_MAX_ID = 40


def q_dimwise_pairs(sf_dir):
    """D9 ``geodist_dimwise_harvesine`` as a pair table over a bounded subset:
    per-dimension squared metric (lat m², lon m², extra dim = squared
    n_chars delta), broadcast-cdist shape (no N×N materialization)."""
    import pyarrow.compute as pc
    import ray

    from geodistpy_ray.functions.geocode import geocode_ids
    from geodistpy_ray.kernels.sphere import haversine_dimwise_sq
    from geodistpy_ray.stages.broadcast import get_broadcast

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"])
    docs = docs.map_batches(
        lambda t: t.filter(pc.less(t["doc_id"], DIMWISE_MAX_ID)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    # build the broadcast b-side from the TABLE, not np.arange: the oracle's
    # b-side is `documents WHERE doc_id < N`, and the two relations must
    # stay equal even on a fixture whose doc_ids are not contiguous from 0
    import pyarrow.parquet as pq

    ids_b = np.sort(
        pq.read_table(
            f"{sf_dir}/documents.parquet", columns=["doc_id"],
            filters=[("doc_id", "<", DIMWISE_MAX_ID)],
        )
        .column("doc_id")
        .to_numpy()
    ).astype(np.int64)
    blat, blon = geocode_ids(ids_b)
    side = ray.put({"id": ids_b, "lat": blat, "lon": blon})

    def pairs(batch: pa.Table) -> pa.Table:
        b = get_broadcast(side)
        aid = batch.column("doc_id").to_numpy()
        alat, alon = geocode_ids(aid)
        # broadcast cdist: rows a × broadcast side b, keep a.id < b.id
        dlat2, dlon2 = haversine_dimwise_sq(
            alat[:, None], alon[:, None], b["lat"][None, :], b["lon"][None, :]
        )
        mask = aid[:, None] < b["id"][None, :]
        ai, bi = np.nonzero(mask)
        return pa.table(
            {
                "id_a": aid[ai],
                "id_b": b["id"][bi],
                "dlat_km2": np.round(dlat2[ai, bi] / 1e6, 3),
                "dlon_km2": np.round(dlon2[ai, bi] / 1e6, 3),
            }
        )

    return docs.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True)


def q_audio_features(sf_dir):

    from geodistpy_ray.stages.media import decode_audio, extract_audio_features

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def to_payload(batch: pa.Table) -> pa.Table:
        # (t or "") keeps a NULL text deterministic (empty payload) instead
        # of crashing the actor pool on t.encode()
        payload = [(t or "").encode() for t in batch.column("text").to_pylist()]
        return batch.append_column("payload", pa.array(payload, pa.binary()))

    ds = docs.map_batches(to_payload, batch_format="pyarrow", zero_copy_batch=True)
    ds = decode_audio(ds, payload_col="payload", concurrency=(1, 2))
    ds = extract_audio_features(ds, concurrency=(1, 2))
    return ds.select_columns(["doc_id", "audio_sr", "n_samples", "audio_feat"])


def q_video_pipeline(sf_dir):
    """Composed multimodal pipeline: synthetic frame table (video_id,
    frame_no, payload) → keyed frame sampling → decode → resize → features.
    Codecs are deterministic fakes (no media libs here); the Ray-side
    plumbing — schemas, batching, actor lifecycle, composition — is real."""

    from geodistpy_ray.stages.media import (
        decode_images,
        extract_image_features,
        resize_images,
        sample_frames_keyed,
    )

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def to_frames(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        # (t or "") keeps a NULL text deterministic (empty payload) instead
        # of crashing the actor pool on t.encode()
        payload = [(t or "").encode() for t in batch.column("text").to_pylist()]
        return pa.table(
            {
                "video_id": ids // 10,
                "frame_no": ids % 10,
                "payload": pa.array(payload, pa.binary()),
            }
        )

    ds = docs.map_batches(to_frames, batch_format="pyarrow", zero_copy_batch=True)
    ds = sample_frames_keyed(ds, "frame_no", every_n=2)
    ds = decode_images(ds, payload_col="payload", concurrency=(1, 2))
    ds = resize_images(ds, factor=2)
    ds = extract_image_features(ds, concurrency=(1, 2))
    return ds.select_columns(["video_id", "frame_no", "img_h", "img_w", "img_feat"])


def q_revenue_heatmap(sf_dir):
    """Geo × relational composition: geocode orders by customer key, roll
    revenue up into grid cells — the 'heat map' shape of the north-star
    pipeline, fully oracle-checked."""

    from geodistpy_ray.stages import add_cell, add_geocode
    from geodistpy_ray.stages.relational import grouped_sum

    orders = _read(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"])
    ds = add_cell(add_geocode(orders, id_col="o_custkey"), CELL_DEG)
    return grouped_sum(
        ds, ["cell"], cent_sum_cols={"o_totalprice": "revenue_cents"}, count_col="n_orders"
    )


def q_q1_pricing(sf_dir):

    from geodistpy_ray.stages.relational import grouped_sum

    li = _read(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
    )
    return grouped_sum(
        li,
        ["l_returnflag", "l_linestatus"],
        int_sum_cols={"l_quantity": "sum_qty"},
        cent_sum_cols={"l_extendedprice": "sum_price_cents"},
        count_col="n",
    )


def q_top_customers(sf_dir):
    """Top 10 customers by total order value — per-customer sums finalize
    PARTITIONED (o_custkey is an unbounded key domain; a driver final
    would ship every customer's partials and full-sort them for a top-10),
    then the top-k combiner picks the survivors; the name attaches via a
    driver-bounded dimension lookup, the same shape as Q10."""
    import pyarrow.parquet as pq

    from geodistpy_ray.stages.relational import global_topk, grouped_sum

    orders = _read(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"])
    agg = grouped_sum(
        orders,
        ["o_custkey"],
        cent_sum_cols={"o_totalprice": "total_cents"},
        count_col="n_orders",
        final="partitioned",
    )
    top = global_topk(agg, ["total_cents", "o_custkey"], 10, descending=[True, False])
    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"])
    out = top.merge(cust.to_pandas(), left_on="o_custkey", right_on="c_custkey")
    return out[["c_custkey", "c_name", "total_cents", "n_orders"]].reset_index(drop=True)


def q_orders_by_month(sf_dir):

    from geodistpy_ray.stages.relational import add_month_key, grouped_sum

    orders = _read(f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_totalprice"])
    ds = add_month_key(orders, "o_orderdate", "ym")
    return grouped_sum(ds, ["ym"], cent_sum_cols={"o_totalprice": "sum_cents"}, count_col="n_orders")


def q_events_agg(sf_dir):
    import pandas as pd

    from geodistpy_ray.stages.grouping import partitioned_map_groups
    from geodistpy_ray.stages.relational import grouped_sum

    ev = _read(f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "value"])
    # user_id is unbounded at scale → ONE distributed shuffle: per-batch
    # (user, type) partials go straight to a hash partition of user_id and
    # the per-user rollup happens vectorized inside each partition. No
    # driver-side merge anywhere on this path.
    partials = grouped_sum(
        ev,
        ["user_id", "event_type"],
        cent_sum_cols={"value": "sum_value_cents"},
        count_col="n",
        final="partials",
    )

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        # partials carry one row per (user, type, input batch): sums add up
        # across batches and nunique collapses the per-batch repeats
        return g.groupby("user_id", as_index=False).agg(
            n_events=("n", "sum"),
            n_types=("event_type", "nunique"),
            sum_value_cents=("sum_value_cents", "sum"),
        )

    return partitioned_map_groups(partials, "user_id", per_user)


def q_events_hourly(sf_dir):

    from geodistpy_ray.stages.windows import tumbling_window_agg

    ev = _read(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"])
    return tumbling_window_agg(ev, "user_id", "ts", 3_600_000_000, value_col="value")


def q_sessions(sf_dir):

    from geodistpy_ray.stages.windows import sessionize

    ev = _read(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id"])
    return sessionize(ev, "user_id", "ts", 1_800_000_000, order_tiebreak_col="event_id")


LATE_WATERMARK_US = 30 * 24 * 3_600_000_000  # 30-day lateness allowance


def q_late_events(sf_dir):

    from geodistpy_ray.stages.windows import late_event_stats

    ev = _read(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    return late_event_stats(ev, "user_id", "ts", LATE_WATERMARK_US)


EPOCH_2024_US = 1_704_067_200_000_000  # 2024-01-01 00:00:00 UTC in µs
RANGE_STEP_US = 66 * 3_600_000_000
RANGE_LEN_US = 72 * 3_600_000_000
N_RANGES = 10


def q_order_lines_join(sf_dir):

    from geodistpy_ray.stages.joins import shuffle_equi_join

    orders = _read(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"])
    li = _read(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_linenumber", "l_quantity"]
    )
    return shuffle_equi_join(orders, li, "o_orderkey", "l_orderkey")


def q_bloom_join(sf_dir):
    """Bloom-prefiltered shuffle join: the urgent-orders key set is folded
    into a Bloom bitmap (one streaming pass, OR-merged — no false negatives)
    and the 4x-larger lineitem side is pruned to ~matching rows BEFORE the
    all-to-all exchange. Result is bit-identical to the plain join (leaked
    false positives still fail the real key match), which the oracle checks.
    """
    import pyarrow.compute as pc

    from geodistpy_ray.stages.joins import shuffle_equi_join
    from geodistpy_ray.stages.relational import grouped_sum

    li = _read(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_linenumber", "l_quantity"]
    )
    urgent = _read(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    ).map_batches(
        lambda t: t.filter(pc.equal(t["o_orderpriority"], "1-URGENT")).select(
            ["o_orderkey"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    joined = shuffle_equi_join(
        li, urgent, "l_orderkey", "o_orderkey", bloom_prefilter="left", bloom_bits_log2=20
    )
    return grouped_sum(
        joined, ["l_linenumber"], int_sum_cols={"l_quantity": "sum_qty"}, count_col="n"
    )


def q_redacted_texts(sf_dir):
    """PII scrub (emails / IPv4 / phone spans → typed placeholders) as
    chained Arrow RE2 kernels. The synthetic corpus carries no PII, so the
    query appends a deterministic PII footer built from doc_id — mirrored
    verbatim in the SQL — and the redaction provably fires on every row."""
    import pandas as pd
    import pyarrow.compute as pc

    from geodistpy_ray.stages.text import redact_pii

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def with_footer(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        footer = (
            " contact user"
            + pd.Series(ids.astype(str))
            + "@mail.example from 10.0."
            + pd.Series((ids % 256).astype(str))
            + ".7 call +1 (555) 010-"
            + pd.Series((1000 + ids % 9000).astype(str))
        )
        combined = pc.binary_join_element_wise(
            pc.fill_null(batch.column("text"), ""), pa.array(footer, pa.string()), ""
        )
        return pa.table({"doc_id": batch.column("doc_id"), "text": combined})

    docs = docs.map_batches(with_footer, batch_format="pyarrow", zero_copy_batch=True)
    return redact_pii(docs, "text", out_col="redacted").select_columns(
        ["doc_id", "redacted"]
    )


def q_heavy_custkeys(sf_dir):
    """Exact heavy hitters over an unbounded key domain in O(k) driver
    memory: Misra-Gries candidate pass (mergeable summaries, tracked error)
    + exact broadcast-verify pass. threshold 1/1024 is a power of two, so
    the engine's float threshold and the SQL mirror's DOUBLE threshold are
    the same exact value."""

    from geodistpy_ray.stages.sketches import heavy_hitters

    orders = _read(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
    return heavy_hitters(orders, "o_custkey", threshold_frac=1.0 / 1024.0)


def q_mktsegment_revenue(sf_dir):
    import pyarrow.parquet as pq

    from geodistpy_ray.stages.joins import broadcast_join
    from geodistpy_ray.stages.relational import grouped_sum

    orders = _read(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"])
    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
    joined = broadcast_join(orders, cust, "o_custkey", right_keys="c_custkey")
    return grouped_sum(
        joined, ["c_mktsegment"], cent_sum_cols={"o_totalprice": "sum_cents"}, count_col="n_orders"
    )


def q_regional_revenue(sf_dir):
    """TPC-H Q5 shape — the 6-table multiway join: customer ⋈ orders ⋈
    lineitem ⋈ supplier ⋈ nation ⋈ region with the same-nation coupling,
    a region gate and an order-date window, revenue cents per nation.

    Scale shape: dimension prep (region × nation × supplier — the three
    genuinely small tables) happens once on the driver and broadcasts;
    the two fact exchanges are the plan's only shuffles, each pruned
    BEFORE it ships (orders date-filtered at the read, lineitem reduced
    to (key, rev_cents) so no payload floats ride the exchange; the inner
    broadcast against ASIA-only suppliers drops non-matching lineitem
    rows before the second shuffle's probe side is consumed downstream)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from geodistpy_ray.stages.joins import broadcast_join, shuffle_equi_join
    from geodistpy_ray.stages.relational import grouped_sum

    # bounded dimension prep: 5 regions × 25 nations × |supplier| rows
    region = pq.read_table(f"{sf_dir}/region.parquet")
    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    asia = region.filter(pc.equal(region.column("r_name"), "ASIA"))
    nat = nation.join(
        asia.select(["r_regionkey"]),
        keys="n_regionkey",
        right_keys="r_regionkey",
        join_type="inner",  # pa.Table.join defaults to LEFT OUTER
    )
    supp = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    supp = supp.join(
        nat.select(["n_nationkey", "n_name"]),
        keys="s_nationkey",
        right_keys="n_nationkey",
        join_type="inner",
    )

    lo = np.datetime64("1996-01-01", "us").astype(np.int64)
    hi = np.datetime64("1998-01-01", "us").astype(np.int64)

    orders = _read(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def date_gate(batch: pa.Table) -> pa.Table:
        us = batch.column("o_orderdate").cast(pa.timestamp("us")).cast(pa.int64())
        keep = pc.and_(pc.greater_equal(us, lo), pc.less(us, hi))
        return batch.filter(keep).drop_columns(["o_orderdate"])

    orders = orders.map_batches(date_gate, batch_format="pyarrow", zero_copy_batch=True)
    cust = _read(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    oc = shuffle_equi_join(orders, cust, "o_custkey", "c_custkey")

    li = _read(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def to_cents(batch: pa.Table) -> pa.Table:
        ep = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = batch.column("l_discount").to_numpy(zero_copy_only=False)
        cents = np.floor(ep * (1.0 - disc) * 100.0 + 0.5).astype(np.int64)
        return pa.table(
            {
                "l_orderkey": batch.column("l_orderkey"),
                "l_suppkey": batch.column("l_suppkey"),
                "rev_cents": pa.array(cents, pa.int64()),
            }
        )

    li = li.map_batches(to_cents, batch_format="pyarrow", zero_copy_batch=True)
    li = broadcast_join(li, supp, "l_suppkey", right_keys="s_suppkey")  # ASIA-only
    joined = shuffle_equi_join(li, oc, "l_orderkey", "o_orderkey")

    def same_nation(batch: pa.Table) -> pa.Table:
        keep = pc.equal(
            batch.column("c_nationkey").cast(pa.int64()),
            batch.column("s_nationkey").cast(pa.int64()),
        )
        return batch.filter(keep)

    joined = joined.map_batches(same_nation, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_sum(
        joined, ["n_name"], int_sum_cols={"rev_cents": "revenue_cents"}, count_col="n_lines"
    )


def _events_by_type(sf_dir, etype, rename=None):
    import pyarrow.compute as pc

    ev = _read(f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "event_type"])

    def fn(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch.column("event_type"), etype)).drop_columns(["event_type"])
        if rename:
            t = t.rename_columns([rename.get(c, c) for c in t.column_names])
        return t

    return ev.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def q_colocation(sf_dir):
    """Spatiotemporal co-location join: click events of DIFFERENT users
    within 150 km AND 24 h of each other — the "who was near whom, when"
    self-join, exactly-once over (cell × time-bucket) groups
    (stages/pairs.py:colocation_pairs)."""
    from geodistpy_ray.stages import add_geocode
    from geodistpy_ray.stages.pairs import colocation_pairs

    import pandas as pd

    pts = _events_by_type(sf_dir, "click")
    pts = add_geocode(pts, id_col="event_id")
    out = colocation_pairs(
        pts, PAIR_DIST_M, 24 * 3600 * 1_000_000, cell_deg=CELL_DEG
    )
    df = _round_col(out, "dist", 6, out="dist_km", div=1000.0).to_pandas()
    if df.empty:  # all-empty datasets lose their schema (known Ray behavior)
        df = pd.DataFrame(
            {
                "id_left": pd.Series(dtype=np.int64),
                "id_right": pd.Series(dtype=np.int64),
                "dist_km": pd.Series(dtype=np.float64),
                "dt_us": pd.Series(dtype=np.int64),
            }
        )
    return df


def q_asof_click_view(sf_dir):
    from geodistpy_ray.stages.joins import asof_join

    clicks = _events_by_type(sf_dir, "click")
    views = _events_by_type(sf_dir, "view", rename={"event_id": "view_id"})
    joined = asof_join(clicks, views, key="user_id", ts="ts")
    return joined.select_columns(["event_id", "view_id"])


def q_range_buckets(sf_dir):

    from geodistpy_ray.stages.joins import range_join_broadcast

    ev = _read(f"{sf_dir}/events.parquet", columns=["event_id", "ts"])

    def to_us(batch: pa.Table) -> pa.Table:
        # µs cast FIRST (CLAUDE.md timestamps rule): a ns-typed ts cast
        # straight to int64 silently yields nanoseconds
        return batch.append_column(
            "ts_us", batch.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
        )

    ev = ev.map_batches(to_us, batch_format="pyarrow", zero_copy_batch=True)
    los = EPOCH_2024_US + np.arange(N_RANGES, dtype=np.int64) * RANGE_STEP_US
    ranges = pa.table(
        {
            "range_id": np.arange(N_RANGES, dtype=np.int64),
            "lo": los,
            "hi": los + RANGE_LEN_US,
        }
    )
    out = range_join_broadcast(ev, ranges, value_col="ts_us")
    return out.select_columns(["range_id", "event_id"])


def q_gc_dist_to_origin(sf_dir):
    from geodistpy_ray.stages import add_distance_to_point

    ds = add_distance_to_point(_docs_geo(sf_dir), ORIGIN, kernel="great_circle", out_col="dist_km")
    ds = _round_col(ds, "dist_km", 6, div=1000.0)
    return ds.select_columns(["doc_id", "dist_km"])


def q_distinct_parts(sf_dir):

    from geodistpy_ray.stages.relational import distinct

    li = _read(f"{sf_dir}/lineitem.parquet", columns=["l_partkey"])
    return distinct(li, ["l_partkey"], final="shuffle")


def q_semi_open_orders(sf_dir):
    import pyarrow.compute as pc

    from geodistpy_ray.stages.joins import shuffle_equi_join

    cust = _read(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"])
    orders = _read(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderstatus"])
    open_orders = orders.map_batches(
        lambda t: t.filter(pc.equal(t["o_orderstatus"], "P")).select(["o_custkey"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return shuffle_equi_join(cust, open_orders, "c_custkey", "o_custkey", join_type="left semi")


def q_anti_max_qty(sf_dir):
    import pyarrow.compute as pc

    from geodistpy_ray.stages.joins import shuffle_equi_join

    part = _read(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name"])
    li = _read(f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_quantity"])
    heavy = li.map_batches(
        lambda t: t.filter(pc.greater(t["l_quantity"], 49.0)).select(["l_partkey"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return shuffle_equi_join(part, heavy, "p_partkey", "l_partkey", join_type="left anti")


def q_outer_join(sf_dir):
    """Full outer join of two derived sides with exclusives on BOTH (big
    spenders without high balances, and vice versa): exercises the
    bucket-safe null padding of the shuffle join end to end."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from geodistpy_ray.stages.joins import shuffle_equi_join
    from geodistpy_ray.stages.relational import cents, grouped_sum

    orders = _read(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"])
    big_rows = orders.map_batches(
        lambda t: t.filter(pc.greater(t["o_totalprice"], 400000.0)).select(["o_custkey"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    big = grouped_sum(big_rows, ["o_custkey"], count_col="n_big", final="partitioned")

    def rich_rows(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["c_acctbal"], 5000.0))
        return pa.table(
            {
                "c_custkey": t["c_custkey"],
                "bal_cents": pa.array(cents(t["c_acctbal"].to_numpy()), pa.int64()),
            }
        )

    rich = _read(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_acctbal"]).map_batches(
        rich_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    return shuffle_equi_join(big, rich, "o_custkey", "c_custkey", join_type="full outer")


def q_approx_distinct(sf_dir):
    """HLL approximate distinct event ids (one pass, no shuffle) next to the
    exact count — returned as a single row so the driver records it."""
    import pandas as pd

    from geodistpy_ray.stages.relational import distinct
    from geodistpy_ray.stages.sketches import approx_distinct_count

    ev = _read(f"{sf_dir}/events.parquet", columns=["event_id"])
    est = approx_distinct_count(ev, "event_id", p=14)
    # true COUNT(DISTINCT), not a row count — event_id happens to be unique
    # in this fixture, but the comparison must stay honest under duplicates
    exact = distinct(ev, ["event_id"]).count()
    return pd.DataFrame(
        {"approx_distinct": [round(float(est))], "exact_distinct": [int(exact)]}
    )


def q_top_events_per_user(sf_dir):

    from geodistpy_ray.stages.relational import top_k_per_group

    ev = _read(f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "value"])
    out = top_k_per_group(ev, "user_id", "value", k=3, ascending=False, tiebreak_col="event_id")
    return out.select_columns(["user_id", "event_id", "rank"])


def q_hopping_windows(sf_dir):

    from geodistpy_ray.stages.windows import hopping_window_agg

    ev = _read(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"])
    return hopping_window_agg(
        ev, "user_id", "ts", window_us=3 * 3_600_000_000, hop_us=3_600_000_000, value_col="value"
    )


HOP_OFFSET_US = 17 * 60 * 1_000_000  # 17-minute grid shift (unaligned)


def q_hopping_offset(sf_dir):
    """Hopping windows on an UNALIGNED grid: the window lattice is shifted
    by 17 minutes, exercising the offset_us parameter end to end."""

    from geodistpy_ray.stages.windows import hopping_window_agg

    ev = _read(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"])
    return hopping_window_agg(
        ev, "user_id", "ts", window_us=3 * 3_600_000_000, hop_us=3_600_000_000,
        value_col="value", offset_us=HOP_OFFSET_US,
    )


def q_normalized_texts(sf_dir):

    from geodistpy_ray.stages.text import add_normalized_text

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return add_normalized_text(docs).select_columns(["doc_id", "norm_text"])


def q_filter_project(sf_dir):
    import pyarrow.compute as pc

    li = _read(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey", "l_quantity"]
    )
    return li.map_batches(
        lambda t: t.filter(pc.greater(t["l_quantity"], 45.0)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _center_pairs_ds(n_pairs):
    """Dataset of (pair_id, lat1, lon1, lat2, lon2) from deterministic centers."""
    import ray.data as rd

    from geodistpy_ray.functions.geocode import center_latlon

    clat, clon = center_latlon(np.arange(2 * n_pairs))
    return rd.from_arrow(
        pa.table(
            {
                "pair_id": np.arange(n_pairs, dtype=np.int64),
                "lat1": clat[0::2],
                "lon1": clon[0::2],
                "lat2": clat[1::2],
                "lon2": clon[1::2],
            }
        )
    )


def q_interpolate(sf_dir):
    from geodistpy_ray.stages.geo import interpolate_waypoints

    ds = interpolate_waypoints(_center_pairs_ds(10), n_points=4)
    return ds.select_columns(["pair_id", "seq", "lat", "lon"])


def q_destinations(sf_dir):
    import ray.data as rd

    from geodistpy_ray.functions.geocode import center_latlon
    from geodistpy_ray.stages.geo import add_destination

    clat, clon = center_latlon(np.arange(20))
    centers = rd.from_arrow(
        pa.table({"center_id": np.arange(20, dtype=np.int64), "lat": clat, "lon": clon})
    )
    ds = add_destination(centers, bearing=45.0, distance=100.0, metric="km")
    return ds.select_columns(["center_id", "lat2", "lon2"])


def queries() -> dict[str, Callable[[str], Any]]:
    # Ordering contract: every oracle-SQL-matched query comes BEFORE the
    # rows-only ones, and within the oracle block every UNIQUE operator's
    # row comes before redundant variants and compositions. The driver
    # records only the first ~50 entries of this dict in
    # CORRECTNESS_r{N}.json, so the first 50 must cover each operator's only
    # value-hash check: `order_lines_join` (the only plain inner shuffle-join
    # row) and `late_events` (the only watermark row) sit inside the window,
    # while `hopping_offset` (re-tests hopping_windows' operator with a
    # shifted lattice) and `sample_10pct` (same deterministic-hash mechanism
    # as dataset_splits) sit just past it — still verified every round by
    # scripts/check_oracle.py, just not driver-recorded.
    return {
        "geocode_cells": q_geocode_cells,
        "cell_counts": q_cell_counts,
        "dist_to_origin": q_dist_to_origin,
        "radius_join": q_radius,
        "knn": q_knn,
        "knn_indexed": q_knn_indexed,
        "pip_join": q_pip,
        "polar_caps": q_polar_caps,
        "bearing_origin": q_bearing,
        "dist_table": q_dist_table,
        "close_pairs": q_close_pairs,
        "dedup_exact": q_dedup_exact,
        "token_counts": q_token_counts,
        "quality": q_quality,
        "ann_topk": q_ann_topk,
        "embed_near_dup": q_embed_near_dup,
        "dimwise_pairs": q_dimwise_pairs,
        "events_union": q_events_union,
        "user_value_range": q_user_value_range,
        "cell_doc_lists": q_cell_doc_lists,
        "dataset_splits": q_dataset_splits,
        "user_p90_value": q_user_p90_value,
        "running_totals": q_running_totals,
        "rolling_counts": q_rolling_counts,
        "q1_pricing": q_q1_pricing,
        "mktsegment_revenue": q_mktsegment_revenue,
        "asof_click_view": q_asof_click_view,
        "range_buckets": q_range_buckets,
        "gc_dist_to_origin": q_gc_dist_to_origin,
        "distinct_parts": q_distinct_parts,
        "semi_open_orders": q_semi_open_orders,
        "anti_max_qty": q_anti_max_qty,
        "top_events_per_user": q_top_events_per_user,
        "hopping_windows": q_hopping_windows,
        "normalized_texts": q_normalized_texts,
        "events_hourly": q_events_hourly,
        "sessions": q_sessions,
        "outer_join": q_outer_join,
        "late_events": q_late_events,
        "order_lines_join": q_order_lines_join,
        "heavy_custkeys": q_heavy_custkeys,
        "bloom_join": q_bloom_join,
        "token_df": q_token_df,
        "redacted_texts": q_redacted_texts,
        "rep_stats": q_rep_stats,
        "contaminated": q_contaminated,
        "shingle_pairs": q_shingle_pairs,
        "dup_clusters": q_dup_clusters,
        "seq_packing": q_seq_packing,
        "dedup_lines": q_dedup_lines,
        # redundant variants + composition queries last among oracle-matched:
        # every operator here has its OWN unique oracle row above, so if a
        # recording cap truncates the window these lose the least coverage
        # (dedup_spans is first PAST the window by design: it shares the
        # duplicated-segment machinery dedup_lines' in-window row already
        # value-checks — count pass, semi/anti join, ordered reassembly —
        # adding window hashing (covered by contaminated/shingle_pairs) and
        # the coverage sweep, which its pytest suite pins;
        # near_dedup composes shingle_pairs + dup_clusters + the anti-join,
        # each with its own in-window row — dedup_lines takes its slot as a
        # genuinely new operator (order-preserving segment reassembly);
        # tfidf_top3 composes token_df + the shuffle join + per-key top-k,
        # each with its own row; top_customers: top-k + broadcast join,
        # covered by top_events_per_user + mktsegment_revenue;
        # filter_project: the pruned read + filter + project path every
        # other query exercises; user_median_value: grouped_median is
        # grouped_quantile's machinery at q=0.5 and user_p90_value stays
        # in-window; orders_by_month + source_stats + events_agg +
        # lang_counts: grouped-agg family rows — q1_pricing/cell_counts/
        # user_value_range cover the operator (events_agg still exercises
        # final='partials' in check_oracle); radius_cells + knn_cells:
        # cell-ROUTED variants of radius_join/knn — same operator contract,
        # different routing, still verified every round by check_oracle;
        # tile_coarse: the hierarchy rollup over cell_counts' operator)
        # capped_sources (cap_per_key) moved just past the window for
        # seq_packing's slot: its partitioned rank-selection machinery is
        # top_events_per_user's in-window row with rank-by-hash instead of
        # rank-by-value; the hash-cap specifics stay pinned by pytest +
        # check_oracle every round
        "capped_sources": q_capped_sources,
        "dedup_spans": q_dedup_spans,
        # balanced_langs shares sample_10pct's hash mechanism under a
        # per-stratum CASE — new stage, same recorded-window family
        "balanced_langs": q_balanced_langs,
        # pivot + rollup ride grouped_sum's combiner (its operator has four
        # in-window rows); the widening / prefix-re-aggregation layers are
        # their own stages, value-checked here every round
        "lang_source_pivot": q_lang_source_pivot,
        "pricing_rollup": q_pricing_rollup,
        "user_event_types": q_user_event_types,
        "longest_docs": q_longest_docs,
        "user_top_event": q_user_top_event,
        "near_dedup": q_near_dedup,
        "tile_coarse": q_tile_coarse,
        "radius_cells": q_radius_cells,
        "knn_cells": q_knn_cells,
        "lang_counts": q_lang_counts,
        "events_agg": q_events_agg,
        "tfidf_top3": q_tfidf_top3,
        "top_customers": q_top_customers,
        "filter_project": q_filter_project,
        "user_median_value": q_user_median_value,
        "source_stats": q_source_stats,
        "orders_by_month": q_orders_by_month,
        "hopping_offset": q_hopping_offset,
        "sample_10pct": q_sample_10pct,
        "sample_exact_k": q_sample_exact_k,
        "revenue_heatmap": q_revenue_heatmap,
        "clean_corpus": q_clean_corpus,
        # curated_corpus composes lang gate + quality gate + dedup_lines +
        # bucketed join + stratified_sample + add_split — each stage has its
        # own in-window row; this row value-checks the whole composition
        "curated_corpus": q_curated_corpus,
        # above_median_docs composes grouped_median (own in-window row via
        # user_p90's quantile machinery + user_median_value in check_oracle)
        # with the broadcast-threshold filter pattern
        "props_by_type": q_props_by_type,
        "weighted_sample": q_weighted_sample,
        "first_event_hourly": q_first_event_hourly,
        "label_centroids": q_label_centroids,
        "nearest_centroid": q_nearest_centroid,
        "funnel_users": q_funnel_users,
        "user_value_quartiles": q_user_value_quartiles,
        "value_histogram": q_value_histogram,
        "snapshot_diff": q_snapshot_diff,
        "curated_packed": q_curated_packed,
        "pricing_cube": q_pricing_cube,
        "qty_price_corr": q_qty_price_corr,
        "qty_price_fit": q_qty_price_fit,
        "qty_price_covar": q_qty_price_covar,
        "event_gaps": q_event_gaps,
        "track_length": q_track_length,
        "regional_revenue": q_regional_revenue,
        "cell_areas": q_cell_areas,
        "link_components": q_link_components,
        "domain_stats": q_domain_stats,
        "polygon_areas": q_polygon_areas,
        "cell_polygons": q_cell_polygons,
        "event_ranks": q_event_ranks,
        "zonal_stats": q_zonal_stats,
        "jaccard_pairs": q_jaccard_pairs,
        "cohort_retention": q_cohort_retention,
        "geo_curated": q_geo_curated,
        "polygon_perimeters": q_polygon_perimeters,
        "rhumb_to_origin": q_rhumb_to_origin,
        "zorder_keys": q_zorder_keys,
        "track_envelopes": q_track_envelopes,
        "sphere_destinations": q_sphere_destinations,
        "midpoints_origin": q_midpoints_origin,
        "bbox_scan": q_bbox_scan,
        "token_entropy": q_token_entropy,
        "cell_focal": q_cell_focal,
        "value_outliers": q_value_outliers,
        "colocation": q_colocation,
        "trending_daily": q_trending_daily,
        "global_median": q_global_median,
        "lang_samples": q_lang_samples,
        "reverse_geocode": q_reverse_geocode,
        "idw_estimate": q_idw_estimate,
        "link_hops": q_link_hops,
        "session_spans": q_session_spans,
        "cell_lang_entropy": q_cell_lang_entropy,
        "corridor_docs": q_corridor_docs,
        "tile_pyramid": q_tile_pyramid,
        "source_dedup_ratio": q_source_dedup_ratio,
        "user_first_last": q_user_first_last,
        "knn_graph": q_knn_graph,
        "knn_graph_blocked": q_knn_graph_blocked,
        "ann_join": q_ann_join,
        "ivf_ann_join": q_ivf_ann_join,
        "link_triangles": q_link_triangles,
        "weekly_actives": q_weekly_actives,
        "track_centroids": q_track_centroids,
        "cell_centroids": q_cell_centroids,
        "densified_tracks": q_densified_tracks,
        "top_return_customers": q_top_return_customers,
        "above_median_docs": q_above_median_docs,
        # the distributed exact near-dup twin, value-checked against the
        # same SQL as embed_near_dup's in-window broadcast-path row
        "embed_near_dup_blocked": q_embed_near_dup_blocked,
        # geo_dbscan composes close_pairs + connected_components + the
        # join family; stay_points composes the LAG/session machinery +
        # haversine legs + the micro-degree centroid — every component has
        # its own in-window row, so these compositions sit past the window
        # (check_oracle still value-hash-checks them every round)
        "geo_dbscan": q_geo_dbscan,
        "stay_points": q_stay_points,
        # ── rows-only queries (no SQL-expressible oracle) from here down ──
        "approx_distinct": q_approx_distinct,
        "doc_clusters": q_doc_clusters,
        "semdedup": q_semdedup,
        "user_p90_sketch": q_user_p90_sketch,
        "interpolate_waypoints": q_interpolate,
        "destinations": q_destinations,
        "fingerprints": q_fingerprints,
        "lang_id": q_lang_id,
        "minhash_pairs": q_minhash_pairs,
        "simhash_pairs": q_simhash_pairs,
        "lsh_ann": q_lsh_ann,
        "ivf_ann": q_ivf_ann,
        "ann_topk_q8": q_ann_topk_q8,
        "embed_near_dup_lsh": q_embed_near_dup_lsh,
        "image_features": q_image_features,
        "audio_features": q_audio_features,
        "video_pipeline": q_video_pipeline,
        "image_features_bmp": q_image_features_bmp,
        "audio_features_wav": q_audio_features_wav,
        "sorted_export": q_sorted_export,
        "pages_pipeline": q_pages_pipeline,
        "link_degrees": q_link_degrees,
        "pagerank_links": q_pagerank_links,
        "hits_links": q_hits_links,
        "simplified_tracks": q_simplified_tracks,
        "embed_pca": q_embed_pca,
        "canonical_urls": q_canonical_urls,
    }


# ── oracle SQL ───────────────────────────────────────────────────────────


def _redacted_texts_sql() -> str:
    from geodistpy_ray.stages.text import redact_pii_sql

    footer = (
        # COALESCE mirrors the engine's fill_null(text, ''): a NULL text
        # would otherwise NULL the whole concatenation on this side only
        "COALESCE(text, '') || ' contact user' || CAST(doc_id AS VARCHAR) || "
        "'@mail.example from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || "
        "'.7 call +1 (555) 010-' || CAST(1000 + doc_id % 9000 AS VARCHAR)"
    )
    return (
        f"SELECT doc_id, {redact_pii_sql(footer)} AS redacted FROM documents"
    )


_CURATED_CTE = (
    # lang gate + quality gate (both on the ORIGINAL text, before the
    # synthesized line structure), dedup_lines' mirror, lang re-attach
    # join, stratified_sample's CASE — the SQL twin of _curated_balanced
    "WITH q AS (SELECT doc_id, lang, text FROM documents "
    "WHERE lang IN ('en','de','fr') AND length(text) >= 50 "
    "AND FLOOR(CAST(length(text) - length(replace(text, ' ', '')) AS DOUBLE) "
    "* 1000000.0 / GREATEST(length(text), 1)) BETWEEN 120000 AND 250000), "
    "d AS (SELECT doc_id, replace(text, ' data ', chr(10)) AS t FROM q), "
    "l AS (SELECT doc_id, i AS idx, parts[i] AS line "
    "FROM (SELECT doc_id, string_split(t, chr(10)) AS parts FROM d), "
    "UNNEST(generate_series(1, len(parts))) AS u(i)), "
    "dup AS (SELECT line FROM l GROUP BY line "
    "HAVING count(DISTINCT doc_id) >= 2), "
    "clean AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY idx) "
    "AS clean_text FROM l ANTI JOIN dup USING (line) GROUP BY doc_id), "
    "bal AS (SELECT c.doc_id, q.lang, c.clean_text "
    "FROM clean c JOIN q USING (doc_id) "
    "WHERE (CAST(((c.doc_id + 7) % 1000000 + 1000000) % 1000000 AS BIGINT) "
    "* 998244353) % 1000000 "
    "< CASE WHEN q.lang = 'en' THEN 500000 ELSE 1000000 END)"
)




def _domain_stats_sql() -> str:
    from geodistpy_ray.stages.text import registrable_domain_sql

    return (
        f"WITH u AS (SELECT {_DOMAIN_URL_BUILD_SQL} AS url FROM documents) "
        f"SELECT {registrable_domain_sql('url')} AS domain, "
        "CAST(COUNT(*) AS BIGINT) AS n_pages FROM u GROUP BY 1"
    )


def _sphere_dest_sql(lat: str, lon: str) -> str:
    """fp ordering mirrors kernels.sphere.destination_sphere term-for-term."""
    brg = "RADIANS(CAST(doc_id % 360 AS DOUBLE))"
    delta = "((100000.0 + CAST(doc_id % 50 AS DOUBLE) * 10000.0) / 6371009.0)"
    sl2 = (
        f"(SIN(RADIANS({lat})) * COS({delta}) + "
        f"COS(RADIANS({lat})) * SIN({delta}) * COS({brg}))"
    )
    sl2c = f"LEAST(GREATEST({sl2}, -1.0), 1.0)"
    lat2 = f"DEGREES(ASIN({sl2c}))"
    lon2 = (
        f"DEGREES(RADIANS({lon}) + ATAN2("
        f"SIN({brg}) * SIN({delta}) * COS(RADIANS({lat})), "
        f"COS({delta}) - SIN(RADIANS({lat})) * {sl2}))"
    )
    lon2w = f"(({lon2} + 540.0) % 360.0 - 180.0)"
    return (
        f"SELECT doc_id, ROUND({lat2}, 6) AS dest_lat, "
        f"ROUND({lon2w}, 6) AS dest_lon FROM documents"
    )


def _midpoint_sql(lat: str, lon: str) -> str:
    """fp ordering mirrors kernels.sphere.midpoint_sphere term-for-term."""
    olat, olon = ORIGIN
    dlon = f"(RADIANS({olon}) - RADIANS({lon}))"
    bx = f"(COS(RADIANS({olat})) * COS({dlon}))"
    by = f"(COS(RADIANS({olat})) * SIN({dlon}))"
    cpx = f"(COS(RADIANS({lat})) + {bx})"
    latm = (
        f"DEGREES(ATAN2(SIN(RADIANS({lat})) + SIN(RADIANS({olat})), "
        f"SQRT({cpx} * {cpx} + {by} * {by})))"
    )
    lonm = f"DEGREES(RADIANS({lon}) + ATAN2({by}, {cpx}))"
    lonw = f"(({lonm} + 540.0) % 360.0 - 180.0)"
    return (
        f"SELECT doc_id, ROUND({latm}, 6) AS mid_lat, "
        f"ROUND({lonw}, 6) AS mid_lon FROM documents"
    )


def _fingerprints_sql() -> str:
    """Exact mirror of `add_fingerprint`'s polynomial hash
    h = Σ cp_i · base^(n−1−i) mod (2^61−1): powers from a recursive CTE,
    per-character terms and the sum in HUGEINT (operands < 2^82, inside
    int128), normalization via the corpus-pinned RE2 `\\s+` collapse."""
    M = (1 << 61) - 1
    B = 1000003
    return (
        "WITH RECURSIVE n AS (SELECT doc_id, "
        "TRIM(REGEXP_REPLACE(text, '\\s+', ' ', 'g')) AS t FROM documents), "
        f"r(k, v) AS (SELECT 0, CAST(1 AS HUGEINT) UNION ALL "
        f"SELECT k + 1, (v * {B}) % {M} FROM r "
        "WHERE k < (SELECT COALESCE(MAX(length(t)), 0) FROM n)), "
        "chars AS (SELECT doc_id, i, "
        "CAST(unicode(substr(t, CAST(i AS INTEGER), 1)) AS HUGEINT) AS cp, "
        "length(t) AS len FROM n, UNNEST(range(1, length(t) + 1)) AS u(i)), "
        f"terms AS (SELECT c.doc_id, (c.cp * r.v) % {M} AS term "
        "FROM chars c JOIN r ON r.k = c.len - c.i), "
        f"h AS (SELECT doc_id, CAST(SUM(term) % {M} AS BIGINT) AS fingerprint "
        "FROM terms GROUP BY doc_id) "
        "SELECT d.doc_id, COALESCE(h.fingerprint, 0) AS fingerprint "
        "FROM documents d LEFT JOIN h USING (doc_id)"
    )


def _lang_id_sql() -> str:
    """Exact mirror of LangIdActor: occurrence counts of profile stopwords
    per language (a shared word counts for EVERY owning profile), argmax
    with profile-ORDER tie-break, 'und' on zero hits. The tokenizer mirror
    is the pinned RE2 equivalence `[^\\p{L}\\p{Nl}\\p{No}]+` ≡ Python
    `[^\\W\\d_]+` (Python \\w admits Nl/No letter-numbers beyond \\p{L})."""
    from geodistpy_ray.stages.text import _LANG_PROFILES

    rows = []
    for pri, (lang, words) in enumerate(_LANG_PROFILES.items()):
        for w in sorted(words):
            rows.append(f"('{w}', '{lang}', {pri})")
    values = ", ".join(rows)
    split = "string_split_regex(lower(text), '[^\\p{L}\\p{Nl}\\p{No}]+')"
    return (
        "WITH raw AS (SELECT doc_id, unnest(" + split + ") AS tok FROM documents), "
        "toks AS (SELECT doc_id, tok FROM raw WHERE tok <> ''), "
        "prof(word, lang, pri) AS (VALUES " + values + "), "
        "hits AS (SELECT t.doc_id, p.lang, p.pri, COUNT(*) AS c "
        "FROM toks t JOIN prof p ON t.tok = p.word GROUP BY 1, 2, 3), "
        "best AS (SELECT doc_id, lang, "
        "ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY c DESC, pri ASC) AS rn "
        "FROM hits) "
        "SELECT d.doc_id, COALESCE(b.lang, 'und') AS lang_pred "
        "FROM documents d LEFT JOIN "
        "(SELECT doc_id, lang FROM best WHERE rn = 1) b USING (doc_id)"
    )


def _rhumb_to_origin_sql(lat: str, lon: str) -> str:
    """fp ordering mirrors kernels.sphere.rhumb_inverse term-for-term."""
    olat, olon = ORIGIN
    dlat = f"(RADIANS({olat}) - RADIANS({lat}))"
    dpsi = (
        f"LN(TAN(PI() / 4.0 + RADIANS({olat}) / 2.0) / "
        f"TAN(PI() / 4.0 + RADIANS({lat}) / 2.0))"
    )
    dlon_raw = f"(RADIANS({olon}) - RADIANS({lon}))"
    dlon = f"({dlon_raw} - FLOOR({dlon_raw} / (2.0 * PI()) + 0.5) * (2.0 * PI()))"
    q = (
        f"(CASE WHEN ABS({dpsi}) > 1e-12 THEN {dlat} / {dpsi} "
        f"ELSE COS(RADIANS({lat})) END)"
    )
    dist = f"(6371009.0 * SQRT({dlat} * {dlat} + {q} * {q} * {dlon} * {dlon}))"
    brg_raw = f"DEGREES(ATAN2({dlon}, {dpsi}))"
    brg = f"({brg_raw} - FLOOR({brg_raw} / 360.0) * 360.0)"
    return (
        f"SELECT doc_id, ROUND({dist} / 1000.0, 6) AS rhumb_km, "
        f"ROUND({brg}, 6) AS course FROM documents"
    )


def oracle_sql() -> dict[str, str]:
    from geodistpy_ray.functions.geocode import (
        cell_sql,
        geocode_sql,
        great_circle_sql,
        haversine_dimwise_sql,
        haversine_sql,
        query_points_sql,
    )
    from geodistpy_ray.cells import zorder_sql
    from geodistpy_ray.sources.polygons import diamond_polygons_sql
    from geodistpy_ray.stages.text import (
        canonicalize_urls_sql,
        cap_rank_sql,
        json_int_field_sql,
        split_sql,
    )

    lat, lon = geocode_sql("doc_id")
    cell = cell_sql(lat, lon, CELL_DEG)
    cell4 = cell_sql(lat, lon, 4.0)
    hav_o = haversine_sql(lat, lon, str(ORIGIN[0]), str(ORIGIN[1]))
    qpts = query_points_sql(8)
    qpts12 = query_points_sql(12)
    qpts16 = query_points_sql(16)
    qpts20 = query_points_sql(20)
    qpts6 = query_points_sql(6)
    hav_q = haversine_sql(lat, lon, "q.qlat", "q.qlon")

    elat, elon = geocode_sql("event_id")
    klat, klon = geocode_sql("keep_id")
    kcell = cell_sql(klat, klon, CELL_DEG)
    lat_a, lon_a = geocode_sql("a.doc_id")
    lat_b, lon_b = geocode_sql("b.doc_id")
    hav_ab = haversine_sql(lat_a, lon_a, lat_b, lon_b)

    # fp ordering mirrors kernels.initial_bearing_sphere: RADIANS each
    # operand first, then subtract (CLAUDE.md oracle-gate convention)
    dlon_sql = f"(RADIANS({ORIGIN[1]}) - RADIANS({lon}))"
    brg_raw = (
        f"DEGREES(ATAN2("
        f"SIN({dlon_sql}) * COS(RADIANS({ORIGIN[0]})), "
        f"COS(RADIANS({lat})) * SIN(RADIANS({ORIGIN[0]})) - "
        f"SIN(RADIANS({lat})) * COS(RADIANS({ORIGIN[0]})) * COS({dlon_sql})))"
    )
    brg = f"({brg_raw} - FLOOR({brg_raw} / 360.0) * 360.0)"

    return {
        "geocode_cells": (
            f"SELECT doc_id, {lat} AS lat, {lon} AS lon, {cell} AS cell FROM documents"
        ),
        "cell_counts": (
            f"SELECT {cell} AS cell, CAST(SUM(n_chars) AS BIGINT) AS sum_chars, "
            f"CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY 1"
        ),
        "tile_coarse": (
            f"SELECT {cell4} AS cell4, CAST(COUNT(*) AS BIGINT) AS n_docs "
            f"FROM documents GROUP BY 1"
        ),
        "dist_to_origin": (
            f"SELECT doc_id, ROUND({hav_o} / 1000.0, 6) AS dist_km FROM documents"
        ),
        "radius_join": (
            f"SELECT q.query_id, d.doc_id, ROUND({hav_q.replace('doc_id', 'd.doc_id')} / 1000.0, 6) AS dist_km "
            f"FROM documents d, {qpts} q WHERE {hav_q.replace('doc_id', 'd.doc_id')} <= {RADIUS_M}"
        ),
        "radius_cells": (
            f"SELECT q.query_id, d.doc_id, ROUND({hav_q.replace('doc_id', 'd.doc_id')} / 1000.0, 6) AS dist_km "
            f"FROM documents d, {qpts16} q WHERE {hav_q.replace('doc_id', 'd.doc_id')} <= {RADIUS_M}"
        ),
        "knn": (
            f"SELECT query_id, doc_id, rank FROM ("
            f"SELECT q.query_id, d.doc_id, ROW_NUMBER() OVER ("
            f"PARTITION BY q.query_id "
            f"ORDER BY ROUND({hav_q.replace('doc_id', 'd.doc_id')}, 6), d.doc_id) AS rank "
            f"FROM documents d, {qpts12} q) WHERE rank <= {KNN_K}"
        ),
        "knn_cells": (
            f"SELECT query_id, doc_id, rank FROM ("
            f"SELECT q.query_id, d.doc_id, ROW_NUMBER() OVER ("
            f"PARTITION BY q.query_id "
            f"ORDER BY ROUND({hav_q.replace('doc_id', 'd.doc_id')}, 6), d.doc_id) AS rank "
            f"FROM documents d, {qpts16} q) WHERE rank <= {KNN_K}"
        ),
        "knn_indexed": (
            f"SELECT query_id, doc_id, rank FROM ("
            f"SELECT q.query_id, d.doc_id, ROW_NUMBER() OVER ("
            f"PARTITION BY q.query_id "
            f"ORDER BY ROUND({hav_q.replace('doc_id', 'd.doc_id')}, 6), d.doc_id) AS rank "
            f"FROM documents d, {qpts20} q) WHERE rank <= {KNN_K}"
        ),
        "top_return_customers": (
            "WITH r AS (SELECT l_orderkey, "
            "CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5) "
            "AS BIGINT) AS cents FROM lineitem WHERE l_returnflag = 'R'), "
            "pc AS (SELECT o_custkey, CAST(SUM(cents) AS BIGINT) AS revenue_cents, "
            "CAST(COUNT(*) AS BIGINT) AS n_lines "
            "FROM r JOIN orders ON l_orderkey = o_orderkey GROUP BY o_custkey) "
            "SELECT pc.o_custkey, c.c_name, pc.revenue_cents, pc.n_lines "
            "FROM pc JOIN customer c ON c.c_custkey = pc.o_custkey "
            "ORDER BY pc.revenue_cents DESC, pc.o_custkey LIMIT 20"
        ),
        "densified_tracks": (
            # slerp fp ordering mirrors windows.densify_tracks term-for-term
            f"WITH pts AS (SELECT user_id, event_id, ts, {elat} AS lat, "
            f"{elon} AS lon FROM events), "
            "seq AS (SELECT user_id, lat, lon, ROW_NUMBER() OVER w AS rn, "
            "LEAD(lat) OVER w AS lat2, LEAD(lon) OVER w AS lon2 FROM pts "
            "WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)), "
            "legs AS (SELECT user_id, rn AS leg_idx, lat, lon, lat2, lon2, "
            f"{haversine_sql('lat', 'lon', 'lat2', 'lon2')} AS d "
            "FROM seq WHERE lat2 IS NOT NULL), "
            "big AS (SELECT *, CAST(CEIL(d / 5000000.0) AS BIGINT) AS n "
            "FROM legs WHERE d > 5000000.0), "
            "kk AS (SELECT user_id, leg_idx, lat, lon, lat2, lon2, d, n, "
            "UNNEST(RANGE(1, n)) AS k FROM big), "
            "s AS (SELECT user_id, leg_idx, k, "
            "CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS f, d / 6371009.0 AS delta, "
            "lat, lon, lat2, lon2 FROM kk), "
            "c AS (SELECT user_id, leg_idx, k, "
            "SIN((1.0 - f) * delta) / SIN(delta) AS A, "
            "SIN(f * delta) / SIN(delta) AS B, "
            "RADIANS(lat) AS rlat1, RADIANS(lon) AS rlon1, "
            "RADIANS(lat2) AS rlat2, RADIANS(lon2) AS rlon2 FROM s), "
            "xyz AS (SELECT user_id, leg_idx, k, "
            "A * COS(rlat1) * COS(rlon1) + B * COS(rlat2) * COS(rlon2) AS x, "
            "A * COS(rlat1) * SIN(rlon1) + B * COS(rlat2) * SIN(rlon2) AS y, "
            "A * SIN(rlat1) + B * SIN(rlat2) AS z FROM c) "
            "SELECT user_id, CAST(leg_idx AS BIGINT) AS leg_idx, "
            "CAST(k AS BIGINT) AS k, "
            "ROUND(DEGREES(ATAN2(z, SQRT(x * x + y * y))), 6) AS lat, "
            "ROUND(DEGREES(ATAN2(y, x)), 6) AS lon FROM xyz"
        ),
        "geo_curated": (
            f"WITH geo AS (SELECT doc_id, text, lang, {lat} AS lat, {lon} AS lon "
            "FROM documents), "
            f"inpoly AS (SELECT DISTINCT g.doc_id, g.text, g.lang FROM geo g, "
            f"{diamond_polygons_sql()} p "
            "WHERE ABS(g.lat - p.clat) / p.half_lat + "
            "ABS(g.lon - p.clon) / p.half_lon < 1.0), "
            "gated AS (SELECT doc_id, text FROM inpoly WHERE lang IN ('en', 'de')), "
            "kept AS (SELECT MIN(doc_id) AS keep_id FROM gated GROUP BY text) "
            f"SELECT {kcell} AS cell, "
            "CAST(COUNT(*) AS BIGINT) AS n_docs FROM kept GROUP BY 1"
        ),
        "cohort_retention": (
            "WITH m AS (SELECT DISTINCT user_id, "
            "CAST(YEAR(ts) * 10000 + MONTH(ts) * 100 + DAY(ts) AS BIGINT) "
            "AS ymd FROM events), "
            "c AS (SELECT user_id, MIN(ymd) AS cohort_day FROM m GROUP BY user_id) "
            "SELECT c.cohort_day, m.ymd AS activity_day, "
            "CAST(COUNT(*) AS BIGINT) AS n_users "
            "FROM m JOIN c USING (user_id) GROUP BY 1, 2"
        ),
        "event_ranks": (
            "SELECT user_id, event_id, "
            "CAST(ROW_NUMBER() OVER (PARTITION BY user_id "
            "ORDER BY epoch_us(ts), event_id) AS BIGINT) AS rnk FROM events"
        ),
        "zonal_stats": (
            f"SELECT p.poly_id, "
            "CAST(SUM(d.n_chars) AS BIGINT) AS sum_chars, "
            "CAST(COUNT(*) AS BIGINT) AS n_docs "
            f"FROM documents d, {diamond_polygons_sql()} p "
            f"WHERE ABS({lat} - p.clat) / p.half_lat + "
            f"ABS({lon} - p.clon) / p.half_lon < 1.0 "
            "GROUP BY p.poly_id"
        ),
        "cell_polygons": (
            # exact half-degree arithmetic (lat_idx·d − 90 [+d]) — no
            # rounding; vertex order (lo,lo)(lo,hi)(hi,hi)(hi,lo)(close)
            f"WITH c AS (SELECT DISTINCT {cell} AS cell FROM documents), "
            "b AS (SELECT cell, "
            "CAST(cell // 180 AS DOUBLE) * 2.0 - 90.0 AS lo_lat, "
            "CAST(cell % 180 AS DOUBLE) * 2.0 - 180.0 AS lo_lon FROM c) "
            "SELECT cell, j, "
            "CASE WHEN j IN (2, 3) THEN lo_lat + 2.0 ELSE lo_lat END AS vlat, "
            "CASE WHEN j IN (1, 2) THEN lo_lon + 2.0 ELSE lo_lon END AS vlon "
            "FROM b, (SELECT CAST(UNNEST(RANGE(5)) AS BIGINT) AS j)"
        ),
        "rhumb_to_origin": _rhumb_to_origin_sql(lat, lon),
        "corridor_docs": _corridor_sql(lat, lon),
        "reverse_geocode": (
            "WITH c AS (SELECT CAST(UNNEST(RANGE(211)) AS BIGINT) AS center_id), "
            "cc AS (SELECT center_id, "
            "CAST((center_id * 7919) % 160 AS DOUBLE) - 79.5 AS clat, "
            "CAST((center_id * 104729) % 360 AS DOUBLE) - 179.5 AS clon FROM c), "
            f"d AS (SELECT doc_id, center_id, "
            f"{haversine_sql(lat, lon, 'cc.clat', 'cc.clon')} AS dist "
            "FROM documents, cc), "
            "r AS (SELECT doc_id, center_id, ROUND(dist / 1000.0, 6) AS km, "
            "ROW_NUMBER() OVER (PARTITION BY doc_id "
            "ORDER BY ROUND(dist / 1000.0, 6), center_id) AS rn FROM d) "
            "SELECT doc_id, center_id, km AS center_km FROM r WHERE rn = 1"
        ),
        "idw_estimate": (
            f"WITH nb AS (SELECT q.query_id, d.doc_id, "
            f"{hav_q.replace('doc_id', 'd.doc_id')} AS dist, d.n_chars "
            f"FROM documents d, {qpts} q "
            f"WHERE {hav_q.replace('doc_id', 'd.doc_id')} <= {RADIUS_M}) "
            "SELECT query_id, "
            "ROUND(SUM(n_chars / (dist * dist)) / SUM(1.0 / (dist * dist)), 6) "
            "AS idw_chars, CAST(COUNT(*) AS BIGINT) AS n_neighbors "
            "FROM nb WHERE dist > 0 GROUP BY query_id"
        ),
        "sphere_destinations": _sphere_dest_sql(lat, lon),
        "midpoints_origin": _midpoint_sql(lat, lon),
        "bbox_scan": (
            f"SELECT doc_id FROM documents WHERE {lat} BETWEEN 20.0 AND 60.0 "
            f"AND {lon} BETWEEN -40.0 AND 40.0"
        ),
        "zorder_keys": (
            f"SELECT doc_id, {zorder_sql(lat, lon)} AS zkey FROM documents"
        ),
        "track_centroids": (
            f"WITH g AS (SELECT user_id, "
            f"CAST(FLOOR({elat} * 1000000.0 + 0.5) AS BIGINT) AS ulat, "
            f"CAST(FLOOR({elon} * 1000000.0 + 0.5) AS BIGINT) AS ulon "
            "FROM events), "
            "a AS (SELECT user_id, CAST(SUM(ulat) AS BIGINT) AS su, "
            "CAST(SUM(ulon) AS BIGINT) AS so, CAST(COUNT(*) AS BIGINT) AS n_pts "
            "FROM g GROUP BY user_id) "
            "SELECT user_id, n_pts, "
            "FLOOR(CAST(su AS DOUBLE) / n_pts + 0.5) / 1000000.0 AS clat, "
            "FLOOR(CAST(so AS DOUBLE) / n_pts + 0.5) / 1000000.0 AS clon "
            "FROM a"
        ),
        "geo_dbscan": (
            # geodesic DBSCAN: ε-self-join neighbor graph, density bar
            # counts the point itself (sklearn min_samples), core labels =
            # min-reachable over the core subgraph (+ self-loops so
            # isolated cores keep their own id), borders take the MIN
            # core-neighbor cluster (the engine's deterministic rule)
            f"WITH RECURSIVE nb AS (SELECT a.doc_id AS ida, b.doc_id AS idb "
            f"FROM documents a, documents b "
            f"WHERE a.doc_id <> b.doc_id AND {hav_ab} <= {PAIR_DIST_M}), "
            "deg AS (SELECT ida AS id, COUNT(*) AS d FROM nb GROUP BY 1), "
            "core AS (SELECT id FROM deg WHERE d + 1 >= 3), "
            "ce AS (SELECT n.ida AS src, n.idb AS dst FROM nb n "
            "JOIN core c1 ON n.ida = c1.id JOIN core c2 ON n.idb = c2.id "
            "UNION ALL SELECT id, id FROM core), "
            "nodes AS (SELECT DISTINCT src AS node FROM ce), "
            "reach(node, r) AS (SELECT node, node FROM nodes "
            "UNION SELECT s.dst, reach.r FROM reach JOIN ce s ON s.src = reach.node), "
            "lbl AS (SELECT node, MIN(r) AS cluster_id FROM reach GROUP BY node), "
            "brd AS (SELECT n.ida AS node, MIN(l.cluster_id) AS cluster_id "
            "FROM nb n JOIN lbl l ON n.idb = l.node "
            "WHERE n.ida NOT IN (SELECT id FROM core) GROUP BY 1) "
            "SELECT node AS doc_id, cluster_id, TRUE AS is_core FROM lbl "
            "UNION ALL SELECT node AS doc_id, cluster_id, FALSE AS is_core FROM brd"
        ),
        "stay_points": (
            # the LAG + break-flag run id + GROUP BY ... HAVING mirror of
            # the consecutive-leg stay rule; legs compare in integer mm
            # (the haversine_sql resolution) so the break decision is
            # bit-identical; centroids use the shared micro-degree tie rule
            f"WITH pts AS (SELECT user_id, event_id, epoch_us(ts) AS us, "
            f"{elat} AS lat, {elon} AS lon FROM events "
            "WHERE user_id IS NOT NULL AND ts IS NOT NULL), "
            "o AS (SELECT *, LAG(lat) OVER w AS plat, LAG(lon) OVER w AS plon, "
            "LAG(us) OVER w AS pus FROM pts "
            "WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)), "
            "b AS (SELECT *, CASE WHEN pus IS NULL OR "
            f"FLOOR({haversine_sql('plat', 'plon', 'lat', 'lon')} * 1000.0 + 0.5) "
            f"> {int(STAY_EPS_M * 1000)} THEN 1 ELSE 0 END AS brk FROM o), "
            "r AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id "
            "ROWS UNBOUNDED PRECEDING) AS run FROM b), "
            "s AS (SELECT user_id, run, MIN(us) AS start_us, MAX(us) AS end_us, "
            "CAST(COUNT(*) AS BIGINT) AS n_pts, "
            "CAST(SUM(CAST(FLOOR(lat * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS su, "
            "CAST(SUM(CAST(FLOOR(lon * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS so "
            "FROM r GROUP BY 1, 2) "
            "SELECT user_id, start_us, end_us, n_pts, end_us - start_us AS dur_us, "
            "FLOOR(CAST(su AS DOUBLE) / n_pts + 0.5) / 1000000.0 AS clat, "
            "FLOOR(CAST(so AS DOUBLE) / n_pts + 0.5) / 1000000.0 AS clon "
            f"FROM s WHERE end_us - start_us >= {STAY_MIN_DUR_US} AND n_pts >= 2"
        ),
        "track_envelopes": (
            f"WITH pts AS (SELECT user_id, {elat} AS lat, {elon} AS lon "
            "FROM events), "
            "a AS (SELECT user_id, MIN(lat) AS min_lat, MAX(lat) AS max_lat, "
            "MIN(lon) AS min_lon, MAX(lon) AS max_lon FROM pts GROUP BY user_id) "
            "SELECT user_id, min_lat, max_lat, min_lon, max_lon, "
            f"ROUND({haversine_sql('min_lat', 'min_lon', 'max_lat', 'max_lon')}"
            " / 1000.0, 6) AS diag_km FROM a"
        ),
        "polygon_perimeters": (
            # same closed-ring vertex relation as polygon_areas, haversine
            # per edge (prev→next fp order matches the kernel call), legs
            # as integer mm so the SUM is order-independent
            f"WITH p AS (SELECT * FROM {diamond_polygons_sql()}), "
            "v AS (SELECT poly_id, j, "
            "CASE j WHEN 0 THEN clat + half_lat WHEN 1 THEN clat "
            "WHEN 2 THEN clat - half_lat WHEN 3 THEN clat "
            "ELSE clat + half_lat END AS vlat, "
            "CASE j WHEN 0 THEN clon WHEN 1 THEN clon + half_lon "
            "WHEN 2 THEN clon WHEN 3 THEN clon - half_lon "
            "ELSE clon END AS vlon "
            "FROM p, (SELECT CAST(UNNEST(RANGE(5)) AS BIGINT) AS j)), "
            "t AS (SELECT poly_id, CAST(FLOOR("
            f"{haversine_sql('vlat', 'vlon', 'LEAD(vlat) OVER w', 'LEAD(vlon) OVER w')}"
            " * 1000.0 + 0.5) AS BIGINT) AS leg_mm "
            "FROM v WINDOW w AS (PARTITION BY poly_id ORDER BY j) "
            "QUALIFY LEAD(vlat) OVER w IS NOT NULL) "
            "SELECT poly_id, CAST(SUM(leg_mm) AS BIGINT) AS perimeter_mm "
            "FROM t GROUP BY poly_id"
        ),
        "cell_centroids": (
            f"WITH g AS (SELECT {cell} AS cell, "
            f"CAST(FLOOR({lat} * 1000000.0 + 0.5) AS BIGINT) AS ulat, "
            f"CAST(FLOOR({lon} * 1000000.0 + 0.5) AS BIGINT) AS ulon "
            "FROM documents), "
            "a AS (SELECT cell, CAST(SUM(ulat) AS BIGINT) AS sum_ulat, "
            "CAST(SUM(ulon) AS BIGINT) AS sum_ulon, "
            "CAST(COUNT(*) AS BIGINT) AS n_docs FROM g GROUP BY cell) "
            "SELECT cell, n_docs, "
            "FLOOR(CAST(sum_ulat AS DOUBLE) / n_docs + 0.5) / 1000000.0 AS clat, "
            "FLOOR(CAST(sum_ulon AS DOUBLE) / n_docs + 0.5) / 1000000.0 AS clon "
            "FROM a"
        ),
        "polygon_areas": (
            # Chamberlain–Duquette terms over the closed diamond ring,
            # vertex j of 0..4 (first repeated last), fp ordering mirroring
            # stages/pip.py:add_ring_area term-for-term
            f"WITH p AS (SELECT * FROM {diamond_polygons_sql()}), "
            "v AS (SELECT poly_id, j, "
            "CASE j WHEN 0 THEN clat + half_lat WHEN 1 THEN clat "
            "WHEN 2 THEN clat - half_lat WHEN 3 THEN clat "
            "ELSE clat + half_lat END AS vlat, "
            "CASE j WHEN 0 THEN clon WHEN 1 THEN clon + half_lon "
            "WHEN 2 THEN clon WHEN 3 THEN clon - half_lon "
            "ELSE clon END AS vlon "
            "FROM p, (SELECT CAST(UNNEST(RANGE(5)) AS BIGINT) AS j)), "
            "t AS (SELECT poly_id, "
            "(RADIANS(LEAD(vlon) OVER w) - RADIANS(vlon)) * "
            "(2.0 + SIN(RADIANS(vlat)) + SIN(RADIANS(LEAD(vlat) OVER w))) AS term "
            "FROM v WINDOW w AS (PARTITION BY poly_id ORDER BY j) "
            "QUALIFY LEAD(vlat) OVER w IS NOT NULL) "
            "SELECT poly_id, "
            "ROUND(ABS(SUM(term)) * (6371.009 * 6371.009) / 2.0, 3) AS area_km2 "
            "FROM t GROUP BY poly_id"
        ),
        "pip_join": (
            f"SELECT d.doc_id, p.poly_id FROM documents d, {diamond_polygons_sql()} p "
            f"WHERE ABS({lat} - p.clat) / p.half_lat + ABS({lon} - p.clon) / p.half_lon < 1.0"
        ),
        "bearing_origin": f"SELECT doc_id, ROUND({brg}, 6) AS brg FROM documents",
        "polar_caps": (
            f"SELECT d.doc_id, c.cap_id FROM documents d, "
            f"(SELECT 0 AS cap_id, 1 AS pole, 15.0 AS colat UNION ALL "
            f"SELECT 1, -1, 20.0) c "
            f"WHERE (c.pole = 1 AND (90.0 - {lat}) <= c.colat) "
            f"OR (c.pole = -1 AND (90.0 + {lat}) <= c.colat)"
        ),
        "dist_table": (
            f"SELECT q.query_id, d.doc_id, "
            f"ROUND({hav_q.replace('doc_id', 'd.doc_id')} / 1000.0, 6) AS dist_km "
            f"FROM documents d, {qpts6} q"
        ),
        "close_pairs": (
            f"SELECT a.doc_id AS id_left, b.doc_id AS id_right, "
            f"ROUND({hav_ab} / 1000.0, 6) AS dist_km "
            f"FROM documents a, documents b "
            f"WHERE a.doc_id < b.doc_id AND {hav_ab} <= {PAIR_DIST_M}"
        ),
        "dedup_exact": (
            "SELECT md5(text) AS text_hash, MIN(doc_id) AS keep_id, "
            "CAST(COUNT(*) AS BIGINT) AS n_dups FROM documents GROUP BY 1"
        ),
        "token_counts": (
            "SELECT doc_id, CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT) "
            "AS n_tokens FROM documents"
        ),
        "quality": (
            "SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_q, "
            "CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS n_spaces, "
            "CAST(FLOOR(CAST(length(text) - length(replace(text, ' ', '')) AS DOUBLE) "
            "* 1000000.0 / GREATEST(length(text), 1)) AS BIGINT) AS space_ratio_ppm "
            "FROM documents"
        ),
        "lang_counts": (
            "SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY 1"
        ),
        "source_stats": (
            "SELECT source, CAST(SUM(n_chars) AS BIGINT) AS sum_chars, "
            "CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY 1"
        ),
        "knn_graph": (
            "SELECT vec_id, nbr_id, rank FROM ("
            "SELECT q.vec_id AS vec_id, e.vec_id AS nbr_id, "
            "ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY "
            "ROUND(-list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), "
            "CAST(q.embedding AS DOUBLE[])), 6), e.vec_id) AS rank "
            "FROM embeddings e, embeddings q WHERE e.vec_id <> q.vec_id"
            ") WHERE rank <= 3"
        ),
        "knn_graph_blocked": (
            # identical oracle to knn_graph: the blocked path's contract is
            # "same edge list, no broadcast budget"
            "SELECT vec_id, nbr_id, rank FROM ("
            "SELECT q.vec_id AS vec_id, e.vec_id AS nbr_id, "
            "ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY "
            "ROUND(-list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), "
            "CAST(q.embedding AS DOUBLE[])), 6), e.vec_id) AS rank "
            "FROM embeddings e, embeddings q WHERE e.vec_id <> q.vec_id"
            ") WHERE rank <= 3"
        ),
        "ann_join": (
            "SELECT query_id, vec_id, rank FROM ("
            "SELECT q.vec_id AS query_id, e.vec_id, ROW_NUMBER() OVER ("
            "PARTITION BY q.vec_id ORDER BY "
            "ROUND(-list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), "
            "CAST(q.embedding AS DOUBLE[])), 6), e.vec_id) AS rank "
            "FROM embeddings e, (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 50) q"
            ") WHERE rank <= 5"
        ),
        "ann_topk": (
            f"SELECT query_id, vec_id, rank FROM ("
            f"SELECT q.vec_id AS query_id, e.vec_id, ROW_NUMBER() OVER ("
            f"PARTITION BY q.vec_id ORDER BY "
            f"ROUND(-list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), "
            f"CAST(q.embedding AS DOUBLE[])), 6), e.vec_id) AS rank "
            f"FROM embeddings e, (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5) q"
            f") WHERE rank <= {ANN_K}"
        ),
        "embed_near_dup": (
            f"SELECT a.vec_id AS id_a, b.vec_id AS id_b, "
            f"ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
            f"CAST(b.embedding AS DOUBLE[])), 6) AS sim "
            f"FROM embeddings a, embeddings b WHERE a.vec_id < b.vec_id AND "
            f"list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
            f"CAST(b.embedding AS DOUBLE[])) >= {NEAR_DUP_T}"
        ),
        "embed_near_dup_blocked": (
            # same ground truth as embed_near_dup — the engine variants
            # differ only in distribution strategy
            f"SELECT a.vec_id AS id_a, b.vec_id AS id_b, "
            f"ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
            f"CAST(b.embedding AS DOUBLE[])), 6) AS sim "
            f"FROM embeddings a, embeddings b WHERE a.vec_id < b.vec_id AND "
            f"list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
            f"CAST(b.embedding AS DOUBLE[])) >= {NEAR_DUP_T}"
        ),
        "revenue_heatmap": (
            lambda cl: (
                f"SELECT {cl} AS cell, "
                f"CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) "
                f"AS revenue_cents, CAST(COUNT(*) AS BIGINT) AS n_orders "
                f"FROM orders GROUP BY 1"
            )
        )(cell_sql(*geocode_sql("o_custkey"), CELL_DEG)),
        "q1_pricing": (
            "SELECT l_returnflag, l_linestatus, "
            "CAST(SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty, "
            "CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) "
            "AS sum_price_cents, CAST(COUNT(*) AS BIGINT) AS n "
            "FROM lineitem GROUP BY 1, 2"
        ),
        "top_customers": (
            "SELECT c.c_custkey, c.c_name, j.total_cents, j.n_orders FROM ("
            "SELECT o_custkey, CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) "
            "AS BIGINT) AS total_cents, CAST(COUNT(*) AS BIGINT) AS n_orders "
            "FROM orders GROUP BY 1) j JOIN customer c ON c.c_custkey = j.o_custkey "
            "ORDER BY j.total_cents DESC, c.c_custkey LIMIT 10"
        ),
        "orders_by_month": (
            "SELECT CAST(YEAR(o_orderdate) * 100 + MONTH(o_orderdate) AS BIGINT) AS ym, "
            "CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents, "
            "CAST(COUNT(*) AS BIGINT) AS n_orders FROM orders GROUP BY 1"
        ),
        "events_agg": (
            "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events, "
            "CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types, "
            "CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) "
            "AS sum_value_cents FROM events GROUP BY 1"
        ),
        "filter_project": (
            "SELECT l_orderkey, l_partkey, l_quantity FROM lineitem WHERE l_quantity > 45.0"
        ),
        "order_lines_join": (
            "SELECT o.o_orderkey, o.o_orderpriority, l.l_linenumber, l.l_quantity "
            "FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey"
        ),
        "bloom_join": (
            # the Bloom prefilter is exact-preserving (no false negatives;
            # false positives fail the key match), so the mirror is the
            # plain filtered join
            "SELECT l.l_linenumber, "
            "CAST(SUM(CAST(FLOOR(l.l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty, "
            "CAST(COUNT(*) AS BIGINT) AS n "
            "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
            "WHERE o.o_orderpriority = '1-URGENT' GROUP BY 1"
        ),
        "redacted_texts": _redacted_texts_sql(),
        "heavy_custkeys": (
            # 1/1024 = 0.0009765625 is a power of two, exactly representable
            # in both DOUBLE and DECIMAL — the threshold value is identical
            # on both sides, so >= agrees bit-for-bit
            "SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS cnt FROM orders "
            "GROUP BY o_custkey "
            "HAVING COUNT(*) >= CAST(0.0009765625 AS DOUBLE) * "
            "(SELECT COUNT(*) FROM orders)"
        ),
        "token_df": (
            "SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM ("
            "SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS token "
            "FROM documents) WHERE token <> '' GROUP BY token"
        ),
        "rep_stats": (
            # exact INTEGER repetition counts — no rounding convention at
            # all (count ratios can land exactly on a decimal half-ulp where
            # half-even vs half-away diverge; integers sidestep the class).
            # Engine bigrams are adjacency in the empty-filtered token
            # stream; texts only produce empty tokens at whitespace edges,
            # so LEAD over pos-ordered filtered tokens is the same sequence.
            "WITH arrs AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS a "
            "FROM documents), "
            "raw AS (SELECT doc_id, unnest(a) AS tok, unnest(range(1, len(a)+1)) AS pos "
            "FROM arrs), "
            "toks AS (SELECT doc_id, tok, pos FROM raw WHERE tok <> ''), "
            "base AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens, "
            "CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_distinct FROM toks GROUP BY doc_id), "
            "tok_top AS (SELECT doc_id, CAST(MAX(c) AS BIGINT) AS top_tok FROM ("
            "SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY doc_id, tok) "
            "GROUP BY doc_id), "
            "bi AS (SELECT doc_id, tok AS t1, "
            "LEAD(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS t2 FROM toks), "
            "bi_top AS (SELECT doc_id, CAST(MAX(c) AS BIGINT) AS top_bigram FROM ("
            "SELECT doc_id, t1, t2, COUNT(*) AS c FROM bi WHERE t2 IS NOT NULL "
            "GROUP BY doc_id, t1, t2) GROUP BY doc_id) "
            "SELECT b.doc_id, b.n_tokens, b.n_distinct, t.top_tok, "
            "COALESCE(bt.top_bigram, CAST(0 AS BIGINT)) AS top_bigram "
            "FROM base b JOIN tok_top t USING (doc_id) "
            "LEFT JOIN bi_top bt USING (doc_id)"
        ),
        "contaminated": (
            # engine matches 61-bit Horner window fingerprints; shingle
            # STRING equality (tokens cannot contain the ' ' joiner) ⇔
            # token-sequence equality ⇔ fingerprint equality modulo a ~2^-61
            # polynomial collision
            "WITH arrs AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS a "
            "FROM documents), "
            "raw AS (SELECT doc_id, unnest(a) AS tok, unnest(range(1, len(a)+1)) AS pos "
            "FROM arrs), "
            "toks AS (SELECT doc_id, tok, pos FROM raw WHERE tok <> ''), "
            "seq AS (SELECT doc_id, tok, "
            "ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS p FROM toks), "
            "sh AS (SELECT doc_id, tok || ' ' || LEAD(tok, 1) OVER w || ' ' || "
            "LEAD(tok, 2) OVER w AS s FROM seq "
            "WINDOW w AS (PARTITION BY doc_id ORDER BY p) "
            "QUALIFY LEAD(tok, 2) OVER w IS NOT NULL), "
            "bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 101 = 7), "
            "hits AS (SELECT DISTINCT d.doc_id, d.s FROM sh d JOIN bench b ON d.s = b.s "
            "WHERE d.doc_id % 101 <> 7) "
            "SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits FROM hits GROUP BY doc_id"
        ),
        "token_entropy": (
            "WITH raw AS (SELECT doc_id, "
            "unnest(string_split_regex(lower(text), '\\s+')) AS tok FROM documents), "
            "toks AS (SELECT doc_id, tok FROM raw WHERE tok <> ''), "
            "cnt AS (SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2), "
            "tot AS (SELECT doc_id, SUM(c) AS n FROM cnt GROUP BY doc_id), "
            "e AS (SELECT c.doc_id, SUM(-(CAST(c.c AS DOUBLE) / t.n) * "
            "LN(CAST(c.c AS DOUBLE) / t.n)) AS ent "
            "FROM cnt c JOIN tot t USING (doc_id) GROUP BY c.doc_id) "
            "SELECT d.doc_id, ROUND(COALESCE(e.ent, 0.0), 6) AS entropy "
            "FROM documents d LEFT JOIN e USING (doc_id)"
        ),
        "jaccard_pairs": (
            # threshold form of shingle_pairs: same 4-gram distinct-window
            # relation, Jaccard = n_common / (n_a + n_b − n_common) as
            # EXACT integer→double arithmetic (sums < 2^53) — no rounding
            "WITH arrs AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS a "
            "FROM documents), "
            "raw AS (SELECT doc_id, unnest(a) AS tok, unnest(range(1, len(a)+1)) AS pos "
            "FROM arrs), "
            "toks AS (SELECT doc_id, tok, pos FROM raw WHERE tok <> ''), "
            "sh AS (SELECT doc_id, tok || ' ' || LEAD(tok, 1) OVER w || ' ' || "
            "LEAD(tok, 2) OVER w || ' ' || LEAD(tok, 3) OVER w AS s FROM toks "
            "WINDOW w AS (PARTITION BY doc_id ORDER BY pos) "
            "QUALIFY LEAD(tok, 3) OVER w IS NOT NULL), "
            "d AS (SELECT DISTINCT doc_id, s FROM sh), "
            "cnt AS (SELECT doc_id, COUNT(*) AS nw FROM d GROUP BY doc_id), "
            "p AS (SELECT a.doc_id AS ida, b.doc_id AS idb, "
            "CAST(COUNT(*) AS BIGINT) AS n_common FROM d a "
            "JOIN d b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2) "
            "SELECT p.ida AS id_a, p.idb AS id_b, p.n_common, "
            "CAST(p.n_common AS DOUBLE) / "
            "CAST(ca.nw + cb.nw - p.n_common AS DOUBLE) AS jaccard "
            "FROM p JOIN cnt ca ON ca.doc_id = p.ida "
            "JOIN cnt cb ON cb.doc_id = p.idb "
            "WHERE CAST(p.n_common AS DOUBLE) / "
            "CAST(ca.nw + cb.nw - p.n_common AS DOUBLE) >= 0.2"
        ),
        "shingle_pairs": (
            # exact INTEGER shared-window counts — same fingerprint⇔string
            # equivalence as `contaminated` (4-gram windows here)
            "WITH arrs AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS a "
            "FROM documents), "
            "raw AS (SELECT doc_id, unnest(a) AS tok, unnest(range(1, len(a)+1)) AS pos "
            "FROM arrs), "
            "toks AS (SELECT doc_id, tok, pos FROM raw WHERE tok <> ''), "
            "sh AS (SELECT doc_id, tok || ' ' || LEAD(tok, 1) OVER w || ' ' || "
            "LEAD(tok, 2) OVER w || ' ' || LEAD(tok, 3) OVER w AS s FROM toks "
            "WINDOW w AS (PARTITION BY doc_id ORDER BY pos) "
            "QUALIFY LEAD(tok, 3) OVER w IS NOT NULL), "
            "d AS (SELECT DISTINCT doc_id, s FROM sh) "
            "SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
            "CAST(COUNT(*) AS BIGINT) AS n_common "
            "FROM d a JOIN d b ON a.s = b.s AND a.doc_id < b.doc_id "
            "GROUP BY 1, 2 HAVING COUNT(*) >= 2"
        ),
        "dup_clusters": (
            # transitive closure of the >=3-shared-window pair relation;
            # MIN over reachable node ids ≡ the engine's min-label fixpoint
            "WITH RECURSIVE arrs AS (SELECT doc_id, "
            "string_split_regex(lower(text), '\\s+') AS a FROM documents), "
            "raw AS (SELECT doc_id, unnest(a) AS tok, unnest(range(1, len(a)+1)) AS pos "
            "FROM arrs), "
            "toks AS (SELECT doc_id, tok, pos FROM raw WHERE tok <> ''), "
            "sh AS (SELECT doc_id, tok || ' ' || LEAD(tok, 1) OVER w || ' ' || "
            "LEAD(tok, 2) OVER w || ' ' || LEAD(tok, 3) OVER w AS s FROM toks "
            "WINDOW w AS (PARTITION BY doc_id ORDER BY pos) "
            "QUALIFY LEAD(tok, 3) OVER w IS NOT NULL), "
            "d AS (SELECT DISTINCT doc_id, s FROM sh), "
            "pairs AS (SELECT a.doc_id AS ida, b.doc_id AS idb "
            "FROM d a JOIN d b ON a.s = b.s AND a.doc_id < b.doc_id "
            "GROUP BY 1, 2 HAVING COUNT(*) >= 3), "
            "sym AS (SELECT ida AS src, idb AS dst FROM pairs "
            "UNION ALL SELECT idb, ida FROM pairs), "
            "nodes AS (SELECT DISTINCT src AS node FROM sym), "
            "reach(node, r) AS (SELECT node, node FROM nodes "
            "UNION SELECT s.dst, reach.r FROM reach JOIN sym s ON s.src = reach.node) "
            "SELECT node AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY node"
        ),
        "seq_packing": (
            # the distributed two-level scan ≡ SQL's global ordered window
            "WITH c AS (SELECT doc_id, "
            "CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens "
            "FROM documents), "
            "nz AS (SELECT * FROM c WHERE n_tokens > 0), "
            "o AS (SELECT doc_id, n_tokens, "
            "CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_start "
            "FROM nz) "
            "SELECT doc_id, n_tokens, tok_start, "
            "CAST(tok_start // 512 AS BIGINT) AS pack_first, "
            "CAST((tok_start + n_tokens - 1) // 512 AS BIGINT) AS pack_last FROM o"
        ),
        "capped_sources": (
            # same hash-rank ordering bit-for-bit (cap_rank_sql mirrors the
            # engine's multiplier arithmetic); id asc breaks rank ties
            "SELECT doc_id, source FROM ("
            "SELECT doc_id, source, ROW_NUMBER() OVER (PARTITION BY source "
            f"ORDER BY {cap_rank_sql('doc_id')}, doc_id) AS rn "
            "FROM documents) WHERE rn <= 10"
        ),
        "dedup_lines": (
            # same synthesized line structure (replace is left-to-right
            # non-overlapping in both engines), line-equality on the
            # STRING, order-preserving reassembly; docs with no surviving
            # line drop out of the GROUP BY on both sides
            "WITH d AS (SELECT doc_id, replace(text, ' data ', chr(10)) AS t "
            "FROM documents), "
            "l AS (SELECT doc_id, i AS idx, parts[i] AS line "
            "FROM (SELECT doc_id, string_split(t, chr(10)) AS parts FROM d), "
            "UNNEST(generate_series(1, len(parts))) AS u(i)), "
            "dup AS (SELECT line FROM l GROUP BY line "
            "HAVING count(DISTINCT doc_id) >= 2) "
            "SELECT doc_id, string_agg(line, chr(10) ORDER BY idx) AS clean_text "
            "FROM l ANTI JOIN dup USING (line) GROUP BY doc_id"
        ),
        "longest_docs": (
            "SELECT doc_id, n_chars FROM documents "
            "ORDER BY n_chars DESC, doc_id LIMIT 20"
        ),
        "user_top_event": (
            "SELECT user_id, mode_value, mode_count FROM ("
            "SELECT user_id, event_type AS mode_value, "
            "CAST(COUNT(*) AS BIGINT) AS mode_count, "
            "ROW_NUMBER() OVER (PARTITION BY user_id "
            "ORDER BY COUNT(*) DESC, event_type) AS rn "
            "FROM events GROUP BY user_id, event_type) WHERE rn = 1"
        ),
        "user_event_types": (
            "SELECT user_id, CAST(COUNT(DISTINCT event_type) AS BIGINT) "
            "AS n_types FROM events GROUP BY user_id"
        ),
        "lang_source_pivot": (
            # IS NULL folded into the other-bucket CASE to mirror the
            # engine's fill_null(eq, False) exactly
            "SELECT source, "
            "CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS en_n, "
            "CAST(SUM(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS BIGINT) AS de_n, "
            "CAST(SUM(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END) AS BIGINT) AS fr_n, "
            "CAST(SUM(CASE WHEN lang IS NULL OR lang NOT IN ('en','de','fr') "
            "THEN 1 ELSE 0 END) AS BIGINT) AS other_n, "
            "CAST(COUNT(*) AS BIGINT) AS n "
            "FROM documents GROUP BY source"
        ),
        "pricing_rollup": (
            "SELECT l_returnflag, l_linestatus, "
            "CAST(SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty, "
            "CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS grouping_id "
            "FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)"
        ),
        "qty_price_corr": (
            "SELECT l_returnflag, ROUND(CORR(l_quantity, l_extendedprice), 6) "
            "AS corr FROM lineitem GROUP BY l_returnflag"
        ),
        "qty_price_covar": (
            "SELECT l_returnflag, "
            "ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 2) AS covar "
            "FROM lineitem GROUP BY l_returnflag"
        ),
        "event_gaps": (
            "SELECT user_id, event_id, "
            "CAST(epoch_us(ts) - LAG(epoch_us(ts)) OVER ("
            "PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS BIGINT) "
            "AS gap_us FROM events"
        ),
        "track_length": (
            # integer-mm legs (haversine_sql's documented 1e-3 m comparison
            # resolution) make the per-user SUM order-independent; argument
            # order (prev, curr) matches the kernel call in the stage
            f"WITH pts AS (SELECT user_id, event_id, ts, {elat} AS lat, "
            f"{elon} AS lon FROM events), "
            "lagd AS (SELECT user_id, lat, lon, LAG(lat) OVER w AS plat, "
            "LAG(lon) OVER w AS plon FROM pts "
            "WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)), "
            f"legs AS (SELECT user_id, CAST(FLOOR("
            f"{haversine_sql('plat', 'plon', 'lat', 'lon')} * 1000.0 + 0.5) "
            "AS BIGINT) AS leg_mm FROM lagd WHERE plat IS NOT NULL) "
            "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_legs, "
            "CAST(SUM(leg_mm) AS BIGINT) AS track_mm FROM legs GROUP BY user_id"
        ),
        "domain_stats": _domain_stats_sql(),
        "link_triangles": (
            # wedge-close with canonical a<b<c: each triangle counted once
            # at its middle vertex, grouped by the smallest vertex
            "WITH e0 AS (SELECT doc_id AS s, "
            "((doc_id * 7 + 13 * j + 1) % (SELECT COUNT(*) FROM documents)) AS t "
            "FROM documents, (SELECT UNNEST([0, 1, 2]) AS j)), "
            "e AS (SELECT DISTINCT LEAST(s, t) AS a, GREATEST(s, t) AS b "
            "FROM e0 WHERE s <> t), "
            "tri AS (SELECT e1.a AS a FROM e e1 "
            "JOIN e e2 ON e2.a = e1.b "
            "JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b) "
            "SELECT a AS node, CAST(COUNT(*) AS BIGINT) AS n_triangles "
            "FROM tri GROUP BY a"
        ),
        "link_hops": (
            # depth-capped recursive BFS; UNION dedups (node, d) states so
            # cycles terminate; MIN(d) per node is the hop distance
            "WITH RECURSIVE e AS ("
            "SELECT doc_id AS s, "
            "((doc_id * 7 + 13 * j + 1) % (SELECT COUNT(*) FROM documents)) AS t "
            "FROM documents, (SELECT UNNEST([0, 1, 2]) AS j)), "
            "reach(node, d) AS ("
            "SELECT CAST(UNNEST([0, 1, 2]) AS BIGINT), 0 "
            "UNION "
            "SELECT e.t, reach.d + 1 FROM reach JOIN e ON e.s = reach.node "
            "WHERE reach.d < 40) "
            "SELECT node, CAST(MIN(d) AS BIGINT) AS hops FROM reach GROUP BY node"
        ),
        "link_components": (
            # same-host edge subgraph of the synthetic link graph, closed
            # under the same min-reachable recursive CTE as dup_clusters
            "WITH RECURSIVE e0 AS ("
            "SELECT doc_id AS s, "
            "((doc_id * 7 + 13 * j + 1) % (SELECT COUNT(*) FROM documents)) AS t "
            "FROM documents, (SELECT UNNEST([0, 1, 2]) AS j) "
            "WHERE (doc_id % 50) = "
            "(((doc_id * 7 + 13 * j + 1) % (SELECT COUNT(*) FROM documents)) % 50)), "
            "sym AS (SELECT s AS src, t AS dst FROM e0 "
            "UNION SELECT t, s FROM e0), "
            "nodes AS (SELECT DISTINCT src AS node FROM sym), "
            "reach(node, r) AS (SELECT node, node FROM nodes "
            "UNION SELECT s.dst, reach.r FROM reach JOIN sym s ON s.src = reach.node) "
            "SELECT node, MIN(r) AS cluster_id FROM reach GROUP BY node"
        ),
        "lang_id": _lang_id_sql(),
        "global_median": "SELECT MEDIAN(value) AS median_value FROM events",
        "session_spans": (
            "WITH o AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events), "
            "f AS (SELECT user_id, event_id, us, "
            "CASE WHEN LAG(us) OVER w IS NULL "
            "OR us - LAG(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS brk "
            "FROM o WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)), "
            "s AS (SELECT user_id, us, SUM(brk) OVER (PARTITION BY user_id "
            "ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM f) "
            "SELECT user_id, CAST(sid AS BIGINT) AS session_idx, "
            "CAST(MIN(us) AS BIGINT) AS start_us, CAST(MAX(us) AS BIGINT) AS end_us, "
            "CAST(COUNT(*) AS BIGINT) AS n_events "
            "FROM s GROUP BY user_id, sid"
        ),
        "lang_samples": _lang_samples_sql(),
        "weekly_actives": (
            "WITH m AS (SELECT DISTINCT user_id, "
            "CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day FROM events), "
            "days AS (SELECT DISTINCT day FROM m) "
            "SELECT d.day, CAST(COUNT(DISTINCT m.user_id) AS BIGINT) AS n_active_7d "
            "FROM days d JOIN m ON m.day BETWEEN d.day - 6 AND d.day "
            "GROUP BY d.day"
        ),
        "trending_daily": (
            "WITH c AS (SELECT "
            "CAST(YEAR(ts) * 10000 + MONTH(ts) * 100 + DAY(ts) AS BIGINT) AS ymd, "
            "event_type, CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1, 2) "
            "SELECT ymd, event_type, n, "
            "CAST(ROW_NUMBER() OVER (PARTITION BY ymd "
            "ORDER BY n DESC, event_type) AS BIGINT) AS rank "
            "FROM c QUALIFY rank <= 3"
        ),
        "fingerprints": _fingerprints_sql(),
        "colocation": (
            f"WITH e AS (SELECT event_id, user_id, ts, {elat} AS lat, "
            f"{elon} AS lon FROM events WHERE event_type = 'click') "
            "SELECT a.event_id AS id_left, b.event_id AS id_right, "
            f"ROUND({haversine_sql('a.lat', 'a.lon', 'b.lat', 'b.lon')} / 1000.0, 6) "
            "AS dist_km, "
            "CAST(ABS(epoch_us(a.ts) - epoch_us(b.ts)) AS BIGINT) AS dt_us "
            "FROM e a JOIN e b ON a.event_id < b.event_id "
            "AND a.user_id <> b.user_id "
            f"WHERE {haversine_sql('a.lat', 'a.lon', 'b.lat', 'b.lon')} <= {PAIR_DIST_M} "
            "AND ABS(epoch_us(a.ts) - epoch_us(b.ts)) <= 86400000000"
        ),
        "value_outliers": (
            "WITH s AS (SELECT user_id, AVG(value) AS mu, "
            "STDDEV_SAMP(value) AS sd FROM events GROUP BY user_id) "
            "SELECT e.user_id, e.event_id, "
            "ROUND((e.value - s.mu) / s.sd, 6) AS z "
            "FROM events e JOIN s USING (user_id) "
            "WHERE s.sd > 0 AND ABS((e.value - s.mu) / s.sd) > 2.5"
        ),
        "source_dedup_ratio": (
            "SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, "
            "CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_distinct, "
            "CAST(COUNT(*) - COUNT(DISTINCT md5(text)) AS BIGINT) AS n_dups "
            "FROM documents GROUP BY source"
        ),
        "user_first_last": (
            "WITH r AS (SELECT user_id, event_id, "
            "ROW_NUMBER() OVER (PARTITION BY user_id "
            "ORDER BY epoch_us(ts), event_id) AS rn, "
            "ROW_NUMBER() OVER (PARTITION BY user_id "
            "ORDER BY epoch_us(ts) DESC, event_id DESC) AS rrn FROM events) "
            "SELECT user_id, "
            "CAST(MAX(CASE WHEN rn = 1 THEN event_id END) AS BIGINT) AS first_event, "
            "CAST(MAX(CASE WHEN rrn = 1 THEN event_id END) AS BIGINT) AS last_event "
            "FROM r GROUP BY user_id"
        ),
        "tile_pyramid": (
            # 1° grid is 180×360; factor-f parent = (lat//f)·(360/f) + lon//f
            f"WITH c1 AS (SELECT {cell_sql(lat, lon, 1.0)} AS cell FROM documents), "
            "f AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_docs "
            "FROM c1 GROUP BY cell) "
            "SELECT CAST(1 AS BIGINT) AS level, cell, n_docs FROM f "
            "UNION ALL SELECT CAST(2 AS BIGINT), "
            "((cell // 360) // 2) * 180 + (cell % 360) // 2, "
            "CAST(SUM(n_docs) AS BIGINT) FROM f GROUP BY 2 "
            "UNION ALL SELECT CAST(4 AS BIGINT), "
            "((cell // 360) // 4) * 90 + (cell % 360) // 4, "
            "CAST(SUM(n_docs) AS BIGINT) FROM f GROUP BY 2"
        ),
        "cell_lang_entropy": (
            f"WITH g AS (SELECT {cell} AS cell, lang FROM documents), "
            "c AS (SELECT cell, lang, COUNT(*) AS c FROM g GROUP BY 1, 2), "
            "t AS (SELECT cell, c, "
            "-(CAST(c AS DOUBLE) / SUM(c) OVER (PARTITION BY cell)) * "
            "LN(CAST(c AS DOUBLE) / SUM(c) OVER (PARTITION BY cell)) AS term "
            "FROM c) "
            "SELECT cell, CAST(SUM(c) AS BIGINT) AS n_docs, "
            "ROUND(SUM(term), 6) AS lang_entropy FROM t GROUP BY cell"
        ),
        "cell_focal": (
            # 3x3 neighbor explode with lon wrap and lat-edge drop (grid is
            # 90 x 180 at 2 deg) — mirrors cells.neighbor_cells semantics
            f"WITH g AS (SELECT {cell} AS cell FROM documents), "
            "cnt AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS n FROM g GROUP BY cell), "
            "nb AS (SELECT ((c.cell // 180) + di) * 180 + "
            "(((c.cell % 180) + dj + 180) % 180) AS cell, c.n "
            "FROM cnt c, (SELECT UNNEST([-1, 0, 1]) AS di), "
            "(SELECT UNNEST([-1, 0, 1]) AS dj) "
            "WHERE (c.cell // 180) + di BETWEEN 0 AND 89), "
            "f AS (SELECT cell, CAST(SUM(n) AS BIGINT) AS focal_n "
            "FROM nb GROUP BY cell) "
            "SELECT f.cell, f.focal_n, cnt.n FROM f JOIN cnt USING (cell)"
        ),
        "cell_areas": (
            # spherical-rectangle area, fp ordering term-for-term with
            # cells.cell_area_km2: ((R·R)·Δλ)·(sin hi − sin lo), band edges
            # associated as ((lat_idx·d) − 90) [+ d]; nlon=180 at 2°
            f"WITH c AS (SELECT {cell} AS cell FROM documents) "
            "SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_docs, "
            "ROUND((6371.009 * 6371.009) * RADIANS(2.0) * ("
            "SIN(RADIANS(CAST(cell // 180 AS DOUBLE) * 2.0 - 90.0 + 2.0)) - "
            "SIN(RADIANS(CAST(cell // 180 AS DOUBLE) * 2.0 - 90.0))), 3) "
            "AS area_km2 FROM c GROUP BY cell"
        ),
        "regional_revenue": (
            "SELECT n_name, "
            "CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5) "
            "AS BIGINT)) AS BIGINT) AS revenue_cents, "
            "CAST(COUNT(*) AS BIGINT) AS n_lines "
            "FROM customer, orders, lineitem, supplier, nation, region "
            "WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey "
            "AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey "
            "AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey "
            "AND r_name = 'ASIA' "
            "AND o_orderdate >= TIMESTAMP '1996-01-01' "
            "AND o_orderdate < TIMESTAMP '1998-01-01' "
            "GROUP BY n_name"
        ),
        "qty_price_fit": (
            "SELECT l_returnflag, "
            "ROUND(REGR_SLOPE(l_extendedprice, l_quantity), 6) AS slope, "
            "ROUND(REGR_INTERCEPT(l_extendedprice, l_quantity), 2) AS intercept "
            "FROM lineitem GROUP BY l_returnflag"
        ),
        "pricing_cube": (
            "SELECT l_returnflag, l_linestatus, "
            "CAST(SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty, "
            "CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS grouping_id "
            "FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)"
        ),
        "balanced_langs": (
            # sample_fraction's formula under a CASE over the stratum key
            "SELECT doc_id, lang, n_chars FROM documents "
            "WHERE (CAST(((doc_id + 7) % 1000000 + 1000000) % 1000000 AS BIGINT)"
            " * 998244353) % 1000000 "
            "< CASE WHEN lang = 'en' THEN 200000 ELSE 1000000 END"
        ),
        "dedup_spans": (
            # positions index the empty-filtered token stream (ROW_NUMBER
            # after the filter — consecutive, so the BETWEEN arithmetic
            # matches the engine's coverage sweep); window identity is the
            # joined token string (the engine ships the Horner hash of the
            # same window — equality coincides absent 61-bit collisions)
            "WITH arrs AS (SELECT doc_id, "
            "string_split_regex(lower(text), '\\s+') AS a FROM documents), "
            "raw AS (SELECT doc_id, unnest(a) AS tok, "
            "unnest(range(1, len(a)+1)) AS rp FROM arrs), "
            "toks AS (SELECT doc_id, tok, ROW_NUMBER() OVER "
            "(PARTITION BY doc_id ORDER BY rp) - 1 AS pos "
            "FROM raw WHERE tok <> ''), "
            "w AS (SELECT doc_id, pos AS s, tok || ' ' || "
            "LEAD(tok,1) OVER win || ' ' || LEAD(tok,2) OVER win || ' ' || "
            "LEAD(tok,3) OVER win || ' ' || LEAD(tok,4) OVER win AS wstr "
            "FROM toks WINDOW win AS (PARTITION BY doc_id ORDER BY pos) "
            "QUALIFY LEAD(tok,4) OVER win IS NOT NULL), "
            "dupw AS (SELECT wstr FROM (SELECT DISTINCT doc_id, wstr FROM w) "
            "GROUP BY wstr HAVING COUNT(*) >= 2), "
            "st AS (SELECT doc_id, s FROM w SEMI JOIN dupw USING (wstr)), "
            "cov AS (SELECT DISTINCT t.doc_id, t.pos FROM toks t JOIN st "
            "ON t.doc_id = st.doc_id AND t.pos BETWEEN st.s AND st.s + 4), "
            "kept AS (SELECT t.doc_id, t.tok, t.pos FROM toks t "
            "ANTI JOIN cov USING (doc_id, pos)) "
            "SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text "
            "FROM kept GROUP BY doc_id"
        ),
        "near_dedup": (
            # survivors = everything minus non-representative cluster
            # members of the recursive-CTE closure (same edge set as
            # dup_clusters)
            "WITH RECURSIVE arrs AS (SELECT doc_id, "
            "string_split_regex(lower(text), '\\s+') AS a FROM documents), "
            "raw AS (SELECT doc_id, unnest(a) AS tok, unnest(range(1, len(a)+1)) AS pos "
            "FROM arrs), "
            "toks AS (SELECT doc_id, tok, pos FROM raw WHERE tok <> ''), "
            "sh AS (SELECT doc_id, tok || ' ' || LEAD(tok, 1) OVER w || ' ' || "
            "LEAD(tok, 2) OVER w || ' ' || LEAD(tok, 3) OVER w AS s FROM toks "
            "WINDOW w AS (PARTITION BY doc_id ORDER BY pos) "
            "QUALIFY LEAD(tok, 3) OVER w IS NOT NULL), "
            "d AS (SELECT DISTINCT doc_id, s FROM sh), "
            "pairs AS (SELECT a.doc_id AS ida, b.doc_id AS idb "
            "FROM d a JOIN d b ON a.s = b.s AND a.doc_id < b.doc_id "
            "GROUP BY 1, 2 HAVING COUNT(*) >= 3), "
            "sym AS (SELECT ida AS src, idb AS dst FROM pairs "
            "UNION ALL SELECT idb, ida FROM pairs), "
            "nodes AS (SELECT DISTINCT src AS node FROM sym), "
            "reach(node, r) AS (SELECT node, node FROM nodes "
            "UNION SELECT s.dst, reach.r FROM reach JOIN sym s ON s.src = reach.node), "
            "cc AS (SELECT node, MIN(r) AS cid FROM reach GROUP BY node) "
            "SELECT doc_id, n_chars FROM documents "
            "WHERE doc_id NOT IN (SELECT node FROM cc WHERE cid <> node)"
        ),
        "tfidf_top3": (
            # the rounded score is the ORDERING KEY on both sides (see
            # stages/text.py:tfidf_topk) so ln() ulp differences can't flip
            # a tie; token asc breaks exact rounded ties deterministically
            "WITH tok AS (SELECT doc_id, token FROM ("
            "SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS token "
            "FROM documents) WHERE token <> ''), "
            "tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token), "
            "df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY token), "
            "n AS (SELECT COUNT(*) AS n_docs FROM documents) "
            "SELECT doc_id, token, score, CAST(rank AS BIGINT) AS rank FROM ("
            "SELECT tf.doc_id, tf.token, "
            "ROUND(tf.tf * LN(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS score, "
            "ROW_NUMBER() OVER (PARTITION BY tf.doc_id ORDER BY "
            "ROUND(tf.tf * LN(CAST(n.n_docs AS DOUBLE) / df.df), 6) DESC, tf.token) AS rank "
            "FROM tf JOIN df USING(token) CROSS JOIN n) t WHERE rank <= 3"
        ),
        "mktsegment_revenue": (
            "SELECT c.c_mktsegment, "
            "CAST(SUM(CAST(FLOOR(o.o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) "
            "AS sum_cents, CAST(COUNT(*) AS BIGINT) AS n_orders "
            "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey GROUP BY 1"
        ),
        "asof_click_view": (
            "SELECT c.event_id, v.view_id FROM "
            "(SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c "
            "ASOF JOIN "
            "(SELECT event_id AS view_id, user_id, ts FROM events WHERE event_type = 'view') v "
            "ON c.user_id = v.user_id AND c.ts >= v.ts"
        ),
        "range_buckets": (
            f"SELECT r.range_id, e.event_id FROM events e, "
            f"(SELECT CAST(UNNEST(RANGE({N_RANGES})) AS BIGINT) AS range_id) r "
            f"WHERE epoch_us(e.ts) >= {EPOCH_2024_US} + r.range_id * {RANGE_STEP_US} "
            f"AND epoch_us(e.ts) < {EPOCH_2024_US} + r.range_id * {RANGE_STEP_US} + {RANGE_LEN_US}"
        ),
        "gc_dist_to_origin": (
            f"SELECT doc_id, "
            f"ROUND({great_circle_sql(lat, lon, str(ORIGIN[0]), str(ORIGIN[1]))} / 1000.0, 6) "
            f"AS dist_km FROM documents"
        ),
        "distinct_parts": "SELECT DISTINCT l_partkey FROM lineitem",
        "dimwise_pairs": (
            lambda dl, dn: (
                f"SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
                f"ROUND({dl} / 1000000.0, 3) AS dlat_km2, "
                f"ROUND({dn} / 1000000.0, 3) AS dlon_km2 "
                f"FROM documents a, documents b "
                f"WHERE a.doc_id < b.doc_id AND b.doc_id < {DIMWISE_MAX_ID} "
                f"AND a.doc_id < {DIMWISE_MAX_ID}"
            )
        )(*haversine_dimwise_sql(lat_a, lon_a, lat_b, lon_b)),
        "clean_corpus": (
            f"WITH keep AS (SELECT MIN(doc_id) AS keep_id FROM documents GROUP BY md5(text)) "
            f"SELECT d.doc_id, CAST(length(regexp_extract_all(d.text, '\\S+')) AS BIGINT) "
            f"AS n_tokens FROM documents d JOIN keep k ON d.doc_id = k.keep_id "
            f"WHERE d.lang = 'en' "
            f"AND length(regexp_extract_all(d.text, '\\S+')) >= {MIN_TOKENS} "
            f"AND FLOOR(CAST(length(d.text) - length(replace(d.text, ' ', '')) AS DOUBLE) "
            f"* 1000000.0 / GREATEST(length(d.text), 1)) <= {MAX_SPACE_PPM}"
        ),
        "curated_corpus": (
            lambda split_expr: (
                _CURATED_CTE
                + f" SELECT doc_id, lang, {split_expr} AS split, clean_text FROM bal"
            )
        )(split_sql()),
        "curated_packed": (
            # the capstone raw-to-packs mirror: curated CTE + token counts
            # of clean_text + the global ordered window + pack arithmetic
            _CURATED_CTE + ", "
            "c2 AS (SELECT doc_id, "
            "CAST(length(regexp_extract_all(clean_text, '\\S+')) AS BIGINT) AS n_tokens "
            "FROM bal), "
            "nz AS (SELECT * FROM c2 WHERE n_tokens > 0), "
            "o AS (SELECT doc_id, n_tokens, "
            "CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_start "
            "FROM nz) "
            "SELECT doc_id, n_tokens, tok_start, "
            "CAST(tok_start // 256 AS BIGINT) AS pack_first, "
            "CAST((tok_start + n_tokens - 1) // 256 AS BIGINT) AS pack_last FROM o"
        ),
        "props_by_type": (
            lambda k_expr: (
                f"SELECT event_type, CAST(SUM({k_expr}) AS BIGINT) AS sum_k, "
                f"CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY event_type"
            )
        )(
            json_int_field_sql("props", "k")
        ),
        "label_centroids": (
            "SELECT label, CAST(i AS BIGINT) AS dim, "
            "ROUND(AVG(CAST(embedding[i] AS DOUBLE)), 6) AS mean_v "
            "FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS u(i) "
            "GROUP BY label, i"
        ),
        "value_histogram": (
            "SELECT CAST(FLOOR(value / 5.0) AS BIGINT) AS bin, "
            "CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1"
        ),
        "snapshot_diff": (
            "WITH newt AS (SELECT o_orderkey, "
            "CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cn FROM orders), "
            "old AS (SELECT o_orderkey, "
            "CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) "
            "+ CASE WHEN o_orderkey % 3 = 0 THEN 100 ELSE 0 END AS co "
            "FROM orders WHERE o_orderkey % 7 <> 0) "
            "SELECT status, CAST(COUNT(*) AS BIGINT) AS n FROM ("
            "SELECT CASE WHEN o.o_orderkey IS NULL THEN 'added' "
            "WHEN n.o_orderkey IS NULL THEN 'removed' "
            "WHEN n.cn <> o.co THEN 'changed' ELSE 'same' END AS status "
            "FROM newt n FULL OUTER JOIN old o ON n.o_orderkey = o.o_orderkey) "
            "GROUP BY status"
        ),
        "user_value_quartiles": (
            "SELECT user_id, event_id, CAST(NTILE(4) OVER ("
            "PARTITION BY user_id ORDER BY value, event_id) AS BIGINT) AS ntile "
            "FROM events"
        ),
        "funnel_users": (
            "WITH a AS (SELECT user_id, epoch_us(ts) AS ta FROM events "
            "WHERE event_type = 'view'), "
            "b AS (SELECT user_id, epoch_us(ts) AS tb FROM events "
            "WHERE event_type = 'purchase') "
            "SELECT DISTINCT a.user_id FROM a JOIN b ON a.user_id = b.user_id "
            "AND b.tb >= a.ta AND b.tb <= a.ta + 3600000000"
        ),
        "nearest_centroid": (
            # same tie contract as the engine: sim rounded to 6, then
            # smallest label (argmax-first over ascending labels)
            "WITH cent AS (SELECT label, i AS dim, "
            "AVG(CAST(embedding[i] AS DOUBLE)) AS mean_v "
            "FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS u(i) "
            "GROUP BY label, i), "
            "cv AS (SELECT label, list(mean_v ORDER BY dim) AS v "
            "FROM cent GROUP BY label) "
            "SELECT vec_id, assigned FROM ("
            "SELECT e.vec_id, c.label AS assigned, "
            "ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY "
            "ROUND(-list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.v), 6), "
            "c.label) AS rn FROM embeddings e CROSS JOIN cv c) WHERE rn = 1"
        ),
        "first_event_hourly": (
            "SELECT user_id, hour, ts_us, event_id FROM ("
            "SELECT user_id, epoch_us(ts) // 3600000000 AS hour, "
            "epoch_us(ts) AS ts_us, event_id, "
            "ROW_NUMBER() OVER (PARTITION BY user_id, epoch_us(ts) // 3600000000 "
            "ORDER BY epoch_us(ts), event_id) AS rn FROM events) WHERE rn = 1"
        ),
        "weighted_sample": (
            "SELECT doc_id, n_chars FROM documents "
            "WHERE (CAST(((doc_id + 7) % 1000000 + 1000000) % 1000000 AS BIGINT)"
            " * 998244353) % 1000000 < LEAST(1000000, n_chars * 2000)"
        ),
        "above_median_docs": (
            "SELECT d.doc_id, d.lang, d.n_chars FROM documents d "
            "JOIN (SELECT lang, MEDIAN(n_chars) AS med FROM documents "
            "GROUP BY lang) t USING (lang) WHERE d.n_chars > t.med"
        ),
        "events_union": (
            "SELECT event_id, user_id FROM events "
            "WHERE event_type IN ('click', 'purchase')"
        ),
        "user_value_range": (
            "SELECT user_id, MIN(value) AS min_value, MAX(value) AS max_value "
            "FROM events GROUP BY 1"
        ),
        "cell_doc_lists": (
            lambda cell8: (
                f"SELECT {cell8} AS cell, "
                f"STRING_AGG(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS doc_list "
                f"FROM documents GROUP BY 1"
            )
        )(cell_sql(lat, lon, 8.0)),
        "dataset_splits": (
            lambda split_expr: (
                f"SELECT {split_expr} AS split, "
                f"CAST(SUM(length(regexp_extract_all(text, '\\S+'))) AS BIGINT) AS sum_tokens, "
                f"CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY 1"
            )
        )(split_sql()),
        "sample_10pct": (
            "SELECT doc_id, n_chars FROM documents "
            "WHERE (CAST(((doc_id + 7) % 1000000 + 1000000) % 1000000 AS BIGINT) * 998244353) % 1000000 < 100000"
        ),
        "sample_exact_k": _sample_exact_k_sql(),
        "canonical_urls": (
            lambda canon: (
                f"WITH raw AS (SELECT {_CANON_URL_BUILD_SQL} AS url FROM documents) "
                f"SELECT {canon} AS canonical_url, CAST(COUNT(*) AS BIGINT) AS n "
                "FROM raw GROUP BY 1"
            )
        )(
            canonicalize_urls_sql("url")
        ),
        "link_degrees": (
            "WITH e AS ("
            "  SELECT ((doc_id * 7 + 13 * j + 1) % (SELECT COUNT(*) FROM documents)) AS t"
            "  FROM documents, (SELECT UNNEST([0, 1, 2]) AS j)"
            ") "
            "SELECT 'https://host' || CAST(t % 50 AS VARCHAR) || '.example.com/d/' "
            "|| CAST(t AS VARCHAR) AS href, CAST(COUNT(*) AS BIGINT) AS n_links "
            "FROM e GROUP BY 1"
        ),
        "user_median_value": (
            "SELECT user_id, ROUND(MEDIAN(value), 6) AS median_value "
            "FROM events GROUP BY 1"
        ),
        "user_p90_value": (
            "SELECT user_id, ROUND(QUANTILE_CONT(value, 0.9), 6) AS p90_value "
            "FROM events GROUP BY 1"
        ),
        "rolling_counts": (
            "SELECT user_id, event_id, CAST(COUNT(*) OVER ("
            "PARTITION BY user_id ORDER BY epoch_us(ts) "
            "RANGE BETWEEN 21599999999 PRECEDING AND CURRENT ROW) AS BIGINT) "
            "AS n_in_window FROM events WHERE user_id < 30"
        ),
        "running_totals": (
            "SELECT user_id, event_id, "
            "CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS running_cents "
            "FROM events WHERE user_id < 20"
        ),
        "semi_open_orders": (
            "SELECT c.c_custkey, c.c_name FROM customer c WHERE EXISTS ("
            "SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey "
            "AND o.o_orderstatus = 'P')"
        ),
        "anti_max_qty": (
            "SELECT p.p_partkey, p.p_name FROM part p WHERE NOT EXISTS ("
            "SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey "
            "AND l.l_quantity > 49.0)"
        ),
        "late_events": (
            "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events, "
            "CAST(SUM(CASE WHEN late THEN 1 ELSE 0 END) AS BIGINT) AS n_late "
            "FROM (SELECT user_id, epoch_us(ts) < "
            "MAX(epoch_us(ts)) OVER (PARTITION BY user_id) - "
            f"{LATE_WATERMARK_US} AS late FROM events) GROUP BY user_id"
        ),
        "outer_join": (
            "WITH big AS (SELECT o_custkey, COUNT(*) AS n_big FROM orders "
            "WHERE o_totalprice > 400000.0 GROUP BY o_custkey), "
            "rich AS (SELECT c_custkey, CAST(FLOOR(c_acctbal * 100.0 + 0.5) "
            "AS BIGINT) AS bal_cents FROM customer WHERE c_acctbal > 5000.0) "
            "SELECT COALESCE(b.o_custkey, r.c_custkey) AS o_custkey, "
            "b.n_big, r.bal_cents "
            "FROM big b FULL OUTER JOIN rich r ON b.o_custkey = r.c_custkey"
        ),
        "top_events_per_user": (
            "SELECT user_id, event_id, rank FROM ("
            "SELECT user_id, event_id, ROW_NUMBER() OVER ("
            "PARTITION BY user_id ORDER BY value DESC, event_id) AS rank "
            "FROM events) WHERE rank <= 3"
        ),
        "hopping_windows": (
            "SELECT user_id, epoch_us(ts) // 3600000000 - j AS window_key, "
            "CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) "
            "AS sum_value_cents, CAST(COUNT(*) AS BIGINT) AS n "
            "FROM events, (SELECT CAST(UNNEST(RANGE(3)) AS BIGINT) AS j) "
            "GROUP BY 1, 2"
        ),
        "normalized_texts": (
            "SELECT doc_id, TRIM(REGEXP_REPLACE(LOWER(text), '\\s+', ' ', 'g')) "
            "AS norm_text FROM documents"
        ),
        "hopping_offset": (
            "SELECT user_id, "
            f"(epoch_us(ts) - {HOP_OFFSET_US}) // 3600000000 - j AS window_key, "
            "CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) "
            "AS sum_value_cents, CAST(COUNT(*) AS BIGINT) AS n "
            "FROM events, (SELECT CAST(UNNEST(RANGE(3)) AS BIGINT) AS j) "
            "GROUP BY 1, 2"
        ),
        "events_hourly": (
            "SELECT user_id, epoch_us(ts) // 3600000000 AS window_key, "
            "CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) "
            "AS sum_value_cents, CAST(COUNT(*) AS BIGINT) AS n "
            "FROM events GROUP BY 1, 2"
        ),
        "sessions": (
            "SELECT user_id, CAST(SUM(CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 "
            "THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions FROM ("
            "SELECT user_id, epoch_us(ts) AS us, "
            "LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us "
            "FROM events) GROUP BY 1"
        ),
    }
