"""Range-partitioned global sort → ordered parquet export.

``global_topk`` (stages/relational.py) serves ORDER BY … LIMIT k without a
shuffle, but a full ordered EXPORT (write the whole table in key order —
the "sorted output files" sink) needs the classic three-step distributed
sort, which Ray's own ``Dataset.sort`` implements for in-memory datasets
but not as a file-ordered sink:

1. **Sample**: each batch ships ≤ ``sample_per_batch`` midpoint order
   statistics of its sorted keys (weighted, the mergeable-summary idiom
   from ``sketches.grouped_quantile_sketch``); the driver folds them into
   ``n_parts − 1`` weighted-quantile range boundaries. Driver memory is
   O(samples), never O(rows).
2. **One shuffle**: every row is tagged with its range id (a pure function
   of the KEY value, so equal keys always co-locate and secondary sort
   columns stay globally consistent) and co-grouped per range.
3. **Local sort + write**: each range sorts locally and writes ONE parquet
   file named in range order (``part-00042.parquet``) — concatenating the
   files in name order IS the global order, which is the property ordered
   exports need (downstream consumers stream file-by-file).

Sampled boundaries balance, not perfection: a pathological key histogram
skews partition sizes but never correctness. The returned Dataset is the
small per-part stats table (part, rows, key_first, key_last) — one row per
range, including empty ones, so the output row count is always n_parts.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def _check_total_order(v: np.ndarray, key: str) -> None:
    """NaN breaks searchsorted range assignment SILENTLY (NaN rows all land
    in the last partition unsorted — and descending flips them to the FIRST
    file); a null timestamp launders to NaT with the same sort-vs-searchsorted
    placement mismatch, so both refuse up front."""
    bad = None
    if v.dtype.kind == "f" and np.isnan(v).any():
        bad = "NaN"
    elif v.dtype.kind in "mM" and np.isnat(v).any():
        bad = "NaT (null timestamp)"
    if bad:
        raise ValueError(
            f"sorted_export: key column {key!r} contains {bad} — a total "
            "order needs null-free keys (filter or fill first)"
        )


def _range_boundaries(ds, key: str, n_parts: int, sample_per_batch: int = 4096) -> np.ndarray:
    """(n_parts − 1) ascending boundary values from weighted per-batch
    order-statistic samples (one streaming pass, driver holds samples only)."""

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(key).to_numpy(zero_copy_only=False)
        if v.size == 0:
            return pa.table({"s": pa.array([], batch.schema.field(key).type),
                             "w": pa.array([], pa.float64())})
        _check_total_order(v, key)
        v = np.sort(v)
        if v.size > sample_per_batch:
            idx = ((np.arange(sample_per_batch) + 0.5) * v.size / sample_per_batch).astype(
                np.int64
            )
            s, w = v[idx], v.size / sample_per_batch
        else:
            s, w = v, 1.0
        return pa.table({"s": pa.array(s), "w": pa.array(np.full(s.size, w))})

    parts = [
        b.to_pandas()
        for b in ds.select_columns([key])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .iter_batches(batch_size=None, batch_format="pyarrow")
        if b.num_rows
    ]
    if not parts:
        return np.array([], dtype=object)
    df = pd.concat(parts, ignore_index=True)
    return _weighted_quantile_bounds(df["s"].to_numpy(), df["w"].to_numpy(), n_parts)


def _weighted_quantile_bounds(s: np.ndarray, w: np.ndarray, n_parts: int) -> np.ndarray:
    """(n_parts − 1) boundary values from weighted samples — the one
    quantile fold shared by the sampling and footer-seeded paths (a fix to
    clamp/duplicate behavior must apply to both identically)."""
    order = np.argsort(s, kind="mergesort")
    s, w = s[order], w[order]
    cum = np.cumsum(w)
    targets = cum[-1] * np.arange(1, n_parts) / n_parts
    return s[np.minimum(np.searchsorted(cum, targets), s.size - 1)]


def _boundaries_from_parquet_stats(paths, key: str, n_parts: int):
    """(n_parts − 1) range boundaries from parquet ROW-GROUP statistics —
    a footer-only read, zero data scan (the sampling pass this replaces is
    a second full scan of the key column; at 100 TB that scan runs twice).

    Each row group contributes interpolated points across its [min, max]
    span (uniform-within-group assumption), weighted by its row count, and
    the same weighted-quantile fold as the sampling path picks boundaries.
    The assumption only affects partition BALANCE, never correctness —
    range assignment downstream is a pure function of the key value.
    Returns ``None`` when any row group lacks min/max stats for ``key`` or
    the key isn't numeric (strings can't be interpolated; with plentiful
    row groups their endpoints alone would do, but the sampling pass is
    the honest fallback) — the caller then samples as before.
    """
    mins, maxs, wts = [], [], []
    for p in paths:
        md = pq.ParquetFile(p).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        if key not in idx:
            return None
        for rg in range(md.num_row_groups):
            rgm = md.row_group(rg)
            if rgm.num_rows == 0:
                continue
            st = rgm.column(idx[key]).statistics
            if st is None or not st.has_min_max:
                return None
            if not isinstance(st.min, (int, float)) or isinstance(st.min, bool):
                return None
            mins.append(st.min)
            maxs.append(st.max)
            wts.append(rgm.num_rows)
    if not mins:
        # no stats found AT ALL (empty glob / all-empty row groups) — this
        # must fall back to the sampling pass, not silently disable range
        # partitioning (an empty bounds array tags every row part 0 and
        # one task sorts the whole dataset)
        return None
    lo = np.asarray(mins, dtype=np.float64)
    hi = np.asarray(maxs, dtype=np.float64)
    w = np.asarray(wts, dtype=np.float64)
    # enough interpolation points that even ONE row group resolves all
    # boundaries; cheap either way (driver math over footer scalars)
    m = max(2, int(np.ceil(8.0 * n_parts / lo.size)))
    frac = np.arange(m, dtype=np.float64) / (m - 1)
    s = (lo[:, None] + (hi - lo)[:, None] * frac[None, :]).ravel()
    ws = np.repeat(w / m, m)
    return _weighted_quantile_bounds(s, ws, n_parts)


def sorted_export(
    ds,
    out_dir: str,
    key: str,
    descending: bool = False,
    extra_order: list[str] | None = None,
    n_parts: int = 32,
    sample_per_batch: int = 4096,
    stats_paths=None,
):
    """Write ``ds`` as globally ordered parquet files; return the per-part
    stats Dataset (part, rows, key_first, key_last — in OUTPUT order).

    Ordering contract: reading ``part-*.parquet`` in file-name order yields
    rows sorted by (key[, extra_order...]) ascending (or descending when
    ``descending`` — the flag applies to the KEY and the extra columns
    alike, SQL ``ORDER BY a DESC, b DESC``). Equal keys never straddle a
    file boundary (the range id is a function of the key value alone).

    ``stats_paths`` (a parquet file path, directory, or list of paths —
    the FILES BACKING ``ds``) seeds the range boundaries from the parquet
    row-group footers instead of the sampling pass, turning the sink into
    a SINGLE full read of the input. Falls back to sampling when the
    footers can't resolve (missing stats, non-numeric key).
    """
    if n_parts < 1:
        raise ValueError("n_parts must be >= 1")
    order_cols = [key] + list(extra_order or ())
    os.makedirs(out_dir, exist_ok=True)
    bounds = None
    if stats_paths is not None:
        if isinstance(stats_paths, str):
            if os.path.isdir(stats_paths):
                import glob as _glob

                paths = sorted(_glob.glob(os.path.join(stats_paths, "*.parquet")))
            else:
                paths = [stats_paths]
        else:
            paths = list(stats_paths)
        bounds = _boundaries_from_parquet_stats(paths, key, n_parts)
    if bounds is None:
        bounds = _range_boundaries(ds, key, n_parts, sample_per_batch)

    def tag(batch: pa.Table) -> pa.Table:
        if "__sortpart" in batch.column_names:
            raise ValueError(
                "sorted_export: input already has a '__sortpart' column; "
                "rename it — the name is reserved for the range tag"
            )
        v = batch.column(key).to_numpy(zero_copy_only=False)
        # the sampling pass raises before the shuffle; the footer-seeded
        # path skips that pass, so guard here too
        _check_total_order(v, key)
        part = np.searchsorted(bounds, v, side="right") if bounds.size else np.zeros(
            batch.num_rows, dtype=np.int64
        )
        if descending:
            part = (n_parts - 1) - part
        return batch.append_column("__sortpart", pa.array(part.astype(np.int64), pa.int64()))

    def write_part(t: pa.Table) -> pa.Table:
        part = int(t.column("__sortpart")[0].as_py())
        t = t.drop_columns(["__sortpart"])
        order = pc.sort_indices(
            t,
            sort_keys=[(c, "descending" if descending else "ascending") for c in order_cols],
        )
        t = t.take(order)
        path = os.path.join(out_dir, f"part-{part:05d}.parquet")
        tmp = path + ".tmp"
        pq.write_table(t, tmp)
        os.replace(tmp, path)  # atomic: a killed run leaves no torn file
        kv = t.column(key)
        return pa.table(
            {
                "part": pa.array([part], pa.int64()),
                "rows": pa.array([t.num_rows], pa.int64()),
                "key_first": pa.array([kv[0].as_py() if t.num_rows else None]),
                "key_last": pa.array([kv[-1].as_py() if t.num_rows else None]),
            }
        )

    stats = (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__sortpart")
        .map_groups(write_part, batch_format="pyarrow")
        .to_pandas()
    )
    # drop every part file THIS run didn't write: a previous export into the
    # same directory may have left files for part numbers this run's data
    # never produced (empty ranges write no file), and any survivor would
    # break the name-order global-sort contract for read_sorted/bbox_scan
    import glob as _glob

    written = (
        {f"part-{int(p):05d}.parquet" for p in stats["part"]}
        if "part" in stats.columns
        else set()
    )
    for stale in _glob.glob(os.path.join(out_dir, "part-*.parquet")):
        if os.path.basename(stale) not in written:
            os.remove(stale)
    # one row per range, empty ranges included (stable output shape); an
    # empty range writes no file — name-ordered concatenation stays ordered
    if "part" not in stats.columns:
        # an all-empty input yields zero groups, and Ray's empty blocks
        # carry no schema — substitute the typed-empty stats frame
        stats = pd.DataFrame(
            {
                "part": pd.Series(dtype=np.int64),
                "rows": pd.Series(dtype=np.int64),
                "key_first": pd.Series(dtype=object),
                "key_last": pd.Series(dtype=object),
            }
        )
    full = pd.DataFrame({"part": np.arange(n_parts, dtype=np.int64)})
    full = full.merge(stats, on="part", how="left")
    full["rows"] = full["rows"].fillna(0).astype(np.int64)
    import ray.data as rd

    return rd.from_pandas(full)


def read_sorted(out_dir: str):
    """Read a :func:`sorted_export` directory back as a Dataset whose row
    order is the global sort order.

    Ray's streaming executor reorders blocks unless
    ``DataContext.execution_options.preserve_order`` is on, so this raises
    when it isn't — silently returning maybe-ordered rows would defeat the
    sink's one guarantee. (File-at-a-time consumers that don't need a
    Dataset can just read ``part-*.parquet`` in name order.) Consumers that
    re-shuffle (groupby, repartition(shuffle)) give the order up as usual.
    """
    import glob as _glob

    import ray.data as rd
    from ray.data import DataContext

    if not DataContext.get_current().execution_options.preserve_order:
        raise RuntimeError(
            "read_sorted needs DataContext.get_current().execution_options"
            ".preserve_order = True — without it Ray may stream blocks out "
            "of order and the export's ordering guarantee is lost"
        )
    files = sorted(_glob.glob(os.path.join(out_dir, "part-*.parquet")))
    if not files:
        raise FileNotFoundError(f"no part-*.parquet files under {out_dir}")
    return rd.read_parquet(files)


def zorder_export(
    ds,
    out_dir: str,
    lat_col: str = "lat",
    lon_col: str = "lon",
    n_parts: int = 32,
    bits: int = 16,
    sample_per_batch: int = 4096,
):
    """Spatially CLUSTERED export: tag every row with its Z-order (Morton)
    key and range-partition the files by it (`sorted_export` machinery).
    Because the space-filling curve keeps nearby points in nearby key
    ranges, each output file covers a tight lat/lon envelope — which makes
    the parquet column statistics in each file's footer an effective
    spatial index: :func:`bbox_scan` skips whole files without opening them. This
    is the data-skipping layout a 100 TB spatial corpus wants (the
    Delta/Iceberg OPTIMIZE ZORDER idiom, built from the engine's own sort
    sink). Returns the per-part stats Dataset from `sorted_export`."""
    from ..cells import zorder_key

    def tag(batch: pa.Table) -> pa.Table:
        if "zkey" in batch.column_names:
            raise ValueError("zorder_export: input already has a 'zkey' column")
        lat = batch.column(lat_col).to_numpy(zero_copy_only=False)
        lon = batch.column(lon_col).to_numpy(zero_copy_only=False)
        return batch.append_column("zkey", pa.array(zorder_key(lat, lon, bits), pa.int64()))

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    return sorted_export(
        tagged, out_dir, key="zkey", n_parts=n_parts, sample_per_batch=sample_per_batch
    )


def bbox_scan(
    out_dir: str,
    min_lat: float,
    max_lat: float,
    min_lon: float,
    max_lon: float,
    lat_col: str = "lat",
    lon_col: str = "lon",
):
    """Bounding-box scan over a :func:`zorder_export` directory with
    FILE-LEVEL pruning from the parquet footers: a file whose lat/lon
    column statistics are disjoint from the box is never read (on a
    clustered layout most files prune; on an unclustered one none do —
    correctness is identical either way, pruning is pure I/O savings).
    Returns ``(dataset, files_read, files_total)`` — the dataset applies
    the EXACT inclusive bbox filter to the surviving files."""
    import glob as _glob

    import ray.data as rd

    files = sorted(_glob.glob(os.path.join(out_dir, "part-*.parquet")))
    if not files:
        raise FileNotFoundError(f"no part-*.parquet files under {out_dir}")

    def overlaps(path: str) -> bool:
        md = pq.ParquetFile(path).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for rg in range(md.num_row_groups):
            st_lat = md.row_group(rg).column(idx[lat_col]).statistics
            st_lon = md.row_group(rg).column(idx[lon_col]).statistics
            if (
                st_lat is None
                or st_lon is None
                or not st_lat.has_min_max
                or not st_lon.has_min_max
            ):
                return True  # no stats / no min-max (e.g. all-NaN) → cannot prune
            if (
                st_lat.max >= min_lat
                and st_lat.min <= max_lat
                and st_lon.max >= min_lon
                and st_lon.min <= max_lon
            ):
                return True
        return False

    keep = [f for f in files if overlaps(f)]

    def exact(batch: pa.Table) -> pa.Table:
        lat = batch.column(lat_col).to_numpy(zero_copy_only=False)
        lon = batch.column(lon_col).to_numpy(zero_copy_only=False)
        m = (lat >= min_lat) & (lat <= max_lat) & (lon >= min_lon) & (lon <= max_lon)
        return batch.filter(pa.array(m))

    if not keep:
        schema = pq.read_schema(files[0])
        empty = pa.table(
            {f.name: pa.array([], f.type) for f in schema}
        )
        return rd.from_arrow(empty), 0, len(files)
    ds = rd.read_parquet(keep).map_batches(
        exact, batch_format="pyarrow", zero_copy_batch=True
    )
    return ds, len(keep), len(files)
