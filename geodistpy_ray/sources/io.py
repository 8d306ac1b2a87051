"""Generic schema-enforced readers and a key-partitioned parquet sink.

The reference's only ingestion surface is in-memory arrays / pandas frames
(`/root/reference/geodistpy/pandas_support.py:25-136`). A standalone engine
also needs file sources: parquet (columnar, column-pruned at the read), CSV
and JSONL (row formats for raw crawl exports). All readers enforce a target
schema — missing columns raise, extra columns are dropped, convertible types
are cast (e.g. ISO-8601 strings → timestamp[us] coming out of CSV/JSONL) —
so every downstream stage sees ONE schema regardless of source format.

The sink writes parquet partitioned by a bucketed key column (directory per
bucket), giving failed runs resumable units and giving downstream readers
partition pruning on the engine's shuffle currency.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def enforce_schema(ds, schema: pa.Schema):
    """Cast every batch to ``schema`` (select + cast; raises on missing cols)."""

    def fn(batch: pa.Table) -> pa.Table:
        missing = [n for n in schema.names if n not in batch.column_names]
        if missing:
            raise ValueError(f"source missing required columns: {missing}")
        return batch.select(schema.names).cast(schema)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def read_table(paths, schema: pa.Schema | None = None, format: str = "parquet", **kwargs):
    """Read parquet/CSV/JSONL into a Dataset with an enforced schema.

    Parquet pushes column pruning into the read (only ``schema``'s columns
    leave storage); CSV/JSONL read whole rows then project+cast per batch —
    at scale, prefer parquet sources.
    """
    import ray.data as rd

    if format == "parquet":
        cols = list(schema.names) if schema is not None else None
        ds = rd.read_parquet(paths, columns=cols, **kwargs)
    elif format == "csv":
        ds = rd.read_csv(paths, **kwargs)
    elif format in ("json", "jsonl"):
        ds = rd.read_json(paths, **kwargs)
    else:
        raise ValueError(f"unknown format '{format}' (parquet|csv|json)")
    return enforce_schema(ds, schema) if schema is not None else ds


def read_parquet_sized(path, columns=None, rows_per_block: int = 40_000, **kwargs):
    """``read_parquet`` with right-sized blocks for SMALL inputs.

    Ray's default read splits every file toward ~2×CPUs blocks regardless of
    size, so a 5k-row table becomes 64 micro-blocks of ~80 rows — and every
    downstream groupby/aggregate then pays its ~20 ms per-block fixed cost 64
    times (measured: exact-dedup over 5k docs spent 1.9 s of remote wall in
    per-block machinery and ~35 ms in actual work). This reader caps the
    split so each block carries at least ~``rows_per_block`` rows (row count
    from the parquet FOOTER — no data read). Inputs big enough to fill 64
    such blocks fall through to Ray's own sizing untouched, so at real scale
    this is a no-op, not a parallelism cap.
    """
    import ray.data as rd

    try:
        import pyarrow.parquet as pq

        n_rows = pq.ParquetFile(path).metadata.num_rows
    except Exception:  # non-local / multi-file path: let Ray size it
        return rd.read_parquet(path, columns=columns, **kwargs)
    n_blocks = max(1, -(-n_rows // rows_per_block))
    if n_blocks >= 64:
        return rd.read_parquet(path, columns=columns, **kwargs)
    return rd.read_parquet(path, columns=columns, override_num_blocks=n_blocks, **kwargs)


def write_partitioned(
    ds,
    out_dir: str,
    by_col: str,
    n_buckets: int = 64,
    bucket_col: str = "bucket",
):
    """Write parquet partitioned into ``n_buckets`` hash buckets of ``by_col``.

    Output layout ``out_dir/bucket=K/*.parquet`` — one directory per key
    bucket, so (a) a resumed run can skip completed buckets, (b) readers can
    prune partitions by key, (c) no single giant file exists. Integer keys
    bucket by value-mod (contiguity-friendly for cell ids); other types by
    a deterministic hash.
    """
    import pandas as pd

    def assign(batch: pa.Table) -> pa.Table:
        col = batch.column(by_col)
        # branch on the ARROW type, not the numpy dtype: an int64 column
        # containing any null converts to float64 via to_numpy, which would
        # route the SAME key into different buckets depending on batch
        # composition (the nullable-key laundering bug class — see
        # stages/grouping.py). Nulls deterministically join bucket 0.
        if pa.types.is_integer(col.type):
            v = pc.fill_null(col, 0).to_numpy(zero_copy_only=False).astype(np.int64)
            b = v % n_buckets
        else:
            v = col.to_numpy(zero_copy_only=False)
            b = pd.util.hash_array(np.asarray(v), categorize=False) % np.uint64(n_buckets)
        return batch.append_column(bucket_col, pa.array(b.astype(np.int64), pa.int64()))

    ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True).write_parquet(
        out_dir, partition_cols=[bucket_col]
    )
    return out_dir


def write_table(ds, out_dir: str, format: str = "parquet", **kwargs):
    """Write a Dataset as parquet / CSV / JSONL (one file per block).

    The row formats exist for interop exports (small results, crawl-tool
    handoffs); parquet stays the scale path — CSV/JSONL carry no schema, no
    column pruning, and no compression by default. Timestamps survive a
    round-trip through :func:`read_table`'s schema cast (ISO-8601 strings →
    timestamp[us]).
    """
    if format == "parquet":
        ds.write_parquet(out_dir, **kwargs)
    elif format == "csv":
        ds.write_csv(out_dir, **kwargs)
    elif format in ("json", "jsonl"):
        # pandas to_json defaults to epoch-MILLISECOND ints for timestamps,
        # which a reader would silently mis-cast (int → µs); force ISO-8601
        # at µs precision so the read_table schema cast round-trips exactly
        kwargs.setdefault("date_format", "iso")
        kwargs.setdefault("date_unit", "us")
        ds.write_json(out_dir, **kwargs)
    else:
        raise ValueError(f"unknown format '{format}' (parquet|csv|json)")
    return out_dir
