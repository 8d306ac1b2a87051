"""Bounded-group-count grouping utilities.

Ray's ``groupby(key).map_groups(fn)`` pays ~1.5 ms of per-group machinery
(measured: 16k singleton groups → 23 s at 4 CPUs; the same rows in 64
groups → 0.22 s). Any stage that groups on an UNBOUNDED key domain (query
ids, grid cells, band keys, user ids) must therefore group on a hash
PARTITION of the key instead, and process all of a partition's keys with
vectorized pandas/numpy inside one group call. The helpers here are that
pattern, shared by the kNN merges, pair generation, radius filters, and the
per-key relational finalizers.

The co-location guarantee is unchanged — every row of a key lands in
exactly one partition — only the group granularity seen by Ray changes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _multi_partition_ids(batch: pa.Table, key_cols: list[str], n_parts: int) -> np.ndarray:
    """Deterministic partition ids for a (possibly composite) key — stable
    across processes (never Python's salted ``hash``).

    The fold is NON-commutative, ``h = (h ^ hash(col)) * MIX`` per column: a
    plain XOR of identically-mixed hashes would self-cancel when two key
    columns carry equal values (every such row → partition 0) and would
    collide (x, y) with (y, x) — re-creating the skew this helper prevents.
    Single-column keys reduce to ``hash * MIX``.
    """
    import pyarrow.compute as pc

    h = np.zeros(batch.num_rows, dtype=np.uint64)
    for c in key_cols:
        col = batch.column(c)
        if getattr(col, "null_count", 0):
            # dtype-stable hashing: an int64 column containing ANY null
            # floats to float64+NaN in to_numpy, and hash_array hashes the
            # float bit patterns — the same key VALUE would route to a
            # different partition in a null-bearing batch, breaking the
            # exactly-one-partition-per-key guarantee every consumer
            # (CC, pagerank, per-key finalizers, kNN merges) builds on
            if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
                col = pc.fill_null(col, "")
            else:
                col = pc.fill_null(col, pa.scalar(0).cast(col.type))
        h ^= pd.util.hash_array(col.to_numpy(zero_copy_only=False), categorize=False)
        h *= _MIX
    # avalanche finalizer (splitmix64 tail): ``% n_parts`` reads LOW bits,
    # and the low bits of a multiplicative fold alias badly (measured: 2000
    # equal-column pairs landed in only 12 of 64 partitions) — the
    # xor-shift-multiply mixes every input bit into the low ones
    h ^= h >> np.uint64(31)
    h *= np.uint64(0xBF58476D1CE4E5B9)
    h ^= h >> np.uint64(29)
    return (h % np.uint64(n_parts)).astype(np.int64)


def partitioned_map_groups(ds, key_col, part_fn, n_parts: int = 64, part_format: str = "pandas"):
    """``groupby(hash(key) % n_parts).map_groups(part_fn)``.

    ``key_col`` may be one column name or a list (composite key).
    ``part_fn`` receives one PARTITION frame — all rows of every key that
    hashes there, ``__part`` column already dropped — and must handle
    multiple keys itself (vectorized, or with a local pandas groupby whose
    per-group cost is ~10x below Ray's).

    The Ray-visible group format is ALWAYS Arrow: with the default
    ``part_format="pandas"`` the pandas detour happens inside the group task
    (``to_pandas`` in, ``Table.from_pandas`` out) so the block STREAM never
    carries pandas blocks. That matters because Ray's groupby-sort
    normalizes mixed-format streams through pandas, and a null-padded int64
    column round-trips pandas as float64 — the dtype-laundering bug class
    the joins used to guard against. ``part_format="pyarrow"`` hands
    ``part_fn`` the partition as a ``pa.Table`` (return a ``pa.Table``) and
    skips pandas entirely — prefer it for new finalizers.
    """
    key_cols = [key_col] if isinstance(key_col, str) else list(key_col)

    def tag(batch: pa.Table) -> pa.Table:
        if "__part" in batch.column_names:  # same collision guard as joins.py
            raise ValueError(
                "partitioned_map_groups: input already has a '__part' column; "
                "rename it — the name is reserved for the partition tag"
            )
        ids = _multi_partition_ids(batch, key_cols, n_parts)
        return batch.append_column("__part", pa.array(ids, pa.int64()))

    if part_format == "pyarrow":

        def run(t: pa.Table) -> pa.Table:
            return part_fn(t.drop_columns(["__part"]))

    elif part_format == "pandas":

        def run(t: pa.Table) -> pa.Table:
            src = t.drop_columns(["__part"])
            return from_pandas_like(part_fn(src.to_pandas()), src.schema)

    else:
        raise ValueError(f"part_format must be 'pandas' or 'pyarrow', got {part_format!r}")

    return (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__part")
        .map_groups(run, batch_format="pyarrow")
    )


def from_pandas_like(df, like: pa.Schema) -> pa.Table:
    """``pa.Table.from_pandas`` + :func:`restore_block_types` in one call —
    THE way to emit a pandas result into a block stream. Composing the two
    by hand is exactly how the null-key dtype-laundering bug class happens
    (each new partial author must remember the epilogue)."""
    return restore_block_types(pa.Table.from_pandas(df, preserve_index=False), like)


def restore_block_types(res: pa.Table, like: pa.Schema) -> pa.Table:
    """Cast columns of ``res`` back to their type in ``like`` where the name
    matches — the mandatory epilogue of every pandas round-trip that emits
    into a block STREAM (a shuffle tag, a driver fold's ``concat_tables``).

    The pandas detour launders a null-padded int64 column to float64 (and
    any timestamp to ns), but only in the blocks that happen to contain a
    null — so the same key VALUE hashes to DIFFERENT partitions in
    ``_multi_partition_ids`` (float bit patterns vs int bit patterns) and
    ``pa.concat_tables`` refuses the mixed double/int64 schemas on the
    driver. Casting here is safe=True: ``from_pandas`` already turned NaN
    into nulls, so integral values round-trip exactly (int64 keys beyond
    2^53 would already have been corrupted BY the float detour itself —
    hash-derived keys that large are computed, never null, so they don't
    take this path). Columns the part_fn created (new names) pass through.
    """
    for i, name in enumerate(res.column_names):
        j = like.get_field_index(name)
        if j < 0:
            continue
        want = like.field(j).type
        if res.schema.field(i).type != want:
            res = res.set_column(i, pa.field(name, want), res.column(i).cast(want))
    return res


def key_spans(sorted_keys: np.ndarray, min_size: int = 1):
    """(starts, ends) of equal-key runs in a SORTED key array, keeping runs
    of at least ``min_size`` rows — the shared sweep primitive for
    per-key work inside a partition (pair generation, per-cell filters,
    windowed counts) without per-key frame overhead."""
    if sorted_keys.size == 0:
        e = np.array([], dtype=np.int64)
        return e, e
    neq = ~same_adjacent(sorted_keys)
    change = np.flatnonzero(neq) + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [sorted_keys.size]))
    if min_size > 1:
        keep = np.flatnonzero(ends - starts >= min_size)
        return starts[keep], ends[keep]
    return starts, ends


def hot_key_counts(
    ds,
    columns: list[str],
    batch_keys_fn,
    top_n: int = 64,
    key_type: pa.DataType | None = None,
):
    """``(total_load, per-key counts)`` from a cheap streaming stats pass —
    the shared top-n/total-scalar machinery behind every skew pre-pass
    (:func:`hot_key_salts`, ``joins.detect_hot_keys``): each block ships its
    top-``top_n`` key counts plus one total scalar (row 0 of ``__tot`` —
    sums stay exact after block merges), and the driver folds the tiny
    partials into one pandas Series. A key must reach some block's top-n to
    be counted at all — fine for heavy hitters, not a general counter.

    ``key_type`` pins the emitted key column's Arrow type (pass it when keys
    are column VALUES whose inference from an empty numpy array would be
    unstable across blocks); the default int64 suits derived integer keys.
    """
    key_type = key_type or pa.int64()

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch_keys_fn(batch)
        cells, counts = np.unique(keys, return_counts=True)
        if cells.size > top_n:
            keep = np.argsort(-counts)[:top_n]
            cells, counts = cells[keep], counts[keep]
        tot = np.zeros(cells.size, dtype=np.int64)
        if cells.size:
            tot[0] = keys.size
        return pa.table(
            {
                "key": pa.array(cells, key_type),
                "__n": pa.array(counts.astype(np.int64)),
                "__tot": pa.array(tot),
            }
        )

    parts = [
        b.to_pandas()
        for b in ds.select_columns(columns)
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
        .iter_batches(batch_size=None, batch_format="pyarrow")
    ]
    if not parts:
        return 0, pd.Series(dtype=np.int64)
    df = pd.concat(parts, ignore_index=True)
    total = int(df["__tot"].sum())
    return total, df.groupby("key")["__n"].sum()


def hot_key_salts(
    ds,
    columns: list[str],
    batch_keys_fn,
    target_rows: int,
    max_salt: int,
    frac_threshold: float = 0.01,
    top_n: int = 64,
) -> dict[int, int]:
    """Hot-key salt factors from a :func:`hot_key_counts` pre-pass →
    {key: n_subgroups}.

    The shared engine behind ``pairs.cell_salt_stats`` and the kNN query-side
    ``_query_cell_salts`` (one drifted copy of the threshold/merge logic is
    one too many): ``batch_keys_fn(batch) -> int64 array`` emits one key per
    LOAD unit (own cell, replicated neighbor cell, ...); every key holding at
    least ``frac_threshold`` of the total load gets
    ``ceil(load / target_rows)`` subgroups, capped at ``max_salt``. Cold
    keys stay unsalted so replication is paid only at actual hot spots.
    """
    total, agg = hot_key_counts(ds, columns, batch_keys_fn, top_n=top_n)
    hot = agg[(agg >= frac_threshold * max(total, 1)) & (agg > target_rows)]
    return {int(c): int(min(-(-n // target_rows), max_salt)) for c, n in hot.items()}


def same_adjacent(sorted_keys: np.ndarray) -> np.ndarray:
    """Null-aware ``keys[1:] == keys[:-1]`` over a SORTED key array — the
    elementwise twin of :func:`key_spans`' run detection, shared by every
    window/sketch that marks key boundaries with an adjacent compare.

    Raw ``==`` silently splits the SQL NULL group, dtype-dependently: a
    null int64 key launders to float64 NaN (NaN == NaN is False) and a
    null timestamp to NaT (same); object arrays carry None (None == None
    is True) but may also carry NaN. Sorting already made nulls adjacent,
    so merging them yields exactly one NULL run — the SQL PARTITION BY
    convention (see relational.grouped_sum).
    """
    k1, k0 = sorted_keys[1:], sorted_keys[:-1]
    kind = sorted_keys.dtype.kind
    if kind in "mM":
        # NaT == NaT is False on the datetime view but NaT is one fixed
        # int64 bit pattern — the integer view compares nulls equal for free
        return k1.view("i8") == k0.view("i8")
    same = np.asarray(k1 == k0, dtype=bool)
    if kind == "f":
        same |= np.isnan(k1) & np.isnan(k0)
    elif kind == "O":
        same |= pd.isna(k1) & pd.isna(k0)
    return same


def map_key_spans(g: pd.DataFrame, key_col: str, frame_fn) -> pd.DataFrame:
    """Sort one partition by ``key_col`` and apply ``frame_fn`` to each
    key's subframe slice, concatenating the results (typed-empty from
    ``frame_fn`` on the empty slice when nothing matches)."""
    g = g.sort_values(key_col, kind="mergesort")
    keys = g[key_col].to_numpy()
    starts, ends = key_spans(keys)
    outs = [frame_fn(g.iloc[s:e]) for s, e in zip(starts, ends)]
    return pd.concat(outs, ignore_index=True) if outs else frame_fn(g)


def topk_per_group_part(
    g: pd.DataFrame,
    group_col,
    order: list[str],
    ascending: list[bool],
    k: int,
    rank_col: str = "rank",
    drop: list[str] | None = None,
) -> pd.DataFrame:
    """Vectorized per-key top-k inside one partition: one stable sort, a
    C-level ``cumcount`` for within-key positions, no per-key Python.
    ``group_col`` may be one column name or a list (composite key)."""
    groups = [group_col] if isinstance(group_col, str) else list(group_col)
    g = g.sort_values(groups + order, ascending=[True] * len(groups) + ascending, kind="mergesort")
    # dropna=False: the default cumcount yields NaN for null-key rows,
    # silently dropping the SQL NULL partition from every top-k
    pos = g.groupby(groups, sort=False, dropna=False).cumcount()
    keep = pos < k
    out = g[keep].copy()
    out[rank_col] = (pos[keep] + 1).to_numpy(dtype=np.int64)
    if drop:
        out = out.drop(columns=drop)
    return out
