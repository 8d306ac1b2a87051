"""Relational stages: partial-aggregate groupbys with deterministic money math.

Demonstrates the engine's generic (non-geodesic) query capability over the
TPC-H-ish tables. Two scale rules baked in:

1. **Partial aggregation**: every batch pre-aggregates per key inside
   ``map_batches`` (the combiner), so the ``groupby`` shuffle moves one row
   per (key × batch), not one per input row.
2. **Integer money math**: monetary doubles are converted to integer cents
   before summing — distributed float summation is order-dependent, integer
   sums are exact and bit-reproducible against the SQL oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data.aggregate import Sum

from .grouping import from_pandas_like



def cents(x: np.ndarray) -> np.ndarray:
    """Dollars (float64) → integer cents, round-half-even like SQL ROUND? No:
    both sides use the same ``floor(x*100 + 0.5)`` convention to avoid
    banker's-rounding mismatches between NumPy and DuckDB."""
    return np.floor(np.asarray(x, dtype=np.float64) * 100.0 + 0.5).astype(np.int64)


def grouped_sum(
    ds,
    key_cols: list[str],
    int_sum_cols: dict[str, str] | None = None,
    cent_sum_cols: dict[str, str] | None = None,
    count_col: str = "n",
    final: str = "driver",
    nulls: str = "raise",
    driver_row_budget: int = 1_000_000,
):
    """Partial-then-final grouped aggregation.

    ``int_sum_cols``: {input_col: output_name} summed as int64 (rounded to
    nearest int first). ``cent_sum_cols``: {input_col: output_name} summed as
    integer cents. A count column is always emitted.

    ``nulls`` controls NULL values in sum columns — they must never reach the
    int64 cast, where NaN silently becomes INT64_MIN and corrupts the sum:

    - ``"raise"`` (default): fail loudly on the first null batch.
    - ``"zero"``: count them as 0, i.e. SQL ``COALESCE(SUM(x), 0)`` —
      identical to ``SUM(x)`` whenever a group has at least one non-null
      value (SQL SUM ignores NULLs); an all-null group yields 0 where bare
      SQL SUM yields NULL, so mirror with COALESCE. ``count_col`` still
      counts all rows (COUNT(*) semantics).

    ``final`` picks the merge of the (already per-batch-combined) partials:

    - ``"driver"`` (default): stream partial blocks to the driver and merge
      with one pandas groupby → returns a pandas DataFrame. The partials
      are at most (n_blocks × n_keys) rows, so for bounded key domains
      (grid cells, flags, languages, months) this is tiny — and it avoids
      Ray's sort-based all-to-all, whose fixed cost (~4s on 256 blocks for
      a 40k-row input, measured) dwarfs the data. This is the same "small
      result to the driver" rule as ``.to_pandas()`` on an aggregate.
    - ``"shuffle"``: distributed ``groupby().aggregate()`` → returns a
      Dataset. Ray's sort-aggregate pays per-GROUP machinery (~0.1 ms per
      distinct key, measured), so prefer ``"partitioned"`` when the key
      domain is unbounded.
    - ``"partitioned"``: distributed final on hash PARTITIONS of the key
      (``stages/grouping.py`` — 64 Ray groups regardless of key count;
      each partition merges its keys with one C-level pandas groupby) →
      returns a Dataset. The scale default for unbounded key domains
      (users, hosts, hashes).
    - ``"partials"``: skip the merge entirely and return the per-batch
      partial Dataset (one row per key × batch). For callers that feed the
      partials into their own single shuffle (e.g. a
      :func:`~.grouping.partitioned_map_groups` rollup on a coarser key) —
      avoids paying two shuffles for a two-level aggregate.
    """
    int_sum_cols = int_sum_cols or {}
    cent_sum_cols = cent_sum_cols or {}
    if nulls not in ("raise", "zero"):
        raise ValueError(f"nulls must be 'raise' or 'zero', got {nulls!r}")

    def _clean(vals: np.ndarray, col: str) -> np.ndarray:
        nan = np.isnan(vals)
        if nan.any():
            if nulls == "raise":
                raise ValueError(
                    f"grouped_sum: column {col!r} has {int(nan.sum())} null(s); "
                    f"pass nulls='zero' for COALESCE(SUM(x), 0) semantics"
                )
            vals = np.where(nan, 0.0, vals)
        return vals

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(
            key_cols + list(int_sum_cols) + list(cent_sum_cols)
        ).to_pandas()
        for c in int_sum_cols:
            v = _clean(df[c].to_numpy(dtype=np.float64), c)
            df[c] = np.floor(v + 0.5).astype(np.int64)
        for c in cent_sum_cols:
            df[c] = cents(_clean(df[c].to_numpy(dtype=np.float64), c))
        # dropna=False: SQL GROUP BY emits a NULL group — pandas' default
        # silently DROPS null-key rows from every sum and count (a null
        # int64 key rides as NaN here, so the null group surfaces as a
        # NaN/float key in the result; document-grade divergence only in
        # the key's dtype, never in the totals)
        g = df.groupby(key_cols, as_index=False, sort=False, dropna=False).agg(
            **{out: (c, "sum") for c, out in int_sum_cols.items()},
            **{out: (c, "sum") for c, out in cent_sum_cols.items()},
            **{count_col: (key_cols[0], "size")},
        )
        # from_pandas_like restores pandas-laundered key dtypes: a
        # null-bearing block would otherwise emit double-typed keys next to
        # other blocks' int64, splitting the same key across hash partitions
        # and crashing the driver fold's concat_tables
        return from_pandas_like(g, batch.schema)

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    if final == "partials":
        return partials
    if final == "driver":
        # stream partial blocks in, folding into a running merged frame at
        # budget checkpoints. The guard fires on MERGED DISTINCT KEYS, not
        # raw partial rows — a bounded key domain read from many blocks
        # (blocks × keys partial rows grows with scale) must keep working,
        # while an unbounded domain (users, hashes, urls) must never
        # silently land on the driver: the distributed finals exist for
        # exactly that. Peak driver memory stays ≤ ~2× budget rows.
        tabs, pending, merged = [], 0, None
        schema_carrier = None

        def _fold(blocks, prev):
            cat = pa.concat_tables(blocks, promote_options="default").to_pandas()
            if prev is not None:
                cat = pd.concat([prev, cat], ignore_index=True)
            # concat in ARROW, convert once: the driver final is the
            # pipeline's SERIAL tail, and per-block to_pandas + pd.concat
            # was its cost (256 blocks × 13k keys measured 0.62 s that way,
            # 0.15 s this way)
            return cat.groupby(key_cols, as_index=False, sort=False, dropna=False).sum()

        for t in partials.iter_batches(batch_size=None, batch_format="pyarrow"):
            if t.num_rows == 0:
                # Ray emits 0-row blocks schema-LESS; keep one only as the
                # all-empty-input schema carrier
                schema_carrier = schema_carrier or t
                continue
            tabs.append(t)
            pending += t.num_rows
            if pending > driver_row_budget:
                merged = _fold(tabs, merged)
                tabs, pending = [], 0
                if len(merged) > driver_row_budget:
                    raise ValueError(
                        f"grouped_sum: driver-final merged keys exceed "
                        f"{driver_row_budget} rows — the key domain "
                        f"{key_cols!r} looks unbounded; pass "
                        "final='partitioned' (distributed merge) or raise "
                        "driver_row_budget explicitly"
                    )
        if not tabs and merged is None:  # empty input: typed empty frame
            if schema_carrier is not None and set(key_cols) <= set(
                schema_carrier.schema.names
            ):
                return (
                    schema_carrier.to_pandas()
                    .groupby(key_cols, as_index=False, sort=False, dropna=False)
                    .sum()
                )
            cols = key_cols + list(int_sum_cols.values()) + list(cent_sum_cols.values()) + [count_col]
            return pd.DataFrame({c: [] for c in cols})
        return _fold(tabs, merged) if tabs else merged
    if final == "partitioned":
        from .grouping import partitioned_map_groups

        outs = list(int_sum_cols.values()) + list(cent_sum_cols.values()) + [count_col]

        def merge(g: pd.DataFrame) -> pd.DataFrame:
            return g.groupby(key_cols, as_index=False, sort=False, dropna=False)[outs].sum()

        return partitioned_map_groups(partials, key_cols, merge)
    aggs = [Sum(out, alias_name=out) for out in int_sum_cols.values()]
    aggs += [Sum(out, alias_name=out) for out in cent_sum_cols.values()]
    aggs.append(Sum(count_col, alias_name=count_col))
    return partials.groupby(key_cols if len(key_cols) > 1 else key_cols[0]).aggregate(*aggs)


def top_k_per_group(
    ds,
    key_col,
    order_col: str,
    k: int,
    ascending: bool = False,
    tiebreak_col: str | None = None,
    rank_col: str = "rank",
):
    """Exact per-key top-k with deterministic tie-breaking.

    Scale shape: every batch keeps at most k rows per key (the combiner —
    mirrors the reference's ``argpartition`` selection,
    ``/root/reference/geodistpy/distance.py:533-537``), so the ``groupby``
    shuffle moves ≤ k×keys×batches rows; the per-key finalizer re-selects
    and emits a 1-based ``rank`` column ordered by
    ``(order_col [asc|desc], tiebreak_col asc)``.
    """
    keys = [key_col] if isinstance(key_col, str) else list(key_col)
    order = [order_col] + ([tiebreak_col] if tiebreak_col else [])
    asc = [ascending] + [True] * (len(order) - 1)

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df.sort_values(order, ascending=asc, kind="mergesort")
        # dropna=False: SQL ROW_NUMBER partitions NULL keys too
        top = df.groupby(keys, sort=False, dropna=False).head(k)
        return from_pandas_like(top, batch.schema)  # null-laundered dtypes

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    # final merge groups on a hash PARTITION of the key (bounded group
    # count — see stages/grouping.py), ranking all keys per partition with
    # one vectorized sort + cumcount
    from .grouping import partitioned_map_groups, topk_per_group_part

    def final_part(g: pd.DataFrame) -> pd.DataFrame:
        return topk_per_group_part(g, keys, order, asc, k, rank_col=rank_col)

    return partitioned_map_groups(partials, keys, final_part)


def _driver_fold(partials, fold, driver_row_budget: int, what: str, distributed_hint: str):
    """Stream partial blocks to the driver, folding at budget checkpoints
    (same discipline as grouped_sum's driver final): the budget judges the
    FOLDED result (distinct keys), so bounded domains across many blocks
    keep working while an unbounded domain raises instead of silently
    landing on the driver. Returns None for an all-empty stream."""
    tabs, pending, merged = [], 0, None
    for t in partials.iter_batches(batch_size=None, batch_format="pyarrow"):
        if t.num_rows == 0:
            continue
        tabs.append(t)
        pending += t.num_rows
        if pending > driver_row_budget:
            merged = fold(tabs, merged)
            tabs, pending = [], 0
            if len(merged) > driver_row_budget:
                raise ValueError(
                    f"{what}: driver-final merged rows exceed "
                    f"{driver_row_budget} — the key domain looks unbounded; "
                    f"use {distributed_hint} (distributed) or raise "
                    "driver_row_budget explicitly"
                )
    if not tabs and merged is None:
        return None
    return fold(tabs, merged) if tabs else merged


def distinct(ds, cols: list[str], final: str = "shuffle", n_parts: int = 64, driver_row_budget: int = 1_000_000):
    """Exact distinct over ``cols`` — per-batch dedup first, then a final merge.

    Per-batch ``drop_duplicates`` is the combiner: the shuffle (or driver
    merge) sees at most one row per (key × batch). ``final="shuffle"`` keeps
    it fully distributed (unbounded key domains at 100 TB);
    ``final="driver"`` streams the tiny partials to the driver for bounded
    domains and returns a pandas DataFrame.

    The shuffle final groups on a HASH PARTITION of the key (``n_parts``
    groups), not on the key itself: Ray's ``map_groups`` pays ~4 ms of
    per-group overhead, so one group per distinct value turns a large key
    domain into minutes of fixed cost; each partition dedups all its keys
    with one vectorized ``drop_duplicates``.
    """

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(cols).to_pandas().drop_duplicates()
        return from_pandas_like(df, batch.schema)

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    if final == "driver":

        def fold(blocks, prev):
            cat = pa.concat_tables(blocks, promote_options="default").to_pandas()
            if prev is not None:
                cat = pd.concat([prev, cat], ignore_index=True)
            return cat.drop_duplicates().reset_index(drop=True)

        out = _driver_fold(partials, fold, driver_row_budget, "distinct", "final='shuffle'")
        return pd.DataFrame({c: [] for c in cols}) if out is None else out

    from .grouping import partitioned_map_groups

    def dedup_part(g: pd.DataFrame) -> pd.DataFrame:
        return g[cols].drop_duplicates()

    return partitioned_map_groups(partials, cols, dedup_part, n_parts=n_parts)


def add_month_key(ds, ts_col: str, out_col: str = "ym"):
    """timestamp column → integer year*100+month key (SQL-mirrorable)."""

    def fn(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col).combine_chunks().to_numpy(zero_copy_only=False)
        idx = pd.DatetimeIndex(ts)
        ym = (idx.year.to_numpy() * 100 + idx.month.to_numpy()).astype(np.int64)
        return batch.append_column(out_col, pa.array(ym, pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def add_day_key(ds, ts_col: str, out_col: str = "ymd"):
    """timestamp column → integer year*10000+month*100+day key
    (SQL-mirrorable: ``YEAR(ts)*10000 + MONTH(ts)*100 + DAY(ts)``)."""

    def fn(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col).combine_chunks().to_numpy(zero_copy_only=False)
        idx = pd.DatetimeIndex(ts)
        ymd = (
            idx.year.to_numpy() * 10000
            + idx.month.to_numpy() * 100
            + idx.day.to_numpy()
        ).astype(np.int64)
        return batch.append_column(out_col, pa.array(ymd, pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def ntile_buckets(rn: np.ndarray, cnt: np.ndarray, n: int) -> np.ndarray:
    """SQL NTILE bucket for 1-based rank ``rn`` in a key of ``cnt`` rows:
    the first ``cnt % n`` buckets take ``cnt // n + 1`` rows, the rest
    ``cnt // n`` (property-tested against DuckDB's NTILE)."""
    q, r = cnt // n, cnt % n
    big_span = r * (q + 1)  # rows covered by the (q+1)-sized buckets
    in_big = rn <= big_span
    # q can be 0 when cnt < n (then every row is its own bucket and in_big
    # covers all rows); guard the small-bucket divide
    small = np.maximum(q, 1)
    return np.where(
        in_big, (rn - 1) // (q + 1) + 1, r + (rn - 1 - big_span) // small + 1
    ).astype(np.int64)


def grouped_ntile(
    ds,
    key_col: str,
    order_col: str,
    n: int,
    tiebreak_col: str | None = None,
    out_col: str = "ntile",
):
    """Per-key NTILE(n): rows of each key split into ``n`` buckets in
    ``(order_col, tiebreak_col)`` order, first ``count % n`` buckets one
    row larger — bit-identical to SQL ``NTILE(n) OVER (PARTITION BY key
    ORDER BY ...)``. Ranking needs each key co-located (grouped on a hash
    PARTITION, bounded group count); per-key cardinality must fit a worker
    — the same constraint as :func:`grouped_median`.
    """
    from .grouping import partitioned_map_groups

    order = [order_col] + ([tiebreak_col] if tiebreak_col else [])

    def part_fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col] + order, kind="mergesort", ignore_index=True)
        # dropna=False: the default yields NaN rn/cnt for null-key rows,
        # which astype(int64) silently turns into INT64_MIN bucket ids
        gb = g.groupby(key_col, sort=False, dropna=False)
        rn = gb.cumcount().to_numpy() + 1
        cnt = gb[key_col].transform("size").to_numpy()
        g[out_col] = ntile_buckets(rn, cnt, n)
        return g

    return partitioned_map_groups(ds, key_col, part_fn)


def grouped_median(ds, key_col: str, value_col: str, out_col: str = "median_value"):
    """Exact per-key median (even-count keys average the two middle values,
    matching SQL ``MEDIAN``). Median is not decomposable, so each key's
    values must co-locate — grouped on a hash PARTITION of the key (bounded
    group count, see stages/grouping.py) with pandas' C-level groupby median
    per partition; use only when per-key cardinality fits a worker (else
    switch to :func:`~.sketches.grouped_quantile_sketch`)."""
    from .grouping import partitioned_map_groups

    def part_fn(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby(key_col, as_index=False, sort=False, dropna=False)[value_col].median()
        return m.rename(columns={value_col: out_col})

    return partitioned_map_groups(ds, key_col, part_fn)


def running_total(
    ds,
    key_col: str,
    order_col: str,
    value_col: str,
    out_col: str = "running_cents",
    tiebreak_col: str | None = None,
):
    """Per-key running total of integer cents, ordered by ``order_col``
    (SQL ``SUM() OVER (PARTITION BY key ORDER BY ...)``). Requires the key's
    rows co-located and sorted — a ``map_groups`` window, batch semantics."""

    from .grouping import partitioned_map_groups

    def part_fn(g: pd.DataFrame) -> pd.DataFrame:
        order = [key_col, order_col] + ([tiebreak_col] if tiebreak_col else [])
        g = g.sort_values(order, kind="mergesort")
        c = pd.Series(cents(g[value_col].to_numpy()), index=g.index)
        # dropna=False: the default emits NaN totals for the SQL NULL
        # partition (and launders the cents column to float64)
        g[out_col] = c.groupby(g[key_col], sort=False, dropna=False).cumsum()
        return g

    return partitioned_map_groups(ds, key_col, part_fn)


def grouped_minmax(ds, key_cols: list[str], value_col: str, final: str = "driver", driver_row_budget: int = 1_000_000):
    """Per-key min/max of a float column — partial per batch, tiny final merge
    (min/max are decomposable, so the shuffle moves one row per key × batch)."""

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(key_cols + [value_col]).to_pandas()
        g = df.groupby(key_cols, as_index=False, sort=False, dropna=False).agg(
            min_value=(value_col, "min"), max_value=(value_col, "max")
        )
        return from_pandas_like(g, batch.schema)

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    if final == "driver":

        def fold(blocks, prev):
            cat = pa.concat_tables(blocks, promote_options="default").to_pandas()
            if prev is not None:
                cat = pd.concat([prev, cat], ignore_index=True)
            return cat.groupby(key_cols, as_index=False, sort=False, dropna=False).agg(
                min_value=("min_value", "min"), max_value=("max_value", "max")
            )

        out = _driver_fold(
            partials, fold, driver_row_budget, "grouped_minmax", "final='partitioned'"
        )
        if out is None:
            return pd.DataFrame({c: [] for c in key_cols + ["min_value", "max_value"]})
        return out
    if final == "partitioned":
        # bounded-group distributed final — see grouped_sum's mode table
        from .grouping import partitioned_map_groups

        def merge(g: pd.DataFrame) -> pd.DataFrame:
            return g.groupby(key_cols, as_index=False, sort=False, dropna=False).agg(
                min_value=("min_value", "min"), max_value=("max_value", "max")
            )

        return partitioned_map_groups(partials, key_cols, merge)
    from ray.data.aggregate import Max, Min

    return partials.groupby(key_cols if len(key_cols) > 1 else key_cols[0]).aggregate(
        Min("min_value", alias_name="min_value"), Max("max_value", alias_name="max_value")
    )


def grouped_string_agg(
    ds, key_col: str, value_col: str, sep: str = ",", out_col: str = "agg_values"
):
    """Per-key ordered string aggregation (SQL ``STRING_AGG(x, sep ORDER BY x)``).

    Order-sensitive → values must co-locate and sort per key: a true
    ``groupby(key).map_groups``. Use for bounded per-key cardinality
    (id lists per tile, hosts per cell); unbounded keys want the pair table
    representation instead of a giant string.
    """

    from .grouping import partitioned_map_groups

    def part_fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, value_col], kind="mergesort")
        agg = g.groupby(key_col, sort=False, dropna=False)[value_col].agg(
            lambda s: sep.join(str(v) for v in s)
        )
        return agg.reset_index().rename(columns={value_col: out_col})

    return partitioned_map_groups(ds, key_col, part_fn)


def grouped_quantile(
    ds, key_col: str, value_col: str, q: float, out_col: str = "quantile_value"
):
    """Exact per-key quantile with linear interpolation (SQL
    ``QUANTILE_CONT``). Like the median, not decomposable → per-key
    ``map_groups``; for unbounded per-key cardinality use
    :func:`~.sketches.grouped_quantile_sketch` (fixed-size shuffle rows,
    bounded rank error)."""

    from .grouping import partitioned_map_groups

    def part_fn(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(key_col, as_index=False, sort=False, dropna=False)[value_col].quantile(q)
        return out.rename(columns={value_col: out_col})

    return partitioned_map_groups(ds, key_col, part_fn)


def pivot_counts(ds, key_col: str, pivot_col: str, values: list[str], other_col: str | None = "other_n"):
    """Pivot: one row per key with a count column per pivot value
    (``<value>_n``), plus ``other_n`` for unlisted values and the total
    ``n`` — the lang × source style contingency table of corpus reports.

    One pass: each batch widens to 0/1 int columns (one Arrow equality +
    cast per pivot value — the CASE WHEN of the SQL mirror), then rides the
    existing :func:`grouped_sum` combiner, so the shuffle moves one short
    row per (key × batch) regardless of corpus size. ``values`` is the
    SMALL, explicit pivot domain (the SQL mirror needs it too; discovering
    it dynamically would mean an extra distinct pass and an unstable
    schema)."""
    import pyarrow.compute as pc

    cols = {v: f"{v}_n" for v in values}

    def widen(batch: pa.Table) -> pa.Table:
        p = batch.column(pivot_col)
        out = {key_col: batch.column(key_col)}
        hit = None
        for v, name in cols.items():
            eq = pc.equal(p, v)
            out[name] = pc.cast(pc.fill_null(eq, False), pa.int64())
            hit = out[name] if hit is None else pc.add(hit, out[name])
        if other_col is not None:
            out[other_col] = pc.subtract(
                pa.array(np.ones(batch.num_rows, dtype=np.int64), pa.int64()),
                pc.min_element_wise(hit, 1) if hit is not None else 0,
            )
        return pa.table(out)

    wide = ds.map_batches(widen, batch_format="pyarrow", zero_copy_batch=True)
    sums = {name: name for name in cols.values()}
    if other_col is not None:
        sums[other_col] = other_col
    return grouped_sum(wide, [key_col], int_sum_cols=sums, count_col="n")


def _typed_null_level(dtype, index) -> pd.Series:
    """An all-NULL Series that keeps a rolled-up key column's dtype.

    Plain ``agg[c] = None`` coerces the column to object dtype; for string
    levels that's harmless, but an integer level column would come back as
    a mixed object column that mistypes (or fails) a later pandas→Arrow
    conversion. Integer levels get pandas' nullable Int/UInt dtype, floats
    NaN, datetimes NaT, and everything else stays object-with-None.
    """
    if pd.api.types.is_integer_dtype(dtype):
        nullable = str(dtype).replace("uint", "UInt").replace("int", "Int")
        return pd.Series(pd.NA, index=index, dtype=nullable)
    if pd.api.types.is_float_dtype(dtype):
        return pd.Series(np.nan, index=index, dtype=dtype)
    if pd.api.types.is_datetime64_any_dtype(dtype):
        return pd.Series(pd.NaT, index=index, dtype=dtype)
    # scalar None would be coerced to NaN even at dtype=object; a prebuilt
    # object array keeps literal None (what the oracle canonicalizes to)
    return pd.Series(np.full(len(index), None, dtype=object), index=index, dtype=object)


def rollup_sum(
    ds,
    levels: list[str],
    int_sum_cols: dict[str, str] | None = None,
    cent_sum_cols: dict[str, str] | None = None,
    count_col: str = "n",
):
    """``GROUP BY ROLLUP(levels...)``: aggregates at every prefix of the
    hierarchy — (a, b), (a), () — with rolled-up key columns NULL and a
    ``grouping_id`` marker — DuckDB's ``GROUPING(...)`` bitmask for prefix
    sets: 0 = finest, ``2^len(levels) - 1`` = grand total (matching
    :func:`cube_sum`).

    Computed the classic way: ONE corpus-scale pass builds the finest
    aggregate (the `grouped_sum` combiner + its shuffle), and every coarser
    level re-aggregates the FINEST RESULT — work proportional to the
    distinct key combinations, not the corpus. Bounded key domains only
    (the driver final holds the finest aggregate), the same contract as
    ``grouped_sum(final="driver")``; an unbounded hierarchy would chain
    ``final="shuffle"`` rollups instead."""
    out_vals = list((int_sum_cols or {}).values()) + list(
        (cent_sum_cols or {}).values()
    ) + [count_col]
    finest = grouped_sum(
        ds, levels, int_sum_cols=int_sum_cols, cent_sum_cols=cent_sum_cols,
        count_col=count_col, final="driver",
    )
    frames = [finest.assign(grouping_id=0)]
    for g in range(1, len(levels) + 1):
        keep = levels[: len(levels) - g]
        agg = (
            finest.groupby(keep, as_index=False, sort=False, dropna=False)[out_vals].sum()
            if keep
            else finest[out_vals].sum().to_frame().T
        )
        for c in levels[len(levels) - g :]:
            agg[c] = _typed_null_level(finest[c].dtype, agg.index)
        agg["grouping_id"] = (1 << g) - 1
        frames.append(agg[levels + out_vals + ["grouping_id"]])
    return pd.concat(frames, ignore_index=True)[levels + out_vals + ["grouping_id"]]


def grouped_corr(
    ds,
    key_cols: list[str],
    x_col: str,
    y_col: str,
    out_col: str = "corr",
    round_to: int | None = 6,
):
    """Per-key Pearson correlation — the analytics aggregate behind
    feature screening. Decomposed with CHAN's parallel moments (per-batch
    per-key ``(n, mean_x, mean_y, M2x, M2y, Cxy)``, pairwise-merged), NOT
    raw power sums: ``n·Σxy − Σx·Σy`` overflows double precision's useful
    range at ~1e18 while centered moments stay at data scale, which is why
    the naive formula cannot round-trip a 6-decimal oracle check. The
    ratio ``Cxy/√(M2x·M2y)`` equals SQL ``CORR`` exactly (the n−1 factors
    cancel). Bounded key domains (driver merge of key × batch rows —
    the ``grouped_sum(final="driver")`` contract); keys with < 2 rows or
    zero variance yield NULL like SQL.
    """

    merged = _merged_chan_moments(
        ds.map_batches(
            _chan_partial(key_cols, x_col, y_col),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        key_cols,
    )
    out_keys, out_vals = [], []
    for key, (n, mx, my, m2x, m2y, cxy) in merged:
        denom = np.sqrt(m2x * m2y)
        val = cxy / denom if (n >= 2 and denom > 0.0) else np.nan
        if round_to is not None and not np.isnan(val):
            val = round(val, round_to)
        out_keys.append(key)
        out_vals.append(val)
    res = pd.DataFrame(out_keys, columns=key_cols)
    res[out_col] = out_vals
    return res


def _merged_chan_moments(partials, key_cols):
    """Driver fold of per-(key × batch) Chan moment rows → one
    ``(key_tuple, (n, mean_x, mean_y, M2x, M2y, Cxy))`` per key."""
    rows = [
        b.to_pandas()
        for b in partials.iter_batches(batch_size=None, batch_format="pyarrow")
        if b.num_rows
    ]
    if not rows:
        return []
    allp = pd.concat(rows, ignore_index=True)
    out = []
    for key, grp in allp.groupby(key_cols, sort=False, dropna=False):
        n = mx = my = m2x = m2y = cxy = 0.0
        for r in grp.itertuples(index=False):
            nb, mxb, myb = float(r.n), float(r.mean_x), float(r.mean_y)
            tot = n + nb
            dx_, dy_ = mxb - mx, myb - my
            f = n * nb / tot
            m2x += r.m2x + dx_ * dx_ * f
            m2y += r.m2y + dy_ * dy_ * f
            cxy += r.cxy + dx_ * dy_ * f
            mx += dx_ * nb / tot
            my += dy_ * nb / tot
            n = tot
        out.append((key if isinstance(key, tuple) else (key,), (n, mx, my, m2x, m2y, cxy)))
    return out


def grouped_linfit(
    ds,
    key_cols: list[str],
    x_col: str,
    y_col: str,
    round_to: int | None = 6,
):
    """Per-key least-squares line ``y = slope·x + intercept`` — SQL
    ``REGR_SLOPE`` / ``REGR_INTERCEPT`` parity from the same Chan-merged
    centered moments as :func:`grouped_corr` (slope = Cxy/M2x, intercept
    = ȳ − slope·x̄). Zero x-variance keys yield NULL like SQL."""
    corr_partial = _chan_partial(key_cols, x_col, y_col)
    merged = _merged_chan_moments(
        ds.map_batches(corr_partial, batch_format="pyarrow", zero_copy_batch=True),
        key_cols,
    )
    out_keys, slopes, intercepts = [], [], []
    for key, (n, mx, my, m2x, _m2y, cxy) in merged:
        if n >= 2 and m2x > 0.0:
            slope = cxy / m2x
            inter = my - slope * mx
            if round_to is not None:
                slope, inter = round(slope, round_to), round(inter, round_to)
        else:
            slope = inter = np.nan
        out_keys.append(key)
        slopes.append(slope)
        intercepts.append(inter)
    res = pd.DataFrame(out_keys, columns=key_cols)
    res["slope"] = slopes
    res["intercept"] = intercepts
    return res


def grouped_covar(
    ds,
    key_cols: list[str],
    x_col: str,
    y_col: str,
    out_col: str = "covar",
    round_to: int | None = 6,
):
    """Per-key sample covariance (SQL ``COVAR_SAMP`` = Cxy/(n−1)) from the
    same Chan-merged moments as :func:`grouped_corr`; single-row keys
    yield NULL like SQL."""
    merged = _merged_chan_moments(
        ds.map_batches(
            _chan_partial(key_cols, x_col, y_col),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        key_cols,
    )
    out_keys, out_vals = [], []
    for key, (n, _mx, _my, _m2x, _m2y, cxy) in merged:
        val = cxy / (n - 1) if n >= 2 else np.nan
        if round_to is not None and not np.isnan(val):
            val = round(val, round_to)
        out_keys.append(key)
        out_vals.append(val)
    res = pd.DataFrame(out_keys, columns=key_cols)
    res[out_col] = out_vals
    return res


def _chan_partial(key_cols, x_col, y_col):
    """The shared per-batch Chan-moment combiner of grouped_corr/linfit."""

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(key_cols + [x_col, y_col]).to_pandas()
        g = df.groupby(key_cols, sort=False, dropna=False)
        mx = g[x_col].transform("mean")
        my = g[y_col].transform("mean")
        dx = df[x_col] - mx
        dy = df[y_col] - my
        df["_m2x"], df["_m2y"], df["_cxy"] = dx * dx, dy * dy, dx * dy
        agg = g.agg(
            n=(x_col, "size"), mean_x=(x_col, "mean"), mean_y=(y_col, "mean")
        ).reset_index()
        sums = (
            df.groupby(key_cols, sort=False, dropna=False)[["_m2x", "_m2y", "_cxy"]]
            .sum()
            .reset_index(drop=True)
        )
        agg[["m2x", "m2y", "cxy"]] = sums.to_numpy()
        return from_pandas_like(agg, batch.schema)

    return partial


def cube_sum(
    ds,
    levels: list[str],
    int_sum_cols: dict[str, str] | None = None,
    cent_sum_cols: dict[str, str] | None = None,
    count_col: str = "n",
):
    """``GROUP BY CUBE(levels...)``: aggregates at EVERY SUBSET of the key
    columns (2^k grouping sets), rolled-out columns NULL, with the SQL
    ``GROUPING(...)`` bitmask (bit i set ⇔ levels[i] rolled out; the same
    bit order DuckDB uses). One corpus pass builds the finest aggregate
    (:func:`rollup_sum`'s idiom); every other set re-aggregates the finest
    result — work ∝ distinct key combinations, never the corpus. Bounded
    key domains only, same contract as ``grouped_sum(final="driver")``.
    """
    from itertools import combinations

    out_vals = list((int_sum_cols or {}).values()) + list(
        (cent_sum_cols or {}).values()
    ) + [count_col]
    finest = grouped_sum(
        ds, levels, int_sum_cols=int_sum_cols, cent_sum_cols=cent_sum_cols,
        count_col=count_col, final="driver",
    )
    frames = [finest.assign(grouping_id=0)]
    k = len(levels)
    for r in range(0, k):  # kept-column subsets of size r < k (the size-k
        # finest grouping is handled separately above)
        for keep in combinations(range(k), r):
            keep_cols = [levels[i] for i in keep]
            agg = (
                finest.groupby(keep_cols, as_index=False, sort=False, dropna=False)[out_vals].sum()
                if keep_cols
                else finest[out_vals].sum().to_frame().T
            )
            gid = 0
            for i in range(k):
                if i not in keep:
                    agg[levels[i]] = _typed_null_level(finest[levels[i]].dtype, agg.index)
                    gid |= 1 << (k - 1 - i)  # GROUPING() treats the FIRST level as the high bit
            agg["grouping_id"] = gid
            frames.append(agg[levels + out_vals + ["grouping_id"]])
    return pd.concat(frames, ignore_index=True)[levels + out_vals + ["grouping_id"]]


def global_topk(ds, sort_cols: list[str], k: int, descending: list[bool] | None = None):
    """Global ``ORDER BY ... LIMIT k`` without a global sort: each batch
    keeps its local top-k (one Arrow ``sort_indices`` + ``take`` — the
    combiner), and the driver merges the ≤ k-per-batch survivors (bounded:
    k × batches rows stream in, k rows live after each merge step). The
    scale contrast is ``Dataset.sort().limit(k)``, which pays a full
    corpus range-shuffle for k rows. Callers pass a TOTAL order (tie-break
    columns included) so the result is deterministic and SQL-mirrorable."""
    import pyarrow.compute as pc

    desc = descending or [False] * len(sort_cols)
    keys = [(c, "descending" if d else "ascending") for c, d in zip(sort_cols, desc)]

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows <= k:
            return batch
        return batch.take(pc.sort_indices(batch, sort_keys=keys)[:k])

    merged = None
    for b in (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .iter_batches(batch_size=None, batch_format="pyarrow")
    ):
        merged = b if merged is None else pa.concat_tables([merged, b], promote_options="default")
        if merged.num_rows > k:
            merged = merged.take(pc.sort_indices(merged, sort_keys=keys)[:k])
    if merged is None:
        return ds.limit(0).to_pandas()
    return merged.take(pc.sort_indices(merged, sort_keys=keys)).to_pandas()


def grouped_mode(ds, key_col: str, value_col: str, n_parts: int = 64):
    """Most frequent value per key → (key, mode_value, mode_count), ties
    broken deterministically by SMALLEST value (the SQL mirror's
    ``ROW_NUMBER ... ORDER BY COUNT(*) DESC, value``).

    Combiner shape: each batch pre-counts (key, value) pairs with one
    Arrow ``group_by`` (the shuffle moves one row per distinct pair per
    batch, never raw rows), then a hash-partitioned merge re-sums pair
    counts and takes each key's first row under (count desc, value asc) —
    one sort + head per partition, no per-key Python."""
    from .grouping import partitioned_map_groups

    def precount(batch: pa.Table) -> pa.Table:
        t = batch.select([key_col, value_col])
        if not t.num_rows:
            return t.append_column("c", pa.array([], pa.int64()))
        return t.group_by([key_col, value_col]).aggregate([([], "count_all")]).rename_columns(
            [key_col, value_col, "c"]
        )

    pairs = ds.map_batches(precount, batch_format="pyarrow", zero_copy_batch=True)

    def pick_part(g: pd.DataFrame) -> pd.DataFrame:
        merged = (
            g.groupby([key_col, value_col], sort=False, as_index=False, dropna=False)["c"].sum()
            .sort_values([key_col, "c", value_col], ascending=[True, False, True], kind="mergesort")
        )
        top = merged.drop_duplicates(key_col, keep="first")
        return top.rename(columns={value_col: "mode_value", "c": "mode_count"})

    return partitioned_map_groups(pairs, key_col, pick_part, n_parts=n_parts)


def exact_order_stats(ds, col: str, ks=None, bins: int = 4096, cap: int = 200_000, max_rounds: int = 12, median: bool = False):
    """Exact 0-indexed order statistics of a numeric column — the
    distributed SELECTION algorithm (quantiles without a global sort):

    each round is ONE streaming pass emitting per-batch histogram partials
    over the current candidate interval (``bins`` int64 counts per batch —
    the driver folds O(bins) scalars, never rows), narrowing to the bucket
    span that contains the requested ranks; when few enough candidates
    remain (``cap``) one final pass collects just those values and indexes
    them exactly. O(log_bins(n/cap)) passes — 2 for corpus-scale inputs.

    Contrast: ``Dataset.sort`` pays a full range-shuffle of every row for
    the same answer; the per-key variant of this need is served by
    `grouped_quantile` (exact) / `grouped_quantile_sketch` (mergeable).
    NaNs raise (no total order). ``ks`` may hold several ranks (e.g. both
    middle elements of an even-count median); they are refined JOINTLY.
    ``median=True`` resolves the middle rank(s) from the row count this
    function's own min/max pass already produces — callers that need the
    median must not pay a separate full count scan just to compute ks.
    """
    if median == (ks is not None):
        raise ValueError("exact_order_stats: pass exactly one of ks / median=True")
    if ks is not None:
        ks = sorted(int(k) for k in ks)

    def minmax_partial(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy(zero_copy_only=False)
        if v.size and np.isnan(v).any():
            raise ValueError(f"exact_order_stats: column {col!r} contains NaN")
        if v.size == 0:
            return pa.table({"lo": pa.array([], pa.float64()),
                             "hi": pa.array([], pa.float64()),
                             "n": pa.array([], pa.int64())})
        return pa.table({"lo": pa.array([float(v.min())]),
                         "hi": pa.array([float(v.max())]),
                         "n": pa.array([int(v.size)], pa.int64())})

    parts = ds.map_batches(
        minmax_partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    if not parts:
        raise ValueError("exact_order_stats: empty input")
    lo = min(p["lo"] for p in parts)
    hi = max(p["hi"] for p in parts)
    n = sum(p["n"] for p in parts)
    if median:
        ks = [n // 2] if n % 2 else [n // 2 - 1, n // 2]
    if ks[0] < 0 or ks[-1] >= n:
        raise ValueError(f"ranks {ks} out of range for {n} rows")
    below = 0  # rows strictly below the current interval

    for _ in range(max_rounds):
        def count_partial(batch: pa.Table, _lo=lo, _hi=hi) -> pa.Table:
            v = batch.column(col).to_numpy(zero_copy_only=False)
            inside = v[(v >= _lo) & (v <= _hi)]
            edges = np.linspace(_lo, _hi, bins + 1)
            h, _ = np.histogram(inside, bins=edges)
            return pa.table({"h": pa.array([h.astype(np.int64)], pa.list_(pa.int64()))})

        rows = ds.map_batches(
            count_partial, batch_format="pyarrow", zero_copy_batch=True
        ).take_all()
        h = np.sum([np.asarray(r["h"], dtype=np.int64) for r in rows], axis=0)
        total_in = int(h.sum())
        if total_in <= cap or lo == hi:
            break
        cum = below + np.cumsum(h)
        b_first = int(np.searchsorted(cum, ks[0] + 1))
        b_last = int(np.searchsorted(cum, ks[-1] + 1))
        edges = np.linspace(lo, hi, bins + 1)
        new_below = below + int(h[:b_first].sum())
        new_lo, new_hi = float(edges[b_first]), float(edges[b_last + 1])
        # floating bucket edges can stall (lo==new_lo, hi==new_hi with a
        # huge equal-value bucket) — then the candidates ARE collectable
        if (new_lo, new_hi) == (lo, hi):
            break
        below, lo, hi = new_below, new_lo, new_hi

    if lo == hi:
        # the interval collapsed to one value — every remaining candidate
        # equals it, so the selection is answered without collecting a row
        # (the heavy-duplicate stall case: a billion equal values never
        # reach the driver)
        return [float(lo)] * len(ks), n

    def collect_partial(batch: pa.Table, _lo=lo, _hi=hi) -> pa.Table:
        # ship per-batch (value, count) UNIQUES, not raw rows — a column
        # dominated by a few duplicated values collapses to a few rows per
        # batch regardless of how many rows sit in the final interval
        v = batch.column(col).to_numpy(zero_copy_only=False)
        keep = v[(v >= _lo) & (v <= _hi)]
        u, c = np.unique(keep, return_counts=True)
        return pa.table({"v": pa.array(u, pa.float64()), "c": pa.array(c, pa.int64())})

    # hard driver ceiling on DISTINCT candidate values (raw rows never ship):
    # wide joint-rank spans legitimately exceed `cap`, so floor the ceiling
    # at 1M distinct doubles (~16 MB) — plenty for any stalled refinement,
    # still a refusal for a pathological all-distinct corpus-scale interval
    budget = max(int(cap) * 8, 1_000_000)

    def _merge(uv: np.ndarray, uc: np.ndarray):
        u, inv = np.unique(uv, return_inverse=True)
        return u, np.bincount(inv, weights=uc).astype(np.int64)

    # accumulate chunks and fold only at budget checkpoints — a per-block
    # concatenate would re-copy the whole accumulated array once per block
    # (O(blocks × size) driver memcpy on corpus-scale inputs)
    uv = np.array([], dtype=np.float64)
    uc = np.array([], dtype=np.int64)
    chunks_v, chunks_c, pending = [], [], 0
    for b in ds.map_batches(
        collect_partial, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_size=None, batch_format="pyarrow"):
        bv = b.column("v").to_numpy(zero_copy_only=False)
        chunks_v.append(bv)
        chunks_c.append(b.column("c").to_numpy(zero_copy_only=False))
        pending += bv.size
        if uv.size + pending > budget:
            uv, uc = _merge(
                np.concatenate([uv, *chunks_v]), np.concatenate([uc, *chunks_c])
            )  # re-fold duplicates before judging
            chunks_v, chunks_c, pending = [], [], 0
            if uv.size > budget:
                raise ValueError(
                    f"exact_order_stats: {uv.size} distinct candidate values "
                    f"exceed the driver budget ({budget}); raise `cap`/`bins` "
                    "or `max_rounds` so refinement can narrow further"
                )
    uv, uc = _merge(np.concatenate([uv, *chunks_v]), np.concatenate([uc, *chunks_c]))
    cum = below + np.cumsum(uc)
    return [float(uv[int(np.searchsorted(cum, k + 1))]) for k in ks], n


def global_median(ds, col: str):
    """Exact global median (SQL ``MEDIAN`` semantics: even counts average
    the two middle values) via :func:`exact_order_stats` — never a global
    sort, and no separate count pass: the middle ranks resolve from the
    row count the selection's own min/max pass produces."""
    vals, n = exact_order_stats(ds, col, median=True)
    if n % 2:
        return vals[0]
    return (vals[0] + vals[1]) / 2.0
