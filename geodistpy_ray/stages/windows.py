"""Streaming-shaped window operators over an (ordered, keyed) event log.

Ray Data has no event-time windows or watermarks (SURVEY.md §2.4); the
engine treats the events table as a keyed log: partition by key
(``groupby``), sort by timestamp *within* the key's group, and compute the
window semantics there. Late data is therefore handled by re-running the
partition (batch semantics), and ordering is only guaranteed within a key —
both stated assumptions, matching the reference's batch-only model.

Timestamps are handled as integer microseconds throughout so results are
bit-reproducible against the SQL oracle (``epoch_us``-based expressions).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _us(batch: pa.Table, ts_col: str) -> tuple[np.ndarray, np.ndarray]:
    """(int64 µs, null mask) — EXACT over the full timestamp range.

    Explicit µs cast first: a timestamp[ns] column cast straight to int64
    silently yields NANOseconds (caught by tests/test_joins.py offset test).
    Null handling stays in Arrow (``fill_null`` + ``is_null``): a numpy
    round-trip of a null-bearing column floats the VALID lanes too, and
    float64 rounds µs values above 2^53 (~year 2255) — the SQL mirrors all
    compute on exact ``epoch_us`` integers.
    """
    ts = batch.column(ts_col).combine_chunks()
    arr = ts.cast(pa.timestamp("us")).cast(pa.int64())
    nat = pc.is_null(arr).to_numpy(zero_copy_only=False)
    return arr.fill_null(0).to_numpy(), nat


def _window_key(us: np.ndarray, div: int, sub: int = 0, mask: np.ndarray | None = None) -> pa.Array:
    """``(us - sub) // div`` as a NULLABLE int64 window key.

    SQL's ``(epoch_us(ts) - sub) // div`` on a null timestamp yields a NULL
    key that GROUP BY keeps as one group — ``mask`` marks those lanes (their
    filled-zero arithmetic is discarded by Arrow's validity bitmap).
    """
    w = (us - sub) // div
    if mask is not None and mask.any():
        return pa.array(w, pa.int64(), mask=mask)
    return pa.array(w, pa.int64())


def tumbling_window_agg(
    ds,
    key_col: str,
    ts_col: str,
    window_us: int,
    value_col: str | None = None,
    final: str = "driver",
):
    """Per-(key, tumbling-window) counts (+ value cents sum) — partial+final.

    Window assignment is stateless (``epoch_us // window_us``), so this is a
    pure ``map_batches`` combiner followed by the grouped merge — no per-key
    ordering needed at all. The (key × window) domain grows with BOTH
    cardinality and time span — pass ``final="partitioned"`` (returns a
    Dataset, not a DataFrame) when it is corpus-scale; the default driver
    final raises past its distinct-key budget rather than silently
    materializing.
    """
    from .relational import grouped_sum

    def assign(batch: pa.Table) -> pa.Table:
        us, nat = _us(batch, ts_col)
        return batch.append_column(
            "window_key", _window_key(us, window_us, mask=nat)
        )

    ds2 = ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
    cent_cols = {value_col: "sum_value_cents"} if value_col else None
    return grouped_sum(
        ds2, [key_col, "window_key"], cent_sum_cols=cent_cols, count_col="n",
        final=final,
    )


def hopping_window_agg(
    ds,
    key_col: str,
    ts_col: str,
    window_us: int,
    hop_us: int,
    value_col: str | None = None,
    offset_us: int = 0,
    final: str = "driver",
):
    """Per-(key, hopping-window) counts (+ value cents sum).

    ``window_us`` must be an integer multiple of ``hop_us``; each event lands
    in ``window_us // hop_us`` overlapping windows (window k covers
    ``[offset + k*hop, offset + k*hop + window)`` — ``offset_us`` shifts the
    whole window grid for unaligned schedules). Assignment is a stateless row replication
    inside ``map_batches`` (zero-copy ``take``), then the same partial+final
    grouped merge as the tumbling case — no per-key ordering needed.
    """
    from .relational import grouped_sum

    if window_us % hop_us:
        raise ValueError("window_us must be an integer multiple of hop_us")
    m = window_us // hop_us

    def assign(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        us, nat = _us(batch, ts_col)
        base = _window_key(us, hop_us, sub=offset_us, mask=nat)
        idx = np.repeat(np.arange(n, dtype=np.int64), m)
        # null-ts rows replicate as m NULL window keys, matching the SQL
        # mirror's m per-hop NULL rows (arithmetic on a null stays null)
        wk = pc.subtract(
            base.take(pa.array(idx)),
            pa.array(np.tile(np.arange(m, dtype=np.int64), n)),
        )
        out = batch.take(pa.array(idx))
        return out.append_column("window_key", wk)

    ds2 = ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
    cent_cols = {value_col: "sum_value_cents"} if value_col else None
    return grouped_sum(
        ds2, [key_col, "window_key"], cent_sum_cols=cent_cols, count_col="n",
        final=final,
    )


def sessionize(
    ds,
    key_col: str,
    ts_col: str,
    gap_us: int,
    order_tiebreak_col: str | None = None,
):
    """Session counts per key with an inactivity gap → (key, n_sessions).

    ``groupby(key).map_groups``: sort the key's events by (ts, tiebreak),
    count gaps > ``gap_us`` (+1). The session count is invariant to the
    ordering of exact-tie timestamps, so only ts ordering is load-bearing.
    """

    from .grouping import partitioned_map_groups

    def part_fn(g: pd.DataFrame) -> pd.DataFrame:
        # one hash partition of keys (bounded group count, stages/grouping.py):
        # sort by (key, ts), count within-key gaps vectorized
        order = [key_col, ts_col] + ([order_tiebreak_col] if order_tiebreak_col else [])
        g = g.sort_values(order, kind="mergesort")
        keys = g[key_col].to_numpy()
        dt = g[ts_col].to_numpy("datetime64[us]")
        nat = np.isnat(dt)
        us = dt.astype(np.int64)
        # null keys form ONE group like SQL PARTITION BY (NaN == NaN is
        # False, so the raw comparison would split every null row into its
        # own session run; the sort already made them adjacent)
        k1, k0 = keys[1:], keys[:-1]
        same_key = (k1 == k0) | (pd.isna(k1) & pd.isna(k0))
        # null-ts parity with the LAG mirror (`prev_us IS NULL OR
        # us - prev_us > gap`): NaT sorts last within the key, so a row
        # whose PREDECESSOR is null always breaks (LAG(us) IS NULL), a
        # null row after a valid one never does (NULL - x is NULL, not
        # > gap), and the raw int64 diff (NaT = INT64_MIN, wrapping) is
        # masked out of both cases
        d = us[1:] - us[:-1]
        gap_brk = nat[:-1] | (~nat[1:] & (d > gap_us))
        brk = np.concatenate(([False], same_key & gap_brk))
        counts = (
            pd.Series(brk, index=g.index)
            .groupby(g[key_col], sort=False, dropna=False)
            .sum()
            + 1
        )
        out = counts.reset_index()
        out.columns = [key_col, "n_sessions"]
        out["n_sessions"] = out["n_sessions"].astype(np.int64)
        return out

    return partitioned_map_groups(ds, key_col, part_fn)


def late_event_stats(ds, key_col: str, ts_col: str, watermark_us: int):
    """Per-key late-data accounting for a watermark of ``watermark_us``.

    Batch-model analogue of streaming watermark drops: an event is "late"
    if it is older than the key's maximum timestamp minus the watermark —
    i.e. a pipeline holding a ``watermark_us`` lateness allowance would
    have closed its window before this event arrived. Emits
    ``(key, n_events, n_late)``; SQL mirror:
    ``ts < MAX(ts) OVER (PARTITION BY key) - watermark``.

    Decomposable per batch? No — lateness depends on the key's GLOBAL max,
    so rows co-locate by key (hash partition, stages/grouping.py); within a
    partition one grouped transform('max') classifies every row vectorized.
    """
    from .grouping import partitioned_map_groups

    def part_fn(g: pd.DataFrame) -> pd.DataFrame:
        # Nullable Int64 gives the SQL mirror's null semantics with EXACT
        # arithmetic: a null ts is never late (`NULL < x` is NA → CASE
        # else 0) but still counts in n_events, an all-null key's MAX is
        # NULL, and the valid lanes never round through float64 (the
        # int64 NaT image would classify every null row late AND wrap
        # `mx - watermark_us`; a NaN-float detour rounds µs above 2^53).
        dt = g[ts_col].to_numpy("datetime64[us]")
        us = pd.Series(
            pd.arrays.IntegerArray(dt.view("i8"), mask=np.isnat(dt)),
            index=g.index,
        )
        mx = us.groupby(g[key_col], sort=False, dropna=False).transform("max")
        late = (us < (mx - watermark_us)).fillna(False)
        out = pd.DataFrame({key_col: g[key_col], "__late": late.astype(np.int64)})
        agg = out.groupby(key_col, as_index=False, sort=False, dropna=False).agg(
            n_events=("__late", "size"), n_late=("__late", "sum")
        )
        agg["n_events"] = agg["n_events"].astype(np.int64)
        agg["n_late"] = agg["n_late"].astype(np.int64)
        return agg

    return partitioned_map_groups(ds, key_col, part_fn)


def rolling_count(
    ds,
    key_col: str,
    ts_col: str,
    window_us: int,
    out_col: str = "n_in_window",
    tiebreak_col: str | None = None,
):
    """Per-event trailing-window count: for each row, how many same-key rows
    have ``ts`` in ``(row.ts - window_us, row.ts]`` (inclusive of self).

    SQL ``COUNT(*) OVER (PARTITION BY key ORDER BY ts RANGE BETWEEN
    window-1 PRECEDING AND CURRENT ROW)``. Per-key sort + two
    ``searchsorted`` passes — vectorized inside ``map_groups``.
    """

    from .grouping import partitioned_map_groups

    def part_fn(g: pd.DataFrame) -> pd.DataFrame:
        # one hash partition of keys: sort by (key, ts), run the two
        # searchsorted passes per key SPAN (plain array slices, no per-key
        # frames — see stages/grouping.py)
        from .grouping import key_spans

        order = [key_col, ts_col] + ([tiebreak_col] if tiebreak_col else [])
        g = g.sort_values(order, kind="mergesort").reset_index(drop=True)
        keys = g[key_col].to_numpy()
        dt = g[ts_col].to_numpy("datetime64[us]")
        nat = np.isnat(dt)
        us = dt.astype(np.int64)
        out = np.empty(us.size, dtype=np.int64)
        for s, e in zip(*key_spans(keys)):
            # NaT sorts last within the key; its INT64_MIN int64 image
            # would break searchsorted's sortedness AND underflow the
            # window subtraction — split the span at the null boundary.
            # SQL RANGE frames make null ordering keys one peer group
            # whose frame is exactly its peers (verified against DuckDB),
            # so every null row counts the key's null rows.
            nv = int((~nat[s:e]).sum())
            seg = us[s : s + nv]
            lo = np.searchsorted(seg, seg - window_us + 1, side="left")
            hi = np.searchsorted(seg, seg, side="right")
            out[s : s + nv] = hi - lo
            out[s + nv : e] = (e - s) - nv
        g[out_col] = out
        return g

    return partitioned_map_groups(ds, key_col, part_fn)


def add_rank(
    ds,
    key_col: str,
    order_col: str,
    tiebreak_col: str | None = None,
    out_col: str = "rnk",
    n_parts: int = 64,
):
    """Per-key ROW_NUMBER: the 1-based position of each row in its key's
    ``(order_col[, tiebreak_col])`` ordering — SQL ``ROW_NUMBER() OVER
    (PARTITION BY key ORDER BY ...)``. One bounded-partition co-location
    (stages/grouping.py); inside a partition one Arrow sort + a
    span-relative ``arange`` — no per-key frames, Arrow in/out. Pass a
    unique ``tiebreak_col`` for deterministic numbering under order ties.
    """
    from .grouping import key_spans, partitioned_map_groups

    sort_keys = [(key_col, "ascending"), (order_col, "ascending")] + (
        [(tiebreak_col, "ascending")] if tiebreak_col else []
    )

    def part_fn(t: pa.Table) -> pa.Table:
        t = t.sort_by(sort_keys)
        keys = t.column(key_col).combine_chunks().to_numpy(zero_copy_only=False)
        n = keys.size
        if n == 0:
            return t.append_column(out_col, pa.array([], pa.int64()))
        starts, ends = key_spans(keys)
        rnk = np.arange(n, dtype=np.int64) - np.repeat(starts, ends - starts) + 1
        return t.append_column(out_col, pa.array(rnk, pa.int64()))

    return partitioned_map_groups(
        ds, key_col, part_fn, n_parts=n_parts, part_format="pyarrow"
    )


def geodesic_track_length(
    ds,
    key_col: str,
    ts_col: str,
    lat_col: str = "lat",
    lon_col: str = "lon",
    tiebreak_col: str | None = None,
    kernel: str = "haversine",
    n_parts: int = 64,
):
    """Per-key geodesic path length over the key's time-ordered points →
    ``(key, n_legs, track_mm)``.

    The LAG-composed geo window: order each key's points by
    ``(ts[, tiebreak])``, measure every consecutive leg with the chosen
    distance kernel, and sum. Legs are converted to INTEGER millimeters
    (``floor(m*1000 + 0.5)`` — the engine's money-cents convention at the
    haversine_sql-documented 1e-3 m comparison resolution) so the per-key
    sum is order-independent and bit-identical to the SQL mirror's
    ``SUM(leg_mm)``. Keys with a single point (no legs) are dropped, like
    the mirror's ``WHERE prev IS NOT NULL``.

    One bounded-partition co-location (stages/grouping.py); inside a
    partition everything is one Arrow sort + one vectorized kernel call +
    ``np.add.reduceat`` over key spans — no per-key frames, Arrow in/out.
    """
    from ..kernels import resolve_ellipsoid
    from .geo import distance_kernel
    from .grouping import key_spans, partitioned_map_groups, same_adjacent

    kfn = distance_kernel(kernel)
    _a, _f = resolve_ellipsoid("WGS-84")
    sort_keys = [(key_col, "ascending"), (ts_col, "ascending")] + (
        [(tiebreak_col, "ascending")] if tiebreak_col else []
    )

    def part_fn(t: pa.Table) -> pa.Table:
        t = t.sort_by(sort_keys)
        keys = t.column(key_col).combine_chunks().to_numpy(zero_copy_only=False)
        lat = t.column(lat_col).combine_chunks().to_numpy(zero_copy_only=False)
        lon = t.column(lon_col).combine_chunks().to_numpy(zero_copy_only=False)
        n = keys.size
        if n == 0:
            return pa.table(
                {
                    key_col: pa.array([], t.schema.field(key_col).type),
                    "n_legs": pa.array([], pa.int64()),
                    "track_mm": pa.array([], pa.int64()),
                }
            )
        leg_mm = np.zeros(n, dtype=np.int64)  # leg_mm[i] = leg ENDING at row i
        if n > 1:
            d = kfn(lat[:-1], lon[:-1], lat[1:], lon[1:], _a, _f)
            # null-aware compare (grouping.same_adjacent): a raw == mask is
            # NaN-blind on null-laundered numeric keys, zeroing the NULL
            # group's legs while key_spans still keeps its span
            same = same_adjacent(keys)
            leg_mm[1:] = np.where(same, np.floor(d * 1000.0 + 0.5).astype(np.int64), 0)
        starts, ends = key_spans(keys)
        track = np.add.reduceat(leg_mm, starts)  # leg_mm[start-of-key] is 0
        n_legs = ends - starts - 1
        keep = n_legs > 0
        return pa.table(
            {
                # take() from the SORTED input column: exact input type for
                # cross-partition schema stability AND null keys survive
                # (the numpy detour would yield NaN, which no int64 cast
                # accepts)
                key_col: t.column(key_col)
                .combine_chunks()
                .take(pa.array(starts[keep])),
                "n_legs": pa.array(n_legs[keep], pa.int64()),
                "track_mm": pa.array(track[keep], pa.int64()),
            }
        )

    return partitioned_map_groups(
        ds, key_col, part_fn, n_parts=n_parts, part_format="pyarrow"
    )


def simplify_tracks(
    ds,
    key_col: str,
    ts_col: str,
    tol_m: float,
    lat_col: str = "lat",
    lon_col: str = "lon",
    tiebreak_col: str | None = None,
    n_parts: int = 64,
):
    """Douglas–Peucker track simplification per key: order each key's
    points by ``(ts[, tiebreak])``, keep the DP subset whose great-circle
    cross-track deviation stays ≤ ``tol_m``, drop the rest (endpoints are
    always kept). Returns the kept rows with all input columns.

    One bounded-partition co-location (stages/grouping.py); within a
    partition one Arrow sort, then the vectorized DP mask
    (``kernels/simplify.py``) per key SPAN — per-key work is the
    algorithm's inherent O(track·splits), on plain array slices, never
    per-key frames. Tracks of a key must fit one partition's memory —
    the same assumption every per-key window here makes.
    """
    from ..kernels.simplify import simplify_mask
    from .grouping import key_spans, partitioned_map_groups

    sort_keys = [(key_col, "ascending"), (ts_col, "ascending")] + (
        [(tiebreak_col, "ascending")] if tiebreak_col else []
    )

    def part_fn(t: pa.Table) -> pa.Table:
        t = t.sort_by(sort_keys)
        keys = t.column(key_col).combine_chunks().to_numpy(zero_copy_only=False)
        lat = t.column(lat_col).combine_chunks().to_numpy(zero_copy_only=False)
        lon = t.column(lon_col).combine_chunks().to_numpy(zero_copy_only=False)
        keep = np.zeros(keys.size, dtype=bool)
        for s, e in zip(*key_spans(keys)):
            keep[s:e] = simplify_mask(lat[s:e], lon[s:e], tol_m)
        return t.filter(pa.array(keep))

    return partitioned_map_groups(
        ds, key_col, part_fn, n_parts=n_parts, part_format="pyarrow"
    )


def densify_tracks(
    ds,
    key_col: str,
    ts_col: str,
    max_leg_m: float,
    lat_col: str = "lat",
    lon_col: str = "lon",
    tiebreak_col: str | None = None,
    n_parts: int = 64,
    round_to: int | None = 6,
    radius: float = 6371009.0,
):
    """Geodesic track densification — the distributed form of the
    reference's ``interpolate`` (P6): every consecutive leg longer than
    ``max_leg_m`` gains ``ceil(d/max_leg)−1`` great-circle slerp points.
    Returns ONLY the inserted points, one row per
    ``(key, leg_idx, k, lat, lon)`` — ``leg_idx`` is the 1-based rank of
    the leg's start row within its key, ``k`` the 1-based insert index.

    Slerp (the standard spherical form): with central angle δ = d/R and
    fraction f = k/n,  A = sin((1−f)δ)/sin δ,  B = sin(fδ)/sin δ, the point
    is atan2 over the A/B-blended Cartesian coordinates. fp ordering is
    mirrored term-for-term by the SQL oracle; outputs round to
    ``round_to`` decimals of degrees (6 ≈ 0.1 m).

    One bounded-partition co-location; inside a partition everything is
    one Arrow sort + vectorized kernel math + one repeat-explode — no
    Python per row.
    """
    from .grouping import key_spans, partitioned_map_groups, same_adjacent

    if key_col in ("leg_idx", "k"):
        # the output table is a dict literal — a key column named like a
        # fixed output column would silently overwrite it, not error
        raise ValueError(
            f"densify_tracks: key_col={key_col!r} collides with an output "
            "column ('leg_idx'/'k'); rename the key column"
        )
    sort_keys = [(key_col, "ascending"), (ts_col, "ascending")] + (
        [(tiebreak_col, "ascending")] if tiebreak_col else []
    )

    def part_fn(t: pa.Table) -> pa.Table:
        t = t.sort_by(sort_keys)
        empty = pa.table(
            {
                key_col: pa.array([], t.schema.field(key_col).type),
                "leg_idx": pa.array([], pa.int64()),
                "k": pa.array([], pa.int64()),
                lat_col: pa.array([], pa.float64()),
                lon_col: pa.array([], pa.float64()),
            }
        )
        keys = t.column(key_col).combine_chunks().to_numpy(zero_copy_only=False)
        lat = t.column(lat_col).combine_chunks().to_numpy(zero_copy_only=False)
        lon = t.column(lon_col).combine_chunks().to_numpy(zero_copy_only=False)
        m = keys.size
        if m < 2:
            return empty
        from ..kernels.sphere import haversine

        # leg starting at row i (same key as row i+1 only); null-aware
        # compare so the SQL NULL partition's legs densify too
        d = haversine(lat[:-1], lon[:-1], lat[1:], lon[1:], radius=radius)
        same = same_adjacent(keys)
        # 1-based rank of each row within its key span = leg_idx of the leg
        # it starts
        starts, ends = key_spans(keys)
        rnk = np.arange(m, dtype=np.int64) - np.repeat(starts, ends - starts) + 1
        big = same & (d > max_leg_m)
        if not big.any():
            return empty
        i = np.flatnonzero(big)  # leg start rows
        n = np.ceil(d[i] / max_leg_m).astype(np.int64)
        reps = n - 1
        src = np.repeat(i, reps)
        leg_n = np.repeat(n, reps)
        offs = np.cumsum(reps) - reps
        k = np.arange(src.size, dtype=np.int64) - np.repeat(offs, reps) + 1
        f = k.astype(np.float64) / leg_n.astype(np.float64)
        delta = (d[src] / radius)
        sd = np.sin(delta)
        if (np.abs(sd) < 1e-12).any():
            # slerp is undefined at antipodes (infinitely many great
            # circles); silently emitting NaN waypoints would poison every
            # downstream cell/rollup — refuse loudly instead
            raise ValueError(
                "densify_tracks: a leg is (near-)antipodal — the great "
                "circle between antipodes is not unique; drop or split "
                "such legs before densifying"
            )
        A = np.sin((1.0 - f) * delta) / sd
        B = np.sin(f * delta) / sd
        rlat1, rlon1 = np.radians(lat[src]), np.radians(lon[src])
        rlat2, rlon2 = np.radians(lat[src + 1]), np.radians(lon[src + 1])
        x = A * np.cos(rlat1) * np.cos(rlon1) + B * np.cos(rlat2) * np.cos(rlon2)
        y = A * np.cos(rlat1) * np.sin(rlon1) + B * np.cos(rlat2) * np.sin(rlon2)
        z = A * np.sin(rlat1) + B * np.sin(rlat2)
        plat = np.degrees(np.arctan2(z, np.sqrt(x * x + y * y)))
        plon = np.degrees(np.arctan2(y, x))
        if round_to is not None:
            plat = np.round(plat, round_to)
            plon = np.round(plon, round_to)
        return pa.table(
            {
                # take() from the sorted input column: exact input type
                # (geodesic_track_length documents the inference hazard)
                # and null keys survive
                key_col: t.column(key_col).combine_chunks().take(pa.array(src)),
                "leg_idx": pa.array(rnk[src], pa.int64()),
                "k": pa.array(k, pa.int64()),
                lat_col: pa.array(plat, pa.float64()),
                lon_col: pa.array(plon, pa.float64()),
            }
        )

    return partitioned_map_groups(
        ds, key_col, part_fn, n_parts=n_parts, part_format="pyarrow"
    )


def add_lag_delta(
    ds,
    key_col: str,
    order_col: str,
    tiebreak_col: str | None = None,
    out_col: str = "gap",
    direction: str = "lag",
    n_parts: int = 64,
):
    """Per-key LAG/LEAD delta. ``direction="lag"``: ``order_col −
    LAG(order_col) OVER (PARTITION BY key ORDER BY order_col[, tiebreak])``
    — NULL on each key's first row (time since previous event).
    ``direction="lead"``: ``LEAD(order_col) − order_col`` — NULL on each
    key's last row (time TO the next event, the churn/inactivity feature).
    One bounded-partition co-location (see stages/grouping.py); within a
    partition the deltas are ONE vectorized diff with key-change positions
    nulled — no per-key frames.
    """
    import numpy as np
    import pandas as pd

    from .grouping import partitioned_map_groups, same_adjacent

    if direction not in ("lag", "lead"):
        raise ValueError(f"direction must be 'lag' or 'lead', got {direction!r}")
    order = [key_col, order_col] + ([tiebreak_col] if tiebreak_col else [])

    def part_fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order, kind="mergesort", ignore_index=True)
        v = g[order_col].to_numpy()
        nat = None
        if np.issubdtype(v.dtype, np.datetime64):
            # Subtract in int64 and NULL the null-adjacent lanes afterwards
            # (x - NULL is NULL): rounding the OPERANDS through float64
            # would lose µs precision above 2^53 even on null-free data,
            # while an int64 DIFF is exact and its float image is exact up
            # to a 2^53 µs (~285-year) gap.
            dt = v.astype("datetime64[us]")
            nat = np.isnat(dt)
            v = dt.view("i8")
        keys = g[key_col].to_numpy()
        delta = np.full(len(g), np.nan)
        if len(g) > 1:
            d = (v[1:] - v[:-1]).astype(np.float64)
            if nat is not None and nat.any():
                d[nat[1:] | nat[:-1]] = np.nan
            # null-aware: SQL's LAG partitions NULL keys together, the raw
            # == would NULL every delta of a null-laundered numeric key
            same = same_adjacent(keys)
            if direction == "lag":
                delta[1:] = np.where(same, d, np.nan)
            else:
                delta[:-1] = np.where(same, d, np.nan)
        g[out_col] = delta
        return g

    return partitioned_map_groups(ds, key_col, part_fn, n_parts=n_parts)


def session_spans(
    ds,
    key_col: str,
    ts_col: str,
    gap_us: int,
    tiebreak_col: str | None = None,
    n_parts: int = 64,
):
    """Full sessionization: per key, the 1-based session index plus each
    session's (start_us, end_us, n_events) — the span form of
    :func:`sessionize` (which only counts). A new session starts when the
    gap to the previous event exceeds ``gap_us`` (strict, matching the
    count op and the SQL LAG mirror). One bounded-partition co-location;
    inside: one sort, one diff, one cumsum, one reduceat — no per-key
    frames. Exact-tie timestamps can't straddle a session boundary
    (gap 0 ≤ any positive gap), so the output is tiebreak-independent.
    """
    from .grouping import partitioned_map_groups, same_adjacent

    sort_keys = [(key_col, "ascending"), (ts_col, "ascending")] + (
        [(tiebreak_col, "ascending")] if tiebreak_col else []
    )

    def part_fn(t: pa.Table) -> pa.Table:
        t = t.sort_by(sort_keys)
        empty = pa.table(
            {
                key_col: pa.array([], t.schema.field(key_col).type),
                "session_idx": pa.array([], pa.int64()),
                "start_us": pa.array([], pa.int64()),
                "end_us": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
            }
        )
        n = t.num_rows
        if n == 0:
            return empty
        keys = t.column(key_col).combine_chunks().to_numpy(zero_copy_only=False)
        us, nat = _us(t, ts_col)  # exact int64; nulls filled 0 + masked
        brk = np.ones(n, dtype=bool)  # row starts a session
        if n > 1:
            # null-aware like sessionize: a raw == splits the SQL NULL
            # partition into one singleton session per null row; on the
            # ts side the LAG-mirror parity is: predecessor-null always
            # breaks (LAG(us) IS NULL), a null after a valid ts never
            # does (NULL > gap is NULL) — both diff lanes masked so the
            # filled zeros never fake a gap
            same = same_adjacent(keys)
            gap = ~nat[1:] & ~nat[:-1] & (np.diff(us) > gap_us)
            brk[1:] = ~same | gap | nat[:-1]
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], n)
        # 1-based session index within each key: global session ordinal
        # minus the ordinal of the key's FIRST session
        key_of_sess = keys[starts]
        newkey = np.r_[True, ~same_adjacent(key_of_sess)]
        base_idx = np.maximum.accumulate(np.where(newkey, np.arange(starts.size), 0))
        sidx = np.arange(starts.size, dtype=np.int64) - base_idx + 1
        # session extremes ignore null ts like SQL MIN/MAX: nulls sort
        # last per key, so a session's valid rows are its prefix — the
        # start is row `starts` and the end is its LAST VALID row; an
        # all-null session gets NULL bounds. Pure int64 indexing: no lane
        # ever visits float64, so far-future timestamps stay bit-exact.
        cs = np.concatenate(([0], np.cumsum(~nat).astype(np.int64)))
        n_valid = cs[ends] - cs[starts]
        has_ts = n_valid > 0
        start_vals = us[starts]
        end_vals = us[starts + np.maximum(n_valid, 1) - 1]
        return pa.table(
            {
                # take() from the sorted input column: exact input type per
                # partition (numpy inference floats null-bearing int keys)
                # and null keys survive
                key_col: t.column(key_col).combine_chunks().take(pa.array(starts)),
                "session_idx": pa.array(sidx, pa.int64()),
                "start_us": pa.array(start_vals, pa.int64(), mask=~has_ts),
                "end_us": pa.array(end_vals, pa.int64(), mask=~has_ts),
                "n_events": pa.array((ends - starts).astype(np.int64)),
            }
        )

    return partitioned_map_groups(
        ds, key_col, part_fn, n_parts=n_parts, part_format="pyarrow"
    )


def stay_points(
    ds,
    eps_m: float,
    min_dur_us: int,
    key_col: str,
    ts_col: str,
    lat_col: str = "lat",
    lon_col: str = "lon",
    tiebreak_col: str | None = None,
    max_gap_us: int | None = None,
    min_pts: int = 2,
    kernel: str = "haversine",
    n_parts: int = 64,
):
    """Trajectory stay-point detection → ``(key, start_us, end_us, n_pts,
    dur_us, clat, clon)``: one row per maximal run of a key's consecutive
    time-ordered points whose every LEG stays within ``eps_m`` (and, when
    ``max_gap_us`` is set, whose every time gap stays within it), kept when
    the run spans ``>= min_dur_us`` and ``>= min_pts`` points.

    The consecutive-leg variant of the classic GPS stay-point extraction
    (Li et al. 2008 use an anchor-distance rule; the leg rule is its
    window-function-expressible sibling — exactly a SQL ``LAG`` + break-flag
    ``SUM() OVER`` run id + ``GROUP BY ... HAVING``, which is what the
    oracle mirrors). Legs compare in INTEGER millimeters
    (``floor(m·1000 + 0.5)``, the haversine_sql comparison resolution) so
    the break decision is bit-identical on both sides; run centroids use
    the shared integer micro-degree tie rule (stages/geo.py:micro_deg /
    micro_mean); timestamps stay exact int64 µs throughout (``_us``).

    Scale shape: rows with a NULL key or timestamp are dropped up front
    (the sessionize convention — SQL window PARTITION BY cannot order
    them), then ONE bounded hash-partition co-location on the key; inside
    a partition everything is one Arrow sort + one vectorized kernel call
    over consecutive rows + ``reduceat`` over run spans — no per-key
    frames, Arrow in/out.
    """
    from .geo import distance_kernel, micro_deg, micro_mean
    from .grouping import key_spans, partitioned_map_groups, same_adjacent

    if min_pts < 1:
        raise ValueError("stay_points: min_pts must be >= 1")
    kfn = distance_kernel(kernel)
    from ..kernels import resolve_ellipsoid

    _a, _f = resolve_ellipsoid("WGS-84")
    eps_mm = np.int64(np.floor(float(eps_m) * 1000.0 + 0.5))
    sort_keys = [(key_col, "ascending"), (ts_col, "ascending")] + (
        [(tiebreak_col, "ascending")] if tiebreak_col else []
    )

    def drop_nulls(batch: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.is_valid(batch.column(key_col)), pc.is_valid(batch.column(ts_col))
        )
        return batch.filter(mask)

    ds = ds.map_batches(drop_nulls, batch_format="pyarrow", zero_copy_batch=True)

    def part_fn(t: pa.Table) -> pa.Table:
        key_type = t.schema.field(key_col).type
        empty = pa.table(
            {
                key_col: pa.array([], key_type),
                "start_us": pa.array([], pa.int64()),
                "end_us": pa.array([], pa.int64()),
                "n_pts": pa.array([], pa.int64()),
                "dur_us": pa.array([], pa.int64()),
                "clat": pa.array([], pa.float64()),
                "clon": pa.array([], pa.float64()),
            }
        )
        if t.num_rows == 0:
            return empty
        t = t.sort_by(sort_keys)
        keys = t.column(key_col).combine_chunks().to_numpy(zero_copy_only=False)
        lat = t.column(lat_col).combine_chunks().to_numpy(zero_copy_only=False)
        lon = t.column(lon_col).combine_chunks().to_numpy(zero_copy_only=False)
        us, _nat = _us(t, ts_col)  # nulls already dropped
        n = keys.size
        brk = np.ones(n, dtype=bool)
        if n > 1:
            d = kfn(lat[:-1], lon[:-1], lat[1:], lon[1:], _a, _f)
            leg_mm = np.floor(d * 1000.0 + 0.5).astype(np.int64)
            far = leg_mm > eps_mm
            if max_gap_us is not None:
                far |= (us[1:] - us[:-1]) > np.int64(max_gap_us)
            brk[1:] = far | ~same_adjacent(keys)
        starts = np.flatnonzero(brk)
        ends = np.r_[starts[1:], n]
        n_run = (ends - starts).astype(np.int64)
        start_us = us[starts]
        end_us = us[ends - 1]
        dur = end_us - start_us
        sulat = np.add.reduceat(micro_deg(lat), starts)
        sulon = np.add.reduceat(micro_deg(lon), starts)
        keep = (dur >= np.int64(min_dur_us)) & (n_run >= min_pts)
        if not keep.any():
            return empty
        return pa.table(
            {
                # take() from the SORTED input column: exact input key type
                # for cross-partition schema stability
                key_col: t.column(key_col).combine_chunks().take(pa.array(starts[keep])),
                "start_us": pa.array(start_us[keep], pa.int64()),
                "end_us": pa.array(end_us[keep], pa.int64()),
                "n_pts": pa.array(n_run[keep], pa.int64()),
                "dur_us": pa.array(dur[keep], pa.int64()),
                "clat": pa.array(micro_mean(sulat[keep], n_run[keep]), pa.float64()),
                "clon": pa.array(micro_mean(sulon[keep], n_run[keep]), pa.float64()),
            }
        )

    return partitioned_map_groups(
        ds, key_col, part_fn, n_parts=n_parts, part_format="pyarrow"
    )
