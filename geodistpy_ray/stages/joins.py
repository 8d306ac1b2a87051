"""Generic join stages: broadcast hash join, shuffle (bucketed) equi-join,
as-of join, and broadcast range join.

The reference's only "joins" are dense all-pairs kernels
(`/root/reference/geodistpy/geodesic.py:243-276`) and the radius/kNN
semi-joins (`distance.py:390-540`); a complete engine also needs relational
joins over the star-schema side tables. Scale rules:

- **Broadcast join** (`broadcast_join`): the small side is `ray.put` ONCE and
  joined per batch with Acero (`pyarrow.Table.join`) — no shuffle at all.
  This is the right shape whenever one side fits in a worker's heap
  (dimension tables, query sets).
- **Shuffle join** (`shuffle_equi_join`): both sides large. Each side is
  hash-bucketed on the key, the two sides are unioned into one stream (the
  non-owned columns null-padded so the schemas line up), and ONE sort-based
  shuffle on `__bucket` co-locates matching keys; each bucket then joins
  locally with Acero. One all-to-all total — the same exchange count as a
  classic distributed hash join. Bucket count scales with data size; a
  pathologically hot key bounds a single bucket (document: pre-aggregate or
  broadcast instead when one key dominates).
- **As-of join** (`asof_join`): same bucketed co-location, then
  `pandas.merge_asof(by=key, on=ts)` per bucket — the classic
  "latest right row at or before the left timestamp" semantics
  (DuckDB `ASOF JOIN` is the oracle).
- **Range join** (`range_join_broadcast`): a small set of [lo, hi) intervals
  is broadcast and each batch emits one row per (row, containing-interval) —
  intervals may overlap; no shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

from .broadcast import get_broadcast


def _hash_bucket(values: np.ndarray, n_buckets: int) -> np.ndarray:
    """Deterministic per-value bucket id (stable across worker processes)."""
    h = pd.util.hash_array(np.asarray(values), categorize=False)
    return (h % np.uint64(n_buckets)).astype(np.int64)


def _key_hash_values(key) -> np.ndarray:
    """Key column → numpy values safe to hash for bucket placement.

    An int64 column containing ANY null converts to float64+NaN via
    to_numpy, and pd.util.hash_array hashes float64 bytes differently than
    int64 — so the same key value would land in DIFFERENT buckets depending
    on whether its batch happens to carry a null elsewhere, silently losing
    matches. Nulls are filled with the type's zero BEFORE conversion (their
    placement is arbitrary anyway: the per-bucket Acero join already gives
    SQL semantics — null never equals null — as long as both sides place
    nulls consistently)."""
    if getattr(key, "null_count", 0):
        if pa.types.is_string(key.type) or pa.types.is_large_string(key.type):
            key = pc.fill_null(key, "")
        else:
            key = pc.fill_null(key, pa.scalar(0).cast(key.type))
    return key.to_numpy(zero_copy_only=False)


_RESERVED = ("__bucket", "__side", "__salt", "__ts", "__part")


def _check_reserved(names, where: str) -> None:
    """Reject inputs that already carry an engine-reserved tag column —
    the padded union would silently clobber it (same guard idiom as
    ``partitioned_map_groups``)."""
    bad = sorted(set(names) & set(_RESERVED))
    if bad:
        raise ValueError(
            f"{where}: input carries reserved column(s) {bad}; rename them "
            "— these names tag the join's internal bucketed union"
        )


def detect_hot_keys(ds, key_col: str, frac_threshold: float = 0.05, top_n: int = 64):
    """Find keys whose row share exceeds ``frac_threshold`` — the skew
    pre-pass for :func:`shuffle_equi_join`'s salting.

    Distributed: per-batch ``value_counts`` partials (top ``top_n`` only, so
    the driver sees ≤ top_n × n_batches rows), driver merge, threshold.
    Costs one extra pass over ``ds``; run it on the column-pruned dataset.

    Approximation caveat: a key must land in some batch's per-batch top
    ``top_n`` to be counted at all. Any key above ``frac_threshold``
    globally is orders of magnitude above a typical batch's 64th-most-common
    key, so misses require adversarial key distributions; raise ``top_n``
    if thresholds below ~1% are needed.

    Shares :func:`~.grouping.hot_key_counts` with the cell-salt pre-passes.
    NULL keys are never reported: np.unique's Python compares would raise on
    None-bearing object arrays (and one null would launder an int64 column
    to float64), and the salting this feeds applies to VALUE equality —
    null-heavy columns are better pre-filtered than salted.
    """
    from .grouping import hot_key_counts

    sch = ds.schema()
    key_type = getattr(sch, "base_schema", sch).field(key_col).type
    total_rows, agg = hot_key_counts(
        ds,
        [key_col],
        lambda b: b.column(key_col).drop_null().to_numpy(zero_copy_only=False),
        top_n=top_n,
        key_type=key_type,
    )
    hot = agg[agg >= frac_threshold * max(total_rows, 1)]
    return hot.index.tolist()


def broadcast_join(ds, right: pa.Table, keys, right_keys=None, join_type: str = "inner"):
    """Join every batch against a broadcast small-side table (no shuffle).

    ``right`` is shipped to the object store once; each map task fetches it
    once per worker (per-worker cache) and runs an Acero hash join per batch.

    Only LEFT-oriented join types are valid: the right side joins every
    batch independently, so any type that emits the right side's unmatched
    rows ('full outer', 'right outer/semi/anti') would re-emit them once
    PER BATCH (a right row unmatched in batch A but matched in batch B is
    both null-padded and joined). Use :func:`shuffle_equi_join` for those.
    """
    allowed = ("inner", "left outer", "left semi", "left anti")
    if join_type not in allowed:
        raise ValueError(
            f"broadcast_join: join_type={join_type!r} is per-batch wrong for "
            f"a broadcast right side (unmatched right rows would duplicate "
            f"per batch); allowed: {allowed} — use shuffle_equi_join for "
            "right/full joins"
        )
    if isinstance(keys, str):
        keys = [keys]
    if isinstance(right_keys, str):
        right_keys = [right_keys]
    ref = ray.put(right)

    def fn(batch: pa.Table) -> pa.Table:
        r = get_broadcast(ref)
        return batch.join(r, keys=keys, right_keys=right_keys, join_type=join_type)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def _pad_side(side, key_out, own_key, lvals, rvals, ltypes, rtypes, n_buckets):
    """Build the schema-harmonized + bucketed map fn for one join side."""

    def fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        key = batch.column(own_key)
        cols: dict[str, object] = {key_out: key}
        for c in lvals:
            cols[c] = batch.column(c) if side == 0 else pa.nulls(n, ltypes[c])
        for c in rvals:
            cols[c] = batch.column(c) if side == 1 else pa.nulls(n, rtypes[c])
        cols["__bucket"] = pa.array(
            _hash_bucket(_key_hash_values(key), n_buckets), pa.int64()
        )
        cols["__side"] = pa.array(np.full(n, side, dtype=np.int8), pa.int8())
        return pa.table(cols)

    return fn


def _arrow_type(t) -> pa.DataType:
    """Coerce a Dataset.schema() type to a pyarrow DataType.

    Engine-internal streams are all-Arrow (every ``partitioned_map_groups``
    finalizer emits Arrow blocks), so this is normally the identity. A
    pandas-origin INPUT dataset (``ray.data.from_pandas``) can still report
    numpy dtypes; those map through ``pa.from_numpy_dtype``. An ``object``
    dtype is ambiguous (text? lists? decimals?) — null-padding it as string
    would silently mistype any non-text payload, so fail loudly and ask the
    caller to cast at ingest instead.
    """
    if isinstance(t, pa.DataType):
        return t
    try:
        return pa.from_numpy_dtype(np.dtype(t))
    except (TypeError, NotImplementedError, pa.ArrowNotImplementedError):
        raise TypeError(
            f"join input column has ambiguous non-Arrow type {t!r} (pandas "
            "'object' dtype?) — cast the input to explicit Arrow types "
            "before joining (e.g. map_batches(..., batch_format='pyarrow'))"
        ) from None


def _union_bucketed(left, right, left_key, right_key, n_buckets):
    """Harmonize schemas, tag sides, bucket on key hash, union the streams.

    Returns ``(combined_ds, lvals, rvals)`` where the value-column lists are
    every non-key column of each side (must be disjoint across sides).
    """
    ls, rs = left.schema(), right.schema()
    ltypes = {n: _arrow_type(t) for n, t in zip(ls.names, ls.types)}
    rtypes = {n: _arrow_type(t) for n, t in zip(rs.names, rs.types)}
    lvals = [c for c in ls.names if c != left_key]
    rvals = [c for c in rs.names if c != right_key]
    overlap = set(lvals) & set(rvals)
    if overlap:
        raise ValueError(f"column name collision across join sides: {sorted(overlap)}")
    if left_key in rvals or right_key in lvals:
        raise ValueError(
            f"a non-key column matches the other side's key name "
            f"({left_key!r}/{right_key!r}) — rename it before joining"
        )
    mk = _pad_side(0, left_key, left_key, lvals, rvals, ltypes, rtypes, n_buckets)
    mk_r = _pad_side(1, left_key, right_key, lvals, rvals, ltypes, rtypes, n_buckets)
    l2 = left.map_batches(mk, batch_format="pyarrow", zero_copy_batch=True)
    r2 = right.map_batches(mk_r, batch_format="pyarrow", zero_copy_batch=True)
    return l2.union(r2), lvals, rvals


def shuffle_equi_join(
    left,
    right,
    left_key: str,
    right_key: str | None = None,
    join_type: str = "inner",
    n_buckets: int = 64,
    hot_keys=None,
    n_salt: int = 8,
    bloom_prefilter: str | None = None,
    bloom_bits_log2: int = 23,
):
    """Distributed equi-join of two large Datasets via one bucketed shuffle.

    The output key column takes the left side's name; all other columns pass
    through with their exact Arrow types (the per-bucket join is Acero, so
    no pandas dtype laundering happens). Row order is unspecified.
    ``join_type`` accepts Acero's names: inner, left outer, full outer,
    left semi, left anti — outer types are bucket-safe because every key
    (matched or not) lives in exactly one bucket.

    **Skew**: a hot key normally lands in ONE bucket, serializing its work.
    Pass ``hot_keys`` (iterable of key values, found e.g. by a cheap
    pre-count) to salt them: each hot RIGHT row gets a deterministic salt in
    [0, n_salt) and each hot LEFT row is REPLICATED once per salt, so the
    hot key's pairs spread over ``n_salt`` buckets. Supported for
    ``join_type="inner"`` only (semi/anti/outer would double-count under
    replication).

    **Bloom pre-filter**: when most of one side won't match (selective
    dimension filters, sparse key overlap), ``bloom_prefilter="left"``
    builds a Bloom bitmap of the RIGHT side's keys (one streaming pass,
    OR-folded — `sketches.build_bloom_filter`) and drops non-matching LEFT
    rows BEFORE they enter the shuffle (``"right"`` mirrors it). No false
    negatives, so inner/semi results are bit-identical; the ~fpr of leaked
    non-members still fails the real key match inside the bucket. Costs one
    extra pass over the build side; only worth it when the probe side's
    shuffle volume dominates. Not valid for outer/anti types (dropped rows
    would change the result).
    """
    right_key = right_key or left_key
    if bloom_prefilter is not None:
        if join_type not in ("inner", "left semi"):
            raise ValueError(
                "bloom_prefilter supports inner/semi joins only (outer/anti "
                "semantics depend on the rows the filter would drop)"
            )
        if bloom_prefilter not in ("left", "right"):
            raise ValueError("bloom_prefilter must be 'left', 'right', or None")
    _check_reserved(
        list(left.schema().names) + list(right.schema().names), "shuffle_equi_join"
    )
    if bloom_prefilter is not None:
        from .sketches import bloom_semi_filter, build_bloom_filter

        if bloom_prefilter == "left":
            bm = build_bloom_filter(right, right_key, bits_log2=bloom_bits_log2)
            left = bloom_semi_filter(left, left_key, bm)
        else:
            bm = build_bloom_filter(left, left_key, bits_log2=bloom_bits_log2)
            right = bloom_semi_filter(right, right_key, bm)
    if hot_keys is not None:
        if join_type != "inner":
            raise ValueError("hot_keys salting supports join_type='inner' only")
        hot = np.asarray(list(hot_keys))

        def salt_left(batch: pa.Table) -> pa.Table:
            k = batch.column(left_key).to_numpy(zero_copy_only=False)
            is_hot = np.isin(k, hot)
            n = batch.num_rows
            # replicate hot rows n_salt times, cold rows once (salt 0)
            reps = np.where(is_hot, n_salt, 1)
            idx = np.repeat(np.arange(n), reps)
            # within-run counters 0..rep-1, fully vectorized
            starts = np.cumsum(reps) - reps
            salts = (
                np.arange(idx.size, dtype=np.int64) - np.repeat(starts, reps)
                if n
                else np.array([], dtype=np.int64)
            )
            out = batch.take(pa.array(idx))
            return out.append_column("__salt", pa.array(salts, pa.int64()))

        def salt_right(batch: pa.Table) -> pa.Table:
            k = batch.column(right_key).to_numpy(zero_copy_only=False)
            is_hot = np.isin(k, hot)
            h = pd.util.hash_array(np.arange(batch.num_rows) + 1, categorize=False)
            salts = np.where(is_hot, (h % np.uint64(n_salt)).astype(np.int64), 0)
            return batch.append_column("__salt", pa.array(salts, pa.int64()))

        left = left.map_batches(salt_left, batch_format="pyarrow", zero_copy_batch=True)
        right = right.map_batches(salt_right, batch_format="pyarrow", zero_copy_batch=True)
        joined = _salted_inner_join(left, right, left_key, right_key, n_buckets)
        return joined
    combined, lvals, rvals = _union_bucketed(left, right, left_key, right_key, n_buckets)
    # The group table arrives with the exact harmonized Arrow types from
    # `_pad_side` — every finalizer in the engine emits Arrow blocks (see
    # stages/grouping.py), so no pandas block can enter the groupby sort and
    # re-launder null-padded int columns to float64. (The cast guard that
    # used to live here is dead by construction.)

    def join_bucket(t: pa.Table) -> pa.Table:
        side = t.column("__side")
        l = t.filter(pc.equal(side, 0)).select([left_key] + lvals)
        r = t.filter(pc.equal(side, 1)).select([left_key] + rvals)
        out = l.join(r, keys=[left_key], join_type=join_type)
        # Acero may reorder columns for right/outer types; normalize.
        want = [c for c in [left_key] + lvals + rvals if c in out.column_names]
        return out.select(want)

    return combined.groupby("__bucket").map_groups(join_bucket, batch_format="pyarrow")


def _salted_inner_join(left, right, left_key, right_key, n_buckets):
    """Inner join of pre-salted sides: co-partition on (key, __salt), join
    per bucket on BOTH columns, drop the salt column."""
    ls, rs = left.schema(), right.schema()
    ltypes = {n: _arrow_type(t) for n, t in zip(ls.names, ls.types)}
    rtypes = {n: _arrow_type(t) for n, t in zip(rs.names, rs.types)}
    lvals = [c for c in ls.names if c not in (left_key, "__salt")]
    rvals = [c for c in rs.names if c not in (right_key, "__salt")]
    overlap = set(lvals) & set(rvals)
    if overlap:
        raise ValueError(f"column name collision across join sides: {sorted(overlap)}")
    if left_key in rvals or right_key in lvals:
        raise ValueError(
            f"a non-key column matches the other side's key name "
            f"({left_key!r}/{right_key!r}) — rename it before joining"
        )

    def pad(side):
        own_key = left_key if side == 0 else right_key

        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            key = batch.column(own_key)
            salt = batch.column("__salt").to_numpy(zero_copy_only=False)
            cols: dict[str, object] = {left_key: key, "__salt": batch.column("__salt")}
            for c in lvals:
                cols[c] = batch.column(c) if side == 0 else pa.nulls(n, ltypes[c])
            for c in rvals:
                cols[c] = batch.column(c) if side == 1 else pa.nulls(n, rtypes[c])
            base = pd.util.hash_array(np.asarray(_key_hash_values(key)), categorize=False)
            cols["__bucket"] = pa.array(
                ((base + np.uint64(0x9E3779B9) * salt.astype(np.uint64)) % np.uint64(n_buckets)).astype(np.int64),
                pa.int64(),
            )
            cols["__side"] = pa.array(np.full(n, side, dtype=np.int8), pa.int8())
            return pa.table(cols)

        return fn

    combined = left.map_batches(pad(0), batch_format="pyarrow", zero_copy_batch=True).union(
        right.map_batches(pad(1), batch_format="pyarrow", zero_copy_batch=True)
    )

    def join_bucket(t: pa.Table) -> pa.Table:
        side = t.column("__side")
        l = t.filter(pc.equal(side, 0)).select([left_key, "__salt"] + lvals)
        r = t.filter(pc.equal(side, 1)).select([left_key, "__salt"] + rvals)
        out = l.join(r, keys=[left_key, "__salt"], join_type="inner")
        want = [c for c in [left_key] + lvals + rvals if c in out.column_names]
        return out.select(want)

    return combined.groupby("__bucket").map_groups(join_bucket, batch_format="pyarrow")


def asof_join(
    left,
    right,
    key: str,
    ts: str,
    right_ts_key: str | None = None,
    direction: str = "backward",
    n_buckets: int = 32,
):
    """As-of join: for each left row, the single right row with the greatest
    ``ts`` satisfying ``right.ts <= left.ts`` (direction="backward") for the
    same ``key``. Inner semantics (unmatched left rows dropped) — the DuckDB
    ``ASOF JOIN`` equivalent. Right-side timestamp column may be renamed via
    ``right_ts_key`` if the two sides share the name ``ts`` plus other
    colliding columns (they must otherwise be disjoint).

    Determinism caveat: when the RIGHT side has duplicate ``(key, ts)``
    rows, which duplicate wins follows the within-bucket sort order and may
    vary with partitioning (DuckDB's ASOF has the same unspecified-tie
    behavior). Ensure right-side timestamps are unique per key (e.g. add a
    microsecond jitter or pre-dedup) when exact reproducibility matters.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    right_ts = right_ts_key or ts
    _check_reserved(list(left.schema().names) + list(right.schema().names), "asof_join")
    ls, rs = left.schema(), right.schema()
    ltypes = {n: _arrow_type(t) for n, t in zip(ls.names, ls.types)}
    rtypes = {n: _arrow_type(t) for n, t in zip(rs.names, rs.types)}
    lvals = [c for c in ls.names if c not in (key, ts)]
    rvals = [c for c in rs.names if c not in (key, right_ts)]
    overlap = set(lvals) & set(rvals)
    if overlap:
        raise ValueError(f"column name collision across join sides: {sorted(overlap)}")
    if ts in rvals or right_ts in lvals:
        raise ValueError(
            f"a non-timestamp column matches the other side's timestamp name "
            f"({ts!r}/{right_ts!r}) — rename it before joining"
        )

    def pad(side):
        own_ts = ts if side == 0 else right_ts

        def fn(batch: pa.Table) -> pa.Table:
            # SQL ASOF semantics: a NULL key or NULL timestamp never matches
            # (inner → the row is dropped). Filtering here also keeps the
            # within-bucket np.unique key-coding honest — NaN-laundered
            # nulls would collapse to ONE key code and as-of match each
            # other
            batch = batch.filter(
                pc.and_(
                    pc.is_valid(batch.column(key)),
                    pc.is_valid(batch.column(own_ts)),
                )
            )
            n = batch.num_rows
            cols: dict[str, object] = {
                key: batch.column(key),
                "__ts": batch.column(own_ts),
            }
            for c in lvals:
                cols[c] = batch.column(c) if side == 0 else pa.nulls(n, ltypes[c])
            for c in rvals:
                cols[c] = batch.column(c) if side == 1 else pa.nulls(n, rtypes[c])
            cols["__bucket"] = pa.array(
                _hash_bucket(_key_hash_values(batch.column(key)), n_buckets),
                pa.int64(),
            )
            cols["__side"] = pa.array(np.full(n, side, dtype=np.int8), pa.int8())
            return pa.table(cols)

        return fn

    l2 = left.map_batches(pad(0), batch_format="pyarrow", zero_copy_batch=True)
    r2 = right.map_batches(pad(1), batch_format="pyarrow", zero_copy_batch=True)
    combined = l2.union(r2)

    out_schema = pa.schema(
        [pa.field(key, ltypes.get(key) or rtypes[key]), pa.field("__ts", ltypes.get(ts) or rtypes[right_ts])]
        + [pa.field(c, ltypes[c]) for c in lvals]
        + [pa.field(c, rtypes[c]) for c in rvals]
    )

    def join_bucket(t: pa.Table) -> pa.Table:
        # fully vectorized as-of via one lexsort + a running max: sort the
        # UNION of both sides by (key, ts) with right rows before left at
        # equal ts (allow_exact_matches). Each right row at sorted position
        # i carries marker key_code·(n+1) + (i+1); left rows carry
        # key_code·(n+1). After np.maximum.accumulate, a left row's value
        # decodes to the LATEST right row at-or-before it — and because a
        # later key's base exceeds any earlier key's marker, a cross-key
        # leak is detectable by the decoded key_code mismatching (→ no
        # match, inner semantics drop the row).
        n = t.num_rows
        if n == 0:
            return out_schema.empty_table()
        side = t.column("__side").to_numpy(zero_copy_only=False)
        keys_np = t.column(key).to_numpy(zero_copy_only=False)
        tsv = t.column("__ts").to_numpy(zero_copy_only=False)
        if tsv.dtype.kind in "Mm":
            tsv = tsv.view("i8")
        if direction == "forward":
            # asof-forward ≡ asof-backward on the negated time axis
            tsv = -tsv.astype(np.int64) if tsv.dtype.kind in "iu" else -tsv
        _, key_code = np.unique(keys_np, return_inverse=True)
        is_right = side == 1
        # stable sort: (key, ts, right-before-left)
        order = np.lexsort((np.where(is_right, 0, 1), tsv, key_code))
        kc_s = key_code[order].astype(np.int64)
        right_s = is_right[order]
        base = kc_s * np.int64(n + 1)
        marker = base + np.where(right_s, np.arange(1, n + 1, dtype=np.int64), 0)
        acc = np.maximum.accumulate(marker)
        left_pos = np.flatnonzero(~right_s)
        acc_l = acc[left_pos]
        matched = (acc_l // np.int64(n + 1) == kc_s[left_pos]) & (acc_l % np.int64(n + 1) > 0)
        left_pos = left_pos[matched]
        # sorted position i carried marker value i+1 → the matched right
        # row's ORIGINAL index is order[marker-base-1]
        right_orig = order[(acc[left_pos] % np.int64(n + 1)).astype(np.int64) - 1]
        left_orig = order[left_pos]
        lt = t.select([key, "__ts"] + lvals).take(pa.array(left_orig, pa.int64()))
        rt = t.select(rvals).take(pa.array(right_orig, pa.int64()))
        out = pa.table(
            {**{c: lt.column(c) for c in [key, "__ts"] + lvals},
             **{c: rt.column(c) for c in rvals}}
        )
        return out if out.schema.equals(out_schema) else out.cast(out_schema)

    joined = combined.groupby("__bucket").map_groups(join_bucket, batch_format="pyarrow")

    def restore_ts(batch: pa.Table) -> pa.Table:
        names = [ts if c == "__ts" else c for c in batch.column_names]
        return batch.rename_columns(names)

    return joined.map_batches(restore_ts, batch_format="pyarrow", zero_copy_batch=True)


def range_join_broadcast(
    ds,
    ranges: pa.Table,
    value_col: str,
    range_id_col: str = "range_id",
    lo_col: str = "lo",
    hi_col: str = "hi",
):
    """Interval-containment join against a broadcast set of [lo, hi) ranges.

    Ranges may overlap (a row can match several); each batch emits the input
    columns plus ``range_id`` once per containing interval. The small side is
    broadcast — no shuffle, streaming-friendly at any left-side size.
    """
    ref = ray.put(
        {
            "id": ranges.column(range_id_col).to_numpy(zero_copy_only=False),
            "lo": ranges.column(lo_col).to_numpy(zero_copy_only=False),
            "hi": ranges.column(hi_col).to_numpy(zero_copy_only=False),
        }
    )

    def fn(batch: pa.Table) -> pa.Table:
        r = get_broadcast(ref)
        v = batch.column(value_col).to_numpy(zero_copy_only=False)
        idx_parts, rid_parts = [], []
        for rid, lo, hi in zip(r["id"], r["lo"], r["hi"]):
            hit = np.nonzero((v >= lo) & (v < hi))[0]
            if hit.size:
                idx_parts.append(hit)
                rid_parts.append(np.full(hit.size, rid, dtype=np.int64))
        if not idx_parts:
            empty = batch.slice(0, 0)
            return empty.append_column(range_id_col, pa.array([], pa.int64()))
        idx = np.concatenate(idx_parts)
        out = batch.take(pa.array(idx))
        return out.append_column(
            range_id_col, pa.array(np.concatenate(rid_parts), pa.int64())
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
