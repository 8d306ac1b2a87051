"""Mergeable sketches: HyperLogLog distinct counting (+ a hash-sampled
quantile helper).

The exact operators (``distinct``, ``grouped_quantile``) shuffle or
co-locate every value; at 100 TB a COUNT(DISTINCT) over an unbounded domain
should not. HLL is the standard answer: each batch folds its values into a
2^p-register array (one small binary row out per batch — the combiner), and
registers merge by elementwise max — associative and idempotent, so block
order, retries, and partial replays cannot change the result. The driver
merge holds exactly one 2^p-byte array no matter the input size.

Standard-error ≈ 1.04/sqrt(2^p): p=14 → ~0.8%. Hashing is
``pandas.util.hash_array`` (deterministic across processes — never
Python's salted ``hash``).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import pandas as pd
import pyarrow as pa


def _hll_registers(values: np.ndarray, p: int) -> np.ndarray:
    """Fold a value array into a fresh 2^p uint8 register array."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if values.size == 0:
        return regs
    h = pd.util.hash_array(np.asarray(values), categorize=False)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h & np.uint64((1 << (64 - p)) - 1)
    # rank = leading zeros of w within (64-p) bits, + 1. frexp gives the
    # exact bit length for w < 2^53 (p >= 11 keeps 64-p <= 53).
    bl = np.frexp(w.astype(np.float64))[1]  # bit_length; 0 for w == 0
    rank = np.where(w == 0, 64 - p + 1, 64 - p - bl + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimator with the small-range (linear counting) fix."""
    return float(hll_estimate_many(regs[None, :])[0])


def hll_estimate_many(regs_mat: np.ndarray) -> np.ndarray:
    """Row-wise HLL estimates for a (K, 2^p) register matrix — row-chunked
    so the float64 power temporary stays cache-resident (~256k elements)."""
    k, m = regs_mat.shape
    alpha = 0.7213 / (1.0 + 1.079 / m)
    out = np.empty(k, dtype=np.float64)
    step = max(1, 256_000 // m)
    for lo in range(0, k, step):
        sub = regs_mat[lo : lo + step]
        e = alpha * m * m / np.power(2.0, -sub.astype(np.float64)).sum(axis=1)
        zeros = np.count_nonzero(sub == 0, axis=1)
        linear = m * np.log(m / np.maximum(zeros, 1))
        out[lo : lo + step] = np.where((e <= 2.5 * m) & (zeros > 0), linear, e)
    return out


def approx_distinct_count(ds, col: str, p: int = 14) -> float:
    """Approximate COUNT(DISTINCT col) in one streaming pass, no shuffle.

    Per-batch combiner emits one 2^p-byte register row; the driver folds the
    partial stream with elementwise max — peak driver memory is ONE register
    array regardless of input size (p=14 → 16 KiB, ~0.8% standard error).
    """
    if not 11 <= p <= 18:
        raise ValueError("p must be in [11, 18]")

    def partial(batch: pa.Table) -> pa.Table:
        # drop_null BEFORE to_numpy: SQL COUNT(DISTINCT) ignores NULLs, and
        # (worse) one null would launder the whole batch's int64 values to
        # float64 whose bit patterns hash differently from the null-free
        # batches' — the same value would then count twice
        v = batch.column(col).drop_null().to_numpy(zero_copy_only=False)
        regs = _hll_registers(v, p)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    merged = np.zeros(1 << p, dtype=np.uint8)
    # batch_size=None: one register row per BLOCK, not per default 1024-row
    # batch (build_bloom_filter documents the same choice)
    partials = ds.select_columns([col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    for b in partials.iter_batches(batch_size=None, batch_format="pyarrow"):
        for buf in b.column("regs").to_pylist():
            np.maximum(merged, np.frombuffer(buf, dtype=np.uint8), out=merged)
    return hll_estimate(merged)


def approx_distinct_per_key(ds, key_col: str, col: str, p: int = 12):
    """Per-key approximate distinct counts → Dataset (key, approx_distinct).

    Per-block combiner (``batch_size=None``): one register row per
    (key × block) — the shuffle moves 2^p bytes per key-block instead of
    every raw value, which is the win when per-key value cardinality is
    huge. The merge groups on a hash partition of the key
    (stages/grouping.py) and max-folds each key's registers vectorized.

    NULL values are ignored (SQL COUNT(DISTINCT) semantics) — a key whose
    values are ALL null therefore emits no row; NULL KEYS form one SQL-style
    group.
    """
    if not 11 <= p <= 16:
        raise ValueError("p must be in [11, 16]")
    from .grouping import key_spans, partitioned_map_groups

    def partial(batch: pa.Table) -> pa.Table:
        key_type = batch.schema.field(key_col).type
        # null values out first: SQL semantics, AND one null would launder
        # the batch's int64 values to float64 whose bit patterns hash
        # differently from null-free batches' (double counting)
        batch = batch.filter(batch.column(col).is_valid())
        if batch.num_rows == 0:
            # typed empty — an untyped pa.array([]) infers null and makes
            # the block schema unstable across the stream
            return pa.table(
                {key_col: pa.array([], key_type), "regs": pa.array([], pa.binary())}
            )
        # Arrow sort (null keys adjacent, no object-array Python compares)
        # + span sweep, not an O(keys × rows) mask per key
        b = batch.sort_by([(key_col, "ascending")])
        keys = b.column(key_col).to_numpy(zero_copy_only=False)
        vals = b.column(col).to_numpy(zero_copy_only=False)
        starts, ends = key_spans(keys)
        bufs = [_hll_registers(vals[s:e], p).tobytes() for s, e in zip(starts, ends)]
        return pa.table(
            {
                # take() from the sorted column: exact input type and null
                # keys survive (the numpy detour yields NaN, untypable)
                key_col: b.column(key_col).combine_chunks().take(pa.array(starts)),
                "regs": pa.array(bufs, pa.binary()),
            }
        )

    partials = ds.select_columns([key_col, col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )

    def merge_part(t: pa.Table) -> pa.Table:
        # stack every register row into one (rows, 2^p) matrix and max-fold
        # each key's span with a single reduceat — no per-key Python merge
        if t.num_rows == 0:
            return pa.table(
                {
                    key_col: pa.array([], t.schema.field(key_col).type),
                    "approx_distinct": pa.array([], pa.float64()),
                }
            )
        t = t.sort_by([(key_col, "ascending")])
        keys = t.column(key_col).to_numpy(zero_copy_only=False)
        mat = np.frombuffer(b"".join(t.column("regs").to_pylist()), dtype=np.uint8).reshape(
            t.num_rows, -1
        )
        starts, _ = key_spans(keys)
        merged = np.maximum.reduceat(mat, starts, axis=0)
        return pa.table(
            {
                key_col: t.column(key_col).combine_chunks().take(pa.array(starts)),
                "approx_distinct": pa.array(hll_estimate_many(merged), pa.float64()),
            }
        )

    return partitioned_map_groups(partials, key_col, merge_part, part_format="pyarrow")


def grouped_quantile_sketch(
    ds,
    key_col: str,
    value_col: str,
    q: float,
    b: int = 256,
    out_col: str = "quantile_value",
):
    """Per-key approximate quantile from a FIXED-SIZE mergeable summary —
    the scale path that :func:`~.relational.grouped_quantile` /
    ``grouped_median`` docstrings promise for unbounded per-key cardinality.

    Per-batch combiner: each (key × batch) with n ≤ ``b`` values ships them
    raw (weight 1); larger groups ship the ``b`` midpoint order statistics
    of the sorted batch values, idx_i = floor((i+0.5)·n/b), each weighted
    n/b — one row of ≤ 16·b bytes per (key × batch) crosses the shuffle,
    never the raw values. The final merge (hash-partitioned, bounded group
    count) takes the weighted lower quantile of each key's summary points.

    Error bound (one merge level, which is exactly this topology): each
    compressed batch contributes ≤ n_batch/(2b) rank error, so the returned
    value's true rank r satisfies |r − q·N| ≤ N/(2b) + 1 for every key —
    b=256 → ≤ ~0.2 % rank error. Results depend on batch boundaries (like
    any mergeable quantile summary) but the bound does not; it is asserted
    against the exact oracle in tests and tracked in scripts/recall_bench.py.
    """
    if b < 2:
        raise ValueError("b must be >= 2")
    from .grouping import key_spans, partitioned_map_groups

    def partial(batch: pa.Table) -> pa.Table:
        key_type = batch.schema.field(key_col).type
        # null values out first (SQL quantile/percentile ignores NULLs; a
        # laundered NaN would also poison the sorted summary); null KEYS
        # stay — one SQL-style group
        batch = batch.filter(batch.column(value_col).is_valid())
        if batch.num_rows == 0:
            return pa.table(
                {
                    key_col: pa.array([], key_type),
                    "vals": pa.array([], pa.binary()),
                    "wts": pa.array([], pa.binary()),
                }
            )
        # Arrow sort handles null keys (adjacent, no object-array Python
        # compares the numpy lexsort would choke on)
        sb = batch.sort_by([(key_col, "ascending"), (value_col, "ascending")])
        keys = sb.column(key_col).to_numpy(zero_copy_only=False)
        vals = sb.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        starts_all, ends_all = key_spans(keys)
        vbufs, wbufs = [], []
        for s, e in zip(starts_all, ends_all):
            n = e - s
            v = vals[s:e]  # already sorted within the key span
            if n <= b:
                w = np.ones(n, dtype=np.float64)
            else:
                idx = ((np.arange(b, dtype=np.float64) + 0.5) * n / b).astype(np.int64)
                v = v[idx]
                w = np.full(b, n / b, dtype=np.float64)
            vbufs.append(v.tobytes())
            wbufs.append(w.tobytes())
        return pa.table(
            {
                key_col: sb.column(key_col).combine_chunks().take(pa.array(starts_all)),
                "vals": pa.array(vbufs, pa.binary()),
                "wts": pa.array(wbufs, pa.binary()),
            }
        )

    partials = ds.select_columns([key_col, value_col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )

    def merge_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    key_col: pa.array([], t.schema.field(key_col).type),
                    out_col: pa.array([], pa.float64()),
                }
            )
        t = t.sort_by([(key_col, "ascending")])
        keys = t.column(key_col).to_numpy(zero_copy_only=False)
        starts, ends = key_spans(keys)
        vbufs = t.column("vals").to_pylist()
        wbufs = t.column("wts").to_pylist()
        out_v = []
        for s, e in zip(starts, ends):
            v = np.frombuffer(b"".join(vbufs[s:e]), dtype=np.float64)
            w = np.frombuffer(b"".join(wbufs[s:e]), dtype=np.float64)
            o = np.argsort(v, kind="mergesort")
            cw = np.cumsum(w[o])
            # weighted lower quantile: first point whose cumulative weight
            # reaches q·W (W = true row count, since weights sum to n_batch)
            target = q * cw[-1]
            i = min(int(np.searchsorted(cw, target, side="left")), cw.size - 1)
            out_v.append(v[o][i])
        return pa.table(
            {
                key_col: t.column(key_col).combine_chunks().take(pa.array(starts)),
                out_col: pa.array(out_v, pa.float64()),
            }
        )

    return partitioned_map_groups(partials, key_col, merge_part, part_format="pyarrow")


def _bloom_hash_pair(values: np.ndarray):
    """Kirsch-Mitzenmacher double-hashing base pair (a, b) per value: the
    i-th probe is ``(a + i·b) mod m``. Both derive from one deterministic
    64-bit hash (``pandas.util.hash_array`` — stable across processes);
    ``b`` is forced odd so the probe sequence never degenerates."""
    h = pd.util.hash_array(np.asarray(values), categorize=False)
    a = (h >> np.uint64(32)).astype(np.uint64)
    b = ((h & np.uint64(0xFFFFFFFF)) | np.uint64(1)).astype(np.uint64)
    return a, b


class BloomFilter(NamedTuple):
    """A Bloom bitmap paired with the ``n_hashes`` it was built with.

    The pairing is load-bearing: probing with MORE hashes than the build
    used produces false negatives (true members silently dropped), which
    would turn the join pre-filter from exact into lossy. Carrying the
    header with the bitmap makes the mismatch impossible to construct
    silently."""

    bits: np.ndarray
    n_hashes: int


def build_bloom_filter(ds, col: str, bits_log2: int = 23, n_hashes: int = 4) -> "BloomFilter":
    """Fold a column into a 2^bits_log2-bit Bloom bitmap → :class:`BloomFilter`.

    Same topology as :func:`approx_distinct_count`: per-BLOCK combiner emits
    one bitmap row (``batch_size=None`` so the partial count is the block
    count, not row-count/1024), the driver OR-folds the stream — peak driver
    memory is ONE bitmap (2^20 bytes at the default p=23) at any input size,
    and OR is associative/idempotent so retries and block order can't change
    the result.

    False-positive rate ≈ (1 − e^(−kn/m))^k: p=23, k=4 → under 1% up to
    ~1M distinct keys; size bits_log2 ~ log2(20·n_distinct) for ~1%.
    """
    if not 16 <= bits_log2 <= 30:
        raise ValueError("bits_log2 must be in [16, 30]")
    m = 1 << bits_log2
    n_bytes = m >> 3

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy(zero_copy_only=False)
        bm = np.zeros(n_bytes, dtype=np.uint8)
        if v.size:
            a, b = _bloom_hash_pair(v)
            for i in range(n_hashes):
                idx = ((a + np.uint64(i) * b) % np.uint64(m)).astype(np.int64)
                np.bitwise_or.at(
                    bm, idx >> 3, np.left_shift(1, idx & 7).astype(np.uint8)
                )
        return pa.table({"bm": pa.array([bm.tobytes()], pa.binary())})

    merged = np.zeros(n_bytes, dtype=np.uint8)
    partials = ds.select_columns([col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    for bt in partials.iter_batches(batch_size=None, batch_format="pyarrow"):
        for buf in bt.column("bm").to_pylist():
            np.bitwise_or(merged, np.frombuffer(buf, dtype=np.uint8), out=merged)
    return BloomFilter(merged, n_hashes)


def bloom_semi_filter(ds, col: str, bloom, n_hashes: int | None = None):
    """Keep only rows whose ``col`` value MAY be in the Bloom set (no false
    negatives — every true member survives; ~fpr of non-members leak).

    ``bloom`` is a :class:`BloomFilter` (preferred — its ``n_hashes`` header
    is authoritative and an explicit mismatching ``n_hashes`` raises) or a
    bare uint8 bitmap (``n_hashes`` then defaults to the builder's 4).

    The bitmap is ``ray.put`` once and probed per batch with k vectorized
    gather+mask passes. This is the shuffle-avoidance pre-filter for joins:
    prune the big side down to ~matching rows BEFORE the all-to-all exchange
    (`joins.shuffle_equi_join(bloom_prefilter=...)`); the join itself stays
    exact because surviving non-members fail the real key match.
    """
    if isinstance(bloom, BloomFilter):
        if n_hashes is not None and n_hashes != bloom.n_hashes:
            raise ValueError(
                f"bloom_semi_filter: n_hashes={n_hashes} does not match the "
                f"filter's build-time n_hashes={bloom.n_hashes} — probing "
                "with a different hash count loses the no-false-negative "
                "guarantee"
            )
        bitmap, n_hashes = bloom.bits, bloom.n_hashes
    else:
        bitmap = bloom
        n_hashes = 4 if n_hashes is None else n_hashes
    m = int(bitmap.size) << 3
    bits_log2 = m.bit_length() - 1
    if (1 << bits_log2) != m:
        raise ValueError("bitmap size must be a power of two")
    import ray

    ref = ray.put(bitmap)

    def fn(batch: pa.Table) -> pa.Table:
        from .broadcast import get_broadcast

        v = batch.column(col).to_numpy(zero_copy_only=False)
        if v.size == 0:
            return batch
        bm = get_broadcast(ref)
        a, b = _bloom_hash_pair(v)
        keep = np.ones(v.size, dtype=bool)
        for i in range(n_hashes):
            idx = ((a + np.uint64(i) * b) % np.uint64(m)).astype(np.int64)
            # the & 1 is load-bearing: without it any HIGHER bit set in the
            # probed byte passes the test, silently destroying selectivity
            # (no false negatives either way, so joins stayed correct)
            keep &= ((bm[idx >> 3] >> (idx & 7).astype(np.uint8)) & 1).astype(bool)
        return batch.filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def heavy_hitters(ds, col: str, threshold_frac: float, k: int | None = None) -> pa.Table:
    """EXACT heavy hitters — every key with count ≥ threshold_frac·N, with
    its exact count — in two streaming passes and O(k) driver memory, never
    a full-key-domain shuffle.

    Pass 1 (candidates): per-batch ``np.unique`` partials, pruned to the
    ``k`` largest counts by subtracting the (k+1)-th count (the subtraction
    is emitted as ``__err`` so nothing is silently lost); the driver folds
    the summary stream the same way, accumulating every subtraction. This is
    a Misra-Gries summary under the mergeable-summaries result (Agarwal et
    al., PODS'12): for every key, summary_count ≥ true_count − err_total, so
    ``summary_count + err_total ≥ threshold`` selects a SUPERSET of the true
    heavy hitters. ``k`` defaults to ceil(4/threshold_frac), which keeps
    err_total ≤ N/(k+1) < threshold/4 — the guard below raises if a
    pathological stream ever voids the guarantee instead of returning a
    silently incomplete answer.
    Pass 2 (verify): the ≤O(k) candidate set is broadcast and counted
    EXACTLY per batch (np.isin mask + unique), driver-summed, thresholded.
    NULL values form one group (SQL GROUP BY keeps it) counted exactly
    through a scalar channel in pass 1 — it never enters the Misra-Gries
    summary, so no error applies to it. Output is bit-identical to SQL
    ``GROUP BY col HAVING COUNT(*) >= threshold_frac * N``.
    """
    if not 0.0 < threshold_frac <= 1.0:
        raise ValueError("threshold_frac must be in (0, 1]")
    if k is None:
        k = int(np.ceil(4.0 / threshold_frac))
    sel = ds.select_columns([col])

    def partial(batch: pa.Table) -> pa.Table:
        arr = batch.column(col)
        key_type = batch.schema.field(col).type
        n_null = arr.null_count
        # non-null values only: np.unique's Python compares raise on
        # None-vs-str object arrays, and a null int64 column would launder
        # every key to float64. The NULL group is counted EXACTLY through
        # its own scalar channel (no Misra-Gries error ever applies to it).
        v = arr.drop_null().to_numpy(zero_copy_only=False)
        keys, counts = np.unique(v, return_counts=True)
        counts = counts.astype(np.int64)
        err = 0
        if keys.size > k:
            kth = np.partition(counts, counts.size - k - 1)[counts.size - k - 1]
            err = int(kth)
            keep = counts > kth
            keys, counts = keys[keep], counts[keep] - kth
        key_arr = pa.array(keys, key_type)
        if keys.size == 0:
            # every key pruned (uniform batch) or all-null batch — emit one
            # zero-count NULL-key carrier row so the scalar channels still
            # reach the driver (the driver drops null-key summary rows)
            key_arr = pa.array([None], key_type)
            counts = np.zeros(1, dtype=np.int64)
        tot = np.zeros(len(key_arr), dtype=np.int64)
        errs = np.zeros(len(key_arr), dtype=np.int64)
        nulls = np.zeros(len(key_arr), dtype=np.int64)
        # one scalar per partial; sums stay exact. __tot counts ALL rows
        # (SQL COUNT(*) defines N), __nnull the NULL group's exact count.
        tot[0], errs[0], nulls[0] = v.size + n_null, err, n_null
        return pa.table(
            {
                col: key_arr,
                "__n": counts,
                "__tot": tot,
                "__err": errs,
                "__nnull": nulls,
            }
        )

    partials = sel.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    summary = pd.Series(dtype=np.int64)
    total = 0
    err_total = 0
    null_total = 0
    for bt in partials.iter_batches(batch_size=None, batch_format="pyarrow"):
        df = bt.to_pandas()
        if df.empty:
            continue
        total += int(df["__tot"].sum())
        err_total += int(df["__err"].sum())
        null_total += int(df["__nnull"].sum())
        # null-key rows are carriers for the scalars above, never summary
        # candidates — the NULL group is tracked exactly via __nnull
        df = df.dropna(subset=[col])
        if not df.empty:
            summary = (
                pd.concat([summary, df.set_index(col)["__n"]]).groupby(level=0).sum()
            )
        if len(summary) > k:
            vals = summary.to_numpy()
            kth = int(np.partition(vals, vals.size - k - 1)[vals.size - k - 1])
            err_total += kth
            summary = summary[summary > kth] - kth

    thresh = threshold_frac * total
    sch = ds.schema()  # ray.data.Schema wraps the Arrow schema
    key_type = getattr(sch, "base_schema", sch).field(col).type
    if err_total >= thresh and total > 0:
        raise ValueError(
            f"heavy_hitters: accumulated summary error {err_total} reaches the "
            f"threshold {thresh}; raise k (got {k}) for this distribution"
        )
    null_hh = (
        pa.table({col: pa.array([None], key_type), "cnt": pa.array([null_total], pa.int64())})
        if total > 0 and null_total >= thresh
        else None
    )
    cand = summary.index[summary.to_numpy() + err_total >= thresh].to_numpy()
    if cand.size == 0:
        empty = pa.table({col: pa.array([], key_type), "cnt": pa.array([], pa.int64())})
        return pa.concat_tables([empty, null_hh]) if null_hh is not None else empty

    import ray

    cand_ref = ray.put(cand)

    def count_cand(batch: pa.Table) -> pa.Table:
        from .broadcast import get_broadcast

        key_t = batch.schema.field(col).type
        # non-null only, matching pass 1 (and np.isin never matches NaN)
        v = batch.column(col).drop_null().to_numpy(zero_copy_only=False)
        c = get_broadcast(cand_ref)
        hit = v[np.isin(v, c)]
        keys, counts = np.unique(hit, return_counts=True)
        return pa.table({col: pa.array(keys, key_t), "cnt": counts.astype(np.int64)})

    acc = pd.Series(dtype=np.int64)
    for bt in sel.map_batches(
        count_cand, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).iter_batches(batch_size=None, batch_format="pyarrow"):
        df = bt.to_pandas()
        if not df.empty:
            acc = pd.concat([acc, df.set_index(col)["cnt"]]).groupby(level=0).sum()
    acc = acc[acc >= thresh].sort_index()
    out = pa.table(
        {col: pa.array(acc.index.to_numpy(), key_type), "cnt": acc.to_numpy().astype(np.int64)}
    )
    return pa.concat_tables([out, null_hh]) if null_hh is not None else out


def approx_quantile(ds, value_col: str, q: float, pct: int = 10, id_col: str = "event_id"):
    """Approximate global quantile from a deterministic hash sample.

    Composes :func:`~.text.sample_fraction` (id-hash sampling — rerunnable,
    partition-independent) with an exact quantile over the ~pct% sample
    streamed to the driver. Error scales with 1/sqrt(sample size); for
    tighter bounds raise ``pct``.
    """
    from .text import sample_fraction

    vals = []
    sample = sample_fraction(ds.select_columns([id_col, value_col]), pct, id_col=id_col)
    for b in sample.iter_batches(batch_size=None, batch_format="pyarrow"):
        vals.append(b.column(value_col).to_numpy(zero_copy_only=False))
    if not vals:
        return float("nan")
    allv = np.concatenate(vals)
    return float(np.quantile(allv, q)) if allv.size else float("nan")
