"""Global ordered prefix-sum and concat-and-chunk sequence packing.

The training-data op this serves: GPT-style sequence packing concatenates
every document's tokens in a canonical order (doc id) and slices the stream
into fixed-length windows of ``seq_len`` tokens. The assignment each trainer
needs per document — its global token offset and the first/last pack it
lands in — is a pure function of an ORDERED prefix sum over token counts,
which SQL writes as ``SUM(n) OVER (ORDER BY id ROWS BETWEEN UNBOUNDED
PRECEDING AND 1 PRECEDING)`` but a distributed engine cannot compute with
a window that orders the whole corpus.

The scalable shape is the classic two-level scan:

1. a cheap min/max pass over the order column defines ``n_parts`` ORDERED
   ranges (uniform in id space — right for dense row-number-style ids; for
   pathologically sparse/skewed id spaces substitute a sample-quantile
   boundary pass, cf. ``stages/sketches.py``),
2. one streaming pass emits per-(batch × range) partial sums — the driver
   folds ``n_parts`` scalars into exclusive base offsets (O(n_parts) driver
   memory, never O(rows)),
3. one bounded ``groupby(range)`` pass sorts each range locally and adds
   ``base + local exclusive cumsum``.

Two narrow exchanges total; the shuffle currency is (order, value) pairs,
never payloads. The group count is exactly ``n_parts`` — Ray's per-group
cost is paid 64 times, not once per key (see ``stages/grouping.py``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def ordered_prefix_sum(
    ds,
    order_col: str,
    value_col: str,
    out_col: str = "cum_before",
    n_parts: int = 64,
):
    """PROJECT to (``order_col``, ``value_col``) and append the EXCLUSIVE
    running sum of ``value_col`` in ``order_col``
    order (SQL: ``SUM(v) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING
    AND 1 PRECEDING)``, with 0 for the first row).

    ``order_col`` values must be unique (they are ids); a duplicate makes
    "the sum of everything before me" ill-defined and raises in the range
    pass. Values must be int64-exact (token counts, byte sizes).
    """
    # the narrow (order, value) projection feeds THREE passes (min/max,
    # range partials, the scan itself); materializing it once — 16 B/row in
    # the object store, spillable — beats re-running the upstream pipeline
    # (e.g. tokenization) three times. Payload columns are already gone.
    narrow = ds.select_columns([order_col, value_col]).materialize()

    def minmax(t: pa.Table) -> pa.Table:
        v = t.column(order_col).to_numpy(zero_copy_only=False)
        if v.size == 0:
            return pa.table({"lo": pa.array([], pa.int64()), "hi": pa.array([], pa.int64())})
        return pa.table({"lo": [int(v.min())], "hi": [int(v.max())]})

    mm = narrow.map_batches(minmax, batch_format="pyarrow", zero_copy_batch=True).take_all()
    if not mm:
        # empty input: typed empty output WITH the scan column, so
        # downstream projections see a stable schema
        def empty(t: pa.Table) -> pa.Table:
            return t.append_column(out_col, pa.nulls(t.num_rows, pa.int64()))

        return narrow.map_batches(empty, batch_format="pyarrow", zero_copy_batch=True)
    lo = min(r["lo"] for r in mm)
    hi = max(r["hi"] for r in mm)

    def range_of(v: np.ndarray) -> np.ndarray:
        # monotone in v (floor of a monotone map), so ranges are contiguous
        # and ordered even under float rounding at the boundaries
        span = float(hi - lo) + 1.0
        return np.minimum(
            ((v.astype(np.float64) - lo) * (n_parts / span)).astype(np.int64),
            n_parts - 1,
        )

    def partials(t: pa.Table) -> pa.Table:
        v = t.column(order_col).to_numpy(zero_copy_only=False)
        x = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        part = range_of(v)
        sums = np.bincount(part, weights=x, minlength=n_parts).astype(np.int64)
        nz = np.flatnonzero(sums)
        return pa.table(
            {"part": pa.array(nz, pa.int64()), "psum": pa.array(sums[nz], pa.int64())}
        )

    rows = narrow.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True).take_all()
    totals = np.zeros(n_parts, dtype=np.int64)
    for r in rows:
        totals[r["part"]] += r["psum"]
    base = np.concatenate(([0], np.cumsum(totals)[:-1]))  # exclusive per-range base

    def tag(t: pa.Table) -> pa.Table:
        if "__range" in t.column_names:
            raise ValueError(
                "ordered_prefix_sum: input already has a '__range' column; "
                "rename it — the name is reserved for the range tag"
            )
        v = t.column(order_col).to_numpy(zero_copy_only=False)
        return t.append_column("__range", pa.array(range_of(v), pa.int64()))

    def scan_range(t: pa.Table) -> pa.Table:
        # Arrow-native finalizer: the scan column appends with an explicit
        # int64 type and the input columns pass through untouched — no
        # pandas block ever enters the stream (see stages/grouping.py).
        k = t.column(order_col).to_numpy(zero_copy_only=False)
        order = np.argsort(k, kind="stable")
        k = k[order]
        if k.size > 1 and np.any(k[1:] == k[:-1]):
            raise ValueError(
                f"ordered_prefix_sum: duplicate {order_col!r} values — the "
                "exclusive running sum needs a total order over unique ids"
            )
        t = t.take(pa.array(order, pa.int64()))
        x = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        cum = np.concatenate(([0], np.cumsum(x)[:-1]))
        part = int(t.column("__range")[0].as_py()) if t.num_rows else 0
        t = t.drop_columns(["__range"])
        return t.append_column(out_col, pa.array(cum + base[part], pa.int64()))

    return (
        narrow.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__range")
        .map_groups(scan_range, batch_format="pyarrow")
    )


def pack_assignments(
    ds,
    seq_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_parts: int = 64,
):
    """Concat-and-chunk sequence packing over the documents table.

    Tokens are whitespace ``\\S+`` runs (the engine's token convention);
    documents concatenate in ``id_col`` order and slice into packs of
    ``seq_len`` tokens. Emits one row per non-empty document:
    ``(id, n_tokens, tok_start, pack_first, pack_last)`` where ``tok_start``
    is the document's global token offset and ``pack_first``/``pack_last``
    the pack window it spans. Empty documents are dropped (they occupy no
    tokens; their pack span is undefined).
    """
    from .text import add_token_count

    counts = add_token_count(
        ds.select_columns([id_col, text_col]), text_col=text_col
    ).select_columns([id_col, "n_tokens"])
    def nonzero(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(t.column("n_tokens"), 0))

    counts = counts.map_batches(nonzero, batch_format="pyarrow", zero_copy_batch=True)
    offs = ordered_prefix_sum(
        counts, id_col, "n_tokens", out_col="tok_start", n_parts=n_parts
    )

    def finish(t: pa.Table) -> pa.Table:
        s = t.column("tok_start")
        n = t.column("n_tokens")
        first = pc.divide(s, seq_len)
        last = pc.divide(pc.add(s, pc.subtract(n, 1)), seq_len)
        t = t.append_column("pack_first", pc.cast(first, pa.int64()))
        return t.append_column("pack_last", pc.cast(last, pa.int64()))

    return offs.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
