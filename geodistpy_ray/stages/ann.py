"""Similarity search over embedding columns (``list<float>``).

- :func:`ann_topk` — brute-force cosine top-k against a broadcast query
  matrix: per-batch ``numpy`` matmul + partial top-k (the combiner), then a
  small per-query merge. The corpus streams; only k·Q rows per batch shuffle.
- :func:`lsh_ann_topk` — random-hyperplane LSH bucketing as the scale path:
  signature → ``groupby(bucket)`` → per-bucket exact search. Approximate
  (recall < 1) by construction; multiple probe tables raise recall.
- :func:`embedding_near_dup_pairs` — cosine near-duplicate pairs via the
  close-pair idiom on LSH buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .geo import col_np


def _emb_matrix(batch: pa.Table, col: str, dtype=np.float64) -> np.ndarray:
    arr = batch.column(col).combine_chunks()
    flat = arr.values.to_numpy(zero_copy_only=False).astype(dtype)
    if len(arr) == 0:
        return flat.reshape(0, 0)  # callers guard on num_rows == 0 first
    return flat.reshape(len(arr), -1)


def _empty_partial(id_col: str) -> pa.Table:
    """Typed empty (query_id, id, sim) result — the shared empty-batch return."""
    return pa.table(
        {
            "query_id": pa.array([], pa.int64()),
            id_col: pa.array([], pa.int64()),
            "sim": pa.array([], pa.float64()),
        }
    )


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.maximum(n, 1e-30)


#: cache-resident sweep chunk (elements of one sims sub-matrix) — the same
#: ~256k-element bound the kNN sweeps use; 4M-element chunks measured 2x
#: slower from memory-bandwidth contention.
_SWEEP_CHUNK = 1 << 18


def _check_id_col(fn_name: str, id_col: str, out_cols: tuple = ("query_id", "sim", "rank")) -> None:
    """Single-sided twin of the check inside :func:`_check_two_sided_cols`:
    an ``id_col`` named like one of the fixed output columns would silently
    collapse the ``pa.table`` dict literal (one array overwrites the other,
    no error) — the merge would then rank garbage."""
    if id_col in out_cols:
        cols = "/".join(f"'{c}'" for c in out_cols)
        raise ValueError(
            f"{fn_name}: id_col={id_col!r} collides with an output column "
            f"({cols}); rename the id column"
        )


def _batch_topk_rows(
    sims: np.ndarray, ids: np.ndarray, id_col: str, k: int, margin: float,
    q_offset: int = 0,
) -> pa.Table:
    """Per-batch windowed top-k over a (B, Q) similarity matrix — keeps a
    rounding-margin window past the raw kth so boundary ties survive to the
    merge (which tie-breaks on round(sim, tie_round)). ``q_offset`` shifts
    the emitted query ids when ``sims`` covers a column CHUNK of the full
    query set (cache-resident sweeps). The id column is pinned to int64 so
    a narrower source dtype (int32 ids) can't mix block schemas with
    :func:`_empty_partial` across empty/non-empty batches."""
    kk = min(k, ids.size)
    out_q, out_i, out_s = [], [], []
    for j in range(sims.shape[1]):
        s = sims[:, j]
        if kk < ids.size:
            kth = np.partition(s, s.size - kk)[s.size - kk]
            part = np.flatnonzero(s >= kth - margin)
        else:
            part = np.arange(ids.size)
        out_q.append(np.full(part.size, j + q_offset, dtype=np.int64))
        out_i.append(ids[part])
        out_s.append(s[part].astype(np.float64))
    return pa.table(
        {
            "query_id": np.concatenate(out_q),
            id_col: np.concatenate(out_i).astype(np.int64, copy=False),
            "sim": np.concatenate(out_s),
        }
    )


def ann_topk(
    ds,
    query_matrix: np.ndarray,
    k: int,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    tie_round: int = 6,
):
    """Exact cosine top-k per query row → (query_id, {id_col}, sim, rank).

    ``query_matrix`` is (Q, d); it is closed over (broadcast once per task).
    Deterministic tie-break: (-round(sim), id).
    """
    _check_id_col("ann_topk", id_col)
    q = _normalize(np.asarray(query_matrix, dtype=np.float64))
    margin = 10.0 ** -tie_round if tie_round is not None else 0.0

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty_partial(id_col)
        emb = _normalize(_emb_matrix(batch, emb_col, np.float64))
        ids = col_np(batch, id_col)
        return _batch_topk_rows(emb @ q.T, ids, id_col, k, margin)

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return _merge_topk_by_sim(partials, id_col, k, tie_round)


def quantize_embeddings(
    ds,
    emb_col: str = "embedding",
    code_col: str = "emb_q",
    scale_col: str = "emb_scale",
    normalize: bool = True,
):
    """Per-vector int8 scalar quantization: ``x ≈ scale · codes`` with
    ``scale = max|x| / 127`` (per row) and int8 codes — the float column is
    REPLACED, cutting the embedding bytes that live in the object store and
    cross every shuffle by 4× (the dominant volume of an embedding corpus
    at 100 TB). Per-dimension error is ≤ scale/2. With ``normalize=True``
    (default) vectors are L2-normalized first, so quantized dot products
    approximate cosine directly (what :func:`ann_topk_quantized` consumes).
    """

    def fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            batch = batch.drop_columns([emb_col])
            batch = batch.append_column(code_col, pa.array([], pa.list_(pa.int8())))
            return batch.append_column(scale_col, pa.array([], pa.float32()))
        m = _emb_matrix(batch, emb_col, np.float64)
        if normalize:
            m = _normalize(m)
        scale = np.maximum(np.abs(m).max(axis=1) / 127.0, 1e-30)
        codes = np.rint(m / scale[:, None]).astype(np.int8)
        d = m.shape[1]
        flat = pa.array(codes.reshape(-1), pa.int8())
        offsets = pa.array(np.arange(0, (n + 1) * d, d, dtype=np.int32))
        batch = batch.drop_columns([emb_col])
        batch = batch.append_column(code_col, pa.ListArray.from_arrays(offsets, flat))
        return batch.append_column(scale_col, pa.array(scale.astype(np.float32), pa.float32()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def ann_topk_quantized(
    ds,
    query_matrix: np.ndarray,
    k: int,
    id_col: str = "vec_id",
    code_col: str = "emb_q",
    scale_col: str = "emb_scale",
    tie_round: int = 6,
):
    """Cosine top-k over an int8-QUANTIZED corpus (``quantize_embeddings``
    with ``normalize=True``): ``sim ≈ scale_d · (codes_d · q̂)``. Queries
    stay float64 (they're tiny and broadcast); only the corpus side — the
    object-store-resident side — is quantized. Approximate by construction
    (≤ scale/2 per-dimension rounding); recall vs the exact path is pinned
    in tests and tracked in scripts/recall_bench.py.
    """
    _check_id_col("ann_topk_quantized", id_col)
    q = _normalize(np.asarray(query_matrix, dtype=np.float64))
    margin = 10.0 ** -tie_round if tie_round is not None else 0.0

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty_partial(id_col)
        codes = _emb_matrix(batch, code_col, np.float64)
        scale = col_np(batch, scale_col).astype(np.float64)
        ids = col_np(batch, id_col)
        sims = (codes @ q.T) * scale[:, None]
        return _batch_topk_rows(sims, ids, id_col, k, margin)

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return _merge_topk_by_sim(partials, id_col, k, tie_round)


def _drop_masked(out: pa.Table) -> pa.Table:
    """Drop self-pair rows masked to sim = −2.0 from a local top-k window.

    When a query has FEWER than k real candidates (tiny corpus, n ≤ k),
    ``_batch_topk_rows`` keeps every row and the sentinel would survive to
    the merge as a phantom rank — the 'SELF excluded' contract (and the
    ``vec_id <> nbr_id`` SQL mirror) requires it to vanish, emitting fewer
    than k ranks instead. Real cosines are ≥ −1, so −1.5 splits cleanly."""
    import pyarrow.compute as pc

    return out.filter(pc.greater(out.column("sim"), -1.5))


def _merge_topk_by_sim(partials, id_col: str, k: int, tie_round: int | None, dedup: bool = False):
    """Per-query top-k merge on a hash partition of query_ids (bounded group
    count — see stages/grouping.py), ranked by (-round(sim), id).

    ``dedup``: drop repeated (query, candidate) pairs before ranking —
    needed by candidate generators whose partitions can OVERLAP (IVF
    multi-assignment × multi-probe), where the same pair legitimately
    arrives from two groups. The best (smallest-key) copy survives, so an
    ulp-level sim difference between the two computations (different BLAS
    blocking in different groups) can't make the outcome partition-
    dependent. The blocked exact paths keep the default — their pair
    coverage is exactly-once by construction and skipping the extra sort
    is free performance."""
    from .grouping import partitioned_map_groups, topk_per_group_part

    def merge_part(g: pd.DataFrame) -> pd.DataFrame:
        key = (-g["sim"]).round(tie_round) if tie_round is not None else -g["sim"]
        g = g.assign(_key=key)
        if dedup:
            g = g.sort_values(["query_id", id_col, "_key"]).drop_duplicates(
                ["query_id", id_col], keep="first"
            )
        return topk_per_group_part(
            g, "query_id", ["_key", id_col], [True, True], k, drop=["_key"]
        )

    return partitioned_map_groups(partials, "query_id", merge_part)


class HyperplaneLSH:
    """Seeded random-hyperplane signatures (state built once per actor).

    ``n_tables`` independent hash tables raise recall the standard way: a
    candidate is searched if it shares a bucket with the query in ANY table
    (miss probability decays as miss_one^n_tables)."""

    def __init__(self, dim: int, n_bits: int = 12, seed: int = 7, n_tables: int = 1):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, n_tables * n_bits)).astype(np.float32)
        self.n_tables = n_tables
        self.n_bits = n_bits
        self.weights = (1 << np.arange(n_bits, dtype=np.int64))

    def bucket(self, emb: np.ndarray) -> np.ndarray:
        """(N, n_tables) bucket ids, one column per table."""
        bits = (emb @ self.planes) > 0
        return bits.reshape(len(emb), self.n_tables, self.n_bits) @ self.weights


def lsh_ann_topk(
    ds,
    query_matrix: np.ndarray,
    k: int,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_bits: int = 8,
    seed: int = 7,
    n_tables: int = 8,
):
    """Approximate cosine top-k: search only the query's LSH bucket(s).

    The scale path for corpora too large for brute force; recall rises with
    fewer ``n_bits`` (bigger buckets) and more ``n_tables`` (independent
    chances to collide) — measured in ``scripts/recall_bench.py``.
    """
    _check_id_col("lsh_ann_topk", id_col)
    qm = _normalize(np.asarray(query_matrix, dtype=np.float32))
    lsh = HyperplaneLSH(qm.shape[1], n_bits, seed, n_tables)
    q_buckets = lsh.bucket(qm)  # (Q, T)

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty_partial(id_col)
        emb = _normalize(_emb_matrix(batch, emb_col, np.float32))
        ids = col_np(batch, id_col)
        buckets = lsh.bucket(emb)  # (B, T)
        out_q, out_i, out_s = [], [], []
        for j in range(qm.shape[0]):
            m = (buckets == q_buckets[j][None, :]).any(axis=1)
            if not m.any():
                continue
            s = emb[m] @ qm[j]
            kk = min(k, s.size)
            part = np.argpartition(-s, kk - 1)[:kk] if kk < s.size else np.arange(s.size)
            out_q.append(np.full(part.size, j, dtype=np.int64))
            out_i.append(ids[m][part])
            out_s.append(s[part].astype(np.float64))
        if not out_q:
            return _empty_partial(id_col)
        return pa.table(
            {
                "query_id": np.concatenate(out_q),
                # int64 pin: see _batch_topk_rows (schema parity with
                # _empty_partial on int32-id corpora)
                id_col: np.concatenate(out_i).astype(np.int64, copy=False),
                "sim": np.concatenate(out_s).astype(np.float64, copy=False),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    from .grouping import partitioned_map_groups, topk_per_group_part

    def merge_part(g: pd.DataFrame) -> pd.DataFrame:
        return topk_per_group_part(
            g, "query_id", ["sim", id_col], [False, True], k
        )

    return partitioned_map_groups(partials, "query_id", merge_part)


def exact_near_dup_pairs(
    ds,
    threshold: float,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    broadcast_budget_bytes: int = 2 << 30,
    sweep_chunk: int = _SWEEP_CHUNK,
):
    """Exact cosine near-duplicate pairs via a broadcast right side.

    The full (normalized) embedding matrix is ``ray.put`` once and streamed
    against batch-by-batch — O(N·B) per batch, never an N² materialization
    on one worker. Exactness makes it SQL-oracle-checkable — this is the
    BROADCAST-BUDGET path: driver memory is O(N·d), so a hard
    ``broadcast_budget_bytes`` guard (default 2 GiB) raises before the
    accumulation can silently become the 100 TB scale-killer. Corpora past
    the budget belong on :func:`embedding_near_dup_pairs` (LSH-bucketed,
    approximate — cross-checked against this exact path in
    tests/test_ann.py), whose shuffle state is O(N·d / n_buckets) per task.
    """
    import ray

    # build the broadcast matrix by STREAMING batches to the driver — peak
    # driver memory is the final packed (ids, matrix) pair plus one batch,
    # never a whole-table pandas frame of Python list objects
    id_parts, emb_parts = [], []
    accum = 0
    for batch in ds.select_columns([id_col, emb_col]).iter_batches(
        batch_size=8192, batch_format="pyarrow"
    ):
        if batch.num_rows == 0:
            continue
        id_parts.append(col_np(batch, id_col).copy())
        emb_parts.append(_normalize(_emb_matrix(batch, emb_col, np.float64)))
        accum += id_parts[-1].nbytes + emb_parts[-1].nbytes
        if accum > broadcast_budget_bytes:
            raise ValueError(
                f"exact_near_dup_pairs: embedding matrix exceeds the "
                f"{broadcast_budget_bytes >> 20} MiB broadcast budget after "
                f"{sum(p.size for p in id_parts)} rows; use "
                f"embedding_near_dup_pairs (LSH-bucketed) for this corpus, "
                f"or raise broadcast_budget_bytes explicitly"
            )
    if not id_parts:
        all_ids = np.array([], dtype=np.int64)
        all_emb = np.empty((0, 0), dtype=np.float64)
    else:
        all_ids = np.concatenate(id_parts)
        all_emb = np.vstack(emb_parts)
    ref = ray.put((all_ids, all_emb))

    def pairs(batch: pa.Table) -> pa.Table:
        from .broadcast import get_broadcast

        if batch.num_rows == 0:
            return pa.table(
                {
                    "id_a": pa.array([], pa.int64()),
                    "id_b": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                }
            )
        ids_r, emb_r = get_broadcast(ref)
        emb = _normalize(_emb_matrix(batch, emb_col, np.float64))
        ids = col_np(batch, id_col)
        # chunk the corpus axis: the broadcast budget bounds DRIVER memory,
        # not this task's peak — a corpus that passes the 2 GiB guard at
        # d=64 is ~4M rows, and an unchunked (1024, 4M) sims matrix plus
        # its two boolean masks (~42 GB) would OOM the worker. Chunks stay
        # cache-resident per the measured _SWEEP_CHUNK bound.
        step = max(1, sweep_chunk // max(ids.size, 1))
        out_a, out_b, out_s = [], [], []
        for s0 in range(0, ids_r.size, step):
            sl = slice(s0, s0 + step)
            sims = emb @ emb_r[sl].T  # (B, step)
            mask = (sims >= threshold) & (ids[:, None] < ids_r[sl][None, :])
            bi, ri = np.nonzero(mask)
            if bi.size:
                out_a.append(ids[bi])
                out_b.append(ids_r[sl][ri])
                out_s.append(sims[bi, ri])
        if not out_a:
            return pa.table(
                {
                    "id_a": pa.array([], pa.int64()),
                    "id_b": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
                "sim": np.concatenate(out_s),
            }
        )

    return ds.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True)


def grouped_vector_mean(
    ds,
    key_col: str = "label",
    emb_col: str = "embedding",
    round_to: int | None = 6,
):
    """Per-key embedding centroid (class prototypes / cluster seeds /
    nearest-class-mean features), exploded to (key, dim, mean_v) rows so
    the result is SQL-mirrorable (``AVG(embedding[i]) GROUP BY key, i``).

    Scale shape: each batch folds its rows into per-key (sum-vector,
    count) partials — one k×d float64 matrix per batch via ``np.add.at``,
    never row-wise Python — so the driver merge sees keys × batches small
    rows. The key domain is bounded (labels/classes); an unbounded keyed
    variant would merge partials through ``partitioned_map_groups``
    exactly like grouped_sum's ``final="partitioned"``.
    """

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    key_col: pa.array([], pa.int64()),
                    "sum_vec": pa.array([], pa.list_(pa.float64())),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        keys = col_np(batch, key_col)
        emb = _emb_matrix(batch, emb_col, np.float64)
        uniq, inv = np.unique(keys, return_inverse=True)
        sums = np.zeros((uniq.size, emb.shape[1]), dtype=np.float64)
        np.add.at(sums, inv, emb)
        cnt = np.bincount(inv).astype(np.int64)
        return pa.table(
            {
                key_col: pa.array(uniq, pa.int64()),
                "sum_vec": pa.array(list(sums), pa.list_(pa.float64())),
                "cnt": pa.array(cnt, pa.int64()),
            }
        )

    rows = ds.select_columns([key_col, emb_col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    sums: dict[int, np.ndarray] = {}
    cnts: dict[int, int] = {}
    for b in rows.iter_batches(batch_size=None, batch_format="pyarrow"):
        ks = b.column(key_col).to_numpy(zero_copy_only=False)
        cs = b.column("cnt").to_numpy(zero_copy_only=False)
        vecs = b.column("sum_vec")
        for k, c, v in zip(ks, cs, vecs):
            k = int(k)
            arr = np.asarray(v.as_py(), dtype=np.float64)
            if k in sums:
                sums[k] += arr
                cnts[k] += int(c)
            else:
                sums[k] = arr
                cnts[k] = int(c)
    keys_out, dims_out, means_out = [], [], []
    for k in sorted(sums):
        m = sums[k] / cnts[k]
        if round_to is not None:
            m = np.round(m, round_to)
        keys_out.extend([k] * m.size)
        dims_out.extend(range(1, m.size + 1))
        means_out.extend(m.tolist())
    return pa.table(
        {
            key_col: pa.array(keys_out, pa.int64()),
            "dim": pa.array(dims_out, pa.int64()),
            "mean_v": pa.array(means_out, pa.float64()),
        }
    )


def _block_of(ids: np.ndarray, n_blocks: int) -> np.ndarray:
    """Stable hash → block index; replicate and sweep MUST agree on this."""
    return (pd.util.hash_array(ids, categorize=False) % np.uint64(n_blocks)).astype(
        np.int64
    )


def _block_pair_replicate(ds, id_col: str, emb_col: str, n_blocks: int, where: str):
    """Block-replicated cartesian shuffle prep shared by every blocked
    all-pairs operator: rows hash into ``n_blocks`` blocks and each row
    ships once per block PAIR it participates in (tag
    ``__pair = lo * n_blocks + hi``, ONE shuffle, B·(B+1)/2 groups).
    Raises if the reserved tag name collides with an input column."""
    if "__pair" in (id_col, emb_col):
        raise ValueError(
            f"{where}: '__pair' is reserved for the block-pair tag; "
            "rename the input column"
        )

    def replicate(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("__pair", pa.array([], pa.int64()))
        blk = _block_of(col_np(batch, id_col), n_blocks)
        outs = []
        for j in range(n_blocks):
            lo = np.minimum(blk, j)
            hi = np.maximum(blk, j)
            outs.append(
                batch.append_column("__pair", pa.array(lo * n_blocks + hi, pa.int64()))
            )
        return pa.concat_tables(outs)

    return ds.select_columns([id_col, emb_col]).map_batches(
        replicate, batch_format="pyarrow", zero_copy_batch=True
    )


def _decode_block_pair(t: pa.Table, n_blocks: int) -> tuple[int, int]:
    """(i, j) block indices of a pair-group (inverse of the replicate tag)."""
    pair = int(t.column("__pair")[0].as_py())
    return pair // n_blocks, pair % n_blocks


def exact_near_dup_pairs_blocked(
    ds,
    threshold: float,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_blocks: int = 16,
):
    """Exact cosine near-duplicate pairs with NO driver-side matrix — the
    distributed twin of :func:`exact_near_dup_pairs` for corpora past its
    broadcast budget: the same pair set away from the threshold boundary,
    sims equal to ~1 ulp (a matmul's BLAS blocking varies with submatrix
    shape, so a cosine within an ulp of ``threshold`` can differ between
    the two paths — the same caveat :func:`embedding_near_dup_pairs`
    documents for its bucketed products).

    Block-replicated cartesian: vectors hash into ``n_blocks`` blocks; each
    vector ships once per block PAIR it participates in (``n_blocks``
    copies through ONE shuffle — the textbook amplification trade for
    exact all-pairs), and each of the B·(B+1)/2 pair-groups computes its
    submatrix product locally. Every unordered vector pair lives in exactly
    one (min_blk, max_blk) group, so no dedup pass is needed. Per-task
    memory is two blocks of N/B rows; group count is bounded (≤ 136 at
    B=16), so a plain ``groupby`` is safe. Choose B so (N/B)·d·8 fits a
    worker: total work is the same N² — this bounds MEMORY, not FLOPs;
    genuinely approximate corpora belong on
    :func:`embedding_near_dup_pairs`.
    """
    def sweep(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                "sim": pa.array([], pa.float64()),
            }
        )
        if t.num_rows == 0:
            return empty
        i, j = _decode_block_pair(t, n_blocks)
        ids = col_np(t, id_col)
        blk = _block_of(ids, n_blocks)
        emb = _normalize(_emb_matrix(t, emb_col, np.float64))
        if i == j:
            # within-block pairs: the replicate pass emits each block-i row
            # into (i, i) exactly once, upper triangle by id below
            sims = emb @ emb.T
            mask = (sims >= threshold) & (ids[:, None] < ids[None, :])
            ai, bi = np.nonzero(mask)
            return pa.table(
                {"id_a": ids[ai], "id_b": ids[bi], "sim": sims[ai, bi]}
            )
        li, ri = np.flatnonzero(blk == i), np.flatnonzero(blk == j)
        if li.size == 0 or ri.size == 0:
            return empty
        sims = emb[li] @ emb[ri].T
        mask = sims >= threshold
        ai, bi = np.nonzero(mask)
        a_ids, b_ids = ids[li][ai], ids[ri][bi]
        lo = np.minimum(a_ids, b_ids)
        hi = np.maximum(a_ids, b_ids)
        return pa.table({"id_a": lo, "id_b": hi, "sim": sims[ai, bi]})

    rep = _block_pair_replicate(
        ds, id_col, emb_col, n_blocks, "exact_near_dup_pairs_blocked"
    )
    return rep.groupby("__pair").map_groups(sweep, batch_format="pyarrow")


def embedding_near_dup_pairs(
    ds,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_bits: int = 6,
    seed: int = 7,
    n_tables: int = 8,
):
    """Cosine near-duplicate pairs via LSH-bucketed exact comparison —
    the scale path behind :func:`exact_near_dup_pairs`' broadcast budget.

    Each vector lands in one bucket per table (``n_tables`` independent
    hyperplane tables — the standard recall knob: a pair is compared if it
    collides in ANY table, miss probability = (1 - p^n_bits)^n_tables for
    per-plane agreement p = 1 - θ/π). Bucket sweep runs on hash PARTITIONS
    of the bucket key (bounded group count, stages/grouping.py), kept sims
    are recomputed with a shape-independent row-wise dot so the same pair
    found in several tables dedups exactly in the distributed ``distinct``.
    Shuffle volume is n_tables × the embedding column — the trade for not
    materializing the N² similarity matrix or the O(N·d) driver broadcast.
    """
    from .grouping import key_spans, partitioned_map_groups
    from .relational import distinct

    lsh_holder = {}

    def sig(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "bucket": pa.array([], pa.int64()),
                    id_col: pa.array([], pa.int64()),
                    "emb_flat": pa.array([], pa.list_(pa.float64())),
                }
            )
        emb = _normalize(_emb_matrix(batch, emb_col, np.float32))
        if "lsh" not in lsh_holder:
            lsh_holder["lsh"] = HyperplaneLSH(emb.shape[1], n_bits, seed, n_tables)
        buckets = lsh_holder["lsh"].bucket(emb)  # (N, n_tables)
        n = len(emb)
        # composite key: table index in the high bits, bucket in the low
        keys = (
            buckets.astype(np.int64)
            + (np.arange(n_tables, dtype=np.int64) << n_bits)[None, :]
        )
        ids = col_np(batch, id_col)
        # vectorized list build (one flat buffer + offsets, the
        # quantize_embeddings shape) — a per-row pa.array(list(...)) here
        # would dominate this shuffle-prep stage's CPU on wide embeddings
        d = emb.shape[1]
        emb64 = pa.ListArray.from_arrays(
            pa.array(np.arange(0, (n + 1) * d, d, dtype=np.int32)),
            pa.array(emb.astype(np.float64).reshape(-1), pa.float64()),
        )
        idx = np.tile(np.arange(n, dtype=np.int64), n_tables)
        return pa.table(
            {
                "bucket": keys.T.ravel(),
                id_col: np.tile(ids, n_tables),
                "emb_flat": emb64.take(pa.array(idx)),
            }
        )

    bucketed = ds.map_batches(sig, batch_format="pyarrow", zero_copy_batch=True)

    def pairs_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("bucket", kind="mergesort")
        keys = g["bucket"].to_numpy()
        ids_all = g[id_col].to_numpy()
        out_a, out_b, out_s = [], [], []
        for s, e in zip(*key_spans(keys, min_size=2)):
            ids = ids_all[s:e]
            emb = np.stack(g["emb_flat"].to_numpy()[s:e])
            sims = emb @ emb.T
            ii, jj = np.triu_indices(ids.size, k=1)
            keep = sims[ii, jj] >= threshold
            if not keep.any():
                continue
            ki, kj = ii[keep], jj[keep]
            a, b = ids[ki], ids[kj]
            # shape-independent recompute: (P, d) row-wise dot reduces over
            # d only (and elementwise multiply commutes exactly), so the
            # same pair yields the SAME float in every table — a matmul's
            # blocking varies with the bucket's size and would leave ulp
            # differences that defeat the exact distinct below
            out_a.append(np.minimum(a, b))
            out_b.append(np.maximum(a, b))
            out_s.append((emb[ki] * emb[kj]).sum(axis=1))
        if not out_a:
            return pd.DataFrame({"id_a": [], "id_b": [], "sim": []}).astype(
                {"id_a": np.int64, "id_b": np.int64, "sim": np.float64}
            )
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
                "sim": np.concatenate(out_s),
            }
        )

    pairs = partitioned_map_groups(bucketed, "bucket", pairs_part, n_parts=64)
    return distinct(pairs, ["id_a", "id_b", "sim"])


def train_ivf_centroids(
    sample: np.ndarray, n_centroids: int, n_iters: int = 8
) -> np.ndarray:
    """Deterministic spherical k-means on a (bounded, driver-side) sample.

    Init = the first ``n_centroids`` sample rows (deterministic — no RNG);
    Lloyd iterations with cosine assignment; empty clusters keep their
    previous centroid. Mirrors real IVF practice: the coarse quantizer is
    trained on a sample, then applied streaming to the full corpus.
    """
    x = _normalize(np.asarray(sample, dtype=np.float64))
    if x.shape[0] < n_centroids:
        raise ValueError(f"need >= {n_centroids} sample rows, got {x.shape[0]}")
    # farthest-point init (deterministic k-means++ analogue): start from
    # row 0, then greedily take the sample point least similar to every
    # chosen centroid — spreads seeds across the data's actual clusters
    # where first-n-rows init collapses when the sample is ordered
    # (measured: +4-6 recall points at 10 on the fixture embeddings)
    seeds = [0]
    best = x @ x[0]
    best[0] = np.inf
    for _ in range(n_centroids - 1):
        nxt = int(np.argmin(best))
        seeds.append(nxt)
        np.maximum(best, x @ x[nxt], out=best)
        # a zero-norm row (nulls/padding → _normalize maps it to zeros) has
        # similarity 0 to EVERYTHING including itself — without this pin,
        # argmin would re-select it every remaining iteration and collapse
        # the seed set to 2 effective centroids
        best[nxt] = np.inf
    c = x[np.array(seeds)].copy()
    for _ in range(n_iters):
        assign = np.argmax(x @ c.T, axis=1)
        for j in range(n_centroids):
            m = assign == j
            if m.any():
                c[j] = x[m].mean(axis=0)
        c = _normalize(c)
    return c


def ivf_ann_topk(
    ds,
    query_matrix: np.ndarray,
    k: int,
    n_centroids: int = 16,
    n_probe: int = 4,
    train_sample: int = 4096,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    tie_round: int = 6,
    n_assign: int = 2,
):
    """IVF approximate cosine top-k: coarse-quantize the corpus into
    ``n_centroids`` inverted lists; each query searches only its ``n_probe``
    nearest lists.

    The scale path complement to :func:`lsh_ann_topk`: centroids are trained
    once on a bounded sample (driver side, like real IVF training), then
    broadcast; assignment + probe filtering run vectorized per batch, and
    only k·Q candidate rows per batch reach the per-query merge.

    ``n_assign`` replicates each corpus vector into its ``n_assign``
    nearest lists (the IVF "multiple assignment" recall lever): a true
    neighbor sitting just across a Voronoi boundary from the probed lists
    is the dominant recall loss, and listing it on both sides recovers it
    for an ``n_assign``× larger candidate scan — no index rebuild, no
    extra shuffle (the filter stays a per-batch mask). Measured
    recall@10 over 20 queries on the fixture embeddings (a hard,
    near-uniform-on-the-sphere case): (8, 3, assign 1) 0.70 →
    (8, 3, assign 2) 0.88 → (8, 4, assign 2) 0.95 → (8, 4, assign 3)
    0.98; latency flat across all of these (scan fraction
    ≈ n_probe·n_assign/n_centroids governs it at corpus scale).
    """
    import ray

    from .broadcast import get_broadcast

    _check_id_col("ivf_ann_topk", id_col)
    sample_pd = ds.select_columns([emb_col]).limit(train_sample).to_pandas()
    cents = train_ivf_centroids(np.stack(sample_pd[emb_col].to_numpy()), n_centroids)

    qm = _normalize(np.asarray(query_matrix, dtype=np.float64))
    # probe lists: each query's n_probe nearest centroids
    q_cent = np.argsort(-(qm @ cents.T), axis=1)[:, :n_probe]
    ref = ray.put(cents)

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty_partial(id_col)
        c = get_broadcast(ref)
        emb = _normalize(_emb_matrix(batch, emb_col, np.float64))
        ids = col_np(batch, id_col)
        sims_c = emb @ c.T
        na = min(n_assign, c.shape[0])
        # each vector lives in its n_assign nearest lists; membership as a
        # boolean (rows, n_centroids) table so the per-query probe test is
        # one fancy-index + any() instead of n_assign isin passes
        top_a = np.argpartition(-sims_c, na - 1, axis=1)[:, :na]
        member = np.zeros((emb.shape[0], c.shape[0]), dtype=bool)
        member[np.arange(emb.shape[0])[:, None], top_a] = True
        margin = 10.0 ** -tie_round if tie_round is not None else 0.0
        out_q, out_i, out_s = [], [], []
        for j in range(qm.shape[0]):
            m = member[:, q_cent[j]].any(axis=1)
            if not m.any():
                continue
            s = emb[m] @ qm[j]
            kk = min(k, s.size)
            if kk < s.size:
                kth = np.partition(s, s.size - kk)[s.size - kk]
                part = np.flatnonzero(s >= kth - margin)
            else:
                part = np.arange(s.size)
            out_q.append(np.full(part.size, j, dtype=np.int64))
            out_i.append(ids[m][part])
            out_s.append(s[part])
        if not out_q:
            return _empty_partial(id_col)
        return pa.table(
            {
                "query_id": np.concatenate(out_q),
                # int64 pin: see _batch_topk_rows (schema parity with
                # _empty_partial on int32-id corpora)
                id_col: np.concatenate(out_i).astype(np.int64, copy=False),
                "sim": np.concatenate(out_s).astype(np.float64, copy=False),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return _merge_topk_by_sim(partials, id_col, k, tie_round)


def _check_two_sided_cols(fn_name, reserved_tags, query_id_col, query_emb_col, id_col, emb_col):
    """Shared input-name validation for the two-sided joins: the internal
    tag columns must not collide with input names, and the corpus id column
    must not collide with the fixed OUTPUT names (a ``pa.table`` dict
    literal would silently collapse the duplicate key)."""
    if reserved_tags & {query_id_col, query_emb_col, id_col, emb_col}:
        tags = "/".join(f"'{t}'" for t in sorted(reserved_tags))
        raise ValueError(
            f"{fn_name}: {tags} are reserved for the internal tags; "
            "rename the input columns"
        )
    _check_id_col(fn_name, id_col)


def _two_sided_sweep(t: pa.Table, id_col: str, k: int, margin: float) -> pa.Table:
    """Per-group submatrix sweep shared by the two-sided joins: split the
    group into its query/corpus sides, compute the cosine submatrix, and
    emit per-query LOCAL top-k windows with the query positions remapped to
    real ids."""
    empty = _empty_partial(id_col)
    if t.num_rows == 0:
        return empty
    side = t.column("__side").to_numpy(zero_copy_only=False)
    qi, ci = np.flatnonzero(side == 0), np.flatnonzero(side == 1)
    if qi.size == 0 or ci.size == 0:
        return empty
    emb = _normalize(_emb_matrix(t, "__emb", np.float64))
    ids = t.column("__id").to_numpy(zero_copy_only=False)
    sims = emb[ci] @ emb[qi].T  # (corpus rows, query rows)
    out = _batch_topk_rows(sims, ids[ci], id_col, k, margin)
    pos = out.column("query_id").to_numpy(zero_copy_only=False)
    return out.set_column(0, "query_id", pa.array(ids[qi][pos], pa.int64()))


def ann_join_blocked(
    queries_ds,
    corpus_ds,
    k: int,
    query_id_col: str = "query_id",
    query_emb_col: str = "embedding",
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    tie_round: int = 6,
    n_query_blocks: int = 4,
    n_corpus_blocks: int = 8,
):
    """Exact cosine top-k JOIN between two corpus-scale Datasets — the
    two-sided generalization of :func:`knn_graph_blocked` for when the
    QUERY side is itself a table too big for :func:`ann_topk`'s
    driver-side query matrix (e.g. "for every new document, its k nearest
    existing documents").

    Output: (``query_id``, ``id_col``, ``sim``, ``rank``) with the same
    (-round(sim, tie_round), id) rank contract as :func:`ann_topk`, so the
    same ROW_NUMBER SQL mirrors both.

    Scale shape — ONE shuffle, no driver matrix on either side: query rows
    hash into QB blocks and ship once per corpus block (QB·CB pair-groups,
    CB copies of the query side), corpus rows ship QB copies; each
    pair-group computes its (corpus-block × query-block) submatrix product
    locally and emits per-query LOCAL top-k windows; the hash-partitioned
    merge folds each query's ≤ CB·k surviving candidates into the global
    top-k. Every (query, candidate) pair lives in exactly one group, so
    the merge never sees duplicates. Peak task memory is one query block
    plus one corpus block — size the block counts so
    (rows/blocks)·d·8 bytes fits a worker; total FLOPs stay |Q|·|C|·d
    (exactness is the point; candidate-pruned corpora belong on the
    IVF/LSH paths).
    """
    _check_two_sided_cols(
        "ann_join_blocked", {"__pair", "__side"},
        query_id_col, query_emb_col, id_col, emb_col,
    )
    margin = 10.0 ** -tie_round if tie_round is not None else 0.0
    qb_n, cb_n = int(n_query_blocks), int(n_corpus_blocks)

    def _harmonize(batch: pa.Table, idc: str, embc: str, side: int, my_n: int, other_n: int, stride: bool) -> pa.Table:
        n = batch.num_rows
        base = pa.table(
            {
                "__id": batch.column(idc).cast(pa.int64()),
                # harmonize the embedding type across the union — a
                # float32/fixed_size_list query table joined against a
                # float64 corpus must not break the single shuffle
                "__emb": batch.column(embc).cast(pa.list_(pa.float64())),
                "__side": pa.array(np.full(n, side, dtype=np.int8)),
            }
        )
        if n == 0:
            return base.append_column("__pair", pa.array([], pa.int64()))
        ids = base.column("__id").to_numpy(zero_copy_only=False)
        blk = _block_of(ids, my_n)
        outs = []
        for j in range(other_n):
            # pair id is always qblock * CB + cblock
            pair = blk * cb_n + j if stride else j * cb_n + blk
            outs.append(base.append_column("__pair", pa.array(pair, pa.int64())))
        return pa.concat_tables(outs)

    def rep_q(batch: pa.Table) -> pa.Table:
        return _harmonize(batch, query_id_col, query_emb_col, 0, qb_n, cb_n, stride=True)

    def rep_c(batch: pa.Table) -> pa.Table:
        return _harmonize(batch, id_col, emb_col, 1, cb_n, qb_n, stride=False)

    rep = (
        queries_ds.select_columns([query_id_col, query_emb_col])
        .map_batches(rep_q, batch_format="pyarrow", zero_copy_batch=True)
        .union(
            corpus_ds.select_columns([id_col, emb_col]).map_batches(
                rep_c, batch_format="pyarrow", zero_copy_batch=True
            )
        )
    )

    partials = rep.groupby("__pair").map_groups(
        lambda t: _two_sided_sweep(t, id_col, k, margin), batch_format="pyarrow"
    )
    return _merge_topk_by_sim(partials, id_col, k, tie_round)


def ivf_ann_join(
    queries_ds,
    corpus_ds,
    k: int,
    n_centroids: int = 16,
    n_probe: int = 4,
    n_assign: int = 2,
    train_sample: int = 4096,
    n_sub_blocks: int = 1,
    query_id_col: str = "query_id",
    query_emb_col: str = "embedding",
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    tie_round: int = 6,
):
    """IVF-pruned two-sided ANN join — the approximate complement to
    :func:`ann_join_blocked` for when |Q|·|C|·d exact FLOPs are not
    affordable: both sides are corpus-scale Datasets, but each query is
    compared only against the corpus rows sharing one of its ``n_probe``
    nearest inverted lists (scan fraction ≈ n_probe·n_assign/n_centroids).

    Shape: centroids train once on a bounded corpus sample (driver-side,
    like real IVF training) and broadcast via ``ray.put``; corpus rows ship
    ``n_assign`` copies (one per assigned list), query rows ship
    ``n_probe``·``n_sub_blocks`` copies; ONE shuffle groups on (list ×
    sub-block), each group computes its submatrix product and emits local
    top-k windows, and the hash-partitioned merge folds — with pair DEDUP,
    since multi-assignment × multi-probe means a (query, candidate) pair
    can legitimately appear in up to min(n_probe, n_assign) groups.

    Partitioning assumptions (document-grade, the knobs ARE the contract):
    a single inverted list's corpus rows must fit one worker ÷
    ``n_sub_blocks`` — size ``n_centroids`` (real IVF deployments use
    thousands) and raise ``n_sub_blocks`` for skewed lists; group count is
    n_centroids·n_sub_blocks (bounded — safe for ``map_groups``' ~1.5 ms
    per-group cost up to ~10k groups). Recall is governed by the same
    (n_probe, n_assign) levers as :func:`ivf_ann_topk` (curve in its
    docstring); ``n_probe = n_centroids`` with ``n_assign = 1`` degenerates
    to the exact join (every pair covered, tested).
    """
    import ray

    from .broadcast import get_broadcast

    _check_two_sided_cols(
        "ivf_ann_join", {"__key", "__side"},
        query_id_col, query_emb_col, id_col, emb_col,
    )
    sample_pd = corpus_ds.select_columns([emb_col]).limit(train_sample).to_pandas()
    cents = train_ivf_centroids(np.stack(sample_pd[emb_col].to_numpy()), n_centroids)
    ref = ray.put(cents)
    nc = cents.shape[0]
    npr, na, ns = min(int(n_probe), nc), min(int(n_assign), nc), max(1, int(n_sub_blocks))
    margin = 10.0 ** -tie_round if tie_round is not None else 0.0

    def _tagged(batch: pa.Table, idc: str, embc: str, side: int, idx: np.ndarray, keys: np.ndarray) -> pa.Table:
        base = pa.table(
            {
                "__id": batch.column(idc).cast(pa.int64()),
                # same union-schema harmonization as ann_join_blocked
                "__emb": batch.column(embc).cast(pa.list_(pa.float64())),
            }
        ).take(pa.array(idx, pa.int64()))
        return base.append_column("__key", pa.array(keys, pa.int64())).append_column(
            "__side", pa.array(np.full(idx.size, side, dtype=np.int8))
        )

    def tag_q(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return _tagged(batch, query_id_col, query_emb_col, 0,
                           np.array([], np.int64), np.array([], np.int64))
        c = get_broadcast(ref)
        emb = _normalize(_emb_matrix(batch, query_emb_col, np.float64))
        probe = np.argpartition(-(emb @ c.T), npr - 1, axis=1)[:, :npr]
        idx = np.repeat(np.arange(n, dtype=np.int64), npr)
        keys = probe.ravel().astype(np.int64) * ns
        if ns > 1:
            idx = np.tile(idx, ns)
            keys = np.concatenate([keys + s for s in range(ns)])
        return _tagged(batch, query_id_col, query_emb_col, 0, idx, keys)

    def tag_c(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return _tagged(batch, id_col, emb_col, 1,
                           np.array([], np.int64), np.array([], np.int64))
        c = get_broadcast(ref)
        emb = _normalize(_emb_matrix(batch, emb_col, np.float64))
        ids = batch.column(id_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        assign = np.argpartition(-(emb @ c.T), na - 1, axis=1)[:, :na]
        sub = _block_of(ids, ns)
        idx = np.repeat(np.arange(n, dtype=np.int64), na)
        keys = assign.ravel().astype(np.int64) * ns + np.repeat(sub, na)
        return _tagged(batch, id_col, emb_col, 1, idx, keys)

    rep = (
        queries_ds.select_columns([query_id_col, query_emb_col])
        .map_batches(tag_q, batch_format="pyarrow", zero_copy_batch=True)
        .union(
            corpus_ds.select_columns([id_col, emb_col]).map_batches(
                tag_c, batch_format="pyarrow", zero_copy_batch=True
            )
        )
    )

    partials = rep.groupby("__key").map_groups(
        lambda t: _two_sided_sweep(t, id_col, k, margin), batch_format="pyarrow"
    )
    return _merge_topk_by_sim(partials, id_col, k, tie_round, dedup=True)


def embedding_pca(
    ds,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    n_components: int = 2,
    round_to: int | None = 6,
):
    """Distributed PCA over an embedding column → (projected Dataset
    (id, pc1..pcK), explained-variance-ratio ndarray).

    Scale shape: ONE streaming pass emits per-batch moment partials — the
    count, the coordinate sum vector, and the d×d Gram matrix X'X (d = the
    embedding dim, tiny next to the corpus) — the driver folds those
    partials in O(d²) memory independent of row count, eigendecomposes the
    covariance, and the top-K component matrix broadcasts back into a
    second map that projects every vector. No row ever leaves its batch;
    the exchanges carry only d²-sized partials. Component signs are fixed
    deterministically (largest-|coordinate| entry made positive) so output
    is partition-independent and reproducible.
    """
    import ray

    from .broadcast import get_broadcast

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "n": pa.array([], pa.int64()),
                    "s": pa.array([], pa.list_(pa.float64())),
                    "g": pa.array([], pa.list_(pa.float64())),
                }
            )
        x = _emb_matrix(batch, emb_col)
        return pa.table(
            {
                "n": pa.array([x.shape[0]], pa.int64()),
                "s": pa.array([x.sum(axis=0)], pa.list_(pa.float64())),
                "g": pa.array([(x.T @ x).ravel()], pa.list_(pa.float64())),
            }
        )

    # fold the partials STREAMING — take_all() would hold every per-batch
    # d×d Gram list (as Python floats) on the driver at once,
    # O(n_batches·d²); the running (n, s, g) fold is the O(d²)
    # independent-of-row-count memory the docstring promises.
    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    n = 0
    s = g = None
    for b in parts.iter_batches(batch_size=None, batch_format="pyarrow"):
        ns = b.column("n").to_numpy(zero_copy_only=False)
        svals, gvals = b.column("s"), b.column("g")
        for i in range(b.num_rows):
            n += int(ns[i])
            sv = np.asarray(svals[i].as_py(), dtype=np.float64)
            gv = np.asarray(gvals[i].as_py(), dtype=np.float64)
            if s is None:
                s, g = sv, gv
            else:
                s += sv
                g += gv
    if n < 2:
        raise ValueError(f"embedding_pca needs >= 2 vectors, got {n}")
    d = s.size
    g = g.reshape(d, d)
    mu = s / n
    cov = (g - n * np.outer(mu, mu)) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:n_components]
    comps = evecs[:, order]  # d × K
    # deterministic sign: the largest-|coordinate| entry of each component
    # is positive (eigh's sign is arbitrary and platform-dependent)
    for j in range(comps.shape[1]):
        i = int(np.argmax(np.abs(comps[:, j])))
        if comps[i, j] < 0:
            comps[:, j] = -comps[:, j]
    total_var = float(np.trace(cov))
    evr = np.maximum(evals[order], 0.0) / total_var if total_var > 0 else evals[order] * 0.0
    state_ref = ray.put((mu, comps))

    def project(batch: pa.Table) -> pa.Table:
        names = [f"pc{j + 1}" for j in range(n_components)]
        if batch.num_rows == 0:
            cols = {id_col: pa.array([], pa.int64())}
            cols.update({nm: pa.array([], pa.float64()) for nm in names})
            return pa.table(cols)
        mu_, w = get_broadcast(state_ref)
        x = _emb_matrix(batch, emb_col)
        p = (x - mu_) @ w
        if round_to is not None:
            p = np.round(p, round_to)
        cols = {id_col: batch.column(id_col)}
        cols.update({nm: pa.array(p[:, j], pa.float64()) for j, nm in enumerate(names)})
        return pa.table(cols)

    proj = ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
    return proj, evr


def knn_graph(
    ds,
    k: int = 3,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    tie_round: int = 6,
    max_rows: int = 100_000,
    over_budget: str = "blocked",
):
    """k-NN GRAPH over an embedding corpus: each vector's top-k cosine
    neighbors with SELF excluded → (vec_id, nbr_id, rank) — the edge list
    behind graph-based dedup, clustering, and HNSW-style index builds.

    Broadcast form with a budget guard (the :func:`embedding_near_dup_pairs`
    trade): the query side is the WHOLE corpus, collected once and closed
    over; the corpus then STREAMS through the same windowed top-k combiner
    as :func:`ann_topk`, with self-pairs masked before the window. The
    budget check is an id-only LIMIT probe — a corpus past the budget
    never ships a single embedding to the driver; with
    ``over_budget="blocked"`` (default) it auto-delegates to
    :func:`knn_graph_blocked` (exact, no driver matrix; block count sized
    so a block PAIR stays within ``max_rows`` rows), ``"raise"`` keeps the
    hard error for callers that want the switch explicit. Both paths share
    the (-round(sim), neighbor id) tie-break, mirroring the SQL ROW_NUMBER
    exactly; raw sims are dropped from the output (numpy and SQL cosine
    differ in fp ordering — ranks are the stable contract).
    """
    if over_budget not in ("blocked", "raise"):
        raise ValueError(
            f"knn_graph: over_budget must be 'blocked' or 'raise', got {over_budget!r}"
        )
    _check_id_col("knn_graph", id_col, ("nbr_id", "rank", "query_id", "sim"))
    # id-only probe: the embedding payload never reaches the driver just to
    # learn the corpus is too big. ONE projected count serves both the
    # budget check and the block sizing — a LIMIT probe followed by a full
    # ds.count() would execute the upstream pipeline (embeddings included)
    # a second time for corpora that are over budget.
    n = ds.select_columns([id_col]).count()
    if n > max_rows:
        if over_budget == "raise":
            raise ValueError(
                f"knn_graph broadcast budget exceeded (> {max_rows} rows); "
                "use knn_graph_blocked (exact, no driver matrix) or the "
                "IVF/LSH candidate paths for larger corpora"
            )
        n_blocks = max(2, -(-2 * n // max(1, max_rows)))
        return knn_graph_blocked(
            ds, k=k, id_col=id_col, emb_col=emb_col, tie_round=tie_round,
            n_blocks=n_blocks,
        )
    rows = ds.select_columns([id_col, emb_col]).take_all()
    if not rows:
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "nbr_id": pa.array([], pa.int64()),
                    "rank": pa.array([], pa.int64()),
                }
            )
        )
    import ray

    from .broadcast import get_broadcast

    qids = np.array([r[id_col] for r in rows], dtype=np.int64)
    q = _normalize(
        np.stack([np.asarray(r[emb_col], dtype=np.float64) for r in rows])
    )
    margin = 10.0 ** -tie_round if tie_round is not None else 0.0
    # ray.put once, fetch via the per-worker cache: a closed-over corpus
    # matrix near the max_rows budget (~600 MB at d=768) would otherwise
    # ship inside the cloudpickled UDF and deserialize into a PRIVATE heap
    # copy per worker instead of shared object-store memory
    corpus_ref = ray.put((qids, q))

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty_partial("nbr_id")
        qids_w, q_w = get_broadcast(corpus_ref)
        emb = _normalize(_emb_matrix(batch, emb_col, np.float64))
        ids = col_np(batch, id_col)
        # chunk the (B, N) product cache-resident (_SWEEP_CHUNK): a full
        # 1024 × 100k float64 sims block is ~0.8 GB of transients PER TASK
        step = max(1, _SWEEP_CHUNK // max(1, emb.shape[0]))
        parts = []
        for c0 in range(0, q_w.shape[0], step):
            c1 = min(c0 + step, q_w.shape[0])
            sims = emb @ q_w[c0:c1].T
            sims[ids[:, None] == qids_w[None, c0:c1]] = -2.0  # mask self-pairs
            parts.append(
                _batch_topk_rows(sims, ids, "nbr_id", k, margin, q_offset=c0)
            )
        return _drop_masked(pa.concat_tables(parts))

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    merged = _merge_topk_by_sim(partials, "nbr_id", k, tie_round)

    def finish(batch: pa.Table) -> pa.Table:
        pos = batch.column("query_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: pa.array(qids[pos], pa.int64()),
                "nbr_id": batch.column("nbr_id"),
                "rank": batch.column("rank"),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def knn_graph_blocked(
    ds,
    k: int = 3,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    tie_round: int = 6,
    n_blocks: int = 8,
):
    """Distributed exact k-NN graph — the scale path past
    :func:`knn_graph`'s broadcast budget, same output contract
    (``{id_col}``, ``nbr_id``, ``rank``) and the same (-round(sim), id)
    tie-break, so both paths mirror one SQL ROW_NUMBER oracle.

    Block-replicated cartesian (the :func:`exact_near_dup_pairs_blocked`
    shape): vectors hash into ``n_blocks`` blocks; each vector ships once
    per block PAIR (``n_blocks`` copies through ONE shuffle), each of the
    B·(B+1)/2 pair-groups computes its submatrix product locally and emits
    per-query LOCAL top-k windows in BOTH directions, and the shared
    hash-partitioned merge (:func:`_merge_topk_by_sim`) folds each query's
    ≤ B·k surviving candidates into the global top-k. Every (query,
    candidate) pair lives in exactly one group, so the merge never sees a
    duplicate; a query's global top-k is a subset of its per-group top-ks,
    so local windows lose nothing. No ``take_all``, no driver matrix: peak
    task memory is two blocks of N/B rows — size ``n_blocks`` so
    (N/B)·d·8 bytes fits a worker. Total FLOPs stay N²·d (exactness is
    the point; approximate corpora belong on the IVF/LSH paths).
    """
    _check_id_col("knn_graph_blocked", id_col, ("nbr_id", "rank", "query_id", "sim"))
    margin = 10.0 ** -tie_round if tie_round is not None else 0.0

    def _with_query_ids(t: pa.Table, qids: np.ndarray) -> pa.Table:
        pos = t.column("query_id").to_numpy(zero_copy_only=False)
        return t.set_column(0, "query_id", pa.array(qids[pos], pa.int64()))

    def sweep(t: pa.Table) -> pa.Table:
        empty = _empty_partial("nbr_id")
        if t.num_rows == 0:
            return empty
        i, j = _decode_block_pair(t, n_blocks)
        ids = col_np(t, id_col)
        blk = _block_of(ids, n_blocks)
        emb = _normalize(_emb_matrix(t, emb_col, np.float64))
        if i == j:
            sims = emb @ emb.T
            sims[ids[:, None] == ids[None, :]] = -2.0  # mask self-pairs
            return _drop_masked(
                _with_query_ids(_batch_topk_rows(sims, ids, "nbr_id", k, margin), ids)
            )
        li, ri = np.flatnonzero(blk == i), np.flatnonzero(blk == j)
        if li.size == 0 or ri.size == 0:
            return empty
        sims = emb[li] @ emb[ri].T  # (block-i rows, block-j columns)
        return pa.concat_tables(
            [
                # queries = block j, candidates = block i
                _with_query_ids(
                    _batch_topk_rows(sims, ids[li], "nbr_id", k, margin), ids[ri]
                ),
                # queries = block i, candidates = block j
                _with_query_ids(
                    _batch_topk_rows(sims.T, ids[ri], "nbr_id", k, margin), ids[li]
                ),
            ]
        )

    rep = _block_pair_replicate(ds, id_col, emb_col, n_blocks, "knn_graph_blocked")
    partials = rep.groupby("__pair").map_groups(sweep, batch_format="pyarrow")
    merged = _merge_topk_by_sim(partials, "nbr_id", k, tie_round)

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: batch.column("query_id").cast(pa.int64()),
                "nbr_id": batch.column("nbr_id"),
                "rank": batch.column("rank"),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
