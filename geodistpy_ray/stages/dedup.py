"""Deduplication stages: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Training-data-pipeline ops over the documents table, all expressed as
Ray Data shuffles:

- exact: content hash per batch → ``groupby(hash)`` keep-first (combiner-free
  but the hash column is 16 bytes/row, so the shuffle is narrow).
- MinHash+LSH: shingle → minhash signature per batch → explode to
  (band_key, doc_id) rows → ``groupby(band_key)`` → candidate pairs →
  Jaccard-verify. The signature matrix itself never shuffles — only the
  band keys (bands × 8 bytes per doc).
- SimHash: 64-bit signature, 4×16-bit band blocking for Hamming-near pairs.

Hashes are keyed blake2b (deterministic across workers — Python's builtin
``hash`` is process-salted and must never cross a task boundary).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from .grouping import key_spans, partitioned_map_groups

_MERSENNE = (1 << 61) - 1
_P61 = np.uint64(_MERSENNE)
_LO32 = np.uint64(0xFFFFFFFF)
_LO29 = np.uint64((1 << 29) - 1)


def _blake_u64(s: bytes) -> int:
    return int.from_bytes(hashlib.blake2b(s, digest_size=8).digest(), "little")


_U3, _U29, _U32, _U61 = np.uint64(3), np.uint64(29), np.uint64(32), np.uint64(61)


def _mod61(x: np.ndarray) -> np.ndarray:
    """x mod (2^61-1) for uint64 inputs < 4·(2^61-1): one fold + subtract."""
    x = (x >> np.uint64(61)) + (x & _P61)
    return np.where(x >= _P61, x - _P61, x)


def _mulmod61_lazy(h: np.ndarray, a_hi: np.ndarray, a_lo: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(h[:, None]·a + b) mod (2^61-1) with LAZY reduction — the hot inner
    kernel of :meth:`MinHasher.signatures` (~2× over the eager version).

    Same split-multiply congruences as :func:`_mulmod61`, but intermediate
    residues ride at ≤ p + small-ε instead of < p; the total stays under
    2^64 (no u64 wraparound), and the final fold+subtract is exact for ANY
    u64 value (fold result < 2^61 + 8, one conditional subtract lands < p).
    In-place ops hold peak temporaries to ~3 chunk-sized arrays.
    ``a_hi``/``a_lo``/``b`` are pre-split (1, P) rows.
    """
    h = h.astype(np.uint64)
    h = ((h >> _U61) + (h & _P61))[:, None]  # ≤ p + 7 (no subtract needed)
    h_hi = h >> _U32  # < 2^29 + 1
    h_lo = h & _LO32
    r1 = a_hi * h_hi  # < 2^58 + 2^29
    r1 <<= _U3  # ·2^64 ≡ ·8 : < 2^61 + 2^32      ≈ p
    mid = a_hi * h_lo
    mid += a_lo * h_hi  # < 2^62 + 2^61
    r2 = mid & _LO29
    r2 <<= _U32  # (x & (2^29-1))·2^32 : < 2^61
    mid >>= _U29
    r2 += mid  # + (x >> 29) : < 2^61 + 2^34       ≈ p
    r3 = a_lo * h_lo  # < 2^64
    hi = r3 >> _U61
    r3 &= _P61
    r3 += hi  # < 2^61 + 8                          ≈ p
    r1 += r2
    r1 += r3
    # total ≤ (2^61+2^32) + (2^61+2^34) + (2^61+8) + (p-1): may slightly
    # exceed 2^63 but stays well under 2^64 — no wraparound, and the fold
    # below is exact for any u64 input
    r1 += b
    hi = r1 >> _U61
    r1 &= _P61
    r1 += hi  # < 2^61 + 8
    np.subtract(r1, _P61, out=r1, where=r1 >= _P61)
    return r1


def _mulmod61(h: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(h[:, None]·a + b) mod (2^61-1), pure uint64 — bit-identical to the
    Python-bigint formula but ~two orders of magnitude faster.

    Split multiply: with h' = h mod p written h_hi·2^32 + h_lo and
    a = a_hi·2^32 + a_lo (a < p), the product is
    a_hi·h_hi·2^64 + (a_hi·h_lo + a_lo·h_hi)·2^32 + a_lo·h_lo, and
    2^61 ≡ 1 (mod p) collapses every term into u64 range:
    2^64 ≡ 8, and x·2^32 ≡ (x >> 29) + (x & (2^29-1))·2^32 for x < p.
    """
    h = _mod61(h.astype(np.uint64))[:, None]  # < p
    a = a.astype(np.uint64)[None, :]
    h_hi, h_lo = h >> np.uint64(32), h & _LO32  # < 2^29 / < 2^32
    a_hi, a_lo = a >> np.uint64(32), a & _LO32
    # term 1: a_hi·h_hi·2^64 ≡ a_hi·h_hi·8   (< 2^61)
    r1 = _mod61((a_hi * h_hi) << np.uint64(3))
    # term 2: (a_hi·h_lo + a_lo·h_hi)·2^32   (sum < 2^62)
    mid = _mod61(a_hi * h_lo + a_lo * h_hi)  # < p
    r2 = _mod61((mid >> np.uint64(29)) + ((mid & _LO29) << np.uint64(32)))
    # term 3: a_lo·h_lo                      (< 2^64)
    r3 = _mod61(a_lo * h_lo)
    # r1..r3 < p, b < p → total < 4p < 2^63
    return _mod61(r1 + r2 + r3 + b.astype(np.uint64)[None, :])


def add_text_hash(ds, text_col: str = "text", out_col: str = "text_hash"):
    """Append the md5 hex digest of the text (matches DuckDB's ``md5()``)."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        h = [hashlib.md5((t or "").encode()).hexdigest() for t in texts]
        return batch.append_column(out_col, pa.array(h, pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def exact_dedup(ds, id_col: str = "doc_id", text_col: str = "text", n_parts: int = 64):
    """Exact dedup groups → (text_hash, keep_id, n_dups), keep_id = min id.

    text_hash is an unbounded key domain, so the combine follows the
    engine-wide bounded-group rule (see ``stages/grouping.py``): an Arrow
    ``group_by`` partial per batch (min id + count — the shuffle ships one
    short row per distinct hash per batch, never raw texts), then a
    hash-partitioned final whose per-partition merge is ONE C-level pandas
    groupby. A raw ``Dataset.groupby(hash).aggregate`` pays Ray's per-group
    machinery per DISTINCT TEXT (measured: 5k mostly-unique docs → ~1 s of
    aggregate wall for ~35 ms of useful work).
    """
    hashed = add_text_hash(ds, text_col).select_columns(["text_hash", id_col])

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        g = t.group_by("text_hash").aggregate([(id_col, "min"), (id_col, "count")])
        return pa.table(
            {
                "text_hash": g.column("text_hash"),
                "keep_id": g.column(f"{id_col}_min"),
                "n_dups": pc.cast(g.column(f"{id_col}_count"), pa.int64()),
            }
        )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.groupby("text_hash", sort=False)
            .agg(keep_id=("keep_id", "min"), n_dups=("n_dups", "sum"))
            .reset_index()
        )

    parts = hashed.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return partitioned_map_groups(parts, "text_hash", final, n_parts=n_parts)


# ── MinHash + LSH ────────────────────────────────────────────────────────

#: fixed multiplier of the shingle-window polynomial (seeded from a domain
#: string, reduced < p; ``or 1`` guards the 2^-61 zero case)
_SHINGLE_A = np.uint64(_blake_u64(b"geodistpy-ray/shingle-poly") % _MERSENNE or 1)
_A_COL = np.array([_SHINGLE_A], dtype=np.uint64)
_ZERO_COL = np.zeros(1, dtype=np.uint64)
#: the one shingle of an empty document (hash of the empty token window)
_EMPTY_SHINGLE = np.uint64(_blake_u64(b"") % _MERSENNE)


def _poly_step(acc: np.ndarray, nxt: np.ndarray) -> np.ndarray:
    """One Horner step of the shingle polynomial: (acc·A + nxt) mod p."""
    return _mod61(_mulmod61(acc, _A_COL, _ZERO_COL)[:, 0] + _mod61(nxt.astype(np.uint64)))


def _token_hash_stream(texts, token_cache: dict | None = None):
    """Tokenize + hash a whole batch → (flat FULL-64-bit blake token hashes,
    per-doc token counts). The shared Arrow front-end for MinHash shingling
    and SimHash: ``utf8_lower`` + ``utf8_split_whitespace`` (empty edge
    tokens masked), ``dictionary_encode`` to a batch vocabulary, one blake2b
    per UNIQUE token (optionally memoized across batches via
    ``token_cache``), then a single gather back to occurrence order.

    ``texts`` may be a Python sequence of (optionally None) strings or a
    pyarrow string Array/ChunkedArray (zero-copy from a batch column).
    """
    if isinstance(texts, pa.ChunkedArray):
        arr = texts.combine_chunks()
    elif isinstance(texts, pa.Array):
        arr = texts
    else:
        arr = pa.array(list(texts), type=pa.string())
    import pyarrow.compute as pc

    arr = pc.fill_null(arr, "")
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64)
    toks = pc.utf8_split_whitespace(pc.utf8_lower(arr))
    flat = pc.list_flatten(toks)
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
    counts = np.bincount(doc_idx[nonempty], minlength=n).astype(np.int64)
    flat = flat.filter(pa.array(nonempty))
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    if len(flat) == 0:
        return np.empty(0, dtype=np.uint64), counts
    de = pc.dictionary_encode(flat)
    idx = de.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = de.dictionary.to_pylist()
    h_uniq = np.empty(len(vocab), dtype=np.uint64)
    if token_cache is None:
        for i, t in enumerate(vocab):
            h_uniq[i] = _blake_u64(t.encode())
    else:
        get = token_cache.get
        for i, t in enumerate(vocab):
            h = get(t)
            if h is None:
                h = _blake_u64(t.encode())
                token_cache[t] = h
            h_uniq[i] = h
    return h_uniq[idx], counts


def _shingle_hashes_batch(texts, shingle: int, token_cache: dict | None = None):
    """Shingle hashes for a whole batch → (flat uint64 hashes, per-doc counts).

    The vectorized front-end (round 3 — this was the MinHash throughput
    ceiling as a per-doc Python loop doing one blake2b per shingle STRING):

    1. tokenize + lowercase with two Arrow kernels (``utf8_lower`` +
       ``utf8_split_whitespace``; Arrow emits empty tokens at whitespace
       edges, masked out below);
    2. ``dictionary_encode`` maps every token occurrence to a batch-unique
       vocabulary id (C-level hashing); each UNIQUE token is blake2b-hashed
       once — optionally memoized across batches via ``token_cache``;
    3. each k-gram shingle hash is a mod-(2^61-1) Horner polynomial over
       the k token hashes in its window, computed with ``shingle-1``
       vectorized passes over the flat token-hash array — no per-shingle
       strings, no per-shingle digests.

    Signature-definition change vs round 2 (which blake-hashed the joined
    shingle string): both are uniform 61-bit fingerprints of the token
    window, so Jaccard/recall behavior is identical; only raw values differ
    (the pinned-parity tests assert batch == scalar == bigint formula, not
    historical constants). Per-doc semantics preserved: an empty doc gets
    one constant hash, a doc with 0 < m < shingle tokens gets one hash over
    all m tokens, otherwise m-shingle+1 window hashes (duplicate windows
    retained — min() and set() consumers are insensitive to them).

    ``texts`` may be a Python sequence of (optionally None) strings or a
    pyarrow string Array/ChunkedArray (zero-copy from a batch column).
    """
    h_full, counts = _token_hash_stream(texts, token_cache)
    n = counts.size
    if n == 0:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64)
    T = h_full.size

    n_sh = np.where(counts == 0, 1, np.maximum(counts - shingle + 1, 1)).astype(np.int64)
    out = np.empty(int(n_sh.sum()), dtype=np.uint64)
    out_starts = np.concatenate(([0], np.cumsum(n_sh)[:-1]))

    if T:
        h_flat = _mod61(h_full)  # reduce the full blake hashes < p once
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))

        # full windows: shingle-1 Horner passes over the whole flat array,
        # then gather only the starts whose window stays inside one doc
        W = T - shingle + 1
        if W > 0:
            acc = h_flat[:W].copy()
            for j in range(1, shingle):
                acc = _poly_step(acc, h_flat[j : j + W])
            full = np.flatnonzero(counts >= shingle)
            if full.size:
                m_full = counts[full] - shingle + 1
                tot = int(m_full.sum())
                base_in = np.repeat(starts[full], m_full)
                base_out = np.repeat(out_starts[full], m_full)
                ramp = np.arange(tot, dtype=np.int64) - np.repeat(
                    np.cumsum(m_full) - m_full, m_full
                )
                out[base_out + ramp] = acc[base_in + ramp]

        # short docs (0 < m < shingle): one polynomial over all m tokens,
        # vectorized per distinct m (at most shingle-1 tiny passes)
        short = np.flatnonzero((counts > 0) & (counts < shingle))
        for m in range(1, shingle):
            sel = short[counts[short] == m]
            if sel.size == 0:
                continue
            st = starts[sel]
            acc_s = h_flat[st].copy()
            for j in range(1, m):
                acc_s = _poly_step(acc_s, h_flat[st + j])
            out[out_starts[sel]] = acc_s

    out[out_starts[counts == 0]] = _EMPTY_SHINGLE
    return out, n_sh


def _shingle_hashes(text: str, shingle: int) -> np.ndarray:
    """Single-doc wrapper over :func:`_shingle_hashes_batch` (same values)."""
    flat, _ = _shingle_hashes_batch([text], shingle)
    return flat


#: OPH empty-bin sentinel — strictly above every 61-bit shingle hash
_OPH_EMPTY = np.uint64(1 << 61)
#: rotation-densification offset constant (odd, golden-ratio mix)
_OPH_ROT_C = np.uint64(0x9E3779B97F4A7C15)


class MinHasher:
    """Per-actor state: seeded coefficients + token-hash memo, built once.

    Two signature schemes:

    - ``scheme="oph"`` (default, the 100 TB path): **one-permutation
      hashing** (Li, Owen, Zhang, NIPS 2012) with **rotation densification**
      (Shrivastava & Li, ICML 2014). Each shingle hash is range-mapped to
      one of ``num_perm`` bins and the signature slot is the min hash in
      its bin; empty bins borrow circularly from the next non-empty bin
      with a distance-scaled offset. Cost is O(shingles) per doc — the
      classic scheme's O(shingles × num_perm) permutation matrix drops out
      entirely (measured ~6× end-to-end at num_perm=128).
    - ``scheme="classic"``: one (a·h + b) mod (2^61-1) permutation per
      slot, bit-identical to the Python-bigint formula (the
      oracle-verifiable reference scheme, kept for parity tests and as the
      lowest-variance estimator).

    Both schemes share the vectorized shingle front-end and the band-key
    LSH downstream; collision probability per slot ≈ Jaccard under either.
    """

    #: shingle-row budget per (rows × num_perm) uint64 intermediate. Small on
    #: purpose: 256×128×8 B = 256 KB temporaries stay cache-resident — the
    #: kernel is memory-bound, and 64k-row chunks measured 7× SLOWER.
    CHUNK_ROWS = 256

    #: cross-batch token→hash memo cap — Zipf vocabularies re-hit the same
    #: head tokens every batch, but web-scale vocab is unbounded (ids,
    #: typos), so the memo clears wholesale past the cap (~100 MB) rather
    #: than growing with the corpus
    TOKEN_CACHE_MAX = 1_000_000

    def __init__(
        self,
        num_perm: int = 128,
        shingle: int = 3,
        seed: int = 1234,
        scheme: str = "oph",
    ):
        if scheme not in ("oph", "classic"):
            raise ValueError(f"scheme must be 'oph' or 'classic', got {scheme!r}")
        self.scheme = scheme
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        # pre-split rows for the lazy-reduction kernel
        self._a_hi = (self.a >> _U32)[None, :]
        self._a_lo = (self.a & _LO32)[None, :]
        self._b_row = self.b[None, :]
        self.num_perm = num_perm
        self.shingle = shingle
        self._token_cache: dict[str, int] = {}

    def signature(self, text: str) -> np.ndarray:
        if self.scheme == "oph":
            return self.signatures([text])[0]
        h = _shingle_hashes(text, self.shingle)
        return np.min(_mulmod61(h, self.a, self.b), axis=0).astype(np.uint64)

    def _oph_signatures(self, flat: np.ndarray, counts: np.ndarray) -> np.ndarray:
        """One-permutation signatures from the flat shingle-hash stream.

        bin(h) = ((h >> 29) · num_perm) >> 32 — an overflow-safe
        multiply-shift range map of the hash's top 32 bits, uniform for any
        ``num_perm`` (no power-of-2 requirement); slot value = min h in the
        bin. One argsort of (doc, bin) keys + ``np.minimum.reduceat`` fills
        the whole batch's matrix; densification is the ICML'14 rotation:
        an empty slot j takes the next non-empty slot's value (circular)
        plus ``t · C`` for distance t, so distinct empty patterns cannot
        manufacture spurious slot agreement.
        """
        n = counts.size
        k = self.num_perm
        bins = ((flat >> np.uint64(29)) * np.uint64(k)) >> np.uint64(32)
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
        key = doc_idx * k + bins.astype(np.int64)
        order = np.argsort(key, kind="stable")
        sk = key[order]
        sv = flat[order]
        rs = np.concatenate(([0], np.flatnonzero(sk[1:] != sk[:-1]) + 1))
        M = np.full(n * k, _OPH_EMPTY, dtype=np.uint64)
        M[sk[rs]] = np.minimum.reduceat(sv, rs)
        M = M.reshape(n, k)
        filled = M != _OPH_EMPTY
        # nearest filled slot at index >= j, circular: two backward sweeps
        # (every doc has >= 1 shingle, so every row has a filled slot)
        nxt = np.empty((n, k), dtype=np.int64)
        last = np.full(n, -1, dtype=np.int64)
        for _ in range(2):
            for j in range(k - 1, -1, -1):
                last = np.where(filled[:, j], j, last)
                nxt[:, j] = last
        t = (nxt - np.arange(k, dtype=np.int64)[None, :]) % k
        return M[np.arange(n)[:, None], nxt] + t.astype(np.uint64) * _OPH_ROT_C

    def signatures(self, texts) -> np.ndarray:
        """(len(texts), num_perm) signature matrix — whole-batch vectorized.

        The shingle front-end (:func:`_shingle_hashes_batch`) returns one
        flat hash array with per-doc counts; the permutation matrix is
        computed in doc-aligned chunks of ≤ CHUNK_ROWS shingles (bounded
        peak memory), and ``np.minimum.reduceat`` collapses each doc's rows
        to its signature.
        """
        n = len(texts)
        if n == 0:
            return np.empty((0, self.num_perm), dtype=np.uint64)
        if len(self._token_cache) > self.TOKEN_CACHE_MAX:
            self._token_cache.clear()
        flat, counts = _shingle_hashes_batch(texts, self.shingle, self._token_cache)
        if self.scheme == "oph":
            return self._oph_signatures(flat, counts)
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        out = np.empty((n, self.num_perm), dtype=np.uint64)
        doc_lo = 0
        while doc_lo < n:
            # grow the chunk doc-by-doc up to the row budget (≥ 1 doc always)
            doc_hi = doc_lo + 1
            rows = counts[doc_lo]
            while doc_hi < n and rows + counts[doc_hi] <= self.CHUNK_ROWS:
                rows += counts[doc_hi]
                doc_hi += 1
            lo, hi = starts[doc_lo], starts[doc_lo] + rows
            if doc_hi == doc_lo + 1 and rows > self.CHUNK_ROWS:
                # ONE doc bigger than the whole row budget: min is
                # associative, so fold sub-chunks instead of materializing
                # a (rows × num_perm) matrix for the giant doc (an 8 MB
                # document would otherwise allocate ~1 GB here)
                sig = np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
                for c0 in range(lo, hi, self.CHUNK_ROWS):
                    perm = _mulmod61_lazy(
                        flat[c0 : min(c0 + self.CHUNK_ROWS, hi)],
                        self._a_hi, self._a_lo, self._b_row,
                    )
                    np.minimum(sig, perm.min(axis=0), out=sig)
                out[doc_lo] = sig
            else:
                perm = _mulmod61_lazy(flat[lo:hi], self._a_hi, self._a_lo, self._b_row)
                out[doc_lo:doc_hi] = np.minimum.reduceat(
                    perm, starts[doc_lo:doc_hi] - lo, axis=0
                )
            doc_lo = doc_hi
        return out


class MinHashBandEmitter:
    """map_batches actor: text → LSH band rows (band_key, doc_id)."""

    def __init__(
        self,
        id_col: str,
        num_perm: int,
        bands: int,
        shingle: int,
        seed: int,
        scheme: str = "oph",
    ):
        assert num_perm % bands == 0
        self.hasher = MinHasher(num_perm, shingle, seed, scheme=scheme)
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.id_col = id_col
        # seeded coefficients for the vectorized band-key polynomial (one
        # (a, b) pair per signature slot so equal chunks ⇒ equal keys and
        # unequal chunks collide with ~2^-61 probability)
        rng = np.random.default_rng(seed + 777)
        self.key_a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.key_b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)

    def _band_keys(self, sig: np.ndarray) -> np.ndarray:
        """(D, bands) int64 bucket keys — a mod-Mersenne polynomial over each
        band's signature slots (vectorized; no per-doc digest calls)."""
        d = sig.shape[0]
        keys = np.empty((d, self.bands), dtype=np.int64)
        for b in range(self.bands):
            lo = b * self.rows_per_band
            acc = np.full(d, np.uint64(b + 1))
            for j in range(lo, lo + self.rows_per_band):
                # acc = (acc * a_j + b_j + slot_value) mod p, all vectorized
                acc = _mulmod61(acc, self.key_a[j : j + 1], self.key_b[j : j + 1])[:, 0]
                acc = _mod61(acc + _mod61(sig[:, j]))
            keys[:, b] = acc.astype(np.int64)
        return keys

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy()
        sig = self.hasher.signatures(batch.column("text"))  # zero-copy Arrow in
        if sig.shape[0] == 0:
            return pa.table(
                {"band_key": pa.array([], pa.int64()), self.id_col: pa.array([], pa.int64())}
            )
        keys = self._band_keys(sig)
        return pa.table(
            {
                "band_key": keys.ravel(),
                self.id_col: np.repeat(ids, self.bands),
            }
        )


_DEFAULT_MAX_BUCKET = 20_000


def _guard_bucket(size: int, cap, where: str) -> None:
    """Refuse O(size²) pair emission for a mega-bucket. A cluster of
    near-identical documents collides in EVERY band, so its bucket grows
    with the duplicate count and triu_indices allocates size²/2 pairs in
    one task (100k identical docs → ~5e9 pairs, ~80 GB) — the loud failure
    beats an OOM. Exact dedup first collapses identical docs to one id;
    ``max_bucket=None`` disables the guard for callers that accept the
    cost."""
    if cap is not None and size > cap:
        raise ValueError(
            f"{where}: a candidate bucket holds {size} ids "
            f"(> max_bucket={cap}) — a near-identical mega-cluster collides "
            "in every band and its O(size²) pair emission would dominate; "
            "run exact dedup first to collapse identical docs, or pass a "
            "larger max_bucket (None disables the guard)"
        )


def _bucket_pairs_partitioned(
    band_rows, key_col: str, id_col: str, n_parts: int = 64,
    max_bucket: int | None = _DEFAULT_MAX_BUCKET,
):
    """Distinct unordered id pairs per equal-key bucket → (id_a, id_b).

    One ``groupby`` on the hash partition (``n_parts`` groups total, via the
    shared :func:`~.grouping.partitioned_map_groups`); inside a partition,
    every bucket's pairs come from one sorted sweep — no per-bucket task or
    frame overhead. Bucket sizes are bounded by the LSH design only for
    corpora WITHOUT mega-duplicate clusters — ``max_bucket`` guards the
    rest (see :func:`_guard_bucket`).
    """
    def pairs_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, id_col])
        keys = g[key_col].to_numpy()
        ids = g[id_col].to_numpy()
        out_a, out_b = [], []
        if keys.size:
            for s, e in zip(*key_spans(keys, min_size=2)):
                u = np.unique(ids[s:e])
                if u.size < 2:
                    continue
                _guard_bucket(u.size, max_bucket, "minhash/LSH bucket pairs")
                ii, jj = np.triu_indices(u.size, k=1)
                out_a.append(u[ii])
                out_b.append(u[jj])
        if not out_a:
            return pd.DataFrame(
                {"id_a": pd.Series(dtype=np.int64), "id_b": pd.Series(dtype=np.int64)}
            )
        return pd.DataFrame({"id_a": np.concatenate(out_a), "id_b": np.concatenate(out_b)})

    return partitioned_map_groups(band_rows, key_col, pairs_part, n_parts=n_parts)


def _full_window_hashes(
    texts, shingle: int, token_cache: dict | None = None, with_starts: bool = False
):
    """FULL k-gram window hashes only → (doc_idx, uint64 hashes), plus each
    window's in-document start position (an index into the doc's
    empty-filtered token stream) when ``with_starts=True``.

    Same token-hash stream and Horner polynomial as
    :func:`_shingle_hashes_batch`, but documents with fewer than ``shingle``
    tokens emit NOTHING (no short-doc or empty-doc sentinel hashes) — the
    semantics decontamination needs, where a doc shorter than the n-gram
    cannot contain a full n-gram, and exactly what a SQL mirror built from
    ``LEAD(tok, shingle-1) IS NOT NULL`` produces.
    """
    h_full, counts = _token_hash_stream(texts, token_cache)
    T = h_full.size
    W = T - shingle + 1
    full = np.flatnonzero(counts >= shingle)
    if counts.size == 0 or W <= 0 or full.size == 0:
        empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.uint64))
        return empty + (np.empty(0, dtype=np.int64),) if with_starts else empty
    h_flat = _mod61(h_full)
    acc = h_flat[:W].copy()
    for j in range(1, shingle):
        acc = _poly_step(acc, h_flat[j : j + W])
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    m_full = counts[full] - shingle + 1
    tot = int(m_full.sum())
    base_in = np.repeat(starts[full], m_full)
    ramp = np.arange(tot, dtype=np.int64) - np.repeat(np.cumsum(m_full) - m_full, m_full)
    out = (np.repeat(full, m_full), acc[base_in + ramp])
    return out + (ramp,) if with_starts else out


def benchmark_shingle_set(
    bench_ds, text_col: str = "text", shingle: int = 5, max_hashes: int = 50_000_000
) -> np.ndarray:
    """Distinct full-window shingle hashes of a benchmark/eval corpus →
    sorted uint64 array (the broadcast side of decontamination).

    The benchmark side is SMALL by nature (an eval suite, not the training
    corpus) — it is the canonical ``ray.put`` broadcast operand. Streamed
    batch-by-batch with per-batch dedup; ``max_hashes`` guards the driver
    against misuse with an unbounded corpus (the error points the caller at
    swapping the sides: check the small set against the big one, never
    collect the big one)."""
    chunks = []
    total = 0
    for batch in bench_ds.select_columns([text_col]).iter_batches(
        batch_format="pyarrow", batch_size=4096
    ):
        _, h = _full_window_hashes(batch.column(text_col), shingle)
        if h.size:
            h = np.unique(h)
            total += h.size
            if total > max_hashes:
                raise ValueError(
                    f"benchmark_shingle_set: >{max_hashes} distinct shingle hashes; "
                    "the benchmark side must be the small one — broadcast it and "
                    "stream the corpus, never the reverse"
                )
            chunks.append(h)
    if not chunks:
        return np.empty(0, dtype=np.uint64)
    return np.unique(np.concatenate(chunks))


def contamination_hits(
    ds,
    bench_ds=None,
    *,
    bench_hashes: np.ndarray | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle: int = 5,
):
    """Benchmark decontamination → Dataset (id, n_hits): for each corpus
    document, the number of DISTINCT full ``shingle``-gram token windows it
    shares with the benchmark set (docs with zero hits are dropped — the
    common downstream is an anti-join removing contaminated docs).

    Scale shape: the benchmark shingle-hash set is broadcast once
    (``ray.put`` + per-worker cache); the corpus streams through one
    ``map_batches`` pass — tokenize, Horner window hashes, one
    ``searchsorted`` membership probe, per-doc distinct count via lexsort —
    NO shuffle at any input size. Matching is on 61-bit window fingerprints;
    a false hit needs a polynomial collision (~2⁻⁶¹ pairwise).

    Pass either ``bench_ds`` (collected + broadcast here) or a precomputed
    sorted ``bench_hashes`` from :func:`benchmark_shingle_set`.
    """
    import ray

    if bench_hashes is None:
        if bench_ds is None:
            raise ValueError("contamination_hits: pass bench_ds or bench_hashes")
        bench_hashes = benchmark_shingle_set(bench_ds, text_col=text_col, shingle=shingle)
    ref = ray.put(np.ascontiguousarray(np.asarray(bench_hashes, dtype=np.uint64)))

    def fn(batch: pa.Table) -> pa.Table:
        from .broadcast import get_broadcast

        id_type = batch.schema.field(id_col).type
        empty = pa.table(
            {id_col: pa.array([], id_type), "n_hits": pa.array([], pa.int64())}
        )
        bh = get_broadcast(ref)
        if batch.num_rows == 0 or bh.size == 0:
            return empty
        doc_idx, hashes = _full_window_hashes(batch.column(text_col), shingle)
        if hashes.size == 0:
            return empty
        pos = np.searchsorted(bh, hashes)
        pos_c = np.minimum(pos, bh.size - 1)
        hit = bh[pos_c] == hashes
        d, h = doc_idx[hit], hashes[hit]
        if d.size == 0:
            return empty
        order = np.lexsort((h, d))
        d, h = d[order], h[order]
        first = np.ones(d.size, dtype=bool)
        first[1:] = (d[1:] != d[:-1]) | (h[1:] != h[:-1])
        docs, n_hits = np.unique(d[first], return_counts=True)
        return pa.table(
            {
                id_col: batch.column(id_col).take(pa.array(docs)),
                "n_hits": pa.array(n_hits.astype(np.int64), pa.int64()),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


def shingle_overlap_pairs(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle: int = 4,
    min_common: int = 2,
    n_parts: int = 64,
    max_df: int | None = None,
    max_bucket: int | None = _DEFAULT_MAX_BUCKET,
):
    """Distributed n-gram-overlap dedup join → Dataset
    (id_a, id_b, n_common): unordered doc pairs sharing at least
    ``min_common`` DISTINCT full ``shingle``-gram token windows, with the
    exact shared-window count. The scale form of the scalar
    :func:`ngram_jaccard` numerator — and, unlike MinHash/SimHash, exact
    and SQL-mirrorable (a self-join on shingle strings).

    Scale shape: two bounded shuffles, both via
    :func:`~.grouping.partitioned_map_groups` (never per-key groups).

    1. one streaming pass emits distinct ``(window_hash, id)`` rows
       (61-bit Horner fingerprints from the shared tokenize front-end);
    2. hash-partition by window hash; inside a partition one sorted sweep
       emits each window's doc pairs, PRE-AGGREGATED to per-pair partial
       counts before leaving the partition;
    3. hash-partition by (id_a, id_b); sum partials, keep ``>= min_common``.

    ``max_df`` (document-frequency cap) drops windows occurring in more
    than that many docs before pair expansion — the production stop-shingle
    guard against the O(df²) blowup of boilerplate n-grams. Default None so
    the result stays bit-identical to the SQL mirror; at corpus scale set
    it (a window shared by thousands of docs carries no dedup signal).
    """

    def emit(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"window_hash": pa.array([], pa.int64()), id_col: pa.array([], pa.int64())}
        )
        if batch.num_rows == 0:
            return empty
        doc_idx, hashes = _full_window_hashes(batch.column(text_col), shingle)
        if hashes.size == 0:
            return empty
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)[doc_idx]
        # distinct (doc, window) — each doc lives in one row of one batch,
        # so batch-local dedup is global dedup
        h = hashes.astype(np.int64)  # 61-bit values: exact in int64
        order = np.lexsort((h, ids))
        ids, h = ids[order], h[order]
        first = np.ones(ids.size, dtype=bool)
        first[1:] = (ids[1:] != ids[:-1]) | (h[1:] != h[:-1])
        return pa.table(
            {"window_hash": pa.array(h[first]), id_col: pa.array(ids[first])}
        )

    rows = ds.select_columns([id_col, text_col]).map_batches(
        emit, batch_format="pyarrow", zero_copy_batch=True
    )

    def pairs_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["window_hash", id_col])
        keys = g["window_hash"].to_numpy()
        ids = g[id_col].to_numpy()
        out_a, out_b = [], []
        if keys.size:
            for s, e in zip(*key_spans(keys, min_size=2)):
                span = ids[s:e]  # already distinct per window (stage 1)
                if max_df is not None and span.size > max_df:
                    continue
                # max_df SKIPS common windows by design; without it, a
                # boilerplate window shared by 100k docs must refuse the
                # O(df²) expansion loudly (same guard as the LSH sweeps)
                _guard_bucket(span.size, max_bucket, "shingle window pairs")
                ii, jj = np.triu_indices(span.size, k=1)
                out_a.append(span[ii])
                out_b.append(span[jj])
        if not out_a:
            return pd.DataFrame(
                {
                    "id_a": pd.Series(dtype=np.int64),
                    "id_b": pd.Series(dtype=np.int64),
                    "n_common": pd.Series(dtype=np.int64),
                }
            )
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        # pre-aggregate per pair inside the partition: ship one row per
        # (pair, partition), not one per shared window
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        new = np.ones(a.size, dtype=bool)
        new[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, a.size))
        return pd.DataFrame(
            {"id_a": a[starts], "id_b": b[starts], "n_common": counts.astype(np.int64)}
        )

    partials = partitioned_map_groups(rows, "window_hash", pairs_part, n_parts=n_parts)

    def sum_part(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["id_a", "id_b"], as_index=False, sort=False)["n_common"].sum()
        return agg[agg["n_common"] >= min_common]

    return partitioned_map_groups(partials, ["id_a", "id_b"], sum_part, n_parts=n_parts)


def distinct_window_counts(ds, id_col: str = "doc_id", text_col: str = "text", shingle: int = 4):
    """Per-doc DISTINCT full-window count → Dataset (id, n_windows) — the
    Jaccard denominator legs for :func:`shingle_overlap_pairs`. Batch-local
    (each doc lives in one row of one batch, so batch dedup is global
    dedup), same tokenize front-end and 61-bit fingerprints as the pair
    join. Docs with no full window emit no row (they join no pair)."""

    def fn(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {id_col: pa.array([], pa.int64()), "n_windows": pa.array([], pa.int64())}
        )
        if batch.num_rows == 0:
            return empty
        doc_idx, hashes = _full_window_hashes(batch.column(text_col), shingle)
        if hashes.size == 0:
            return empty
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)[doc_idx]
        h = hashes.astype(np.int64)
        order = np.lexsort((h, ids))
        ids, h = ids[order], h[order]
        first = np.ones(ids.size, dtype=bool)
        first[1:] = (ids[1:] != ids[:-1]) | (h[1:] != h[:-1])
        ids = ids[first]
        starts, ends = key_spans(ids)
        return pa.table(
            {
                id_col: pa.array(ids[starts]),
                "n_windows": pa.array((ends - starts).astype(np.int64)),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


def jaccard_pair_join(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle: int = 4,
    threshold: float = 0.2,
    n_parts: int = 64,
    max_df: int | None = None,
    max_bucket: int | None = _DEFAULT_MAX_BUCKET,
):
    """Exact n-gram JACCARD similarity join → Dataset (id_a, id_b,
    n_common, jaccard) for unordered doc pairs with
    ``|A∩B| / |A∪B| >= threshold`` over distinct ``shingle``-gram windows.

    The threshold twin of :func:`shingle_overlap_pairs` (which gates on the
    raw intersection count): the overlap pairs supply the numerator, two
    bucketed joins attach each side's distinct-window count, and the
    division is exact integer→float64 arithmetic (bit-identical in SQL, no
    rounding convention needed). All exchanges hash-partitioned; the pair
    side is O(overlapping pairs), not O(corpus)."""
    from .joins import shuffle_equi_join

    pairs = shingle_overlap_pairs(
        ds, id_col=id_col, text_col=text_col, shingle=shingle,
        min_common=1, n_parts=n_parts, max_df=max_df, max_bucket=max_bucket,
    )
    counts = distinct_window_counts(ds, id_col=id_col, text_col=text_col, shingle=shingle)

    def rn(new_id, new_n):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.rename_columns([new_id, new_n])

        return fn

    ca = counts.map_batches(rn("id_a", "n_a"), batch_format="pyarrow", zero_copy_batch=True)
    cb = counts.map_batches(rn("id_b", "n_b"), batch_format="pyarrow", zero_copy_batch=True)
    j = shuffle_equi_join(pairs, ca, "id_a", n_buckets=min(n_parts, 64))
    j = shuffle_equi_join(j, cb, "id_b", n_buckets=min(n_parts, 64))

    def score(batch: pa.Table) -> pa.Table:
        nc = batch.column("n_common").to_numpy(zero_copy_only=False).astype(np.float64)
        na = batch.column("n_a").to_numpy(zero_copy_only=False).astype(np.float64)
        nb = batch.column("n_b").to_numpy(zero_copy_only=False).astype(np.float64)
        jac = nc / (na + nb - nc)
        out = pa.table(
            {
                "id_a": batch.column("id_a"),
                "id_b": batch.column("id_b"),
                "n_common": batch.column("n_common"),
                "jaccard": pa.array(jac, pa.float64()),
            }
        )
        return out.filter(pa.array(jac >= threshold))

    return j.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def ngram_jaccard(text_a: str, text_b: str, shingle: int = 3) -> float:
    """Exact n-gram Jaccard similarity between two texts."""
    sa = set(_shingle_hashes(text_a, shingle).tolist())
    sb = set(_shingle_hashes(text_b, shingle).tolist())
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)


def minhash_lsh_pairs(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 128,
    bands: int = 32,
    shingle: int = 3,
    threshold: float = 0.5,
    seed: int = 1234,
    concurrency: int | tuple[int, int] = (1, 4),
    scheme: str = "oph",
    max_bucket: int | None = _DEFAULT_MAX_BUCKET,
):
    """Near-duplicate pairs via MinHash+LSH → Dataset (id_a, id_b, jaccard).

    ``scheme`` picks the signature algorithm (see :class:`MinHasher`):
    one-permutation hashing by default, ``"classic"`` for the per-slot
    permutation reference. Candidate quality is pinned for BOTH in
    ``scripts/recall_bench.py`` / ``tests/test_dedup_text.py``; the final
    exact-Jaccard verification step makes precision scheme-independent.

    Pipeline — every step distributed; nothing materializes on the driver:

    1. band rows → ``groupby(band_key)``: each bucket emits its id pairs
       (the only quadratic step, bounded per bucket by the LSH design);
    2. :func:`~.relational.distinct` shuffle-dedups pairs found in several
       bands (a near-dup pair typically collides in many);
    3. two :func:`~.joins.shuffle_equi_join` passes attach ``text_a`` /
       ``text_b`` to each pair — shuffle volume is proportional to the
       CANDIDATE count, not the corpus;
    4. a final ``map_batches`` verifies exact n-gram Jaccard per pair (texts
       memoized per batch — boilerplate-heavy buckets repeat texts).
    """
    import ray.data as rd

    from .joins import shuffle_equi_join
    from .relational import distinct

    if text_col != "text":
        ds = ds.select_columns([id_col, text_col]).rename_columns(
            {text_col: "text", id_col: id_col}
        )
    texts_ds = ds.select_columns([id_col, "text"])
    band_rows = texts_ds.map_batches(
        MinHashBandEmitter,
        fn_constructor_kwargs={
            "id_col": id_col,
            "num_perm": num_perm,
            "bands": bands,
            "shingle": shingle,
            "seed": seed,
            "scheme": scheme,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
    )

    # Bucket pair generation groups on a HASH PARTITION of band_key, not on
    # band_key itself: most buckets are singletons, and Ray's map_groups
    # pays ~4 ms per group — one group per band key turns a 500-doc corpus
    # into a minute of fixed overhead. Each partition emits every bucket's
    # pairs with one vectorized sweep over its sorted (band_key, id) rows.
    cand = _bucket_pairs_partitioned(band_rows, "band_key", id_col, max_bucket=max_bucket)
    # materialize the (small) deduped pair set once: it feeds two joins, and
    # the empty-result guard below must not re-execute the band shuffle
    cand = distinct(cand, ["id_a", "id_b"]).materialize()
    empty = rd.from_arrow(
        pa.table(
            {
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                "jaccard": pa.array([], pa.float64()),
            }
        )
    )
    if cand.count() == 0:
        return empty

    def _renamed(col: str):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.rename_columns([id_col, col])

        return texts_ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)

    with_a = shuffle_equi_join(
        cand, _renamed("text_a"), left_key="id_a", right_key=id_col, n_buckets=16
    )
    with_b = shuffle_equi_join(
        with_a, _renamed("text_b"), left_key="id_b", right_key=id_col, n_buckets=16
    )

    def verify(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "id_a": pa.array([], pa.int64()),
                    "id_b": pa.array([], pa.int64()),
                    "jaccard": pa.array([], pa.float64()),
                }
            )
        ta = batch.column("text_a").to_pylist()
        tb = batch.column("text_b").to_pylist()
        # ONE batch front-end call over the distinct texts of both sides
        # (boilerplate-heavy buckets repeat texts), then set ops per pair
        uniq = list(dict.fromkeys((x or "" for x in ta + tb)))
        flat, cnts = _shingle_hashes_batch(uniq, shingle)
        st = np.concatenate(([0], np.cumsum(cnts)[:-1]))
        sets = {
            t: frozenset(flat[s : s + c].tolist())
            for t, s, c in zip(uniq, st, cnts)
        }
        jac = np.empty(len(ta), dtype=np.float64)
        for i, (x, y) in enumerate(zip(ta, tb)):
            sa, sb = sets[x or ""], sets[y or ""]
            inter = len(sa & sb)
            jac[i] = inter / (len(sa) + len(sb) - inter)
        keep = jac >= threshold
        return pa.table(
            {
                "id_a": batch.column("id_a").to_numpy()[keep],
                "id_b": batch.column("id_b").to_numpy()[keep],
                "jaccard": jac[keep],
            }
        )

    return with_b.map_batches(verify, batch_format="pyarrow", zero_copy_batch=True)


# ── SimHash ──────────────────────────────────────────────────────────────


_BIT_SHIFTS = np.arange(64, dtype=np.uint64)
_BIT_WEIGHTS = (np.uint64(1) << _BIT_SHIFTS).astype(np.uint64)


def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (deterministic blake2b basis).

    Scalar reference implementation; the batch path
    (:func:`simhash64_batch`) is asserted bit-identical to it in tests.
    """
    return int(simhash64_batch([text])[0])


def simhash64_batch(texts, token_cache: dict | None = None) -> np.ndarray:
    """Vectorized SimHash for a batch of texts → uint64 array.

    Tokenization + unique-token hashing come from the shared Arrow
    front-end (:func:`_token_hash_stream` — two Arrow kernels +
    ``dictionary_encode`` + one blake2b per UNIQUE token); the ±1 bit votes
    for every token occurrence are summed with one ``np.add.reduceat`` over
    a (total_tokens × 64) sign matrix built in doc-aligned chunks — no
    per-token numpy calls.
    """
    h_flat, counts = _token_hash_stream(texts, token_cache)
    n = counts.size
    out = np.zeros(n, dtype=np.uint64)
    if n == 0:
        return out
    if h_flat.size == 0:
        return out  # all-empty texts hash to 0, matching the scalar path
    # ±1 votes per (token, bit); chunked so the (rows × 64) int8 sign matrix
    # stays small; chunks align to doc boundaries for reduceat
    nz = counts > 0
    starts_all = np.concatenate(([0], np.cumsum(counts)[:-1]))
    doc_idx = np.flatnonzero(nz)
    acc = np.zeros((n, 64), dtype=np.int64)
    CHUNK = 1 << 16
    lo_d = 0
    while lo_d < doc_idx.size:
        hi_d = lo_d + 1
        first = doc_idx[lo_d]
        rows = counts[first]
        while hi_d < doc_idx.size and rows + counts[doc_idx[hi_d]] <= CHUNK:
            rows += counts[doc_idx[hi_d]]
            hi_d += 1
        sel = doc_idx[lo_d:hi_d]
        lo = starts_all[sel[0]]
        if sel.size == 1 and rows > CHUNK:
            # ONE doc bigger than the whole chunk budget: bit-vote sums are
            # associative — fold sub-chunks instead of materializing a
            # (rows × 64) sign matrix for the giant doc
            votes = np.zeros(64, dtype=np.int64)
            for c0 in range(lo, lo + rows, CHUNK):
                hseg = h_flat[c0 : min(c0 + CHUNK, lo + rows), None]
                sseg = ((hseg >> _BIT_SHIFTS[None, :]) & np.uint64(1)).astype(np.int64)
                votes += 2 * sseg.sum(axis=0) - sseg.shape[0]
            acc[sel[0]] = votes
        else:
            signs = (
                ((h_flat[lo : lo + rows, None] >> _BIT_SHIFTS[None, :]) & np.uint64(1))
                .astype(np.int8)
                .astype(np.int64)
                * 2
                - 1
            )
            acc[sel] = np.add.reduceat(signs, starts_all[sel] - lo, axis=0)
        lo_d = hi_d
    bits = (acc > 0).astype(np.uint64)
    out = bits @ _BIT_WEIGHTS
    out[~nz] = 0
    return out.astype(np.uint64)


def add_simhash(ds, id_col: str = "doc_id", text_col: str = "text"):
    def fn(batch: pa.Table) -> pa.Table:
        # bit-preserving reinterpret: a 0x7FFF... mask would silently make
        # the signature 63-bit and under-count Hamming distances vs the
        # documented 64-bit simhash64
        sigs = simhash64_batch(batch.column(text_col)).view(np.int64)
        return batch.append_column("simhash", pa.array(sigs, pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def simhash_near_pairs(
    ds, id_col: str = "doc_id", text_col: str = "text", max_hamming: int = 3,
    max_bucket: int | None = _DEFAULT_MAX_BUCKET,
):
    """Hamming-near pairs via 4×16-bit band blocking → (id_a, id_b, hamming).

    Standard pigeonhole blocking: two signatures within Hamming distance 3
    share at least one of four 16-bit chunks exactly; bucket-group on each
    chunk, verify candidates exactly. Recall is only guaranteed for
    ``max_hamming <= 3`` (4 bands); larger values would silently miss
    pairs, so they are rejected.
    """
    if not 0 <= max_hamming <= 3:
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the 4-band blocking recall "
            f"guarantee (<= 3); use more bands for larger radii"
        )
    sigs = add_simhash(ds.select_columns([id_col, text_col]), id_col, text_col)

    def bands(batch: pa.Table) -> pa.Table:
        s = batch.column("simhash").to_numpy()
        ids = batch.column(id_col).to_numpy()
        keys, out_ids, out_sigs = [], [], []
        for b in range(4):
            chunk = (s >> (16 * b)) & 0xFFFF
            keys.append(chunk + (b << 16))
            out_ids.append(ids)
            out_sigs.append(s)
        return pa.table(
            {
                "band_key": np.concatenate(keys).astype(np.int64),
                id_col: np.concatenate(out_ids),
                "simhash": np.concatenate(out_sigs),
            }
        )

    band_rows = sigs.map_batches(bands, batch_format="pyarrow", zero_copy_batch=True)

    def bucket_pairs_part(g: pd.DataFrame) -> pd.DataFrame:
        # one sorted sweep emits every band bucket's verified pairs — the
        # same bounded-group-count trick as _bucket_pairs_partitioned
        g = g.sort_values(["band_key", id_col]).drop_duplicates(["band_key", id_col])
        keys = g["band_key"].to_numpy()
        ids = g[id_col].to_numpy()
        sh = g["simhash"].to_numpy().astype(np.uint64)
        out_a, out_b, out_h = [], [], []
        if keys.size:
            for s, e in zip(*key_spans(keys, min_size=2)):
                bi, si = ids[s:e], sh[s:e]
                _guard_bucket(bi.size, max_bucket, "simhash band bucket")
                ii, jj = np.triu_indices(bi.size, k=1)
                x = si[ii] ^ si[jj]
                ham = np.zeros(x.size, dtype=np.int64)
                for _ in range(64):
                    ham += (x & np.uint64(1)).astype(np.int64)
                    x >>= np.uint64(1)
                keep = ham <= max_hamming
                out_a.append(bi[ii][keep])
                out_b.append(bi[jj][keep])
                out_h.append(ham[keep])
        if not out_a:
            return pd.DataFrame(
                {
                    "id_a": pd.Series(dtype=np.int64),
                    "id_b": pd.Series(dtype=np.int64),
                    "hamming": pd.Series(dtype=np.int64),
                }
            )
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
                "hamming": np.concatenate(out_h),
            }
        )

    pairs = partitioned_map_groups(band_rows, "band_key", bucket_pairs_part, n_parts=64)
    # a pair found via several bands appears once per matching band →
    # distributed distinct (hamming is a function of the id pair, so keying
    # on all three columns dedups identically to (id_a, id_b) alone)
    from .relational import distinct

    return distinct(pairs, ["id_a", "id_b", "hamming"])


# ---------------------------------------------------------------------------
# Line / paragraph-level exact dedup (CCNet / RefinedWeb-style: drop text
# segments that repeat across many documents — boilerplate, nav bars,
# cookie banners — while keeping the documents themselves).


def explode_lines(ds, id_col: str = "doc_id", text_col: str = "text", sep: str = "\n"):
    """``(doc_id, text)`` → one row per segment: ``(doc_id, line_idx, line)``.

    Fully vectorized: one Arrow ``split_pattern`` per batch, then the list
    offsets drive ``np.repeat`` for ids and an arange-minus-starts for the
    in-document index. No per-row Python.
    """

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).combine_chunks()
        if isinstance(texts, pa.ChunkedArray):  # 0-chunk edge
            texts = pa.concat_arrays(texts.chunks or [pa.array([], pa.string())])
        import pyarrow.compute as pc

        parts = pc.split_pattern(pc.fill_null(texts, ""), sep)
        offsets = parts.offsets.to_numpy(zero_copy_only=False)
        lengths = np.diff(offsets)
        ids = np.repeat(batch.column(id_col).to_numpy(zero_copy_only=False), lengths)
        total = int(lengths.sum())
        starts = np.repeat(offsets[:-1], lengths)
        idx = np.arange(total, dtype=np.int64) - starts
        return pa.table(
            {
                id_col: pa.array(ids),
                "line_idx": pa.array(idx, pa.int64()),
                "line": parts.flatten(),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def duplicated_lines(
    lines, id_col: str = "doc_id", min_docs: int = 2, n_parts: int = 64
):
    """Lines appearing in ≥ ``min_docs`` DISTINCT documents → one-column
    Dataset ``(line)``.

    Scale shape: a batch-local ``(line, doc)`` distinct prunes within-doc
    repeats before the one hash-partitioned shuffle (grouping on the line
    STRING itself — exact SQL string-equality semantics, no hash-collision
    caveat; pre-hashing to 128 bits is the documented bandwidth
    optimization if line bytes ever dominate the exchange). The output is
    O(boilerplate lines), never the corpus.
    """

    def project(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = batch.select(["line", id_col])
        return t.group_by(["line", id_col]).aggregate([]) if t.num_rows else t

    pairs = lines.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)

    def count_part(g: pd.DataFrame) -> pd.DataFrame:
        # distinct again ACROSS batches (a doc spans one batch, but the
        # same (line, doc) pair can arrive from several batches only if a
        # doc was split — it is not; this is belt-and-braces for callers
        # feeding pre-exploded rows), then distinct-doc count per line
        n = g.drop_duplicates(["line", id_col]).groupby("line", sort=False).size()
        keep = n[n >= min_docs]
        return pd.DataFrame({"line": keep.index.to_numpy()})

    return partitioned_map_groups(pairs, "line", count_part, n_parts=n_parts)


def dedup_lines(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    min_docs: int = 2,
    n_parts: int = 64,
    out_col: str = "clean_text",
):
    """Remove every line that occurs in ≥ ``min_docs`` distinct documents,
    preserving the order of the surviving lines; documents whose every line
    was boilerplate are dropped entirely (mirrors the SQL ``GROUP BY``
    after the anti-join, which emits no row for them).

    Three narrow exchanges at any scale: the duplicate-line count
    (hash-partitioned on line), the bucketed ANTI-join of lines against
    the duplicate set (the dup side is O(boilerplate) — potentially a
    large corpus fraction at web scale, so it shuffles and is never
    broadcast, same reasoning as ``near_dedup``), and the per-document
    reassembly (hash-partitioned on doc id, list-offset ``binary_join`` —
    no per-group Python). The exploded lines feed two consumers and are
    recomputed rather than materialized: the explode is one Arrow kernel,
    cheaper at 100 TB than pinning a corpus-sized intermediate in the
    object store.
    """
    from .joins import shuffle_equi_join

    lines = explode_lines(ds, id_col=id_col, text_col=text_col, sep=sep)
    dup = duplicated_lines(lines, id_col=id_col, min_docs=min_docs, n_parts=n_parts)
    kept = shuffle_equi_join(
        lines, dup, left_key="line", join_type="left anti", n_buckets=n_parts
    )

    def assemble_part(g: pd.DataFrame) -> pd.DataFrame:
        import pyarrow.compute as pc

        if not len(g):
            return pd.DataFrame({id_col: pd.Series(dtype=np.int64), out_col: pd.Series(dtype=object)})
        ids = g[id_col].to_numpy()
        order = np.lexsort((g["line_idx"].to_numpy(), ids))
        ids = ids[order]
        line_arr = pa.array(g["line"].to_numpy()[order], pa.string())
        starts = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
        offs = np.concatenate([starts, [ids.size]]).astype(np.int32)
        joined = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offs, pa.int32()), line_arr), sep
        )
        return pd.DataFrame({id_col: ids[starts], out_col: joined.to_pandas().to_numpy()})

    return partitioned_map_groups(kept, id_col, assemble_part, n_parts=n_parts)


# ---------------------------------------------------------------------------
# Exact substring-span dedup (Lee et al. 2022, "Deduplicating Training Data
# Makes Language Models Better" — token-granular approximation: instead of a
# corpus suffix array, spans are the union of k-token windows that repeat
# across documents, which is the same family of repeated-substring removal
# expressed as three narrow Ray Data exchanges).


def dedup_spans(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    min_docs: int = 2,
    n_parts: int = 64,
    out_col: str = "clean_text",
):
    """Remove every token covered by a k-token window occurring in >=
    ``min_docs`` DISTINCT documents; output the surviving tokens of
    ``lower(text)`` in order, one row per doc with >= 1 surviving token.

    Semantics notes (all mirrored by the SQL oracle): tokenization is
    whitespace-split of the lowercased text with empty tokens dropped, and
    positions index that filtered stream; a window repeated only WITHIN one
    doc does not count toward ``min_docs`` (within-doc repeats are Gopher
    territory — `repetition_stats`); every occurrence of a cross-doc window
    is removed from every doc holding it, including the first.

    Scale shape — three exchanges, none corpus-amplified:
    1. duplicate-window count: per-batch distinct ``(window_hash, doc)``
       rows (16 B each — the 61-bit Horner window hash ships, never the
       k-token window STRING, avoiding the k× byte amplification; at
       corpus sizes where 61-bit birthday collisions matter, widen to a
       second decorrelated polynomial) → hash-partitioned distinct-doc
       count → the O(boilerplate) dup-window set.
    2. dup-occurrence positions: bucketed SEMI-join of window rows against
       the dup set.
    3. coverage + rebuild: union of the token stream and the dup starts,
       hash-partitioned on doc id; per partition, covered positions are
       computed with two ``searchsorted`` passes over composite
       ``(doc, pos)`` keys (+1 at span start, -1 past span end — no
       per-doc Python), and survivors reassemble via the list-offset
       ``binary_join`` idiom.
    Window rows feed two consumers and are recomputed, not materialized
    (one Arrow tokenize + a Horner sweep — cheaper at scale than pinning a
    corpus-sized intermediate).
    """
    import pyarrow.compute as pc

    from .joins import shuffle_equi_join

    def win_rows(batch: pa.Table) -> pa.Table:
        di, wh, st = _full_window_hashes(batch.column(text_col), k, with_starts=True)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: pa.array(ids[di]),
                "start": pa.array(st, pa.int64()),
                "win_h": pa.array(wh.astype(np.int64), pa.int64()),
            }
        )

    wins = ds.map_batches(win_rows, batch_format="pyarrow", zero_copy_batch=True)

    def project(batch: pa.Table) -> pa.Table:
        t = batch.select(["win_h", id_col])
        return t.group_by(["win_h", id_col]).aggregate([]) if t.num_rows else t

    pairs = wins.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)

    def count_part(g: pd.DataFrame) -> pd.DataFrame:
        n = g.drop_duplicates(["win_h", id_col]).groupby("win_h", sort=False).size()
        keep = n[n >= min_docs]
        return pd.DataFrame({"win_h": keep.index.to_numpy(dtype=np.int64)})

    dup = partitioned_map_groups(pairs, "win_h", count_part, n_parts=n_parts)
    dup_starts = shuffle_equi_join(
        wins, dup, left_key="win_h", join_type="left semi", n_buckets=n_parts
    ).select_columns([id_col, "start"])

    def tok_rows(batch: pa.Table) -> pa.Table:
        texts = pc.fill_null(batch.column(text_col), "")
        toks = pc.utf8_split_whitespace(pc.utf8_lower(texts))
        flat = pc.list_flatten(toks)
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        ids = np.repeat(batch.column(id_col).to_numpy(zero_copy_only=False), lens)
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(nonempty))
        ids = ids[nonempty]
        # positions index the FILTERED stream — consecutive per doc, the
        # arithmetic the coverage sweep and the SQL ROW_NUMBER mirror share
        change = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
        pos = np.arange(ids.size, dtype=np.int64) - np.repeat(
            change, np.diff(np.r_[change, ids.size])
        )
        return pa.table(
            {
                id_col: pa.array(ids),
                "pos": pa.array(pos, pa.int64()),
                "tok": flat,
                "is_start": pa.array(np.zeros(ids.size, dtype=np.int8), pa.int8()),
            }
        )

    toks = ds.map_batches(tok_rows, batch_format="pyarrow", zero_copy_batch=True)

    def as_start(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                id_col: batch.column(id_col),
                "pos": batch.column("start"),
                "tok": pa.array([""] * n, pa.string()),
                "is_start": pa.array(np.ones(n, dtype=np.int8), pa.int8()),
            }
        )

    combined = toks.union(
        dup_starts.map_batches(as_start, batch_format="pyarrow", zero_copy_batch=True)
    )

    def assemble_part(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {id_col: pd.Series(dtype=np.int64), out_col: pd.Series(dtype=object)}
            )
        is_start = g["is_start"].to_numpy() == 1
        ids = g[id_col].to_numpy(dtype=np.int64)
        pos = g["pos"].to_numpy(dtype=np.int64)
        # composite (doc, pos) keys; doc ids are < 2^31 in every driver
        # table and positions < 2^32 by construction
        key = (ids.astype(np.uint64) << np.uint64(32)) | pos.astype(np.uint64)
        skey = np.sort(key[is_start])
        tkey = key[~is_start]
        # covered(token) ⇔ an open span overlaps it ⇔ the number of span
        # starts at-or-before the token exceeds the number of span ENDS
        # (start + k, exclusive) at-or-before it — two searchsorted passes
        # over the sorted composite keys, no per-doc Python. Spans never
        # cross a doc boundary (start + k <= token count < 2^32), so the
        # +k arithmetic stays inside the doc's key range.
        covered = np.searchsorted(skey, tkey, "right") > np.searchsorted(
            skey + np.uint64(k), tkey, "right"
        )
        ids_t = ids[~is_start]
        toks_t = g["tok"].to_numpy()[~is_start]
        pos_t = pos[~is_start]
        keep = ~covered
        ids_k, pos_k, toks_k = ids_t[keep], pos_t[keep], toks_t[keep]
        if ids_k.size == 0:
            return pd.DataFrame(
                {id_col: pd.Series(dtype=np.int64), out_col: pd.Series(dtype=object)}
            )
        order = np.lexsort((pos_k, ids_k))
        ids_k, toks_k = ids_k[order], toks_k[order]
        starts_b = np.flatnonzero(np.r_[True, ids_k[1:] != ids_k[:-1]])
        offs = np.concatenate([starts_b, [ids_k.size]]).astype(np.int32)
        joined = pc.binary_join(
            pa.ListArray.from_arrays(
                pa.array(offs, pa.int32()), pa.array(toks_k, pa.string())
            ),
            " ",
        )
        return pd.DataFrame(
            {id_col: ids_k[starts_b], out_col: joined.to_pandas().to_numpy()}
        )

    return partitioned_map_groups(combined, id_col, assemble_part, n_parts=n_parts)
