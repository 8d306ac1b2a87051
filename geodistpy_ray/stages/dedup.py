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

from ray.data.aggregate import Count, Min

_MERSENNE = (1 << 61) - 1


def _blake_u64(s: bytes) -> int:
    return int.from_bytes(hashlib.blake2b(s, digest_size=8).digest(), "little")


def add_text_hash(ds, text_col: str = "text", out_col: str = "text_hash"):
    """Append the md5 hex digest of the text (matches DuckDB's ``md5()``)."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        h = [hashlib.md5((t or "").encode()).hexdigest() for t in texts]
        return batch.append_column(out_col, pa.array(h, pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def exact_dedup(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Exact dedup groups → (text_hash, keep_id, n_dups), keep_id = min id."""
    hashed = add_text_hash(ds, text_col).select_columns(["text_hash", id_col])
    return hashed.groupby("text_hash").aggregate(
        Min(id_col, alias_name="keep_id"), Count(alias_name="n_dups")
    )


# ── MinHash + LSH ────────────────────────────────────────────────────────


def _shingle_hashes(text: str, shingle: int) -> np.ndarray:
    toks = (text or "").lower().split()
    if len(toks) < shingle:
        grams = [" ".join(toks)] if toks else [""]
    else:
        grams = {" ".join(toks[i : i + shingle]) for i in range(len(toks) - shingle + 1)}
    return np.fromiter(
        (_blake_u64(g.encode()) for g in grams), dtype=np.uint64, count=len(grams)
    )


class MinHasher:
    """Per-actor state: the permutation coefficients (seeded, built once)."""

    def __init__(self, num_perm: int = 128, shingle: int = 3, seed: int = 1234):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.shingle = shingle

    def signature(self, text: str) -> np.ndarray:
        h = _shingle_hashes(text, self.shingle).astype(np.object_)  # py ints: no overflow
        # (S, P) permuted hashes mod Mersenne prime, min over shingles
        vals = (h[:, None] * self.a.astype(np.object_)[None, :] + self.b.astype(np.object_)) % _MERSENNE
        return np.min(vals, axis=0).astype(np.uint64)


class MinHashBandEmitter:
    """map_batches actor: text → LSH band rows (band_key, doc_id)."""

    def __init__(self, id_col: str, num_perm: int, bands: int, shingle: int, seed: int):
        assert num_perm % bands == 0
        self.hasher = MinHasher(num_perm, shingle, seed)
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        ids = batch.column(self.id_col).to_numpy()
        keys, out_ids = [], []
        for t, d in zip(texts, ids):
            sig = self.hasher.signature(t)
            for b in range(self.bands):
                chunk = sig[b * self.rows_per_band : (b + 1) * self.rows_per_band]
                key = _blake_u64(bytes([b]) + chunk.tobytes()) & 0x7FFFFFFFFFFFFFFF
                keys.append(key)
                out_ids.append(d)
        return pa.table(
            {
                "band_key": pa.array(keys, pa.int64()),
                self.id_col: pa.array(out_ids, pa.int64()),
            }
        )


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
    concurrency: int | tuple[int, int] = 4,
):
    """Near-duplicate pairs via MinHash+LSH → Dataset (id_a, id_b, jaccard).

    Pipeline: band rows → ``groupby(band_key)`` candidate generation (each
    bucket emits its id pairs) → distinct pairs → exact Jaccard verification
    on the (small, LSH-pruned) candidate set. Verification re-reads only the
    candidate documents' texts via a broadcast id-set filter — at scale this
    stays proportional to the candidate count, not the corpus.
    """
    if text_col != "text":
        ds = ds.select_columns([id_col, text_col]).rename_columns(
            {text_col: "text", id_col: id_col}
        )
    band_rows = ds.select_columns([id_col, "text"]).map_batches(
        MinHashBandEmitter,
        fn_constructor_kwargs={
            "id_col": id_col,
            "num_perm": num_perm,
            "bands": bands,
            "shingle": shingle,
            "seed": seed,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
    )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(np.unique(g[id_col].to_numpy()))
        if ids.size < 2:
            return pd.DataFrame({"id_a": [], "id_b": []}).astype(np.int64)
        ii, jj = np.triu_indices(ids.size, k=1)
        return pd.DataFrame({"id_a": ids[ii], "id_b": ids[jj]})

    cand = band_rows.groupby("band_key").map_groups(bucket_pairs, batch_format="pandas")
    cand_pd = cand.to_pandas().drop_duplicates(ignore_index=True)
    if cand_pd.empty:
        import ray.data as rd

        return rd.from_pandas(
            pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []}).astype(
                {"id_a": np.int64, "id_b": np.int64, "jaccard": np.float64}
            )
        )

    need = set(cand_pd["id_a"].tolist()) | set(cand_pd["id_b"].tolist())
    texts = {}
    for batch in ds.select_columns([id_col, "text"]).iter_batches(
        batch_size=8192, batch_format="pyarrow"
    ):
        ids_b = batch.column(id_col).to_numpy()
        mask = np.isin(ids_b, np.fromiter(need, dtype=np.int64, count=len(need)))
        if mask.any():
            for d, t in zip(ids_b[mask], np.asarray(batch.column("text").to_pylist(), dtype=object)[mask]):
                texts[int(d)] = t

    jac = np.array(
        [
            ngram_jaccard(texts[int(a)], texts[int(b)], shingle)
            for a, b in zip(cand_pd["id_a"], cand_pd["id_b"])
        ]
    )
    out = cand_pd.assign(jaccard=jac)
    out = out[out["jaccard"] >= threshold].reset_index(drop=True)
    import ray.data as rd

    return rd.from_pandas(out)


# ── SimHash ──────────────────────────────────────────────────────────────


def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (deterministic blake2b basis)."""
    toks = (text or "").lower().split()
    if not toks:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for t in toks:
        h = _blake_u64(t.encode())
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits.astype(bool), 1, -1)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def add_simhash(ds, id_col: str = "doc_id", text_col: str = "text"):
    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        sigs = np.fromiter(
            (simhash64(t) & 0x7FFFFFFFFFFFFFFF for t in texts),
            dtype=np.int64,
            count=len(texts),
        )
        return batch.append_column("simhash", pa.array(sigs, pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def simhash_near_pairs(ds, id_col: str = "doc_id", text_col: str = "text", max_hamming: int = 3):
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

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(subset=[id_col]).sort_values(id_col)
        ids = g[id_col].to_numpy()
        s = g["simhash"].to_numpy().astype(np.uint64)
        if ids.size < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []}).astype(np.int64)
        ii, jj = np.triu_indices(ids.size, k=1)
        x = s[ii] ^ s[jj]
        ham = np.zeros(x.size, dtype=np.int64)
        for _ in range(64):
            ham += (x & np.uint64(1)).astype(np.int64)
            x >>= np.uint64(1)
        keep = ham <= max_hamming
        return pd.DataFrame({"id_a": ids[ii][keep], "id_b": ids[jj][keep], "hamming": ham[keep]})

    pairs = band_rows.groupby("band_key").map_groups(bucket_pairs, batch_format="pandas")
    pd_pairs = pairs.to_pandas().drop_duplicates(subset=["id_a", "id_b"], ignore_index=True)
    import ray.data as rd

    return rd.from_pandas(pd_pairs)
