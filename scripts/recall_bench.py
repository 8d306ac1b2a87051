"""Recall of every approximate path vs its exact oracle (one JSON line).

The reference records accuracy numbers for its approximate kernel
(`/root/reference/README.md:85-96`); this is the engine's analogue for the
approximate *search* paths — each LSH/IVF variant measured against the exact
ground truth on the same inputs:

- ``lsh_ann`` / ``ivf_ann``: recall@k vs brute-force cosine top-k
  (rank-set overlap per query, averaged).
- ``minhash_pairs``: pair recall vs exact n-gram Jaccard >= threshold,
  ground truth built with an inverted shingle index (exact, no sampling).
- ``simhash_pairs``: pair recall vs exact Hamming <= 3 over all signature
  pairs — the 4x16 pigeonhole blocking GUARANTEES 1.0; this asserts it.

Usage: python scripts/recall_bench.py [sf_dir]   (default /root/testdata/sf0.01)
"""

import json
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ANN_K = 10


def ann_recalls():
    import ray.data as rd

    from geodistpy_ray.stages.ann import ann_topk, ivf_ann_topk, lsh_ann_topk

    import duckdb

    q = duckdb.sql(
        f"SELECT vec_id, embedding FROM read_parquet('{SF}/embeddings.parquet') "
        "WHERE vec_id < 5 ORDER BY vec_id"
    ).fetchall()
    qm = np.array([row[1] for row in q], dtype=np.float64)

    def topk_sets(ds):
        df = ds.to_pandas()
        return {
            int(qid): set(g["vec_id"].tolist())
            for qid, g in df.groupby("query_id")
        }

    emb = lambda: rd.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    exact = topk_sets(ann_topk(emb(), qm, k=ANN_K, tie_round=6))
    out = {}
    from geodistpy_ray.stages.ann import ann_topk_quantized, quantize_embeddings

    for name, ds in [
        ("lsh_ann", lsh_ann_topk(emb(), qm, k=ANN_K, n_bits=6)),
        ("ivf_ann", ivf_ann_topk(emb(), qm, k=ANN_K, n_centroids=8, n_probe=4, n_assign=3)),
        ("q8_ann", ann_topk_quantized(quantize_embeddings(emb()), qm, k=ANN_K)),
    ]:
        approx = topk_sets(ds)
        recalls = [
            len(exact[qid] & approx.get(qid, set())) / max(len(exact[qid]), 1)
            for qid in exact
        ]
        out[f"{name}_recall_at_{ANN_K}"] = round(float(np.mean(recalls)), 4)

    # two-sided IVF join vs the exact blocked join, same 50-query table as
    # the driver's ann_join/ivf_ann_join entries
    import pyarrow.compute as pc

    from geodistpy_ray.stages.ann import ann_join_blocked, ivf_ann_join

    def to_queries(b):
        return b.filter(pc.less(b.column("vec_id"), 50)).rename_columns(
            ["query_id", "embedding"]
        )

    queries = lambda: emb().map_batches(
        to_queries, batch_format="pyarrow", zero_copy_batch=True
    )
    exact_j = topk_sets(ann_join_blocked(queries(), emb(), k=ANN_K))
    # assign 3 is the >=0.95 operating point (measured curve in BASELINE.md:
    # (4 probes, assign 2) 0.936 -> (4, 3) 0.986 -> (5, 3) 0.994, latency
    # +14% worst case); the assign-2 point stays recorded as the curve's
    # cheap end
    for suffix, n_assign in (("", 3), ("_assign2", 2)):
        approx_j = topk_sets(
            ivf_ann_join(
                queries(), emb(), k=ANN_K,
                n_centroids=8, n_probe=4, n_assign=n_assign, train_sample=512,
            )
        )
        recalls = [
            len(exact_j[qid] & approx_j.get(qid, set())) / max(len(exact_j[qid]), 1)
            for qid in exact_j
        ]
        out[f"ivf_ann_join_recall_at_{ANN_K}{suffix}"] = round(
            float(np.mean(recalls)), 4
        )
    return out


def exact_jaccard_pairs(texts_df, shingle=3, threshold=0.5):
    """All pairs with exact n-gram Jaccard >= threshold — inverted index:
    explode (doc, shingle_hash), self-join on the hash, count intersections."""
    from geodistpy_ray.stages.dedup import _shingle_hashes

    rows = []
    sizes = {}
    for did, text in zip(texts_df["doc_id"], texts_df["text"]):
        h = np.unique(_shingle_hashes(text, shingle))
        sizes[int(did)] = h.size
        rows.append(pd.DataFrame({"doc_id": int(did), "h": h}))
    inc = pd.concat(rows, ignore_index=True)
    j = inc.merge(inc, on="h", suffixes=("_a", "_b"))
    j = j[j["doc_id_a"] < j["doc_id_b"]]
    inter = j.groupby(["doc_id_a", "doc_id_b"]).size()
    pairs = set()
    for (a, b), n in inter.items():
        union = sizes[a] + sizes[b] - n
        if union and n / union >= threshold:
            pairs.add((a, b))
    return pairs


def dedup_recalls():
    import ray.data as rd

    from geodistpy_ray.stages.dedup import minhash_lsh_pairs, simhash64_batch, simhash_near_pairs

    import duckdb

    docs_df = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet') ORDER BY doc_id"
    ).df()
    docs = lambda: rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])

    out = {}
    true_j = exact_jaccard_pairs(docs_df, threshold=0.5)
    out["minhash_true_pairs"] = len(true_j)
    # both signature schemes: oph (the default 100 TB path) and classic
    for scheme in ("oph", "classic"):
        got_j = minhash_lsh_pairs(docs(), threshold=0.5, scheme=scheme).to_pandas()
        got_pairs = set(zip(got_j["id_a"].astype(int), got_j["id_b"].astype(int)))
        out[f"minhash_{scheme}_found_pairs"] = len(got_pairs)
        out[f"minhash_{scheme}_recall"] = round(
            len(true_j & got_pairs) / max(len(true_j), 1), 4
        )
        # precision is 1.0 by construction (candidates exact-verified); check
        out[f"minhash_{scheme}_precision"] = round(
            len(true_j & got_pairs) / max(len(got_pairs), 1), 4
        )

    # simhash ground truth: all-pairs Hamming via the bit matrix (n=500 here)
    sigs = simhash64_batch(docs_df["text"].tolist())  # full 64-bit signatures
    bits = ((sigs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.float32
    )
    ham = bits @ (1.0 - bits.T) + (1.0 - bits) @ bits.T
    ids = docs_df["doc_id"].to_numpy()
    ii, jj = np.nonzero(np.triu(ham <= 3, k=1))
    true_s = set(zip(ids[ii].tolist(), ids[jj].tolist()))
    got_s = simhash_near_pairs(docs(), max_hamming=3).to_pandas()
    got_s_pairs = set(zip(got_s["id_a"].astype(int), got_s["id_b"].astype(int)))
    out["simhash_true_pairs"] = len(true_s)
    out["simhash_recall"] = round(len(true_s & got_s_pairs) / max(len(true_s), 1), 4)
    # the 4x16 pigeonhole blocking guarantees recall 1.0 (Hamming <= 3 over
    # 4 bands forces at least one identical band) — enforce, don't just print
    assert out["simhash_recall"] == 1.0, out["simhash_recall"]
    return out


def near_dup_lsh_recall():
    """Embedding near-dup: LSH-bucketed scale path vs the exact broadcast
    path (precision is 1.0 by construction — within-bucket compare is
    exact — so only recall is free)."""
    import ray.data as rd

    from geodistpy_ray.stages.ann import embedding_near_dup_pairs, exact_near_dup_pairs

    emb = lambda: rd.read_parquet(
        f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    t = 0.40
    ex = exact_near_dup_pairs(emb(), t).to_pandas()
    ls = embedding_near_dup_pairs(emb(), threshold=t, n_bits=4, n_tables=16).to_pandas()
    E = set(zip(ex["id_a"], ex["id_b"]))
    L = set(zip(ls["id_a"], ls["id_b"]))
    return {
        "near_dup_exact_pairs": len(E),
        "near_dup_lsh_recall_16x4": round(len(L & E) / max(len(E), 1), 4),
        "near_dup_lsh_precision": round(len(L & E) / max(len(L), 1), 4),
    }


def quantile_sketch_err():
    """Per-key quantile sketch vs exact: worst rank error as a fraction of
    each key's row count, against the documented N/(2b)+1 bound."""
    import duckdb
    import ray.data as rd

    from geodistpy_ray.stages.sketches import grouped_quantile_sketch

    b, q = 64, 0.9
    df = duckdb.sql(
        f"SELECT user_id, value FROM read_parquet('{SF}/events.parquet')"
    ).df()
    ds = rd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "value"])
    got = (
        grouped_quantile_sketch(ds, "user_id", "value", q, b=b)
        .to_pandas()
        .set_index("user_id")["quantile_value"]
    )
    worst = 0.0
    n_min = None
    for uid, grp in df.groupby("user_id")["value"]:
        sv = np.sort(grp.to_numpy())
        n = sv.size
        n_min = n if n_min is None else min(n_min, n)
        x = got.loc[uid]
        lo = np.searchsorted(sv, x, side="left")
        hi = np.searchsorted(sv, x, side="right")
        d = max(lo - q * n, q * n - hi, 0.0)
        worst = max(worst, d / n)
    # the documented guarantee is n/(2b)+1 RANKS per key → as a fraction,
    # 1/(2b) + 1/n; the worst key can be the smallest one, so the honest
    # scalar bound is 1/(2b) + 1/min(n) (dropping the +1 rank made a
    # correct sketch look broken on small keys)
    return {
        "quantile_sketch_b": b,
        "quantile_sketch_max_rank_err_frac": round(worst, 4),
        "quantile_sketch_bound_frac": round(1 / (2 * b) + 1 / n_min, 4),
    }


if __name__ == "__main__":
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    out = {"sf": SF, "ann_k": ANN_K}
    out.update(ann_recalls())
    out.update(dedup_recalls())
    out.update(near_dup_lsh_recall())
    out.update(quantile_sketch_err())
    print(json.dumps(out))
    ray.shutdown()
