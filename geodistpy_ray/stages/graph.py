"""Distributed connected components over a pair/edge table.

The missing last step of every near-dup pipeline: MinHash/SimHash/overlap
stages emit PAIRS, but dropping duplicates needs CLUSTERS — the transitive
closure of the pair relation — with one kept representative per cluster.

Algorithm: iterative min-label propagation. Every node starts labeled with
its own id; each round a node's label drops to the minimum label in its
closed neighborhood; at fixpoint the label is the component's minimum node
id (a deterministic, order-independent cluster id — exactly what a SQL
``WITH RECURSIVE`` min-reachable mirror computes).

Scale shape per round: TWO bounded shuffles of O(E) rows (label+edge
co-group in the source partition, min-reduction in the destination
partition), both via :func:`~.grouping.partitioned_map_groups` — never a
per-node group. Labels are O(V) and re-materialized once per round
(consumed by the next round AND the convergence check; everything bigger
streams). Round count = eccentricity of each component's minimum node
≤ component diameter: near-dup clusters are shallow (boilerplate cliques,
short mutation chains), so this converges in a handful of rounds;
``max_iters`` guards pathological chains and names the fix
(pointer-jumping) in the error.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .grouping import partitioned_map_groups

# row tags in the harmonized union (no nulls: int64-with-null round-trips
# through a pandas partition as float64, which loses label exactness past
# 2^53 — tags + zero placeholders keep every column int)
_KIND_LABEL = 0
_KIND_EDGE = 1


def connected_components(
    edges,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    node_col: str = "node",
    out_col: str = "cluster_id",
    n_parts: int = 64,
    max_iters: int = 50,
):
    """Components of the undirected graph given by an edge Dataset →
    Dataset (``node_col``, ``out_col``): one row per node that appears in
    any edge, labeled with the MINIMUM node id of its component.

    Nodes with no edges don't appear (an edge list doesn't know about
    them); the caller keeps singletons by construction — every doc absent
    from the output is its own cluster's representative.
    """

    def sym(batch: pa.Table) -> pa.Table:
        a = batch.column(src_col).to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch.column(dst_col).to_numpy(zero_copy_only=False).astype(np.int64)
        n2 = a.size + b.size
        return pa.table(
            {
                "node": pa.array(np.concatenate([a, b])),
                "nbr": pa.array(np.concatenate([b, a])),
                "lbl": pa.array(np.zeros(n2, dtype=np.int64)),
                "kind": pa.array(np.full(n2, _KIND_EDGE, dtype=np.int8)),
            }
        )

    # symmetric edge list materialized ONCE and reused every round —
    # otherwise each round would re-execute the whole upstream pair
    # pipeline. Edges are the small output of a dedup stage (O(pairs),
    # not O(corpus)), so pinning them is the cheap side of the trade.
    sym_edges = (
        edges.select_columns([src_col, dst_col])
        .map_batches(sym, batch_format="pyarrow", zero_copy_batch=True)
        .materialize()
    )

    # initial labels: each endpoint labels itself (distinct via one
    # partitioned sweep over the same shuffle key the rounds use)
    def init_part(g: pd.DataFrame) -> pd.DataFrame:
        u = np.unique(g["node"].to_numpy())
        return pd.DataFrame({"node": u, "lbl": u})

    labels = partitioned_map_groups(
        sym_edges, "node", init_part, n_parts=n_parts
    ).materialize()
    if labels.count() == 0:
        return labels.map_batches(
            lambda b: b.rename_columns([node_col, out_col]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    def tag_labels(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "node": batch.column("node"),
                "nbr": pa.array(np.zeros(n, dtype=np.int64)),
                "lbl": batch.column("lbl"),
                "kind": pa.array(np.full(n, _KIND_LABEL, dtype=np.int8)),
            }
        )

    # pass 1 of a round — partition by node: each node's single label row
    # meets all its outgoing edges; emit (nbr, lbl) messages plus a self
    # row carrying the OLD label (self=1) for the convergence check
    def msgs_part(g: pd.DataFrame) -> pd.DataFrame:
        is_edge = g["kind"].to_numpy() == _KIND_EDGE
        lab = g.loc[~is_edge, ["node", "lbl"]]
        out = [
            pd.DataFrame(
                {
                    "node": lab["node"].to_numpy(),
                    "lbl": lab["lbl"].to_numpy(),
                    "self": np.ones(len(lab), dtype=np.int8),
                }
            )
        ]
        if is_edge.any():
            e = g.loc[is_edge, ["node", "nbr"]]
            lbl_of = lab.set_index("node")["lbl"]
            out.append(
                pd.DataFrame(
                    {
                        "node": e["nbr"].to_numpy(),
                        "lbl": lbl_of.loc[e["node"]].to_numpy(),
                        "self": np.zeros(len(e), dtype=np.int8),
                    }
                )
            )
        return pd.concat(out, ignore_index=True)

    # pass 2 of a round — partition by node: new label = min(candidates),
    # changed = new < old (old rides on the self row)
    def reduce_part(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("node", sort=False, as_index=False)["lbl"].min()
        old = g.loc[g["self"] == 1].set_index("node")["lbl"]
        agg["changed"] = (
            agg["lbl"].to_numpy() < old.loc[agg["node"]].to_numpy()
        ).astype(np.int64)
        return agg

    for _ in range(max_iters):
        fanout = labels.map_batches(
            tag_labels, batch_format="pyarrow", zero_copy_batch=True
        ).union(sym_edges)
        candidates = partitioned_map_groups(fanout, "node", msgs_part, n_parts=n_parts)
        new_labels = partitioned_map_groups(
            candidates, "node", reduce_part, n_parts=n_parts
        ).materialize()
        n_changed = new_labels.sum("changed")
        labels = new_labels.drop_columns(["changed"])
        if not n_changed:
            break
    else:
        raise RuntimeError(
            f"connected_components: no fixpoint after {max_iters} rounds — "
            "a component with a min-node eccentricity this deep wants "
            "pointer-jumping (label-of-label contraction); raise max_iters "
            "only if the chain is known-legitimate"
        )

    return labels.map_batches(
        lambda b: b.rename_columns([node_col, out_col]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
