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
partition) plus ONE bounded O(V) pointer-jump shuffle (label-of-label
contraction, ``lbl[v] ← lbl[lbl[v]]``), all via
:func:`~.grouping.partitioned_map_groups` — never a per-node group.
Labels are O(V) and re-materialized once per round (consumed by the next
round AND the convergence check; everything bigger streams). The jump
halves the remaining chain depth each round, so round count is
O(log component-diameter) — near-dup clusters are shallow and finish in
2-3 rounds either way (the jump is skipped once propagation fixes), and
long link-graph chains converge logarithmically instead of hitting
``max_iters``.
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


def _edge_ids(batch: pa.Table, col: str) -> np.ndarray:
    """Null-checked int64 endpoint column.

    A null int64 endpoint would otherwise launder through float64/NaN in
    ``to_numpy(zero_copy_only=False)`` and ``astype(int64)`` into
    INT64_MIN — a phantom node that joins a real component and, being the
    minimum label, can even become its cluster_id. Raise instead; the
    caller decides whether to drop or fill null endpoints upstream.
    """
    arr = batch.column(col)
    if arr.null_count:
        raise ValueError(
            f"edge column {col!r} contains nulls; drop or fill null "
            "endpoints before the graph stage"
        )
    return arr.to_numpy(zero_copy_only=False).astype(np.int64)


def connected_components(
    edges,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    node_col: str = "node",
    out_col: str = "cluster_id",
    n_parts: int = 64,
    max_iters: int = 50,
    return_rounds: bool = False,
):
    """Components of the undirected graph given by an edge Dataset →
    Dataset (``node_col``, ``out_col``): one row per node that appears in
    any edge, labeled with the MINIMUM node id of its component.

    Nodes with no edges don't appear (an edge list doesn't know about
    them); the caller keeps singletons by construction — every doc absent
    from the output is its own cluster's representative.

    Rounds are min-propagation PLUS pointer-jumping: after each
    propagation pass that still changed labels, one label-of-label
    contraction (``lbl[v] ← lbl[lbl[v]]`` — a single bounded shuffle
    keyed on the label) halves the remaining pointer depth, so a long
    chain converges in O(log diameter) rounds instead of O(diameter).
    Label values are always node ids within the component and monotonically
    non-increasing, so the jump lookup always resolves and the fixpoint is
    unchanged: the loop stops when a propagation pass changes nothing,
    which is exactly the min-label fixpoint (= component minima). Shallow
    components (the near-dup norm) skip the jump on their final round and
    pay nothing extra. ``return_rounds=True`` returns ``(dataset, rounds)``
    for convergence tests.
    """

    def sym(batch: pa.Table) -> pa.Table:
        a = _edge_ids(batch, src_col)
        b = _edge_ids(batch, dst_col)
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
        out = labels.map_batches(
            lambda b: b.rename_columns([node_col, out_col]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        return (out, 0) if return_rounds else out

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

    # pointer-jump shuffle: label rows keyed by their NODE meet request
    # rows keyed by their LABEL (the parent whose label we want); each
    # request's new label is its parent's label. Request rows don't need
    # to carry their old label separately — the old label IS the key.
    # BOTH row kinds come out of ONE pass over the label table: a
    # two-branch ``labels.map_batches(req).union(labels.map_batches(lbl))``
    # DOUBLES the block count every round (Ray's sort-groupby emits one
    # output block per input block), which measured as geometric per-round
    # slowdown — 512 blocks and 20 s/round by round 8 on a 300-row graph.
    def tag_jump(batch: pa.Table) -> pa.Table:
        node = batch.column("node").to_numpy(zero_copy_only=False)
        lbl = batch.column("lbl").to_numpy(zero_copy_only=False)
        n = node.size
        z = np.zeros(n, dtype=np.int64)
        return pa.table(
            {
                "key": pa.array(np.concatenate([lbl, node])),
                "node": pa.array(np.concatenate([node, z])),
                "lbl": pa.array(np.concatenate([z, lbl])),
                "kind": pa.array(
                    np.concatenate(
                        [
                            np.full(n, _KIND_EDGE, dtype=np.int8),
                            np.full(n, _KIND_LABEL, dtype=np.int8),
                        ]
                    )
                ),
            }
        )

    def jump_part(g: pd.DataFrame) -> pd.DataFrame:
        is_req = g["kind"].to_numpy() == _KIND_EDGE
        lbl_of = g.loc[~is_req].set_index("key")["lbl"]
        req = g.loc[is_req]
        old = req["key"].to_numpy()
        new = lbl_of.loc[old].to_numpy()
        return pd.DataFrame(
            {
                "node": req["node"].to_numpy(),
                "lbl": new,
                "changed": (new < old).astype(np.int64),
            }
        )

    rounds = 0
    for _ in range(max_iters):
        rounds += 1
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
            # a propagation pass that changed nothing IS the min-label
            # fixpoint — a jump could not change anything either
            break
        # pointer jump (one bounded shuffle): lbl[v] ← lbl[lbl[v]] halves
        # the remaining chain depth, giving O(log diameter) total rounds
        jun = labels.map_batches(
            tag_jump, batch_format="pyarrow", zero_copy_batch=True
        )
        jumped = partitioned_map_groups(jun, "key", jump_part, n_parts=n_parts).materialize()
        labels = jumped.drop_columns(["changed"])
        # the prop groupby's output block count tracks its INPUT block
        # count (labels + sym_edges blocks), so labels gain ~|sym blocks|
        # per round — clamp before linear growth turns into linear
        # per-round scheduling cost over many rounds
        if jumped.num_blocks() > 4 * n_parts:
            labels = labels.repartition(n_parts).materialize()
    else:
        raise RuntimeError(
            f"connected_components: no fixpoint after {max_iters} rounds of "
            "min-propagation + pointer-jumping — at O(log diameter) rounds "
            f"this graph's diameter exceeds ~2^{max_iters}; raise max_iters "
            "only if that is known-legitimate"
        )

    out = labels.map_batches(
        lambda b: b.rename_columns([node_col, out_col]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return (out, rounds) if return_rounds else out


def pagerank(
    edges,
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    n_iters: int = 10,
    n_parts: int = 64,
    node_col: str = "node",
    out_col: str = "rank",
):
    """Distributed PageRank over a DIRECTED int64 edge Dataset →
    Dataset (``node_col``, ``out_col``), fixed ``n_iters`` power
    iterations of the standard damped walk:

        rank' = (1−d)/N + d·(Σ_in rank/outdeg + dangling_mass/N)

    Scale shape per round (the :func:`connected_components` idiom): TWO
    bounded shuffles of O(E) rows — contributions fan out in the SOURCE
    partition (each node's one state row meets its outgoing edges), sums
    reduce in the DESTINATION partition — via ``partitioned_map_groups``;
    never a per-node group, never an O(V²) matrix. State is O(V)
    (node, rank, outdeg) and re-materialized once per round; the dangling
    mass is a driver scalar from one cheap pass over the state. Nodes are
    every edge endpoint; ranks sum to 1 (tested)."""
    if not 0.0 < damping < 1.0:
        raise ValueError("damping must be in (0, 1)")

    def directed(batch: pa.Table) -> pa.Table:
        s = _edge_ids(batch, src_col)
        d = _edge_ids(batch, dst_col)
        return pa.table(
            {
                "node": pa.array(s),
                "nbr": pa.array(d),
                "rank": pa.array(np.zeros(s.size, dtype=np.float64)),
                "outdeg": pa.array(np.zeros(s.size, dtype=np.int64)),
                "kind": pa.array(np.full(s.size, _KIND_EDGE, dtype=np.int8)),
            }
        )

    # edges materialized once, reused every round (same trade as CC)
    e = (
        edges.select_columns([src_col, dst_col])
        .map_batches(directed, batch_format="pyarrow", zero_copy_batch=True)
        .materialize()
    )

    # node table with out-degrees: one partitioned sweep over endpoints
    # (sources count toward outdeg; targets enter with outdeg 0)
    def init_part(g: pd.DataFrame) -> pd.DataFrame:
        u = np.unique(g["node"].to_numpy())
        deg = np.zeros(u.size, dtype=np.int64)
        src = g["is_src"].to_numpy()
        idx = np.searchsorted(u, g["node"].to_numpy())
        np.add.at(deg, idx, src)
        return pd.DataFrame({"node": u, "outdeg": deg})

    def tag_endpoints(batch: pa.Table) -> pa.Table:
        s = batch.column("node").combine_chunks()
        d = batch.column("nbr").combine_chunks()
        n = len(s)
        return pa.table(
            {
                "node": pa.concat_arrays([s, d]),
                "is_src": pa.array(
                    np.concatenate(
                        [np.ones(n, dtype=np.int64), np.zeros(n, dtype=np.int64)]
                    )
                ),
            }
        )

    nodes = partitioned_map_groups(
        e.map_batches(tag_endpoints, batch_format="pyarrow", zero_copy_batch=True),
        "node",
        init_part,
        n_parts=n_parts,
    ).materialize()
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.map_batches(
            lambda b: pa.table(
                {node_col: pa.array([], pa.int64()), out_col: pa.array([], pa.float64())}
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    def with_rank(r0: float):
        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            return pa.table(
                {
                    "node": batch.column("node"),
                    "nbr": pa.array(np.zeros(n, dtype=np.int64)),
                    "rank": pa.array(np.full(n, r0, dtype=np.float64)),
                    "outdeg": batch.column("outdeg"),
                    "kind": pa.array(np.full(n, _KIND_LABEL, dtype=np.int8)),
                }
            )

        return fn

    state = nodes.map_batches(
        with_rank(1.0 / n_nodes), batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    # pass 1 — SOURCE partition: each node's one state row meets its
    # outgoing edges; emit (dst, rank/outdeg) messages + a zero self row
    # (keeps the node alive and carries outdeg into the reduce)
    def msgs_part(g: pd.DataFrame) -> pd.DataFrame:
        is_edge = g["kind"].to_numpy() == _KIND_EDGE
        st = g.loc[~is_edge]
        out = [
            pd.DataFrame(
                {
                    "node": st["node"].to_numpy(),
                    "contrib": np.zeros(len(st), dtype=np.float64),
                    "outdeg": st["outdeg"].to_numpy(),
                }
            )
        ]
        if is_edge.any():
            ed = g.loc[is_edge]
            per = st.set_index("node")
            rank_of = per["rank"].loc[ed["node"]].to_numpy()
            deg_of = per["outdeg"].loc[ed["node"]].to_numpy().astype(np.float64)
            out.append(
                pd.DataFrame(
                    {
                        "node": ed["nbr"].to_numpy(),
                        "contrib": rank_of / deg_of,
                        "outdeg": np.full(len(ed), -1, dtype=np.int64),
                    }
                )
            )
        return pd.concat(out, ignore_index=True)

    for _ in range(n_iters):
        # dangling mass: one cheap pass over the O(V) state
        def dang_partial(batch: pa.Table) -> pa.Table:
            deg = batch.column("outdeg").to_numpy(zero_copy_only=False)
            r = batch.column("rank").to_numpy(zero_copy_only=False)
            return pa.table({"m": pa.array([float(r[deg == 0].sum())], pa.float64())})

        dangling = sum(
            row["m"]
            for row in state.map_batches(
                dang_partial, batch_format="pyarrow", zero_copy_batch=True
            ).take_all()
        )
        base = (1.0 - damping) / n_nodes + damping * dangling / n_nodes

        def reduce_part(g: pd.DataFrame, _base=base) -> pd.DataFrame:
            agg = g.groupby("node", sort=False, as_index=False).agg(
                contrib=("contrib", "sum"), outdeg=("outdeg", "max")
            )
            return pd.DataFrame(
                {
                    "node": agg["node"].to_numpy(),
                    "rank": _base + damping * agg["contrib"].to_numpy(),
                    "outdeg": agg["outdeg"].to_numpy(),
                }
            )

        fanout = state.union(e)
        msgs = partitioned_map_groups(fanout, "node", msgs_part, n_parts=n_parts)
        new = partitioned_map_groups(msgs, "node", reduce_part, n_parts=n_parts)
        state = new.map_batches(
            lambda b: pa.table(
                {
                    "node": b.column("node"),
                    "nbr": pa.array(np.zeros(b.num_rows, dtype=np.int64)),
                    "rank": b.column("rank"),
                    "outdeg": b.column("outdeg"),
                    "kind": pa.array(np.full(b.num_rows, _KIND_LABEL, dtype=np.int8)),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).materialize()
        # same block-growth clamp as connected_components/bfs_hops: the
        # prop groupby's output block count tracks its INPUT blocks
        # (state + e), so the O(V) state gains ~|e blocks| per round —
        # unclamped, per-round scheduling cost grows linearly over rounds
        if state.num_blocks() > 4 * n_parts:
            state = state.repartition(n_parts).materialize()

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {node_col: batch.column("node"), out_col: batch.column("rank")}
        )

    return state.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def hits(
    edges,
    src_col: str = "src",
    dst_col: str = "dst",
    n_iters: int = 10,
    n_parts: int = 64,
    node_col: str = "node",
    hub_col: str = "hub",
    auth_col: str = "auth",
):
    """Distributed HITS (Kleinberg hubs & authorities) over a DIRECTED
    int64 edge Dataset → Dataset (``node_col``, ``hub_col``, ``auth_col``)
    after ``n_iters`` rounds of the classic mutual recursion

        auth' = Σ_{u→v} hub(u)    then L2-normalize
        hub'  = Σ_{u→v} auth'(v)  then L2-normalize

    Scale shape (the :func:`pagerank` idiom): each half-step is one
    message propagation = TWO bounded O(E) shuffles via
    ``partitioned_map_groups`` (messages fan out in the partition of the
    message SOURCE where the node's one value row meets its edges; sums
    reduce in the partition of the TARGET). The L2 norms are driver
    scalars from one O(V) partial pass. The two edge orientations
    (src-keyed for the auth step, dst-keyed for the hub step) are
    materialized once and reused every round — never a per-node group,
    never a dense matrix.
    """
    if n_iters < 1:
        raise ValueError("hits: n_iters must be >= 1 (the mutual recursion needs at least one round)")

    def oriented(key_src: bool):
        def fn(batch: pa.Table) -> pa.Table:
            s = _edge_ids(batch, src_col)
            d = _edge_ids(batch, dst_col)
            a, b = (s, d) if key_src else (d, s)
            return pa.table(
                {
                    "node": pa.array(a),
                    "nbr": pa.array(b),
                    "val": pa.array(np.zeros(a.size, dtype=np.float64)),
                    "kind": pa.array(np.full(a.size, _KIND_EDGE, dtype=np.int8)),
                }
            )

        return fn

    picked = edges.select_columns([src_col, dst_col])
    e_fwd = picked.map_batches(
        oriented(True), batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    # e_rev is e_fwd with node/nbr swapped — derive it with a cheap column
    # swap instead of a second materialize of `picked`, which would re-run
    # the entire upstream edge pipeline end to end
    def swapped(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": batch.column("nbr"),
                "nbr": batch.column("node"),
                "val": batch.column("val"),
                "kind": batch.column("kind"),
            }
        )

    e_rev = e_fwd.map_batches(
        swapped, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    # node set = every endpoint, deduplicated with one partitioned sweep
    def uniq_part(t: pa.Table) -> pa.Table:
        u = np.unique(t.column("node").to_numpy(zero_copy_only=False))
        return pa.table({"node": pa.array(u, pa.int64())})

    def endpoints(batch: pa.Table) -> pa.Table:
        both = pa.concat_arrays(
            [batch.column("node").combine_chunks(), batch.column("nbr").combine_chunks()]
        )
        return pa.table({"node": both})

    nodes = partitioned_map_groups(
        e_fwd.map_batches(endpoints, batch_format="pyarrow", zero_copy_batch=True),
        "node",
        uniq_part,
        n_parts=n_parts,
        part_format="pyarrow",
    ).materialize()
    n_nodes = nodes.count()
    if n_nodes == 0:
        empty = pa.table(
            {
                node_col: pa.array([], pa.int64()),
                hub_col: pa.array([], pa.float64()),
                auth_col: pa.array([], pa.float64()),
            }
        )
        import ray.data as rd

        return rd.from_arrow(empty)

    def with_val(v: float):
        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            return pa.table(
                {
                    "node": batch.column("node"),
                    "nbr": pa.array(np.zeros(n, dtype=np.int64)),
                    "val": pa.array(np.full(n, v, dtype=np.float64)),
                    "kind": pa.array(np.full(n, _KIND_LABEL, dtype=np.int8)),
                }
            )

        return fn

    def msgs_part(g: pd.DataFrame) -> pd.DataFrame:
        is_edge = g["kind"].to_numpy() == _KIND_EDGE
        st = g.loc[~is_edge]
        out = [
            pd.DataFrame(
                {"node": st["node"].to_numpy(), "s": np.zeros(len(st), dtype=np.float64)}
            )
        ]
        if is_edge.any():
            ed = g.loc[is_edge]
            val_of = st.set_index("node")["val"].loc[ed["node"]].to_numpy()
            out.append(pd.DataFrame({"node": ed["nbr"].to_numpy(), "s": val_of}))
        return pd.concat(out, ignore_index=True)

    def sum_part(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("node", sort=False, as_index=False).agg(s=("s", "sum"))

    def propagate(values, e_tbl):
        """values: Dataset (node, nbr, val, kind=LABEL) covering ALL nodes
        → Dataset (node, s) with s = Σ val over incoming messages (self
        rows keep message-less nodes alive at 0)."""
        fanout = values.union(e_tbl)
        msgs = partitioned_map_groups(fanout, "node", msgs_part, n_parts=n_parts)
        return partitioned_map_groups(msgs, "node", sum_part, n_parts=n_parts)

    def l2_normalize(scored):
        def sq_partial(batch: pa.Table) -> pa.Table:
            v = batch.column("s").to_numpy(zero_copy_only=False)
            return pa.table({"ss": pa.array([float((v * v).sum())], pa.float64())})

        ss = sum(
            row["ss"]
            for row in scored.map_batches(
                sq_partial, batch_format="pyarrow", zero_copy_batch=True
            ).take_all()
        )
        norm = float(np.sqrt(ss)) or 1.0

        def div(batch: pa.Table) -> pa.Table:
            v = batch.column("s").to_numpy(zero_copy_only=False) / norm
            n = batch.num_rows
            return pa.table(
                {
                    "node": batch.column("node"),
                    "nbr": pa.array(np.zeros(n, dtype=np.int64)),
                    "val": pa.array(v, pa.float64()),
                    "kind": pa.array(np.full(n, _KIND_LABEL, dtype=np.int8)),
                }
            )

        out = scored.map_batches(
            div, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()
        # block-growth clamp (see pagerank): hub/auth gain ~|e blocks|
        # per propagate, and hits runs TWO propagates per iteration
        if out.num_blocks() > 4 * n_parts:
            out = out.repartition(n_parts).materialize()
        return out

    hub = nodes.map_batches(
        with_val(1.0 / np.sqrt(n_nodes)), batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    auth = None
    for _ in range(n_iters):
        auth = l2_normalize(propagate(hub, e_fwd))
        hub = l2_normalize(propagate(auth, e_rev))

    # final merge: (node, hub) ⊎ (node, auth) → one partitioned sum (both
    # cover the full node set, so each output row folds exactly two rows)
    def tagged(which: int):
        def fn(batch: pa.Table) -> pa.Table:
            v = batch.column("val").to_numpy(zero_copy_only=False)
            z = np.zeros(batch.num_rows, dtype=np.float64)
            h, a = (v, z) if which == 0 else (z, v)
            return pa.table(
                {
                    "node": batch.column("node"),
                    hub_col: pa.array(h, pa.float64()),
                    auth_col: pa.array(a, pa.float64()),
                }
            )

        return fn

    both = hub.map_batches(tagged(0), batch_format="pyarrow", zero_copy_batch=True).union(
        auth.map_batches(tagged(1), batch_format="pyarrow", zero_copy_batch=True)
    )

    def merge_part(t: pa.Table) -> pa.Table:
        node = t.column("node").to_numpy(zero_copy_only=False)
        u, inv = np.unique(node, return_inverse=True)
        h = np.zeros(u.size, dtype=np.float64)
        a = np.zeros(u.size, dtype=np.float64)
        np.add.at(h, inv, t.column(hub_col).to_numpy(zero_copy_only=False))
        np.add.at(a, inv, t.column(auth_col).to_numpy(zero_copy_only=False))
        return pa.table(
            {
                node_col: pa.array(u, pa.int64()),
                hub_col: pa.array(h, pa.float64()),
                auth_col: pa.array(a, pa.float64()),
            }
        )

    return partitioned_map_groups(
        both, "node", merge_part, n_parts=n_parts, part_format="pyarrow"
    )


def bfs_hops(
    edges,
    seeds,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
    out_col: str = "hops",
    n_parts: int = 64,
    max_iters: int = 50,
):
    """Distributed BFS: minimum hop count from any seed node, following
    DIRECTED edges → Dataset (node, hops) for every REACHED node.

    The :func:`connected_components` idiom with a different semilattice —
    labels are hop distances, the update rule is ``min(node, neighbor+1)``
    — so each round is the same two bounded O(E) shuffles (state meets its
    out-edges in the source partition; mins reduce in the destination
    partition), and the round count is the reached diameter (capped by
    ``max_iters``, raising on non-convergence like CC). Unreached nodes
    don't appear — absence IS the infinite distance.
    """
    import ray

    seeds = np.asarray(list(seeds), dtype=np.int64)
    if seeds.size == 0:
        raise ValueError("bfs_hops needs at least one seed")
    INF = np.int64(1 << 62)

    def directed(batch: pa.Table) -> pa.Table:
        s = _edge_ids(batch, src_col)
        d = _edge_ids(batch, dst_col)
        return pa.table(
            {
                "node": pa.array(s),
                "nbr": pa.array(d),
                "lbl": pa.array(np.full(s.size, INF, dtype=np.int64)),
                "kind": pa.array(np.full(s.size, _KIND_EDGE, dtype=np.int8)),
            }
        )

    e = (
        edges.select_columns([src_col, dst_col])
        .map_batches(directed, batch_format="pyarrow", zero_copy_batch=True)
        .materialize()
    )
    seed_set = ray.put(np.unique(seeds))

    # node state: every endpoint, hops = 0 for seeds else INF
    def init_part(t: pa.Table) -> pa.Table:
        from .broadcast import get_broadcast

        u = np.unique(t.column("node").to_numpy(zero_copy_only=False))
        sd = get_broadcast(seed_set)
        lbl = np.where(np.isin(u, sd), 0, INF).astype(np.int64)
        return pa.table(
            {
                "node": pa.array(u, pa.int64()),
                "nbr": pa.array(np.zeros(u.size, dtype=np.int64)),
                "lbl": pa.array(lbl),
                "kind": pa.array(np.full(u.size, _KIND_LABEL, dtype=np.int8)),
            }
        )

    def endpoints(batch: pa.Table) -> pa.Table:
        both = pa.concat_arrays(
            [batch.column("node").combine_chunks(), batch.column("nbr").combine_chunks()]
        )
        return pa.table({"node": both})

    # node set = edge endpoints UNION the seeds themselves: a seed that
    # appears in no edge is still reached (at hops 0) by definition —
    # built from endpoints alone it would be silently absent, which a
    # caller cannot distinguish from unreachable (and the SQL-mirror
    # recursive CTE anchors seeds unconditionally)
    import ray.data as rd

    seed_tbl = rd.from_arrow(pa.table({"node": pa.array(np.unique(seeds), pa.int64())}))
    state = partitioned_map_groups(
        e.map_batches(endpoints, batch_format="pyarrow", zero_copy_batch=True).union(seed_tbl),
        "node",
        init_part,
        n_parts=n_parts,
        part_format="pyarrow",
    ).materialize()

    def msgs_part(g: pd.DataFrame) -> pd.DataFrame:
        is_edge = g["kind"].to_numpy() == _KIND_EDGE
        st = g.loc[~is_edge]
        out = [pd.DataFrame({"node": st["node"].to_numpy(), "lbl": st["lbl"].to_numpy()})]
        if is_edge.any():
            ed = g.loc[is_edge]
            lbl_of = st.set_index("node")["lbl"].loc[ed["node"]].to_numpy()
            nxt = np.where(lbl_of >= INF, INF, lbl_of + 1)
            out.append(pd.DataFrame({"node": ed["nbr"].to_numpy(), "lbl": nxt}))
        return pd.concat(out, ignore_index=True)

    def min_part(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("node", sort=False, as_index=False).agg(lbl=("lbl", "min"))

    def _lbl_state(st) -> tuple:
        # Labels include INF = 2**62 sentinels: a raw int64 sum wraps mod
        # 2**64 and can collide across a genuinely-changed round (four INF
        # rows sum to 0, so INF→1,1,1,1 plus a 6→2 drop leaves the wrapped
        # sum equal and breaks the loop one round early). Track
        # (finite hop sum, unreached count) instead — a label only moves
        # INF→finite or strictly down, so the pair is unchanged iff the
        # round was a fixpoint; finite hops are < V so the sum can't wrap.
        def partial(batch: pa.Table) -> pa.Table:
            v = batch.column("lbl").to_numpy(zero_copy_only=False)
            fin = v < INF
            return pa.table(
                {
                    "s": pa.array([int(v[fin].sum())], pa.int64()),
                    "u": pa.array([int((~fin).sum())], pa.int64()),
                }
            )

        s = u = 0
        for r in st.map_batches(partial, batch_format="pyarrow").take_all():
            s += r["s"]
            u += r["u"]
        return (s, u)

    s_old = _lbl_state(state)
    for it in range(max_iters):
        msgs = partitioned_map_groups(state.union(e), "node", msgs_part, n_parts=n_parts)
        new = partitioned_map_groups(msgs, "node", min_part, n_parts=n_parts)

        def relabel(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            return pa.table(
                {
                    "node": batch.column("node"),
                    "nbr": pa.array(np.zeros(n, dtype=np.int64)),
                    "lbl": batch.column("lbl"),
                    "kind": pa.array(np.full(n, _KIND_LABEL, dtype=np.int8)),
                }
            )

        new_state = new.map_batches(
            relabel, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()
        # same block-growth clamp as connected_components: each round's
        # groupby output block count tracks its INPUT blocks (state + e),
        # so state gains ~|e blocks| per round — over diameter-many rounds
        # that turns into linear per-round scheduling cost
        if new_state.num_blocks() > 4 * n_parts:
            new_state = new_state.repartition(n_parts).materialize()
        # convergence: (finite sum, unreached count) changes on every
        # non-fixpoint round (the previous round's state is carried,
        # not recomputed)
        s_new = _lbl_state(new_state)
        state = new_state
        if s_new == s_old:
            break
        s_old = s_new
    else:
        raise RuntimeError(f"bfs_hops did not converge in {max_iters} rounds")

    def finish(batch: pa.Table) -> pa.Table:
        lbl = batch.column("lbl").to_numpy(zero_copy_only=False)
        keep = lbl < INF
        return pa.table(
            {
                node_col: pa.array(
                    batch.column("node").to_numpy(zero_copy_only=False)[keep]
                ),
                out_col: pa.array(lbl[keep], pa.int64()),
            }
        )

    return state.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
