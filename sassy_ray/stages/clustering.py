"""Transitive closure over match edges (SURVEY.md §7.2.7).

Distributed regime: ALTERNATING STAR connected components (Kiveris et al.
2014, "Connected Components in MapReduce and Beyond" — a published
shared-nothing algorithm, re-expressed on Ray Data groupbys):

    repeat:
        large-star: per node u over nbrs N(u) (edges exploded both ways):
            m = min(N(u) ∪ {u}); new edges (m, v) for v ∈ N(u), v > u
        small-star: per node u, N⁻ = {v ∈ N(u): v < u}:
            m = min(N⁻ ∪ {u}); new edges (m, v) for v ∈ N⁻ ∪ {u}, v ≠ m
    until the edge-set signature stops changing (or max_iters)
    labels: one groupby-min over (self rows ∪ converged star edges)

Each star step is ``sort(node)`` + two vectorized block passes — NOT a
``groupby().aggregate()``: Ray's aggregate machinery invokes Python per
GROUP, and star steps have one group per node (measured: a 1 M-edge round
through ``Unique(nbr)`` took minutes of pure per-group overhead, while
``Dataset.sort`` moves the same 2 M rows in ~1 s at 32 CPUs).  After the
sort each node's rows are contiguous within range-partitioned blocks, so
per-node minima are one C-speed pandas groupby per BLOCK; the only
cross-block state is the first/last node of each block, fixed up with a
driver-side correction map of O(2 × num_blocks) rows (scale-safe: blocks,
not rows).  No ``Dataset.join`` anywhere (an earlier two-joins-per-round
hash-min design measured 44 s/round at 100k rows / 8 CPUs, and hash-min
needs O(diameter) rounds, which a chain-shaped component turns into
hundreds of shuffles).  Alternating star converges in O(log² n) rounds
regardless of diameter.  Convergence is exact, not a signature: a round
with zero "merge moves" (large-star: emitted edge whose per-group min !=
the node; small-star: any emitted strictly-smaller-neighbor row) proves
the edge set is already a union of minimum-rooted stars.  At 10^12-doc
scale each round's edge set would land in a checkpoint (pipelines/er.py
wires StageCheckpoint through).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["connected_components"]


def _precombine(df: pd.DataFrame) -> pd.DataFrame:
    return df.groupby("node", as_index=False)["label"].min()


def _numpy_components(ea: np.ndarray, eb: np.ndarray, n: int) -> np.ndarray:
    """Vectorized connected components over integer edge arrays: per round,
    push the min endpoint label across every edge (ufunc.at scatter-min),
    then pointer-jump labels to full compression; converges in
    O(log diameter) rounds — all C-speed, no per-edge Python."""
    label = np.arange(n, dtype=np.int64)
    while True:
        before = label.copy()
        m = np.minimum(label[ea], label[eb])
        np.minimum.at(label, ea, m)
        np.minimum.at(label, eb, m)
        while True:
            nl = label[label]
            if np.array_equal(nl, label):
                break
            label = nl
        if np.array_equal(label, before):
            return label


def _driver_union_find(edges_ds, nodes_ds):
    """Small-edge-set fast path: vectorized components over the edge list on
    the driver, then a broadcast Arrow label table + index_in attach (no
    per-row Python anywhere)."""
    import pandas as pd
    import pyarrow.compute as pc
    import ray

    parts = list(edges_ds.iter_batches(batch_size=262144, batch_format="pyarrow"))
    if parts:
        et = pa.concat_tables(parts)
        both = pa.concat_arrays(
            [et.column("doc_id_a").combine_chunks(), et.column("doc_id_b").combine_chunks()]
        )
        codes, uniq = pd.factorize(both.to_pandas(), sort=True)
        E = len(et)
        label = _numpy_components(codes[:E], codes[E:], len(uniq))
        uniq_arr = pa.array(uniq, pa.string())
        comp_tbl = pa.table(
            {"doc_id": uniq_arr, "cluster_id": uniq_arr.take(pa.array(label))}
        )
    else:
        comp_tbl = pa.table(
            {"doc_id": pa.array([], pa.string()), "cluster_id": pa.array([], pa.string())}
        )
    comp_ref = ray.put(comp_tbl)

    def label_batch(batch: pa.Table) -> pa.Table:
        lt = ray.get(comp_ref)
        ids = pc.cast(batch.column("doc_id"), pa.string())
        taken = pc.take(
            lt.column("cluster_id").combine_chunks(),
            pc.index_in(ids, value_set=lt.column("doc_id").combine_chunks()),
        )
        return pa.table(
            {"doc_id": batch.column("doc_id"), "cluster_id": pc.coalesce(taken, ids)}
        )

    return nodes_ds.map_batches(label_batch, batch_format="pyarrow")


def connected_components(
    edges_ds, nodes_ds, max_iters: int = 25, driver_edge_limit: int = 2_000_000
):
    """edges (doc_id_a, doc_id_b) + nodes (doc_id) -> (doc_id, cluster_id).

    ``cluster_id`` is the lexicographic min doc_id of the component.

    Two regimes (the guide's rule: union-find on the driver only when the
    edge set is provably small):
    - edge count <= ``driver_edge_limit``: pull ONLY the edge list (not the
      corpus) to the driver, union-find there, broadcast the component map
      back through ``ray.put`` and label nodes in one map_batches pass;
    - larger: distributed alternating-star rounds (one groupby per star
      step, O(log^2 n) rounds independent of component diameter), then one
      groupby-min labeling pass.
    """
    edges_ds = edges_ds.materialize()
    n_edges_est = edges_ds.count()
    if n_edges_est <= driver_edge_limit:
        return _driver_union_find(edges_ds, nodes_ds)
    if n_edges_est == 0:
        return nodes_ds.map_batches(
            lambda b: pa.table(
                {"doc_id": b.column("doc_id"), "cluster_id": b.column("doc_id")}
            ),
            batch_format="pyarrow",
        )

    import ray
    import ray.data as rd

    def _local_contract(b: pa.Table) -> pa.Table:
        """Contract each edge batch to its LOCAL spanning stars before any
        shuffle (vectorized numpy union-find per batch).  Pairs arrive
        grouped by block key, so most clusters collapse to one star edge
        here and the global rounds only stitch across batches — fewer and
        smaller distributed iterations."""
        a = b.column("doc_id_a").combine_chunks()
        c = b.column("doc_id_b").combine_chunks()
        both = pa.concat_arrays([a, c])
        codes, uniq = pd.factorize(both.to_pandas(), sort=True)
        E = len(a)
        label = _numpy_components(codes[:E], codes[E:], len(uniq))
        uniq_np = np.asarray(uniq, dtype=object)
        node = np.arange(len(uniq), dtype=np.int64)
        keep = label != node  # roots need no edge
        return pa.table(
            {
                "lo": pa.array(uniq_np[label[keep]], pa.string()),
                "hi": pa.array(uniq_np[keep], pa.string()),
            }
        )

    def _explode(b: pa.Table) -> pa.Table:
        a = b.column("lo").combine_chunks()
        c = b.column("hi").combine_chunks()
        return pa.table(
            {"node": pa.concat_arrays([a, c]), "nbr": pa.concat_arrays([c, a])}
        )

    def _cols(b: pa.Table, names):
        return tuple(
            np.asarray(b.column(n).to_pandas(), dtype=object) for n in names
        )

    def _groups(node: np.ndarray):
        """Group codes + start offsets for an array already sorted by node."""
        change = np.flatnonzero(node[1:] != node[:-1]) + 1
        codes = np.zeros(len(node), np.int64)
        codes[change] = 1
        np.cumsum(codes, out=codes)
        starts = np.concatenate([np.zeros(1, np.int64), change])
        return codes, starts

    _EMPTY_PARTIAL = pa.table(
        {"node": pa.array([], pa.string()), "pmin": pa.array([], pa.string())}
    )
    _EMPTY_EDGES = pa.table(
        {
            "lo": pa.array([], pa.string()),
            "hi": pa.array([], pa.string()),
            "mv": pa.array([], pa.int64()),
        }
    )

    def _boundary_partials(b: pa.Table, small: bool, val_col: str) -> pa.Table:
        """Per-block min of ``val_col`` for the block's FIRST and LAST node
        groups only — the driver merges these O(2 x num_blocks) rows into
        the cross-block correction map."""
        if b.num_rows == 0:
            return _EMPTY_PARTIAL
        node, val = _cols(b, ["node", val_col])
        sel = (node == node[0]) | (node == node[-1])
        nds, vals = node[sel], val[sel]
        if small:
            keep = vals < nds
            nds, vals = nds[keep], vals[keep]
        if not len(nds):
            return _EMPTY_PARTIAL
        df = pd.DataFrame({"node": nds, "pmin": vals}).groupby(
            "node", as_index=False
        )["pmin"].min()
        return pa.table(
            {
                "node": pa.array(df["node"], pa.string()),
                "pmin": pa.array(df["pmin"], pa.string()),
            }
        )

    def _collect_corr(sorted_ds, small: bool, val_col: str) -> dict:
        parts = sorted_ds.map_batches(
            lambda b: _boundary_partials(b, small, val_col),
            batch_format="pyarrow",
        ).take_all()
        corr: dict = {}
        for row in parts:
            n, v = row["node"], row["pmin"]
            if n not in corr or v < corr[n]:
                corr[n] = v
        return corr

    def _group_mins(node, codes, starts, vals, mask, corr):
        """m[g] = min over masked vals in group g, the group's node, and the
        boundary correction (first/last groups only).  Object-dtype strings;
        the groupby is pandas C, the rest O(num_groups) fancy indexing."""
        m = node[starts].copy()
        if mask.any():
            gmin = pd.Series(vals[mask]).groupby(codes[mask]).min()
            gi = gmin.index.to_numpy()
            gv = gmin.to_numpy()
            lt = gv < m[gi]
            m[gi[lt]] = gv[lt]
        for g in (0, len(m) - 1):
            c = corr.get(node[starts[g]])
            if c is not None and c < m[g]:
                m[g] = c
        return m

    def _star_emit(b: pa.Table, small: bool, corr: dict) -> pa.Table:
        if b.num_rows == 0:
            return _EMPTY_EDGES
        node, nbr = _cols(b, ["node", "nbr"])
        codes, starts = _groups(node)
        # local exact dedup of (node, nbr) rows (groups stay contiguous)
        dup = pd.DataFrame({"c": codes, "v": nbr}).duplicated().to_numpy()
        if dup.any():
            keep = ~dup
            node, nbr, codes = node[keep], nbr[keep], codes[keep]
            starts = np.concatenate(
                [np.zeros(1, np.int64), np.flatnonzero(codes[1:] != codes[:-1]) + 1]
            )
        mask = (nbr < node) if small else np.ones(len(nbr), bool)
        m = _group_mins(node, codes, starts, nbr, mask, corr)
        grp_node = node[starts]
        if small:
            g = codes[mask]
            v = nbr[mask]
            mvrow = v != m[g]
            lo_a, hi_a = m[g[mvrow]], v[mvrow]
            # self rows (m, u) for strictly-interior groups; boundary groups'
            # self rows are emitted once by the driver from the corr map
            interior = np.ones(len(m), bool)
            interior[0] = interior[-1] = False
            selfg = interior & (m != grp_node)
            lo = np.concatenate([lo_a, m[selfg]])
            hi = np.concatenate([hi_a, grp_node[selfg]])
            mv = np.concatenate(
                [np.ones(len(lo_a), np.int64), np.zeros(int(selfg.sum()), np.int64)]
            )
        else:
            emit = nbr > node
            g = codes[emit]
            lo, hi = m[g], nbr[emit]
            mv = (lo != node[emit]).astype(np.int64)
        if not len(lo):
            return _EMPTY_EDGES
        return pa.table(
            {
                "lo": pa.array(lo, pa.string()),
                "hi": pa.array(hi, pa.string()),
                "mv": pa.array(mv, pa.int64()),
            }
        )

    def _star(edges, small: bool):
        """One star step = sort + boundary-correction map + vectorized emit.
        Returns (emitted edges [materialized], total merge moves)."""
        sorted_ds = (
            edges.map_batches(_explode, batch_format="pyarrow")
            .sort("node")
            .materialize()
        )
        corr = _collect_corr(sorted_ds, small, "nbr")
        out = sorted_ds.map_batches(
            lambda b: _star_emit(b, small, corr), batch_format="pyarrow"
        )
        if small and corr:
            bnodes = sorted(corr)
            drv = pa.table(
                {
                    "lo": pa.array([corr[n] for n in bnodes], pa.string()),
                    "hi": pa.array(bnodes, pa.string()),
                    "mv": pa.array(np.zeros(len(bnodes), np.int64)),
                }
            )
            out = out.union(rd.from_arrow(drv))
        out = out.materialize()
        moves = out.sum("mv") or 0
        return out, int(moves)

    edges = edges_ds.map_batches(
        _local_contract, batch_format="pyarrow"
    ).materialize()

    converged = False
    for _ in range(max_iters):
        mid, lg_moves = _star(edges, small=False)
        edges, sm_moves = _star(mid, small=True)
        if lg_moves == 0 and sm_moves == 0:
            converged = True
            break
    if not converged:
        # the final labeling pass is only correct on a union of min-rooted
        # stars (the zero-move fixpoint); finishing early would silently
        # mislabel.  Alternating-star converges in O(log^2 n) rounds, so
        # hitting the cap means the caller's max_iters is too small.
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} star rounds; "
            "raise max_iters (alternating-star needs O(log^2 n) rounds)"
        )

    # converged: one minimum-rooted star per component.  Label = per-node
    # min over self rows + (hi -> lo) rows, via the same sorted-pass trick.
    label_rows = nodes_ds.map_batches(
        lambda b: pa.table(
            {"node": b.column("doc_id"), "label": b.column("doc_id")}
        ),
        batch_format="pyarrow",
    ).union(
        edges.map_batches(
            lambda b: pa.table({"node": b.column("hi"), "label": b.column("lo")}),
            batch_format="pyarrow",
        )
    )
    sorted_lab = (
        label_rows.map_batches(_precombine, batch_format="pandas")
        .sort("node")
        .materialize()
    )
    lab_corr = _collect_corr(sorted_lab, small=False, val_col="label")

    def _label_emit(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.string()),
                    "cluster_id": pa.array([], pa.string()),
                }
            )
        node, label = _cols(b, ["node", "label"])
        codes, starts = _groups(node)
        m = _group_mins(
            node, codes, starts, label, np.ones(len(label), bool), {}
        )
        grp_node = node[starts]
        interior = np.ones(len(m), bool)
        interior[0] = interior[-1] = False
        return pa.table(
            {
                "doc_id": pa.array(grp_node[interior], pa.string()),
                "cluster_id": pa.array(m[interior], pa.string()),
            }
        )

    out = sorted_lab.map_batches(_label_emit, batch_format="pyarrow")
    if lab_corr:
        bnodes = sorted(lab_corr)
        drv = pa.table(
            {
                "doc_id": pa.array(bnodes, pa.string()),
                "cluster_id": pa.array(
                    [min(lab_corr[n], n) for n in bnodes], pa.string()
                ),
            }
        )
        out = out.union(rd.from_arrow(drv))
    return out
