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

Each star step is ONE ``groupby(node).aggregate(Unique(nbr))`` plus a
vectorized emit — no ``Dataset.join`` anywhere (an earlier
two-joins-per-round hash-min design measured 44 s/round at 100k rows / 8
CPUs: join aggregator actors dominate; and hash-min needs O(diameter)
rounds, which a chain-shaped giant component turns into hundreds of
shuffles).  Alternating star converges in O(log² n) rounds regardless of
diameter, and the edge set collapses toward stars so later rounds shrink.
The convergence check is a cheap scalar aggregate (xor of vectorized row
hashes), not a join.  At 10^12-doc scale each round's edge set would land
in a checkpoint (pipelines/er.py wires StageCheckpoint through).
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

    from ray.data.aggregate import Min, Unique

    def _explode(b: pa.Table) -> pa.Table:
        a = b.column("lo").combine_chunks()
        c = b.column("hi").combine_chunks()
        return pa.table(
            {"node": pa.concat_arrays([a, c]), "nbr": pa.concat_arrays([c, a])}
        )

    def _star_emit(b: pa.Table, small: bool) -> pa.Table:
        """One star step's emit over (node, unique(nbr)) groups — per-group
        string mins via a pandas C groupby over parent indices, the rest
        numpy masks; no per-group Python loop."""
        import pyarrow.compute as pc

        node = np.asarray(b.column("node").to_pandas(), dtype=object)
        nbrs = b.column("unique(nbr)").combine_chunks()
        flat_arr = pc.list_flatten(nbrs)
        parent_arr = pc.list_parent_indices(nbrs)
        flat = np.asarray(flat_arr.to_pandas(), dtype=object)
        parent = np.asarray(parent_arr.to_pandas(), dtype=np.int64)
        node_per = node[parent]
        empty = pa.table(
            {"lo": pa.array([], pa.string()), "hi": pa.array([], pa.string())}
        )
        if small:
            mask = flat < node_per
            sub, subp = flat[mask], parent[mask]
            gmin = pd.Series(sub).groupby(subp).min()
            m = node.copy()  # N- empty -> m = u
            m[gmin.index.to_numpy()] = gmin.to_numpy()
            # emit (m, v) for v in N- with v != m, plus (m, u) where u != m
            m_sub = m[subp]
            keep = sub != m_sub
            self_keep = node != m
            lo = np.concatenate([m_sub[keep], m[self_keep]])
            hi = np.concatenate([sub[keep], node[self_keep]])
        else:
            gmin = pd.Series(flat).groupby(parent).min()
            m = node.copy()
            g_idx = gmin.index.to_numpy()
            g_val = gmin.to_numpy()
            smaller = g_val < m[g_idx]
            m[g_idx[smaller]] = g_val[smaller]
            mask = flat > node_per  # v > u  (v > u >= m, so v != m)
            lo = m[parent[mask]]
            hi = flat[mask]
        if not len(lo):
            return empty
        df = pd.DataFrame({"lo": lo, "hi": hi}).drop_duplicates()
        return pa.table(
            {
                "lo": pa.array(df["lo"], pa.string()),
                "hi": pa.array(df["hi"], pa.string()),
            }
        )

    def _star(edges, small: bool):
        return (
            edges.map_batches(_explode, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Unique("nbr"))
            .map_batches(
                lambda b: _star_emit(b, small),
                batch_format="pyarrow",
            )
        )

    def _edge_sig(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df["lo"] + "\x1f" + df["hi"], index=False)
        return pd.DataFrame(
            {"sig": [np.bitwise_xor.reduce(h.to_numpy())], "n": [len(df)]}
        )

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

    edges = edges_ds.map_batches(
        _local_contract, batch_format="pyarrow"
    ).materialize()

    prev_sig = None
    for _ in range(max_iters):
        edges = _star(_star(edges, small=False), small=True).materialize()
        sigs = edges.map_batches(_edge_sig, batch_format="pandas").to_pandas()
        sig = (
            int(np.bitwise_xor.reduce(sigs["sig"].to_numpy())),
            int(sigs["n"].sum()),
        )
        if sig == prev_sig:
            break
        prev_sig = sig

    # converged star edges: every non-root node points at its component
    # min.  Labels = groupby-min over self rows + (hi -> lo) rows.
    self_rows = nodes_ds.map_batches(
        lambda b: pa.table(
            {"node": b.column("doc_id"), "label": b.column("doc_id")}
        ),
        batch_format="pyarrow",
    )
    star_rows = edges.map_batches(
        lambda b: pa.table({"node": b.column("hi"), "label": b.column("lo")}),
        batch_format="pyarrow",
    )
    return (
        self_rows.union(star_rows)
        .map_batches(_precombine, batch_format="pandas")
        .groupby("node")
        .aggregate(Min("label"))
        .map_batches(
            lambda b: pa.table(
                {"doc_id": b.column("node"), "cluster_id": b.column("min(label)")}
            ),
            batch_format="pyarrow",
        )
    )
