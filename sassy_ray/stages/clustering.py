"""Transitive closure: iterative min-label propagation over match edges.

Connected components as repeated Ray Data aggregations (SURVEY.md §7.2.7):

    labels(node -> label), init label = node
    repeat:
        msgs    = edges x labels       (labels flow both directions)
        labels' = min over {own label} u {neighbor labels}
                  [per-batch pandas pre-combine, then groupby(node).min]
    until the global label signature stops changing (or max_iters)

Convergence in O(diameter) rounds; duplicate clusters are near-star-shaped so
a handful of rounds suffices.  Each round costs one hash join per edge
direction + one groupby(node) shuffle; the convergence check is a cheap
scalar aggregate (sum of vectorized row hashes), not a join.  At 10^12-doc
scale each round's labels would land in a checkpoint (pipelines/er.py wires
StageCheckpoint through).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["connected_components"]


def _batch_sig(df: pd.DataFrame) -> pd.DataFrame:
    h = pd.util.hash_pandas_object(df["node"] + "\x1f" + df["label"], index=False)
    return pd.DataFrame({"sig": [np.bitwise_xor.reduce(h.to_numpy())], "n": [len(df)]})


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
    - larger: distributed min-label propagation (one groupby(node) + two
      hash joins per round, converging in O(diameter) rounds).
    """
    edges_ds = edges_ds.materialize()
    n_edges_est = edges_ds.count()
    if n_edges_est <= driver_edge_limit:
        return _driver_union_find(edges_ds, nodes_ds)
    labels = nodes_ds.map_batches(
        lambda b: pa.table({"node": b.column("doc_id"), "label": b.column("doc_id")}),
        batch_format="pyarrow",
    )
    edges = edges_ds.map_batches(
        lambda b: pa.table({"src": b.column("doc_id_a"), "dst": b.column("doc_id_b")}),
        batch_format="pyarrow",
    ).materialize()
    n_edges = n_edges_est
    if n_edges == 0:
        return labels.map_batches(
            lambda b: pa.table({"doc_id": b.column("node"), "cluster_id": b.column("label")}),
            batch_format="pyarrow",
        )
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8))
    nparts = max(2, min(edges.num_blocks(), cpus))

    prev_sig = None
    for _ in range(max_iters):
        labels = labels.materialize()
        sigs = labels.map_batches(_batch_sig, batch_format="pandas").to_pandas()
        sig = (int(np.bitwise_xor.reduce(sigs["sig"].to_numpy())), int(sigs["n"].sum()))
        if sig == prev_sig:
            break
        prev_sig = sig

        src_lab = labels.map_batches(
            lambda b: pa.table({"src": b.column("node"), "label": b.column("label")}),
            batch_format="pyarrow",
        )
        dst_lab = labels.map_batches(
            lambda b: pa.table({"dst": b.column("node"), "label": b.column("label")}),
            batch_format="pyarrow",
        )
        msgs_fwd = edges.join(src_lab, join_type="inner", num_partitions=nparts, on=("src",)).map_batches(
            lambda b: pa.table({"node": b.column("dst"), "label": b.column("label")}),
            batch_format="pyarrow",
        )
        msgs_bwd = edges.join(dst_lab, join_type="inner", num_partitions=nparts, on=("dst",)).map_batches(
            lambda b: pa.table({"node": b.column("src"), "label": b.column("label")}),
            batch_format="pyarrow",
        )
        all_msgs = labels.union(msgs_fwd, msgs_bwd)
        # pre-combine inside batches (vectorized pandas), then the wide min
        combined = all_msgs.map_batches(_precombine, batch_format="pandas")
        labels = (
            combined.groupby("node")
            .min("label")
            .map_batches(
                lambda b: pa.table(
                    {"node": b.column("node"), "label": b.column("min(label)")}
                ),
                batch_format="pyarrow",
            )
        )

    return labels.map_batches(
        lambda b: pa.table({"doc_id": b.column("node"), "cluster_id": b.column("label")}),
        batch_format="pyarrow",
    )
