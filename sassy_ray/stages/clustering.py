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

Each star step needs rows grouped PER NODE, not globally ordered, so the
rounds run on a manual hash exchange over raw Ray tasks (the same pattern
as ``stages/pairs._pairs_exchange``): every edge block explodes and splits
by ``hash(node)`` into NP sub-tables (num_returns=NP, ref-only — the
driver holds ObjectRefs and one integer move-count per part per round),
and each part's emit sees COMPLETE node groups — one local C-speed sort +
vectorized group-min per part, no boundary state anywhere.  Two earlier
designs this replaces, both measured: ``groupby().aggregate(Unique)``
(minutes of per-group Python at 1M edges) and ``Dataset.sort(node)`` +
driver-side block-boundary correction (~150k rows/s sort constants
regardless of CPUs — it had become the ER pipeline's dominant stage at 7M
docs once the native kernel sped scoring 4x).  No ``Dataset.join``
anywhere (two-joins-per-round hash-min measured 44 s/round at 100k rows /
8 CPUs, and hash-min needs O(diameter) rounds).  Alternating star
converges in O(log² n) rounds regardless of diameter.  Convergence is exact, not a signature: a round
with zero "merge moves" (large-star: emitted edge whose per-group min !=
the node; small-star: any emitted strictly-smaller-neighbor row) proves
the edge set is already a union of minimum-rooted stars.  At 10^12-doc
scale each round's edge set would land in a checkpoint (pipelines/er.py
wires StageCheckpoint through).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["connected_components"]



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
    the driver, then a broadcast Arrow label table attached through the
    per-worker-cached sorted-hash lookup (no per-row Python anywhere).

    Two measured serial/overhead sinks this path used to have at ~1.5M
    edges / 1.2M docs: pandas ``factorize(sort=True)`` boxed every edge
    endpoint into a Python object (~3 s serial — replaced by Arrow
    dictionary_encode + a sorted-rank remap, all C), and the per-batch
    ``pc.index_in`` attach rebuilt a corpus-sized hash table for every
    node batch (~0.3 s x 96 batches — replaced by ``scoring._DocLookup``,
    whose polars sorted-hash index builds once per worker)."""
    import pyarrow.compute as pc
    import ray

    from sassy_ray.stages.pairs import _sorted_string_codes
    from sassy_ray.stages.scoring import _resolve_docs

    parts = list(edges_ds.iter_batches(batch_size=262144, batch_format="pyarrow"))
    if parts:
        et = pa.concat_tables(parts)
        # accepts raw (doc_id_a, doc_id_b) or contracted (lo, hi) edges
        ca, cb = (
            ("doc_id_a", "doc_id_b") if "doc_id_a" in et.schema.names else ("lo", "hi")
        )
        both = pa.concat_arrays(
            [
                pc.cast(et.column(ca), pa.string()).combine_chunks(),
                pc.cast(et.column(cb), pa.string()).combine_chunks(),
            ]
        )
        codes, uniq_arr = _sorted_string_codes(both)
        E = len(et)
        label = _numpy_components(codes[:E], codes[E:], len(uniq_arr))
        # "text" column name: reuses the scorer's broadcast-lookup cache
        # machinery (_resolve_docs -> _DocLookup) verbatim
        comp_tbl = pa.table(
            {"doc_id": uniq_arr, "text": uniq_arr.take(pa.array(label))}
        )
    else:
        comp_tbl = pa.table(
            {"doc_id": pa.array([], pa.string()), "text": pa.array([], pa.string())}
        )
    comp_ref = ray.put(comp_tbl)
    # the sorted-hash index over the label ids builds once HERE (driver) and
    # broadcasts — not once per worker (scoring.build_hash_index docstring)
    from sassy_ray.stages.scoring import build_hash_index

    hidx = build_hash_index(comp_tbl.column("doc_id"))
    hidx_ref = ray.put(hidx) if hidx else None

    def label_batch(batch: pa.Table) -> pa.Table:
        lk = _resolve_docs(comp_ref, hidx_ref)
        ids = pc.cast(batch.column("doc_id"), pa.string())
        taken = lk.take_arrow(ids, fill=None)
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
    edge set is provably small).  Every call first CONTRACTS each edge
    batch to its local spanning stars in one parallel pass (vectorized
    numpy union-find per batch — pairs arrive grouped by block key, so most
    clusters collapse to one star edge right there), and the regime choice
    compares the CONTRACTED edge count — which is exactly what the driver
    path would have to hold:
    - star edges <= ``driver_edge_limit``: pull ONLY the contracted edge
      list (not the corpus) to the driver, union-find there, broadcast the
      component map back through ``ray.put`` and label nodes in one
      map_batches pass;
    - larger: distributed alternating-star rounds (one hash exchange per
      star step, O(log^2 n) rounds independent of component diameter), then
      one per-node-min labeling pass.
    """
    from sassy_ray.stages.pairs import _sorted_string_codes

    def _local_contract(b: pa.Table) -> pa.Table:
        """Contract each edge batch to its LOCAL spanning stars before any
        shuffle (vectorized numpy union-find per batch)."""
        a = b.column("doc_id_a").combine_chunks()
        c = b.column("doc_id_b").combine_chunks()
        both = pa.concat_arrays([a, c])
        codes, uniq_arr = _sorted_string_codes(both)
        E = len(a)
        label = _numpy_components(codes[:E], codes[E:], len(uniq_arr))
        node = np.arange(len(uniq_arr), dtype=np.int64)
        keep = label != node  # roots need no edge
        return pa.table(
            {
                "lo": uniq_arr.take(pa.array(label[keep])),
                "hi": uniq_arr.take(pa.array(node[keep])),
            }
        )

    import os as _os
    import sys as _sys
    import time as _time

    _prof = bool(_os.environ.get("SASSY_CC_PROF"))
    _t0 = _time.time()
    # one pass over the raw edges: filter/lineage upstream, contract here —
    # the former flow materialized the raw edge set once just to COUNT it,
    # then contracted in a second pass
    edges0 = edges_ds.map_batches(_local_contract, batch_format="pyarrow").materialize()
    n_stars = edges0.count()
    if _prof:
        print(f"[cc] contract {_time.time() - _t0:.2f}s ({n_stars} star edges)", file=_sys.stderr)
    if n_stars == 0:
        return nodes_ds.map_batches(
            lambda b: pa.table(
                {"doc_id": b.column("doc_id"), "cluster_id": b.column("doc_id")}
            ),
            batch_format="pyarrow",
        )
    if n_stars <= driver_edge_limit:
        return _driver_union_find(edges0, nodes_ds)

    import ray
    import ray.data as rd

    _I64_MAX = np.iinfo(np.int64).max

    def _star_emit_codes(node, nbr, small: bool):
        """One star step over a part's COMPLETE node groups, on int64 codes
        sorted by (node, nbr) — all group math is reduceat/fancy-indexing C.
        (The previous object-dtype version np.lexsorted Python strings —
        ~150 s of the 4-CPU clusters stage at 2.4M docs was element-wise
        PyUnicode comparisons.)  Returns (lo, hi, mv) code arrays."""
        keep = np.empty(len(node), dtype=bool)
        keep[0] = True
        keep[1:] = (node[1:] != node[:-1]) | (nbr[1:] != nbr[:-1])
        node, nbr = node[keep], nbr[keep]
        gb = np.empty(len(node), dtype=bool)
        gb[0] = True
        gb[1:] = node[1:] != node[:-1]
        starts = np.nonzero(gb)[0]
        codes = np.cumsum(gb) - 1
        grp_node = node[starts]
        if small:
            mask = nbr < node
            vals = np.where(mask, nbr, _I64_MAX)
        else:
            vals = nbr
        m = np.minimum(np.minimum.reduceat(vals, starts), grp_node)
        if small:
            g = codes[mask]
            v = nbr[mask]
            mvrow = v != m[g]
            lo_a, hi_a = m[g[mvrow]], v[mvrow]
            # self rows (m, u) for every group whose min beat the node
            # (the exchange guarantees complete groups — no boundary cases)
            selfg = m != grp_node
            lo = np.concatenate([lo_a, m[selfg]])
            hi = np.concatenate([hi_a, grp_node[selfg]])
            n_moves = int(len(lo_a))
        else:
            emit = nbr > node
            g = codes[emit]
            lo, hi = m[g], nbr[emit]
            n_moves = int((lo != node[emit]).sum())
        return lo, hi, n_moves

    # ---- hash-exchange rounds (raw Ray tasks) ---------------------------
    # Each star step needs rows grouped PER NODE, not globally ordered:
    # a hash exchange on the node column co-locates every node's rows in
    # one part, so the per-part emit sees complete groups — the Dataset
    # sort (the stage's former cost center: ~150k rows/s regardless of
    # CPUs) and the whole boundary-correction machinery disappear.  Ref
    # orchestration mirrors stages/pairs._pairs_exchange: the driver holds
    # only ObjectRefs; per-round sync is one ray.get of NP move COUNTS.
    import os as _os

    _np_env = _os.environ.get("SASSY_CC_NP")
    NP = (
        int(_np_env)
        if _np_env
        else max(2, min(64, int(ray.cluster_resources().get("CPU", 8)) * 2))
    )

    def _node_parts(arr: pa.Array) -> np.ndarray:
        """Partition of each node string — polars' vectorized hash (no
        per-value Python objects; deterministic across worker processes for
        a fixed polars version, which is all the within-job exchange needs)."""
        import polars as pl

        h = pl.from_arrow(arr).hash(seed=7).to_numpy()
        return (h % np.uint64(NP)).astype(np.int64)

    def _split_table(t: pa.Table, part: np.ndarray):
        order = np.argsort(part, kind="stable")
        t = t.take(pa.array(order))
        bounds = np.searchsorted(part[order], np.arange(NP + 1))
        return tuple(
            t.slice(int(bounds[i]), int(bounds[i + 1] - bounds[i]))
            for i in range(NP)
        )

    _EMPTY_NN = pa.table(
        {"node": pa.array([], pa.string()), "nbr": pa.array([], pa.string())}
    )

    def _explode_split(lo_arr: pa.Array, hi_arr: pa.Array):
        """(lo, hi) edge arrays -> NP (node, nbr) sub-tables split by
        hash(node): every edge contributes both directions, so each part
        sees the COMPLETE neighbor group of its nodes next round."""
        node = pa.concat_arrays([lo_arr, hi_arr])
        nbr = pa.concat_arrays([hi_arr, lo_arr])
        t = pa.table({"node": node, "nbr": nbr})
        return _split_table(t, _node_parts(node))

    @ray.remote
    def _split_star(*tbls):
        """Round-0 entry split over a GROUP of contracted edge blocks (the
        pairs-exchange coalescing lesson: per-block split tasks at a
        hundreds-of-blocks corpus create blocks x NP tiny objects and a
        blocks-wide fan-in per part)."""
        live = [t for t in tbls if t.num_rows and "lo" in t.schema.names]
        if not live:
            return tuple(_EMPTY_NN for _ in range(NP))
        tbl = live[0] if len(live) == 1 else pa.concat_tables(live)
        return _explode_split(
            tbl.column("lo").combine_chunks(), tbl.column("hi").combine_chunks()
        )

    @ray.remote
    def _part_star(small: bool, *tables):
        """One star step over a part's complete node groups, FUSED with the
        next round's exchange: the emitted edges leave this task already
        exploded and hash-split by node (num_returns=NP+1; the last return
        is the part's merge-move count).  The unfused form shipped each
        round's edge set through the object store twice (part -> split ->
        part); this is the same halving the pairs exchange got from
        coalescing, applied to the per-round hop count.

        (A per-part zero-move passthrough — return the input at slot p —
        was tried and is UNSOUND: when a neighboring part rewrites an edge
        in the same step, the zero-move part keeps its stale direction row,
        the graph goes direction-asymmetric, and the zero-move fixpoint can
        then certify a non-star graph — the label-propagation test caught
        real mislabels.  Cheap convergence checks must be GLOBAL:
        ``_part_star_detect`` below.)"""
        live = [t for t in tables if t.num_rows]
        if not live:
            return (*(_EMPTY_NN for _ in range(NP)), 0)
        b = pa.concat_tables(live).combine_chunks()
        n = b.num_rows
        both, uniq_arr = _sorted_string_codes(
            pa.concat_arrays(
                [b.column("node").combine_chunks(), b.column("nbr").combine_chunks()]
            )
        )
        node_c, nbr_c = both[:n], both[n:]
        order = np.lexsort((nbr_c, node_c))
        lo, hi, n_moves = _star_emit_codes(node_c[order], nbr_c[order], small)
        if not len(lo):
            return (*(_EMPTY_NN for _ in range(NP)), 0)
        return (
            *_explode_split(uniq_arr.take(pa.array(lo)), uniq_arr.take(pa.array(hi))),
            n_moves,
        )

    @ray.remote
    def _part_star_detect(small: bool, *tables) -> int:
        """Detect-only star step: group mins + move count WITHOUT the
        emit/explode/split half.  Mutates nothing, so it is sound at any
        time; when ALL parts report zero the full step would have been
        graph-identity and the caller keeps its current splits.  Used for
        the convergence-verification rounds, which otherwise pay a full
        re-exchange of an unchanged edge set just to prove zero moves."""
        live = [t for t in tables if t.num_rows]
        if not live:
            return 0
        b = pa.concat_tables(live).combine_chunks()
        n = b.num_rows
        both, _uniq = _sorted_string_codes(
            pa.concat_arrays(
                [b.column("node").combine_chunks(), b.column("nbr").combine_chunks()]
            )
        )
        node_c, nbr_c = both[:n], both[n:]
        order = np.lexsort((nbr_c, node_c))
        _lo, _hi, n_moves = _star_emit_codes(node_c[order], nbr_c[order], small)
        return n_moves

    def _grouped(refs: list) -> list[list]:
        """Coalesce N ObjectRefs into <= NP contiguous groups (ref lists)."""
        ng = min(len(refs), NP)
        return [
            refs[len(refs) * g // ng : len(refs) * (g + 1) // ng]
            for g in range(ng)
            if refs[len(refs) * g // ng : len(refs) * (g + 1) // ng]
        ]

    # round-0 split over coalesced input groups (edges0 is the contracted
    # star-edge set from the shared pass above); afterwards every star step
    # is ONE task wave (the split rides inside _part_star's returns)
    splits = [
        _split_star.options(num_returns=NP).remote(*grp)
        for grp in _grouped(list(edges0.to_arrow_refs()))
    ]

    converged = False
    prev_round_moves = None
    for _r in range(max_iters):
        round_moves = []
        for small in (False, True):
            _ts = _time.time()
            # detect-first once the previous round nearly stalled: the next
            # round is then almost certainly the zero-move verification
            # round, and a global zero detect proves the full step would be
            # graph-identity — splits stay as they are.  A wrong guess costs
            # one detect pass (~the sort half of the step) before the full
            # step runs; the threshold keeps that to the convergence tail.
            if prev_round_moves is not None and prev_round_moves <= NP:
                mv = sum(
                    ray.get(
                        [
                            _part_star_detect.remote(small, *[s[p] for s in splits])
                            for p in range(NP)
                        ]
                    )
                )
                if mv == 0:
                    round_moves.append(0)
                    if _prof:
                        print(
                            f"[cc] round {_r} {'small' if small else 'large'}-star "
                            f"detect {_time.time() - _ts:.2f}s moves=0",
                            file=_sys.stderr,
                        )
                    continue
            rets = [
                _part_star.options(num_returns=NP + 1).remote(
                    small, *[s[p] for s in splits]
                )
                for p in range(NP)
            ]
            splits = [r[:NP] for r in rets]
            round_moves.append(sum(ray.get([r[NP] for r in rets])))
            if _prof:
                print(
                    f"[cc] round {_r} {'small' if small else 'large'}-star "
                    f"{_time.time() - _ts:.2f}s moves={round_moves[-1]}",
                    file=_sys.stderr,
                )
        if round_moves[0] == 0 and round_moves[1] == 0:
            converged = True
            break
        prev_round_moves = round_moves[0] + round_moves[1]
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
    # min over self rows + (hi -> lo) rows.  The last star round's fused
    # outputs are ALREADY the exploded star edges split by hash(node): every
    # converged edge is strictly lo < hi, so a part's rows with node > nbr
    # are exactly its (hi -> lo) label rows — no label re-exchange of the
    # edge set at all; only the node self rows split here.
    _EMPTY_LAB = pa.table(
        {"node": pa.array([], pa.string()), "label": pa.array([], pa.string())}
    )

    @ray.remote
    def _split_nodes(*tbls):
        live = [t for t in tbls if t.num_rows and "doc_id" in t.schema.names]
        if not live:
            return tuple(_EMPTY_LAB for _ in range(NP))
        tbl = live[0] if len(live) == 1 else pa.concat_tables(live)
        ids = tbl.column("doc_id").combine_chunks()
        t = pa.table({"node": ids, "label": ids})
        return _split_table(t, _node_parts(ids))

    @ray.remote
    def _part_label(*tables):
        live = []
        for t in tables:
            if not t.num_rows:
                continue
            if "nbr" in t.schema.names:  # fused star split: keep hi -> lo rows
                node = t.column("node").combine_chunks()
                nbr = t.column("nbr").combine_chunks()
                import pyarrow.compute as pc

                mask = pc.greater(node, nbr)
                t = pa.table({"node": node.filter(mask), "label": nbr.filter(mask)})
                if not t.num_rows:
                    continue
            live.append(t)
        if not live:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.string()),
                    "cluster_id": pa.array([], pa.string()),
                }
            )
        b = pa.concat_tables(live).combine_chunks()
        n = b.num_rows
        both, uniq_arr = _sorted_string_codes(
            pa.concat_arrays(
                [b.column("node").combine_chunks(), b.column("label").combine_chunks()]
            )
        )
        node_c, lab_c = both[:n], both[n:]
        order = np.lexsort((lab_c, node_c))
        node_c, lab_c = node_c[order], lab_c[order]
        gb = np.empty(n, dtype=bool)
        gb[0] = True
        gb[1:] = node_c[1:] != node_c[:-1]
        starts = np.nonzero(gb)[0]
        grp_node = node_c[starts]
        m = np.minimum(np.minimum.reduceat(lab_c, starts), grp_node)
        return pa.table(
            {
                "doc_id": uniq_arr.take(pa.array(grp_node)),
                "cluster_id": uniq_arr.take(pa.array(m)),
            }
        )

    _tl = _time.time()
    node_refs = list(nodes_ds.materialize().to_arrow_refs())
    if _prof:
        print(f"[cc] nodes mat {_time.time() - _tl:.2f}s", file=_sys.stderr)
    lab_splits = [
        _split_nodes.options(num_returns=NP).remote(*grp)
        for grp in _grouped(node_refs)
    ] + list(splits)
    final_refs = [
        _part_label.remote(*[s[p] for s in lab_splits]) for p in range(NP)
    ]
    return rd.from_arrow_refs(final_refs)

