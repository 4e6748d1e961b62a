"""Candidate-pair generation from block rows, with explicit skew handling.

``groupby(block_key).map_groups(emit_pairs)`` over the blocking output:

- singleton groups emit nothing;
- groups larger than ``salt_cap`` are *salted*: docs are split into
  ``ceil(size / salt_cap)`` deterministic sub-buckets (stable hash of doc_id)
  and pairs are emitted within sub-buckets only — bounded work per group at
  a documented recall tradeoff (near-dups share many band keys, so they get
  other chances);
- per-(sub)group pair count is additionally capped at ``max_pairs_per_group``
  over adjacent doc_ids (sorted), with truncation counted in a metrics column;
- pairs are canonical (doc_id_a < doc_id_b) and exactly deduped by a second
  ``groupby`` on the pair key (hash partition + first — SURVEY.md §2.7 D1).

The reference's analogue is the all-vs-all barcode self-join
(/root/reference/examples/all_vs_all_barcodes.rs:1-48) — there a full
cartesian product, here LSH-restricted.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd

__all__ = ["PairGenConfig", "make_pairs_dataset"]


class PairGenConfig:
    def __init__(
        self,
        salt_cap: int = 64,
        max_pairs_per_group: int = 2048,
        # below this PRE-dedup pair count, exact dedup runs as ONE pandas
        # hash-dedup task (~2 s at 20M rows) instead of a sort-based
        # groupby shuffle (~100k rows/s here — 10x slower at these sizes);
        # the partitioned path remains the 10^12-doc route
        single_task_dedup_limit: int = 20_000_000,
        # below this BLOCK-ROW count the whole group->emit->dedup chain runs
        # as one vectorized task (factorize + lexsort + size-class triu +
        # integer-key unique, ~1-2 s at millions of rows) — Ray's sort-based
        # groupby costs ~100k rows/s here, so the shuffle only pays off far
        # beyond single-node sizes; the groupby path remains for 10^12 docs
        single_task_rows_limit: int = 12_000_000,
        # manual hash-exchange path (raw Ray tasks): each input block splits
        # by block_key hash into nparts sub-tables, each part runs the SAME
        # vectorized group->emit->dedup on its shard, cross-part pair dups
        # fall to a second (pair-key) exchange.  Engaged when >1 CPU and the
        # input fits nparts worker heaps — a part must hold rows/nparts
        # rows, so beyond the limit the spill-capable Dataset groupby takes
        # over (the 10^12-doc route).  None (default) derives the limit from
        # the cluster's per-CPU heap at call time (a fixed row count was the
        # classic breaks-at-10x config: a 28M-doc corpus fell off the
        # exchange onto the ~100x-slower groupby while each exchange part
        # would have held a comfortable ~3.5M rows); pass an int to pin it,
        # 0 to force the groupby route.
        exchange_rows_limit: int | None = None,
    ) -> None:
        self.salt_cap = salt_cap
        self.max_pairs_per_group = max_pairs_per_group
        self.single_task_dedup_limit = single_task_dedup_limit
        self.single_task_rows_limit = single_task_rows_limit
        self.exchange_rows_limit = exchange_rows_limit

    def fingerprint(self) -> str:
        return f"pairs(cap={self.salt_cap},maxp={self.max_pairs_per_group})"


def _emit_group_pairs(ids: list[str], cfg: PairGenConfig, a_out: list, b_out: list) -> None:
    n = len(ids)
    if n < 2:
        return
    if n > cfg.salt_cap:
        n_buckets = -(-n // cfg.salt_cap)
        buckets: list[list[str]] = [[] for _ in range(n_buckets)]
        for d in ids:
            buckets[zlib.crc32(d.encode()) % n_buckets].append(d)
    else:
        buckets = [ids]
    budget = cfg.max_pairs_per_group
    for bucket in buckets:
        if budget <= 0:
            return
        bucket = np.sort(np.asarray(bucket, dtype=object))
        m = len(bucket)
        if m < 2:
            continue
        iu, ju = np.triu_indices(m, 1)
        if len(iu) > budget:
            iu, ju = iu[:budget], ju[:budget]
        a_out.append(bucket[iu])
        b_out.append(bucket[ju])
        budget -= len(iu)


_EMPTY_PAIRS = None  # built lazily (module import order: pa import is local)


def _empty_pairs_table():
    import pyarrow as pa

    global _EMPTY_PAIRS
    if _EMPTY_PAIRS is None:
        _EMPTY_PAIRS = pa.table(
            {"doc_id_a": pa.array([], pa.string()), "doc_id_b": pa.array([], pa.string())}
        )
    return _EMPTY_PAIRS


def _sorted_string_codes(arr):
    """Dense int64 codes whose numeric order equals the strings'
    lexicographic order, plus the sorted unique values —
    ``pd.factorize(sort=True)`` semantics at Arrow speed.  The pandas
    version boxes every value into a Python object (~3 s serial at 3M edge
    endpoints); this is dictionary_encode + ONE sort of the unique values +
    a rank remap, all C.  (UTF-8 byte order == codepoint order, so the
    Arrow sort agrees with Python string comparison.)  Assumes no nulls."""
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    de = arr.dictionary_encode()
    indices = de.indices.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    dic = de.dictionary
    order = pc.array_sort_indices(dic)
    order_np = order.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    rank = np.empty(len(dic), np.int64)
    rank[order_np] = np.arange(len(dic), dtype=np.int64)
    return rank[indices], dic.take(order)


def _pairs_single_task_arrow(tbl, cfg: PairGenConfig):
    """group -> emit -> exact dedup, fully vectorized in one task:
    UNORDERED dictionary codes (identity is all the grouping needs — the
    order-isomorphic variant paid an array_sort_indices over the unique ids,
    ~100 ms per 360k-id exchange part, measured), lexsort (block_key, code),
    slice group boundaries, emit each size class with one triu gather,
    dedup on integer pair keys with np.unique, then ONE vectorized string
    compare canonicalizes the output orientation (doc_id_a < doc_id_b, the
    oracle-pinned order) over the deduped pairs only."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if tbl.num_rows == 0:
        return _empty_pairs_table()
    bk = tbl.column("block_key").combine_chunks().to_numpy()
    de = pc.cast(tbl.column("doc_id").combine_chunks(), pa.string()).dictionary_encode()
    cd = de.indices.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    uniq_arr = de.dictionary
    order = np.lexsort((cd, bk))
    bk_s, cd_s = bk[order], cd[order]
    keep = np.empty(len(bk_s), dtype=bool)
    keep[0] = True
    keep[1:] = (bk_s[1:] != bk_s[:-1]) | (cd_s[1:] != cd_s[:-1])
    bk_s, cd_s = bk_s[keep], cd_s[keep]
    gb = np.empty(len(bk_s), dtype=bool)
    gb[0] = True
    gb[1:] = bk_s[1:] != bk_s[:-1]
    starts = np.nonzero(gb)[0]
    lens = np.diff(np.append(starts, len(bk_s)))

    U = len(uniq_arr)
    key_parts: list[np.ndarray] = []
    max_s = int(lens.max()) if len(lens) else 0
    for s in range(2, min(cfg.salt_cap, max_s) + 1):
        sel = starts[lens == s]
        if not len(sel):
            continue
        M = cd_s[sel[:, None] + np.arange(s)[None, :]]  # (g, s), codes ascending
        iu, ju = np.triu_indices(s, 1)
        key_parts.append(M[:, iu].ravel() * U + M[:, ju].ravel())
    # oversized groups: the salted + budgeted python path (rare by design;
    # only these groups' ids are materialized as Python strings)
    big_idx = np.nonzero(lens > cfg.salt_cap)[0]
    if len(big_idx):
        big_a: list = []
        big_b: list = []
        for gi in big_idx:
            ids = uniq_arr.take(
                pa.array(cd_s[starts[gi] : starts[gi] + lens[gi]])
            ).to_pylist()
            _emit_group_pairs(ids, cfg, big_a, big_b)
        if big_a:
            a_codes = pc.index_in(
                pa.array(np.concatenate(big_a), pa.string()), value_set=uniq_arr
            ).to_numpy(zero_copy_only=False).astype(np.int64)
            b_codes = pc.index_in(
                pa.array(np.concatenate(big_b), pa.string()), value_set=uniq_arr
            ).to_numpy(zero_copy_only=False).astype(np.int64)
            # codes are unordered: canonicalize the pair KEY on code min/max
            # (the triu path emits ascending codes already) so a pair seen by
            # both paths / several groups dedups to one key
            key_parts.append(np.minimum(a_codes, b_codes) * U + np.maximum(a_codes, b_codes))
    if not key_parts:
        return _empty_pairs_table()
    keys = np.unique(np.concatenate(key_parts))
    a = uniq_arr.take(pa.array(keys // U))
    b = uniq_arr.take(pa.array(keys % U))
    # output orientation is STRING-canonical (doc_id_a < doc_id_b — the
    # oracle-pinned order, and what the cross-part orientation-sensitive
    # pair-hash dedup relies on); distinct codes => distinct strings, so
    # `less` is never a tie
    lt = pc.less(a, b)
    return pa.table(
        {
            "doc_id_a": pc.if_else(lt, a, b),
            "doc_id_b": pc.if_else(lt, b, a),
        }
    )


def _pairs_single_task(df: pd.DataFrame, cfg: PairGenConfig) -> pd.DataFrame:
    """pandas-facing wrapper kept for the single-task map_batches path and
    direct test callers; the work happens in ``_pairs_single_task_arrow``."""
    import pyarrow as pa

    return _pairs_single_task_arrow(
        pa.Table.from_pandas(df, preserve_index=False), cfg
    ).to_pandas()


def _pair_part_hashes(df: pd.DataFrame) -> np.ndarray:
    """Deterministic 64-bit pair hash for partitioning + dedup (the same
    hash family as ``fast_dedup``; stable across processes)."""
    h1 = pd.util.hash_pandas_object(df["doc_id_a"], index=False).to_numpy()
    h2 = pd.util.hash_pandas_object(df["doc_id_b"], index=False).to_numpy()
    return h1 ^ (h2 * np.uint64(0x9E3779B97F4A7C15))


def _pair_hashes_arrow(tbl) -> tuple[np.ndarray, np.ndarray]:
    """(h1, h2) uint64 hashes of the two id columns via polars' vectorized
    string hash — no per-value Python objects (the pandas equivalent boxes
    every string).  Deterministic across worker processes for a fixed
    polars version, which is all the exchange needs (partition assignment
    and dedup happen within one job on one cluster)."""
    import polars as pl

    h1 = pl.from_arrow(tbl.column("doc_id_a").combine_chunks()).hash(seed=11).to_numpy()
    h2 = pl.from_arrow(tbl.column("doc_id_b").combine_chunks()).hash(seed=11).to_numpy()
    return h1, h2


def derived_exchange_limit(cpus: int, memory_bytes: float) -> int:
    """Max block-row count the manual hash exchange accepts, derived from
    cluster memory at call time: a part must fit a worker heap — nparts
    caps at 64 (object-count economics of the num_returns fan-out), each
    part's emit working set is ~4x its ~30 B/row payload, and a quarter of
    the per-CPU task heap is budgeted for it.  ~390M rows on a 32-CPU /
    94 GB-task-heap node; scales with per-node memory on a cluster.  A
    FIXED row gate was the classic breaks-at-10x config: a 28M-doc corpus
    (224M rows) silently crossed the old 200M constant onto the ~50x-
    slower spill-capable groupby route while each exchange part would have
    held a comfortable ~3.5M rows."""
    heap_per_cpu = memory_bytes / max(1, cpus)
    return int(64 * (heap_per_cpu * 0.25) / (30 * 4))


def _pairs_exchange(block_rows_ds, cfg: PairGenConfig, nparts: int, split_out: int = 1):
    """Manual hash exchange, raw Ray tasks (the Dataset API's sort-based
    groupby costs ~100k rows/s at these sizes; this path is a plain
    two-round hash shuffle at memory speed):

      round 1: every input block splits by ``hash(block_key) % nparts`` —
        a block_key's rows all land in one part, so each part runs the SAME
        vectorized group->emit->dedup as the single-task path on its shard
        (identical per-group semantics: salting, budgets, canonical a<b);
      round 2: emitted pairs re-split by a pair hash — a duplicate pair
        emitted under two different block keys lands in one dedup task.

    Partitioning assumption (documented per SURVEY §2): a part must fit a
    worker heap (rows/nparts block rows, pairs/nparts pairs); the caller
    gates on ``exchange_rows_limit`` and the spill-capable Dataset groupby
    remains the beyond-heap route."""
    import pyarrow as pa
    import ray

    def _tprof(phase: str, t0: float, extra: str = "") -> None:
        """Per-task core-time line (env-gated): the load-robust split metric
        on this box — sum the lines per phase, compare sums across A/Bs."""
        import os as _os

        if _os.environ.get("SASSY_PAIRS_PROF"):
            import sys as _sys
            import time as _time

            print(f"[pairsx] {phase} {_time.time() - t0:.3f}s {extra}", file=_sys.stderr)

    @ray.remote
    def split_block(*tbls: pa.Table):
        import time as _time

        _t0 = _time.time()
        live = [t for t in tbls if t.num_rows and "block_key" in t.schema.names]
        if not live:
            # empty blocks may carry an empty schema; emit_part drops them
            empty = tbls[0].slice(0, 0)
            return tuple(empty for _ in range(nparts))
        tbl = live[0] if len(live) == 1 else pa.concat_tables(live).combine_chunks()
        bk = tbl.column("block_key").to_numpy().astype(np.uint64, copy=False)
        part = (bk % np.uint64(nparts)).astype(np.int64)
        order = np.argsort(part, kind="stable")
        sorted_t = tbl.take(pa.array(order))
        bounds = np.searchsorted(part[order], np.arange(nparts + 1))
        out = tuple(
            sorted_t.slice(int(bounds[i]), int(bounds[i + 1] - bounds[i]))
            for i in range(nparts)
        )
        _tprof("split", _t0, f"rows={tbl.num_rows}")
        return out

    @ray.remote
    def emit_part(*tables):
        import time as _time

        _t0 = _time.time()
        live = [t for t in tables if t.num_rows]
        if not live:
            return tuple(_empty_pairs_table() for _ in range(nparts))
        tbl = _pairs_single_task_arrow(pa.concat_tables(live), cfg)
        _tprof("emit.gen", _t0, f"pairs={tbl.num_rows}")
        _t0 = _time.time()
        h1, h2 = _pair_hashes_arrow(tbl)
        part = ((h1 ^ (h2 * np.uint64(0x9E3779B97F4A7C15))) % np.uint64(nparts)).astype(
            np.int64
        )
        order = np.argsort(part, kind="stable")
        tbl = tbl.take(pa.array(order))
        bounds = np.searchsorted(part[order], np.arange(nparts + 1))
        out = tuple(
            tbl.slice(int(bounds[i]), int(bounds[i + 1] - bounds[i]))
            for i in range(nparts)
        )
        _tprof("emit.split", _t0)
        return out

    @ray.remote
    def dedup_part(*tables):
        import time as _time

        _t0 = _time.time()
        empty = _empty_pairs_table()
        live = [t for t in tables if t.num_rows]
        if not live:
            return empty if split_out == 1 else tuple(empty for _ in range(split_out))
        tbl = pa.concat_tables(live).combine_chunks()
        h1, h2 = _pair_hashes_arrow(tbl)
        # exact 128-bit hash dedup (2^-128 odds, noted in the docstring):
        # lexsort the two u64 halves + neighbor-diff — np.unique over a
        # 16-byte void view ran the structured-dtype compare sort, ~4x
        # slower than two integer-key passes (measured 1.15 vs 0.26 s at
        # 875k rows); keep-first-in-sorted-order is the same row set
        order = np.lexsort((h2, h1))
        h1s, h2s = h1[order], h2[order]
        keep = np.empty(len(order), dtype=bool)
        keep[0] = True
        keep[1:] = (h1s[1:] != h1s[:-1]) | (h2s[1:] != h2s[:-1])
        tbl = tbl.take(pa.array(np.sort(order[keep])))
        _tprof("dedup", _t0, f"pairs={tbl.num_rows}")
        if split_out == 1:
            return tbl
        # even row slices so the DOWNSTREAM map stage (scoring) gets one
        # task per ~fair share of pairs — Ray Data's task granularity is
        # the input block, so nparts blocks alone would cap the scored
        # stage's parallelism at nparts tasks.  Blocks under ~2048 rows
        # stop amortizing kernel dispatch: clamp, pad with empty slices
        # (num_returns is fixed at call time).
        nsl = min(split_out, max(1, -(-tbl.num_rows // 2048)))
        bounds = [tbl.num_rows * i // nsl for i in range(nsl + 1)]
        out = [tbl.slice(bounds[i], bounds[i + 1] - bounds[i]) for i in range(nsl)]
        out.extend(empty for _ in range(split_out - nsl))
        return tuple(out)

    # ref-only orchestration: the driver never holds data, every part flows
    # object-store -> task -> object-store (num_returns=nparts per round).
    # Input blocks coalesce into ~nparts split tasks: per-input-block split
    # tasks at a 560-block corpus produced 560 x nparts = 36k sub-table
    # objects and a 560-ref fan-in per emit task — object-store metadata
    # and fetch overhead, not compute (split wave itself was 3 s).
    blocks = block_rows_ds.to_arrow_refs()
    ngroups = min(len(blocks), max(2, nparts))
    groups = [
        blocks[len(blocks) * g // ngroups : len(blocks) * (g + 1) // ngroups]
        for g in range(ngroups)
    ]
    split_refs = [
        split_block.options(num_returns=nparts).remote(*grp)
        for grp in groups
        if grp
    ]
    emit_refs = [
        emit_part.options(num_returns=nparts).remote(*[sr[p] for sr in split_refs])
        for p in range(nparts)
    ]
    if split_out == 1:
        final_refs = [
            dedup_part.remote(*[er[q] for er in emit_refs]) for q in range(nparts)
        ]
    else:
        final_refs = [
            r
            for q in range(nparts)
            for r in dedup_part.options(num_returns=split_out).remote(
                *[er[q] for er in emit_refs]
            )
        ]
    import ray.data as rd

    return rd.from_arrow_refs(final_refs)


def make_pairs_dataset(block_rows_ds, cfg: PairGenConfig):
    """block rows Dataset (block_key, doc_id) -> deduped pairs Dataset
    (doc_id_a, doc_id_b).

    Shuffle plan: below ``single_task_rows_limit`` block rows, the whole
    group->emit->dedup chain is ONE vectorized task (Ray's sort-based
    groupby costs ~100k rows/s here; the task does millions/s).  Above it:
    ONE groupby(block_key) collect-set aggregate, then a plain map_batches
    emitting pairs — singleton keys (the vast majority) cost nothing — and
    a second groupby on the pair key for exact dedup."""
    import os
    import sys
    import time

    import ray

    _prof = bool(os.environ.get("SASSY_PAIRS_PROF"))
    _t0 = time.time()
    cpus_now = int(ray.cluster_resources().get("CPU", 8))
    block_rows_ds = block_rows_ds.materialize()
    n_rows = block_rows_ds.count()
    if _prof:
        print(f"[pairs] mat+count {time.time() - _t0:.2f}s ({n_rows} rows)", file=sys.stderr)
    exch_limit = cfg.exchange_rows_limit
    if exch_limit is None:
        exch_limit = derived_exchange_limit(
            cpus_now, float(ray.cluster_resources().get("memory", 8e9))
        )
    if 0 < n_rows <= exch_limit and (
        cpus_now >= 2 or n_rows > cfg.single_task_rows_limit
    ):
        # parallel manual hash exchange (see _pairs_exchange): part count
        # scales with CPUs but never exceeds ~100k rows per part's fair
        # share, so tiny inputs pay only a 2-part exchange.  At 1 CPU the
        # single task is cheaper below its row limit; above it the exchange
        # still wins (sequential parts, each heap-bounded — strictly better
        # than one giant pandas task or the sort-groupby shuffle)
        nparts = max(2, min(64, max(2, cpus_now) * 2, -(-n_rows // 100_000)))
        # output block count targets ~2 blocks per CPU: Ray Data's map task
        # granularity is the input block, so the SCORED stage's parallelism
        # equals the pair dataset's block count — nparts alone (3-4 at bench
        # sizes) left 28 of 32 CPUs idle during scoring
        split_out = max(1, -(-max(2, cpus_now) * 2 // nparts))
        _t1 = time.time()
        out = _pairs_exchange(block_rows_ds, cfg, nparts, split_out)
        if _prof:
            print(f"[pairs] exchange {time.time() - _t1:.2f}s", file=sys.stderr)
        return out
    if n_rows <= cfg.single_task_rows_limit:
        return (
            block_rows_ds.repartition(1)
            .map_batches(
                lambda t: _pairs_single_task_arrow(t, cfg),
                batch_format="pyarrow",
                batch_size=None,
            )
            .repartition(max(2, cpus_now))
        )

    from ray.data.aggregate import Unique

    grouped = block_rows_ds.groupby("block_key").aggregate(Unique("doc_id"))

    def emit(batch: pd.DataFrame) -> pd.DataFrame:
        """Vectorized pair emission: groups are bucketed BY SIZE and each
        size class emits all its pairs with one triu gather over a (groups,
        size) code matrix — no per-group Python in the common path (a batch
        carries ~100k groups; the per-group loop was the pairs-stage
        bottleneck).  ``factorize(sort=True)`` makes code order equal
        lexicographic order, so canonical a<b orientation matches across
        tasks.  Groups above salt_cap take the salted per-group path."""
        a_out: list = []
        b_out: list = []
        by_size: dict[int, list] = {}
        big: list = []
        for ids in batch["unique(doc_id)"]:
            s = len(ids)
            if s < 2:
                continue
            if s > cfg.salt_cap:
                big.append(ids)
            else:
                by_size.setdefault(s, []).append(ids)
        if by_size:
            flat = np.concatenate(
                [np.asarray(g, dtype=object) for gs in by_size.values() for g in gs]
            )
            codes, uniq = pd.factorize(pd.Series(flat), sort=True)
            uniq_np = np.asarray(uniq, dtype=object)
            pos = 0
            for s, gs in by_size.items():
                cnt = len(gs) * s
                M = np.sort(codes[pos : pos + cnt].reshape(len(gs), s), axis=1)
                pos += cnt
                # within salt_cap, s(s-1)/2 <= max_pairs_per_group by
                # construction (64*63/2 = 2016 < 2048): no budget check
                iu, ju = np.triu_indices(s, 1)
                a_out.append(uniq_np[M[:, iu].ravel()])
                b_out.append(uniq_np[M[:, ju].ravel()])
        for ids in big:
            _emit_group_pairs(list(ids), cfg, a_out, b_out)
        if not a_out:
            return pd.DataFrame(
                {"doc_id_a": pd.Series(dtype=str), "doc_id_b": pd.Series(dtype=str)}
            )
        return pd.DataFrame(
            {
                "doc_id_a": np.concatenate(a_out),
                "doc_id_b": np.concatenate(b_out),
            }
        )

    pairs = grouped.map_batches(
        emit, batch_format="pandas"
    ).map_batches(lambda df: df.drop_duplicates(), batch_format="pandas")
    # coalesce the many tiny post-shuffle blocks first: per-block overhead
    # dominates the following steps otherwise
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8))
    pairs = pairs.repartition(max(2, cpus)).materialize()
    n_pre = pairs.count()

    if n_pre <= cfg.single_task_dedup_limit:
        # bounded pair list: one-task dedup beats a full Ray shuffle by an
        # order of magnitude at this size.  Dedup on two precomputed 64-bit
        # hashes (128 bits total) instead of the string columns — pandas
        # drop_duplicates over ints is several times faster; re-split so
        # downstream scoring parallelizes (one block = one task otherwise).
        def fast_dedup(df: pd.DataFrame) -> pd.DataFrame:
            h1 = pd.util.hash_pandas_object(df["doc_id_a"], index=False).to_numpy()
            h2 = pd.util.hash_pandas_object(df["doc_id_b"], index=False).to_numpy()
            keep = ~pd.DataFrame({"h1": h1, "h2": h2}).duplicated().to_numpy()
            return df.loc[keep].reset_index(drop=True)

        return (
            pairs.repartition(1)
            .map_batches(fast_dedup, batch_format="pandas")
            .repartition(max(2, cpus))
        )

    # scale path: exact dedup via hash-partitioned aggregate.  NB: fold the
    # pair into ONE key column — Ray's multi-column groupby sort is an order
    # of magnitude slower than a single key (measured 29s vs 1.5s on 250k
    # rows); split the key back afterwards.
    import pyarrow as pa
    import pyarrow.compute as pc

    def addkey(t: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(t.column("doc_id_a"), t.column("doc_id_b"), "|")
        return pa.table({"pk": k})

    def splitkey(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern(t.column("pk"), "|")
        flat = parts.combine_chunks() if isinstance(parts, pa.ChunkedArray) else parts
        vals = flat.flatten()
        n = len(flat)
        import numpy as np

        a = vals.take(pa.array(np.arange(0, 2 * n, 2)))
        b = vals.take(pa.array(np.arange(1, 2 * n, 2)))
        return pa.table({"doc_id_a": a, "doc_id_b": b})

    deduped = (
        pairs.map_batches(addkey, batch_format="pyarrow")
        .groupby("pk")
        .count()
        .map_batches(splitkey, batch_format="pyarrow")
    )
    return deduped
