"""Similarity search over embedding columns.

- ``brute_force_topk``: exact cosine top-k — numpy matmul per batch against a
  broadcast query matrix, per-batch partial top-k, k-sized merges on the
  driver (the baseline; one pass, no shuffle);
- ``ivf_topk``: IVF-bucketed approximate top-k — coarse centroids (seeded
  sample + Lloyd iterations), assign rows to nearest centroid inside
  map_batches, and compute query similarities ONLY for rows in probed
  buckets (the probe filter runs before the matmul, so IVF actually saves
  FLOPs); per-batch partial top-k like brute force;
- ``embedding_neardup_pairs``: cosine>=tau near-duplicate pairs via the same
  bucketing — candidate pairs are generated within salted sub-buckets with a
  per-bucket pair budget (no unsalted O(n^2) hot bucket), exact verify is a
  bucket-local matmul (no driver concat, no broadcast of the embedding side).
"""

from __future__ import annotations

import os
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["brute_force_topk", "ivf_topk", "embedding_neardup_pairs", "coarse_centroids"]


def _norm_rows(M: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(M, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return M / n


def _emb_matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    dim = len(arr[0]) if len(arr) else 1
    return flat.reshape(len(arr), dim)


def _merge_partial_topk(batches, n_queries: int, k: int, quantize=None):
    """Merge per-batch (qi, ids, sims) partial top-k rows: the driver only
    ever sees k rows per (query, batch).  Non-finite sims (masked-out rows)
    are dropped BEFORE the merge, so under-filled queries truncate rather
    than fabricate zero-sim neighbors; ``counts[qi]`` is the number of real
    results.  ``quantize`` optionally maps sims to the values the final
    ordering should compare (e.g. a rounded integer scale, to mirror an
    external ORDER BY on the rounded column)."""
    merged_ids: list[list] = [[] for _ in range(n_queries)]
    merged_sims: list[list] = [[] for _ in range(n_queries)]
    for b in batches:
        for qi, ids, sims in zip(
            b.column("qi").to_pylist(), b.column("ids").to_pylist(), b.column("sims").to_pylist()
        ):
            merged_ids[qi].extend(ids)
            merged_sims[qi].extend(sims)
    out_ids = np.zeros((n_queries, k), dtype=np.int64)
    out_sims = np.zeros((n_queries, k))
    counts = np.zeros(n_queries, dtype=np.int64)
    for qi in range(n_queries):
        s = np.asarray(merged_sims[qi], dtype=np.float64)
        i = np.asarray(merged_ids[qi], dtype=np.int64)
        finite = np.isfinite(s)
        s, i = s[finite], i[finite]
        key = quantize(s) if quantize is not None else s
        order = np.lexsort((i, -key))[:k]
        counts[qi] = len(order)
        out_ids[qi, : len(order)] = i[order]
        out_sims[qi, : len(order)] = s[order]
    return out_ids, out_sims, counts


def _partial_topk_table(ids: np.ndarray, sims: np.ndarray, k: int) -> pa.Table:
    """(rows,) ids + (rows, nq) sims -> per-query top-k rows."""
    nq = sims.shape[1]
    out_ids, out_sims, out_q = [], [], []
    for qi in range(nq):
        s = sims[:, qi]
        kk = min(k, len(s))
        if kk == 0:
            out_ids.append([])
            out_sims.append([])
        else:
            top = np.argpartition(-s, kk - 1)[:kk]
            out_ids.append(ids[top].tolist())
            out_sims.append(s[top].tolist())
        out_q.append(qi)
    return pa.table(
        {
            "qi": pa.array(out_q, pa.int64()),
            "ids": pa.array(out_ids, pa.list_(pa.int64())),
            "sims": pa.array(out_sims, pa.list_(pa.float64())),
        }
    )


def brute_force_topk(ds, queries: np.ndarray, k: int = 10, id_col: str = "vec_id", quantize=None):
    """Exact top-k per query row: per-batch partial top-k, merged on driver.
    Returns ((n_queries, k) ids, (n_queries, k) sims, (n_queries,) counts)."""
    Q = _norm_rows(np.asarray(queries, dtype=np.float64))

    def score(batch: pa.Table) -> pa.Table:
        M = _norm_rows(_emb_matrix(batch))
        sims = M @ Q.T  # (rows, nq)
        ids = np.asarray(batch.column(id_col).to_pylist())
        return _partial_topk_table(ids, sims, k)

    batches = ds.map_batches(score, batch_format="pyarrow").iter_batches(
        batch_size=4096, batch_format="pyarrow"
    )
    return _merge_partial_topk(batches, len(Q), k, quantize=quantize)


def coarse_centroids(
    ds,
    n_centroids: int,
    seed: int = 42,
    id_col: str = "vec_id",
    cache_path: str | None = None,
) -> np.ndarray:
    """Coarse quantizer (a few Lloyd iterations on a bounded sample).

    Single partial pass: ``ds.limit`` pulls only the first ~50x-n_centroids
    rows (no ``count()`` pre-pass, no full-data sample pass) — the quantizer
    needs a sketch of the distribution, and IVF correctness never depends on
    centroid quality (only recall does).  With ``cache_path`` the centroid
    artifact is persisted and reused across calls — the thing a real 100 TB
    pipeline computes once and ships to every query job."""
    if cache_path is not None and os.path.exists(cache_path):
        C = np.load(cache_path)
        if C.shape[0] == n_centroids:
            return C
    sample = ds.limit(max(2048, n_centroids * 50))
    M = _norm_rows(_emb_matrix(pa.concat_tables(sample.iter_batches(batch_size=65536, batch_format="pyarrow"))))
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(M), size=min(n_centroids, len(M)), replace=False)
    C = M[idx]
    for _ in range(5):
        assign = np.argmax(M @ C.T, axis=1)
        for c in range(len(C)):
            members = M[assign == c]
            if len(members):
                C[c] = members.mean(axis=0)
        C = _norm_rows(C)
    if cache_path is not None:
        tmp = cache_path + ".tmp"
        with open(tmp, "wb") as f:
            np.save(f, C)
        os.replace(tmp, cache_path)
    return C


def assign_buckets_batch(batch: pa.Table, C: np.ndarray, id_col: str = "vec_id") -> pa.Table:
    """(vec_id, bucket) assignment rows — the cheap full pass of IVF."""
    M = _norm_rows(_emb_matrix(batch))
    a = np.argmax(M @ C.T, axis=1)
    return pa.table(
        {id_col: batch.column(id_col), "bucket": pa.array(a.astype(np.int64))}
    )


def ivf_topk(
    ds,
    queries: np.ndarray,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    centroids: np.ndarray | None = None,
    quantize=None,
):
    """IVF approximate top-k: assign rows to coarse buckets, score ONLY rows
    falling in the ``nprobe`` nearest buckets of some query (probe filter
    before the query matmul), per-batch partial top-k merged on the driver.
    Under-filled queries (probed buckets hold < k rows) truncate — masked
    -inf rows never surface as fabricated neighbors."""
    C = centroids if centroids is not None else coarse_centroids(ds, n_centroids, seed, id_col)
    Q = _norm_rows(np.asarray(queries, dtype=np.float64))
    probe = np.argsort(-(Q @ C.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    probe_union = np.unique(probe)
    probe_masks = [np.isin(probe_union, p) for p in probe]  # per query, over kept buckets

    def score(batch: pa.Table) -> pa.Table:
        M = _norm_rows(_emb_matrix(batch))
        assign = np.argmax(M @ C.T, axis=1)
        keep = np.isin(assign, probe_union)
        ids = np.asarray(batch.column(id_col).to_pylist())[keep]
        if not keep.any():
            return _partial_topk_table(ids, np.zeros((0, len(Q))), k)
        Mf, af = M[keep], assign[keep]
        sims = Mf @ Q.T  # FLOPs only for probed rows
        # mask out rows whose bucket this query does not probe
        bucket_pos = np.searchsorted(probe_union, af)
        for qi, pm in enumerate(probe_masks):
            sims[~pm[bucket_pos], qi] = -np.inf
        return _partial_topk_table(ids, sims, k)

    batches = ds.map_batches(score, batch_format="pyarrow").iter_batches(
        batch_size=4096, batch_format="pyarrow"
    )
    return _merge_partial_topk(batches, len(Q), k, quantize=quantize)


def embedding_neardup_pairs(
    ds,
    tau: float = 0.95,
    n_centroids: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    salt_cap: int = 256,
    max_pairs_per_bucket: int = 65536,
    centroids: np.ndarray | None = None,
):
    """cosine >= tau pairs via coarse bucketing + bucket-local exact verify.

    Hot buckets are SALTED: groups above ``salt_cap`` split into deterministic
    crc32 sub-buckets, pairs generated within sub-buckets only, with a
    per-bucket pair budget — bounded work per group, documented recall
    tradeoff (mirrors stages/pairs.py).  Returns dict(candidates=Dataset of
    (vec_id_a, vec_id_b, sim), pairs_fn=() -> matched pairs Table)."""
    C = centroids if centroids is not None else coarse_centroids(ds, n_centroids, seed, id_col)

    def assign(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "bucket", assign_buckets_batch(batch, C, id_col).column("bucket")
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        M = _norm_rows(np.stack(g["embedding"].to_numpy()))[order]
        if len(ids) > salt_cap:
            nb = -(-len(ids) // salt_cap)
            salt = np.array([zlib.crc32(str(d).encode()) % nb for d in ids])
            groups = [np.nonzero(salt == s)[0] for s in range(nb)]
        else:
            groups = [np.arange(len(ids))]
        budget = max_pairs_per_bucket
        a_out, b_out, s_out = [], [], []
        for gi in groups:
            if budget <= 0 or len(gi) < 2:
                continue
            sub_ids = ids[gi]
            S = M[gi] @ M[gi].T
            iu = np.triu_indices(len(gi), 1)
            take = min(budget, len(iu[0]))
            a_out.append(sub_ids[iu[0][:take]])
            b_out.append(sub_ids[iu[1][:take]])
            s_out.append(S[iu][:take])  # raw float64: thresholding must not
            # see pre-rounded values (the SQL oracle compares unrounded)
            budget -= take
        if not a_out:
            return pd.DataFrame(
                {
                    "vec_id_a": pd.Series(dtype="int64"),
                    "vec_id_b": pd.Series(dtype="int64"),
                    "sim": pd.Series(dtype="float64"),
                }
            )
        return pd.DataFrame(
            {
                "vec_id_a": np.concatenate(a_out).astype(np.int64),
                "vec_id_b": np.concatenate(b_out).astype(np.int64),
                "sim": np.concatenate(s_out),
            }
        )

    candidates = (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pandas")
        .materialize()
    )

    def pairs_fn() -> pa.Table:
        import pyarrow.compute as pc

        matched = candidates.map_batches(
            lambda t: t.filter(pc.greater_equal(t.column("sim"), pa.scalar(tau))),
            batch_format="pyarrow",
        )
        parts = list(matched.iter_batches(batch_size=65536, batch_format="pyarrow"))
        if not parts:
            return pa.table(
                {
                    "vec_id_a": pa.array([], pa.int64()),
                    "vec_id_b": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                }
            )
        return pa.concat_tables(parts)

    return {"candidates": candidates, "pairs_fn": pairs_fn}
