"""Similarity search over embedding columns.

- ``brute_force_topk``: exact cosine top-k — numpy matmul per batch against a
  broadcast query matrix (the baseline; one pass, no shuffle);
- ``ivf_topk``: IVF-bucketed approximate top-k — k-means-ish coarse centroids
  (seeded sample), assign rows to nearest centroid inside map_batches, probe
  only ``nprobe`` buckets (the scale path: at 10^12 rows the assignment is
  the only full pass; probes touch a fraction);
- ``embedding_neardup_pairs``: cosine>=tau near-duplicate pairs via the same
  bucketing (candidates within bucket only, exact verify).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["brute_force_topk", "ivf_topk", "embedding_neardup_pairs"]


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


def brute_force_topk(ds, queries: np.ndarray, k: int = 10, id_col: str = "vec_id"):
    """Exact top-k per query row: per-batch partial top-k, merged on driver.
    Returns (n_queries, k) arrays of ids and sims."""
    Q = _norm_rows(np.asarray(queries, dtype=np.float64))
    parts: list[tuple[np.ndarray, np.ndarray]] = []

    def score(batch: pa.Table) -> pa.Table:
        M = _norm_rows(_emb_matrix(batch))
        sims = M @ Q.T  # (rows, nq)
        ids = np.asarray(batch.column(id_col).to_pylist())
        kk = min(k, len(ids))
        top = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # (k, nq)
        out_ids = ids[top]
        out_sims = np.take_along_axis(sims, top, axis=0)
        return pa.table(
            {
                "qi": pa.array(np.arange(out_ids.shape[1]), pa.int64()),
                "ids": pa.array(out_ids.T.tolist(), pa.list_(pa.int64())),
                "sims": pa.array(out_sims.T.tolist(), pa.list_(pa.float64())),
            }
        )

    merged_ids = [[] for _ in range(len(Q))]
    merged_sims = [[] for _ in range(len(Q))]
    for b in ds.map_batches(score, batch_format="pyarrow").iter_batches(
        batch_size=4096, batch_format="pyarrow"
    ):
        for qi, ids, sims in zip(
            b.column("qi").to_pylist(), b.column("ids").to_pylist(), b.column("sims").to_pylist()
        ):
            merged_ids[qi].extend(ids)
            merged_sims[qi].extend(sims)
    out_ids = np.zeros((len(Q), k), dtype=np.int64)
    out_sims = np.zeros((len(Q), k))
    for qi in range(len(Q)):
        s = np.asarray(merged_sims[qi])
        i = np.asarray(merged_ids[qi])
        order = np.lexsort((i, -s))[:k]
        out_ids[qi, : len(order)] = i[order]
        out_sims[qi, : len(order)] = s[order]
    return out_ids, out_sims


def _coarse_centroids(ds, n_centroids: int, seed: int, id_col: str) -> np.ndarray:
    sample = ds.random_sample(min(1.0, max(0.05, n_centroids * 20 / max(1, ds.count()))), seed=seed)
    M = _norm_rows(_emb_matrix(pa.concat_tables(sample.iter_batches(batch_size=65536, batch_format="pyarrow"))))
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(M), size=min(n_centroids, len(M)), replace=False)
    C = M[idx]
    # a few Lloyd iterations on the sample
    for _ in range(5):
        assign = np.argmax(M @ C.T, axis=1)
        for c in range(len(C)):
            members = M[assign == c]
            if len(members):
                C[c] = members.mean(axis=0)
        C = _norm_rows(C)
    return C


def ivf_topk(ds, queries: np.ndarray, k: int = 10, n_centroids: int = 16, nprobe: int = 4, seed: int = 42, id_col: str = "vec_id"):
    """IVF approximate top-k: assign rows to coarse buckets, probe the
    ``nprobe`` nearest buckets per query."""
    C = _coarse_centroids(ds, n_centroids, seed, id_col)
    Q = _norm_rows(np.asarray(queries, dtype=np.float64))
    probe = np.argsort(-(Q @ C.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    probe_sets = [set(p.tolist()) for p in probe]

    def score(batch: pa.Table) -> pa.Table:
        M = _norm_rows(_emb_matrix(batch))
        assign = np.argmax(M @ C.T, axis=1)
        ids = np.asarray(batch.column(id_col).to_pylist())
        sims = M @ Q.T
        rows_ids, rows_sims, rows_q = [], [], []
        for qi, pset in enumerate(probe_sets):
            mask = np.isin(assign, list(pset))
            rows_ids.append(ids[mask])
            rows_sims.append(sims[mask, qi])
            rows_q.append(np.full(mask.sum(), qi))
        return pa.table(
            {
                "qi": pa.array(np.concatenate(rows_q).astype(np.int64)),
                "vec_id": pa.array(np.concatenate(rows_ids).astype(np.int64)),
                "sim": pa.array(np.concatenate(rows_sims)),
            }
        )

    cand = pa.concat_tables(
        ds.map_batches(score, batch_format="pyarrow").iter_batches(
            batch_size=65536, batch_format="pyarrow"
        )
    )
    out_ids = np.zeros((len(Q), k), dtype=np.int64)
    out_sims = np.zeros((len(Q), k))
    qi_arr = cand.column("qi").to_numpy()
    id_arr = cand.column("vec_id").to_numpy()
    s_arr = cand.column("sim").to_numpy()
    for qi in range(len(Q)):
        m = qi_arr == qi
        s, i = s_arr[m], id_arr[m]
        order = np.lexsort((i, -s))[:k]
        out_ids[qi, : len(order)] = i[order]
        out_sims[qi, : len(order)] = s[order]
    return out_ids, out_sims


def embedding_neardup_pairs(ds, tau: float = 0.95, n_centroids: int = 16, seed: int = 42, id_col: str = "vec_id") -> pa.Table:
    """cosine >= tau pairs via coarse bucketing + exact within-bucket verify."""
    C = _coarse_centroids(ds, n_centroids, seed, id_col)

    def assign(batch: pa.Table) -> pa.Table:
        M = _norm_rows(_emb_matrix(batch))
        a = np.argmax(M @ C.T, axis=1)
        return batch.append_column("bucket", pa.array(a.astype(np.int64)))

    import pandas as pd

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        M = _norm_rows(np.stack(g["embedding"].to_numpy()))
        ids = g[id_col].to_numpy()
        S = M @ M.T
        iu = np.triu_indices(len(ids), 1)
        mask = S[iu] >= tau
        return pd.DataFrame(
            {
                "vec_id_a": ids[iu[0][mask]].astype(np.int64),
                "vec_id_b": ids[iu[1][mask]].astype(np.int64),
                "sim": np.round(S[iu][mask], 6),
            }
        )

    out = (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    df = out.to_pandas()
    if df.empty:
        import pandas as pd

        df = pd.DataFrame(
            {"vec_id_a": pd.Series(dtype="int64"), "vec_id_b": pd.Series(dtype="int64"), "sim": pd.Series(dtype="float64")}
        )
    return pa.Table.from_pandas(df, preserve_index=False)
