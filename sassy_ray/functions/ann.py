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

# per-worker cache of plasma-resident broadcast objects (one ray.get per
# worker process, not per batch)
_PLASMA_CACHE: dict = {}


def _plasma_cached(ref):
    key = ref.hex() if hasattr(ref, "hex") else id(ref)
    hit = _PLASMA_CACHE.get(key)
    if hit is None:
        import ray

        hit = ray.get(ref)
        if len(_PLASMA_CACHE) > 8:  # bound: a stage uses 2 refs at a time
            _PLASMA_CACHE.clear()
        _PLASMA_CACHE[key] = hit
    return hit


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


def _salt_hash(ids) -> np.ndarray:
    """Deterministic vectorized per-id hash for salt assignment (uint64).
    polars' hash is a vectorized xxhash (no per-row Python); the zlib.crc32
    loop fallback only runs when polars is unavailable."""
    try:
        import polars as pl

        return pl.Series(np.asarray(ids)).hash(seed=11).to_numpy().copy()
    except Exception:
        return np.array([zlib.crc32(str(d).encode()) for d in np.asarray(ids)], np.uint64)


# simhash salt space per bucket: 2^_SALT_BITS cells.  8 bits splits a hot
# bucket up to 256x before the (recall-losing) id-hash guard has to kick in.
_SALT_BITS = 8


def _simhash_codes(M: np.ndarray, seed: int = 23) -> np.ndarray:
    """Per-row _SALT_BITS-bit hyperplane-LSH code (SimHash, Charikar 2002):
    the sign pattern of ``_SALT_BITS`` seeded random projections.  Vectors at
    cosine ~1 flip each bit with probability angle/pi, so NEAR-DUPLICATE rows
    get the SAME code with high probability — unlike an id-hash, which
    splits a near-dup pair into different sub-buckets ~(nb-1)/nb of the
    time.  This is what makes salting recall-preserving."""
    dim = M.shape[1]
    R = np.random.default_rng(seed).normal(size=(dim, _SALT_BITS))
    bits = (M @ R) > 0
    return bits @ (1 << np.arange(_SALT_BITS, dtype=np.int64))


def _plan_salt(counts2d: np.ndarray, salt_cap: int):
    """Driver-side salt plan from the (n_centroids, 2^_SALT_BITS) cell
    histogram: per bucket, the number of simhash PREFIX bits needed to bring
    expected cells under ``salt_cap`` (b = ceil(log2(ceil(total/cap)))), and
    per still-oversized prefix cell an id-hash fan-out ``nb2`` (the memory
    guard of last resort — only degenerate cells, e.g. floods of EXACT
    duplicates whose simhash is identical, ever reach it).

    Returns (b_arr[n_centroids], nb2_flat[n_centroids << _SALT_BITS],
    max_nb2)."""
    n_cent = counts2d.shape[0]
    tot = counts2d.sum(axis=1)
    nb = np.maximum(1, -(-tot // salt_cap))
    b_arr = np.minimum(_SALT_BITS, np.ceil(np.log2(nb)).astype(np.int64))
    # +1 headroom bit when salting at all: at exactly ceil(log2(nb)) bits the
    # EXPECTED cell size equals salt_cap, so ~half the cells overflow into
    # the id-salt guard and its ~1/nb2 pair survival (measured 0.82 planted
    # recall); one extra bit puts cells at ~salt_cap/2 and overflow becomes
    # a rare tail (~0.99 recall), at negligible extra flip exposure
    b_arr = np.minimum(_SALT_BITS, b_arr + (b_arr > 0))
    nb2_flat = np.ones(n_cent << _SALT_BITS, dtype=np.int64)
    # 2x slack before the id-salt engages: cells sit at ~salt_cap/2 expected
    # (headroom bit above), so the statistical tail up to 2x salt_cap is
    # normal spread, not a hot flood — id-salting it would shed ~5% of true
    # near-dup pairs (measured) to bound memory that was never at risk.
    # The per-task row bound is therefore 2x salt_cap.
    for c in np.nonzero(tot > salt_cap)[0]:
        b = int(b_arr[c])
        shift = _SALT_BITS - b
        cells = counts2d[c].reshape(1 << b, 1 << shift).sum(axis=1)
        for p in np.nonzero(cells > 2 * salt_cap)[0]:
            nb2_flat[(int(c) << _SALT_BITS) + (int(p) << shift)] = -(-int(cells[p]) // salt_cap)
    return b_arr, nb2_flat, int(nb2_flat.max())


def _gkey_rows(
    bkt: np.ndarray,
    sh: np.ndarray,
    ids: np.ndarray,
    b_arr: np.ndarray,
    nb2_flat: np.ndarray,
    max_nb2: int,
) -> np.ndarray:
    """Fused int64 composite group key (bucket, simhash prefix, id-salt) per
    row — all vectorized; the id-salt hash only runs on rows in degenerate
    cells (nb2 > 1)."""
    shift = _SALT_BITS - b_arr[bkt]
    cell = (bkt.astype(np.int64) << _SALT_BITS) + ((sh >> shift) << shift)
    g = cell * max_nb2
    if max_nb2 > 1:
        nb2 = nb2_flat[cell]
        need = nb2 > 1
        if need.any():
            s = _salt_hash(np.asarray(ids)[need]) % nb2[need].astype(np.uint64)
            g[need] += s.astype(np.int64)
    return g


def embedding_neardup_pairs(
    ds,
    tau: float = 0.95,
    n_centroids: int | None = None,
    seed: int = 42,
    id_col: str = "vec_id",
    salt_cap: int = 256,
    max_pairs_per_bucket: int = 65536,
    centroids: np.ndarray | None = None,
    target_bucket_rows: int = 4096,
    n_rows: int | None = None,
    n_assign: int = 2,
):
    """cosine >= tau pairs via coarse bucketing + sub-bucket-local exact
    verify, memory-bounded per task at any corpus size:

    - ``n_centroids`` derives from the corpus size (``ceil(n_rows /
      target_bucket_rows)``, floor 16) unless given — a fixed bucket count
      would make each bucket ~corpus/16 at 100x scale.  The target is a few
      x ``salt_cap`` ON PURPOSE: recall comes from same-(sub-)bucket
      capture, so fine centroids (near vectors genuinely co-bucket) beat
      coarse buckets shredded by salt (a near pair survives a salt split
      only ~1/nb of the time); salting remains the hot-key memory guard;
    - per-(bucket, simhash-cell) row counts come from a cheap sparse
      counting pass (driver sees nonzero cells, never rows), and buckets
      above ``salt_cap`` get a SALT COLUMN — the top ``b`` bits of each
      row's SimHash code (``_simhash_codes``), so near-duplicate rows agree
      on the salt with high probability and recall survives the split; the
      groupby key is the fused (bucket, simhash prefix, id-salt) int64
      composite, so no single ``map_groups`` task ever holds more than
      ~``salt_cap`` rows — the old whole-bucket grouping bounded pair
      EMISSION but not group memory.  Degenerate cells (e.g. exact-duplicate
      floods sharing one simhash) fall back to an id-hash second salt — the
      memory guard of last resort, with the documented recall tradeoff
      confined to those cells;
    - pairs are generated within sub-buckets only, with a per-sub-bucket
      pair budget — bounded work per group (mirrors stages/pairs.py
      salting);
    - each row is assigned to its ``n_assign`` nearest centroids (IVF
      multi-assignment): near-dup pairs near a Voronoi boundary flip their
      argmax centroid and would miss each other under single assignment —
      measured 0.61 -> ~0.95 planted recall at 1M random vectors.  Costs
      ``n_assign``x shuffle volume (standard IVF tradeoff); the same pair
      found in two buckets is deduped in ``pairs_fn`` (the ``candidates``
      dataset may contain such duplicates).

    The input is streamed twice (count pass + pair pass) instead of
    materializing corpus-size blocks in the object store; both passes are
    one cheap matmul over each batch.  Returns dict(candidates=Dataset of
    (vec_id_a, vec_id_b, sim), pairs_fn=() -> matched pairs Table)."""
    import ray

    if n_centroids is None:
        if n_rows is None:
            n_rows = ds.count()  # parquet reads answer from footer metadata
        # flat-quantizer cap: past 64k centroids the per-row assignment
        # matmul dominates — a hierarchical (2-level) quantizer is the route
        # beyond that, with simhash salting covering the intra-bucket split
        n_centroids = min(65536, max(16, -(-int(n_rows) // target_bucket_rows)))
    C = centroids if centroids is not None else coarse_centroids(ds, n_centroids, seed, id_col)
    # the centroid matrix rides plasma, not the task closure (at 64k x 768
    # floats it is ~400 MB — the closure must stay bytes-sized)
    C_ref = ray.put(C)

    na = max(1, min(int(n_assign), len(C)))

    def _bkt_sh(batch: pa.Table, Cm: np.ndarray):
        """(rows, na) bucket assignments + (rows,) simhash codes."""
        M = _norm_rows(_emb_matrix(batch))
        S = M @ Cm.T
        if na == 1:
            bkt = np.argmax(S, axis=1)[:, None]
        else:
            bkt = np.argpartition(-S, na - 1, axis=1)[:, :na]
        return bkt, _simhash_codes(M, seed=seed + 23)

    # --- count pass: per-batch SPARSE (cell, cnt) partials, summed on the
    # driver (nonzero cells only — bounded by batch rows, no row egress) ---
    def partial_counts(batch: pa.Table) -> pa.Table:
        bkt, sh = _bkt_sh(batch, _plasma_cached(C_ref))
        cell = (bkt.astype(np.int64) << _SALT_BITS) + sh[:, None]
        uniq, cnt = np.unique(cell.reshape(-1), return_counts=True)
        return pa.table(
            {"cell": pa.array(uniq, pa.int64()), "cnt": pa.array(cnt.astype(np.int64))}
        )

    counts2d = np.zeros((n_centroids, 1 << _SALT_BITS), dtype=np.int64)
    flat = counts2d.reshape(-1)
    for b in ds.map_batches(partial_counts, batch_format="pyarrow").iter_batches(
        batch_size=None, batch_format="pyarrow"
    ):
        np.add.at(flat, b.column("cell").to_numpy(), b.column("cnt").to_numpy())
    b_arr, nb2_flat, max_nb2 = _plan_salt(counts2d, salt_cap)
    plan_ref = ray.put((b_arr, nb2_flat, max_nb2))

    def assign_salted(batch: pa.Table) -> pa.Table:
        bkt, sh = _bkt_sh(batch, _plasma_cached(C_ref))
        pb_arr, pnb2, pmax = _plasma_cached(plan_ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        n = len(ids)
        # one output row per (row, assignment); row payloads gather via take
        ridx = np.repeat(np.arange(n), na)
        gkey = _gkey_rows(
            bkt.reshape(-1),
            np.repeat(sh, na),
            np.asarray(ids)[ridx],
            pb_arr,
            pnb2,
            pmax,
        )
        out = batch.take(pa.array(ridx)) if na > 1 else batch
        return out.append_column("gkey", pa.array(gkey, pa.int64()))

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # one SUB-bucket per task: ~salt_cap rows, one small matmul
        ids = g[id_col].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        M = _norm_rows(np.stack(g["embedding"].to_numpy()))[order]
        a_out, b_out, s_out = [], [], []
        if len(ids) >= 2:
            S = M @ M.T
            iu = np.triu_indices(len(ids), 1)
            take = min(max_pairs_per_bucket, len(iu[0]))
            a_out.append(ids[iu[0][:take]])
            b_out.append(ids[iu[1][:take]])
            s_out.append(S[iu][:take])  # raw float64: thresholding must not
            # see pre-rounded values (the SQL oracle compares unrounded)
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
        ds.map_batches(assign_salted, batch_format="pyarrow")
        .groupby("gkey")
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
        t = pa.concat_tables(parts)
        # multi-assignment can find the same pair in two buckets: distinct
        # on (a, b) — only threshold-passing pairs reach here, a small table
        df = t.to_pandas().drop_duplicates(["vec_id_a", "vec_id_b"])
        return pa.Table.from_pandas(df, preserve_index=False)

    return {"candidates": candidates, "pairs_fn": pairs_fn}
