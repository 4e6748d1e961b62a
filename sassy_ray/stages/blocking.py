"""Blocking stage: q-gram MinHash-LSH signatures -> (block_key, doc_id) rows.

A stateless vectorized ``map_batches`` transform: per document, hash all
character q-gram shingles of the concatenated span text (one rolling-hash
pass over the whole batch, no per-row Python), take ``num_perm`` minhashes
by ONE-PERMUTATION HASHING (bucket by hash low bits, scatter-min per
(row, bucket), rotation densification), fold them into ``bands`` band keys,
and explode to one row per (band, doc).  Documents sharing any band key
become co-blocked.

Scale notes (10^12 docs): the output is ``bands`` rows per doc with a single
uint64 key — the only state is the per-call permutation constants (seeded).
Hot/degenerate keys (e.g. all-identical or ultra-short texts) are handled
downstream by the pair generator's salting + caps (pairs.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["BlockingConfig", "minhash_block_rows"]

_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)
_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & _MASK
    x = ((x ^ (x >> np.uint64(30))) * _MIX1) & _MASK
    x = ((x ^ (x >> np.uint64(27))) * _MIX2) & _MASK
    return x ^ (x >> np.uint64(31))


_DNA_COMP = np.arange(256, dtype=np.uint8)
for _a, _b in ((65, 84), (67, 71), (84, 65), (71, 67), (97, 116), (99, 103), (116, 97), (103, 99)):
    _DNA_COMP[_a] = _b


class BlockingConfig:
    def __init__(
        self,
        q: int = 12,
        num_perm: int = 32,
        bands: int = 16,
        seed: int = 42,
        text_col: str = "text",
        id_col: str = "doc_id",
        lowercase: bool = True,
        rc_canonical: bool = False,
    ) -> None:
        assert num_perm % bands == 0, "num_perm must be divisible by bands"
        assert num_perm & (num_perm - 1) == 0, "num_perm must be a power of 2 (OPH bucketing)"
        self.q = q
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.seed = seed
        self.text_col = text_col
        self.id_col = id_col
        self.lowercase = lowercase
        # rc_canonical: shingle hash = min(h(s), h(revcomp(s))) — makes DNA
        # signatures invariant under reverse-complement of the document
        self.rc_canonical = rc_canonical
        rng = np.random.default_rng(seed)
        # odd multipliers + offsets for the permutation family
        self.mult = (rng.integers(0, 2**63, num_perm, dtype=np.uint64) << np.uint64(1)) | np.uint64(1)
        self.add = rng.integers(0, 2**63, num_perm, dtype=np.uint64)

    def fingerprint(self) -> str:
        return (
            f"minhash-oph(q={self.q},perm={self.num_perm},bands={self.bands},"
            f"seed={self.seed},lower={self.lowercase},rc={self.rc_canonical})"
        )


def _shingle_hashes(buf: np.ndarray, q: int, rc_canonical: bool = False) -> np.ndarray:
    """Rolling polynomial hash of every q-window of ``buf`` (may cross row
    boundaries; caller masks invalid windows).  With ``rc_canonical`` the
    hash of each window is min(h(window), h(revcomp(window)))."""
    n = len(buf) - q + 1
    if n <= 0:
        return np.zeros(0, dtype=np.uint64)
    B = np.uint64(1099511628211)
    h = np.zeros(n, dtype=np.uint64)
    b64 = buf.astype(np.uint64)
    for j in range(q):
        h = (h * B + b64[j : j + n]) & _MASK
    if rc_canonical:
        c64 = _DNA_COMP[buf].astype(np.uint64)
        hr = np.zeros(n, dtype=np.uint64)
        # revcomp window hash: complement bases in reverse order
        pows = np.array([pow(int(B), j, 2**64) for j in range(q)], dtype=np.uint64)
        for j in range(q):
            hr = (hr + c64[j : j + n] * pows[j]) & _MASK
        h = np.minimum(h, hr)
    return _splitmix64(h)


def minhash_signatures(texts: list[bytes], cfg: BlockingConfig) -> np.ndarray:
    """List-of-bytes convenience wrapper around ``minhash_signatures_buf``."""
    lens = np.array([len(t) for t in texts], dtype=np.int64)
    buf = np.frombuffer(b"".join(texts), dtype=np.uint8)
    starts = np.concatenate([[0], np.cumsum(lens)])
    return minhash_signatures_buf(buf, starts, cfg)


def minhash_signatures_buf(buf: np.ndarray, starts: np.ndarray, cfg: BlockingConfig) -> np.ndarray:
    """(n_docs, num_perm) uint64 signatures via ONE-PERMUTATION HASHING:
    shingle hashes are bucketed by their low bits and the min is kept per
    (row, bucket), with rotation densification for empty buckets (Li/Owen/
    Zhang's OPH — a published minhash variant).  One pass over the hash
    array instead of ``num_perm`` permutation passes: the k-perm scheme's
    ~60 full-array passes made the blocking stage DRAM-bandwidth-bound at
    high process counts (measured 4.5x core-time inflation at 16 procs).

    Input is the CONCATENATED byte buffer + row start offsets (n_docs + 1
    entries) — callers with Arrow string columns pass the offsets/data
    buffers directly (zero-copy), no per-row Python, no payload copy."""
    n_docs = len(starts) - 1
    P = cfg.num_perm
    sig = np.full((n_docs, P), _MASK, dtype=np.uint64)
    if n_docs == 0:
        return sig
    lens = np.diff(starts)
    from sassy_ray.kernel import native as _native

    if _native.available():
        # per-row rolling hash + bucket-min in one C pass (bit-identical;
        # per-row processing also makes the cross-row-window masking moot).
        # The NumPy path below pays ~24 B of index/arange traffic per text
        # byte per polynomial step plus a ufunc.at scatter (~20M elem/s) —
        # it was the ER pipeline's largest stage at the gate corpus.
        _native.minhash_rows(
            np.ascontiguousarray(buf),
            np.ascontiguousarray(starts, dtype=np.int64),
            cfg.q, P, cfg.rc_canonical, _DNA_COMP, sig,
        )
    else:
        h = _shingle_hashes(buf, cfg.q, cfg.rc_canonical)
        if len(h):
            idx = np.arange(len(h))
            row_of = np.searchsorted(starts[1:], idx, side="right")
            # windows crossing a row boundary must not contribute to either row
            seg_stop = np.maximum(starts[1:] - cfg.q + 1, starts[:-1])
            valid = idx < seg_stop[np.minimum(row_of, n_docs - 1)]
            hv = h[valid]
            rv = row_of[valid]
            bucket = (hv & np.uint64(P - 1)).astype(np.int64)
            np.minimum.at(sig.reshape(-1), rv * P + bucket, hv)
    has = sig != _MASK  # (n_docs, P)
    # densification: empty buckets borrow the next non-empty bucket's value
    # (rotate right), re-mixed with the bucket index so borrowed values
    # differ across buckets; fully-empty rows (len < q) fall through below
    need = ~has & has.any(axis=1)[:, None]
    if need.any():
        filled = sig.copy()
        for _ in range(P):
            take = filled == _MASK
            if not take.any():
                break
            filled = np.where(take, np.roll(filled, 1, axis=1), filled)
        borrow = _splitmix64(filled ^ (np.arange(P, dtype=np.uint64) * _MIX2)[None, :])
        sig = np.where(need, borrow, sig)
    # short rows (< q chars): single shingle = hash of the whole row text
    short = ~has.any(axis=1) & (lens > 0)
    if short.any():
        for i in np.nonzero(short)[0]:
            row = np.zeros(max(cfg.q, int(lens[i])), dtype=np.uint8)
            row[: lens[i]] = buf[starts[i] : starts[i + 1]]
            hh = _shingle_hashes(row, cfg.q, cfg.rc_canonical)
            sig[i, :] = _splitmix64((hh[0] * cfg.mult + cfg.add) & _MASK)
    return sig


def band_keys(sig: np.ndarray, cfg: BlockingConfig) -> np.ndarray:
    """(n_docs, bands) uint64 LSH band keys."""
    n = sig.shape[0]
    folded = sig.reshape(n, cfg.bands, cfg.rows_per_band)
    key = np.zeros((n, cfg.bands), dtype=np.uint64)
    for r in range(cfg.rows_per_band):
        key = _splitmix64((key ^ folded[:, :, r]) & _MASK)
    key = (key ^ (np.arange(cfg.bands, dtype=np.uint64) * _MIX1)[None, :]) & _MASK
    return _splitmix64(key)


def _string_buf_offsets(texts_col) -> tuple[np.ndarray, np.ndarray]:
    """Arrow string column -> (uint8 data view, int64 start offsets with
    starts[0] == 0) straight off the Arrow buffers — the rolling hash reads
    the column's own memory; no ``to_pylist`` row copies, no ``b"".join``."""
    import pyarrow.compute as pc

    arr = texts_col.combine_chunks() if isinstance(texts_col, pa.ChunkedArray) else texts_col
    if arr.null_count:
        arr = pc.fill_null(arr, "")
    n = len(arr)
    if n == 0:
        return np.zeros(0, np.uint8), np.zeros(1, np.int64)
    off_dt = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    bufs = arr.buffers()
    off = np.frombuffer(bufs[1], off_dt, n + 1, offset=arr.offset * np.dtype(off_dt).itemsize)
    starts = off.astype(np.int64) - int(off[0])
    data = np.frombuffer(bufs[2], np.uint8, int(starts[-1]), offset=int(off[0]))
    return data, starts


def minhash_block_rows(batch: pa.Table, cfg: BlockingConfig) -> pa.Table:
    """map_batches body: docs batch -> exploded (block_key, doc_id) rows."""
    texts_col = batch.column(cfg.text_col)
    if cfg.lowercase:
        import pyarrow.compute as pc

        texts_col = pc.utf8_lower(texts_col)
    buf, starts = _string_buf_offsets(texts_col)
    sig = minhash_signatures_buf(buf, starts, cfg)
    keys = band_keys(sig, cfg)  # (n, bands)
    n = len(starts) - 1
    doc_ids = batch.column(cfg.id_col)
    rep = np.repeat(np.arange(n), cfg.bands)
    # int64 VIEW of the uint64 keys: values above 2^63 as uint64 overflow
    # Arrow's int64 conversion in Ray's aggregate machinery and silently
    # demote the whole shuffle to pickled python objects
    return pa.table(
        {
            "block_key": pa.array(keys.reshape(-1).view(np.int64), type=pa.int64()),
            cfg.id_col: doc_ids.take(pa.array(rep)),
        }
    )
