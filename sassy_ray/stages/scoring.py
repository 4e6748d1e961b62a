"""Pair-scoring stage: actor-pool map_batches running the batch Myers kernel.

``PairScorer`` is a callable CLASS for ``map_batches(..., concurrency=N)``:
state (the profile tables + the broadcast doc_id->text lookup) is resolved
once per actor in ``__init__`` (mirroring the reference's per-thread Searcher
+ encoded-pattern state, /root/reference/src/search.rs:226-256,404-423);
``__call__`` scores one Arrow batch of pairs vectorized.

Two text-resolution modes:
- ``docs_ref``: a ``ray.put`` object ref of {doc_id: text} — broadcast joins
  the small side once per actor, zero shuffle (right for corpora whose id->
  text map fits a worker; the blocking/scoring path for bench + tests);
- pre-joined columns ``text_a``/``text_b`` in the batch (produced by the
  partitioned hash join in er.py's 'join' mode) — the 10^12-doc scale path.

Match rule: pattern = shorter text, searched semi-globally in the longer
(free ends absorb truncation); a pair matches iff best edit cost <= k(pair)
= max(k_min, floor(rel_k * len(shorter))).  With ``rc=True`` the reverse
complement is tried too (DNA corpora).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from sassy_ray.kernel.myers import batch_best_costs
from sassy_ray.kernel.profiles import get_profile

__all__ = ["ScoreConfig", "PairScorer"]


class ScoreConfig:
    def __init__(
        self,
        profile: str = "ascii_ci",
        k_min: int = 3,
        rel_k: float = 0.12,
        rc: bool = False,
        lowercase: bool = False,
        emit_matches: bool = False,
    ) -> None:
        self.profile = profile
        self.k_min = k_min
        self.rel_k = rel_k
        self.rc = rc
        self.lowercase = lowercase
        # emit_matches: also trace the best match (coords + cigar) for
        # matched pairs — opt-in, traceback costs ~ms per matched pair
        self.emit_matches = emit_matches

    def fingerprint(self) -> str:
        return (f"score({self.profile},k_min={self.k_min},rel_k={self.rel_k},"
                f"rc={self.rc},em={self.emit_matches})")


def _combined(arr):
    """Collapse a (batch-small) ChunkedArray take result to a plain Array."""
    return arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr


import time as _time

_SCORE_PROF_ACC: dict[str, float] = {}


def _score_prof() -> bool:
    import os as _os

    return bool(_os.environ.get("SASSY_SCORE_PROF"))


def _prof_add(phase: str, dt: float) -> None:
    """Per-process phase accumulator; one [scoreprof] line per batch (sum the
    lines per phase across tasks — core-time, the load-robust metric)."""
    _SCORE_PROF_ACC[phase] = _SCORE_PROF_ACC.get(phase, 0.0) + dt


def _chunk_meta(col):
    """Pointer-array view of a ChunkedArray's string/binary buffers for the
    native C gather — built ONCE per column (the _DocLookup caches it) and
    reused every batch.  Returns None when the column is unusable for the
    fast path (plain Array, nulls anywhere, non-string type, or no native
    kernel) — callers fall back to the per-chunk Arrow takes."""
    from sassy_ray.kernel import native as _native

    if not isinstance(col, pa.ChunkedArray) or not _native.available():
        return None
    t = col.type
    big = pa.types.is_large_string(t) or pa.types.is_large_binary(t)
    if not (big or pa.types.is_string(t) or pa.types.is_binary(t)):
        return None
    chunks = list(col.chunks)
    nc = max(1, len(chunks))
    datas = np.zeros(nc, np.uint64)
    offsp = np.zeros(nc, np.uint64)
    is64 = np.zeros(nc, np.uint8)
    base = np.zeros(nc, np.int64)
    for i, c in enumerate(chunks):
        if c.null_count:
            return None
        bufs = c.buffers()
        if len(bufs) < 3 or bufs[1] is None:
            return None
        offsp[i] = bufs[1].address
        # empty-data chunks may carry a NULL data buffer: every row length
        # is 0, so any valid pointer works for the 0-byte memcpys
        datas[i] = bufs[2].address if bufs[2] is not None else bufs[1].address
        is64[i] = 1 if big else 0
        base[i] = c.offset
    return {
        "datas": datas,
        "offs": offsp,
        "is64": is64,
        "base": base,
        "type": t,
        "big": big,
        "chunks": chunks,  # keeps the underlying buffers alive
    }


def _gather(col, rows: np.ndarray, offs: np.ndarray | None = None, meta=None) -> pa.Array:
    """take() with global row indices, resolving chunks MANUALLY.

    Arrow's own ``pc.take`` on a ChunkedArray reassembles the whole column
    per call (measured 921 ms per 8k-row take at a 2.4M-row/192-chunk string
    column vs 1.26 ms combined) — a per-batch disaster against a broadcast
    corpus.  With ``meta`` (a cached :func:`_chunk_meta`) the gather is two
    C passes over the chunk buffers (one output array, request order, zero
    per-chunk Arrow calls — the per-chunk takes below cost ~50us of call
    overhead EACH, ~7 ms/batch at a 560-chunk corpus).  Without it,
    grouping the indices by owning chunk and taking per chunk is ~200 small
    plain-array takes + one concat + one reorder take (~2-4 ms).
    ``offs`` is the cached np.cumsum of chunk lengths (len nchunks+1)."""
    if isinstance(col, pa.Array):
        return pc.take(col, pa.array(rows, pa.int64()))
    if offs is None:
        offs = np.cumsum([0] + [len(c) for c in col.chunks])
    nr = len(rows)
    if nr == 0:
        return pa.array([], col.type)
    if meta is not None:
        from sassy_ray.kernel import native as _native

        rows = np.ascontiguousarray(rows, dtype=np.int64)
        ci = np.ascontiguousarray(np.searchsorted(offs, rows, "right") - 1)
        li = np.ascontiguousarray(rows - offs[ci] + meta["base"][ci])
        out_off, out_data = _native.gather_str(
            meta["datas"], meta["offs"], meta["is64"], ci, li
        )
        if meta["big"]:
            return pa.Array.from_buffers(
                meta["type"], nr, [None, pa.py_buffer(out_off), pa.py_buffer(out_data)]
            )
        if int(out_off[-1]) < 2**31:
            obuf = pa.py_buffer(np.ascontiguousarray(out_off.astype(np.int32)))
            return pa.Array.from_buffers(
                meta["type"], nr, [None, obuf, pa.py_buffer(out_data)]
            )
        # >2 GiB of gathered payload in one int32-offset batch: fall through
    ci = np.searchsorted(offs, rows, "right") - 1
    orderp = np.argsort(ci, kind="stable")
    sci = ci[orderp]
    bounds = np.flatnonzero(np.r_[True, sci[1:] != sci[:-1], True])
    parts = []
    for b0, b1 in zip(bounds[:-1], bounds[1:]):
        c = int(sci[b0])
        sel = rows[orderp[b0:b1]] - offs[c]
        parts.append(pc.take(col.chunk(c), pa.array(sel, pa.int64())))
    gathered = parts[0] if len(parts) == 1 else pa.concat_arrays(parts)
    if bool(np.all(orderp[1:] > orderp[:-1])):
        return gathered  # indices were already chunk-sorted
    inv = np.empty(nr, np.int64)
    inv[orderp] = np.arange(nr)
    return pc.take(gathered, pa.array(inv, pa.int64()))


def _take_nullable(col, idx: pa.Array, offs: np.ndarray | None = None, meta=None) -> pa.Array:
    """``pc.take`` honoring null indices, routed through :func:`_gather`."""
    if isinstance(col, pa.Array):
        return pc.take(col, idx)
    if idx.null_count == 0:
        return _gather(col, idx.to_numpy().astype(np.int64, copy=False), offs, meta)
    valid = np.asarray(pc.is_valid(idx))
    rows = pc.fill_null(idx, 0).to_numpy().astype(np.int64, copy=False)
    vals = _gather(col, rows[valid], offs, meta)
    sel = np.cumsum(valid) - 1
    return pc.take(vals, pa.array(sel, pa.int64(), mask=~valid))


def build_hash_index(ids):
    """Sorted polars-hash index over an id Array/ChunkedArray: returns
    (sorted_hashes int64, row_order int64) or False when unusable (empty,
    64-bit collision between stored ids, or no polars).  Hashing is
    per-chunk (polars' xxhash is row-wise, so chunked == combined —
    pinned by a test) so a plasma-backed chunked id column is never
    rechunked/copied.  Built once per worker — or once on the DRIVER and
    broadcast (see ``docs_hidx`` in the scorer kwargs) so multi-M-doc
    corpora don't pay the hash+argsort in every worker process."""
    try:
        import polars as pl

        if len(ids) == 0:
            return False
        chunks = ids.chunks if isinstance(ids, pa.ChunkedArray) else [ids]
        parts = [
            pl.from_arrow(c).hash(seed=7).to_numpy().view(np.int64)
            for c in chunks
            if len(c)
        ]
        h = parts[0] if len(parts) == 1 else np.concatenate(parts)
        order = np.argsort(h, kind="stable")
        hs = h[order]
        if hs.size > 1 and bool(np.any(hs[1:] == hs[:-1])):
            return False  # 64-bit collision: use index_in path
        return hs, order
    except Exception:
        return False


class _DocLookup:
    """Broadcast id->text lookup that does NOT copy the text payload into
    the worker heap: ids and texts stay in plasma-backed Arrow arrays
    (chunked columns are kept chunked — combining was 30 x 710 MB of
    private copies at the 2.4M-doc gate corpus) and only the batch's rows
    are gathered per call, through the manual chunk-resolving
    :func:`_gather` (Arrow's own chunked take reassembles the whole column
    per call).  The sorted-hash id index is either attached pre-built from
    a driver broadcast (``docs_hidx``) or built once per worker.  A
    per-worker python dict of the whole corpus cost ~1 GB heap + a
    GC-heavy build per worker at 600k docs; this holds O(16 B/doc)."""

    def __init__(self, ids, texts):
        # ids/texts may be pa.Array OR pa.ChunkedArray.  Chunked inputs are
        # kept AS-IS: combining a multi-GB broadcast text column would copy
        # it into every worker's private heap (measured: the dominant cost
        # of the scored stage's worker ramp at 2.4M docs x 30 workers was
        # exactly these 30 private ~710 MB copies) — pc.take gathers
        # per-batch rows straight from the plasma-backed chunks instead.
        self.ids = ids
        self.texts = texts
        # lazy sorted-hash index: pc.index_in rebuilds its hash table of the
        # ENTIRE value_set on every call (~70 ms at 600k ids), so per-batch
        # lookups pay corpus-sized work; hashing the ids ONCE and binary-
        # searching per batch is ~100x cheaper per call
        self._hidx = None
        self._offs = (
            np.cumsum([0] + [len(c) for c in texts.chunks])
            if isinstance(texts, pa.ChunkedArray)
            else None
        )
        self._id_offs = (
            np.cumsum([0] + [len(c) for c in ids.chunks])
            if isinstance(ids, pa.ChunkedArray)
            else None
        )
        # cached pointer-array views for the C gather (None = Arrow path)
        self._tmeta = _chunk_meta(texts)
        self._idmeta = _chunk_meta(ids)

    def _hash_index(self):
        if self._hidx is None:
            self._hidx = build_hash_index(self.ids)
        return self._hidx

    @classmethod
    def from_table(cls, tbl: pa.Table) -> "_DocLookup":
        return cls(tbl.column("doc_id"), tbl.column("text"))

    @classmethod
    def from_dict(cls, d: dict) -> "_DocLookup":
        vals = [
            v.decode() if isinstance(v, bytes) else str(v) for v in d.values()
        ]
        return cls(pa.array(list(d.keys())), pa.array(vals, pa.string()))

    def take_arrow(self, ids, fill: str | None = "") -> pa.Array:
        """Batch ids (pa.Array) -> text pa.Array; misses resolve to ``fill``
        ("" by default; pass ``fill=None`` to keep them as nulls — the label
        attach path coalesces them to the id itself)."""
        import pyarrow.compute as pc

        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        if ids.type != self.ids.type:
            ids = pc.cast(ids, self.ids.type)
        hidx = self._hash_index()
        if hidx:
            import polars as pl

            hs, order = hidx
            bh = pl.from_arrow(ids).hash(seed=7).to_numpy().view(np.int64)
            # sorted probes: consecutive binary searches then descend
            # overlapping index paths (3.9 -> 1.3+argsort ms per 8k probes
            # over a 7M-entry index, measured) — random-order probes miss
            # DRAM on every lower level of the 56 MB array
            so = np.argsort(bh, kind="stable")
            pos = np.empty(bh.size, np.int64)
            pos[so] = np.searchsorted(hs, bh[so])
            pos[pos >= hs.size] = 0
            hit = hs[pos] == bh
            idx = pa.array(order[pos], pa.int64(), mask=~hit)
            # a probe id ABSENT from the set can still hash-collide with a
            # stored id (the build-time duplicate check only covers ids
            # within the set) — confirm the gathered ids actually equal the
            # probes (one vectorized pc.equal) before trusting the hit
            if hit.any():
                got_ids = _take_nullable(self.ids, idx, self._id_offs, self._idmeta)
                eq = pc.fill_null(pc.equal(got_ids, ids), False)
                if not pc.all(eq).as_py():
                    idx = pc.if_else(eq, idx, pa.scalar(None, pa.int64()))
        else:
            idx = pc.index_in(ids, value_set=self.ids)
        got = _take_nullable(self.texts, idx, self._offs, self._tmeta)
        return got if fill is None else pc.fill_null(got, fill)

    def get_many(self, ids: list) -> list[bytes]:
        got = self.take_arrow(pa.array(ids)).to_pylist()
        return [(g or "").encode() for g in got]


# per-worker cache of the broadcast lookup: built once per process, never
# once per task/batch
_BCAST_CACHE: dict[str, _DocLookup] = {}


def _resolve_docs(docs_ref, hidx_ref=None) -> _DocLookup:
    if isinstance(docs_ref, _DocLookup):
        return docs_ref
    if isinstance(docs_ref, dict):
        return _DocLookup.from_dict(docs_ref)
    if isinstance(docs_ref, list):  # list of block ObjectRefs (to_arrow_refs)
        key = "|".join(r.hex() for r in docs_ref[:4]) + f":{len(docs_ref)}"
    else:
        key = docs_ref.hex() if hasattr(docs_ref, "hex") else str(id(docs_ref))
    hit = _BCAST_CACHE.get(key)
    if hit is None:
        import ray

        if isinstance(docs_ref, list):
            tbl = pa.concat_tables(ray.get(docs_ref))  # zero-copy chunk concat
        else:
            obj = ray.get(docs_ref)
            if isinstance(obj, dict):
                hit = _DocLookup.from_dict(obj)
                _BCAST_CACHE.clear()
                _BCAST_CACHE[key] = hit
                return hit
            tbl = obj
        hit = _DocLookup.from_table(tbl)
        if hidx_ref is not None:
            # driver-built sorted-hash index, read zero-copy from plasma —
            # skips the per-worker hash+argsort (~0.5 s at 2.4M ids)
            try:
                hs, order = ray.get(hidx_ref)
                hit._hidx = (np.asarray(hs), np.asarray(order))
            except Exception:
                pass
        _BCAST_CACHE.clear()
        _BCAST_CACHE[key] = hit
    return hit


def score_pairs_batch(
    batch: pa.Table,
    cfg: ScoreConfig,
    docs_ref=None,
    pre_lowercased: bool = False,
    docs_hidx=None,
) -> pa.Table:
    """Stateless-task variant of the scorer: runs in Ray's pre-started warm
    workers (no actor spin-up).  The broadcast lookup resolves through a
    per-worker cache (one plasma fetch + one dict build per process).  Use
    the actor-pool ``PairScorer`` when per-worker state is genuinely
    expensive to build."""
    return PairScorer(cfg, docs_ref, pre_lowercased, docs_hidx)(batch)


class PairScorer:
    def __init__(
        self,
        cfg: ScoreConfig,
        docs_ref=None,
        pre_lowercased: bool = False,
        docs_hidx=None,
    ) -> None:
        self.cfg = cfg
        self.prof = get_profile(cfg.profile)
        self.pre_lowercased = pre_lowercased
        self.docs: dict[str, bytes] | None = None
        if docs_ref is not None:
            self.docs = _resolve_docs(docs_ref, docs_hidx)

    def _texts_arrow(self, batch: pa.Table, col: str, id_col: str) -> pa.Array:
        if col in batch.column_names:
            arr = batch.column(col)
            arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
            import pyarrow.compute as pc

            return pc.fill_null(arr, "")
        assert self.docs is not None, f"no {col} column and no docs_ref broadcast"
        return self.docs.take_arrow(batch.column(id_col))

    @staticmethod
    def _length_chunks(
        tlens, order, ratio: float = 1.3, min_chunk: int = 1024, max_chunk: int | None = None
    ):
        """Split ``order`` (indices pre-sorted by ascending text length) into
        chunks whose max/min length ratio stays below ``ratio`` — kernel cost
        is B x max(text len) per call, so a lone long text must not make the
        whole batch pay its steps.  ``min_chunk`` bounds dispatch overhead;
        ``max_chunk`` bounds the kernel working set (L limbs x B x ~8 uint64
        state arrays re-scanned every text char: at B=8192 x 5 limbs that is
        ~2.6 MB — out of L2 and streamed from DRAM per step.  Measured
        single-core on 300-ch/k=17 pairs: B=1024-2048 is 1.5-2.1x faster than
        B=8192-16384, and the cache-resident set also stops 30 concurrent
        scorer processes fighting for this node's memory bandwidth)."""
        chunks = []
        i, nt = 0, len(order)
        while i < nt:
            lo = max(1, int(tlens[order[i]]))
            j = min(i + min_chunk, nt)
            while j < nt and tlens[order[j]] <= lo * ratio:
                j += 1
            if max_chunk is not None:
                j = min(j, i + max_chunk)
            chunks.append(order[i:j])
            i = j
        return chunks

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        _prof = _score_prof()
        _t0 = _prof and _time.time()
        cfg = self.cfg
        ta = self._texts_arrow(batch, "text_a", "doc_id_a")
        tb = self._texts_arrow(batch, "text_b", "doc_id_b")
        if cfg.lowercase and not self.pre_lowercased:
            ta = pc.utf8_lower(ta)
            tb = pc.utf8_lower(tb)
        if _prof:
            _prof_add("gather", _time.time() - _t0)
        n = len(ta)
        if n == 0:
            return pa.table(
                {
                    "doc_id_a": pa.array([], pa.string()),
                    "doc_id_b": pa.array([], pa.string()),
                    "cost": pa.array([], pa.int32()),
                    "k": pa.array([], pa.int32()),
                    "is_match": pa.array([], pa.bool_()),
                }
            )
        # orientation (pattern = shorter side): on the native non-RC path
        # the side pick rides into the C rows builder as a mask — neither
        # pc.if_else (two full-batch payload copies) nor the per-chunk
        # pc.take happens at all; elsewhere one vectorized if_else (the
        # batch never round-trips through Python lists)
        _t0 = _prof and _time.time()
        la = pc.binary_length(ta).to_numpy()
        lb = pc.binary_length(tb).to_numpy()
        min_len = np.minimum(la, lb)
        k_pair = np.maximum(cfg.k_min, (cfg.rel_k * min_len).astype(np.int64)).astype(np.int32)
        k_max = int(k_pair.max())
        rc = cfg.rc and self.prof.supports_rc

        from sassy_ray.kernel import native as _native

        sel2 = None
        if _native.available() and not cfg.emit_matches:
            ma = _native.str_buf_meta(ta)
            mb = _native.str_buf_meta(tb)
            if ma is not None and mb is not None:
                sel2 = (ma, mb)
        pats_arr = txts_arr = None
        if sel2 is None:
            a_shorter = pa.array(la <= lb)
            pats_arr = pc.if_else(a_shorter, ta, tb)
            txts_arr = pc.if_else(a_shorter, tb, ta)
        if _prof:
            _prof_add("orient", _time.time() - _t0)

        if _native.available():
            # compiled scorer: every pair walks its own text start-to-finish
            # with its own band (per-job k), so the limb buckets and the
            # 63-char suffix screen — which exist to keep the BATCH-axis
            # NumPy kernel dense and cache-resident — collapse away (screen
            # A/B measured slower with the C band: a 1-limb screen pass +
            # banded verify ~= the banded full scan the screen tries to
            # avoid, minus the extra prep).  LENGTH sub-chunks survive in
            # coarse form: NativeBatch pads its rows matrix to the batch max
            # text AND sizes every pattern's PEQ at the batch-max limb
            # count, so one 5k-char pair in an 8k batch multiplies the
            # setup's memset/remap traffic ~10x (measured 53 -> ~8 ms per
            # 8192-pair batch on the sf0.1 corpus).  rc corpora fuse BOTH
            # strands into one NativeBatch per chunk (see the rc branch
            # below).
            from sassy_ray.kernel.myers import TextRows
            from sassy_ray.kernel.native import NativeBatch

            k_arr = k_pair.astype(np.int64)
            tl = np.maximum(la, lb)
            order = np.argsort(tl, kind="stable")
            chunks = self._length_chunks(tl, order, ratio=1.6, min_chunk=2048)
            cost = np.empty(n, dtype=np.int64)
            if sel2 is not None:
                pick_txt = (la <= lb).astype(np.uint8)  # text = the longer side
                pick_pat = (np.uint8(1) - pick_txt)
            for ch in chunks:
                _t0 = _prof and _time.time()
                sub_k = k_arr[ch]
                s = len(ch)
                if sel2 is not None:
                    ch64 = np.ascontiguousarray(ch, dtype=np.int64)
                    plens = np.ascontiguousarray(min_len[ch], dtype=np.int64)
                    tlens_c = np.ascontiguousarray(tl[ch], dtype=np.int64)
                    pmat = _native.rows_sel2(
                        sel2[0], sel2[1], pick_pat, ch64, int(plens.max()) if len(plens) else 1
                    )
                    tmat = _native.rows_sel2(
                        sel2[0], sel2[1], pick_txt, ch64, int(tlens_c.max()) if len(tlens_c) else 1
                    )
                    pat_rows, txt_rows = TextRows(pmat, plens), TextRows(tmat, tlens_c)
                else:
                    ch_pa = pa.array(ch)
                    sub_p = pc.take(pats_arr, ch_pa)
                    sub_t = pc.take(txts_arr, ch_pa)
                    pat_rows, txt_rows = sub_p, sub_t
                if rc:
                    # BOTH strands in ONE NativeBatch: patterns = [fwd; rc]
                    # stacked rows sharing the single text matrix, jobs
                    # interleaved (2i = fwd i, 2i+1 = rc i) so the stable
                    # length sort keeps a pair's two scans ADJACENT — the
                    # second strand re-reads the SAME text row L1-warm, and
                    # the text matrix / remap / histogram build once instead
                    # of twice (the old shape paid a full second NativeBatch
                    # over identical texts)
                    tr = TextRows.from_any(pat_rows)
                    comp = TextRows(self.prof.complement_lut[tr.mat], tr.lens)
                    rcr = comp.reversed()
                    w = max(tr.mat.shape[1], rcr.mat.shape[1], 1)
                    both = np.zeros((2 * s, w), dtype=np.uint8)
                    both[0::2, : tr.mat.shape[1]] = tr.mat
                    both[1::2, : rcr.mat.shape[1]] = rcr.mat
                    lens2 = np.empty(2 * s, np.int64)
                    lens2[0::2] = tr.lens
                    lens2[1::2] = rcr.lens
                    nb = NativeBatch(
                        TextRows(both, lens2), txt_rows, self.prof, int(sub_k.max())
                    )
                    job_p = np.arange(2 * s, dtype=np.int64)
                    job_t = np.ascontiguousarray(np.repeat(np.arange(s, dtype=np.int64), 2))
                    k2 = np.ascontiguousarray(np.repeat(sub_k, 2))
                    if _prof:
                        _t1 = _time.time()
                        _prof_add("setup", _t1 - _t0)
                    c2 = nb.run_best(job_p, job_t, 2 * s, k_arr=k2)
                    c = c2.reshape(s, 2).min(axis=1)
                    if _prof:
                        _prof_add("kernel", _time.time() - _t1)
                else:
                    nb = NativeBatch(pat_rows, txt_rows, self.prof, int(sub_k.max()))
                    if _prof:
                        _t1 = _time.time()
                        _prof_add("setup", _t1 - _t0)
                    c = nb.run_best(k_arr=sub_k)
                    if _prof:
                        _prof_add("kernel", _time.time() - _t1)
                cost[ch] = c
            cost = np.minimum(cost.astype(np.int32), k_pair + 1)
            _t0 = _prof and _time.time()
            out = self._emit(batch, cost, k_pair, pats_arr, txts_arr, k_max, n)
            if _prof:
                _prof_add("emit", _time.time() - _t0)
                import sys as _sys

                print(
                    "[scoreprof] "
                    + " ".join(f"{k}={v:.3f}" for k, v in sorted(_SCORE_PROF_ACC.items())),
                    file=_sys.stderr,
                )
                _SCORE_PROF_ACC.clear()
            return out

        # --- stage 1: 63-char suffix screen (single-limb kernel) ----------
        # The suffix's best end-cost lower-bounds the full pattern's (the
        # restriction of any full alignment to the last SUF pattern chars
        # ends at the same position and cannot cost more), so pairs whose
        # suffix minimum exceeds k_pair are exact non-matches — only
        # survivors pay the multi-limb full kernel (~8x heavier for
        # paragraph-length patterns).  Reported cost is clamped to
        # k_pair + 1 ("no match at this k"), sassy's without_trace
        # convention (search.rs:447-451).
        SUF = 63  # max single-limb suffix: stays on the L=1 fast path while
        # leaving headroom over k (rel_k * paragraph lengths reaches ~20)
        use_screen = k_max < SUF - 8 and int(min_len.max()) > 2 * SUF
        tlens = np.maximum(la, lb)
        if use_screen:
            # suffix slice, vectorized: reverse -> take first SUF -> reverse
            suf = pc.utf8_reverse(
                pc.utf8_slice_codeunits(pc.utf8_reverse(pats_arr), 0, SUF)
            )
            suf_rc = None
            if rc:
                # rc suffix = rc of the FIRST SUF pattern chars
                pre = pc.utf8_slice_codeunits(pats_arr, 0, SUF)
                suf_rc = [self.prof.reverse_complement((p or "").encode()) for p in pre.to_pylist()]
            # text-length-homogeneous chunks: scan steps = chunk max length
            smin = np.empty(n, dtype=np.int32)
            t_order = np.argsort(tlens, kind="stable")
            for chunk in self._length_chunks(tlens, t_order):
                take = pa.array(chunk)
                sub_t = txts_arr.take(take)
                sc = batch_best_costs(suf.take(take), sub_t, self.prof, k_max)
                if rc:
                    rc_chunk = [suf_rc[i] for i in chunk.tolist()]
                    sc = np.minimum(sc, batch_best_costs(rc_chunk, sub_t, self.prof, k_max))
                smin[chunk] = sc
            todo = np.nonzero(smin <= k_pair)[0]
        else:
            todo = np.arange(n)

        # --- stage 2: full kernel on survivors, bucketed by limb count ----
        # (a batch's kernel cost is B x max(L); mixing a 64-char pattern
        # with a 560-char one makes everyone pay 9 limbs.  A limb-bucket-
        # MERGING variant — bigger calls, padding waste bounded by the
        # per-call dispatch cost — measured 1.24x single-core but 1.25x
        # SLOWER on the warm scored stage at 32 procs: at full occupancy
        # the node is DRAM-bound, so the padded limb-rows are extra bytes,
        # not amortized dispatch.  Strict equal-limb buckets are the
        # minimum-traffic chunking and win where it counts.)
        cost = np.full(n, np.int32(np.iinfo(np.int32).max // 2), dtype=np.int32)
        limbs = (min_len + 63) // 64
        # (limbs, text length) sort: limb buckets bound per-step cost, the
        # length sub-chunks bound the step count (one long text otherwise
        # makes the whole bucket pay its scan length)
        order = todo[np.lexsort((tlens[todo], limbs[todo]))]
        nt = len(order)
        i = 0
        while i < nt:
            L0 = limbs[order[i]]
            j = i
            while j < nt and limbs[order[j]] == L0:
                j += 1
            # max_chunk 2048: full-kernel state must stay cache-resident
            # (see _length_chunks docstring); the suffix screen above runs
            # uncapped — its single-limb state is ~64 B/row, L2-resident at
            # any batch width
            for idx in self._length_chunks(tlens, order[i:j], max_chunk=2048):
                take = pa.array(idx)
                sub_p = pats_arr.take(take)
                sub_t = txts_arr.take(take)
                # per-chunk k: the banded path prunes by the threshold, and
                # every row's own k is <= the chunk max (the clamp stays
                # exact — costs above kc report kc+1, later clamped to
                # k_pair+1), so limb buckets with short patterns get the
                # tighter band their own k implies instead of the batch max
                kc = int(k_pair[idx].max())
                c = batch_best_costs(sub_p, sub_t, self.prof, kc)
                if rc:
                    rc_p = [self.prof.reverse_complement((p or "").encode()) for p in sub_p.to_pylist()]
                    c = np.minimum(c, batch_best_costs(rc_p, sub_t, self.prof, kc))
                cost[idx] = c
            i = j
        cost = np.minimum(cost, k_pair + 1)
        return self._emit(batch, cost, k_pair, pats_arr, txts_arr, k_max, n)

    def _emit(self, batch, cost, k_pair, pats_arr, txts_arr, k_max, n) -> pa.Table:
        cfg = self.cfg
        is_match = cost <= k_pair
        out = {
            "doc_id_a": batch.column("doc_id_a"),
            "doc_id_b": batch.column("doc_id_b"),
            "cost": pa.array(cost, pa.int32()),
            "k": pa.array(k_pair, pa.int32()),
            "is_match": pa.array(is_match),
        }
        if cfg.emit_matches:
            # full Match coordinates for the matched pairs (sassy parity:
            # best match of the shorter doc inside the longer, traced)
            from sassy_ray.kernel.search import Searcher

            searcher = Searcher(
                cfg.profile, rc=cfg.rc, only_best_match=True, case_sensitive=False
            )
            starts = np.full(n, -1, dtype=np.int64)
            ends = np.full(n, -1, dtype=np.int64)
            strands = [""] * n
            cigars = [""] * n
            hit = np.nonzero(is_match)[0]
            if len(hit):
                take = pa.array(hit)
                hp = [(p or "").encode() for p in pats_arr.take(take).to_pylist()]
                ht = [(t or "").encode() for t in txts_arr.take(take).to_pylist()]
                res = searcher.search_pairs(hp, ht, k_max)
                for hi_, ms in zip(hit.tolist(), res):
                    best = min(ms, key=lambda m: (m.cost, -m.text_end), default=None)
                    if best is not None:
                        starts[hi_] = best.text_start
                        ends[hi_] = best.text_end
                        strands[hi_] = best.strand
                        cigars[hi_] = best.cigar
            out["text_start"] = pa.array(starts)
            out["text_end"] = pa.array(ends)
            out["strand"] = pa.array(strands)
            out["cigar"] = pa.array(cigars)
        return pa.table(out)
