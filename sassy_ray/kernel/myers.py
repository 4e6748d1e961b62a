"""Vectorized bit-parallel Myers kernel (the production scorer).

Implements Myers'99 / Hyyro's bit-vector edit-distance search (public
algorithms) vectorized with NumPy across a *batch* of (pattern, text) pairs:
all bit-vector state is ``(B, L)`` uint64 arrays (B pairs x L 64-bit limbs per
pattern), advanced one text character per step.  This plays the role of the
reference's SIMD kernels (``/root/reference/src/bitpacking.rs``,
``src/pattern_tiling/*``) but vectorizes across the batch axis instead of
text-chunk/pattern lanes — the natural axis for Arrow record batches.

Semantics (pinned by fuzz tests against ``sassy_ray.kernel.oracle``):
- semi-global: free text start (no horizontal input at row 0);
- column-0 boundary = cumulative +1 deltas, or the floor(j*alpha) overhang
  pattern when ``alpha`` is set (cf. search.rs:1692-1748);
- right overhang via wildcard steps past each text's end (every pattern char
  matches), plus floor(alpha*o) added to reported costs at extension
  position o (cf. search.rs:1274-1282).

Outputs a dense ``(B, W)`` end-cost matrix and vectorized local-minima /
all-minima extraction identical to the reference walk (search.rs:1284-1369).
"""

from __future__ import annotations

import math
import os

import numpy as np

from sassy_ray.kernel.profiles import Profile

__all__ = ["BatchKernel", "batch_end_costs", "batch_find_minima", "batch_best_costs"]

_BIG = np.int32(2**30)
_ONE = np.uint64(1)
_SIX3 = np.uint64(63)
_ALL_BYTES = np.arange(256, dtype=np.uint8)


def _overhang_steps_arr(m: np.ndarray, k: int, alpha: float | None, max_overhang: int | None) -> np.ndarray:
    if alpha is None:
        return np.zeros_like(m)
    cap = math.ceil((k + alpha) / alpha) if alpha > 0 else None
    o = m.copy()
    if cap is not None:
        o = np.minimum(o, cap)
    if max_overhang is not None:
        o = np.minimum(o, max_overhang)
    return o


def _left_boundary_deltas(m_pad: int, alpha: float | None, max_overhang: int | None) -> np.ndarray:
    """Column-0 vertical deltas (one per pattern row), values in {0,1}."""
    j = np.arange(1, m_pad + 1, dtype=np.int64)
    if alpha is None:
        return np.ones(m_pad, dtype=np.uint8)
    mo = max_overhang if max_overhang is not None else m_pad
    jm = np.minimum(j, mo)
    b = np.floor(jm * alpha).astype(np.int64) + np.maximum(j - mo, 0)
    return np.diff(np.concatenate([[0], b])).astype(np.uint8)


def _pack_bits_u64(bits: np.ndarray) -> np.ndarray:
    """(..., L*64) bool -> (..., L) uint64, little-endian bit order."""
    packed = np.packbits(bits, axis=-1, bitorder="little")
    return packed.view(np.uint64)


class TextRows:
    """A column of texts held as ONE padded uint8 matrix + lengths.

    Built zero-copy-style from an Arrow string/binary array (one vectorized
    scatter off the offsets/data buffers — no to_pylist round-trip) and fed
    straight into the kernels (``_pad_texts`` recognizes it and returns the
    matrix as-is).  Behaves like a read-only ``list[bytes]`` everywhere the
    search paths index individual texts (traceback windows, n-filters) —
    only those rows ever materialize Python bytes.  RC passes use
    ``reversed()``: one vectorized take_along_axis gather instead of a
    per-row Python ``t[::-1]`` pass over the whole batch.

    ``codes_ab`` marks a PRE-REMAPPED matrix: ``mat`` holds dense alphabet
    codes and ``codes_ab[code]`` is the original byte (the fused C chunk
    builder writes codes during the copy, so NativeBatch skips its own
    histogram + remap passes).  Byte materialization (``__getitem__``)
    inverse-maps, so traceback / n-filter / filter_fn consumers still see
    raw bytes; the byte-domain NumPy kernels refuse coded input loudly
    (``_rows_matrix``)."""

    __slots__ = ("mat", "lens", "codes_ab")

    def __init__(self, mat: np.ndarray, lens: np.ndarray, codes_ab: np.ndarray | None = None):
        self.mat = mat
        self.lens = np.asarray(lens, dtype=np.int64)
        self.codes_ab = codes_ab

    @classmethod
    def from_any(cls, rows) -> "TextRows":
        if isinstance(rows, cls):
            return rows
        mat, lens = _rows_matrix(rows)
        return cls(mat, lens)

    def __len__(self) -> int:
        return len(self.lens)

    def __getitem__(self, i: int) -> bytes:
        row = self.mat[i, : self.lens[i]]
        if self.codes_ab is not None:
            row = self.codes_ab[row]
        return row.tobytes()

    def __iter__(self):
        return (self[i] for i in range(len(self)))

    def reversed(self) -> "TextRows":
        from sassy_ray.kernel import native

        if native.available() and self.mat.size:
            # C per-row byte reverse (AVX2) — the NumPy take_along_axis
            # moves ~8 B of int64 index traffic per payload byte and was
            # ~55% of a 64x100kb rc search (18 of 31 ms)
            return TextRows(
                native.reverse_rows(self.mat, self.lens), self.lens, self.codes_ab
            )
        n, w = self.mat.shape
        idx = self.lens[:, None] - 1 - np.arange(w, dtype=np.int64)[None, :]
        np.maximum(idx, 0, out=idx)
        rev = np.take_along_axis(self.mat, idx, axis=1)
        rev[np.arange(w)[None, :] >= self.lens[:, None]] = 0
        return TextRows(rev, self.lens, self.codes_ab)

    def take(self, idx) -> "TextRows":
        idx = np.asarray(idx, dtype=np.int64)
        lens = self.lens[idx]
        w = max(1, int(lens.max()) if len(lens) else 1)
        return TextRows(np.ascontiguousarray(self.mat[idx, :w]), lens, self.codes_ab)


def _rows_matrix(rows, min_width: int = 1) -> tuple[np.ndarray, np.ndarray]:
    """Rows of bytes -> (padded uint8 matrix, lengths).

    Accepts a list[bytes], a ``TextRows`` (returned as-is), OR an Arrow
    string/binary array — the Arrow path builds the matrix with ONE
    vectorized scatter from the array's offsets+data buffers (zero per-row
    Python), which is how the scorer stages feed batches in without a
    to_pylist round-trip."""
    if isinstance(rows, TextRows):
        if rows.codes_ab is not None and not (
            len(rows.codes_ab) == 256 and rows.codes_ab[255] == 255
        ):
            # dense-coded rows are only legible to NativeBatch's codes path;
            # a byte-domain kernel reading them would be silently wrong
            raise RuntimeError("coded TextRows fed to a byte-domain kernel")
        if rows.mat.shape[1] < min_width:
            mat = np.zeros((len(rows.lens), min_width), dtype=np.uint8)
            mat[:, : rows.mat.shape[1]] = rows.mat
            return mat, rows.lens
        return rows.mat, rows.lens
    try:
        import pyarrow as pa

        is_arrow = isinstance(rows, (pa.Array, pa.ChunkedArray))
    except ImportError:  # pragma: no cover
        is_arrow = False
    if is_arrow:
        import pyarrow as pa

        arr = rows.combine_chunks() if isinstance(rows, pa.ChunkedArray) else rows
        if pa.types.is_string(arr.type):
            arr = arr.cast(pa.binary())
        elif pa.types.is_large_string(arr.type):
            arr = arr.cast(pa.large_binary())
        if arr.null_count:
            arr = arr.fill_null(b"")
        if arr.offset != 0:
            arr = pa.concat_arrays([arr])
        n = len(arr)
        off_dt = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
        bufs = arr.buffers()
        off = np.frombuffer(bufs[1], off_dt, n + 1).astype(np.int64)
        data = np.frombuffer(bufs[2], np.uint8, int(off[-1])) if off[-1] else np.zeros(0, np.uint8)
        lens = np.diff(off)
        width = max(min_width, int(lens.max()) if n else 0, 1)
        from sassy_ray.kernel import native as _native

        if n and len(data) and _native.available():
            # per-row memcpy in C: the index-vector scatter below moves ~24 B
            # of int64 index traffic per payload byte (measured dominant over
            # the scan kernel itself on big scorer batches)
            return _native.rows_from_offsets(
                np.ascontiguousarray(data), np.ascontiguousarray(off), width
            ), lens
        mat = np.zeros((n, width), dtype=np.uint8)
        if len(data):
            r = np.repeat(np.arange(n), lens)
            c = np.arange(len(data)) - np.repeat(off[:-1], lens)
            mat[r, c] = data
        return mat, lens
    lens = np.array([len(t) for t in rows], dtype=np.int64)
    width = max(min_width, int(lens.max()) if len(lens) else 0, 1)
    mat = np.zeros((len(rows), width), dtype=np.uint8)
    for i, t in enumerate(rows):
        if t:
            mat[i, : len(t)] = np.frombuffer(t, dtype=np.uint8)
    return mat, lens


def _max_len(rows) -> int:
    if isinstance(rows, TextRows):
        return int(rows.lens.max()) if len(rows.lens) else 0
    try:
        import pyarrow as pa

        if isinstance(rows, (pa.Array, pa.ChunkedArray)):
            import pyarrow.compute as pc

            if len(rows) == 0:
                return 0
            return int(pc.max(pc.binary_length(rows)).as_py() or 0)
    except ImportError:  # pragma: no cover
        pass
    return max((len(p) for p in rows), default=0)


def build_peq(
    patterns: list[bytes], profile: Profile, alphabet: np.ndarray | None = None
) -> tuple[np.ndarray, np.ndarray, int]:
    """PEQ tables for a batch: returns (peq, m_arr, L).

    ``peq``: (B, A, L) uint64 — bit j of limb l set iff pattern char
    ``64*l + j`` matches alphabet code a (A=256 when ``alphabet`` is None,
    else the distinct text bytes — texts rarely use more than a few dozen).
    Padding rows never match.
    """
    pat0, m_arr = _rows_matrix(patterns)
    m_max = max(1, int(m_arr.max()) if len(m_arr) else 1)
    L = -(-m_max // 64)
    m_pad = L * 64
    B = len(m_arr)
    if pat0.shape[1] < m_pad:
        pat = np.zeros((B, m_pad), dtype=np.uint8)
        pat[:, : pat0.shape[1]] = pat0
    else:
        pat = pat0[:, :m_pad]
    ab = _ALL_BYTES if alphabet is None else alphabet
    # bits[b, a, j] = match(pattern[b][j], alphabet byte a) — gathered
    # directly in (B, A, m_pad) layout so no transpose+copy is needed
    bits = profile.match_matrix[pat[:, None, :], ab[None, :, None]]  # (B, A, m_pad)
    mask = np.arange(m_pad) < m_arr[:, None]
    bits &= mask[:, None, :]
    return _pack_bits_u64(bits), m_arr, L


def _pad_texts(texts) -> tuple[np.ndarray, np.ndarray]:
    return _rows_matrix(texts)


def batch_end_costs(
    patterns: list[bytes],
    texts: list[bytes],
    profile: Profile,
    k: int,
    alpha: float | None = None,
    max_overhang: int | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """End costs for each pair: returns (costs, n_arr, max_pos).

    ``costs``: (B, W) int32 where W = max(n+O)+1; ``costs[b, pos]`` is the
    best alignment cost ending at text position ``pos`` (overhang positions
    include the floor(alpha*o) overshoot term); positions past ``max_pos[b]``
    are _BIG.
    """
    B = len(patterns)
    txt, n_arr = _pad_texts(texts)
    # remap text bytes to a dense code alphabet: texts use few distinct bytes,
    # which shrinks the PEQ build from 256-wide to A-wide
    present = np.zeros(256, dtype=bool)
    present[txt.reshape(-1)] = True
    alphabet = _ALL_BYTES[present]
    lut = np.zeros(256, dtype=np.intp)
    lut[alphabet] = np.arange(len(alphabet))
    txt = lut[txt]
    peq, m_arr, L = build_peq(patterns, profile, alphabet)
    O_arr = _overhang_steps_arr(m_arr, k, alpha, max_overhang)
    max_pos = n_arr + O_arr
    steps = int(max_pos.max()) if B else 0
    W = steps + 1

    # state
    deltas = _left_boundary_deltas(L * 64, alpha, max_overhang)  # (L*64,)
    pv0 = _pack_bits_u64(deltas.astype(bool)[None, :])[0]  # (L,)
    Pv = np.broadcast_to(pv0, (B, L)).copy()
    Mv = np.zeros((B, L), dtype=np.uint64)
    # initial score = C[m][0] = left boundary at row m (per pair)
    if alpha is None:
        score = m_arr.astype(np.int64).copy()
    else:
        mo = max_overhang if max_overhang is not None else int(m_arr.max())
        jm = np.minimum(m_arr, mo)
        score = np.floor(jm * alpha).astype(np.int64) + np.maximum(m_arr - mo, 0)

    # (W, B) layout: the per-step score write is contiguous (the (B, W)
    # column write strides W*4 bytes and thrashes cache at scan sizes)
    costsT = np.full((W, B), _BIG, dtype=np.int32)
    costsT[0] = score

    last_limb = np.maximum(m_arr - 1, 0) // 64  # (B,)
    score_shift = ((m_arr - 1) % 64).astype(np.uint64)
    bidx = np.arange(B)
    sel_per_limb = [(last_limb == l) for l in range(L)]
    sel_uniform = [bool(s.all()) for s in sel_per_limb]

    all_ones = np.uint64(0xFFFFFFFFFFFFFFFF)
    hin_pos = np.zeros(B, dtype=np.uint64)
    hin_neg = np.zeros(B, dtype=np.uint64)
    zero64 = np.int64(0)
    n_uniform = bool((n_arr == n_arr[0]).all()) if B else True

    if L == 1:
        _scan_l1(
            txt, n_arr, peq, score, score_shift, Pv, Mv, steps,
            costsT=costsT, alpha=alpha, all_ones=all_ones,
        )
        costs = np.ascontiguousarray(costsT.T)
        col = np.arange(W, dtype=np.int64)[None, :]
        if alpha is not None:
            o = col - n_arr[:, None]
            in_ext = o > 0
            over = np.floor(np.maximum(o, 0) * alpha).astype(np.int32)
            costs = np.where(in_ext, costs + over, costs)
        np.putmask(costs, col > max_pos[:, None], _BIG)
        return costs, n_arr, max_pos

    for t in range(steps):
        cbytes = txt[:, t] if t < txt.shape[1] else np.zeros(B, dtype=np.intp)
        if True:
            hin_pos.fill(0)
            hin_neg.fill(0)
            in_text = t < n_arr
            for l in range(L):
                Eq = peq[bidx, cbytes, l]
                if alpha is not None:
                    # wildcard step past text end: every pattern char matches
                    Eq = np.where(in_text, Eq, all_ones)
                Pvl = Pv[:, l]
                Mvl = Mv[:, l]
                Xv = Eq | Mvl
                Eqh = Eq | hin_neg
                Xh = (((Eqh & Pvl) + Pvl) ^ Pvl) | Eqh
                Ph = Mvl | ~(Xh | Pvl)
                Mh = Pvl & Xh
                # score update for pairs whose last limb is l (pre-shift bits)
                sel = sel_per_limb[l]
                upd = ((Ph >> score_shift) & _ONE).view(np.int64) - (
                    (Mh >> score_shift) & _ONE
                ).view(np.int64)
                if sel_uniform[l]:
                    score += upd
                else:
                    score += np.where(sel, upd, zero64)
                hout_pos = Ph >> _SIX3
                hout_neg = Mh >> _SIX3
                Ph = (Ph << _ONE) | hin_pos
                Mh = (Mh << _ONE) | hin_neg
                Pv[:, l] = Mh | ~(Xv | Ph)
                Mv[:, l] = Ph & Xv
                hin_pos = hout_pos
                hin_neg = hout_neg
        costsT[t + 1] = score  # unsafe downcast int64->int32 is fine (<2^30)

    costs = np.ascontiguousarray(costsT.T)
    col = np.arange(W, dtype=np.int64)[None, :]
    if alpha is not None:
        # add floor(alpha*o) overshoot for extension positions
        o = col - n_arr[:, None]
        in_ext = o > 0
        over = np.floor(np.maximum(o, 0) * alpha).astype(np.int32)
        costs = np.where(in_ext, costs + over, costs)
    # positions past each pair's max_pos are invalid
    np.putmask(costs, col > max_pos[:, None], _BIG)
    return costs, n_arr, max_pos


def _scan_l1(
    txt: np.ndarray,
    n_arr: np.ndarray,
    peq: np.ndarray,
    score: np.ndarray,
    score_shift: np.ndarray,
    Pv: np.ndarray,
    Mv: np.ndarray,
    steps: int,
    *,
    costsT: np.ndarray | None = None,
    best: np.ndarray | None = None,
    alpha: float | None = None,
    all_ones: np.uint64 = np.uint64(0xFFFFFFFFFFFFFFFF),
) -> None:
    """Single-limb hot loop, allocation-free: every step op writes into a
    preallocated buffer (``out=``), the PEQ gather is a flat ``take`` (no 3-D
    fancy index), and the text is read from a transposed contiguous layout.
    ~3x the throughput of the naive expression-per-line loop — this is the
    engine's stand-in for the reference's SIMD inner loop
    (/root/reference/src/bitpacking.rs)."""
    B = len(n_arr)
    if B == 0:
        return
    A = peq.shape[1]
    peq_flat = np.ascontiguousarray(peq[:, :, 0]).reshape(-1)
    base = np.arange(B, dtype=np.intp) * A
    txtT = np.ascontiguousarray(txt.T)  # (n_max, B): contiguous per-step read
    n_max = txtT.shape[0]
    Pv0 = Pv[:, 0].copy()
    Mv0 = Mv[:, 0].copy()
    Eq = np.empty(B, np.uint64)
    Xv = np.empty(B, np.uint64)
    Xh = np.empty(B, np.uint64)
    Ph = np.empty(B, np.uint64)
    Mh = np.empty(B, np.uint64)
    tA = np.empty(B, np.uint64)
    tb = np.empty(B, np.uint64)
    idx = np.empty(B, np.intp)
    bit = np.empty(B, np.uint64)
    bit64 = bit.view(np.int64)
    n_min = int(n_arr.min())
    for t in range(steps):
        if t < n_max:
            np.add(base, txtT[t], out=idx)
            np.take(peq_flat, idx, out=Eq)
            if alpha is not None and t >= n_min:
                # wildcard step past text end: every pattern char matches
                np.copyto(Eq, all_ones, where=t >= n_arr)
        else:
            Eq.fill(all_ones)  # only reachable under overhang extension
        np.bitwise_or(Eq, Mv0, out=Xv)
        np.bitwise_and(Eq, Pv0, out=tA)
        np.add(tA, Pv0, out=tA)
        np.bitwise_xor(tA, Pv0, out=tA)
        np.bitwise_or(tA, Eq, out=Xh)
        np.bitwise_or(Xh, Pv0, out=tb)
        np.invert(tb, out=tb)
        np.bitwise_or(Mv0, tb, out=Ph)
        np.bitwise_and(Pv0, Xh, out=Mh)
        np.right_shift(Ph, score_shift, out=bit)
        np.bitwise_and(bit, _ONE, out=bit)
        score += bit64
        np.right_shift(Mh, score_shift, out=bit)
        np.bitwise_and(bit, _ONE, out=bit)
        score -= bit64
        np.left_shift(Ph, _ONE, out=Ph)
        np.left_shift(Mh, _ONE, out=Mh)
        np.bitwise_or(Xv, Ph, out=tb)
        np.invert(tb, out=tb)
        np.bitwise_or(Mh, tb, out=Pv0)
        np.bitwise_and(Ph, Xv, out=Mv0)
        if costsT is not None:
            costsT[t + 1] = score
        elif best is not None:
            if t >= n_min:
                np.minimum(best, np.where(t < n_arr, score, best), out=best)
            else:
                np.minimum(best, score, out=best)
    Pv[:, 0] = Pv0
    Mv[:, 0] = Mv0


# engage text-lane packing (prefilter.packed_rows_scan) at or above this
# batch size — below it the extra per-step gather/walk ops outweigh the
# element-work saving.  Measured crossover ~1024 rows on BOTH the uniform
# 512-char chunk-row shape (ratio 0.82 @256 -> 1.00 @1024 -> 1.54 @4096)
# and a heterogeneous 250-650-char doc shape (0.79 @256 -> 1.23 @2048).
# Env-overridable so A/B benches can force either path across Ray workers
# (tools/tail_bench.py --grep --unpacked ships it via runtime_env).
PACKED_ROWS_MIN_B = int(os.environ.get("SASSY_PACKED_ROWS_MIN_B", "1024"))


def batch_scan_minima(
    patterns: list[bytes],
    texts: list[bytes],
    profile: Profile,
    k: int,
    all_minima: bool = False,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fused scan + minima walk for single-limb patterns, no overhang: the
    reference walk (search.rs:1284-1369) runs INSIDE the scan loop on (B,)
    state vectors, so the dense (B, W) end-cost matrix is never materialized
    (that matrix write + transpose + post-walk dominates the plain path at
    scan sizes).  Equivalent to batch_end_costs + batch_find_minima —
    pinned by the kernel fuzz suite.  Returns (pair_idx, end_pos, cost)."""
    B = len(patterns)
    if B == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z, np.zeros(0, dtype=np.int32)
    from sassy_ray.kernel import native

    if native.available():
        # compiled per-row scan (any limb count); same walk, same emissions
        return native.scan_pairs(patterns, texts, profile, k, all_minima)
    m_max = max(len(p) for p in patterns)
    assert m_max <= 64, "batch_scan_minima is L==1 only"
    raw, n_arr = _pad_texts(texts)
    # text-lane packing: patterns <= 31 chars use only half (or a quarter)
    # of the 64-bit row state, so pack 2 (4 at <= 15) batch rows per SWAR
    # word instead — the dual of the transposed multi-pattern scan (see
    # prefilter.packed_rows_scan).  Worth the extra per-step gather ops only
    # above a row-count threshold (measured).
    if B >= PACKED_ROWS_MIN_B and min(len(p) for p in patterns) >= 1:
        from sassy_ray.kernel.prefilter import (
            LANES2X31,
            LANES4X15,
            packed_rows_scan,
        )

        cfg = LANES4X15 if m_max <= 15 else (LANES2X31 if m_max <= 31 else None)
        if (
            cfg is not None
            and k + 1 < (1 << (cfg.lane_bits - 1))
            and k < cfg.empty_cost
        ):
            return packed_rows_scan(patterns, raw, n_arr, profile, k, all_minima, cfg)
    present = np.zeros(256, dtype=bool)
    present[raw.reshape(-1)] = True
    alphabet = _ALL_BYTES[present]
    lut = np.zeros(256, dtype=np.uint8)
    lut[alphabet] = np.arange(len(alphabet))
    A = len(alphabet)
    # text codes stay uint8 and transposed (contiguous per-step reads; the
    # intp layout would be 8x the memory traffic at scan sizes)
    txtT = lut[np.ascontiguousarray(raw.T)]

    # PEQ per UNIQUE pattern (a chunked scan has thousands of rows sharing
    # 1-2 patterns); rows gather via a per-row base offset
    uniq: dict[bytes, int] = {}
    pat_row = np.empty(B, dtype=np.intp)
    for i, p in enumerate(patterns):
        pat_row[i] = uniq.setdefault(p, len(uniq))
    upats = list(uniq)
    peq, um_arr, _L = build_peq(upats, profile, alphabet)
    m_arr = um_arr[pat_row]
    steps = int(n_arr.max())
    if len(upats) == 1:
        peq_flat = np.ascontiguousarray(peq[0, :, 0])
        base = None
    else:
        peq_flat = np.ascontiguousarray(peq[:, :, 0]).reshape(-1)
        base = pat_row * A

    Pv0 = np.full(B, np.uint64(0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
    Mv0 = np.zeros(B, dtype=np.uint64)
    score = m_arr.astype(np.int64).copy()
    score_shift = ((m_arr - 1) % 64).astype(np.uint64)

    # walk state
    prev = score.copy()
    dec = np.ones(B, dtype=bool)
    out_rows: list[np.ndarray] = []
    out_pos: list[np.ndarray] = []
    out_cost: list[np.ndarray] = []
    if all_minima:
        r0 = np.nonzero(prev <= k)[0]
        if len(r0):
            out_rows.append(r0)
            out_pos.append(np.zeros(len(r0), dtype=np.int64))
            out_cost.append(prev[r0].astype(np.int32))

    Eq = np.empty(B, np.uint64)
    Xv = np.empty(B, np.uint64)
    Xh = np.empty(B, np.uint64)
    Ph = np.empty(B, np.uint64)
    Mh = np.empty(B, np.uint64)
    tA = np.empty(B, np.uint64)
    tb = np.empty(B, np.uint64)
    idx = np.empty(B, np.intp)
    bit = np.empty(B, np.uint64)
    bit64 = bit.view(np.int64)
    emit = np.empty(B, dtype=bool)
    m1 = np.empty(B, dtype=bool)
    le = np.empty(B, dtype=bool)
    ceff = np.empty(B, dtype=np.int64)
    n_min = int(n_arr.min())
    BIG64 = np.int64(_BIG)

    for t in range(steps):
        if base is None:
            np.take(peq_flat, txtT[t], out=Eq)
        else:
            np.add(base, txtT[t], out=idx)
            np.take(peq_flat, idx, out=Eq)
        np.bitwise_or(Eq, Mv0, out=Xv)
        np.bitwise_and(Eq, Pv0, out=tA)
        np.add(tA, Pv0, out=tA)
        np.bitwise_xor(tA, Pv0, out=tA)
        np.bitwise_or(tA, Eq, out=Xh)
        np.bitwise_or(Xh, Pv0, out=tb)
        np.invert(tb, out=tb)
        np.bitwise_or(Mv0, tb, out=Ph)
        np.bitwise_and(Pv0, Xh, out=Mh)
        np.right_shift(Ph, score_shift, out=bit)
        np.bitwise_and(bit, _ONE, out=bit)
        score += bit64
        np.right_shift(Mh, score_shift, out=bit)
        np.bitwise_and(bit, _ONE, out=bit)
        score -= bit64
        np.left_shift(Ph, _ONE, out=Ph)
        np.left_shift(Mh, _ONE, out=Mh)
        np.bitwise_or(Xv, Ph, out=tb)
        np.invert(tb, out=tb)
        np.bitwise_or(Mh, tb, out=Pv0)
        np.bitwise_and(Ph, Xv, out=Mv0)
        # ---- fused reference walk at position p = t+1 ----
        if t < n_min:
            c = score
        else:
            np.copyto(ceff, score)
            np.copyto(ceff, BIG64, where=n_arr <= t)  # p > n_b: rising wall
            c = ceff
        if all_minima:
            np.less_equal(c, k, out=emit)
            rows = np.nonzero(emit)[0]
            if len(rows):
                out_rows.append(rows)
                out_pos.append(np.full(len(rows), t + 1, dtype=np.int64))
                out_cost.append(c[rows].astype(np.int32))
        else:
            # walk gate: emission and dec-evolution only matter while some
            # row's prev is <= k (re-entry from >k is always a strict
            # decrease, which re-derives dec=true) — skip the walk otherwise
            np.less_equal(prev, k, out=le)
            if not le.any():
                dec.fill(True)
                np.copyto(prev, c)
                continue
            np.greater(c, prev, out=m1)          # rising into p
            np.logical_and(m1, dec, out=emit)
            np.logical_and(emit, le, out=emit)
            if emit.any():
                rows = np.nonzero(emit)[0]
                out_rows.append(rows)
                out_pos.append(np.full(len(rows), t, dtype=np.int64))
                out_cost.append(prev[rows].astype(np.int32))
            # decreasing' = c < prev or (decreasing and c == prev)
            np.equal(c, prev, out=m1)
            np.logical_and(dec, m1, out=dec)
            np.less(c, prev, out=m1)
            np.logical_or(dec, m1, out=dec)
        np.copyto(prev, c)

    if not all_minima:
        # final-position rule for rows whose text ends at the global last step
        np.logical_and(dec, prev <= k, out=emit)
        np.logical_and(emit, n_arr == steps, out=emit)
        rows = np.nonzero(emit)[0]
        if len(rows):
            out_rows.append(rows)
            out_pos.append(np.full(len(rows), steps, dtype=np.int64))
            out_cost.append(prev[rows].astype(np.int32))

    if not out_rows:
        z = np.zeros(0, dtype=np.int64)
        return z, z, np.zeros(0, dtype=np.int32)
    return (
        np.concatenate(out_rows),
        np.concatenate(out_pos),
        np.concatenate(out_cost),
    )


def batch_find_minima(
    costs: np.ndarray, max_pos: np.ndarray, k: int, all_minima: bool
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized reference minima walk.  Returns (pair_idx, end_pos, cost).

    Equivalent to the sequential walk in search.rs:1284-1369: emit position p
    when costs were (weakly) decreasing into p and strictly increase after,
    plus the final-position rule — which the _BIG padding past max_pos turns
    into a regular increase transition.
    """
    B, W = costs.shape
    # sparse fast path: rows with no position <= k can't emit anything —
    # in search workloads that's most rows; restrict the dense walk to the
    # candidate rows only
    ok_any = (costs <= k).any(axis=1)
    if not ok_any.all():
        rows = np.nonzero(ok_any)[0]
        if len(rows) == 0:
            z = np.zeros(0, dtype=np.int64)
            return z, z, np.zeros(0, dtype=np.int32)
        pi, pp, pc_ = batch_find_minima(costs[rows], max_pos[rows], k, all_minima)
        return rows[pi], pp, pc_
    valid = np.arange(W)[None, :] <= max_pos[:, None]
    ok = costs <= k
    if all_minima:
        pi, pp = np.nonzero(ok & valid)
        return pi, pp, costs[pi, pp]
    # pad one artificial rising column so a decreasing run into max_pos emits
    cpad = np.concatenate([costs, np.full((B, 1), _BIG, dtype=np.int32)], axis=1)
    d = np.diff(cpad.astype(np.int64), axis=1)  # (B, W)
    sign = np.sign(d).astype(np.int8)
    colp1 = np.arange(1, W + 1)
    nz = np.where(sign != 0, colp1[None, :], 0)
    last_inc = np.maximum.accumulate(nz, axis=1)  # last nonzero delta idx (1-based), incl current
    last_excl = np.concatenate([np.zeros((B, 1), dtype=np.int64), last_inc[:, :-1]], axis=1)
    gather = np.take_along_axis(sign, np.maximum(last_excl - 1, 0), axis=1)
    prev_sign = np.where(last_excl > 0, gather, -1)
    decreasing_before = prev_sign < 0
    emit = (d > 0) & decreasing_before & ok & valid
    pi, pp = np.nonzero(emit)
    return pi, pp, costs[pi, pp]


def batch_best_costs(
    patterns: list[bytes],
    texts: list[bytes],
    profile: Profile,
    k: int,
    alpha: float | None = None,
    max_overhang: int | None = None,
) -> np.ndarray:
    """Min end cost per pair, clamped to k+1 ("no match <= k").

    The cheap scoring mode for ER candidate filtering (the reference's
    ``without_trace`` + best-match path, search.rs:447-451,1464-1475).
    Without overhang it tracks a running min instead of materializing the
    (B, W) cost matrix — less memory traffic, which is what bounds the
    many-process aggregate throughput.
    """
    if len(patterns) == 0:
        return np.zeros(0, dtype=np.int32)
    from sassy_ray.kernel import native

    if native.available():
        best = native.best_jobs(patterns, texts, profile, k, alpha, max_overhang)
        return np.minimum(best, k + 1).astype(np.int32)
    if alpha is None:
        m_max = _max_len(patterns)
        if m_max > 64:
            # banded (blocked-filter) path pays off when the ≤k band covers
            # only part of the limbs; otherwise the wavefront-skewed dense
            # scan has less per-step overhead.  (A banded+skewed hybrid —
            # the band fused into the limb-vectorized skewed loop — was
            # built and measured SLOWER both single-core and at 16-proc
            # aggregate: the (B, L) column slices it needs still fetch the
            # full cache line of every row, so the band saves no memory
            # traffic, while the banded loop's (L, B) rows are contiguous
            # and its 1D temporaries stay in L1.)
            if k + 64 < m_max:
                best = _batch_min_costs_banded(patterns, texts, profile, k)
            else:
                best = _batch_min_costs_skewed(patterns, texts, profile)
        else:
            best = _batch_min_costs(patterns, texts, profile)
    else:
        costs, _n, max_pos = batch_end_costs(patterns, texts, profile, k, alpha, max_overhang)
        best = costs.min(axis=1)
    return np.minimum(best, k + 1).astype(np.int32)


def _batch_min_costs_skewed(patterns: list[bytes], texts: list[bytes], profile: Profile) -> np.ndarray:
    """Wavefront-skewed multi-limb variant of ``_batch_min_costs``.

    The intra-step limb carry chain (hout of limb l feeds hin of limb l+1)
    is strictly sequential *within* a text position — but limb l can process
    position ``t`` while limb l+1 still processes ``t-1``.  Skewing time by
    the limb index turns the per-limb Python loop into one vectorized op
    over all active limbs per step: limb l at skewed step ``s`` handles text
    position ``s - l``, taking its horizontal input from limb l-1's output
    of step ``s-1`` (same text position).  ~L times fewer NumPy calls for
    L-limb patterns.
    """
    B = len(patterns)
    txt, n_arr = _pad_texts(texts)
    present = np.zeros(256, dtype=bool)
    present[txt.reshape(-1)] = True
    alphabet = _ALL_BYTES[present]
    lut = np.zeros(256, dtype=np.intp)
    lut[alphabet] = np.arange(len(alphabet))
    txt = lut[txt]
    peq, m_arr, L = build_peq(patterns, profile, alphabet)
    steps = int(n_arr.max()) if B else 0
    if steps == 0:
        return m_arr.astype(np.int64).copy()

    pv0 = _pack_bits_u64(np.ones(L * 64, dtype=bool)[None, :])[0]
    Pv = np.broadcast_to(pv0, (B, L)).copy()
    Mv = np.zeros((B, L), dtype=np.uint64)
    score = m_arr.astype(np.int64).copy()
    best = score.copy()

    last_limb = (np.maximum(m_arr - 1, 0) // 64).astype(np.int64)
    score_shift = ((m_arr - 1) % 64).astype(np.uint64)
    bidx = np.arange(B)
    hin_pos = np.zeros((B, L), dtype=np.uint64)
    hin_neg = np.zeros((B, L), dtype=np.uint64)
    limb_ids = np.arange(L)

    for s in range(steps + L - 1):
        lo = max(0, s - steps + 1)
        hi = min(L - 1, s)
        sl = slice(lo, hi + 1)
        lids = limb_ids[sl]
        t_of_l = s - lids  # (w,) text position per active limb
        codes = txt[:, t_of_l]  # (B, w)
        Eq = peq[bidx[:, None], codes, lids[None, :]]
        Pvl = Pv[:, sl]
        Mvl = Mv[:, sl]
        hn = hin_neg[:, sl]
        hp = hin_pos[:, sl]
        Xv = Eq | Mvl
        Eqh = Eq | hn
        Xh = (((Eqh & Pvl) + Pvl) ^ Pvl) | Eqh
        Ph = Mvl | ~(Xh | Pvl)
        Mh = Pvl & Xh
        # score update: pair b advances when its LAST limb processes a
        # valid position t = s - last_limb[b] in [0, n_b)
        col = last_limb - lo
        in_win = (last_limb >= lo) & (last_limb <= hi)
        t_b = s - last_limb
        valid = in_win & (t_b >= 0) & (t_b < n_arr)
        cc = np.clip(col, 0, hi - lo)
        ph_bit = ((Ph[bidx, cc] >> score_shift) & _ONE).view(np.int64)
        mh_bit = ((Mh[bidx, cc] >> score_shift) & _ONE).view(np.int64)
        score += np.where(valid, ph_bit - mh_bit, 0)
        np.minimum(best, np.where(valid, score, best), out=best)
        hout_pos = Ph >> _SIX3
        hout_neg = Mh >> _SIX3
        Ph = (Ph << _ONE) | hp
        Mh = (Mh << _ONE) | hn
        Pv[:, sl] = Mh | ~(Xv | Ph)
        Mv[:, sl] = Ph & Xv
        # propagate carries to the next limb for the next skewed step
        nhi = min(hi + 1, L - 1)
        if nhi >= lo + 1:
            hin_pos[:, lo + 1 : nhi + 1] = hout_pos[:, : nhi - lo]
            hin_neg[:, lo + 1 : nhi + 1] = hout_neg[:, : nhi - lo]
    return best


def _batch_min_costs_banded(
    patterns: list[bytes], texts: list[bytes], profile: Profile, k: int
) -> np.ndarray:
    """Band-narrowed multi-limb min-cost scan — Myers' blocked *filter*
    algorithm (the banded variant of the 1999 bit-parallel paper; also what
    the reference's check_lanes/prefix-min early-out achieves,
    /root/reference/src/search.rs:939-975,1131-1161) vectorized across the
    batch axis:

    * only limbs 0..cap are advanced, where ``cap`` is the deepest limb any
      pair's ≤k band currently reaches (cells with value > k can never
      produce a ≤k cell later — costs along DP paths are non-decreasing);
    * per-pair band bottoms move by the classic block rules: drop the last
      block when its last-row value >= k+64 (every row in it is then > k),
      extend one block when its last-row value <= k+64 (the next block may
      then hold ≤k cells);
    * a re-activated limb is re-initialized to all-(+1) verticals with
      last-row value bs[l-1]+64 — an upper bound that is EXACT whenever the
      true value is ≤ k (the blocked-filter invariant), which is all the
      clamped min-cost needs.

    Returns exact min end-cost for every pair whose min is ≤ k; any value
    > k may be overestimated (callers clamp to k+1).
    """
    B = len(patterns)
    txt, n_arr = _pad_texts(texts)
    present = np.zeros(256, dtype=bool)
    present[txt.reshape(-1)] = True
    alphabet = _ALL_BYTES[present]
    lut = np.zeros(256, dtype=np.intp)
    lut[alphabet] = np.arange(len(alphabet))
    txt = lut[txt]
    peq, m_arr, L = build_peq(patterns, profile, alphabet)
    steps = int(n_arr.max()) if B else 0
    score = m_arr.astype(np.int64).copy()
    best = score.copy()
    if steps == 0 or L == 1:
        return _batch_min_costs(patterns, texts, profile)

    all_ones = np.uint64(0xFFFFFFFFFFFFFFFF)
    # state is (L, B): the per-limb hot loop reads/writes contiguous rows
    Pv = np.full((L, B), all_ones, dtype=np.uint64)
    Mv = np.zeros((L, B), dtype=np.uint64)
    # bs[l, b]: DP value at the LAST row of limb l (row 64(l+1)-1, 0-based;
    # pattern padding rows never match, so they are ordinary DP rows)
    bs = np.broadcast_to((np.arange(L, dtype=np.int64) + 1)[:, None] * 64, (L, B)).copy()

    last_limb = (np.maximum(m_arr - 1, 0) // 64).astype(np.int64)
    score_shift = ((m_arr - 1) % 64).astype(np.uint64)
    bidx = np.arange(B)
    sel_per_limb = [(last_limb == l) for l in range(L)]
    sel_any = [bool(s.any()) for s in sel_per_limb]
    sel_uniform = [bool(s.all()) for s in sel_per_limb]
    zero64 = np.int64(0)

    kk = int(k)
    # Band updates run every U columns, not every column: the band bottom
    # moves at most one ROW per column, so checking with U columns of slack
    # in the extension threshold activates every block at or before the
    # column where it could first hold a ≤k cell (the invariant the
    # blocked-filter proof needs); the shrink threshold adds hysteresis so
    # the cap doesn't thrash.
    U = 16
    grow_thresh = np.int64(kk + 64 + U)
    shrink_thresh = np.int64(kk + 64 + U + 32)
    yb = np.full(B, min(L - 1, (kk + U) // 64), dtype=np.int64)  # per-pair band bottom
    cap = int(yb.max())

    n_min = int(n_arr.min())

    # allocation-free hot loop (the `_scan_l1` treatment): every step op
    # writes a preallocated buffer, the PEQ gather is ONE row-take per step
    # of all limbs for the step's chars — the (B, A, L) layout keeps a
    # pair's limbs on the same cache line, so this touches the same DRAM
    # lines as a single-limb gather (a per-limb transposed flat table was
    # tried and measured SLOWER at 32-proc aggregate: it splits each
    # pair's limbs across L distinct lines) — and the text reads from a
    # transposed contiguous layout.  The per-(column, limb) allocation
    # churn of the expression-per-line form was ~20% of the loop at the
    # production 600-2000-row call shapes.
    A = peq.shape[1]
    peq2 = peq.reshape(B * A, L)  # view: rows = (pair, char), cols = limbs
    base = np.arange(B, dtype=np.intp) * A
    txtT = np.ascontiguousarray(txt.T)  # (steps, B)
    idx = np.empty(B, np.intp)
    EqAll = np.empty((B, L), np.uint64)
    Xv = np.empty(B, np.uint64)
    Xh = np.empty(B, np.uint64)
    Ph = np.empty(B, np.uint64)
    Mh = np.empty(B, np.uint64)
    tA = np.empty(B, np.uint64)
    tb = np.empty(B, np.uint64)
    bit = np.empty(B, np.uint64)
    bit64 = bit.view(np.int64)
    upd = np.empty(B, np.int64)
    hin_pos = np.zeros(B, dtype=np.uint64)
    hin_neg = np.zeros(B, dtype=np.uint64)
    hout_pos = np.zeros(B, dtype=np.uint64)
    hout_neg = np.zeros(B, dtype=np.uint64)

    for t in range(steps):
        np.add(base, txtT[t], out=idx)
        np.take(peq2, idx, axis=0, out=EqAll)
        hin_pos.fill(0)
        hin_neg.fill(0)
        for l in range(cap + 1):
            Eq = EqAll[:, l]
            Pvl = Pv[l]
            Mvl = Mv[l]
            np.bitwise_or(Eq, Mvl, out=Xv)
            np.bitwise_or(Eq, hin_neg, out=tb)  # tb = Eqh
            np.bitwise_and(tb, Pvl, out=tA)
            np.add(tA, Pvl, out=tA)
            np.bitwise_xor(tA, Pvl, out=tA)
            np.bitwise_or(tA, tb, out=Xh)
            np.bitwise_or(Xh, Pvl, out=tb)
            np.invert(tb, out=tb)
            np.bitwise_or(Mvl, tb, out=Ph)
            np.bitwise_and(Pvl, Xh, out=Mh)
            if sel_any[l]:
                np.right_shift(Ph, score_shift, out=bit)
                np.bitwise_and(bit, _ONE, out=bit)
                np.copyto(upd, bit64)
                np.right_shift(Mh, score_shift, out=bit)
                np.bitwise_and(bit, _ONE, out=bit)
                np.subtract(upd, bit64, out=upd)
                if sel_uniform[l]:
                    score += upd
                else:
                    np.add(score, upd, out=score, where=sel_per_limb[l])
            np.right_shift(Ph, _SIX3, out=hout_pos)
            np.right_shift(Mh, _SIX3, out=hout_neg)
            np.subtract(hout_pos.view(np.int64), hout_neg.view(np.int64), out=upd)
            np.add(bs[l], upd, out=bs[l])
            np.left_shift(Ph, _ONE, out=Ph)
            np.bitwise_or(Ph, hin_pos, out=Ph)
            np.left_shift(Mh, _ONE, out=Mh)
            np.bitwise_or(Mh, hin_neg, out=Mh)
            np.bitwise_or(Xv, Ph, out=tb)
            np.invert(tb, out=tb)
            np.bitwise_or(Mh, tb, out=Pvl)
            np.bitwise_and(Ph, Xv, out=Mvl)
            hin_pos, hout_pos = hout_pos, hin_pos
            hin_neg, hout_neg = hout_neg, hin_neg
        # ---- best update: valid for pairs whose last limb is computed ----
        ok = last_limb <= cap
        if t >= n_min:
            ok = ok & (t < n_arr)
        if ok.all():
            np.minimum(best, score, out=best)
        else:
            np.minimum(best, np.where(ok, score, best), out=best)
        # ---- periodic band adjustment (post-column values) ----------------
        if (t & (U - 1)) != U - 1 and t != steps - 1:
            continue
        bs_y = bs[yb, bidx]
        grow = (bs_y <= grow_thresh) & (yb < L - 1)
        if grow.any():
            yb = yb + grow  # bottom moves ≤ U rows between checks → ≤ 1 block
        shrink = ~grow
        while True:
            cur = bs[yb, bidx]
            m1 = shrink & (cur >= shrink_thresh) & (yb > 0)
            if not m1.any():
                break
            yb = yb - m1
        new_cap = int(yb.max())
        if new_cap > cap:
            # re-activate limbs cap+1..new_cap: all-(+1) verticals upper bound
            for l in range(cap + 1, new_cap + 1):
                Pv[l] = all_ones
                Mv[l] = 0
                bs[l] = bs[l - 1] + 64
                if sel_any[l]:
                    # reseed the row-(m-1) score stream for pairs whose last
                    # limb just re-activated: value under +1 verticals
                    reseed = bs[l - 1] + (m_arr - 64 * l)
                    score = np.where(sel_per_limb[l], reseed, score)
        cap = new_cap
    return best


def _batch_min_costs(patterns: list[bytes], texts: list[bytes], profile: Profile) -> np.ndarray:
    """min over end positions of the semi-global cost, no matrix."""
    B = len(patterns)
    txt, n_arr = _pad_texts(texts)
    present = np.zeros(256, dtype=bool)
    present[txt.reshape(-1)] = True
    alphabet = _ALL_BYTES[present]
    lut = np.zeros(256, dtype=np.intp)
    lut[alphabet] = np.arange(len(alphabet))
    txt = lut[txt]
    peq, m_arr, L = build_peq(patterns, profile, alphabet)
    steps = int(n_arr.max()) if B else 0

    pv0 = _pack_bits_u64(np.ones(L * 64, dtype=bool)[None, :])[0]
    Pv = np.broadcast_to(pv0, (B, L)).copy()
    Mv = np.zeros((B, L), dtype=np.uint64)
    score = m_arr.astype(np.int64).copy()
    best = score.copy()

    last_limb = np.maximum(m_arr - 1, 0) // 64
    score_shift = ((m_arr - 1) % 64).astype(np.uint64)
    bidx = np.arange(B)
    sel_per_limb = [(last_limb == l) for l in range(L)]
    sel_uniform = [bool(s.all()) for s in sel_per_limb]
    zero64 = np.int64(0)
    hin_pos = np.zeros(B, dtype=np.uint64)
    hin_neg = np.zeros(B, dtype=np.uint64)
    in_range = None

    if L == 1:
        _scan_l1(txt, n_arr, peq, score, score_shift, Pv, Mv, steps, best=best)
        return best

    for t in range(steps):
        cbytes = txt[:, t]
        if True:
            hin_pos.fill(0)
            hin_neg.fill(0)
            for l in range(L):
                Eq = peq[bidx, cbytes, l]
                Pvl = Pv[:, l]
                Mvl = Mv[:, l]
                Xv = Eq | Mvl
                Eqh = Eq | hin_neg
                Xh = (((Eqh & Pvl) + Pvl) ^ Pvl) | Eqh
                Ph = Mvl | ~(Xh | Pvl)
                Mh = Pvl & Xh
                upd = ((Ph >> score_shift) & _ONE).view(np.int64) - (
                    (Mh >> score_shift) & _ONE
                ).view(np.int64)
                if sel_uniform[l]:
                    score += upd
                else:
                    score += np.where(sel_per_limb[l], upd, zero64)
                hout_pos = Ph >> _SIX3
                hout_neg = Mh >> _SIX3
                Ph = (Ph << _ONE) | hin_pos
                Mh = (Mh << _ONE) | hin_neg
                Pv[:, l] = Mh | ~(Xv | Ph)
                Mv[:, l] = Ph & Xv
                hin_pos = hout_pos
                hin_neg = hout_neg
        # only positions within each pair's own text are valid
        if t >= int(n_arr.min()):
            in_range = t < n_arr
            np.minimum(best, np.where(in_range, score, best), out=best)
        else:
            np.minimum(best, score, out=best)
    return best


class BatchKernel:
    """Reusable batch scorer: caches nothing across calls yet, but groups
    pairs by limb count so mixed-length batches stay dense."""

    def __init__(self, profile: Profile, k: int, alpha: float | None = None, max_overhang: int | None = None):
        self.profile = profile
        self.k = k
        self.alpha = alpha
        self.max_overhang = max_overhang

    def end_costs(self, patterns: list[bytes], texts: list[bytes]):
        return batch_end_costs(patterns, texts, self.profile, self.k, self.alpha, self.max_overhang)

    def minima(
        self, patterns: list[bytes], texts: list[bytes], all_minima: bool = False
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        costs, _n, max_pos = self.end_costs(patterns, texts)
        return batch_find_minima(costs, max_pos, self.k, all_minima)

    def best_costs(self, patterns: list[bytes], texts: list[bytes]) -> np.ndarray:
        return batch_best_costs(patterns, texts, self.profile, self.k, self.alpha, self.max_overhang)
