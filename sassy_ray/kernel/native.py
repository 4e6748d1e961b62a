"""Compile-on-demand loader + wrappers for the C hot loops (_native.c).

The engine's kernels have two interchangeable implementations with pinned
identical semantics: the NumPy batch kernels (myers.py — always available,
the fuzz/oracle twin) and the scalar-C loops in _native.c, compiled here on
first use with the node's system compiler and loaded via ctypes.  The C path
is the production default; ``SASSY_NATIVE=0`` (or a missing/failed compiler)
falls back to NumPy everywhere with no semantic change (equivalence is
enforced by tests/test_native.py plus the whole oracle-pinned suite).

Cluster story: the shared object is cached under ``$SASSY_NATIVE_DIR`` (or
/tmp) keyed by the source hash + compiler version, guarded by an flock — on
a multi-node cluster every node compiles once on its first task and every
later worker process on that node just dlopens the cached .so.  No wheels,
no network, no install step.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

__all__ = [
    "available",
    "scan_pairs",
    "scan_jobs",
    "best_jobs",
    "NativeBatch",
    "chunk_rows_coded",
]

_ALL_BYTES = np.arange(256, dtype=np.uint8)

_lib = None
_tried = False


def _c_source_path() -> str:
    return os.path.join(os.path.dirname(__file__), "_native.c")


def _build() -> ctypes.CDLL | None:
    src_path = _c_source_path()
    with open(src_path, "rb") as f:
        src = f.read()
    cc = os.environ.get("CC", "cc")
    try:
        ver = subprocess.run(
            [cc, "-dumpversion"], capture_output=True, timeout=30
        ).stdout
    except Exception:
        return None
    flags = ["-O3", "-march=native", "-funroll-loops", "-fPIC", "-shared"]
    key = hashlib.sha256(src + ver + " ".join(flags).encode()).hexdigest()[:20]
    cache_dir = os.environ.get("SASSY_NATIVE_DIR") or os.path.join(
        tempfile.gettempdir(), "sassy_native"
    )
    so_path = os.path.join(cache_dir, f"sassy_{key}.so")
    if not os.path.exists(so_path):
        os.makedirs(cache_dir, exist_ok=True)
        lock_path = so_path + ".lock"
        import fcntl

        with open(lock_path, "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            try:
                if not os.path.exists(so_path):  # re-check under the lock
                    tmp = so_path + f".tmp{os.getpid()}"
                    r = subprocess.run(
                        [cc, *flags, "-o", tmp, src_path],
                        capture_output=True,
                        timeout=120,
                    )
                    if r.returncode != 0 or not os.path.exists(tmp):
                        return None
                    os.replace(tmp, so_path)  # atomic publish
            finally:
                fcntl.flock(lock, fcntl.LOCK_UN)
    try:
        lib = ctypes.CDLL(so_path)
    except OSError:
        return None
    try:
        # glibc: keep multi-MB scratch blocks in the heap instead of
        # mmap/munmap per allocation — every NativeBatch allocates fresh
        # rows/PEQ matrices (1-5 MB each) per length-chunk, and the default
        # thresholds make each one a fresh mmap + page-fault sweep
        # (measured: scorer-chunk NativeBatch setup 10 -> 7 ms/batch).
        # M_MMAP_THRESHOLD = -3, M_TRIM_THRESHOLD = -1.
        _libc = ctypes.CDLL("libc.so.6")
        _libc.mallopt(-3, 256 * 1024 * 1024)
        _libc.mallopt(-1, 256 * 1024 * 1024)
    except Exception:
        pass
    P = ctypes.c_void_p
    I = ctypes.c_int64
    lib.sassy_build_peq.argtypes = [P, I, I, P, P, P, I, P, I, P]
    lib.sassy_build_peq.restype = None
    lib.sassy_byte_hist.argtypes = [P, I, P]
    lib.sassy_byte_hist.restype = None
    lib.sassy_remap_u8.argtypes = [P, I, P, I, P, P]
    lib.sassy_remap_u8.restype = None
    lib.sassy_rows_from_offsets.argtypes = [P, P, I, I, P]
    lib.sassy_rows_from_offsets.restype = None
    lib.sassy_gather_str.argtypes = [P, P, P, P, P, I, P, P]
    lib.sassy_gather_str.restype = None
    lib.sassy_rows_sel2.argtypes = [
        P, P, ctypes.c_int32, P, P, ctypes.c_int32, P, P, I, I, P,
    ]
    lib.sassy_rows_sel2.restype = None
    lib.sassy_byte_hist_ptrs.argtypes = [P, P, I, P]
    lib.sassy_byte_hist_ptrs.restype = None
    lib.sassy_reverse_rows.argtypes = [P, P, I, I, P]
    lib.sassy_reverse_rows.restype = None
    lib.sassy_traceback.argtypes = [P, P, P, P, I, P, P, P, P, P, P]
    lib.sassy_traceback.restype = I
    lib.sassy_chunk_remap.argtypes = [
        P, P, I,          # texts (ptr array), tlens, n_texts
        I, I,             # chunk_len, overlap
        P, I, P,          # ab, A, lut (NULL = identity copy)
        ctypes.c_int, I,  # emit_rc, R (rows per strand)
        P, P, P, P,       # mat, lens, owner_ti, owner_start
    ]
    lib.sassy_chunk_remap.restype = ctypes.c_int64
    lib.sassy_minhash_rows.argtypes = [P, P, I, I, I, ctypes.c_int, P, P]
    lib.sassy_minhash_rows.restype = None
    lib.sassy_scan.argtypes = [
        P, I, P,          # txt, Wt, n_arr
        P, I, I,          # peq, A, L
        P, P, P, P,       # m_arr, pv0, score0, o_arr
        P, I,             # ov_add, ov_max
        P, P, I,          # job_p, job_t, J
        I, P, ctypes.c_int32,  # k, k_arr, mode
        P, P, P, I,       # out_job, out_pos, out_cost, out_cap
        P,                # out_best
        P, P, P,          # Pv, Mv, bs scratch
    ]
    lib.sassy_scan.restype = ctypes.c_int64
    return lib


def available() -> bool:
    global _lib, _tried
    if not _tried:
        _tried = True
        if os.environ.get("SASSY_NATIVE", "1") not in ("0", "false", "no"):
            try:
                _lib = _build()
            except Exception:
                _lib = None
    return _lib is not None


def _ptr(a: np.ndarray | None):
    return None if a is None else ctypes.c_void_p(a.ctypes.data)


def gather_str(
    datas: np.ndarray,
    offs: np.ndarray,
    is64: np.ndarray,
    ci: np.ndarray,
    li: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """Two-phase chunked-string gather (see C twin): returns (out_off int64
    of len n+1, out_data uint8).  ``datas``/``offs`` are uint64 pointer
    arrays to each chunk's data/offsets buffers; the caller keeps the
    owning Arrow buffers alive and pre-adjusts ``li`` for chunk slice
    offsets.  All inputs must be contiguous."""
    n = len(ci)
    out_off = np.empty(n + 1, dtype=np.int64)
    _lib.sassy_gather_str(
        _ptr(datas), _ptr(offs), _ptr(is64), _ptr(ci), _ptr(li), n, _ptr(out_off), None
    )
    out_data = np.empty(max(1, int(out_off[-1])), dtype=np.uint8)
    _lib.sassy_gather_str(
        _ptr(datas), _ptr(offs), _ptr(is64), _ptr(ci), _ptr(li), n, _ptr(out_off),
        _ptr(out_data),
    )
    return out_off, out_data


def str_buf_meta(arr):
    """(data_addr, off_addr, is64, keepalive) of a plain Arrow string/binary
    Array for :func:`rows_sel2`; None when the array is unusable (nulls,
    nonzero slice offset, wrong type)."""
    import pyarrow as pa

    if not isinstance(arr, pa.Array) or arr.null_count or arr.offset != 0:
        return None
    t = arr.type
    big = pa.types.is_large_string(t) or pa.types.is_large_binary(t)
    if not (big or pa.types.is_string(t) or pa.types.is_binary(t)):
        return None
    bufs = arr.buffers()
    if len(bufs) < 3 or bufs[1] is None:
        return None
    data_addr = bufs[2].address if bufs[2] is not None else bufs[1].address
    return (data_addr, bufs[1].address, 1 if big else 0, bufs)


def rows_sel2(meta_a, meta_b, pick_b: np.ndarray, idx: np.ndarray, width: int) -> np.ndarray:
    """Padded (len(idx), width) uint8 rows matrix taking row idx[i] from
    column B when pick_b[idx[i]] else column A — one C pass, no Arrow calls.
    ``pick_b`` is uint8 over the FULL batch; ``idx`` int64 contiguous."""
    n = len(idx)
    out = np.empty((n, max(1, int(width))), dtype=np.uint8)
    _lib.sassy_rows_sel2(
        ctypes.c_void_p(meta_a[0]), ctypes.c_void_p(meta_a[1]), meta_a[2],
        ctypes.c_void_p(meta_b[0]), ctypes.c_void_p(meta_b[1]), meta_b[2],
        _ptr(pick_b), _ptr(idx), n, int(out.shape[1]), _ptr(out),
    )
    return out


def minhash_rows(
    buf: np.ndarray,
    starts: np.ndarray,
    q: int,
    num_perm: int,
    rc_canonical: bool,
    comp_lut: np.ndarray,
    sig: np.ndarray,
) -> None:
    """Fill ``sig`` (n_docs x num_perm uint64, pre-filled with 2^64-1) with
    per-(row, bucket) minima of the splitmix-finalized rolling q-gram
    hashes — the OPH blocking stage's hot loop, bit-identical to
    ``blocking._shingle_hashes`` + ``np.minimum.at``.  Rows shorter than q
    are left untouched (the wrapper's single-shingle rule handles them).
    Caller guarantees contiguity and native availability."""
    n_docs = len(starts) - 1
    _lib.sassy_minhash_rows(
        _ptr(buf), _ptr(starts), n_docs, int(q), int(num_perm),
        ctypes.c_int(1 if rc_canonical else 0), _ptr(comp_lut), _ptr(sig),
    )


def traceback_batch(patterns, windows, mm: np.ndarray):
    """C twin of trace.batch_traceback's fill+walk+RLE (exact =X>D>I walk
    order, identical cigar strings): per candidate, returns
    (start_in_window int64, cost int32, cigar str).  ``patterns``/
    ``windows`` are lists of bytes; ``mm`` the 256x256 uint8 match matrix.
    Caller guarantees native availability."""
    import ctypes

    C = len(patterns)
    m_arr = np.fromiter((len(p) for p in patterns), np.int64, C)
    w_arr = np.fromiter((len(w) for w in windows), np.int64, C)
    pptr = (ctypes.c_char_p * max(1, C))(*patterns)
    wptr = (ctypes.c_char_p * max(1, C))(*windows)
    # slot bound: every RLE run is >= 1 op and emits <= digits+1 <= 21
    # bytes, runs <= ops <= m+w; 4*(m+w)+16 dominates both shapes
    slots = 4 * (m_arr + w_arr) + 16
    off = np.zeros(C, dtype=np.int64)
    if C > 1:
        np.cumsum(slots[:-1], out=off[1:])
    buf = np.empty(int(slots.sum()) if C else 1, np.uint8)
    out_start = np.empty(C, np.int64)
    out_cost = np.empty(C, np.int32)
    clen = np.empty(C, np.int64)
    mm = np.ascontiguousarray(mm, dtype=np.uint8)
    rc = _lib.sassy_traceback(
        pptr, _ptr(m_arr), wptr, _ptr(w_arr), C, _ptr(mm), _ptr(out_start),
        _ptr(out_cost), _ptr(buf), _ptr(off), _ptr(clen),
    )
    if rc != 0:
        raise AssertionError(f"trace failed at candidate {-int(rc) - 1}")
    bb = buf.tobytes()
    cigars = [
        bb[o : o + l].decode() for o, l in zip(off.tolist(), clen.tolist())
    ]
    return out_start, out_cost, cigars


def reverse_rows(mat: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Per-row byte reversal of a padded (n, w) uint8 rows matrix (zero-pad
    tails preserved) — the rc-strand twin of ``TextRows.reversed``'s NumPy
    take_along_axis, at memory speed.  Caller guarantees native
    availability."""
    mat = np.ascontiguousarray(mat)
    lens = np.ascontiguousarray(lens, dtype=np.int64)
    out = np.empty_like(mat)
    n, w = mat.shape if mat.ndim == 2 else (0, 1)
    _lib.sassy_reverse_rows(_ptr(mat), _ptr(lens), n, w, _ptr(out))
    return out


def rows_from_offsets(data: np.ndarray, off: np.ndarray, width: int) -> np.ndarray:
    """(n, width) zero-padded uint8 matrix from variable-length rows laid out
    as Arrow offsets+data — per-row memcpy in C (the NumPy index-vector
    scatter moved ~24 B of int64 index traffic per payload byte and was the
    dominant cost of big scorer batches).  Caller guarantees native
    availability, contiguous int64 ``off`` (n+1 entries) and uint8 ``data``."""
    n = len(off) - 1
    out = np.empty((n, width), dtype=np.uint8)
    _lib.sassy_rows_from_offsets(_ptr(data), _ptr(off), n, int(width), _ptr(out))
    return out


def _identity_wins(padded_bytes: int, n_upats: int, L: int, n_distinct: int) -> bool:
    """Shared identity-vs-dense-remap decision (NativeBatch.__init__ and the
    fused chunk builder must agree so prep work is never redone): identity
    skips the remap passes when its 256-wide PEQ is cheaper, EXCEPT for
    DNA-like inputs (<= 8 distinct bytes, single limb) where the dense code
    alphabet unlocks the AVX2 cmpeq-select scan path."""
    if 2 * padded_bytes <= n_upats * 256 * L * 8:
        return False
    return not (L == 1 and n_distinct <= 8)


def _arrow_binary(arr):
    """Normalize an Arrow string/binary (Chunked)Array to a zero-offset
    binary array with nulls filled — the shared precondition for reading
    its offsets/data buffers directly."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_string(arr.type):
        arr = arr.cast(pa.binary())
    elif pa.types.is_large_string(arr.type):
        arr = arr.cast(pa.large_binary())
    if arr.null_count:
        arr = arr.fill_null(b"")
    if arr.offset != 0:
        arr = pa.concat_arrays([arr])
    return arr


def _text_ptrs(texts):
    """(ptr_array, tlens, keepalive) for the pointer-array C entry points.

    list[bytes] -> c_char_p array over the bytes' own buffers; Arrow
    string/binary arrays -> data-buffer base + offsets (ZERO copy, no
    to_pylist); TextRows -> row addresses into the padded matrix."""
    import pyarrow as pa

    if isinstance(texts, (pa.Array, pa.ChunkedArray)):
        arr = _arrow_binary(texts)
        n = len(arr)
        off_dt = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
        bufs = arr.buffers()
        off = np.frombuffer(bufs[1], off_dt, n + 1).astype(np.int64) if n else np.zeros(1, np.int64)
        tlens = np.diff(off)
        base = bufs[2].address if bufs[2] is not None else _ptr(np.zeros(1, np.uint8)).value
        ptrs = (ctypes.c_void_p * max(1, n))(*(int(base) + off[:-1]).tolist())
        return ptrs, tlens, arr
    mat = getattr(texts, "mat", None)
    if mat is not None:  # TextRows (raw bytes only — coded rows would re-remap)
        assert getattr(texts, "codes_ab", None) is None, "coded TextRows into _text_ptrs"
        n = len(texts)
        base = mat.ctypes.data
        w = mat.shape[1]
        ptrs = (ctypes.c_void_p * max(1, n))(*[base + i * w for i in range(n)])
        return ptrs, np.ascontiguousarray(texts.lens, np.int64), mat
    n = len(texts)
    tlens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=n)
    return (ctypes.c_char_p * max(1, n))(*texts), tlens, texts


def chunk_rows_coded(
    texts,
    chunk_len: int,
    overlap: int,
    emit_rc: bool,
    n_upats: int,
    m_max: int,
    remap: str = "auto",
):
    """Fused chunk-row builder for the long-text scan paths: ONE C pass
    builds the overlapping chunk-row matrix (and, with ``emit_rc``, the
    reversed-text rows in the same matrix at row offset R) with the dense
    alphabet remap applied during the copy.  Returns ``(TextRows, owner)``
    where ``owner`` is the fwd half's ``(text_idx, chunk_start, is_first)``
    list (the rc half mirrors it).  Same starts/lengths/ownership as
    ``search._fill_chunk_rows``.

    ``remap='auto'`` replicates NativeBatch's identity-vs-dense decision and
    marks the rows with ``codes_ab`` so NativeBatch skips its histogram +
    remap passes; ``remap='never'`` copies verbatim and leaves ``codes_ab``
    unset (for consumers that read raw bytes, e.g. the SWAR prefilters).
    ``texts`` may be a list[bytes], an Arrow string/binary array (read
    zero-copy off its offsets/data buffers — no to_pylist) or a raw-byte
    TextRows.  Caller guarantees native availability."""
    from sassy_ray.kernel.myers import TextRows

    ptrs, tlens, _keep = _text_ptrs(texts)
    n = len(tlens)
    step = chunk_len - overlap
    assert step > 0, "chunk_len must exceed overlap"
    if n:
        extra = np.maximum(tlens - chunk_len, 0)
        # ceil-div of 0 is 0, so short texts contribute exactly 1 row
        R = int(n + (-(-extra // step)).sum())
    else:
        R = 0
    strands = 2 if emit_rc else 1
    if R == 0:
        rows = TextRows(np.zeros((0, max(1, chunk_len)), np.uint8), np.zeros(0, np.int64))
        return rows, []

    ab = None
    lut = None
    codes_ab = None
    if remap == "auto":
        hist = np.zeros(256, dtype=np.int64)
        _lib.sassy_byte_hist_ptrs(ptrs, _ptr(tlens), n, _ptr(hist))
        present = _ALL_BYTES[hist > 0]
        L = max(1, -(-int(m_max) // 64))
        if _identity_wins(strands * R * chunk_len, n_upats, L, len(present)):
            codes_ab = _ALL_BYTES
        else:
            ab = present if len(present) else _ALL_BYTES[:1]
            lut = np.zeros(256, dtype=np.uint8)
            lut[ab] = np.arange(len(ab), dtype=np.uint8)
            codes_ab = ab
    mat = np.empty((strands * R, chunk_len), dtype=np.uint8)
    lens = np.empty(strands * R, dtype=np.int64)
    owner_ti = np.empty(R, dtype=np.int64)
    owner_start = np.empty(R, dtype=np.int64)
    got = _lib.sassy_chunk_remap(
        ptrs, _ptr(tlens), n, int(chunk_len), int(overlap),
        _ptr(ab), 0 if ab is None else len(ab), _ptr(lut),
        ctypes.c_int(1 if emit_rc else 0), R,
        _ptr(mat), _ptr(lens), _ptr(owner_ti), _ptr(owner_start),
    )
    assert got == R, f"chunk row count mismatch: C wrote {got}, planned {R}"
    owner = list(zip(owner_ti.tolist(), owner_start.tolist(), (owner_start == 0).tolist()))
    return TextRows(mat, lens, codes_ab), owner


class NativeBatch:
    """One prepared (patterns x texts) native call context.

    Builds the dense text-code matrix, the per-unique-pattern PEQ tables and
    (with overhang) the boundary state once; ``run`` then executes any job
    list against it.  Prep mirrors the NumPy kernels exactly (same dense
    alphabet remap, same boundary formulas from myers.py) so the two paths
    are bit-identical.
    """

    def __init__(
        self,
        patterns,
        texts,
        profile,
        k: int,
        alpha: float | None = None,
        max_overhang: int | None = None,
    ) -> None:
        if not available():
            raise RuntimeError("native kernel unavailable (SASSY_NATIVE=0 or no compiler)")
        from sassy_ray.kernel.myers import (
            _left_boundary_deltas,
            _overhang_steps_arr,
            _pack_bits_u64,
            _pad_texts,
            _rows_matrix,
        )

        self.k = int(k)
        cab = getattr(texts, "codes_ab", None)
        if cab is not None:
            # pre-remapped rows from the fused chunk builder: the matrix
            # already holds dense codes, so the histogram/remap passes below
            # are skipped entirely
            raw, n_arr = texts.mat, texts.lens
        else:
            raw, n_arr = _pad_texts(texts)
        self.n_arr = np.ascontiguousarray(n_arr, dtype=np.int64)
        self.T = len(self.n_arr)

        # unique patterns (a chunked scan has thousands of rows sharing 1-2
        # patterns); Arrow/TextRows inputs are used as-is (ER pairs are
        # mostly distinct patterns — unique-ing would cost more than it saves)
        if isinstance(patterns, list):
            uniq: dict[bytes, int] = {}
            self.pat_row = np.fromiter(
                (uniq.setdefault(p, len(uniq)) for p in patterns),
                dtype=np.int64,
                count=len(patterns),
            )
            upats = list(uniq)
            if len(upats) == len(patterns):
                self.pat_row = None  # identity: skip the indirection
            pmat, m_arr = _rows_matrix(upats)
        else:
            self.pat_row = None
            pmat, m_arr = _rows_matrix(patterns)
        pmat = np.ascontiguousarray(pmat)
        self.m_arr = np.ascontiguousarray(m_arr, dtype=np.int64)
        self.P = len(self.m_arr)
        m_max = int(self.m_arr.max()) if self.P else 1
        self.L = max(1, -(-m_max // 64))

        # alphabet: the dense remap (only the batch's distinct text bytes)
        # shrinks the PEQ tables but costs two passes over the text matrix;
        # when the identity-alphabet PEQ is smaller than that (few patterns,
        # big texts — the grep/demux shapes) skip the remap entirely.
        # EXCEPTION: DNA-like batches (<= 8 distinct bytes in a sample)
        # always remap — a dense code alphabet unlocks the AVX2
        # cmpeq-select scan path in the C engine (measured ~2-3x over the
        # scalar interleave on the 1x23bp scan shape)
        if cab is not None:
            # pre-coded input: the fused builder already made (and applied)
            # the identity-vs-dense decision via the same _identity_wins
            ab = cab
            self.txt = np.ascontiguousarray(raw)
        elif _identity_wins(
            raw.size,
            self.P,
            self.L,
            len(np.unique(raw.reshape(-1)[:65536])) if self.L == 1 and raw.size else 256,
        ):
            ab = _ALL_BYTES
            self.txt = np.ascontiguousarray(raw)
        else:
            raw = np.ascontiguousarray(raw)
            hist = np.zeros(256, dtype=np.int64)
            if raw.size:
                _lib.sassy_byte_hist(_ptr(raw), raw.size, _ptr(hist))
            ab = _ALL_BYTES[hist > 0]
            lut = np.zeros(256, dtype=np.uint8)
            lut[ab] = np.arange(len(ab), dtype=np.uint8)
            self.txt = np.empty_like(raw)
            if raw.size:
                _lib.sassy_remap_u8(
                    _ptr(raw), raw.size, _ptr(np.ascontiguousarray(ab)), len(ab),
                    _ptr(lut), _ptr(self.txt),
                )
        self.Wt = self.txt.shape[1] if self.txt.ndim == 2 else 0
        self.A = max(1, len(ab))

        self.peq = np.empty((max(1, self.P), self.A, self.L), dtype=np.uint64)
        prof_mm = np.ascontiguousarray(profile.match_matrix.view(np.uint8))
        canon = profile.canon_lut
        canon = None if canon is None else np.ascontiguousarray(canon, dtype=np.uint8)
        ab_c = np.ascontiguousarray(ab)
        _lib.sassy_build_peq(
            _ptr(pmat),
            self.P,
            pmat.shape[1] if pmat.ndim == 2 else 0,
            _ptr(self.m_arr),
            _ptr(prof_mm),
            _ptr(ab_c),
            self.A,
            _ptr(canon),
            self.L,
            _ptr(self.peq),
        )
        self._keep = (pmat, prof_mm, canon, ab_c)  # buffers alive for C

        # overhang state (myers.batch_end_costs boundary semantics)
        if alpha is not None:
            m_pad = self.L * 64
            deltas = _left_boundary_deltas(m_pad, alpha, max_overhang)
            self.pv0 = np.ascontiguousarray(
                _pack_bits_u64(deltas.astype(bool)[None, :])[0]
            )
            mo = max_overhang if max_overhang is not None else m_max
            jm = np.minimum(self.m_arr, mo)
            self.score0 = np.ascontiguousarray(
                np.floor(jm * alpha).astype(np.int64)
                + np.maximum(self.m_arr - mo, 0)
            )
            self.o_arr = np.ascontiguousarray(
                _overhang_steps_arr(self.m_arr, k, alpha, max_overhang),
                dtype=np.int64,
            )
            ov_max = int(self.o_arr.max()) if self.P else 0
            self.ov_add = np.ascontiguousarray(
                np.floor(alpha * np.arange(1, ov_max + 1)).astype(np.int32)
            )
        else:
            self.pv0 = None
            self.score0 = None
            self.o_arr = None
            self.ov_add = None

        self._scr_pv = np.empty(self.L, dtype=np.uint64)
        self._scr_mv = np.empty(self.L, dtype=np.uint64)
        self._scr_bs = np.empty(self.L, dtype=np.int64)

    def _default_jobs(self):
        # identity pairing: job j = (pattern row j, text j)
        return self.pat_row, None, self.T

    def _length_order(self, job_p, job_t, J, k_arr):
        """Reorder jobs by descending text length (stable) so the 4-job /
        16-job interleaved groups hold near-equal lengths: a short row in a
        group otherwise leaves the long rows to finish on the 1-way scalar
        tail (measured 98 -> 42 MB/s on the chunked-scan shape, whose last
        chunk per text is short).  Returns (job_p, job_t, k_arr, order);
        ``order`` is None when the input is already non-increasing."""
        n_of = self.n_arr[job_t] if job_t is not None else self.n_arr[:J]
        if J < 32 or bool((np.diff(n_of) <= 0).all()):
            return job_p, job_t, k_arr, None
        order = np.argsort(-n_of, kind="stable")
        jp = np.ascontiguousarray(job_p[order]) if job_p is not None else order
        jt = np.ascontiguousarray(job_t[order]) if job_t is not None else order
        ka = np.ascontiguousarray(k_arr[order]) if k_arr is not None else None
        return jp, np.ascontiguousarray(jt), ka, order

    def run_minima(self, all_minima: bool, job_p=None, job_t=None, J=None, k_arr=None):
        """Modes 0/1: returns (job_idx, end_pos, cost) arrays."""
        if J is None:
            job_p, job_t, J = self._default_jobs()
        if k_arr is not None:
            k_arr = np.ascontiguousarray(k_arr, dtype=np.int64)
        job_p, job_t, k_arr, order = self._length_order(job_p, job_t, J, k_arr)
        cap = int(J) * (8 if all_minima else 2) + 4096
        while True:
            out_j = np.empty(cap, dtype=np.int64)
            out_p = np.empty(cap, dtype=np.int64)
            out_c = np.empty(cap, dtype=np.int32)
            got = _lib.sassy_scan(
                _ptr(self.txt), self.Wt, _ptr(self.n_arr),
                _ptr(self.peq), self.A, self.L,
                _ptr(self.m_arr), _ptr(self.pv0), _ptr(self.score0),
                _ptr(self.o_arr),
                _ptr(self.ov_add),
                0 if self.ov_add is None else len(self.ov_add),
                _ptr(job_p), _ptr(job_t), int(J),
                self.k, _ptr(k_arr), ctypes.c_int32(1 if all_minima else 0),
                _ptr(out_j), _ptr(out_p), _ptr(out_c), cap,
                None,
                _ptr(self._scr_pv), _ptr(self._scr_mv), _ptr(self._scr_bs),
            )
            if got <= cap:
                out_j, out_p, out_c = out_j[:got], out_p[:got], out_c[:got]
                if got:
                    if order is not None:
                        out_j = order[out_j]  # back to caller job indices
                    # the interleaved fast path emits across many jobs at
                    # once (and the length reorder shuffles job identity);
                    # restore job-major order (per-job positions ascend, so
                    # a stable (job, pos) sort reproduces the scalar order)
                    so = np.lexsort((out_p, out_j))
                    out_j, out_p, out_c = out_j[so], out_p[so], out_c[so]
                return out_j, out_p, out_c
            cap = int(got)

    def run_best(self, job_p=None, job_t=None, J=None, k_arr=None) -> np.ndarray:
        """Mode 2: min end-cost per job (exact for values <= k, or <=
        k_arr[j] when a per-job threshold array is given — each job's band
        then matches its own threshold)."""
        if J is None:
            job_p, job_t, J = self._default_jobs()
        if k_arr is not None:
            k_arr = np.ascontiguousarray(k_arr, dtype=np.int64)
        job_p, job_t, k_arr, order = self._length_order(job_p, job_t, J, k_arr)
        out_best = np.empty(int(J), dtype=np.int32)
        _lib.sassy_scan(
            _ptr(self.txt), self.Wt, _ptr(self.n_arr),
            _ptr(self.peq), self.A, self.L,
            _ptr(self.m_arr), _ptr(self.pv0), _ptr(self.score0),
            _ptr(self.o_arr),
            _ptr(self.ov_add),
            0 if self.ov_add is None else len(self.ov_add),
            _ptr(job_p), _ptr(job_t), int(J),
            self.k, _ptr(k_arr), ctypes.c_int32(2),
            None, None, None, 0,
            _ptr(out_best),
            _ptr(self._scr_pv), _ptr(self._scr_mv), _ptr(self._scr_bs),
        )
        if order is not None:
            res = np.empty_like(out_best)
            res[order] = out_best  # C wrote by reordered-job position
            return res
        return out_best


def scan_pairs(
    patterns,
    texts,
    profile,
    k: int,
    all_minima: bool,
    alpha: float | None = None,
    max_overhang: int | None = None,
):
    """Native twin of myers.batch_scan_minima / (batch_end_costs +
    batch_find_minima): pattern[i] vs text[i], returns (pair_idx, end_pos,
    cost).  Per-pair candidate lists come out in the same (ascending
    position) order as the NumPy paths."""
    nb = NativeBatch(patterns, texts, profile, k, alpha, max_overhang)
    return nb.run_minima(all_minima)


def scan_jobs(patterns, texts, profile, k, all_minima, job_p, job_t):
    """Native cartesian scan: explicit (pattern_idx, text_idx) job lists."""
    nb = NativeBatch(patterns, texts, profile, k)
    job_p = np.ascontiguousarray(job_p, dtype=np.int64)
    job_t = np.ascontiguousarray(job_t, dtype=np.int64)
    return nb.run_minima(all_minima, job_p, job_t, len(job_p))


def best_jobs(
    patterns,
    texts,
    profile,
    k: int,
    alpha: float | None = None,
    max_overhang: int | None = None,
) -> np.ndarray:
    """Native twin of myers.batch_best_costs (pre-clamp): pattern[i] vs
    text[i] min end-cost, exact wherever the true value is <= k."""
    nb = NativeBatch(patterns, texts, profile, k, alpha, max_overhang)
    return nb.run_best()
