"""Batched traceback: one vectorized DP fill for ALL candidates of a batch.

The reference fills 4 trace windows at a time with SIMD
(/root/reference/src/trace.rs:57-252, MatchBatch::process
src/search.rs:1552-1689); here the batch axis is the candidate list — the
(C, m+1, w+1) window matrices are filled with C-wide NumPy rows (one
dispatch per pattern row instead of one DP per candidate), then the greedy
``=X > D > I`` walk runs over plain Python lists (scalar numpy indexing is
~10x slower than list indexing at walk sizes).

Semantics identical to ``oracle.traceback`` (no-overhang case) — pinned by
the equivalence fuzz in tests/test_prefilter.py.  Overhang (alpha) windows
fall back to the per-candidate oracle path.
"""

from __future__ import annotations

import numpy as np

from sassy_ray.kernel.profiles import Profile
from sassy_ray.kernel.types import FWD, Match, cigar_to_string

__all__ = ["batch_traceback"]


def batch_traceback(
    patterns: list[bytes],
    texts: list[bytes],
    end_positions: list[int],
    profile: Profile,
    k: int,
) -> list[Match]:
    """Per candidate c: the traced match of patterns[c] in texts[c] ending at
    end_positions[c] (all <= len(text); no overhang)."""
    C = len(patterns)
    if C == 0:
        return []
    fill_len = np.array([len(p) + k for p in patterns], dtype=np.int64)
    offs = np.maximum(0, np.asarray(end_positions, dtype=np.int64) - fill_len)
    windows = [t[o:e] for t, o, e in zip(texts, offs.tolist(), end_positions)]
    from sassy_ray.kernel import native

    if native.available():
        # C fill+walk+RLE — bit-identical cigars/starts/costs (the NumPy
        # fill pays one dispatch per pattern row; the walk ran on Python
        # lists — together they cost as much as the scan on demux batches)
        starts, costs, cigars = native.traceback_batch(
            patterns, windows, profile.match_matrix.view(np.uint8)
        )
        return [
            Match(
                text_start=int(offs[c]) + int(starts[c]),
                text_end=int(offs[c]) + len(windows[c]),
                pattern_start=0,
                pattern_end=len(patterns[c]),
                cost=int(costs[c]),
                strand=FWD,
                cigar=cigars[c],
            )
            for c in range(C)
        ]
    m_arr = np.array([len(p) for p in patterns], dtype=np.int64)
    w_arr = np.array([len(w) for w in windows], dtype=np.int64)
    m_max = int(m_arr.max())
    w_max = int(w_arr.max())

    pat = np.zeros((C, m_max), dtype=np.uint8)
    for c, p in enumerate(patterns):
        if p:
            pat[c, : len(p)] = np.frombuffer(p, dtype=np.uint8)
    win = np.zeros((C, w_max), dtype=np.uint8)
    for c, w in enumerate(windows):
        if w:
            win[c, : len(w)] = np.frombuffer(w, dtype=np.uint8)

    # D: (C, m+1, w+1), filled row-by-row with C-wide vector ops; the
    # horizontal dependency unrolls to a prefix-min (cf. oracle.dp_matrix)
    D = np.zeros((C, m_max + 1, w_max + 1), dtype=np.int32)
    idx = np.arange(w_max + 1, dtype=np.int32)[None, :]
    mmat = profile.match_matrix
    wbuf = np.empty((C, w_max + 1), dtype=np.int32)
    for j in range(1, m_max + 1):
        prev = D[:, j - 1, :]
        match_row = mmat[pat[:, j - 1][:, None], win]  # (C, w_max)
        sub = prev[:, :-1] + np.where(match_row, 0, 1)
        np.minimum(sub, prev[:, 1:] + 1, out=wbuf[:, 1:])
        wbuf[:, 0] = j  # left boundary D[j][0] = j
        D[:, j, :] = idx + np.minimum.accumulate(wbuf - idx, axis=1)

    out: list[Match] = []
    for c in range(C):
        m = int(m_arr[c])
        wlen = int(w_arr[c])
        Dl = D[c, : m + 1, : wlen + 1].tolist()
        p_l = patterns[c]
        w_l = windows[c]
        mm_l = mmat
        j = m
        i = wlen
        pattern_start = 0
        g = Dl[j][i]
        total_cost = g
        ops: list[str] = []
        while True:
            if j == 0:
                break
            if (
                i > 0
                and Dl[j - 1][i - 1] == g
                and mm_l[p_l[j - 1], w_l[i - 1]]
            ):
                ops.append("=")
                j -= 1
                i -= 1
                continue
            g -= 1
            if i > 0 and Dl[j - 1][i - 1] == g:
                ops.append("X")
                j -= 1
                i -= 1
                continue
            if i > 0 and Dl[j][i - 1] == g:
                ops.append("D")
                i -= 1
                continue
            if Dl[j - 1][i] == g:
                ops.append("I")
                j -= 1
                continue
            raise AssertionError(f"trace failed at c={c} j={j} i={i} g={g}")
        assert g == 0, f"remaining cost after trace must be 0, got {g}"
        ops.reverse()
        off = int(offs[c])
        out.append(
            Match(
                text_start=off + i,
                text_end=off + wlen,
                pattern_start=pattern_start,
                pattern_end=m,
                cost=int(total_cost),
                strand=FWD,
                cigar=cigar_to_string(ops),
            )
        )
    return out
