"""The user-facing Searcher: reference Python-binding surface, NumPy engine.

Mirrors ``/root/reference/src/python.rs:27-233``:
``Searcher(alphabet, rc=True, alpha=None, max_n_frac=None)`` with
``search`` / ``search_all`` / ``search_with_fn`` / ``search_many`` /
``search_all_alignments``, plus builder-ish kwargs
(``only_best_match``, ``without_trace``, ``max_overhang``) from
search.rs:363-483.

Candidate end positions come from the vectorized bit-parallel kernel
(``myers.py``); tracebacks run per candidate over an ``m+k`` window with the
greedy ``=X > D > I`` preference (trace.rs:273-406), shared with the oracle.
"""

from __future__ import annotations

import math

import numpy as np

from sassy_ray.kernel import oracle
from sassy_ray.kernel.myers import TextRows, batch_end_costs, batch_find_minima
from sassy_ray.kernel.profiles import Profile, get_profile
from sassy_ray.kernel.types import FWD, RC, UNSET, Match, cigar_to_string

__all__ = ["Searcher", "Match", "search_many", "TextRows"]


def _as_text_col(texts):
    """Text input normalization: Arrow arrays become a ``TextRows`` column
    (one vectorized buffer scatter, no to_pylist), TextRows pass through,
    and list inputs become a TextRows too (one matrix build shared by both
    strands; the RC pass then reverses with one vectorized gather instead of
    a per-row Python ``t[::-1]``)."""
    if isinstance(texts, TextRows):
        return texts
    try:
        import pyarrow as pa

        if isinstance(texts, (pa.Array, pa.ChunkedArray)):
            return TextRows.from_any(texts)
    except ImportError:  # pragma: no cover
        pass
    return TextRows.from_any([_b(t) for t in texts])


def _take_texts(texts, idxs):
    if isinstance(texts, TextRows):
        return texts.take(idxs)
    return [texts[i] for i in idxs]


def _reversed_texts(texts):
    if isinstance(texts, TextRows):
        return texts.reversed()
    return [t[::-1] for t in texts]

# pairs per kernel batch; bounds peak memory of the (B, W) cost matrix
DEFAULT_CHUNK_PAIRS = 2048
# level-2 gate: the 63-char screen runs when level 1 was SKIPPED or left
# more than this fraction of pairs alive (an unselective level-1 means the
# survivors are mostly false positives worth killing before the multi-limb
# kernel; after a selective level-1 the survivors are mostly real matches
# and another screen is a wasted pass).  Set > 1 to disable in A/B benches.
PREFILTER_L2_MIN_HIT_FRAC = 0.25


class _RemapOut:
    """dict facade over the cartesian ``out`` that remaps sub-list pattern
    indices back to original pattern indices."""

    def __init__(self, out: dict, idxs: list[int]):
        self.out = out
        self.idxs = idxs

    def setdefault(self, key, default):
        pi, ti = key
        return self.out.setdefault((self.idxs[pi], ti), default)


class Searcher:
    def __init__(
        self,
        alphabet: str = "dna",
        rc: bool = True,
        alpha: float | None = None,
        max_n_frac: float | None = None,
        max_overhang: int | None = None,
        only_best_match: bool = False,
        without_trace: bool = False,
        case_sensitive: bool = True,
    ) -> None:
        name = alphabet.lower()
        if name == "ascii":
            name = "ascii" if case_sensitive else "ascii_ci"
            rc = False  # python.rs:41: ascii is always fwd-only
        self.profile: Profile = get_profile(name)
        if alpha is not None and not self.profile.supports_overhang:
            raise ValueError(f"Overhang is not supported for {name}")
        if alpha is not None and not (0.0 <= alpha <= 1.0):
            raise ValueError("Alpha must be in range 0.0 <= alpha <= 1.0")
        if max_n_frac is not None and max_n_frac == 1.0:
            max_n_frac = None  # python.rs:36 convention
        self.rc = bool(rc and self.profile.supports_rc)
        self.alpha = alpha
        self.max_overhang = max_overhang
        self.max_n_frac = max_n_frac
        self.only_best = only_best_match
        self.without_trace = without_trace

    # ------------------------------------------------------------------
    # batch core: one strand over a list of (pattern, text) pairs
    # ------------------------------------------------------------------

    def _strand_matches(
        self,
        patterns: list[bytes],
        texts: list[bytes],
        k: int,
        all_minima: bool,
        strand: str | list[str],
        filter_fn=None,
    ) -> list[list[Match]]:
        """Per input pair, the strand-local matches (coords in the given
        pattern/text orientation; caller flips RC coords).  ``strand`` may be
        per-row (a list), letting callers fuse fwd+rc rows into ONE kernel
        batch (half the dispatch count of two passes)."""
        B = len(patterns)
        out: list[list[Match]] = [[] for _ in range(B)]
        if B == 0:
            return out
        from sassy_ray.kernel import native

        if native.available():
            # compiled per-row scan: any limb count, with or without overhang
            pi, pp, pc = native.scan_pairs(
                patterns, texts, self.profile, k, all_minima, self.alpha, self.max_overhang
            )
        elif self.alpha is None and max(len(p) for p in patterns) <= 64:
            # fused scan+walk: no (B, W) cost matrix (the hot path for
            # grep/crispr-style scans of <=64-char patterns)
            from sassy_ray.kernel.myers import batch_scan_minima

            pi, pp, pc = batch_scan_minima(patterns, texts, self.profile, k, all_minima)
        else:
            costs, n_arr, max_pos = batch_end_costs(
                patterns, texts, self.profile, k, self.alpha, self.max_overhang
            )
            pi, pp, pc = batch_find_minima(costs, max_pos, k, all_minima)

        # group candidates per pair
        cands: dict[int, list[tuple[int, int]]] = {}
        for i, p, c in zip(pi.tolist(), pp.tolist(), pc.tolist()):
            cands.setdefault(i, []).append((p, c))
        return self._finalize(patterns, texts, k, cands, strand, filter_fn)

    def _finalize(
        self,
        patterns: list[bytes],
        texts: list[bytes],
        k: int,
        cands: dict[int, list[tuple[int, int]]],
        strand: str | list[str],
        filter_fn=None,
    ) -> list[list[Match]]:
        """Candidate ``(end_pos, cost)`` lists -> Match lists: predicate
        filter, max-N screen, only_best, traceback.  Shared by the per-pair
        scan and the transposed packed scan (both produce identical
        candidate sets, so everything downstream is one code path)."""
        B = len(patterns)
        out: list[list[Match]] = [[] for _ in range(B)]

        def row_strand(i: int) -> str:
            return strand[i] if isinstance(strand, list) else strand

        filtered: dict[int, list[tuple[int, int]]] = {}
        for i, ec in cands.items():
            pattern, text = patterns[i], texts[i]
            m, n = len(pattern), len(text)
            if filter_fn is not None:
                ec = [(e, c) for (e, c) in ec if filter_fn(pattern, text[: min(e, n)], row_strand(i))]
            if self.max_n_frac is not None:
                ec = [
                    (e, c)
                    for (e, c) in ec
                    if oracle.endpoint_n_ok(self.profile, e, text, m, k, self.max_n_frac)
                ]
            if self.only_best and ec:
                ec = [min(ec, key=lambda x: (x[1], -x[0]))]
            if ec:
                filtered[i] = ec

        if self.without_trace:
            for i, ec in filtered.items():
                m, n = len(patterns[i]), len(texts[i])
                out[i] = [
                    Match(
                        text_start=UNSET,
                        text_end=min(end_pos, n),
                        pattern_start=UNSET,
                        pattern_end=m - max(0, end_pos - n),
                        cost=cost,
                        strand=row_strand(i),
                    )
                    for end_pos, cost in ec
                ]
            return out

        jobs = [(i, e, c) for i, ec in filtered.items() for (e, c) in ec]
        if self.alpha is None:
            # one vectorized DP fill for every trace window in the batch
            # (the reference's 4-wide MatchBatch, search.rs:1552-1689)
            from sassy_ray.kernel.trace import batch_traceback

            traced = batch_traceback(
                [patterns[i] for i, _, _ in jobs],
                [texts[i] for i, _, _ in jobs],
                [e for _, e, _ in jobs],
                self.profile,
                k,
            )
        else:
            traced = [
                oracle.traceback(
                    patterns[i], texts[i], e, self.profile, k, self.alpha, self.max_overhang
                )
                for i, e, _ in jobs
            ]
        for (i, _e, _c), mt in zip(jobs, traced):
            mt.strand = row_strand(i)
            out[i].append(mt)
        if self.max_n_frac is not None:
            for i in filtered:
                out[i] = [
                    mm
                    for mm in out[i]
                    if oracle.traced_n_ok(self.profile, mm, texts[i], self.max_n_frac)
                ]
        return out

    def _pair_matches(
        self,
        patterns: list[bytes],
        texts: list[bytes],
        k: int,
        all_minima: bool,
        filter_fn=None,
    ) -> list[list[Match]]:
        """Fwd + (optional) RC matches per pair, RC coords flipped to fwd
        space (search.rs:813-877)."""
        fwd = self._strand_matches(patterns, texts, k, all_minima, FWD, filter_fn)
        if not self.rc:
            return fwd
        comp = [self.profile.complement(p) for p in patterns]
        rev = _reversed_texts(texts)
        rc = self._strand_matches(comp, rev, k, all_minima, RC, filter_fn)
        tlens = texts.lens if isinstance(texts, TextRows) else None
        for i, ms in enumerate(rc):
            n = int(tlens[i]) if tlens is not None else len(texts[i])
            for mm in ms:
                s, e = mm.text_start, mm.text_end
                mm.text_start = n - e if e != UNSET else UNSET
                if self.without_trace:
                    mm.text_end = UNSET
                else:
                    mm.text_end = n - s
            fwd[i] = fwd[i] + ms
        return fwd

    # ------------------------------------------------------------------
    # public surface
    # ------------------------------------------------------------------

    def search(self, pattern: bytes, text: bytes, k: int) -> list[Match]:
        return self._pair_matches([_b(pattern)], [_b(text)], k, False)[0]

    def search_all(self, pattern: bytes, text: bytes, k: int) -> list[Match]:
        return self._pair_matches([_b(pattern)], [_b(text)], k, True)[0]

    def search_with_fn(
        self, pattern: bytes, text: bytes, k: int, all_minima: bool, filter_fn
    ) -> list[Match]:
        return self._pair_matches([_b(pattern)], [_b(text)], k, all_minima, filter_fn)[0]

    def _verify_pairs(
        self,
        patterns: list[bytes],
        texts: list[bytes],
        pairs: list[tuple[int, int]],
        k: int,
        all_minima: bool,
        strand: str,
        filter_fn,
        chunk_pairs: int,
        out: dict[tuple[int, int], list[Match]],
    ) -> None:
        """Per-pair full-kernel verify (the untransposed path: multi-limb
        patterns and degenerate len<=k patterns)."""
        for s in range(0, len(pairs), chunk_pairs):
            chunk = pairs[s : s + chunk_pairs]
            res = self._strand_matches(
                [patterns[pi] for pi, _ in chunk],
                _take_texts(texts, [ti for _, ti in chunk]),
                k,
                all_minima,
                strand,
                filter_fn,
            )
            for (pi, ti), ms in zip(chunk, res):
                if ms:
                    out.setdefault((pi, ti), []).extend(ms)

    def _packed_class(
        self,
        patterns: list[bytes],
        texts: list[bytes],
        idxs: list[int],
        cfg,
        k: int,
        all_minima: bool,
        strand: str,
        filter_fn,
        chunk_pairs: int,
        out: dict[tuple[int, int], list[Match]],
    ) -> None:
        """Transposed multi-pattern scan for one lane-width class: every
        pattern fits one SWAR lane, so the packed scan computes EXACT
        full-pattern costs with the minima walk fused in — no per-pair
        verify pass at all (sassy v2's transposed queries,
        ref src/pattern_tiling/tqueries.rs:53-151 / backend.rs:110-127).

        For the 16..31-char class at small k the 4x15 suffix prefilter is
        still 2x cheaper per step than the 2x31 scan, so it runs first and
        only surviving (pattern, text) pairs are packed."""
        from sassy_ray.kernel.prefilter import (
            LANES2X31,
            LANES4X15,
            PackedPairRows,
            get_packed_suffixes,
            packed_scan_minima,
            prefilter_hits,
        )

        sub = [patterns[i] for i in idxs]
        Ps, T = len(sub), len(texts)
        groups: list[tuple[int, tuple[int, ...]]] = []
        # suffix-prefilter level in front of the packed scan, by the same
        # selectivity table as the cascade: 4x15 at k <= 3; for the 1x63
        # class a 2x31 suffix still dominates k up to ~10 (measured: direct
        # 1x63 at m=40/k=5 is 2.8x SLOWER than 2x31-prefilter + verify —
        # 17.3 vs 48.5 MB/s/core — because a 31-char suffix stays selective
        # far past k=4; only past k~10 does unfiltered scanning win)
        if cfg is LANES2X31:
            pf_cfg = LANES4X15 if k <= 3 else None
        elif cfg is LANES4X15:
            pf_cfg = None
        else:  # LANES1X63
            pf_cfg = LANES4X15 if k <= 3 else (LANES2X31 if k <= 10 else None)
        if pf_cfg is not None:
            packedf = get_packed_suffixes(sub, self.profile, k, pf_cfg)
            ti_arr, pi_arr = np.nonzero(prefilter_hits(packedf, texts).T)
            bounds = np.searchsorted(ti_arr, np.arange(T + 1))
            for ti in range(T):
                lo, hi = int(bounds[ti]), int(bounds[ti + 1])
                for s in range(lo, hi, cfg.lanes):
                    # clamp to hi: an unclamped slice would pull the NEXT
                    # text's hit rows into this text's lane group (observed
                    # as duplicate emissions when the overflow row shares
                    # the pattern id — caught by the native-vs-numpy
                    # equivalence fuzz in tests/test_native.py)
                    groups.append(
                        (ti, tuple(int(x) for x in pi_arr[s : min(hi, s + cfg.lanes)]))
                    )
        else:
            word_groups = [
                tuple(range(s, min(Ps, s + cfg.lanes))) for s in range(0, Ps, cfg.lanes)
            ]
            groups = [(ti, g) for ti in range(T) for g in word_groups]
        if not groups:
            return
        packed = PackedPairRows(sub, self.profile, cfg, groups)
        spi, sti, spp, spc = packed_scan_minima(packed, texts, k, all_minima)
        if len(spi) == 0:
            return
        # split candidate runs per (pattern, text) pair (already lexsorted)
        key = spi * T + sti
        starts = np.nonzero(np.diff(key, prepend=key[0] - 1))[0]
        ends = np.append(starts[1:], len(key))
        pair_rows = [(int(spi[s]), int(sti[s])) for s in starts]
        for s in range(0, len(pair_rows), chunk_pairs):
            cpairs = pair_rows[s : s + chunk_pairs]
            cands = {
                r: list(zip(spp[a:b].tolist(), spc[a:b].tolist()))
                for r, (a, b) in enumerate(zip(starts[s : s + chunk_pairs], ends[s : s + chunk_pairs]))
            }
            res = self._finalize(
                [sub[pi] for pi, _ in cpairs],
                _take_texts(texts, [ti for _, ti in cpairs]),
                k,
                cands,
                strand,
                filter_fn,
            )
            for (pi, ti), ms in zip(cpairs, res):
                if ms:
                    out.setdefault((idxs[pi], ti), []).extend(ms)

    def _native_cartesian(
        self,
        patterns: list[bytes],
        texts,
        k: int,
        all_minima: bool,
        strand: str,
        filter_fn,
        chunk_pairs: int,
        out: dict[tuple[int, int], list[Match]],
    ) -> None:
        """P x T cartesian scan on the compiled kernel: jobs are emitted
        text-major (a text's codes stay cache-resident across its P pattern
        walks), sliced to bound the job/emission arrays; candidates group
        per (pattern, text) pair and flow through the shared ``_finalize``.
        Alpha-free only (the caller routes overhang searches per-pair)."""
        from sassy_ray.kernel.native import NativeBatch

        P, T = len(patterns), len(texts)
        nb = NativeBatch(patterns, texts, self.profile, k)
        pat_ids = np.arange(P, dtype=np.int64)
        if nb.pat_row is not None:
            pat_ids = nb.pat_row  # duplicate patterns share PEQ rows
        t_slice = max(1, 1_000_000 // max(P, 1))
        for t0 in range(0, T, t_slice):
            t1 = min(T, t0 + t_slice)
            nt = t1 - t0
            job_p = np.ascontiguousarray(np.tile(pat_ids, nt))
            job_t = np.ascontiguousarray(
                np.repeat(np.arange(t0, t1, dtype=np.int64), P)
            )
            ji, jp, jc = nb.run_minima(all_minima, job_p, job_t, len(job_p))
            if len(ji) == 0:
                continue
            # emissions are job-major: split candidate runs per job
            starts = np.nonzero(np.diff(ji, prepend=ji[0] - 1))[0]
            ends = np.append(starts[1:], len(ji))
            jrows = ji[starts]
            pair_rows = [
                (int(j % P), int(t0 + j // P)) for j in jrows.tolist()
            ]
            for s in range(0, len(pair_rows), chunk_pairs):
                cpairs = pair_rows[s : s + chunk_pairs]
                cands = {
                    r: list(zip(jp[a:b].tolist(), jc[a:b].tolist()))
                    for r, (a, b) in enumerate(
                        zip(starts[s : s + chunk_pairs], ends[s : s + chunk_pairs])
                    )
                }
                res = self._finalize(
                    [patterns[pi] for pi, _ in cpairs],
                    _take_texts(texts, [ti for _, ti in cpairs]),
                    k,
                    cands,
                    strand,
                    filter_fn,
                )
                for (pi, ti), ms in zip(cpairs, res):
                    if ms:
                        out.setdefault((pi, ti), []).extend(ms)

    def _cartesian_strand(
        self,
        patterns: list[bytes],
        texts: list[bytes],
        k: int,
        all_minima: bool,
        strand: str,
        filter_fn=None,
        chunk_pairs: int = DEFAULT_CHUNK_PAIRS,
    ) -> dict[tuple[int, int], list[Match]]:
        """One strand of the P x T cartesian search, dispatched by pattern
        length class:

        - <= 15 chars: transposed packed 4x15 scan — exact costs + fused
          walk in one pass (prefilter and verify collapse into one scan);
        - 16..31 chars: transposed packed 2x31 scan (behind the 4x15 suffix
          prefilter when k <= 3, where that filter is cheaper per step);
        - 32..63 chars at k > 10: transposed packed 1x63 scan — the lane
          holds the WHOLE pattern (exact-in-scan, backend.rs:110-127 sizes
          limb types by length the same way); measured 1.45x over the
          unfiltered cascade at m=40/k=12 (16.8 vs 11.6 MB/s/core).  At
          k <= 10 this class stays on the cascade: a 31-char suffix
          prefilter is still selective there and prefilter+verify measured
          FASTER than the single-lane packed scan (48.5 vs 38.6 at k=5 —
          one lane shares no element work, and the SWAR walk costs more
          per row than the per-pair fused walk);
        - > 63 chars (and degenerate len <= k): the hierarchical prefilter
          cascade (suffix SWAR level 1, 63-char single-limb level 2) in
          front of the per-pair multi-limb kernel.  All levels are exact —
          a suffix cost lower-bounds the full cost."""
        P, T = len(patterns), len(texts)
        out: dict[tuple[int, int], list[Match]] = {}
        if P == 0 or T == 0:
            return out
        if self.alpha is not None or P < 2:
            pairs = [(pi, ti) for pi in range(P) for ti in range(T)]
            self._verify_pairs(
                patterns, texts, pairs, k, all_minima, strand, filter_fn, chunk_pairs, out
            )
            return out
        from sassy_ray.kernel import native

        if native.available():
            # compiled cartesian scan: every (pattern, text) job walked
            # start-to-finish in registers — faster per pair than even the
            # packed SWAR *prefilter* pass, so the whole class dispatch and
            # cascade collapse into one call (texts prepped once)
            self._native_cartesian(
                patterns, texts, k, all_minima, strand, filter_fn, chunk_pairs, out
            )
            return out
        from sassy_ray.kernel.prefilter import LANES1X63, LANES2X31, LANES4X15

        small = [i for i, p in enumerate(patterns) if k < len(p) <= 15]
        mid = [i for i, p in enumerate(patterns) if max(15, k) < len(p) <= 31]
        packed63 = k > 10  # see docstring: below that the cascade measures faster
        long_cut = 63 if packed63 else 31
        long_ = (
            [i for i, p in enumerate(patterns) if max(31, k) < len(p) <= 63]
            if packed63
            else []
        )
        rest = [
            i for i, p in enumerate(patterns) if len(p) > long_cut or len(p) <= k
        ]
        if small:
            self._packed_class(
                patterns, texts, small, LANES4X15, k, all_minima, strand,
                filter_fn, chunk_pairs, out,
            )
        if mid:
            self._packed_class(
                patterns, texts, mid, LANES2X31, k, all_minima, strand,
                filter_fn, chunk_pairs, out,
            )
        if long_:
            self._packed_class(
                patterns, texts, long_, LANES1X63, k, all_minima, strand,
                filter_fn, chunk_pairs, out,
            )
        if rest:
            self._cascade_pairs(
                patterns, texts, rest, k, all_minima, strand, filter_fn, chunk_pairs, out
            )
        return out

    def _cascade_pairs(
        self,
        patterns: list[bytes],
        texts: list[bytes],
        idxs: list[int],
        k: int,
        all_minima: bool,
        strand: str,
        filter_fn,
        chunk_pairs: int,
        out: dict[tuple[int, int], list[Match]],
    ) -> None:
        """Hierarchical prefilter cascade (the reference's multi-level
        suffix filter, pattern_tiling/general.rs:59-102; level choice by the
        selectivity heuristic of its table at 294-313, keyed on k a priori —
        a suffix level whose length can't dominate k is skipped, it would
        pass everything):
          level 1: packed SWAR word scan — 4x15-char lanes for small k,
                   2x31-char lanes for mid k;
          level 2: 63-char single-limb per-pair screen, for patterns
                   whose full kernel is multi-limb (costs 1/L of the
                   full scan, exact lower bound like every level)."""
        from sassy_ray.kernel.prefilter import (
            LANES2X31,
            LANES4X15,
            get_packed_suffixes,
            prefilter_hits,
        )

        sub = [patterns[i] for i in idxs]
        Ps, T = len(sub), len(texts)
        if k <= 3:
            lvl1 = LANES4X15
        elif k <= 10:
            lvl1 = LANES2X31
        else:
            lvl1 = None
        if lvl1 is not None:
            packed = get_packed_suffixes(sub, self.profile, k, lvl1)
            pairs = [
                (int(pi), int(ti)) for pi, ti in np.argwhere(prefilter_hits(packed, texts))
            ]
        else:
            pairs = [(pi, ti) for pi in range(Ps) for ti in range(T)]
        SUF2 = 63
        if (
            pairs
            and k < SUF2 - 8
            and max(len(p) for p in sub) > 2 * SUF2
            and (lvl1 is None or len(pairs) > PREFILTER_L2_MIN_HIT_FRAC * Ps * T)
        ):
            from sassy_ray.kernel.myers import batch_best_costs

            kept: list[tuple[int, int]] = []
            for s in range(0, len(pairs), 8192):
                chunk = pairs[s : s + 8192]
                suf = [
                    sub[pi][-SUF2:] if len(sub[pi]) > SUF2 else sub[pi]
                    for pi, _ in chunk
                ]
                smin = batch_best_costs(suf, _take_texts(texts, [ti for _, ti in chunk]), self.profile, k)
                kept.extend(pr for pr, c in zip(chunk, smin) if c <= k)
            pairs = kept
        self._verify_pairs(
            sub, texts, pairs, k, all_minima, strand, filter_fn, chunk_pairs,
            _RemapOut(out, idxs),
        )

    def _search_cartesian(
        self,
        patterns: list[bytes],
        texts: list[bytes],
        k: int,
        all_minima: bool = False,
        filter_fn=None,
    ) -> dict[tuple[int, int], list[Match]]:
        """Fwd + (optional) RC cartesian matches keyed by (pattern_idx,
        text_idx), RC coords flipped to fwd space."""
        res = self._cartesian_strand(patterns, texts, k, all_minima, FWD, filter_fn)
        if self.rc:
            comp = [self.profile.complement(p) for p in patterns]
            rev = _reversed_texts(texts)
            rc = self._cartesian_strand(comp, rev, k, all_minima, RC, filter_fn)
            tlens = texts.lens if isinstance(texts, TextRows) else None
            for (pi, ti), ms in rc.items():
                n = int(tlens[ti]) if tlens is not None else len(texts[ti])
                for mm in ms:
                    s_, e = mm.text_start, mm.text_end
                    mm.text_start = n - e if e != UNSET else UNSET
                    if self.without_trace:
                        mm.text_end = UNSET
                    else:
                        mm.text_end = n - s_
                res.setdefault((pi, ti), []).extend(ms)
        return res

    def search_many(
        self,
        patterns: list[bytes],
        texts: list[bytes],
        k: int,
        mode: str = "auto",
        chunk_pairs: int = DEFAULT_CHUNK_PAIRS,
    ) -> list[Match]:
        """All patterns x all texts (the reference's cartesian search_many,
        search.rs:527-603), suffix-prefiltered when P >= 2.  ``mode`` selects
        nothing semantically here — batching is automatic — it is accepted
        for surface parity ('single' | 'batch_patterns' | 'batch_texts' |
        'auto')."""
        if mode not in ("single", "batch_patterns", "batch_texts", "auto"):
            raise ValueError(
                "Unsupported search mode. Must be one of 'single', 'batch_patterns', or 'batch_texts'"
            )
        patterns = [_b(p) for p in patterns]
        texts = _as_text_col(texts)
        res = self._search_cartesian(patterns, texts, k, False)
        out: list[Match] = []
        for (ip, it) in sorted(res):
            for mm in res[(ip, it)]:
                mm.pattern_idx = ip
                mm.text_idx = it
                out.append(mm)
        return out

    def search_many_arrays(self, patterns, texts, k: int) -> dict:
        """Columnar ``search_many``: the same matches, emitted as per-field
        NumPy arrays (+ one Python list of cigar strings) in (pattern_idx,
        text_idx) order — the emission path for Arrow-native stages.  No
        flat Match list is built and each match's fields are read exactly
        once (the per-Match attribute-hop tax of converting ``search_many``
        output to arrays goes away).  ``texts`` may be an Arrow
        string/binary array (fed to the kernel zero-copy via ``TextRows``),
        a ``TextRows``, or a list[bytes].

        Returns dict with ``pattern_idx, text_idx, text_start, text_end,
        pattern_start, pattern_end`` (int64), ``cost`` (int32), ``strand``
        (int8: 0='+', 1='-'), ``cigar`` (list[str])."""
        patterns = [_b(p) for p in patterns]
        texts = _as_text_col(texts)
        res = self._search_cartesian(patterns, texts, k, False)
        total = sum(len(v) for v in res.values())
        pi = np.empty(total, np.int64)
        ti = np.empty(total, np.int64)
        ts = np.empty(total, np.int64)
        te = np.empty(total, np.int64)
        ps = np.empty(total, np.int64)
        pe = np.empty(total, np.int64)
        cost = np.empty(total, np.int32)
        strand = np.empty(total, np.int8)
        cigar: list[str] = [""] * total
        w = 0
        for (ip, it) in sorted(res):
            for mm in res[(ip, it)]:
                pi[w] = ip
                ti[w] = it
                ts[w] = mm.text_start
                te[w] = mm.text_end
                ps[w] = mm.pattern_start
                pe[w] = mm.pattern_end
                cost[w] = mm.cost
                strand[w] = 0 if mm.strand == FWD else 1
                cigar[w] = mm.cigar or ""
                w += 1
        return {
            "pattern_idx": pi,
            "text_idx": ti,
            "text_start": ts,
            "text_end": te,
            "pattern_start": ps,
            "pattern_end": pe,
            "cost": cost,
            "strand": strand,
            "cigar": cigar,
        }

    def search_pairs(
        self, patterns: list[bytes], texts: list[bytes], k: int, all_minima: bool = False
    ) -> list[list[Match]]:
        """Parallel-list pair scoring (ER hot path): pattern[i] vs text[i]."""
        return self._pair_matches([_b(p) for p in patterns], [_b(t) for t in texts], k, all_minima)

    def search_all_alignments(self, pattern: bytes, text: bytes, k: int) -> list[list[Match]]:
        """All distinct alignments per end anchor (alignment_iterator.rs).
        Groups sorted by anchor; anchor = text_end for Fwd, text_start for RC."""
        from sassy_ray.kernel.alignments import search_all_alignments

        return search_all_alignments(self, _b(pattern), _b(text), k)

    def iterate_all_alignments(
        self,
        pattern: bytes,
        text: bytes,
        k: int,
        matches: list[Match] | None = None,
        partial_matches: bool = False,
        callback=None,
    ) -> None:
        """Callback-driven alignment DFS with ``Continuation`` flow control
        (reference ``alignment_iterator.rs:43-105``): the callback receives
        ``(complete, match)`` and returns CONTINUE / PRUNE (skip subtree) /
        BREAK (next end anchor)."""
        from sassy_ray.kernel.alignments import iterate_all_alignments

        iterate_all_alignments(
            self, _b(pattern), _b(text), k, matches, partial_matches, callback
        )


def _b(x) -> bytes:
    if isinstance(x, bytes):
        return x
    if isinstance(x, str):
        return x.encode()
    if hasattr(x, "text") and isinstance(getattr(x, "text"), bytes):
        return x.text
    return bytes(x)


def search_many(
    patterns: list[bytes],
    texts: list[bytes],
    k: int,
    alphabet: str = "dna",
    rc: bool = True,
    **kwargs,
) -> list[Match]:
    return Searcher(alphabet, rc=rc, **kwargs).search_many(patterns, texts, k)


class CachedRev:
    """Text plus cached reversed copy (reference ``CachedRev``,
    search.rs:144-166) — API parity; ``Searcher`` accepts either bytes or
    a CachedRev and reuses the cached reverse for RC passes."""

    def __init__(self, text: bytes, eager: bool = True) -> None:
        self.text = _b(text)
        self._rev: bytes | None = self.text[::-1] if eager else None

    def rev_text(self) -> bytes:
        if self._rev is None:
            self._rev = self.text[::-1]
        return self._rev


# ---------------------------------------------------------------------------
# chunked long-text search (the reference's text-tiling, SURVEY §2.9.1 + D1)
# ---------------------------------------------------------------------------

# texts longer than this are split into overlapping chunks scored as batch
# rows — the batch axis replaces sassy v1's SIMD lanes; overlap = m+k so
# every owned end position has full alignment context, dedup = disjoint
# ownership of end positions (src/search.rs:1016-1049,1201-1240 semantics).
# CHUNK_LEN gates WHICH texts are worth chunking; the internal chunk sizes
# below are smaller — per-step NumPy dispatch is the fixed cost, so fewer
# steps x more rows wins until cache pressure (measured on 16x100kb DNA,
# 32x23bp k=3: 512 = 74.5 MB/s vs 2048 = 57.8 multi; 1024 = 13.8 vs 2048 =
# 11.6 single-pattern)
CHUNK_LEN = 2048
SCAN_CHUNK_LEN = 1024
# single-pattern scans whose pattern fits a packed text-lane (<= 31 chars,
# myers.packed_rows_scan) prefer shorter chunk rows: the packed words halve
# the per-step state, so the dispatch-amortizing row count doubles for free
# (measured m=23: 47.5 MB/s @512 vs 45.8 @1024; m=12: 59.3 vs 45.1)
SCAN_CHUNK_LEN_PACKED = 512
MULTI_CHUNK_LEN = 512
# the compiled kernel walks rows sequentially (no per-step dispatch to
# amortize), so chunk rows exist only for the ownership semantics — longer
# rows mean less overlap waste and fewer rows to build (overlap m+k over
# 8192 is ~0.3% at grep shapes)
SCAN_CHUNK_LEN_NATIVE = 8192


def _build_chunk_rows(texts: list[bytes], overlap: int, chunk_len: int):
    """Split texts into overlapping chunk rows.  Chunk c owns end positions
    (overlap, chunk_len] (first chunk owns from 0) — ranges are disjoint, so
    no dedup pass is needed."""
    chunks: list[bytes] = []
    owner: list[tuple[int, int, bool]] = []  # (text_idx, chunk_start, is_first)
    for ti, t in enumerate(texts):
        if len(t) <= chunk_len:
            chunks.append(t)
            owner.append((ti, 0, True))
            continue
        start = 0
        while True:
            end = min(len(t), start + chunk_len)
            chunks.append(t[start:end])
            owner.append((ti, start, start == 0))
            if end == len(t):
                break
            start = end - overlap
    return chunks, owner


def _chunk_row_count(texts: list[bytes], overlap: int, chunk_len: int) -> int:
    step = chunk_len - overlap
    total = 0
    for t in texts:
        n = len(t)
        total += 1 if n <= chunk_len else 1 + -(-(n - chunk_len) // step)
    return total


def _fill_chunk_rows(texts, overlap, chunk_len, mat, lens, row0, owner):
    """Fill preallocated ``mat[row0:]`` / ``lens[row0:]`` with the chunk rows
    of ``texts`` (same starts/lengths/ownership as ``_build_chunk_rows``);
    appends to ``owner``.  Returns the next free row index."""
    step = chunk_len - overlap
    r = row0
    for ti, t in enumerate(texts):
        n = len(t)
        if n <= chunk_len:
            if n:
                mat[r, :n] = np.frombuffer(t, dtype=np.uint8)
            lens[r] = n
            owner.append((ti, 0, True))
            r += 1
            continue
        arr = np.frombuffer(t, dtype=np.uint8)
        nc = 1 + -(-(n - chunk_len) // step)
        # full windows land as ONE strided bulk copy (a view, no index
        # arrays); at most one short tail chunk is filled separately into
        # its pre-zeroed row
        win = np.lib.stride_tricks.sliding_window_view(arr, chunk_len)[::step]
        nc_full = win.shape[0]
        np.copyto(mat[r : r + nc_full], win)
        lens[r : r + nc] = chunk_len
        if nc > nc_full:
            s0 = (nc - 1) * step
            mat[r + nc - 1, : n - s0] = arr[s0:]
            lens[r + nc - 1] = n - s0
        owner.extend((ti, i * step, i == 0) for i in range(nc))
        r += nc
    return r


def _build_chunk_rows_tr(texts: list[bytes], overlap: int, chunk_len: int):
    """Vectorized twin of ``_build_chunk_rows``: the chunk rows land directly
    in one padded uint8 matrix (a ``TextRows``) via per-text window gathers
    into ONE preallocated matrix — no per-chunk Python bytes objects and no
    vstack copy storm.  Same starts, same lengths, same ownership; the
    kernels consume the TextRows as-is."""
    R = _chunk_row_count(texts, overlap, chunk_len)
    mat = np.zeros((R, max(1, chunk_len)), dtype=np.uint8)
    lens = np.zeros(R, dtype=np.int64)
    owner: list[tuple[int, int, bool]] = []
    _fill_chunk_rows(texts, overlap, chunk_len, mat, lens, 0, owner)
    return TextRows(mat, lens), owner


def _collect_chunk_matches(n_texts: int, owner, res, overlap: int):
    out: list[list[Match]] = [[] for _ in range(n_texts)]
    for (ti, cstart, is_first), ms in zip(owner, res):
        for mm in ms:
            if not is_first and (mm.text_end if mm.text_end != UNSET else 0) <= overlap:
                continue
            if mm.text_start != UNSET:
                mm.text_start += cstart
            if mm.text_end != UNSET:
                mm.text_end += cstart
            out[ti].append(mm)
    return out


def _chunk_strand(searcher, pattern: bytes, texts: list[bytes], k: int, strand: str, chunk_len: int):
    """One-strand chunked scan; returns per-text matches in strand-local
    coords (caller flips RC coords)."""
    overlap = len(pattern) + k
    chunks, owner = _build_chunk_rows_tr(texts, overlap, chunk_len)
    res = searcher._strand_matches([pattern] * len(chunks), chunks, k, False, strand)
    return _collect_chunk_matches(len(texts), owner, res, overlap)


def chunked_search_multi(
    searcher: Searcher,
    patterns: list[bytes],
    texts: list[bytes],
    k: int,
    chunk_len: int = MULTI_CHUNK_LEN,
) -> list[list[list[Match]]]:
    """Multi-pattern chunked scan: ONE set of chunk rows per strand, the
    packed suffix prefilter flags (pattern, chunk) rows, and only survivors
    pay the full kernel.  Returns out[pattern_idx][text_idx] -> matches.

    Chunk ownership uses the max pattern length (overlap >= m+k holds for
    every pattern, so end-position ownership stays disjoint and exact).

    ``texts`` may be a list of bytes/str or an Arrow string/binary array —
    the Arrow form feeds the fused C chunk builder zero-copy (no to_pylist
    round-trip; the fallback NumPy path materializes bytes lazily)."""
    import pyarrow as pa

    patterns = [_b(p) for p in patterns]
    is_arrow = isinstance(texts, (pa.Array, pa.ChunkedArray))
    if not is_arrow:
        texts = [_b(t) for t in texts]
    m_max = max((len(p) for p in patterns), default=0)
    from sassy_ray.kernel import native as _nat

    if chunk_len == MULTI_CHUNK_LEN and _nat.available():
        chunk_len = SCAN_CHUNK_LEN_NATIVE
    if chunk_len <= 2 * (m_max + k):
        chunk_len = 2 * (m_max + k) + 64
    overlap = m_max + k
    if is_arrow and not _nat.available():
        # the NumPy fallback builders want bytes rows; the native path below
        # never materializes them
        texts = _nat._arrow_binary(texts).to_pylist()
        is_arrow = False
    P, T = len(patterns), len(texts)
    if is_arrow:
        import pyarrow.compute as pc_

        _tlens = np.asarray(pc_.binary_length(_nat._arrow_binary(texts)))

    def text_len(ti: int) -> int:
        return int(_tlens[ti]) if is_arrow else len(texts[ti])

    pre = None  # (fwd_rows, rc_rows_or_None, owner) from the fused C builder
    if _nat.available():
        rows, owner0 = _nat.chunk_rows_coded(
            texts, chunk_len, overlap, searcher.rc, max(1, P * (2 if searcher.rc else 1)), m_max
        )
        nf = len(owner0)
        if searcher.rc:
            fwd = TextRows(rows.mat[:nf], rows.lens[:nf], rows.codes_ab)
            rcr = TextRows(rows.mat[nf:], rows.lens[nf:], rows.codes_ab)
        else:
            fwd, rcr = rows, None
        pre = (fwd, rcr, owner0)

    def strand_pass(pats: list[bytes], txts: list[bytes], strand: str):
        if pre is not None:
            chunks, owner = (pre[0] if strand == FWD else pre[1]), pre[2]
        else:
            chunks, owner = _build_chunk_rows_tr(txts, overlap, chunk_len)
        got = searcher._cartesian_strand(pats, chunks, k, False, strand)
        out: list[list[list[Match]]] = [[[] for _ in range(T)] for _ in range(P)]
        for (pi, ci), ms in got.items():
            ti, cstart, is_first = owner[ci]
            for mm in ms:
                if not is_first and (mm.text_end if mm.text_end != UNSET else 0) <= overlap:
                    continue
                if mm.text_start != UNSET:
                    mm.text_start += cstart
                if mm.text_end != UNSET:
                    mm.text_end += cstart
                out[pi][ti].append(mm)
        return out

    out = strand_pass(patterns, texts, FWD)
    if searcher.rc:
        comp = [searcher.profile.complement(p) for p in patterns]
        # with the fused builder the reversed rows were already emitted by
        # the same C pass; the python per-text reversal only runs on fallback
        rev = [] if pre is not None else [t[::-1] for t in texts]
        rc = strand_pass(comp, rev, RC)
        for pi in range(P):
            for ti in range(T):
                n = text_len(ti)
                for mm in rc[pi][ti]:
                    s_, e = mm.text_start, mm.text_end
                    mm.text_start = n - e if e != UNSET else UNSET
                    if searcher.without_trace:
                        mm.text_end = UNSET
                    else:
                        mm.text_end = n - s_
                out[pi][ti].extend(rc[pi][ti])
    if searcher.only_best:
        for pi in range(P):
            for ti in range(T):
                if out[pi][ti]:
                    out[pi][ti] = _only_best_per_strand(out[pi][ti], text_len(ti))
    return out


def _only_best_per_strand(ms: list[Match], n: int) -> list[Match]:
    """Per strand: min cost, rightmost STRAND-LOCAL end
    (search.rs:1392-1455; for RC the local end is n - text_start)."""

    def local_end(mm: Match) -> int:
        if mm.strand == FWD:
            return mm.text_end if mm.text_end != UNSET else 0
        return n - mm.text_start if mm.text_start != UNSET else 0

    best: dict[str, Match] = {}
    for mm in ms:
        cur = best.get(mm.strand)
        if cur is None or (mm.cost, -local_end(mm)) < (cur.cost, -local_end(cur)):
            best[mm.strand] = mm
    return [best[s2] for s2 in sorted(best)]


def chunked_search(
    searcher: Searcher, pattern: bytes, texts: list[bytes], k: int, chunk_len: int = SCAN_CHUNK_LEN
) -> list[list[Match]]:
    """Per text, local-minima matches of ``pattern``; long texts are scored
    as many overlapping chunk rows in ONE kernel batch (10-20x faster than
    a single long row, which the batch kernel cannot parallelize over).

    Equals the unchunked search except the reference's own lane-boundary
    artifact: a cost plateau longer than ``m+k`` can shift one local
    minimum at a chunk seam (sassy's lanes restart their walk state the
    same way).  ``filter_fn`` is not supported here (it would see chunk
    prefixes, not text prefixes).
    """
    pattern = _b(pattern)
    texts = [_b(t) for t in texts]
    m = len(pattern)
    from sassy_ray.kernel import native as _nat

    if chunk_len == SCAN_CHUNK_LEN and _nat.available():
        chunk_len = SCAN_CHUNK_LEN_NATIVE
    elif m <= 31 and chunk_len == SCAN_CHUNK_LEN:
        # text-lane packed class — shorter rows only pay off once the row
        # count clears the packed dispatch threshold (strands fuse below)
        from sassy_ray.kernel.myers import PACKED_ROWS_MIN_B

        est_rows = (sum(len(t) for t in texts) // SCAN_CHUNK_LEN_PACKED) * (
            2 if searcher.rc else 1
        )
        if est_rows >= PACKED_ROWS_MIN_B:
            chunk_len = SCAN_CHUNK_LEN_PACKED
    if chunk_len <= 2 * (m + k):
        chunk_len = 2 * (m + k) + 64

    overlap = m + k
    if not searcher.rc:
        if _nat.available():
            # fused C builder: chunk rows + dense remap in one read+write
            # pass (codes_ab marks the matrix pre-remapped for NativeBatch)
            rows, owner = _nat.chunk_rows_coded(texts, chunk_len, overlap, False, 1, m)
            res = searcher._strand_matches([pattern] * len(owner), rows, k, False, FWD)
            out = _collect_chunk_matches(len(texts), owner, res, overlap)
        else:
            out = _chunk_strand(searcher, pattern, texts, k, FWD, chunk_len)
    else:
        # fuse fwd + rc rows into ONE kernel batch: double the batch axis,
        # half the per-step dispatch count of two separate passes
        comp = searcher.profile.complement(pattern)
        if _nat.available():
            # one C pass builds BOTH strands' rows (rc = reversed-text copy
            # fused into the chunk walk) already remapped to dense codes —
            # replaces the per-text t[::-1] bytes, the sliding-window copy
            # and NativeBatch's histogram+remap passes
            fused, f_owner = _nat.chunk_rows_coded(texts, chunk_len, overlap, True, 2, m)
            nf = len(f_owner)
            r_owner = f_owner  # reversed texts share lengths, hence owners
        else:
            rev = [t[::-1] for t in texts]
            # both strands land in ONE preallocated matrix (fwd rows then rc
            # rows — same row count, texts and their reversals are equal-length)
            nf = _chunk_row_count(texts, overlap, chunk_len)
            mat = np.zeros((2 * nf, max(1, chunk_len)), dtype=np.uint8)
            lens = np.zeros(2 * nf, dtype=np.int64)
            f_owner = []
            r_owner = []
            _fill_chunk_rows(texts, overlap, chunk_len, mat, lens, 0, f_owner)
            _fill_chunk_rows(rev, overlap, chunk_len, mat, lens, nf, r_owner)
            fused = TextRows(mat, lens)
        res = searcher._strand_matches(
            [pattern] * nf + [comp] * nf,
            fused,
            k,
            False,
            [FWD] * nf + [RC] * nf,
        )
        out = _collect_chunk_matches(len(texts), f_owner, res[:nf], overlap)
        rc = _collect_chunk_matches(len(texts), r_owner, res[nf:], overlap)
        for ti, ms in enumerate(rc):
            n = len(texts[ti])
            for mm in ms:
                sgn, e = mm.text_start, mm.text_end
                mm.text_start = n - e if e != UNSET else UNSET
                if searcher.without_trace:
                    mm.text_end = UNSET
                else:
                    mm.text_end = n - sgn
            out[ti] = out[ti] + ms
    if searcher.only_best:
        for ti in range(len(out)):
            if out[ti]:
                out[ti] = _only_best_per_strand(out[ti], len(texts[ti]))
    return out
