"""Ground-truth O(nm) DP implementation of the reference search semantics.

This module is the oracle every fast kernel is tested against.  It reproduces,
by direct dynamic programming, the observable behavior of the reference
searcher (``/root/reference/src/search.rs``):

* semi-global Sellers DP: free text start, cost at each text end position;
* left/right *overhang*: pattern may extend past either text end at cost
  ``floor(alpha * overhang_len)`` cumulative (cf. ``init_deltas_for_overshoot``
  search.rs:1692-1748 and ``add_overshoot_cost`` search.rs:1274-1282), with
  per-side cap ``max_overhang`` (excess chars cost 1 each) and right extension
  bounded by ``get_overhang_steps = min(m, ceil((k+alpha)/alpha), max_overhang)``
  (search.rs:346-356);
* rightmost-local-minimum end-position selection incl. plateaus and the
  final-position rule (``find_minima_with_overhang``, search.rs:1284-1369;
  ``decreasing`` initialized true, search.rs:1055);
* greedy traceback preferring ``=``/``X`` over ``D`` over ``I``, walking
  backwards (``get_trace``, trace.rs:273-406), over a ``(m+k)``-wide window
  (``fill_len``, search.rs:1375-1390);
* RC search = complement(pattern) vs reversed(text), coordinates flipped to
  forward space, CIGAR kept in pattern direction (search.rs:813-877);
* N-fraction endpoint prefilter + traced filter (n_filter.rs:8-60);
* ``only_best_match`` = minimal cost, ties to the *rightmost* end
  (search.rs:1392-1455), per (pattern, text, strand).
"""

from __future__ import annotations

import math

import numpy as np

from sassy_ray.kernel.profiles import Profile, get_profile
from sassy_ray.kernel.types import FWD, RC, UNSET, Match, cigar_to_string

__all__ = ["OracleSearcher", "dp_matrix", "end_costs", "find_minima", "overhang_steps"]


def overhang_steps(m: int, k: int, alpha: float | None, max_overhang: int | None) -> int:
    """search.rs:346-356."""
    if alpha is None:
        return 0
    steps = min(m, math.ceil((k + alpha) / alpha) if alpha > 0 else m)
    if max_overhang is not None:
        steps = min(steps, max_overhang)
    return steps


def _left_boundary(j: int, alpha: float | None, max_overhang: int | None) -> int:
    """Cost of skipping the first ``j`` pattern chars before the text starts.

    Without overhang: ``j`` (all insertions).  With overhang: floor(j*alpha),
    capped at ``max_overhang`` chars (excess costs 1 each) — cf.
    ``CostMatrix::get`` trace.rs:36-44.
    """
    if alpha is None:
        return j
    mo = max_overhang if max_overhang is not None else j
    return int(math.floor(min(j, mo) * alpha)) + max(0, j - mo)


def dp_matrix(
    pattern: bytes,
    text: bytes,
    profile: Profile,
    alpha: float | None = None,
    max_overhang: int | None = None,
) -> np.ndarray:
    """Full (m+1, n+1) semi-global cost matrix D[j][i]."""
    p = np.frombuffer(pattern, dtype=np.uint8)
    t = np.frombuffer(text, dtype=np.uint8)
    m, n = len(p), len(t)
    D = np.zeros((m + 1, n + 1), dtype=np.int32)
    for j in range(1, m + 1):
        D[j, 0] = _left_boundary(j, alpha, max_overhang)
    if n == 0 or m == 0:
        return D
    match_row = profile.match_matrix[p[:, None], t[None, :]]  # (m, n)
    idx = np.arange(n + 1, dtype=np.int32)
    for j in range(1, m + 1):
        sub = D[j - 1, :-1] + np.where(match_row[j - 1], 0, 1)
        row = np.minimum(sub, D[j - 1, 1:] + 1)
        # the horizontal dependency D[j][i] = min(row[i-1], D[j][i-1]+1)
        # unrolls to D[j][i] = i + min_{h<=i}(w[h] - h)  (prefix-min)
        w = np.empty(n + 1, dtype=np.int32)
        w[0] = D[j, 0]
        w[1:] = row
        D[j] = idx + np.minimum.accumulate(w - idx)
    return D


def end_costs(
    pattern: bytes,
    text: bytes,
    profile: Profile,
    k: int,
    alpha: float | None = None,
    max_overhang: int | None = None,
) -> np.ndarray:
    """Cost of the best alignment ending at each position 0..n+O (inclusive).

    Positions past the text end model right-overhang: cost(n+o) =
    D[m-o][n] + floor(alpha*o) — the wildcard-extension identity of the
    bit-parallel kernel (padding matches everything, so the optimal extension
    is pure diagonal; cf. trace.rs get_trace right-overshoot handling).
    """
    m, n = len(pattern), len(text)
    D = dp_matrix(pattern, text, profile, alpha, max_overhang)
    O = overhang_steps(m, k, alpha, max_overhang)
    costs = np.empty(n + O + 1, dtype=np.int32)
    costs[: n + 1] = D[m, :]
    for o in range(1, O + 1):
        costs[n + o] = D[m - o, n] + int(math.floor(alpha * o))
    return costs


def find_minima(costs: np.ndarray, k: int, all_minima: bool) -> list[tuple[int, int]]:
    """(end_pos, cost) selection — the reference's minima walk
    (search.rs:1284-1369), run over the full cost array."""
    out: list[tuple[int, int]] = []
    max_pos = len(costs) - 1
    if all_minima:
        for pos in range(0, max_pos + 1):
            if costs[pos] <= k:
                out.append((pos, int(costs[pos])))
        return out
    decreasing = True
    prev_cost = int(costs[0])
    prev_pos = 0
    for pos in range(1, max_pos + 1):
        c = int(costs[pos])
        if decreasing and c > prev_cost and prev_cost <= k:
            out.append((prev_pos, prev_cost))
        decreasing = c < prev_cost or (decreasing and c == prev_cost)
        prev_cost, prev_pos = c, pos
    if prev_pos == max_pos and decreasing and prev_cost <= k:
        out.append((prev_pos, prev_cost))
    return out


def traceback(
    pattern: bytes,
    text: bytes,
    end_pos: int,
    profile: Profile,
    k: int,
    alpha: float | None = None,
    max_overhang: int | None = None,
) -> Match:
    """Greedy backward trace from ``end_pos`` (may exceed len(text) under
    overhang).  Window = last ``m+k`` text chars before the end
    (search.rs:1375-1390); left boundary of the window uses the overhang
    costs exactly like the reference ``fill`` (trace.rs:57-104)."""
    m = len(pattern)
    n = len(text)
    fill_len = m + k
    offset = max(0, end_pos - fill_len)
    clamped_end = min(end_pos, n)
    window = text[offset:clamped_end]
    D = dp_matrix(pattern, window, profile, alpha, max_overhang)

    j = m
    i = end_pos - offset
    pattern_start = 0
    pattern_end = m

    overshoot_cost = 0
    if end_pos > n:
        # right overhang: i counts virtual positions past the text end
        # (trace.rs:299-311)
        overshoot = end_pos - n
        pattern_end = m - overshoot
        overshoot_cost = int(math.floor(overshoot * (alpha or 0.0)))
        i -= overshoot
        j -= overshoot

    g = int(D[j, i])
    total_cost = g + overshoot_cost

    ops: list[str] = []
    pb = np.frombuffer(pattern, dtype=np.uint8)
    wb = np.frombuffer(window, dtype=np.uint8)
    while True:
        if j == 0:
            break
        if i == 0 and alpha is not None:
            # left overhang (trace.rs:321-334)
            pattern_start = j
            mo = max_overhang if max_overhang is not None else j
            g -= int(math.floor(min(j, mo) * alpha)) + max(0, j - mo)
            break
        if i > 0 and D[j - 1, i - 1] == g and profile.match_matrix[pb[j - 1], wb[i - 1]]:
            ops.append("=")
            j -= 1
            i -= 1
            continue
        g -= 1
        if i > 0 and D[j - 1, i - 1] == g:
            ops.append("X")
            j -= 1
            i -= 1
            continue
        if i > 0 and D[j, i - 1] == g:
            ops.append("D")
            i -= 1
            continue
        if D[j - 1, i] == g:
            ops.append("I")
            j -= 1
            continue
        raise AssertionError(f"trace failed at j={j} i={i} g={g}")
    assert g == 0, f"remaining cost after trace must be 0, got {g}"
    ops.reverse()
    return Match(
        text_start=offset + i,
        text_end=offset + len(window),
        pattern_start=pattern_start,
        pattern_end=pattern_end,
        cost=total_cost,
        strand=FWD,
        cigar=cigar_to_string(ops),
    )


def _count_n(profile: Profile, text: bytes, start: int, end: int) -> int:
    arr = np.frombuffer(text[start:end], dtype=np.uint8)
    return int(profile.n_lut[arr].sum()) if arr.size else 0


def endpoint_n_ok(
    profile: Profile, end_pos: int, text: bytes, m: int, k: int, max_n_frac: float
) -> bool:
    """n_filter.rs:41-52."""
    end = min(end_pos, len(text))
    start = max(0, end - max(0, m - k))
    if start >= len(text):
        return True
    if end <= start:
        return True
    frac = _count_n(profile, text, start, end) / float(m + k)
    return frac <= max_n_frac


def traced_n_ok(profile: Profile, match: Match, text: bytes, max_n_frac: float) -> bool:
    """n_filter.rs:54-60."""
    if match.text_start >= len(text):
        return True
    if match.text_end <= match.text_start:
        return True
    sl = text[match.text_start : match.text_end]
    frac = _count_n(profile, text, match.text_start, match.text_end) / float(len(sl))
    return frac <= max_n_frac


class OracleSearcher:
    """Reference-semantics searcher via direct DP.  Slow; tests only.

    Mirrors the reference Python binding surface
    (``/root/reference/src/python.rs:27-233``).
    """

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
            rc = False
        self.profile = get_profile(name)
        if alpha is not None and not self.profile.supports_overhang:
            raise ValueError(f"overhang not supported for {name}")
        if alpha is not None and not (0.0 <= alpha <= 1.0):
            raise ValueError("alpha must be in 0.0..=1.0")
        if max_n_frac is not None and max_n_frac == 1.0:
            max_n_frac = None
        self.rc = rc and self.profile.supports_rc
        self.alpha = alpha
        self.max_overhang = max_overhang
        self.max_n_frac = max_n_frac
        self.only_best = only_best_match
        self.without_trace = without_trace

    # -- one strand ---------------------------------------------------------

    def _search_one_strand(
        self,
        pattern: bytes,
        text: bytes,
        k: int,
        all_minima: bool,
        strand: str,
        filter_fn=None,
    ) -> list[Match]:
        m = len(pattern)
        costs = end_costs(pattern, text, self.profile, k, self.alpha, self.max_overhang)
        cands = find_minima(costs, k, all_minima)
        if filter_fn is not None:
            cands = [(e, c) for (e, c) in cands if filter_fn(pattern, text[: min(e, len(text))], strand)]
        if self.max_n_frac is not None:
            cands = [
                (e, c)
                for (e, c) in cands
                if endpoint_n_ok(self.profile, e, text, m, k, self.max_n_frac)
            ]
        if self.only_best and cands:
            # min cost; ties -> rightmost end (search.rs:1392-1455)
            best = min(cands, key=lambda ec: (ec[1], -ec[0]))
            cands = [best]
        out: list[Match] = []
        for end_pos, cost in cands:
            if self.without_trace:
                out.append(
                    Match(
                        text_start=UNSET,
                        text_end=min(end_pos, len(text)),
                        pattern_start=UNSET,
                        pattern_end=m - max(0, end_pos - len(text)),
                        cost=cost,
                        strand=strand,
                    )
                )
            else:
                mt = traceback(
                    pattern, text, end_pos, self.profile, k, self.alpha, self.max_overhang
                )
                # NB the emitted cost comes from the trace window, like the
                # reference (process_matches -> get_trace); the walk cost only
                # selects candidates.
                mt.strand = strand
                out.append(mt)
        if self.max_n_frac is not None and not self.without_trace:
            out = [mm for mm in out if traced_n_ok(self.profile, mm, text, self.max_n_frac)]
        return out

    def _search(
        self, pattern: bytes, text: bytes, k: int, all_minima: bool, filter_fn=None
    ) -> list[Match]:
        matches = self._search_one_strand(pattern, text, k, all_minima, FWD, filter_fn)
        if self.rc:
            comp = self.profile.complement(pattern)
            rtext = text[::-1]
            rc_matches = self._search_one_strand(comp, rtext, k, all_minima, RC, filter_fn)
            n = len(text)
            for mm in rc_matches:
                s, e = mm.text_start, mm.text_end
                mm.text_start = n - e if e != UNSET else UNSET
                if self.without_trace:
                    mm.text_end = UNSET
                else:
                    mm.text_end = n - s
            matches.extend(rc_matches)
        return matches

    # -- public surface -----------------------------------------------------

    def search(self, pattern: bytes, text: bytes, k: int) -> list[Match]:
        return self._search(pattern, text, k, all_minima=False)

    def search_all(self, pattern: bytes, text: bytes, k: int) -> list[Match]:
        return self._search(pattern, text, k, all_minima=True)

    def search_with_fn(
        self, pattern: bytes, text: bytes, k: int, all_minima: bool, filter_fn
    ) -> list[Match]:
        return self._search(pattern, text, k, all_minima, filter_fn)
