"""Enumerate *all* distinct alignments of cost <= k per end anchor.

Reproduces ``/root/reference/src/alignment_iterator.rs``: anchors come from
``search_all`` (without trace); nearby anchors are grouped into windows; a DP
matrix is filled per window; a DFS walks back from each anchor enumerating
every distinct <=k alignment, with the reference's pruning rules:

- no leading or trailing deletions (alignment_iterator.rs:255-259);
- an indel may not *leave* a diagonal extendable by exact matches to the top
  (":296-300"), nor *enter* a diagonal reachable by exact matches from the
  last visit or the bottom (":302-320") — this is the homopolymer dedup;
- no mixing of net insertions and deletions since the last match (":322-327");
- edges explored in order of total path cost, ties preferring match/sub.
"""

from __future__ import annotations

import enum

import numpy as np

from sassy_ray.kernel import oracle
from sassy_ray.kernel.profiles import Profile
from sassy_ray.kernel.types import FWD, RC, Match, cigar_to_string

__all__ = ["Continuation", "iterate_all_alignments", "search_all_alignments"]


class Continuation(enum.Enum):
    """DFS flow control returned by an ``iterate_all_alignments`` callback
    (reference ``alignment_iterator.rs:16-23``).

    - CONTINUE: keep exploring the subtree.
    - PRUNE: skip the subtree of alignments extending the current one.
    - BREAK: done with the current end position, move to the next anchor.
    """

    CONTINUE = 0
    PRUNE = 1
    BREAK = 2


def _ranges(ends: list[int], width: int) -> list[tuple[int, int]]:
    out = []
    if not ends:
        return out
    first = max(0, ends[0] - width)
    last = ends[0]
    for e in ends[1:]:
        if e <= last + width:
            last = e
        else:
            out.append((first, last))
            first = max(0, e - width)
            last = e
    out.append((first, last))
    return out


def _is_match_slice(profile: Profile, pat: bytes, txt: bytes) -> bool:
    if len(pat) != len(txt):
        return False
    if not pat:
        return True
    a = np.frombuffer(pat, dtype=np.uint8)
    b = np.frombuffer(txt, dtype=np.uint8)
    return bool(profile.match_matrix[a, b].all())


def _net_insertions_since_last_match(ops: list[str]) -> int:
    net = 0
    for op in reversed(ops):
        if op == "=":
            break
        if op == "I":
            net += 1
        elif op == "D":
            net -= 1
    return net


def _enumerate_one_strand(
    profile: Profile,
    pattern: bytes,
    text: bytes,
    k: int,
    ends: list[int],
    emit,
    partial_matches: bool = False,
) -> None:
    """DFS-enumerate alignments for the given end positions (strand-local
    coords), firing ``emit(complete, match) -> Continuation`` at every
    complete alignment (and at every visited DFS state when
    ``partial_matches``); PRUNE skips the current subtree, BREAK moves to the
    next end anchor (reference ``alignment_iterator.rs:239-368``)."""
    m = len(pattern)
    width = k + m
    last_row_in_diag: dict[int, int] = {}

    for r0, r1 in _ranges(sorted(set(ends)), width):
        window = text[r0:r1]
        D = oracle.dp_matrix(pattern, window, profile, None, None)
        last_row_in_diag.clear()

        def dfs(tpos: int, ppos: int, cost: int, ops: list[str], text_end: int) -> Continuation:
            # ops is reversed (end->start); full match when ppos == 0
            full = ppos == 0
            if full or partial_matches:
                cont = emit(
                    full,
                    Match(
                        text_start=tpos,
                        text_end=text_end,
                        pattern_start=ppos,
                        pattern_end=m,
                        cost=cost,
                        strand=FWD,
                        cigar=cigar_to_string(ops[::-1]),
                    ),
                )
                if cont is Continuation.PRUNE:
                    return Continuation.CONTINUE
                if cont is Continuation.BREAK:
                    return Continuation.BREAK
            if full:
                return Continuation.CONTINUE
            edges = []
            for base_op in ("M", "D", "I"):
                if base_op == "D" and (ppos == 0 or ppos == m):
                    continue
                dt = 1 if base_op in ("M", "D") else 0
                dp = 1 if base_op in ("M", "I") else 0
                nt, np_ = tpos - dt, ppos - dp
                if nt < r0 or np_ < 0:
                    continue
                op = base_op
                if base_op == "M":
                    if profile.match_matrix[pattern[np_], text[nt]]:
                        op = "="
                        ec = 0
                    else:
                        op = "X"
                        ec = 1
                else:
                    ec = 1
                total = cost + ec + int(D[np_, nt - r0])
                if total > k:
                    continue
                if base_op in ("D", "I"):
                    # leave-diagonal filter
                    pat_slice = pattern[:ppos]
                    ts = max(tpos - ppos, 0)
                    if _is_match_slice(profile, pat_slice, text[ts:tpos]):
                        continue
                    # enter-diagonal filter
                    diag = nt + m - np_
                    last = last_row_in_diag.get(diag, m)
                    pslice = pattern[np_:last]
                    tend = nt + len(pslice)
                    if tend <= len(text) and _is_match_slice(
                        profile, pslice, text[nt:tend]
                    ):
                        continue
                    net = _net_insertions_since_last_match(ops)
                    if (base_op == "I" and net < 0) or (base_op == "D" and net > 0):
                        continue
                edges.append((total, 0 if op in ("=", "X") else 1, op, ec, nt, np_))
            edges.sort(key=lambda e: e[0])  # stable: M/Sub first on ties
            for total, _pref, op, ec, nt, np_ in edges:
                diag = nt + m - np_
                old = last_row_in_diag.get(diag, m)
                last_row_in_diag[diag] = np_
                ops.append(op)
                cont = dfs(nt, np_, cost + ec, ops, text_end)
                ops.pop()
                if old == m:
                    last_row_in_diag[diag] = m
                else:
                    last_row_in_diag[diag] = old
                if cont is Continuation.BREAK:
                    return Continuation.BREAK
            return Continuation.CONTINUE

        for e in range(r0, r1 + 1):
            if e - r0 >= D.shape[1]:
                continue
            if D[m, e - r0] > k:
                continue
            last_row_in_diag.clear()
            dfs(e, m, 0, [], e)  # BREAK aborts this anchor only


def iterate_all_alignments(
    searcher,
    pattern: bytes,
    text: bytes,
    k: int,
    matches: list[Match] | None = None,
    partial_matches: bool = False,
    callback=None,
) -> None:
    """Iterate all alignments of cost <= k for all end positions of the given
    anchor ``matches`` (from ``search_all`` without trace; computed here when
    None), firing ``callback(complete: bool, match: Match) -> Continuation``
    (reference ``alignment_iterator.rs:43-105`` + ``Continuation`` at
    ``:16-23``).  When ``partial_matches``, the callback also fires for every
    visited DFS state with ``complete=False``.  RC matches are enumerated on
    the reversed text with the complemented pattern and translated back to
    forward-text coordinates before the callback fires.  A callback returning
    None is treated as CONTINUE."""
    if callback is None:
        raise TypeError("iterate_all_alignments requires a callback")
    if searcher.alpha is not None:
        raise ValueError("Tracing all alignments with overhang is not yet implemented.")
    profile = searcher.profile
    n = len(text)

    if matches is None:
        from sassy_ray.kernel.search import Searcher

        anchor_s = Searcher.__new__(Searcher)
        anchor_s.__dict__.update(searcher.__dict__)
        anchor_s.without_trace = True
        anchor_s.only_best = False
        anchor_s.max_n_frac = None
        matches = anchor_s._pair_matches([pattern], [text], k, all_minima=True)[0]

    fwd_ends = [mm.text_end for mm in matches if mm.strand == FWD]
    rc_starts = [mm.text_start for mm in matches if mm.strand == RC]

    def emit_fwd(full: bool, mm: Match) -> Continuation:
        return callback(full, mm) or Continuation.CONTINUE

    _enumerate_one_strand(profile, pattern, text, k, fwd_ends, emit_fwd, partial_matches)

    if rc_starts:
        comp = profile.complement(pattern)
        rev = text[::-1]
        rc_ends = sorted(n - s for s in rc_starts)

        def emit_rc(full: bool, mm: Match) -> Continuation:
            s, e = mm.text_start, mm.text_end
            mm.text_start = n - e
            mm.text_end = n - s
            mm.strand = RC
            return callback(full, mm) or Continuation.CONTINUE

        _enumerate_one_strand(profile, comp, rev, k, rc_ends, emit_rc, partial_matches)


def search_all_alignments(searcher, pattern: bytes, text: bytes, k: int) -> list[list[Match]]:
    flat: list[Match] = []

    def collect(full: bool, mm: Match) -> Continuation:
        flat.append(mm)
        return Continuation.CONTINUE

    iterate_all_alignments(searcher, pattern, text, k, callback=collect)

    if searcher.max_n_frac is not None:
        flat = [
            mm for mm in flat if oracle.traced_n_ok(searcher.profile, mm, text, searcher.max_n_frac)
        ]

    # group by anchor (strand, end for fwd / start for rc), preserving order
    groups: list[list[Match]] = []
    key = None
    for mm in flat:
        kk = (mm.strand, mm.text_end if mm.strand == FWD else mm.text_start)
        if kk != key:
            groups.append([])
            key = kk
        groups[-1].append(mm)
    return groups
