"""Transposed packed multi-pattern scan: equivalence fuzz vs the per-pair
kernel (the engine's mirror of the reference's v1-vs-v2 equivalence tests,
/root/reference/src/pattern_tiling/search.rs:475-521 — same strategy, new
implementation).

Two layers:
- kernel level: ``packed_scan_minima`` must be bit-identical to running
  ``batch_scan_minima`` per (pattern, text) row;
- surface level: ``Searcher.search_many`` (which dispatches by pattern
  length class: 4x15 / 2x31 transposed scans + the multi-limb cascade)
  must equal the per-pair ``search()`` union across mixed-length pattern
  sets, strands, and builder flags.
"""

from __future__ import annotations

import random

import numpy as np
import pytest

from sassy_ray.kernel.myers import batch_scan_minima
from sassy_ray.kernel.prefilter import (
    LANES1X63,
    LANES2X31,
    LANES4X15,
    PackedPairRows,
    packed_scan_minima,
)
from sassy_ray.kernel.profiles import get_profile
from sassy_ray.kernel.search import Searcher
from sassy_ray.kernel.types import UNSET


def mk(rng: random.Random, n: int, alpha: bytes = b"ACGT") -> bytes:
    return bytes(rng.choice(alpha) for _ in range(n))


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_packed_scan_matches_per_pair_kernel(seed):
    rng = random.Random(seed)
    prof = get_profile("dna")
    for trial in range(120):
        cfg = (LANES4X15, LANES2X31, LANES1X63)[trial % 3]
        P = rng.randint(1, 9)
        T = rng.randint(1, 5)
        k = rng.randint(0, 5)
        pats = [mk(rng, rng.randint(k + 1, cfg.data_bits)) for _ in range(P)]
        texts = [mk(rng, rng.randint(0, 70)) for _ in range(T)]
        all_minima = trial % 3 == 0
        rows_p = [pats[pi] for pi in range(P) for _ in range(T)]
        rows_t = [texts[ti] for _ in range(P) for ti in range(T)]
        bi, bp, bc = batch_scan_minima(rows_p, rows_t, prof, k, all_minima)
        ref = sorted(
            (int(i) // T, int(i) % T, int(p), int(c)) for i, p, c in zip(bi, bp, bc)
        )
        groups = [
            (ti, tuple(range(s, min(P, s + cfg.lanes))))
            for ti in range(T)
            for s in range(0, P, cfg.lanes)
        ]
        packed = PackedPairRows(pats, prof, cfg, groups)
        gi, gt, gp, gc = packed_scan_minima(packed, texts, k, all_minima)
        got = sorted(
            (int(a), int(b), int(p), int(c)) for a, b, p, c in zip(gi, gt, gp, gc)
        )
        assert ref == got, f"trial {trial}: P={P} T={T} k={k} all_minima={all_minima}"


def _match_key(m):
    return (
        m.text_start,
        m.text_end,
        m.pattern_start,
        m.pattern_end,
        m.cost,
        m.strand,
        m.cigar if m.text_start != UNSET else None,
    )


@pytest.mark.parametrize(
    "alphabet,rc", [("dna", True), ("dna", False), ("ascii_ci", False)]
)
def test_search_many_class_dispatch_equivalence(alphabet, rc):
    """search_many (length-class dispatch incl. packed transposed scans)
    equals the per-pair search() union on mixed-length pattern sets."""
    rng = random.Random(hash((alphabet, rc)) & 0xFFFF)
    alpha = b"ACGT" if alphabet == "dna" else b"abcdXY "
    for trial in range(25):
        k = rng.randint(0, 4)
        # force all three classes: small (<=15), mid (16..31), rest (>31)
        lens = [rng.randint(k + 1, 15), rng.randint(16, 31), rng.randint(32, 80)]
        lens += [rng.choice([7, 12, 20, 28, 40]) for _ in range(rng.randint(0, 4))]
        pats = [mk(rng, n, alpha) for n in lens]
        texts = [mk(rng, rng.randint(0, 120), alpha) for _ in range(rng.randint(1, 5))]
        s = Searcher(alphabet, rc=rc)
        many = {}
        for m in s.search_many(pats, texts, k):
            many.setdefault((m.pattern_idx, m.text_idx), []).append(_match_key(m))
        ref = {}
        for pi, p in enumerate(pats):
            for ti, t in enumerate(texts):
                ms = [_match_key(m) for m in s.search(p, t, k)]
                if ms:
                    ref[(pi, ti)] = ms
        assert {k_: sorted(v) for k_, v in many.items()} == {
            k_: sorted(v) for k_, v in ref.items()
        }, f"trial {trial} k={k} lens={lens}"


def test_search_many_flags_equivalence():
    """only_best / without_trace / all-minima grep path stay equivalent
    through the packed dispatch."""
    rng = random.Random(99)
    for flags in ({"only_best_match": True}, {"without_trace": True}, {}):
        for trial in range(10):
            k = rng.randint(0, 3)
            pats = [mk(rng, rng.randint(k + 1, 63)) for _ in range(5)]
            texts = [mk(rng, rng.randint(10, 90)) for _ in range(3)]
            s = Searcher("dna", rc=True, **flags)
            many = {}
            for m in s.search_many(pats, texts, k):
                many.setdefault((m.pattern_idx, m.text_idx), []).append(_match_key(m))
            ref = {}
            for pi, p in enumerate(pats):
                for ti, t in enumerate(texts):
                    ms = [_match_key(m) for m in s.search(p, t, k)]
                    if ms:
                        ref[(pi, ti)] = ms
            assert {a: sorted(b) for a, b in many.items()} == {
                a: sorted(b) for a, b in ref.items()
            }, f"flags={flags} trial={trial}"


def test_packed_degenerate_and_empty():
    """len(p) <= k patterns route through the per-pair path; empty texts and
    empty pattern lists don't crash the packed dispatch."""
    s = Searcher("dna", rc=False)
    pats = [b"AC", b"ACGTACGTACGT"]  # len 2 <= k=2 -> degenerate class
    texts = [b"", b"ACGTACGTACGTACG"]
    many = {}
    for m in s.search_many(pats, texts, 2):
        many.setdefault((m.pattern_idx, m.text_idx), []).append(_match_key(m))
    ref = {}
    for pi, p in enumerate(pats):
        for ti, t in enumerate(texts):
            ms = [_match_key(m) for m in s.search(p, t, 2)]
            if ms:
                ref[(pi, ti)] = ms
    assert {a: sorted(b) for a, b in many.items()} == {
        a: sorted(b) for a, b in ref.items()
    }
    assert s.search_many([], texts, 1) == []
    assert s.search_many(pats, [], 1) == []


def test_search_many_highk_packed63_dispatch():
    """At k > 10 the 32..63-char class routes through the packed 1x63 scan
    (exact-in-scan, no prefilter) — must equal per-pair search()."""
    rng = random.Random(7)
    for trial in range(8):
        k = rng.randint(11, 14)
        lens = [rng.randint(32, 63) for _ in range(4)] + [rng.randint(64, 90)]
        pats = [mk(rng, n) for n in lens]
        texts = [mk(rng, rng.randint(0, 150)) for _ in range(3)]
        s = Searcher("dna", rc=True)
        many = {}
        for m in s.search_many(pats, texts, k):
            many.setdefault((m.pattern_idx, m.text_idx), []).append(_match_key(m))
        ref = {}
        for pi, p in enumerate(pats):
            for ti, t in enumerate(texts):
                ms = [_match_key(m) for m in s.search(p, t, k)]
                if ms:
                    ref[(pi, ti)] = ms
        assert {a: sorted(b) for a, b in many.items()} == {
            a: sorted(b) for a, b in ref.items()
        }, f"trial {trial} k={k} lens={lens}"


@pytest.mark.parametrize("seed", [11, 12])
def test_packed_rows_scan_matches_unpacked_loop(seed, monkeypatch):
    """Text-lane packing (lanes = batch rows, ``packed_rows_scan``) must be
    bit-identical to the unpacked single-limb loop across batch sizes, lane
    widths (4x15 / 2x31 by pattern length), pattern multiplicity, text-length
    skew (per-lane walls), empty texts, k >= m degenerates, and both walk
    modes.  The production dispatch gates on PACKED_ROWS_MIN_B; here both
    paths are forced so small fuzz cases cover the packed code."""
    import sassy_ray.kernel.myers as myers_mod

    rng = random.Random(seed)
    nprng = np.random.default_rng(seed)
    prof_dna = get_profile("dna")
    prof_ascii = get_profile("ascii")

    def norm(r):
        ri, pp, cc = r
        o = np.lexsort((cc, pp, ri))
        return np.stack([ri[o], pp[o], cc[o].astype(np.int64)])

    for trial in range(40):
        prof, alpha = (prof_dna, b"ACGT") if trial % 2 else (prof_ascii, b"abcxyz ")
        B = rng.choice([1, 2, 3, 5, 17, 64, 257])
        m_hi = rng.choice([15, 31])
        n_pats = rng.randint(1, 4)
        pats = [mk(rng, rng.randint(1, m_hi), alpha) for _ in range(n_pats)]
        k = rng.randint(0, 10)
        patterns = [pats[rng.randrange(n_pats)] for _ in range(B)]
        texts = [mk(rng, rng.randint(0, 90), alpha) for _ in range(B)]
        for i in range(0, B, 3):  # planted hits so the walk actually emits
            p, t = patterns[i], bytearray(texts[i])
            if len(t) > len(p) + 2:
                pos = rng.randrange(len(t) - len(p))
                t[pos : pos + len(p)] = p
                texts[i] = bytes(t)
        all_minima = trial % 3 == 0
        monkeypatch.setattr(myers_mod, "PACKED_ROWS_MIN_B", 10**9)
        ref = norm(batch_scan_minima(patterns, texts, prof, k, all_minima))
        monkeypatch.setattr(myers_mod, "PACKED_ROWS_MIN_B", 1)
        got = norm(batch_scan_minima(patterns, texts, prof, k, all_minima))
        assert ref.shape == got.shape and (ref == got).all(), (
            trial,
            B,
            m_hi,
            k,
            all_minima,
        )

    # chunked-scan shape: one pattern, uniform long rows + ragged tails,
    # crossing the internal word-chunk boundary
    pat = bytes(nprng.choice(np.frombuffer(b"ACGT", np.uint8), size=23))
    texts = [
        bytes(nprng.choice(np.frombuffer(b"ACGT", np.uint8), size=n))
        for n in ([512] * 300 + [100, 7, 0, 512, 300])
    ]
    monkeypatch.setattr(myers_mod, "PACKED_ROWS_MIN_B", 10**9)
    ref = norm(batch_scan_minima([pat] * len(texts), texts, prof_dna, 3, False))
    monkeypatch.setattr(myers_mod, "PACKED_ROWS_MIN_B", 1)
    got = norm(batch_scan_minima([pat] * len(texts), texts, prof_dna, 3, False))
    assert ref.shape == got.shape and (ref == got).all()


def test_row_chunk_seam_equivalence(monkeypatch):
    """Force a tiny internal row/word chunk (production: 8192) so every
    chunked scan loop — prefilter_hits, packed_scan_minima, and
    packed_rows_scan — actually crosses its chunk seam in-test: per-chunk
    state resets, per-chunk step counts (length-sorted words stop at the
    CHUNK's max length, not the batch's), and the per-chunk final-position
    rule must compose to the unchunked answer."""
    import sassy_ray.kernel.myers as myers_mod
    import sassy_ray.kernel.prefilter as pf

    rng = random.Random(4242)
    prof = get_profile("dna")
    monkeypatch.setattr(pf, "_PREFILTER_ROW_CHUNK", 3)

    # packed_scan_minima (pattern lanes) vs the unpacked per-row loop
    for trial in range(15):
        cfg = (LANES4X15, LANES2X31)[trial % 2]
        P, T = rng.randint(2, 7), rng.randint(3, 6)
        k = rng.randint(0, 4)
        pats = [mk(rng, rng.randint(k + 1, cfg.data_bits)) for _ in range(P)]
        texts = [mk(rng, rng.randint(0, 70)) for _ in range(T)]
        all_minima = trial % 3 == 0
        rows_p = [pats[pi] for pi in range(P) for _ in range(T)]
        rows_t = [texts[ti] for _ in range(P) for ti in range(T)]
        monkeypatch.setattr(myers_mod, "PACKED_ROWS_MIN_B", 10**9)
        bi, bp, bc = batch_scan_minima(rows_p, rows_t, prof, k, all_minima)
        ref = sorted(
            (int(i) // T, int(i) % T, int(p), int(c)) for i, p, c in zip(bi, bp, bc)
        )
        groups = [
            (ti, tuple(range(s, min(P, s + cfg.lanes))))
            for ti in range(T)
            for s in range(0, P, cfg.lanes)
        ]
        packed = PackedPairRows(pats, prof, cfg, groups)
        gi, gt, gp, gc = packed_scan_minima(packed, texts, k, all_minima)
        got = sorted(
            (int(a), int(b), int(p), int(c)) for a, b, p, c in zip(gi, gt, gp, gc)
        )
        assert ref == got, f"pattern-lane seam trial {trial}"

        # packed_rows_scan (text lanes) across the same seam, skewed lengths
        monkeypatch.setattr(myers_mod, "PACKED_ROWS_MIN_B", 1)
        gi2 = batch_scan_minima(rows_p, rows_t, prof, k, all_minima)
        got2 = sorted(
            (int(i) // T, int(i) % T, int(p), int(c))
            for i, p, c in zip(gi2[0], gi2[1], gi2[2])
        )
        assert ref == got2, f"text-lane seam trial {trial}"

    # surface level: search_many (prefilter_hits seam + packed verify seam)
    monkeypatch.setattr(myers_mod, "PACKED_ROWS_MIN_B", 10**9)
    for trial in range(8):
        k = rng.randint(0, 3)
        pats = [mk(rng, rng.randint(k + 1, 31)) for _ in range(rng.randint(4, 9))]
        texts = [mk(rng, rng.randint(0, 120)) for _ in range(rng.randint(4, 8))]
        s = Searcher("dna", rc=trial % 2 == 0)
        many = {}
        for m in s.search_many(pats, texts, k):
            many.setdefault((m.pattern_idx, m.text_idx), []).append(_match_key(m))
        ref = {}
        for pi, p in enumerate(pats):
            for ti, t in enumerate(texts):
                ms = [_match_key(m) for m in s.search(p, t, k)]
                if ms:
                    ref[(pi, ti)] = ms
        assert {a: sorted(b) for a, b in many.items()} == {
            a: sorted(b) for a, b in ref.items()
        }, f"surface seam trial {trial} k={k}"


def test_packed_rows_pad_lane_inert(monkeypatch):
    """Padding lanes in packed_rows_scan reuse the LAST (shortest) row's
    text codes under an always-match dummy pattern pinned at empty_cost.
    When that duplicated row itself contains matches, the pad lane must not
    re-emit them (exact duplicate rows in the output would follow)."""
    import sassy_ray.kernel.myers as myers_mod

    prof = get_profile("dna")
    pat = b"ACGTACGT"
    # B=3 with 2 lanes -> pad=1; B=5 with 4 lanes -> pad=3.  The SHORTEST
    # text (the one duplicated into pad lanes) carries two exact hits.
    hitty = b"TT" + pat + b"AA" + pat
    for B, pats in ((3, [pat] * 3), (5, [pat] * 5)):
        texts = [b"ACGTACGTACGTACGTACGTACGT"[: 24 - 2 * i] for i in range(B - 1)]
        texts.append(hitty)  # shortest? make it so:
        texts = sorted(texts, key=len, reverse=True)[: B - 1] + [hitty[:20]]
        def norm(r):
            ri, pp, cc = r
            o = np.lexsort((cc, pp, ri))
            return np.stack([ri[o], pp[o], cc[o].astype(np.int64)])

        monkeypatch.setattr(myers_mod, "PACKED_ROWS_MIN_B", 10**9)
        ref = norm(batch_scan_minima(pats, texts, prof, 1, False))
        monkeypatch.setattr(myers_mod, "PACKED_ROWS_MIN_B", 1)
        got = norm(batch_scan_minima(pats, texts, prof, 1, False))
        assert ref.shape == got.shape and (ref == got).all(), (B, ref, got)
