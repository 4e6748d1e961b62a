"""Packed suffix prefilter (the engine's take on sassy v2's hierarchical
pattern tiling, ref /root/reference/src/pattern_tiling/general.rs:59-102 —
semantics only; this SWAR construction is original).

Idea: the semi-global cost of a pattern SUFFIX ending at text position p
lower-bounds the full-pattern cost ending at p (the restriction of any
full alignment to the last s pattern chars ends at p and cannot cost more).
So scan cheap 15-char suffixes first and run the full kernel only on
(pattern, text) rows where some position had suffix cost <= k — exact
filtering, no false negatives.

Packing: ``LaneConfig`` lanes per 64-bit word — 4x(15 data bits + guard)
for the cheap first level, 2x(31 data bits + guard) for the longer-suffix
level used at larger k.  Lane independence inside the word-wide Myers
ops is enforced by construction:
- guard bits of Pv are kept 0, so the (Eq & Pv) + Pv carry chain is absorbed
  at each guard (0 + carry -> no carry out);
- Ph/Mh guard bits are cleared before the <<1, so no horizontal signal
  crosses into the next lane's bit 0 (= independent free text start);
- suffixes shorter than 15 are top-aligned (last char at bit 14) with
  always-matching filler rows below, whose deltas provably stay 0.

Lane scores are tracked as packed 4x16-bit counters (cost <= 15 never
carries across lanes); the per-step "any lane <= k" test is one SWAR
compare.  Net element-work ~1/4 of a full per-pattern scan.
"""

from __future__ import annotations

import numpy as np

from sassy_ray.kernel.myers import _ALL_BYTES, _pad_texts
from sassy_ray.kernel.profiles import Profile

__all__ = ["PackedSuffixes", "prefilter_hits", "LANES4X15", "LANES2X31"]

_ONE = np.uint64(1)
_U64 = np.uint64(0xFFFFFFFFFFFFFFFF)


class LaneConfig:
    """SWAR lane geometry: ``lanes`` suffixes per 64-bit word, each in a
    ``lane_bits``-wide lane holding ``lane_bits - 1`` data rows + 1 guard
    bit.  4x15 is the cheapest level (4 suffixes/word); 2x31 doubles the
    suffix length (selective at larger k) at half the packing."""

    def __init__(self, lanes: int, lane_bits: int):
        self.lanes = lanes
        self.lane_bits = lane_bits
        self.data_bits = lane_bits - 1
        guard = 0
        m1 = 0
        for l in range(lanes):
            guard |= 1 << (l * lane_bits + lane_bits - 1)
            m1 |= 1 << (l * lane_bits)
        self.guard = np.uint64(guard)
        self.nguard = np.uint64(~guard & 0xFFFFFFFFFFFFFFFF)
        self.m1 = np.uint64(m1)
        self.shift_last = np.uint64(self.data_bits - 1)
        # unreachable init cost for empty lanes (half the lane range)
        self.empty_cost = 1 << (lane_bits - 2)


LANES4X15 = LaneConfig(4, 16)
LANES2X31 = LaneConfig(2, 32)


class PackedSuffixes:
    """Per-pattern-set packed state: ``peq[w][a]`` words, lane -> pattern map,
    per-word init vectors, and the always-hit set (suffix too short to
    filter at this k)."""

    def __init__(self, patterns: list[bytes], profile: Profile, k: int, cfg: LaneConfig = LANES4X15):
        self.k = k
        self.cfg = cfg
        LANES, LANE_BITS, DATA_BITS = cfg.lanes, cfg.lane_bits, cfg.data_bits
        self.n_patterns = len(patterns)
        self.always_hit: list[int] = []
        packable: list[int] = []
        for i, p in enumerate(patterns):
            if min(DATA_BITS, len(p)) <= k:
                self.always_hit.append(i)
            else:
                packable.append(i)
        self.packable = packable
        self.n_words = -(-len(packable) // LANES) if packable else 0
        W = self.n_words
        self.lane_pattern = np.full((W, LANES), -1, dtype=np.int64)
        self.peq = np.zeros((W, 256), dtype=np.uint64)  # indexed by raw byte
        self.pv_init = np.zeros(W, dtype=np.uint64)
        self.score_init = np.zeros(W, dtype=np.uint64)
        mm = profile.match_matrix
        for slot, pi in enumerate(packable):
            w, lane = divmod(slot, LANES)
            p = patterns[pi]
            sl = min(DATA_BITS, len(p))
            suf = np.frombuffer(p[-sl:], dtype=np.uint8)
            base = lane * LANE_BITS
            self.lane_pattern[w, lane] = pi
            # filler rows (below the suffix): always match, Pv stays 0 — their
            # deltas provably stay 0, so the suffix sees a clean free start
            for j in range(DATA_BITS - sl):
                self.peq[w, :] |= _ONE << np.uint64(base + j)
            # suffix rows, top-aligned: last char at bit base+data_bits-1
            for j in range(sl):
                bit = np.uint64(base + (DATA_BITS - sl) + j)
                match_bytes = _ALL_BYTES[mm[suf[j], _ALL_BYTES]]
                self.peq[w, match_bytes] |= _ONE << bit
            # Pv init: 1 on suffix rows only (column-0 vertical +1 per row)
            lane_sufmask = np.uint64((((1 << sl) - 1) << (DATA_BITS - sl)) << base)
            self.pv_init[w] |= lane_sufmask
            self.score_init[w] |= np.uint64(sl) << np.uint64(base)
        # empty lanes: all-filler (always-match, Pv=0 -> score pinned at its
        # init) with an unreachable init cost, so they never flag a hit and
        # never carry into a neighbor lane
        for w in range(W):
            for lane in range(LANES):
                if self.lane_pattern[w, lane] < 0:
                    base = lane * LANE_BITS
                    for j in range(DATA_BITS):
                        self.peq[w, :] |= _ONE << np.uint64(base + j)
                    self.score_init[w] |= np.uint64(cfg.empty_cost) << np.uint64(base)


def prefilter_hits(
    packed: PackedSuffixes, texts: list[bytes]
) -> np.ndarray:
    """(n_patterns, n_texts) bool: True where the full kernel must run.

    Runs the packed word scan over every (word, text) row; a row is hit when
    any lane's suffix cost drops to <= k at any position.  always_hit
    patterns are True everywhere.
    """
    T = len(texts)
    P = packed.n_patterns
    hits = np.zeros((P, T), dtype=bool)
    if packed.always_hit:
        hits[packed.always_hit, :] = True
    W = packed.n_words
    if W == 0 or T == 0:
        return hits
    k = packed.k

    raw, n_arr_t = _pad_texts(texts)
    txtT = np.ascontiguousarray(raw.T)  # (n_max, T) uint8

    B = W * T
    word_of = np.repeat(np.arange(W), T)          # row -> word
    text_of = np.tile(np.arange(T), W)            # row -> text
    n_arr = n_arr_t[text_of]
    peq_flat = np.ascontiguousarray(packed.peq).reshape(-1)  # (W*256,)
    base = word_of * 256

    cfg = packed.cfg
    NGUARD = cfg.nguard
    SHIFT_LAST = cfg.shift_last
    M1 = cfg.m1
    Pv = packed.pv_init[word_of].copy()
    Mv = np.zeros(B, dtype=np.uint64)
    score = packed.score_init[word_of].copy()
    K1 = np.uint64((k + 1)) * M1
    H = cfg.guard
    hit = np.zeros(B, dtype=bool)

    codes = np.empty(B, np.uint8)
    Eq = np.empty(B, np.uint64)
    Xv = np.empty(B, np.uint64)
    Xh = np.empty(B, np.uint64)
    Ph = np.empty(B, np.uint64)
    Mh = np.empty(B, np.uint64)
    tA = np.empty(B, np.uint64)
    tb = np.empty(B, np.uint64)
    idx = np.empty(B, np.intp)
    sw = np.empty(B, np.uint64)
    m1 = np.empty(B, dtype=bool)
    steps = int(n_arr.max())
    n_min = int(n_arr.min())

    for t in range(steps):
        np.take(txtT[t], text_of, out=codes)
        np.add(base, codes, out=idx)
        np.take(peq_flat, idx, out=Eq)
        np.bitwise_or(Eq, Mv, out=Xv)
        np.bitwise_and(Eq, Pv, out=tA)
        np.add(tA, Pv, out=tA)
        np.bitwise_xor(tA, Pv, out=tA)
        np.bitwise_or(tA, Eq, out=Xh)
        np.bitwise_or(Xh, Pv, out=tb)
        np.invert(tb, out=tb)
        np.bitwise_or(Mv, tb, out=Ph)
        np.bitwise_and(Pv, Xh, out=Mh)
        # packed 4x16 score update from the last data row of each lane
        np.right_shift(Ph, SHIFT_LAST, out=sw)
        np.bitwise_and(sw, M1, out=sw)
        np.add(score, sw, out=score)
        np.right_shift(Mh, SHIFT_LAST, out=sw)
        np.bitwise_and(sw, M1, out=sw)
        np.subtract(score, sw, out=score)
        # lane isolation: no horizontal signal crosses a guard bit
        np.bitwise_and(Ph, NGUARD, out=Ph)
        np.bitwise_and(Mh, NGUARD, out=Mh)
        np.left_shift(Ph, _ONE, out=Ph)
        np.left_shift(Mh, _ONE, out=Mh)
        np.bitwise_or(Xv, Ph, out=tb)
        np.invert(tb, out=tb)
        np.bitwise_or(Mh, tb, out=Pv)
        np.bitwise_and(Pv, NGUARD, out=Pv)
        np.bitwise_and(Ph, Xv, out=Mv)
        # SWAR "any lane <= k": (lane | 0x8000) - (k+1) clears bit15 iff <= k
        np.bitwise_or(score, H, out=sw)
        np.subtract(sw, K1, out=sw)
        np.invert(sw, out=sw)
        np.bitwise_and(sw, H, out=sw)
        np.not_equal(sw, 0, out=m1)
        if t >= n_min:
            np.logical_and(m1, n_arr > t, out=m1)
        np.logical_or(hit, m1, out=hit)

    # expand word-level hits to their lanes' patterns
    hitWT = hit.reshape(W, T)
    for w in range(W):
        for lane in range(cfg.lanes):
            pi = packed.lane_pattern[w, lane]
            if pi >= 0:
                hits[pi] |= hitWT[w]
    return hits
