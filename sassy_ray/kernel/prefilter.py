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

__all__ = [
    "PackedSuffixes",
    "prefilter_hits",
    "LANES4X15",
    "LANES2X31",
    "LANES1X63",
    "PackedPairRows",
    "packed_scan_minima",
    "packed_rows_scan",
    "get_packed_suffixes",
]

_ONE = np.uint64(1)
_U64 = np.uint64(0xFFFFFFFFFFFFFFFF)
# row-axis chunk for the packed scans: ~13 uint64 state/temp arrays per row
# (~104 B) must stay L2-resident; 8192 rows ~ 850 KB (see prefilter_hits)
_PREFILTER_ROW_CHUNK = 8192

# per-process cache of TEXT-INDEPENDENT packed pattern state (suffix words,
# per-pattern lane columns).  A scan stage calls search_many once per Ray
# batch with the SAME pattern set every time (demux: 96 barcodes x 2 strands
# x thousands of batches); rebuilding the packed words per batch was ~40% of
# a 256-read batch's wall time.  Keyed by the pattern bytes themselves —
# correctness never depends on the cache.
_PACK_CACHE: dict = {}
_PACK_CACHE_MAX = 64


def _pack_cached(key, build):
    hit = _PACK_CACHE.get(key)
    if hit is None:
        hit = build()
        if len(_PACK_CACHE) >= _PACK_CACHE_MAX:
            _PACK_CACHE.clear()
        _PACK_CACHE[key] = hit
    return hit


def get_packed_suffixes(patterns: list[bytes], profile, k: int, cfg) -> "PackedSuffixes":
    """Cached ``PackedSuffixes`` constructor (see ``_PACK_CACHE``)."""
    key = ("suf", profile.name, k, cfg.lanes, cfg.lane_bits, tuple(patterns))
    return _pack_cached(key, lambda: PackedSuffixes(patterns, profile, k, cfg))


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
# 1 lane x 63 data bits: the packed-exact path for 32..63-char patterns
# (the reference sizes its limb type by pattern length the same way,
# ref /root/reference/src/pattern_tiling/backend.rs:110-127 — u8/u16/u32/u64).
# One pattern per word, but the scan still shares text padding, the fused
# minima walk, the per-worker pattern-state cache, and skips the
# prefilter+verify double pass at k >= 4 where hit fractions are high.
LANES1X63 = LaneConfig(1, 64)


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
    n_all = n_arr_t[text_of]
    peq_flat = np.ascontiguousarray(packed.peq).reshape(-1)  # (W*256,)
    base_all = word_of * 256

    cfg = packed.cfg
    NGUARD = cfg.nguard
    SHIFT_LAST = cfg.shift_last
    M1 = cfg.m1
    K1 = np.uint64((k + 1)) * M1
    H = cfg.guard
    hitbits = np.zeros(B, dtype=np.uint64)  # per-LANE hit guard bits
    _Z = np.uint64(0)

    # row-axis chunking: the ~13 per-row uint64 state/temp arrays are ~104
    # B/row — at B in the tens of thousands (a 96-pattern x 2048-text demux
    # batch is 49k rows) the working set leaves L2 and every one of the ~27
    # ops/step streams from DRAM.  8192 rows ~ 850 KB stays resident
    # (measured 1.9x on the demux scan); same economics as the scorer's
    # 2048-row full-kernel cap (CLAUDE.md).
    CHUNK = _PREFILTER_ROW_CHUNK
    for c0 in range(0, B, CHUNK):
        c1 = min(B, c0 + CHUNK)
        Bc = c1 - c0
        text_of_c = text_of[c0:c1]
        base = base_all[c0:c1]
        n_arr = n_all[c0:c1]
        Pv = packed.pv_init[word_of[c0:c1]].copy()
        Mv = np.zeros(Bc, dtype=np.uint64)
        score = packed.score_init[word_of[c0:c1]].copy()
        hb = hitbits[c0:c1]

        codes = np.empty(Bc, np.uint8)
        Eq = np.empty(Bc, np.uint64)
        Xv = np.empty(Bc, np.uint64)
        Xh = np.empty(Bc, np.uint64)
        Ph = np.empty(Bc, np.uint64)
        Mh = np.empty(Bc, np.uint64)
        tA = np.empty(Bc, np.uint64)
        tb = np.empty(Bc, np.uint64)
        idx = np.empty(Bc, np.intp)
        sw = np.empty(Bc, np.uint64)
        steps = int(n_arr.max())
        n_min = int(n_arr.min())

        for t in range(steps):
            np.take(txtT[t], text_of_c, out=codes)
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
            # SWAR per-lane "<= k": (lane | 0x8000) - (k+1) clears bit15 iff
            # <= k; accumulate the guard bits so each LANE keeps its own hit
            # flag (a word-level any-lane test would flag all 4 packed
            # patterns on one lane's hit — up to 4x false verifies downstream)
            np.bitwise_or(score, H, out=sw)
            np.subtract(sw, K1, out=sw)
            np.invert(sw, out=sw)
            np.bitwise_and(sw, H, out=sw)
            if t >= n_min:
                np.copyto(sw, _Z, where=n_arr <= t)
            np.bitwise_or(hb, sw, out=hb)

    # expand per-lane hit bits to their patterns
    hitWT = hitbits.reshape(W, T)
    for w in range(W):
        for lane in range(cfg.lanes):
            pi = packed.lane_pattern[w, lane]
            if pi >= 0:
                gbit = np.uint64(1 << (lane * cfg.lane_bits + cfg.lane_bits - 1))
                hits[pi] |= (hitWT[w] & gbit) != 0
    return hits


# ---------------------------------------------------------------------------
# transposed multi-pattern verify: packed full-pattern scan + fused walk
# ---------------------------------------------------------------------------


def _pattern_lane_cols(patterns: list[bytes], profile: Profile, cfg: LaneConfig):
    """Per pattern, its lane-0 packed state: PEQ byte columns (256,) uint64
    over ``data_bits`` rows (filler below, pattern top-aligned — identical
    construction to ``PackedSuffixes``), Pv-init mask and init score.  When
    ``len(p) <= data_bits`` the packed rows hold the WHOLE pattern, so lane
    scores are the exact full-pattern semi-global costs."""
    U = len(patterns)
    DB = cfg.data_bits
    # PackedPairRows/packed_scan_minima advertise EXACT full-pattern costs;
    # a pattern longer than the lane would silently truncate to its suffix
    # (a lower bound, not the cost) — fail loudly instead.  Suffix-filter
    # packing (PackedSuffixes) has its own construction and never gets here.
    too_long = [len(p) for p in patterns if len(p) > DB]
    if too_long:
        raise ValueError(
            f"pattern length {max(too_long)} exceeds lane data_bits={DB}; "
            "packed lane costs would be suffix lower bounds, not exact"
        )
    peq0 = np.zeros((U, 256), dtype=np.uint64)
    pv0 = np.empty(U, dtype=np.uint64)
    s0 = np.empty(U, dtype=np.uint64)
    mm = profile.match_matrix
    for i, p in enumerate(patterns):
        sl = min(DB, len(p))
        suf = np.frombuffer(p[-sl:], dtype=np.uint8)
        # filler rows below the pattern: always match (deltas provably 0)
        if sl < DB:
            peq0[i, :] |= np.uint64((1 << (DB - sl)) - 1)
        for j in range(sl):
            bit = np.uint64((DB - sl) + j)
            match_bytes = _ALL_BYTES[mm[suf[j], _ALL_BYTES]]
            peq0[i, match_bytes] |= _ONE << bit
        pv0[i] = np.uint64((((1 << sl) - 1) << (DB - sl)))
        s0[i] = np.uint64(sl)
    return peq0, pv0, s0


class PackedPairRows:
    """Lane-packed (pattern-group, text) rows for the transposed
    multi-pattern scan: each 64-bit row scans ONE text with up to
    ``cfg.lanes`` patterns updated per char (the engine's take on sassy v2's
    transposed verify, ref /root/reference/src/pattern_tiling/tqueries.rs:53-151
    and backend.rs:110-127 — semantics only, this SWAR construction is
    original).  Identical pattern groups are deduped into shared PEQ combos
    (a full cartesian has only ceil(P/lanes) distinct combos regardless of
    text count).

    ``groups`` is a list of ``(text_idx, (pattern_idx, ...))`` with at most
    ``cfg.lanes`` patterns per group; pattern indices refer to ``patterns``.
    """

    def __init__(
        self,
        patterns: list[bytes],
        profile: Profile,
        cfg: LaneConfig,
        groups: list[tuple[int, tuple[int, ...]]],
    ):
        self.cfg = cfg
        LANES, LB = cfg.lanes, cfg.lane_bits
        R = len(groups)
        self.text_of = np.fromiter((g[0] for g in groups), dtype=np.int64, count=R)
        combo_of: dict[tuple[int, ...], int] = {}
        combo_id = np.empty(R, dtype=np.intp)
        for r, (_ti, pats) in enumerate(groups):
            combo_id[r] = combo_of.setdefault(tuple(pats), len(combo_of))
        self.combo_id = combo_id
        C = len(combo_of)
        combos = list(combo_of)

        # per-pattern lane-0 columns, built once per unique pattern and
        # cached per process (text-independent; see _PACK_CACHE)
        used = sorted({pi for c in combos for pi in c})
        uidx = {pi: j for j, pi in enumerate(used)}
        upats = [patterns[pi] for pi in used]
        peq0, pv0, s0 = _pack_cached(
            ("lanecols", profile.name, cfg.lanes, cfg.lane_bits, tuple(upats)),
            lambda: _pattern_lane_cols(upats, profile, cfg),
        )

        self.lane_pattern = np.full((C, LANES), -1, dtype=np.int64)
        self.peq = np.zeros((C, 256), dtype=np.uint64)
        self.pv_init = np.zeros(C, dtype=np.uint64)
        self.score_init = np.zeros(C, dtype=np.uint64)
        fill = np.uint64((1 << cfg.data_bits) - 1)
        for c, pats in enumerate(combos):
            for l in range(LANES):
                base = np.uint64(l * LB)
                if l < len(pats):
                    j = uidx[pats[l]]
                    self.lane_pattern[c, l] = pats[l]
                    self.peq[c] |= peq0[j] << base
                    self.pv_init[c] |= pv0[j] << base
                    self.score_init[c] += s0[j] << base
                else:
                    # empty lane: all-filler, pinned at an unreachable cost
                    self.peq[c] |= fill << base
                    self.score_init[c] += np.uint64(cfg.empty_cost) << base


def packed_scan_minima(
    packed: PackedPairRows, texts: list[bytes], k: int, all_minima: bool
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Packed scan with the reference minima walk FUSED into the SWAR loop:
    per step, the walk state (prev cost, weakly-decreasing flag, emit) lives
    in the lanes' guard bits — one compare per word covers all lanes.

    Bit-for-bit equivalent to running ``myers.batch_scan_minima`` on each
    (pattern, text) row separately (pinned by the packed-equivalence fuzz
    suite); element work is divided by the lane count instead.

    Returns ``(pattern_idx, text_idx, end_pos, cost)`` arrays in walk order
    (ascending end position per pair).
    """
    cfg = packed.cfg
    assert k + 1 < (1 << (cfg.lane_bits - 1)), "k too large for lane width"

    R = len(packed.text_of)
    empty = (
        np.zeros(0, dtype=np.int64),
        np.zeros(0, dtype=np.int64),
        np.zeros(0, dtype=np.int64),
        np.zeros(0, dtype=np.int32),
    )
    if R == 0:
        return empty
    raw, n_all = _pad_texts(texts)
    txtT = np.ascontiguousarray(raw.T)  # (n_max, T)
    peq_flat = np.ascontiguousarray(packed.peq).reshape(-1)

    # sparse emit records: (row_idx array, emit guard bits, packed costs, pos)
    records: list[tuple[np.ndarray, np.ndarray, np.ndarray, int]] = []

    # row-axis chunking: ~17 uint64 state/temp arrays per row (~136 B) —
    # keep them L2-resident (same economics as prefilter_hits)
    CHUNK = _PREFILTER_ROW_CHUNK
    for c0 in range(0, R, CHUNK):
        c1 = min(R, c0 + CHUNK)
        _packed_scan_chunk(
            packed, txtT, n_all, k, all_minima, peq_flat, c0, c1, records
        )

    return _decode_packed_records(packed, records, empty, cfg)


def _packed_scan_chunk(
    packed: PackedPairRows,
    txtT: np.ndarray,
    n_all: np.ndarray,
    k: int,
    all_minima: bool,
    peq_flat: np.ndarray,
    c0: int,
    c1: int,
    records: list,
) -> None:
    cfg = packed.cfg
    H, NGUARD, M1 = cfg.guard, cfg.nguard, cfg.m1
    SHIFT_LAST = cfg.shift_last
    K1 = np.uint64(k + 1) * M1
    BIGPACK = np.uint64(cfg.empty_cost) * M1
    R = c1 - c0
    text_of = packed.text_of[c0:c1]
    n_arr = n_all[text_of]
    combo_id = packed.combo_id[c0:c1]
    base = combo_id * 256

    Pv = packed.pv_init[combo_id].copy()
    Mv = np.zeros(R, dtype=np.uint64)
    score = packed.score_init[combo_id].copy()
    prev = score.copy()
    dec = np.full(R, H, dtype=np.uint64)  # walk starts weakly-decreasing

    if all_minima:
        le0 = np.bitwise_and(np.invert(np.bitwise_or(prev, H) - K1), H)
        rows0 = np.nonzero(le0)[0]
        if len(rows0):
            records.append((rows0 + c0, le0[rows0], prev[rows0], 0))

    codes = np.empty(R, np.uint8)
    Eq = np.empty(R, np.uint64)
    Xv = np.empty(R, np.uint64)
    Xh = np.empty(R, np.uint64)
    Ph = np.empty(R, np.uint64)
    Mh = np.empty(R, np.uint64)
    tA = np.empty(R, np.uint64)
    tb = np.empty(R, np.uint64)
    idx = np.empty(R, np.intp)
    sw = np.empty(R, np.uint64)
    ceff = np.empty(R, np.uint64)
    ga = np.empty(R, np.uint64)
    gb = np.empty(R, np.uint64)
    emit = np.empty(R, np.uint64)
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
        # packed score update from the last data row of each lane
        np.right_shift(Ph, SHIFT_LAST, out=sw)
        np.bitwise_and(sw, M1, out=sw)
        np.add(score, sw, out=score)
        np.right_shift(Mh, SHIFT_LAST, out=sw)
        np.bitwise_and(sw, M1, out=sw)
        np.subtract(score, sw, out=score)
        # lane isolation across the guard bits
        np.bitwise_and(Ph, NGUARD, out=Ph)
        np.bitwise_and(Mh, NGUARD, out=Mh)
        np.left_shift(Ph, _ONE, out=Ph)
        np.left_shift(Mh, _ONE, out=Mh)
        np.bitwise_or(Xv, Ph, out=tb)
        np.invert(tb, out=tb)
        np.bitwise_or(Mh, tb, out=Pv)
        np.bitwise_and(Pv, NGUARD, out=Pv)
        np.bitwise_and(Ph, Xv, out=Mv)
        # ---- fused walk at position p = t+1 (lanes in guard bits) ----
        if t < n_min:
            c = score
        else:
            np.copyto(ceff, score)
            np.copyto(ceff, BIGPACK, where=n_arr <= t)  # p > n: rising wall
            c = ceff
        if all_minima:
            # emit where c <= k (wall makes past-end lanes fail the test)
            np.bitwise_or(c, H, out=sw)
            np.subtract(sw, K1, out=sw)
            np.invert(sw, out=sw)
            np.bitwise_and(sw, H, out=emit)
            rows = np.nonzero(emit)[0]
            if len(rows):
                records.append((rows + c0, emit[rows], c[rows].copy(), t + 1))
        else:
            # walk gate (same argument as myers.batch_scan_minima /
            # packed_rows_scan): when no lane's prev is <= k, emission is
            # impossible this step and dec may be reset to "decreasing" —
            # any re-entry to <= k is a strict decrease, which re-derives
            # dec=1 — so the full SWAR walk collapses to this 4-op test on
            # the common all-above-k steps
            np.bitwise_or(prev, H, out=sw)
            np.subtract(sw, K1, out=gb)
            np.invert(gb, out=gb)
            np.bitwise_and(gb, H, out=gb)  # le: prev <= k
            if not gb.any():
                np.copyto(dec, H)
                np.copyto(prev, c)
                continue
            # emit = dec & (prev < c) & (prev <= k)
            np.subtract(sw, c, out=ga)  # guard set iff prev >= c
            np.invert(ga, out=ga)
            np.bitwise_and(ga, H, out=ga)  # gt: prev < c
            np.bitwise_and(ga, gb, out=emit)
            np.bitwise_and(emit, dec, out=emit)
            rows = np.nonzero(emit)[0]
            if len(rows):
                records.append((rows + c0, emit[rows], prev[rows].copy(), t))
            # dec' = lt | (dec & eq);  lt = c < prev, eq = ~(lt | gt)
            np.bitwise_or(c, H, out=sw)
            np.subtract(sw, prev, out=sw)
            np.invert(sw, out=sw)
            np.bitwise_and(sw, H, out=sw)  # lt
            np.bitwise_or(sw, ga, out=gb)
            np.invert(gb, out=gb)
            np.bitwise_and(gb, H, out=gb)  # eq
            np.bitwise_and(dec, gb, out=dec)
            np.bitwise_or(dec, sw, out=dec)
        np.copyto(prev, c)

    if not all_minima:
        # final-position rule for rows whose text ends at the global last step
        np.bitwise_or(prev, H, out=sw)
        np.subtract(sw, K1, out=sw)
        np.invert(sw, out=sw)
        np.bitwise_and(sw, H, out=sw)
        np.bitwise_and(sw, dec, out=sw)
        np.copyto(sw, np.uint64(0), where=n_arr != steps)
        rows = np.nonzero(sw)[0]
        if len(rows):
            records.append((rows + c0, sw[rows], prev[rows].copy(), steps))


def _decode_packed_records(packed: PackedPairRows, records: list, empty, cfg: LaneConfig):
    LANES, LB = cfg.lanes, cfg.lane_bits
    data_mask = np.uint64((1 << (LB - 1)) - 1)
    if not records:
        return empty
    # decode lane guard bits -> (pattern_idx, text_idx, pos, cost)
    all_rows = np.concatenate([r for r, _, _, _ in records])
    all_emit = np.concatenate([e for _, e, _, _ in records])
    all_cost = np.concatenate([cw for _, _, cw, _ in records])
    all_pos = np.concatenate(
        [np.full(len(r), p, dtype=np.int64) for r, _, _, p in records]
    )
    lane_pat = packed.lane_pattern[packed.combo_id[all_rows]]  # (N, LANES)
    out_pi, out_ti, out_pos, out_cost = [], [], [], []
    for l in range(LANES):
        gbit = np.uint64(1 << (l * LB + LB - 1))
        sel = (all_emit & gbit) != 0
        if not sel.any():
            continue
        out_pi.append(lane_pat[sel, l])
        out_ti.append(packed.text_of[all_rows[sel]])
        out_pos.append(all_pos[sel])
        out_cost.append(
            ((all_cost[sel] >> np.uint64(l * LB)) & data_mask).astype(np.int32)
        )
    pi = np.concatenate(out_pi)
    ti = np.concatenate(out_ti)
    pos = np.concatenate(out_pos)
    cost = np.concatenate(out_cost)
    # walk order per pair: records are step-ordered but lanes were decoded
    # lane-major — restore (pair, pos) order with a stable sort
    order = np.lexsort((pos, ti, pi))
    return pi[order], ti[order], pos[order], cost[order]


# ---------------------------------------------------------------------------
# text-lane packed scan: lanes = batch ROWS (pattern[i] vs text[i])
# ---------------------------------------------------------------------------


def packed_rows_scan(
    patterns: list[bytes],
    raw: np.ndarray,
    n_arr: np.ndarray,
    profile: Profile,
    k: int,
    all_minima: bool,
    cfg: LaneConfig,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fused scan + reference walk with ``cfg.lanes`` BATCH ROWS packed per
    64-bit word — the dual of ``packed_scan_minima``: there lanes share one
    text and hold different patterns (the many-pattern demux shape); here
    lanes hold different (pattern, text) rows, so FEW-pattern scans (the
    reference's flagship single-query text tiling, sassy v1) stop wasting
    49 of 64 state bits per row.  Per step the PEQ gather runs once per
    lane from pre-shifted per-pattern tables and the words are OR-combined;
    every other SWAR op runs on ``B/lanes`` words instead of ``B`` rows.

    Per-lane text-length walls: a lane's text ending at n forces its cost
    to the lane's data mask from position n+1 on (event-driven OR into a
    per-word wall mask), which makes the walk emit the pending minimum at
    n exactly like the per-row _BIG wall in ``myers.batch_scan_minima``.

    Walk gate: on steps where no lane's prev cost is <= k, emission is
    impossible and dec-state can be reset to "decreasing" (any re-entry to
    <= k is a strict decrease, which re-derives dec=true), so the ~17-op
    SWAR walk collapses to a 4-op test — the common case in scans, where
    random-text costs hover well above k.

    Bit-for-bit equivalent to ``myers.batch_scan_minima`` (pinned by the
    packed-equivalence fuzz suite).  Returns (row_idx, end_pos, cost)
    sorted by (row, pos).
    """
    B = len(patterns)
    empty = (
        np.zeros(0, dtype=np.int64),
        np.zeros(0, dtype=np.int64),
        np.zeros(0, dtype=np.int32),
    )
    if B == 0:
        return empty
    LN, LB, DB = cfg.lanes, cfg.lane_bits, cfg.data_bits
    assert k + 1 < (1 << (LB - 1)), "k too large for lane width"
    assert k < cfg.empty_cost, "k too large for the padding-lane sentinel"
    H, NGUARD, M1 = cfg.guard, cfg.nguard, cfg.m1
    SHIFT_LAST = cfg.shift_last
    K1 = np.uint64(k + 1) * M1
    DATAMASK = np.uint64((1 << DB) - 1)
    _Z64 = np.uint64(0)

    # unique patterns -> cached lane-0 columns; extra slot U = always-match
    # dummy for padding lanes (score pinned at empty_cost, never emits)
    uniq: dict[bytes, int] = {}
    pat_row = np.empty(B, dtype=np.intp)
    for i, p in enumerate(patterns):
        pat_row[i] = uniq.setdefault(p, len(uniq))
    upats = list(uniq)
    U = len(upats)
    peq0, pv0, s0 = _pack_cached(
        ("lanecols", profile.name, LN, LB, tuple(upats)),
        lambda: _pattern_lane_cols(upats, profile, cfg),
    )
    peq_ext = np.empty((U + 1, 256), dtype=np.uint64)
    peq_ext[:U] = peq0
    peq_ext[U] = DATAMASK
    s_ext = np.append(s0, np.uint64(cfg.empty_cost))
    pv_ext = np.append(pv0, _Z64)

    # lane assignment: rows sorted by text length desc, filled lane-minor
    # (word w, lane l <- order[w*LN + l]) so a word's lanes expire together
    order = np.argsort(-n_arr, kind="stable")
    pad = (-B) % LN
    Wd = (B + pad) // LN
    flat = np.empty(Wd * LN, dtype=np.int64)
    flat[:B] = order
    if pad:
        flat[B:] = order[B - 1]  # real codes for padding lanes (walled, inert)
    rows_of = np.ascontiguousarray(flat.reshape(Wd, LN).T)  # (LN, Wd)
    prow_of = pat_row[rows_of]  # (LN, Wd)
    if pad:
        prow_of[LN - pad :, Wd - 1] = U  # dummy pattern for padding lanes

    # pre-shifted flat gather tables (tiny: (U+1) x 256 per lane)
    single = U == 1 and pad == 0
    if single:
        tabs = [np.ascontiguousarray(peq_ext[0] << np.uint64(l * LB)) for l in range(LN)]
    else:
        tabs = [
            np.ascontiguousarray(peq_ext << np.uint64(l * LB)).reshape(-1)
            for l in range(LN)
        ]

    pv_init_all = np.zeros(Wd, dtype=np.uint64)
    score_init_all = np.zeros(Wd, dtype=np.uint64)
    nl = np.empty((LN, Wd), dtype=np.int64)
    for l in range(LN):
        sh = np.uint64(l * LB)
        pv_init_all |= pv_ext[prow_of[l]] << sh
        score_init_all += s_ext[prow_of[l]] << sh
        nl[l] = n_arr[rows_of[l]]
    lane_masks = [DATAMASK << np.uint64(l * LB) for l in range(LN)]
    records: list[tuple[np.ndarray, np.ndarray, np.ndarray, int]] = []

    # word chunks: L2 residency for the ~18 per-word state/temp arrays, and
    # per-chunk step counts — words are length-sorted, so a chunk of short
    # rows stops at ITS max length instead of the batch's
    CHUNK = _PREFILTER_ROW_CHUNK
    for c0 in range(0, Wd, CHUNK):
        c1 = min(Wd, c0 + CHUNK)
        Wc = c1 - c0
        nl_c = nl[:, c0:c1]
        steps = int(nl_c.max()) if Wc else 0
        # per-lane contiguous transposed codes: the strided transpose copy
        # is paid once per lane, and every per-step read is then contiguous
        # (a zero-copy strided VIEW per step measured 1.3-1.6x slower
        # overall — strided uint8 reads defeat the per-op SIMD)
        txt_l = [
            np.ascontiguousarray(raw[rows_of[l, c0:c1], :steps].T) for l in range(LN)
        ]
        bases = None if single else [prow_of[l, c0:c1] * 256 for l in range(LN)]

        # per-lane expiry events: at iteration t == n the lane's data mask
        # ORs into the word's wall (t == steps never fires -> final rule)
        ev_t = nl_c.reshape(-1)
        ev_w = np.tile(np.arange(Wc), LN)
        ev_m = np.concatenate([np.full(Wc, m, dtype=np.uint64) for m in lane_masks])
        live = ev_t < steps
        e_ord = np.argsort(ev_t[live], kind="stable")
        ev_w_s = ev_w[live][e_ord]
        ev_m_s = ev_m[live][e_ord]
        ev_bounds = np.searchsorted(ev_t[live][e_ord], np.arange(steps + 1))

        Pv = pv_init_all[c0:c1].copy()
        Mv = np.zeros(Wc, dtype=np.uint64)
        score = score_init_all[c0:c1].copy()
        prev = score.copy()
        dec = np.full(Wc, H, dtype=np.uint64)
        wall = np.zeros(Wc, dtype=np.uint64)
        wall_active = False

        if all_minima:
            le0 = np.bitwise_and(np.invert(np.bitwise_or(prev, H) - K1), H)
            rows0 = np.nonzero(le0)[0]
            if len(rows0):
                records.append((rows0 + c0, le0[rows0], prev[rows0], 0))

        Eq = np.empty(Wc, np.uint64)
        eqb = np.empty(Wc, np.uint64)
        Xv = np.empty(Wc, np.uint64)
        Xh = np.empty(Wc, np.uint64)
        Ph = np.empty(Wc, np.uint64)
        Mh = np.empty(Wc, np.uint64)
        tA = np.empty(Wc, np.uint64)
        tb = np.empty(Wc, np.uint64)
        idx = np.empty(Wc, np.intp)
        sw = np.empty(Wc, np.uint64)
        ga = np.empty(Wc, np.uint64)
        gb = np.empty(Wc, np.uint64)
        emit = np.empty(Wc, np.uint64)
        ceff = np.empty(Wc, np.uint64)

        for t in range(steps):
            for l in range(LN):
                dst = Eq if l == 0 else eqb
                if single:
                    np.take(tabs[l], txt_l[l][t], out=dst)
                else:
                    np.add(bases[l], txt_l[l][t], out=idx)
                    np.take(tabs[l], idx, out=dst)
                if l:
                    np.bitwise_or(Eq, eqb, out=Eq)
            np.bitwise_or(Eq, Mv, out=Xv)
            np.bitwise_and(Eq, Pv, out=tA)
            np.add(tA, Pv, out=tA)
            np.bitwise_xor(tA, Pv, out=tA)
            np.bitwise_or(tA, Eq, out=Xh)
            np.bitwise_or(Xh, Pv, out=tb)
            np.invert(tb, out=tb)
            np.bitwise_or(Mv, tb, out=Ph)
            np.bitwise_and(Pv, Xh, out=Mh)
            # packed score update from the last data row of each lane
            np.right_shift(Ph, SHIFT_LAST, out=sw)
            np.bitwise_and(sw, M1, out=sw)
            np.add(score, sw, out=score)
            np.right_shift(Mh, SHIFT_LAST, out=sw)
            np.bitwise_and(sw, M1, out=sw)
            np.subtract(score, sw, out=score)
            # lane isolation across the guard bits
            np.bitwise_and(Ph, NGUARD, out=Ph)
            np.bitwise_and(Mh, NGUARD, out=Mh)
            np.left_shift(Ph, _ONE, out=Ph)
            np.left_shift(Mh, _ONE, out=Mh)
            np.bitwise_or(Xv, Ph, out=tb)
            np.invert(tb, out=tb)
            np.bitwise_or(Mh, tb, out=Pv)
            np.bitwise_and(Pv, NGUARD, out=Pv)
            np.bitwise_and(Ph, Xv, out=Mv)
            # ---- per-lane wall, then the fused walk at position p = t+1 ----
            a, b = int(ev_bounds[t]), int(ev_bounds[t + 1])
            if b > a:
                np.bitwise_or.at(wall, ev_w_s[a:b], ev_m_s[a:b])
                wall_active = True
            if wall_active:
                np.bitwise_or(score, wall, out=ceff)
                c = ceff
            else:
                c = score
            if all_minima:
                np.bitwise_or(c, H, out=sw)
                np.subtract(sw, K1, out=sw)
                np.invert(sw, out=sw)
                np.bitwise_and(sw, H, out=emit)
                rows = np.nonzero(emit)[0]
                if len(rows):
                    records.append((rows + c0, emit[rows], c[rows].copy(), t + 1))
            else:
                # walk gate: le bits of prev (prev <= k); nothing can emit
                # and dec may be reset while every lane sits above k
                np.bitwise_or(prev, H, out=sw)
                np.subtract(sw, K1, out=gb)
                np.invert(gb, out=gb)
                np.bitwise_and(gb, H, out=gb)
                if not gb.any():
                    np.copyto(dec, H)
                    np.copyto(prev, c)
                    continue
                # emit = dec & (prev < c) & (prev <= k)
                np.subtract(sw, c, out=ga)  # guard set iff prev >= c
                np.invert(ga, out=ga)
                np.bitwise_and(ga, H, out=ga)  # gt: prev < c
                np.bitwise_and(ga, gb, out=emit)
                np.bitwise_and(emit, dec, out=emit)
                rows = np.nonzero(emit)[0]
                if len(rows):
                    records.append((rows + c0, emit[rows], prev[rows].copy(), t))
                # dec' = lt | (dec & eq);  lt = c < prev, eq = ~(lt | gt)
                np.bitwise_or(c, H, out=sw)
                np.subtract(sw, prev, out=sw)
                np.invert(sw, out=sw)
                np.bitwise_and(sw, H, out=sw)  # lt
                np.bitwise_or(sw, ga, out=gb)
                np.invert(gb, out=gb)
                np.bitwise_and(gb, H, out=gb)  # eq
                np.bitwise_and(dec, gb, out=dec)
                np.bitwise_or(dec, sw, out=dec)
            np.copyto(prev, c)

        if not all_minima:
            # final-position rule: lanes whose text ends at the chunk's last
            # step (shorter lanes were walled inside the loop and emitted
            # their pending minimum there — same condition, same result)
            final_mask = np.zeros(Wc, dtype=np.uint64)
            for l in range(LN):
                g = np.uint64(1 << (l * LB + LB - 1))
                final_mask |= np.where(nl_c[l] == steps, g, _Z64)
            np.bitwise_or(prev, H, out=sw)
            np.subtract(sw, K1, out=sw)
            np.invert(sw, out=sw)
            np.bitwise_and(sw, H, out=sw)
            np.bitwise_and(sw, dec, out=sw)
            np.bitwise_and(sw, final_mask, out=sw)
            rows = np.nonzero(sw)[0]
            if len(rows):
                records.append((rows + c0, sw[rows], prev[rows].copy(), steps))

    if not records:
        return empty
    all_rows = np.concatenate([r for r, _, _, _ in records])
    all_emit = np.concatenate([e for _, e, _, _ in records])
    all_cost = np.concatenate([cw for _, _, cw, _ in records])
    all_pos = np.concatenate(
        [np.full(len(r), p, dtype=np.int64) for r, _, _, p in records]
    )
    out_r, out_p, out_c = [], [], []
    for l in range(LN):
        gbit = np.uint64(1 << (l * LB + LB - 1))
        sel = (all_emit & gbit) != 0
        if not sel.any():
            continue
        out_r.append(rows_of[l][all_rows[sel]])
        out_p.append(all_pos[sel])
        out_c.append(((all_cost[sel] >> np.uint64(l * LB)) & DATAMASK).astype(np.int32))
    ri = np.concatenate(out_r)
    pos = np.concatenate(out_p)
    cost = np.concatenate(out_c)
    o = np.lexsort((pos, ri))
    return ri[o], pos[o], cost[o]
